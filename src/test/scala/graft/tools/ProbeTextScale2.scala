package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Second force-scale probe wave for the round-11 continuation:
 *
 *  - Normalized dedup over 20M docs: ids 2k and 2k+1 carry the same
 *    content, the odd twin accent-translated and upper-cased — the
 *    normalization fingerprint must produce exactly 10M groups of 2.
 *  - Hard-negative mining over 1M labeled vectors with 32 anchors:
 *    every anchor (label "a") has a planted near-twin (label "b",
 *    cosine ≈ 0.9999…) that must surface as its rank-1 negative; no
 *    same-label row may appear anywhere in the output.
 */
object ProbeTextScale2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    def timed[A](label: String)(f: => A): A = {
      val w0 = shuffleWrite
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label => wall=$secs%.1fs shuffle_write=${(shuffleWrite - w0) / 1e6}%.0fMB")
      r
    }

    // ---- normalized dedup: 20M docs, 10M planted accent-variant pairs ----
    val nDocs = 20000000L
    val base = concat(lit("shared payload row "), (col("id") / 2).cast("long").cast("string"),
      lit(" cafe manana resume text body"))
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2L)) === 0, base)
        .otherwise(upper(translate(base, "aeo", "áéö"))).as("text"))
    timed("normalized_dedup_20m_docs") {
      val g = graft.operators.TextAnalysis
        .normalizedDuplicateGroups(docs, "doc_id", "text")
      val agg = g.agg(count(lit(1L)).as("n_groups"),
        sum(when(col("n_docs") === 2, 1L).otherwise(0L)).as("pairs"),
        min(col("n_docs")).as("min_n"), max(col("n_docs")).as("max_n"))
        .collect()(0)
      println(s"PROBE normalized_dedup_check => groups=${agg.getLong(0)} (want ${nDocs / 2}) " +
        s"pairs=${agg.getLong(1)} min=${agg.getLong(2)} max=${agg.getLong(3)}")
      assert(agg.getLong(0) == nDocs / 2 && agg.getLong(1) == nDocs / 2)
    }

    // ---- hard negatives: 1M vectors, planted opposite-label twins ----
    val nVec = 1000000L
    val dim = 32
    // deterministic pseudo-vector: v[j] = fractional hash of (id, j)
    val vecExpr = array((0 until dim).map(j =>
      (pmod(xxhash64(col("id"), lit(j)), lit(1000L)).cast("double") / 1000.0) + 0.001): _*)
    val corpus = spark.range(0, nVec).select(col("id").as("vec_id"),
      vecExpr.as("emb"),
      when(col("id") < 32, "a")
        .when(col("id") >= 500000L && col("id") < 500032L, "b")
        .when(pmod(col("id"), lit(2L)) === 0, "a").otherwise("b").as("lbl"))
      .persist()
    // plant: vector 500000+k = near-copy of anchor k with label b
    val planted = corpus.where(col("vec_id") < 32)
      .select((col("vec_id") + 500000L).as("vec_id"),
        transform(col("emb"), x => x * 0.999 + 0.0001).as("emb"), lit("b").as("lbl"))
    val all = corpus.where(col("vec_id") < 500000L || col("vec_id") >= 500032L)
      .unionByName(planted).persist()
    all.count(); corpus.unpersist()
    timed("hard_negatives_1m_x32") {
      val anchors = all.where(col("vec_id") < 32)
      val out = graft.operators.Similarity.hardNegatives(
        all, "vec_id", "emb", "lbl", anchors, "vec_id", "emb", "lbl", k = 5)
        .persist()
      val n = out.count()
      val sameLabel = out.where(col("neg_label") === "a").count()
      val rank1 = out.where(col("rank") === 1)
        .select(col("anchor_id"), col("id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val twinsHit = (0L until 32L).count(k => rank1.get(k).contains(500000L + k))
      println(s"PROBE hard_negatives_check => rows=$n (want 160) same_label=$sameLabel (want 0) " +
        s"rank1_twins=$twinsHit/32")
      assert(n == 160 && sameLabel == 0 && twinsHit == 32)
      out.unpersist()
    }

    spark.stop()
  }
}
