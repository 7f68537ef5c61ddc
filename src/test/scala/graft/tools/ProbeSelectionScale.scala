package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for the data-selection / preprocessing wave:
 *
 *  - DSIR weights over 4M parity-vocabulary docs (target = even
 *    slice): every even doc must score positive, every odd negative —
 *    closed-form, because even/odd vocabularies are disjoint.
 *  - Gumbel top-k over 50M rows with 1000 planted heavy rows
 *    (log-weight +40): all k = 500 draws must be heavy rows.
 *  - Chunking 20M ~100-token docs: exact closed-form chunk count
 *    (100 tokens, size 64 / overlap 16 → 2 chunks/doc).
 *  - PCA covariance over 200k 64-dim vectors with a planted dominant
 *    axis: top eigenvalue must dwarf the rest, covariance pass exact
 *    in shape (2080 output cells).
 */
object ProbeSelectionScale {
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

    // ---- DSIR at 4M docs: parity-split vocabularies ----
    // 500 even-doc words + 500 odd-doc words into 4096 buckets: a few
    // buckets collide across parities (hashing is DSIR's admitted
    // approximation — vocab ≫ buckets would wash the signal out
    // entirely), so the contract is ≥99.5% selection accuracy, not
    // perfection.
    val nDocs = 4000000L
    val w = (k: Long) => concat(lit("w"), pmod(col("id") * 31 + k, lit(500L)) * 2 +
      pmod(col("id"), lit(2L)))
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", w(1), w(2), w(3), w(4), w(5), w(6), w(7), w(8)).as("text"),
      pmod(col("id"), lit(2L)).as("par")).persist()
    docs.count()
    timed("dsir_4m_docs") {
      val out = graft.operators.TextAnalysis
        .dsirWeightsWhere(docs, col("par") === 0, "doc_id", "text")
      val agg = out.select(
        sum(when(pmod(col("doc_id"), lit(2L)) === 0 && !col("selected"), 1L)
          .otherwise(0L)).as("even_missed"),
        sum(when(pmod(col("doc_id"), lit(2L)) === 1 && col("selected"), 1L)
          .otherwise(0L)).as("odd_leaked"),
        count(lit(1L)).as("n"),
        avg(when(pmod(col("doc_id"), lit(2L)) === 0, col("avg_logw"))).as("even_mean"),
        avg(when(pmod(col("doc_id"), lit(2L)) === 1, col("avg_logw"))).as("odd_mean"))
        .collect()(0)
      val acc = 1.0 - (agg.getLong(0) + agg.getLong(1)).toDouble / agg.getLong(2)
      println(f"PROBE dsir_check => n=${agg.getLong(2)} (want $nDocs) " +
        f"even_missed=${agg.getLong(0)} odd_leaked=${agg.getLong(1)} acc=$acc%.5f " +
        f"even_mean=${agg.getDouble(3)}%.3f odd_mean=${agg.getDouble(4)}%.3f")
      assert(agg.getLong(2) == nDocs && acc >= 0.995)
      assert(agg.getDouble(3) > 0.2 && agg.getDouble(4) < -0.2,
        "parity means must separate strongly")
    }
    docs.unpersist()

    // ---- Gumbel top-k at 50M rows, 1000 planted heavy rows ----
    timed("gumbel_topk_50m") {
      val d = spark.range(0, 50000000L).select(col("id"),
        when(pmod(col("id"), lit(50000L)) === 0, 40.0).otherwise(0.0).as("logw"))
      val out = graft.operators.Sampling.gumbelTopK(d, "id", col("logw"), k = 500)
        .collect()
      val heavy = out.count(r => r.getLong(0) % 50000L == 0)
      println(s"PROBE gumbel_check => rows=${out.length} heavy=$heavy (want 500/500)")
      assert(out.length == 500 && heavy == 500)
    }

    // ---- chunking at 20M 100-token docs ----
    timed("chunk_20m_docs") {
      val body = (1 to 100).map(i => s"tok$i").mkString(" ")
      val d = spark.range(0, 20000000L).select(col("id").as("doc_id"),
        lit(body).as("text"))
      val out = graft.operators.Chunking.chunkByTokens(d, "doc_id", "text",
        size = 64, overlap = 16)
      // 100 tokens, step 48: chunks at 0 and 48 → ceil(36/48)+1 = 2
      val agg = out.agg(count(lit(1L)).as("n"),
        sum(when(col("n_chunk_tokens") === 64, 1L).otherwise(0L)).as("full"),
        sum(col("n_chunk_tokens")).as("tok")).collect()(0)
      println(s"PROBE chunk_check => chunks=${agg.getLong(0)} (want 40000000) " +
        s"full=${agg.getLong(1)} tokens=${agg.getLong(2)} (want ${20000000L * 116})")
      assert(agg.getLong(0) == 40000000L && agg.getLong(1) == 20000000L &&
        agg.getLong(2) == 20000000L * 116) // 64 + 52-token tail
    }

    // ---- PCA covariance at 200k x 64 with a planted dominant axis ----
    timed("pca_cov_200k_x64") {
      val dim = 64
      // component 0 carries ~100x the variance of the rest
      val vec = array((0 until dim).map { j =>
        val base = (pmod(xxhash64(col("id"), lit(j)), lit(1000L)).cast("double") / 1000.0)
        if (j == 0) base * 10.0 else base
      }: _*)
      val d = spark.range(0, 200000L).select(col("id"), vec.as("emb"))
      val model = graft.operators.Pca.fit(d, "emb", k = 4)
      val top = model.eigenvalues(0)
      val second = model.eigenvalues(1)
      val align = math.abs(model.components(0)(0))
      println(f"PROBE pca_check => ev0=$top%.4f ev1=$second%.4f ratio=${top / second}%.1f " +
        f"axis_align=$align%.4f (want ratio>50, align>0.99)")
      assert(top / second > 50 && align > 0.99)
    }

    spark.stop()
  }
}
