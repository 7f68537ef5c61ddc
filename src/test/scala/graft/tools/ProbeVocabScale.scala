package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for the vocabulary-divergence family: two synthetic
 * 5M-doc corpora of 20 tokens each (100M token occurrences per side)
 * over a SHARED 50k-word vocabulary plus 1k words exclusive to each
 * side. The vocabulary histograms must collapse map-side: the probe
 * asserts the shuffle stays MBs (vocab-sized), not GBs (corpus-sized),
 * and checks the exclusive-vocab counts and the top divergent token
 * exactly (the planted exclusive words out-diverge every shared word).
 */
object ProbeVocabScale {
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

    val nDocs = 5000000L
    // 20 tokens/doc: 19 from the shared 50k vocab (hash-spread), 1 from
    // the side's exclusive 1k vocab
    def corpus(side: String) = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat_ws(" ",
        (1 to 19).map(k => concat(lit("w"),
          pmod(xxhash64(col("id") * 31 + k), lit(50000L)).cast("string"))) :+
          concat(lit(side), pmod(col("id"), lit(1000L)).cast("string")): _*)
        .as("text"))
    val a = corpus("onlya").persist(); a.count()
    val b = corpus("onlyb").persist(); b.count()

    val w0 = shuffleWrite
    val t0 = System.nanoTime()
    val div = graft.operators.TextAnalysis.vocabDivergence(a, b, "text").collect()(0)
    val top = graft.operators.TextAnalysis.divergentTokens(a, b, "text", k = 10)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val mb = (shuffleWrite - w0) / 1e6
    println(f"PROBE vocab_divergence_10m_docs => wall=$secs%.1fs shuffle_write=$mb%.0fMB")
    println(s"PROBE vocab_check => vocab_a=${div.getLong(0)} vocab_b=${div.getLong(1)} " +
      s"shared=${div.getLong(2)} jsd_micro=${div.getLong(3)} top=${top.head.getString(0)}")
    // 50k shared + 1k exclusive per side (every bucket hit at these sizes)
    assert(div.getLong(0) == 51000 && div.getLong(1) == 51000 && div.getLong(2) == 50000,
      s"vocab counts wrong: $div")
    assert(top.forall(r => r.getString(0).startsWith("onlya") || r.getString(0).startsWith("onlyb")),
      "top divergent tokens must be the planted exclusive words: " +
        top.map(_.getString(0)).mkString(","))
    assert(mb < 500, f"vocab histogram shuffle must be vocab-sized, got $mb%.0fMB")

    // oovRate on the same 5M-doc corpus (round 13): 4 groups × a 32k
    // vocabulary head over 100M token occurrences — the shuffle is
    // (groups × vocab)-bounded with map-side combine, never
    // corpus-sized. The 32k head covers 32k of the ~51k word types
    // (50k hash-uniform shared words ≈ 1.9k occurrences each, 1k
    // exclusive ≈ 5k each), so OOV lands near the uncovered shared
    // mass ≈ 18k/50k·0.95 ≈ 0.35, uniform across the hash groups
    // (measured 0.3527±0.0001)
    val grouped = a.withColumn("grp", pmod(col("doc_id"), lit(4L)).cast("string"))
    val w1 = shuffleWrite
    val t1 = System.nanoTime()
    val oov = graft.operators.TextAnalysis
      .oovRate(grouped, "text", "grp", vocabSize = 32000)
      .collect()
    val oovSecs = (System.nanoTime() - t1) / 1e9
    val oovMb = (shuffleWrite - w1) / 1e6
    println(f"PROBE oov_rate_5m_docs => wall=$oovSecs%.1fs shuffle_write=$oovMb%.0fMB " +
      s"groups=${oov.length} rates=${oov.map(_.getDouble(3)).mkString(",")}")
    assert(oov.length == 4)
    assert(oov.map(_.getLong(1)).sum == nDocs * 20, "token accounting must be exact")
    assert(oov.forall(r => r.getDouble(3) > 0.3 && r.getDouble(3) < 0.4),
      oov.mkString(","))
    assert(oovMb < 500, f"oov shuffle must be (groups x vocab)-bounded, got $oovMb%.0fMB")

    spark.stop()
  }
}
