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

    spark.stop()
  }
}
