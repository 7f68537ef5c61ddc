package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for duplicated-span removal: 2M 20-token docs of
 * per-doc-unique words, with a fixed 6-token boilerplate fragment
 * appended to every EVEN doc. The fragment's 4 interior 3-grams are
 * shared by 1M documents and must cover exactly its 6 tokens; every
 * boundary 3-gram contains a doc-unique word and must survive. Exact
 * expectation: n_removed = 6 for even docs, 0 for odd, unique prefix
 * intact everywhere.
 */
object ProbeSpanScale {
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

    val nDocs = 2000000L
    val unique = concat_ws(" ", (1 to 20).map(k =>
      concat(lit(s"u${k}_"), col("id").cast("string"))): _*)
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat(unique, when(pmod(col("id"), lit(2L)) === 0,
        lit(" please accept all cookies to continue")).otherwise(lit("")))
        .as("text")).persist()
    docs.count()

    val w0 = shuffleWrite
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup
      .removeDuplicatedSpans(docs, "doc_id", "text")
    val agg = out.select(
      count(lit(1L)).as("n"),
      sum(when(pmod(col("doc_id"), lit(2L)) === 0 && col("n_removed") === 6, 1L)
        .otherwise(0L)).as("even_ok"),
      sum(when(pmod(col("doc_id"), lit(2L)) === 1 && col("n_removed") === 0, 1L)
        .otherwise(0L)).as("odd_ok"),
      sum(when(col("clean_text").contains("u1_") &&
        !col("clean_text").contains("cookies"), 1L).otherwise(0L)).as("text_ok"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"PROBE span_remove_2m_docs => wall=$secs%.1fs " +
      f"shuffle_write=${(shuffleWrite - w0) / 1e6}%.0fMB")
    println(s"PROBE span_remove_check => n=${agg.getLong(0)} (want $nDocs) " +
      s"even_ok=${agg.getLong(1)} (want ${nDocs / 2}) odd_ok=${agg.getLong(2)} " +
      s"(want ${nDocs / 2}) unique_intact=${agg.getLong(3)} (want $nDocs)")
    assert(agg.getLong(0) == nDocs && agg.getLong(1) == nDocs / 2 &&
      agg.getLong(2) == nDocs / 2 && agg.getLong(3) == nDocs)

    spark.stop()
  }
}
