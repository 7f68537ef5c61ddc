package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probes for the round-11 continuation operators, at sizes
 * where data cost (not scheduler overhead) dominates and every
 * assertion has a closed form:
 *
 *  - Line-level corpus dedup over 4M synthetic multi-line docs (32M
 *    exploded lines): 3 of 8 lines per doc come from a 100-line shared
 *    boilerplate pool (each pool line sits in ~40k docs — far over the
 *    threshold), 5 are per-doc unique. Exactly 12M line instances must
 *    vanish and every document must keep exactly its 5 unique lines.
 *  - Moore-Lewis selection over 4M docs with a parity-split vocabulary
 *    (even docs write target-like tokens, odd docs off-domain; target
 *    LM = the even slice): every even doc must score positive and
 *    every odd doc negative — 2M/2M exactly.
 *  - k-anonymity gate over 50M rows / 5.9M classes where every 10th
 *    row is a planted singleton class: violating_classes = 5M,
 *    exposed_rows = 5M, suppression keeps exactly 45M rows.
 */
object ProbeTextScale {
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

    // ---- line-level dedup: 4M docs x 8 lines, 100-line boiler pool ----
    val nDocs = 4000000L
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      concat_ws("\n",
        concat(lit("unique "), col("id").cast("string"), lit(" alpha")),
        concat(lit("boiler cookie "), pmod(col("id"), lit(100L)).cast("string")),
        concat(lit("unique "), col("id").cast("string"), lit(" beta")),
        concat(lit("boiler nav "), pmod(col("id") + 37L, lit(100L)).cast("string")),
        concat(lit("unique "), col("id").cast("string"), lit(" gamma")),
        concat(lit("boiler footer "), pmod(col("id") + 61L, lit(100L)).cast("string")),
        concat(lit("unique "), col("id").cast("string"), lit(" delta")),
        concat(lit("unique "), col("id").cast("string"), lit(" epsilon"))).as("text"))
      .persist()
    docs.count()
    timed("line_dedup_4m_docs_32m_lines") {
      val out = graft.operators.TextAnalysis
        .removeBoilerplateLines(docs, "doc_id", "text", minDocs = 1000L)
      val agg = out.agg(
        sum("n_removed").as("removed"),
        count(lit(1L)).as("docs"),
        sum(when(size(split(col("clean_text"), "\n")) === 5, 1L).otherwise(0L)).as("five_line_docs"))
        .collect()(0)
      println(s"PROBE line_dedup_check => removed=${agg.getLong(0)} (want ${3 * nDocs}) " +
        s"docs=${agg.getLong(1)} (want $nDocs) five_line=${agg.getLong(2)} (want $nDocs)")
      assert(agg.getLong(0) == 3 * nDocs && agg.getLong(1) == nDocs && agg.getLong(2) == nDocs)
    }
    docs.unpersist()

    // ---- Moore-Lewis: 4M docs, parity vocabulary, target = even slice ----
    val raw = spark.range(0, nDocs).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2L)) === 0,
        concat(lit("spark shuffle codegen catalyst partition t"), pmod(col("id"), lit(500L)).cast("string"),
          lit(" spark shuffle plan agg t"), pmod(col("id") + 7L, lit(500L)).cast("string")))
        .otherwise(
          concat(lit("pasta garlic recipe olive basil o"), pmod(col("id"), lit(500L)).cast("string"),
            lit(" pasta garlic saute herb o"), pmod(col("id") + 7L, lit(500L)).cast("string"))).as("text"))
      .persist()
    raw.count()
    timed("moore_lewis_4m_docs") {
      val target = raw.where(pmod(col("doc_id"), lit(2L)) === 0).select(col("text"))
      val out = graft.operators.TextAnalysis.crossEntropyDiff(raw, target, "doc_id", "text")
      val agg = out.agg(
        sum(when(col("selected"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(!col("selected") && pmod(col("doc_id"), lit(2L)) === 1, 1L).otherwise(0L)).as("n_rejected_odd"))
        .collect()(0)
      println(s"PROBE moore_lewis_check => selected=${agg.getLong(0)} (want ${nDocs / 2}) " +
        s"rejected_odd=${agg.getLong(1)} (want ${nDocs / 2})")
      assert(agg.getLong(0) == nDocs / 2 && agg.getLong(1) == nDocs / 2)
    }
    raw.unpersist()

    // ---- k-anonymity at 50M rows with 5M planted singleton classes ----
    val nRows = 50000000L
    val rows = spark.range(0, nRows).select(col("id"),
      when(pmod(col("id"), lit(10L)) === 0, col("id") + lit(100000000L))
        .otherwise(pmod(col("id"), lit(1000000L))).as("qid"))
    timed("k_anonymity_50m_rows") {
      val s = graft.operators.Governance.kAnonymityStats(rows, Seq("qid"), k = 10)
        .collect()(0)
      println(s"PROBE k_anonymity_check => n_rows=${s.getAs[Long]("n_rows")} " +
        s"classes=${s.getAs[Long]("n_classes")} violating=${s.getAs[Long]("violating_classes")} " +
        s"exposed=${s.getAs[Long]("exposed_rows")} pass=${s.getAs[Boolean]("pass")}")
      assert(s.getAs[Long]("n_rows") == nRows)
      assert(s.getAs[Long]("violating_classes") == 5000000L)
      assert(s.getAs[Long]("exposed_rows") == 5000000L)
      assert(!s.getAs[Boolean]("pass"))
    }
    timed("k_suppress_50m_rows") {
      val kept = graft.operators.Governance.suppressBelowK(rows, Seq("qid"), k = 10).count()
      println(s"PROBE k_suppress_check => kept=$kept (want 45000000)")
      assert(kept == 45000000L)
    }

    spark.stop()
  }
}
