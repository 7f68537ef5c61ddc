package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Where does qualityFilter's time go: filter-context vs project-context
  * evaluation of the text-analysis expressions. */
object ProbeQualityFilter {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    val docs = spark.table("documents")
    time("warmup")(docs.count())
    val t = col("text")

    // force full evaluation via agg over the projected column
    time("project langId, agg")(
      docs.select(TextAnalysis.langId(t).as("l")).agg(max("l")).collect())
    time("project quality, agg")(
      docs.select(TextAnalysis.qualityScore(t).as("q")).agg(max("q")).collect())
    time("project all three, agg")(
      docs.select(TextAnalysis.langId(t).as("l"), TextAnalysis.qualityScore(t).as("q"),
        TextAnalysis.tokenCount(t).as("n")).agg(max("l"), max("q"), max("n")).collect())
    time("filter langId only, count")(
      docs.where(TextAnalysis.langId(t) === "en").count())
    time("filter quality only, count")(
      docs.where(TextAnalysis.qualityScore(t) >= 0.3).count())
    time("filter all three, count")(
      docs.where(TextAnalysis.langId(t).isin("en") &&
        TextAnalysis.qualityScore(t) >= 0.3 &&
        TextAnalysis.tokenCount(t).between(5, 100000)).count())
    // projection + filter on the projected booleans (materialized columns)
    time("project cols then filter, count")(
      docs.select(col("doc_id"), TextAnalysis.langId(t).as("l"), TextAnalysis.qualityScore(t).as("q"),
        TextAnalysis.tokenCount(t).as("n"))
        .where(col("l") === "en" && col("q") >= 0.3 && col("n").between(5, 100000)).count())
    // repeat warm
    time("WARM filter all three, count")(
      docs.where(TextAnalysis.langId(t).isin("en") &&
        TextAnalysis.qualityScore(t) >= 0.3 &&
        TextAnalysis.tokenCount(t).between(5, 100000)).count())
    time("WARM project all three, agg")(
      docs.select(TextAnalysis.langId(t).as("l"), TextAnalysis.qualityScore(t).as("q"),
        TextAnalysis.tokenCount(t).as("n")).agg(max("l"), max("q"), max("n")).collect())
    spark.stop()
  }
}
