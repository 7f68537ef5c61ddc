package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the x_dsir fixture cost: which part of the
  * operator pays the ~2s wall at a 5000-doc corpus. */
object ProbeDsirTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())
    val d = spark.table("documents")
    import graft.functions.word_shingles

    def timed(label: String)(f: => Unit): Unit = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.zipWithIndex.foreach { case (t, i) => println(f"PROBE $label run$i => $t%.3f s") }
      spark.catalog.clearCache()
    }

    timed("explode_only") {
      d.select(explode(concat(
        coalesce(word_shingles(col("text"), 1), array()),
        coalesce(word_shingles(col("text"), 2), array()))).as("ng")).count()
    }
    timed("explode_md5_bucket") {
      d.select(explode(concat(
        coalesce(word_shingles(col("text"), 1), array()),
        coalesce(word_shingles(col("text"), 2), array()))).as("ng"))
        .select(graft.operators.TextAnalysis.dsirBucket(col("ng"), 4096).as("b"))
        .agg(sum("b")).collect()
    }
    timed("profile_groupby") {
      d.select(col("doc_id"), (col("lang") === "en").as("t"), explode(concat(
        coalesce(word_shingles(col("text"), 1), array()),
        coalesce(word_shingles(col("text"), 2), array()))).as("ng"))
        .select(col("doc_id"), col("t"),
          graft.operators.TextAnalysis.dsirBucket(col("ng"), 4096).as("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1L)).as("cnt"), max(col("t")).as("t")).count()
    }
    timed("full_op") {
      graft.operators.TextAnalysis
        .dsirWeightsWhere(d, col("lang") === "en", "doc_id", "text").count()
    }
    spark.stop()
  }
}
