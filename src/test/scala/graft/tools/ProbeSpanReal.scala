package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Honest fixture-scale cost of removeDuplicatedSpans: aggregates over
  * clean_text and n_removed so the rebuild join cannot be eliminated
  * the way a bare count() is (Catalyst drops a left join with a unique
  * right key when only left columns are consumed). */
object ProbeSpanReal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val aug = docs.select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 2 === 0,
          lit(" please accept all cookies to continue")).otherwise(lit(""))).as("text"))
      val out = graft.operators.Dedup.removeDuplicatedSpans(aug, "doc_id", "text")
      out.agg(sum(col("n_removed")), sum(length(col("clean_text")))).collect()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    println(f"PROBE span_remove_real_sf01 => min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
