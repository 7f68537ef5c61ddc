package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** persist vs lazy-localCheckpoint sharing cost on the minhash bench
  * queries (round-7 regression isolation). */
object ProbeShare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    def docs: DataFrame = spark.table("documents")

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (t, n)
      }
      println(f"PROBE $label => min=${ts.map(_._1).min}%.3f rows=${ts.head._2} " +
        ts.map(t => f"${t._1}%.3f").mkString(","))
    }

    time("minhash:lazy-ckpt(handle-less)") {
      graft.operators.Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.7).count()
    }
    time("minhash:persist(WithCleanup)") {
      val (out, cleanup) = graft.operators.Dedup
        .minhashNearDuplicatesWithCleanup(docs, "doc_id", "text", threshold = 0.7)
      val n = out.count()
      cleanup()
      n
    }
    spark.stop()
  }
}
