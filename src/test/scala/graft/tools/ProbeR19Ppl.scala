package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 interleaved A/B: grouped vs ungrouped bigramPerplexity.
  * Usage: Test/runMain graft.tools.ProbeR19Ppl <sfDir> */
object ProbeR19Ppl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())
    val docs = spark.table("documents")
    import graft.operators.TextAnalysis
    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val n1 = TextAnalysis.bigramPerplexityUngrouped(docs, "doc_id", "text").count()
      val sU = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val n2 = TextAnalysis.bigramPerplexity(docs, "doc_id", "text").count()
      val sG = (System.nanoTime() - t0) / 1e9
      println(f"PROBE round$r: ungrouped=$sU%5.2fs ($n1) grouped=$sG%5.2fs ($n2)")
    }
    spark.stop()
  }
}
