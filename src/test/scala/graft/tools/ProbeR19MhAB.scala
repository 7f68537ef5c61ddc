package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 interleaved A/B: grouped vs ungrouped minhash and simhash
  * kernels on the declared-query compositions, min-of-3 per side.
  * Usage: Test/runMain graft.tools.ProbeR19MhAB <sfDir>
  */
object ProbeR19MhAB {
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
    import graft.operators.{Dedup, TextAnalysis}

    // x_dedup_minhash composition (threshold 0.7, limit dropped — count all)
    def mhG = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.7)
    def mhU = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.7,
      Dedup.LshConfig(), groupExact = false)
    // x_dedup_simhash composition
    def shBase = {
      val base = docs.select(col("doc_id"), col("text"))
        .where(TextAnalysis.tokenCount(col("text")) >= 75)
      val planted = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zqxwv")).as("text"))
      base.union(planted)
    }
    def simG = Dedup.simhashNearDuplicates(shBase, "doc_id", "text", maxDistance = 5)
    def simU = Dedup.simhashNearDuplicatesUngrouped(shBase, "doc_id", "text", maxDistance = 5)

    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime(); val n1 = mhU.count(); val sU = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime(); val n2 = mhG.count(); val sG = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime(); val n3 = simU.count(); val tU = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime(); val n4 = simG.count(); val tG = (System.nanoTime() - t0) / 1e9
      println(f"PROBE round$r minhash: ungrouped=$sU%5.2fs ($n1) grouped=$sG%5.2fs ($n2) " +
        f"| simhash: ungrouped=$tU%5.2fs ($n3) grouped=$tG%5.2fs ($n4)")
    }
    spark.stop()
  }
}
