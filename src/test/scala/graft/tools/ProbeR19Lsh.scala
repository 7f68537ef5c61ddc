package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 LSH candidate-volume probe (VERDICT r18 item 3): at the
  * force fixture, measure — for 64 vs 128 hashes at 16 bands — the
  * candidate pairs reaching the exact-Jaccard verify, the number of
  * buckets dropped by the maxBucketSize cap, and the verified output,
  * proving (or refuting) that the r18 64-hash default doesn't fan the
  * verify join out superlinearly on a duplicate-heavy corpus.
  * Usage: Test/runMain graft.tools.ProbeR19Lsh <sfDir>
  */
object ProbeR19Lsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/forcedata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    val nDocs = docs.count()
    println(s"PROBE corpus docs=$nDocs dir=$sfDir")

    import graft.operators.Dedup
    for (nh <- Seq(64, 128)) {
      val cfg = Dedup.LshConfig(numHashes = nh, bands = 16)
      val t0 = System.nanoTime()
      val cand = Dedup.minhashCandidatePairs(docs, "doc_id", "text", cfg).count()
      val tCand = (System.nanoTime() - t0) / 1e9
      val dropped = Dedup.minhashDroppedBuckets(docs, "doc_id", "text", cfg)
        .agg(coalesce(sum("dropped_buckets"), lit(0L)),
          coalesce(max("largest_bucket"), lit(0L))).collect()(0)
      val t1 = System.nanoTime()
      val verified = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.8, cfg).count()
      val tVer = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      println(f"PROBE hashes=$nh%3d candidates=$cand%9d (${tCand}%5.1fs) " +
        f"verified=$verified%9d (${tVer}%5.1fs) droppedBuckets=${dropped.get(0)} " +
        f"largestBucket=${dropped.get(1)}")
    }
    spark.stop()
  }
}
