package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 A/B: shipped curateCorpus (text-form minhash, re-shingling
  * decontam) vs the audit-style SHARED-shingle composition, interleaved
  * min-of-5 in one session — re-measuring the round-13 A/B now that the
  * LSH signature is half price (the relative weight of shingling
  * doubled). Also asserts the two compositions return identical rows. */
object ProbeR18CurateAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    val evalDocs = docs.where(col("doc_id") % 97 === 0)
    docs.count()

    import graft.operators.{Dedup, Pipelines, Decontamination, Sampling}
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

    def shipped(): DataFrame =
      Pipelines.curateCorpus(docs, "doc_id", "text", evalDocs, "text")
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)

    def shared(): DataFrame = {
      val quality = Pipelines.qualityFilter(docs, "doc_id", "text")
      val exact = Dedup.dedupExact(quality, "doc_id", Seq("text"))
      val sh = exact.withColumn("__sh",
        array_distinct(Dedup.shingles(col("text"), 3))).localCheckpoint(eager = false)
      val pairs = Dedup.minhashNearDuplicatesPreShingled(sh, "doc_id", "__sh", 0.85)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      val deduped = sh.join(losers, Seq("doc_id"), "left_anti")
      val contam = Decontamination.overlapsPreShingled(
        deduped, "doc_id", "__sh", evalDocs, "text", n = 3, minOverlap = 5)
        .select(col("doc_id"))
      val clean = deduped.join(contam, Seq("doc_id"), "left_anti").drop("__sh")
      Sampling.split(clean, "doc_id", splits)
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
    }

    val a = shipped().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = shared().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    println(s"PROBE equal=${a == b} |shipped|=${a.size} |shared|=${b.size} " +
      s"onlyShipped=${(a -- b).take(3)} onlyShared=${(b -- a).take(3)}")

    var tA = Double.MaxValue; var tB = Double.MaxValue
    (1 to 5).foreach { _ =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime(); shipped().count()
      tA = math.min(tA, (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
      t0 = System.nanoTime(); shared().count()
      tB = math.min(tB, (System.nanoTime() - t0) / 1e9)
    }
    println(f"PROBE shipped(text-form) min5=$tA%.2fs  shared(pre-shingled) min5=$tB%.2fs")
    spark.stop()
  }
}
