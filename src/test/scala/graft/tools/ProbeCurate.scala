package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated cost decomposition of the curation composite (x_curate /
  * x_curation_audit — the suite's two most expensive rows in BENCH_r12):
  * times the full query min-of-3 and each pipeline stage CUMULATIVELY
  * (quality → exact dedup → near-dup pairs → anti-join → decontam →
  * split) so the expensive stage is named by measurement, not guessed
  * (round-12 verdict "Next" #4). Run at sf0.1 with
  * `sbt -batch "Test/runMain graft.tools.ProbeCurate"`. */
object ProbeCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    val evalDocs = docs.where(col("doc_id") % 97 === 0)

    def time[A](label: String)(f: => A): A = {
      var best = Double.MaxValue
      var out: Option[A] = None
      (1 to 3).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        out = Some(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE $label => min3=$best%.2fs")
      out.get
    }

    // Head-to-head: the shipped composition vs the r12 baseline
    // (hand-inlined text-based stages), INTERLEAVED in one session so
    // the ±1s session noise hits both arms equally.
    def baselineCurate(): Int = {
      val quality = graft.operators.Pipelines.qualityFilter(docs, "doc_id", "text")
      val exact = graft.operators.Dedup.dedupExact(quality, "doc_id", Seq("text"))
      val pairs = graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      val clean = graft.operators.Decontamination.decontaminate(
        deduped, "doc_id", "text", evalDocs, "text", n = 3, minOverlap = 5)
      graft.operators.Sampling.split(clean, "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
        .collect().length
    }
    def shippedCurate(): Int =
      graft.operators.Pipelines.curateCorpus(docs, "doc_id", "text",
        evalDocs, "text")
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
        .collect().length
    var (bBase, bShip) = (Double.MaxValue, Double.MaxValue)
    (1 to 5).foreach { _ =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime(); baselineCurate()
      bBase = math.min(bBase, (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
      t0 = System.nanoTime(); shippedCurate()
      bShip = math.min(bShip, (System.nanoTime() - t0) / 1e9)
    }
    println(f"PROBE x_curate_ab => baseline=$bBase%.2fs shipped=$bShip%.2fs")
    def baselineAudit(): Int = {
      import graft.operators.{Dedup, Decontamination, Sampling, TextAnalysis}
      val t = col("text")
      val langOk = TextAnalysis.langId(t) === "en"
      val qualOk = TextAnalysis.qualityScore(t) >= 0.3
      val lenOk = TextAnalysis.tokenCount(t).between(5, 100000)
      val qpass = graft.operators.Pipelines.qualityFilter(docs, "doc_id", "text")
      val exact = Dedup.dedupExact(qpass, "doc_id", Seq("text"))
      val exactLosers = qpass.select(col("doc_id"))
        .join(exact.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("__exact", lit(true))
      val pairs = Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
      val nearLosers = pairs.select(col("id_b").as("doc_id")).distinct()
        .withColumn("__near", lit(true))
      val deduped = exact.join(nearLosers.select(col("doc_id")), Seq("doc_id"), "left_anti")
      val contam = Decontamination.overlaps(
          deduped, "doc_id", "text", evalDocs, "text", n = 3, minOverlap = 5)
        .select(col("doc_id")).withColumn("__cont", lit(true))
      val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
      val bounds = splits.scanLeft(0L) { case (acc, (_, w)) => acc + (w * 1000).toLong }
      val splitExpr = splits.zipWithIndex.foldLeft(lit("dropped:remainder")) {
        case (acc, ((name, _), i)) =>
          when(Sampling.hashBucket(col("doc_id")) >= bounds(i) &&
            Sampling.hashBucket(col("doc_id")) < bounds(i + 1), lit(s"kept:$name"))
            .otherwise(acc)
      }
      docs.select(col("doc_id"), langOk.as("__lang"), qualOk.as("__qual"), lenOk.as("__len"))
        .join(exactLosers, Seq("doc_id"), "left")
        .join(nearLosers, Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(!col("__lang"), "lang")
            .when(!col("__qual"), "quality")
            .when(!col("__len"), "length")
            .when(col("__exact"), "exact_dup")
            .when(col("__near"), "near_dup")
            .when(col("__cont"), "decontam")
            .otherwise(splitExpr).as("stage"))
        .orderBy("doc_id").limit(2000).collect().length
    }
    def shippedAudit(): Int =
      graft.operators.Pipelines.curationAudit(docs, "doc_id", "text",
        evalDocs, "text")
        .orderBy("doc_id").limit(2000).collect().length
    var (aBase, aShip) = (Double.MaxValue, Double.MaxValue)
    (1 to 5).foreach { _ =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime(); baselineAudit()
      aBase = math.min(aBase, (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
      t0 = System.nanoTime(); shippedAudit()
      aShip = math.min(aShip, (System.nanoTime() - t0) / 1e9)
    }
    println(f"PROBE x_audit_ab => baseline=$aBase%.2fs shipped=$aShip%.2fs")
    // cumulative stage costs (each includes its predecessors)
    val quality = graft.operators.Pipelines.qualityFilter(docs, "doc_id", "text")
    time("s1_quality")(quality.count())
    val exact = graft.operators.Dedup.dedupExact(quality, "doc_id", Seq("text"))
    time("s2_exact")(exact.count())
    time("s3_pairs") {
      graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
        .count()
    }
    time("s4_antijoin") {
      val pairs = graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      exact.join(losers, Seq("doc_id"), "left_anti").count()
    }
    time("s5_decontam") {
      val pairs = graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      graft.operators.Decontamination.decontaminate(
        deduped, "doc_id", "text", evalDocs, "text", n = 3, minOverlap = 5).count()
    }
    spark.stop()
  }
}
