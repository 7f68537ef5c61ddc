package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 cost decomposition of the compute-bound hot rows: times
  * each pipeline prefix (cumulative `.count()`s, min-of-3) so the
  * expensive stage is named by measurement. Bench-session confs. */
object ProbeR18Decomp {
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
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue; var n = 0L
      (1 to 3).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE $label%-42s min3=$best%6.2fs rows=$n")
    }

    import graft.operators.{Dedup, Pipelines, TextAnalysis, Decontamination, Sampling}
    val evalDocs = docs.where(col("doc_id") % 97 === 0)

    // ---- x_curate stages (cumulative) ----
    val quality = Pipelines.qualityFilter(docs, "doc_id", "text")
    time("curate: qualityFilter")(quality.count())
    val exact = Dedup.dedupExact(quality, "doc_id", Seq("text"))
    time("curate: + dedupExact")(exact.count())
    time("curate: + minhash pairs")(
      Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85).count())
    val pairs2 = Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.85)
    val deduped = exact.join(pairs2.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    time("curate: + anti-join")(deduped.count())
    val clean = Decontamination.decontaminate(
      deduped, "doc_id", "text", evalDocs, "text", n = 3, minOverlap = 5)
    time("curate: + decontam")(clean.count())
    time("curate: full (split)")(Sampling.split(clean, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)).count())

    // ---- minhash internals on the exact-deduped frame ----
    time("minhash: buckets only")(
      Dedup.minhashBuckets(exact, "doc_id", "text").count())
    time("minhash: candidate pairs")(
      Dedup.minhashCandidatePairs(exact, "doc_id", "text").count())

    // ---- x_tfidf_top ----
    time("tfidf_top: full")(
      TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 3).count())

    // ---- x_boilerplate ----
    time("boilerplate: full")(
      Pipelines.removeBoilerplate(docs, "doc_id", "text", 16, 2).count())

    // ---- x_perplexity ----
    time("perplexity: full")(
      TextAnalysis.bigramPerplexity(docs, "doc_id", "text").count())

    // ---- x_dsir ----
    time("dsir: full")(
      TextAnalysis.dsirWeightsWhere(docs, col("lang") === "en", "doc_id", "text").count())

    // ---- x_dedup_ngram path ----
    time("ngram: pairs 0.8")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
    time("ngram: shingle project only")(sh.count())
    time("ngram: postings explode only")(
      sh.select(col("id"), explode(col("sh")).as("s")).count())

    spark.stop()
  }
}
