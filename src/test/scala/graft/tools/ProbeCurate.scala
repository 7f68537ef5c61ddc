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

    time("x_curate_full") {
      graft.operators.Pipelines.curateCorpus(docs, "doc_id", "text",
        evalDocs, "text")
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
        .collect().length
    }
    time("x_curation_audit_full") {
      graft.operators.Pipelines.curationAudit(docs, "doc_id", "text",
        evalDocs, "text")
        .orderBy("doc_id").limit(2000).collect().length
    }
    // cumulative stage costs (each includes its predecessors)
    val quality = graft.operators.Pipelines.qualityFilter(docs, "doc_id", "text")
    time("s1_quality")(quality.count())
    val exact = graft.operators.Dedup.dedupExact(quality, "doc_id", Seq("text"))
    time("s2_exact")(exact.count())
    time("s3_pairs") {
      graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.8)
        .count()
    }
    time("s4_antijoin") {
      val pairs = graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.8)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      exact.join(losers, Seq("doc_id"), "left_anti").count()
    }
    time("s5_decontam") {
      val pairs = graft.operators.Dedup.minhashNearDuplicates(exact, "doc_id", "text", 0.8)
      val losers = pairs.select(col("id_b").as("doc_id")).distinct()
      val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      graft.operators.Decontamination.decontaminate(
        deduped, "doc_id", "text", evalDocs, "text", n = 3, minOverlap = 5).count()
    }
    spark.stop()
  }
}
