package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the round-4 hot spots (x_curate 65s,
  * x_dedup_groups 23s, x_decontam 6.9s at sf0.1 in BENCH_r04) so the
  * round-5 fixes target the actual cost, not the guessed one. */
object ProbeRound5 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    val docs = spark.table("documents")
    time("docs.count")(docs.count())

    import graft.operators.{Dedup, Decontamination, Pipelines, Sampling}

    // ---- x_decontam stages ----
    val evalSet = docs.where(col("doc_id") % 97 === 0)
    time("decontam.overlaps")(
      Decontamination.overlaps(docs, "doc_id", "text", evalSet, "text", 3, 5).count())
    time("decontam.full")(
      Decontamination.decontaminate(docs, "doc_id", "text", evalSet, "text", 3, 5)
        .select(col("doc_id")).orderBy("doc_id").limit(2000).count())

    // ---- x_dedup_groups stages ----
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"))
    time("groups.pairs.count")(pairs.count())
    time("groups.full")(
      Dedup.duplicateGroups(pairs).orderBy("id").limit(1000).count())

    // ---- x_curate stages (hand-inlined from Pipelines.curateCorpus) ----
    val quality = Pipelines.qualityFilter(docs, "doc_id", "text")
    time("curate.quality.count")(quality.count())
    val exact = Dedup.dedupExact(quality, "doc_id", Seq("text"))
    time("curate.exact.count")(exact.count())
    val prs = Dedup.minhashNearDuplicates(exact, "doc_id", "text", Pipelines.DefaultNearThreshold)
    time("curate.pairs.count")(prs.count())
    val losers = prs.select(col("id_b").as("doc_id")).distinct()
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
    time("curate.deduped.count")(deduped.count())
    val clean = Decontamination.decontaminate(
      deduped, "doc_id", "text", evalSet, "text", n = 3, minOverlap = 5)
    time("curate.clean.count")(clean.count())
    val split = Sampling.split(clean, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    time("curate.split.count")(
      split.select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000).count())
    time("curate.FULL") {
      Pipelines.curateCorpus(docs, "doc_id", "text", evalSet, "text")
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000).count()
    }
    spark.stop()
  }
}
