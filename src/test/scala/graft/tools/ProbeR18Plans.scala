package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 deliverable: `.explain("formatted")` before/after dumps for
  * every query the optimization round touched, written to plans/r18/.
  * "Before" plans are reconstructed by calling the SAME operators with
  * the pre-round constants (partitions = 64, smallGraphThreshold = 0,
  * LshConfig(128, 16), corpus-wide scoring) — the code paths still
  * exist behind explicit parameters, so the dumped shapes are exactly
  * the pre-change plans. */
object ProbeR18Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    Files.createDirectories(Paths.get("plans/r18"))

    def dump(name: String, df: DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r18/$name.txt"), s)
      println(s"PROBE wrote plans/r18/$name.txt (${s.length} chars)")
      spark.catalog.clearCache()
    }
    def after(q: String): Unit =
      dump(s"${q}_after", graft.SparkEntry.queries(q)(spark, dir))

    import graft.operators.{Dedup, Packing, Graphs, TextAnalysis}
    val docs = spark.table("documents")

    // --- packing family: partitions 64 (before) vs size-derived (after)
    dump("x_pack_offsets_before",
      Packing.packOffsets(docs, "doc_id", "text", seqLen = 256, partitions = 64)
        .orderBy("doc_id"))
    after("x_pack_offsets")
    dump("x_pack_materialize_before",
      Packing.materializeSequences(docs, "doc_id", "text", seqLen = 256,
        partitions = 64).orderBy("seq_id"))
    after("x_pack_materialize")
    dump("x_pack_stats_before",
      Packing.packingStats(docs, "doc_id", "text", seqLen = 256, partitions = 64))
    after("x_pack_stats")
    dump("x_token_budget_before",
      Packing.selectByTokenBudget(docs, "doc_id", "text", "n_chars",
        budgetTokens = 20000L, partitions = 64).orderBy("doc_id"))
    after("x_token_budget")
    // x_pack_streamed: three maintainer batches unioned — partitions flow
    // through PackingMaintainer's default; before = explicit 64
    locally {
      val m = new graft.streaming.Streams.PackingMaintainer(
        "doc_id", "text", seqLen = 256, partitions = 64)
      val mx = docs.agg(max("doc_id")).collect()(0).getLong(0)
      val batches = Seq(
        docs.where(col("doc_id") <= mx / 3),
        docs.where(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
        docs.where(col("doc_id") > 2 * mx / 3))
      dump("x_pack_streamed_before",
        batches.zipWithIndex.map { case (b, i) => m.onBatch(b, i.toLong) }
          .reduce(_ unionByName _).orderBy("doc_id"))
    }
    after("x_pack_streamed")

    // --- reachability: distributed loop (before) vs driver BFS (after)
    locally {
      val d = docs.select(col("doc_id"))
      val raw = d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 7 + 3) % 31).as("dst"))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 13 + 5) % 31).as("dst")))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 3 + 11) % 31).as("dst")))
        .where(col("src") =!= col("dst"))
      val sources = spark.range(1).select(lit(0L).as("node"))
      dump("x_graph_reach_before",
        Graphs.reachability(raw, sources, maxDepth = 10, smallGraphThreshold = 0L)
          .orderBy("node"))
    }
    after("x_graph_reach")

    // --- canonical dedup: corpus-wide scoring (before) vs member-only
    locally {
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      dump("x_dedup_canonical_before",
        Dedup.canonicalPerGroup(Dedup.duplicateGroups(pairs), "id", "group_id",
          scored, "doc_id", "q").orderBy("group_id").limit(1000))
    }
    after("x_dedup_canonical")

    // --- minhash: LshConfig(128, 16) (before) vs (64, 16) default
    dump("x_dedup_minhash_before",
      Dedup.minhashNearDuplicatesWithCleanup(docs, "doc_id", "text", 0.7,
          Dedup.LshConfig(numHashes = 128, bands = 16))._1
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b").limit(100))
    after("x_dedup_minhash")
    // x_curate / x_curation_audit consume the same default; plan shape is
    // identical before/after (only the minhash_buckets numHashes literal
    // changes) — dump the after plans for the record
    after("x_curate")
    after("x_curation_audit")

    spark.stop()
  }
}
