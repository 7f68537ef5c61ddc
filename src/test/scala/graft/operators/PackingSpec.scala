package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Global concat-and-chunk sequence packing: distributed prefix sum,
  * doc→sequence spans, corpus packing stats, token-budget prefix cut. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val counts = Seq(
    (1L, 3L), (2L, 5L), (3L, 0L), (4L, 4L), (5L, 2L), (6L, 7L))
    .toDF("doc_id", "n")

  test("packOffsetsFromCounts: offsets, sequence spans, empty docs") {
    val r = Packing.packOffsetsFromCounts(counts, "doc_id", "n", seqLen = 4,
      partitions = 3).orderBy("doc_id").collect()
    // stream: 1:[0,3) 2:[3,8) 3:[8,8) 4:[8,12) 5:[12,14) 6:[14,21)
    assert(r.map(_.getAs[Long]("global_off")).toSeq ==
      Seq(0L, 3L, 8L, 8L, 12L, 14L))
    assert(r.map(_.getAs[Long]("first_seq")).toSeq ==
      Seq(0L, 0L, 2L, 2L, 3L, 3L))
    // doc 2 crosses seq 0→1; doc 6 spans seqs 3..5; empty doc 3 sits at
    // its stream position (first_seq == last_seq)
    assert(r.map(_.getAs[Long]("last_seq")).toSeq ==
      Seq(0L, 1L, 2L, 2L, 3L, 5L))
    assert(r.map(_.getAs[Long]("seq_off")).toSeq ==
      Seq(0L, 3L, 0L, 0L, 0L, 2L))
  }

  test("derivePartitions: explicit count honored, tiny input derives 1, unknown stats fall back") {
    // explicit > 0 is verbatim (partition-invariance pin depends on it)
    assert(Packing.derivePartitions(counts, 8) == 8)
    // a 6-row local relation derives the minimum, not the old 64
    assert(Packing.derivePartitions(counts, 0) == 1)
    // auto default end-to-end: same offsets as any explicit partitioning
    val auto = Packing.packOffsetsFromCounts(counts, "doc_id", "n", 4)
      .orderBy("doc_id").collect().map(_.getAs[Long]("global_off")).toSeq
    assert(auto == Seq(0L, 3L, 8L, 8L, 12L, 14L))
  }

  test("packOffsetsFromCounts: partition-invariant (1, 3, and 8 partitions agree)") {
    val one = Packing.packOffsetsFromCounts(counts, "doc_id", "n", 4, partitions = 1)
      .orderBy("doc_id").collect().toSeq
    val eight = Packing.packOffsetsFromCounts(counts, "doc_id", "n", 4, partitions = 8)
      .orderBy("doc_id").collect().toSeq
    assert(one == eight)
  }

  test("packOffsets: text tokenization matches tokenCount semantics, blanks count 0") {
    val docs = Seq((1L, "a b c"), (2L, "  "), (3L, "x y"))
      .toDF("doc_id", "text")
    val r = Packing.packOffsets(docs, "doc_id", "text", seqLen = 4)
      .orderBy("doc_id").collect()
    assert(r.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 0L, 2L))
    assert(r.map(_.getAs[Long]("global_off")).toSeq == Seq(0L, 3L, 3L))
    // doc 3 crosses the 4-token boundary: tokens [3,5) → seqs 0..1
    assert(r(2).getAs[Long]("first_seq") == 0L &&
      r(2).getAs[Long]("last_seq") == 1L)
  }

  test("packingStats: totals, ceil sequence count, tail padding, split docs") {
    val docs = Seq(
      (1L, "t t t"), (2L, "t t t t t"), (3L, ""), (4L, "t t t t"),
      (5L, "t t"), (6L, "t t t t t t t")).toDF("doc_id", "text")
    val r = Packing.packingStats(docs, "doc_id", "text", seqLen = 4).collect()(0)
    assert(r.getAs[Long]("total_tokens") == 21L)
    assert(r.getAs[Long]("n_seqs") == 6L) // ceil(21/4)
    assert(r.getAs[Long]("pad_tokens") == 3L) // 24 - 21
    assert(r.getAs[Long]("split_docs") == 2L) // docs 2 and 6
  }

  test("packingStats: empty corpus is all zeros, not nulls") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = Packing.packingStats(docs, "doc_id", "text", seqLen = 4).collect()(0)
    assert(r.getAs[Long]("total_tokens") == 0L && r.getAs[Long]("n_seqs") == 0L &&
      r.getAs[Long]("pad_tokens") == 0L && r.getAs[Long]("split_docs") == 0L)
  }

  test("selectByTokenBudget: maximal quality-ordered prefix, whole docs only") {
    // quality order (desc, id tiebreak): d1(q9,10t) d2(q8,8t) d3(q8,3t) d4(q1,2t)
    val docs = Seq(
      (1L, Seq.fill(10)("t").mkString(" "), 9.0),
      (2L, Seq.fill(8)("t").mkString(" "), 8.0),
      (3L, "t t t", 8.0), // same rank as d2 → id breaks the tie, d2 first
      (4L, "t t", 1.0)).toDF("doc_id", "text", "q")
    // budget 18: d1(0+10) + d2(10+8) fit exactly; d3 at off 18 overflows
    val kept18 = Packing.selectByTokenBudget(docs, "doc_id", "text", "q", 18L)
      .orderBy("doc_id").collect()
    assert(kept18.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(kept18.map(_.getAs[Long]("global_off")).toSeq == Seq(0L, 10L))
    // budget 20: d3 (off 18, 3 tokens) would end at 21 — still out;
    // nothing after the first overflow can fit (prefix property)
    assert(Packing.selectByTokenBudget(docs, "doc_id", "text", "q", 20L)
      .count() == 2L)
    // budget 21: the full d1..d3 prefix fits; d4 at off 21 overflows 23
    assert(Packing.selectByTokenBudget(docs, "doc_id", "text", "q", 21L)
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("materializeSequences: sequences reconstruct the concatenated stream exactly") {
    val docs = Seq(
      (1L, "a1 a2 a3"), (2L, "b1 b2 b3 b4 b5"), (3L, ""), (4L, "c1 c2 c3 c4"),
      (5L, "d1 d2"), (6L, "e1 e2 e3 e4 e5 e6 e7")).toDF("doc_id", "text")
    val r = Packing.materializeSequences(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
    // stream: a1 a2 a3 | b1..b5 | c1..c4 | d1 d2 | e1..e7 = 21 tokens → 6 seqs
    val expected = Seq(
      "a1 a2 a3 b1", "b2 b3 b4 b5", "c1 c2 c3 c4",
      "d1 d2 e1 e2", "e3 e4 e5 e6", "e7")
    assert(r.map(_.getAs[Long]("seq_id")).toSeq == (0L to 5L))
    assert(r.map(_.getAs[String]("seq_text")).toSeq == expected)
    // every sequence is exactly seqLen except the final partial one
    assert(r.dropRight(1).forall(_.getAs[Long]("n_tokens") == 4L) &&
      r.last.getAs[Long]("n_tokens") == 1L)
    // cross-check: the joined sequences ARE the original stream
    assert(r.map(_.getAs[String]("seq_text")).mkString(" ") ==
      "a1 a2 a3 b1 b2 b3 b4 b5 c1 c2 c3 c4 d1 d2 e1 e2 e3 e4 e5 e6 e7")
    spark.catalog.clearCache()
  }

  test("materializeSequences agrees with packOffsets spans") {
    // a long doc spanning 3+ sequences: its slices land where the
    // offsets table says they do
    val docs = Seq((1L, "x x"), (2L, (1 to 11).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    val seqs = Packing.materializeSequences(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id").collect()
    val offs = Packing.packOffsets(docs, "doc_id", "text", seqLen = 4)
      .where($"doc_id" === 2L).collect()(0)
    assert(offs.getAs[Long]("first_seq") == 0L && offs.getAs[Long]("last_seq") == 3L)
    assert(seqs.map(_.getAs[String]("seq_text")).toSeq ==
      Seq("x x y1 y2", "y3 y4 y5 y6", "y7 y8 y9 y10", "y11"))
    spark.catalog.clearCache()
  }

  test("selectByTokenBudget: zero-token docs are never selected") {
    val docs = Seq((1L, "t t", 5.0), (2L, "", 9.0)).toDF("doc_id", "text", "q")
    val kept = Packing.selectByTokenBudget(docs, "doc_id", "text", "q", 10L)
      .collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("selectByTokenBudget: non-numeric rank column fails loud at plan time") {
    // a string rank would silently null the negated sort key and
    // scramble the quality order — the require turns that into an error
    val docs = Seq((1L, "t t", "high"), (2L, "t", "low"))
      .toDF("doc_id", "text", "q")
    val e = intercept[IllegalArgumentException] {
      Packing.selectByTokenBudget(docs, "doc_id", "text", "q", 10L)
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("plan: one range exchange feeds per-partition windows; base join broadcasts") {
    val plan = Packing.packOffsetsFromCounts(counts, "doc_id", "n", 4,
      partitions = 3).queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"no range exchange in:\n$plan")
    // the corpus-sized window is partitioned (by __pid) — the only
    // unpartitioned window runs on the |partitions|-row totals frame
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"base-offset join did not broadcast:\n$plan")
    // BOTH consumers of the ranged frame (the per-partition window and
    // the totals aggregate) must read the ONE cached materialization —
    // that shared cache is what pins a single sampled partitioning for
    // base/local alignment. Two InMemoryTableScans = both substituted;
    // rangepartitioning lines beyond those are the cache's printed
    // build lineage, not live exchanges.
    assert(plan.linesIterator.count(_.contains("InMemoryTableScan")) == 2,
      s"both prefix-sum consumers must read the persisted ranged frame:\n$plan")
    spark.catalog.clearCache()
  }
}
