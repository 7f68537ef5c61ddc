package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{bpe_pairs, bpe_tokens}

/**
 * Distributed BPE tokenizer training — the corpus-statistics side of
 * byte-pair encoding (Sennrich '16: iteratively merge the most frequent
 * adjacent symbol pair). The reference delegates tokenization to its
 * host model (ref `app/models/trainer.py:53-61`); at 100 TB the
 * TRAINING of that tokenizer is itself a corpus analytics job, and its
 * inner loop is exactly one partial+final aggregate per iteration:
 *
 *   pairs(corpus, merges) → groupBy(pair) → top-1 → append merge
 *
 * Scale: each iteration is ONE shuffle of (pair, partial-count) rows —
 * the pair segmentation runs inside whole-stage codegen
 * ([[graft.functions.BpeUnits]]), partial aggregation collapses the
 * per-partition pair multiset before the exchange, and only the
 * singleton winner reaches the driver. k merges = k passes; production
 * tokenizer training caps the corpus with a deterministic sample
 * ([[Sampling.deterministicSample]]) since pair statistics converge
 * long before the full corpus is seen — the loop accepts any DataFrame,
 * so the caller chooses the sample size.
 */
object Bpe {

  /**
   * Adjacent symbol-pair frequencies over the corpus under the current
   * merge vocabulary. Output: (pair_a, pair_b, cnt) — the two symbols
   * and the number of adjacent occurrences (word-boundary-restricted,
   * every occurrence counts). One explode + one map-side-combined
   * aggregate; no join, no second scan.
   */
  def pairCounts(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)] = Nil): DataFrame =
    docs.select(explode(bpe_pairs(col(textCol), merges)).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("cnt"))
      .select(
        substring_index(col("pair"), " ", 1).as("pair_a"),
        substring_index(col("pair"), " ", -1).as("pair_b"),
        col("cnt"))

  /**
   * Learn `k` merges: each iteration counts pairs under the merges so
   * far and appends the most frequent (ties broken by (pair_a, pair_b)
   * ascending so training is deterministic across partitionings).
   * Stops early when no pair reaches `minCount` — merging singletons
   * overfits the tail. The driver holds only the merge list (k rows);
   * the corpus is never collected.
   */
  def trainMerges(docs: DataFrame, textCol: String, k: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(k >= 0)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (merges.size < k && !stop) {
      val top = pairCounts(docs, textCol, merges.toSeq)
        .orderBy(col("cnt").desc, col("pair_a"), col("pair_b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) stop = true
      else merges += ((top(0).getAs[String]("pair_a"), top(0).getAs[String]("pair_b")))
    }
    merges.toSeq
  }

  /** Tokenize a text column under a trained merge vocabulary — the
    * serving half: an array column of BPE symbols, word-boundary
    * restricted, evaluated inside whole-stage codegen. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    bpe_tokens(text, merges)

  /**
   * Corpus token statistics under a vocabulary — the measurement a
   * tokenizer-selection loop runs per candidate: total symbols,
   * symbols per document, distinct symbol count. One pass.
   */
  def vocabStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    // explode_outer: a symbol-less document (empty/whitespace text)
    // still contributes its id row, so n_docs counts the CORPUS — with
    // plain explode a per-document average would silently inflate
    docs.select(col(idCol), explode_outer(encode(col(textCol), merges)).as("sym"))
      .agg(count(col("sym")).as("total_symbols"),
        countDistinct(col("sym")).as("distinct_symbols"),
        countDistinct(col(idCol)).as("n_docs"))
}
