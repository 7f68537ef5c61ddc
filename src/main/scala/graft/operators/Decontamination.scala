package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination for training corpora: remove (or flag) any
 * training document sharing at least `minOverlap` distinct word n-gram
 * shingles with an evaluation/benchmark set — the standard guard against
 * test-set leakage in LLM pretraining pipelines (the n-gram-overlap
 * method popularized by GPT-2/GPT-3 and the open reproductions).
 *
 * Scale design (100 TB corpus, benchmark ≪ corpus): the benchmark's
 * distinct shingle set is SMALL (eval suites are thousands of documents)
 * — it broadcast-joins against the corpus posting list, so the corpus
 * side stays a narrow scan + explode with NO corpus-wide shuffle; only
 * the matched postings (≈ contamination volume, tiny) shuffle into the
 * per-document overlap count. Shingles compare as xxhash64 longs, same
 * collision-rate argument as Dedup.ngramJaccardPairs.
 */
object Decontamination {

  /** Per-document overlap counts ≥ `minOverlap` against the eval set:
    * (idCol, n_shared) for contaminated documents only. */
  def overlaps(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame = {
    def shingleHashes(df: DataFrame, text: String) =
      df.select(explode(array_distinct(Dedup.shingles(col(text), n))).as("__sh"))
        .select(xxhash64(col("__sh")).as("sh"))
    val evalShingles = shingleHashes(evalDocs, evalTextCol).distinct()
    docs.select(col(idCol), explode(array_distinct(Dedup.shingles(col(textCol), n))).as("__sh"))
      .select(col(idCol), xxhash64(col("__sh")).as("sh"))
      .join(broadcast(evalShingles), Seq("sh"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
  }

  /** [[overlaps]] over a corpus frame that ALREADY carries its distinct
    * shingle array in `shCol` — the shared-tokenization form used by
    * `Pipelines.curationAudit` (whose shared projection feeds four
    * consumers; `curateCorpus` measured the other way and keeps the
    * text form — round-13 A/B in COVERAGE.md): corpus side explodes the
    * existing arrays, eval side (tiny, broadcast) still shingles its
    * own text. Result-identical to [[overlaps]] when `shCol` holds
    * `array_distinct(Dedup.shingles(textCol, n))`. */
  def overlapsPreShingled(docs: DataFrame, idCol: String, shCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame = {
    val evalShingles = evalDocs
      .select(explode(array_distinct(Dedup.shingles(col(evalTextCol), n))).as("__sh"))
      .select(xxhash64(col("__sh")).as("sh"))
      .distinct()
    docs.select(col(idCol), explode(col(shCol)).as("__sh"))
      .select(col(idCol), xxhash64(col("__sh")).as("sh"))
      .join(broadcast(evalShingles), Seq("sh"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
  }

  /**
   * Contamination ATTRIBUTION: which benchmark document does each
   * contaminated training document overlap, and by how much — the
   * audit-trail report a decontamination pass ships alongside the drop
   * list (so a leak can be traced to the leaking eval item, not just
   * flagged). One row per (training doc, eval doc) pair sharing at
   * least `minOverlap` distinct n-gram shingles.
   *
   * Scale: same shape as [[overlaps]] — the eval posting list (id +
   * shingle hash) broadcasts, the corpus side stays a narrow
   * scan + explode, and only MATCHED postings (≈ contamination volume)
   * reach the per-pair count aggregate. The output is bounded by
   * contaminated-docs × eval-docs-they-touch, tiny by construction.
   */
  def attributionReport(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalIdCol: String, evalTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame = {
    val evalPostings = evalDocs
      .select(col(evalIdCol).as("eval_id"),
        explode(array_distinct(Dedup.shingles(col(evalTextCol), n))).as("__sh"))
      .select(col("eval_id"), xxhash64(col("__sh")).as("sh"))
      .distinct()
    docs.select(col(idCol), explode(array_distinct(Dedup.shingles(col(textCol), n))).as("__sh"))
      .select(col(idCol), xxhash64(col("__sh")).as("sh"))
      .join(broadcast(evalPostings), Seq("sh"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minOverlap)
  }

  /**
   * SEMANTIC contamination screen: benchmark leakage the n-gram pass
   * ([[overlaps]]) cannot see — rephrased, templated or translated eval
   * items keep almost no shingle overlap with their training-set twin
   * but stay nearly identical in embedding space (the
   * "rephrased-samples" contamination class; SemDeDup's cosine
   * machinery pointed at the EVAL set instead of the corpus itself).
   * One row per CONTAMINATED training document: its closest eval item
   * at cosine ≥ `threshold` — (idCol, eval_id, cosine), deterministic
   * argmax (highest cosine, then smallest eval id).
   *
   * Scale: the eval side is benchmark-sized (10³–10⁵ rows) and
   * BROADCASTS; the corpus side is one narrow scan through a broadcast
   * nested-loop join whose cosine + threshold filter run INSIDE the
   * scan stage (codegen'd custom expression, no UDF), so rows reach the
   * argmax shuffle only for documents that are actually contaminated
   * (≈ contamination volume, rare) — the same cost shape as the
   * Bloom-screened n-gram pass. For eval sets too large to broadcast,
   * the batch IVF k-NN join (`Similarity` — oracled by
   * x_knn_join_ivf/x_knn_join_ivfpq) is the prescreen: cluster-bucketed
   * candidates, same cosine verify.
   */
  def semanticOverlaps(docs: DataFrame, idCol: String, embCol: String,
      evalDocs: DataFrame, evalIdCol: String, evalEmbCol: String,
      threshold: Double = 0.95): DataFrame = {
    // the output schema is (idCol, eval_id, cosine) — a corpus id
    // column literally named like an output column would make the
    // cross-joined frame ambiguous, so refuse loudly (round-13 review)
    require(idCol != "eval_id" && idCol != "cosine",
      s"idCol '$idCol' collides with semanticOverlaps output columns")
    val ev = evalDocs.select(col(evalIdCol).as("eval_id"),
      col(evalEmbCol).as("__ee"))
    // deterministic argmax under ties: highest cosine, then smallest
    // eval id (Dedup.pickTopByScore — the one shared tie-break impl)
    val idIsNumeric = ev.schema("eval_id").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    docs.select(col(idCol).as("__cid"), col(embCol).as("__de"))
      .crossJoin(broadcast(ev))
      .withColumn("__cos", graft.functions.cosine_sim(col("__de"), col("__ee")))
      .where(col("__cos") >= threshold)
      .groupBy(col("__cid"))
      .agg(
        Dedup.pickTopByScore(col("eval_id"), idIsNumeric, col("__cos")).as("eval_id"),
        max(col("__cos")).as("cosine"))
      .withColumnRenamed("__cid", idCol)
  }

  /** The semantically clean corpus: anti-join against
    * [[semanticOverlaps]] (the embedding-space analogue of
    * [[decontaminate]]). */
  def semanticDecontaminate(docs: DataFrame, idCol: String, embCol: String,
      evalDocs: DataFrame, evalIdCol: String, evalEmbCol: String,
      threshold: Double = 0.95): DataFrame =
    docs.join(
      semanticOverlaps(docs, idCol, embCol, evalDocs, evalIdCol,
        evalEmbCol, threshold).select(idCol),
      Seq(idCol), "left_anti")

  /** The clean corpus: documents whose benchmark shingle overlap stays
    * below `minOverlap` (anti-join against [[overlaps]]). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      n: Int = 3, minOverlap: Int = 5): DataFrame =
    docs.join(
      overlaps(docs, idCol, textCol, evalDocs, evalTextCol, n, minOverlap)
        .select(idCol),
      Seq(idCol), "left_anti")

  /**
   * Bloom-screened decontamination — SAME RESULT as [[decontaminate]]
   * (the oracle contract), different 100 TB cost profile. A Bloom filter
   * over the eval shingle hashes (~1.2 bytes/element at 1% fpp vs 8-byte
   * longs in a hash set — ~7× smaller broadcast) screens every corpus
   * document with a row-local array probe: docs whose BLOOM-positive
   * shingle count stays below `minOverlap` are provably clean (the Bloom
   * count is an upper bound on the true overlap — no false negatives),
   * and only the candidate superset (≈ contamination volume + fpp tail)
   * re-runs the exact posting-list verify. The corpus-wide pass is thus
   * a narrow scan with NO explode and NO shuffle; the explode +
   * broadcast-join of [[overlaps]] touches candidates only.
   *
   * The Bloom probe is a native codegen expression
   * ([[graft.functions.BloomCountHits]] — primitives straight off
   * `ArrayData` inside the scan's codegen span); it replaced the
   * original Scala UDF, which boxed every shingle hash of every corpus
   * row across the closure boundary.
   */
  def decontaminateBloom(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      n: Int = 3, minOverlap: Int = 5, fpp: Double = 0.01): DataFrame = {
    def shingleHashes(df: DataFrame, text: String) =
      df.select(explode(array_distinct(Dedup.shingles(col(text), n))).as("__sh"))
        .select(xxhash64(col("__sh")).as("sh"))
    // persisted across the two driver-side jobs (count sizes the filter,
    // bloomFilter builds it) so the eval set shingles once, not twice;
    // released before the lazy result returns — overlaps() re-derives
    // its own eval postings on the (tiny) candidate verify path
    val evalShingles = shingleHashes(evalDocs, evalTextCol).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bloom =
      try evalShingles.stat.bloomFilter("sh", math.max(evalShingles.count(), 1L), fpp)
      finally evalShingles.unpersist(blocking = false)
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    val hashes = transform(array_distinct(Dedup.shingles(col(textCol), n)),
      s => xxhash64(s))
    // native probe expression (no per-hash boxing across a UDF
    // boundary); coalesce keeps the old null contract: a null text
    // yields 0 hits, i.e. never a candidate
    val candidates = docs.where(
      coalesce(graft.functions.bloom_count_hits(hashes, bc), lit(0)) >= minOverlap)
    val contaminated =
      overlaps(candidates, idCol, textCol, evalDocs, evalTextCol, n, minOverlap)
        .select(idCol)
    docs.join(contaminated, Seq(idCol), "left_anti")
  }
}
