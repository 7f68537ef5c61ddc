package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Composite training-data pipelines: the end-to-end corpus operations a
 * data-curation job runs, composed from the individual operators.
 */
object Pipelines {

  /** Default near-dup threshold for [[dedupCorpus]] — referenced by the
    * stage-timing probe (ProbeCorpusTime) so its hand-inlined stages stay
    * in sync with the pipeline's defaults. */
  val DefaultNearThreshold = 0.85

  final case class DedupReport(
      input: Long, afterExact: Long, afterNear: Long,
      exactRemoved: Long, nearRemoved: Long)

  /**
   * Corpus deduplication: exact dedup (keep min id) then MinHash near-dup
   * removal (from each near-dup pair, drop the larger id — transitive
   * chains collapse to their minimum via iterated pair pruning on the
   * pair list, computed once).
   *
   * Returns the deduplicated corpus and a row-count report. Two shuffles
   * for exact (window) + the LSH pipeline for near; no driver-side data
   * except the bounded pair list aggregation counts.
   */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
      nearThreshold: Double = DefaultNearThreshold,
      cfg: Dedup.LshConfig = Dedup.LshConfig()): (DataFrame, DedupReport) = {
    import org.apache.spark.storage.StorageLevel
    val input = docs.count()
    // The exact-dedup window feeds three consumers (its own count, the
    // LSH pipeline, and the anti-join) — persist so the window computes
    // once instead of three times over the full corpus.
    val exact = Dedup.dedupExact(docs, idCol, Seq(textCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()

    val (pairs, releasePairs) =
      // groupExact = false: `exact` is the dedupExact output, so every
      // text is unique by construction — the r19 duplicate-grouping
      // exchange would only build singleton groups
      Dedup.minhashNearDuplicatesWithCleanup(exact, idCol, textCol, nearThreshold, cfg,
        groupExact = false)
    // drop the larger id of every near-dup pair; a doc surviving means no
    // pair names it as the larger member
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    val deduped = exact.join(losers, Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterNear = deduped.count()
    exact.unpersist(blocking = false)
    releasePairs()

    (deduped, DedupReport(
      input, afterExact, afterNear,
      exactRemoved = input - afterExact,
      nearRemoved = afterExact - afterNear))
  }

  /**
   * Document chunking for training-data preparation: split each document
   * into word-token windows of `chunkTokens` with `overlapTokens` of
   * overlap (the standard LLM-pretraining chunker shape). Pure built-in
   * expressions — the token array is computed once, windows are `slice`
   * over it, exploded with their index — so the whole operator is one
   * narrow projection per row; no shuffle, no UDF.
   *
   * Output: (idCol, chunk_index, chunk_text, chunk_tokens).
   */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 128, overlapTokens: Int = 16): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0)
    val stride = chunkTokens - overlapTokens
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val n = when(length(trim(col(textCol))) === 0, lit(0)).otherwise(size(toks))
    // number of chunks: ceil(max(n - overlap, 1) / stride), at least 1
    // for a non-empty doc
    val nChunks = greatest(lit(1), ceil((n - lit(overlapTokens)).cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .where(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("__pos", "chunk_index")))
      .select(col(idCol), col("chunk_index"),
        concat_ws(" ", slice(col("__toks"), col("chunk_index") * stride + 1, lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"), col("chunk_index") * stride + 1, lit(chunkTokens))).as("chunk_tokens"))
  }

  /**
   * Boilerplate removal (the corpus-level line/segment dedup of CCNet,
   * Wenzek et al., LREC 2020 — there applied to lines; here to
   * fixed-token segments since the corpus model is untokenized text):
   * drop every NON-OVERLAPPING `chunkTokens`-token segment that occurs
   * in more than `maxDocFreq` distinct documents (navigation chrome,
   * license headers, templated footers), then stitch each document back
   * together from its surviving segments in order. Documents whose
   * every segment is boilerplate disappear.
   *
   * Scale: segments hash to xxhash64 longs; the document-frequency pass
   * is a map-side-combined aggregate over (hash) — `collect_set` never
   * appears; the boilerplate set (rare by construction) joins back
   * as a shuffle join on the 8-byte hash, and reassembly is one
   * groupBy(doc) with an array_sort — no window over the corpus.
   */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 16, maxDocFreq: Int = 2): DataFrame = {
    val chunks = chunkDocuments(docs, idCol, textCol, chunkTokens, overlapTokens = 0)
      .select(col(idCol), col("chunk_index"), col("chunk_text"),
        xxhash64(col("chunk_text")).as("__h"))
    val boiler = chunks.select(col(idCol), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__docs"))
      .where(col("__docs") > maxDocFreq)
      .select("__h")
    chunks.join(boiler, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("chunk_index"), col("chunk_text")))).as("__cs"),
        count(lit(1)).as("n_kept_chunks"))
      .select(col(idCol),
        array_join(transform(col("__cs"), c => c.getField("chunk_text")), " ").as("clean_text"),
        col("n_kept_chunks"))
  }

  /**
   * Sequence packing: assign documents to fixed-capacity packs by
   * cumulative token count, SHARDED — each shard packs independently
   * with a per-shard running sum, so the window is partitioned (never
   * the single-partition global window the d14 verdict flagged). This
   * is the distributed form of greedy sequence packing: pack boundaries
   * are deterministic given the (shard, idCol) order.
   *
   * Output: (idCol, n_tokens, shard, pack_id) where pack_id is unique
   * across shards.
   */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      capacityTokens: Int = 2048, shards: Int = 8): DataFrame = {
    require(capacityTokens > 0 && shards > 0)
    val n = TextAnalysis.tokenCount(col(textCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .select(col(idCol), n.as("n_tokens"), pmod(col(idCol), lit(shards)).cast("int").as("shard"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("n_tokens"), col("shard"),
        (col("shard").cast("long") * 1000000L +
          floor((col("__cum") - col("n_tokens")) / capacityTokens).cast("long")).as("pack_id"))
  }

  /**
   * End-to-end corpus curation — the full preprocessing chain a
   * pretraining run needs, composed from the individual operators in
   * their production order:
   *
   *   1. quality gate (language / quality score / token band) — cheapest
   *      filter first, narrow, shuffle-free;
   *   2. exact dedup (keep min id per text) — map-side combining agg;
   *   3. MinHash-LSH near-dup removal among survivors;
   *   4. benchmark decontamination against `evalDocs` (broadcast);
   *   5. deterministic train/val/test split.
   *
   * Pure composition — no actions, the caller controls materialization;
   * returns the curated corpus tagged with its `split` column. The
   * near-dup stage persists its candidate-pair frame internally (it is
   * referenced twice and must not re-run the LSH pipeline); with no
   * terminal action here the cache cannot be released on the caller's
   * behalf — long-lived sessions should `spark.catalog.clearCache()` (or
   * unpersist via [[graft.operators.Dedup.minhashNearDuplicatesWithCleanup]])
   * after materializing the result.
   *
   * Composition choice is MEASURED, not assumed. Round 13 (ProbeCurate
   * interleaved A/B at sf0.1) kept the text form here — the shared-
   * shingle variant lost 2.05s vs 1.95s because carrying shingle
   * arrays through the anti-join/decontam exchanges cost more than
   * recomputing them in each stage's codegen span. Round 18 RE-measured
   * after the LSH signature halved (64 hashes): with hashing cheaper,
   * shingling's relative weight doubled and the shared form now WINS —
   * 2.07s vs 2.56s min-of-5, row-identical output
   * (ProbeR18CurateAB asserts set equality) — so this is the audit
   * twin's composition: shingle ONCE (lazy localCheckpoint, no session
   * cache entry), thread the distinct-shingle arrays through LSH
   * ([[Dedup.minhashNearDuplicatesPreShingled]]) and decontamination
   * ([[Decontamination.overlapsPreShingled]]). Stage math is identical
   * to the text form (MinHash is duplicate-invariant; the verify side
   * always used distinct arrays), so curate ≡ audit stays spec-pinned.
   */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      nearThreshold: Double = DefaultNearThreshold,
      minOverlap: Int = 5,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val quality = qualityFilter(docs, idCol, textCol)
    val exact = Dedup.dedupExact(quality, idCol, Seq(textCol))
    // shared shingle size comes from the LSH config (r18 ADVICE: a
    // literal here would silently diverge from the banding/decontam
    // semantics if LshConfig.shingleSize ever changed)
    val sharedN = Dedup.LshConfig().shingleSize
    val shared = exact.withColumn("__sh",
      array_distinct(Dedup.shingles(col(textCol), sharedN))).localCheckpoint(eager = false)
    val pairs = Dedup.minhashNearDuplicatesPreShingled(
      shared, idCol, "__sh", nearThreshold)
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    val deduped = shared.join(losers, Seq(idCol), "left_anti")
    val contam = Decontamination.overlapsPreShingled(
      deduped, idCol, "__sh", evalDocs, evalTextCol, n = sharedN, minOverlap = minOverlap)
      .select(col(idCol))
    val clean = deduped.join(contam, Seq(idCol), "left_anti").drop("__sh")
    Sampling.split(clean, idCol, splits)
  }

  /**
   * Per-document curation AUDIT: the lineage view of [[curateCorpus]] —
   * one row per INPUT document naming the first pipeline stage that
   * dropped it (`lang` / `quality` / `length` / `exact_dup` /
   * `near_dup` / `decontam`) or its split when kept. A release without
   * this is undebuggable: "why is my document missing from the corpus"
   * must be answerable per id, not from aggregate counts (the
   * "Datasheets for Datasets" audit-trail discipline the
   * [[corpusReport]] card summarizes). Stage precedence follows the
   * pipeline order, and the stage sets are computed on the SAME frames
   * the pipeline filters, so the audit agrees with [[curateCorpus]] row
   * for row (kept ids ≡ curated ids — spec-pinned).
   *
   * Scale: the gate flags are row-local expressions; the dedup /
   * decontam stage sets reuse the pipeline's own shapes (hash groupBy,
   * LSH pairs, broadcast eval postings) and join back BY ID — narrow
   * frames, AQE-decided broadcasts, never a text-keyed shuffle beyond
   * what the pipeline itself pays.
   */
  def curationAudit(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: DataFrame, evalTextCol: String,
      nearThreshold: Double = DefaultNearThreshold,
      minOverlap: Int = 5,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val t = col(textCol)
    val langOk = TextAnalysis.langId(t) === "en"
    val qualOk = TextAnalysis.qualityScore(t) >= 0.3
    val lenOk = TextAnalysis.tokenCount(t).between(5, 100000)
    val qpass = qualityFilter(docs, idCol, textCol)
    val exact = Dedup.dedupExact(qpass, idCol, Seq(textCol))
    // shared-tokenization projection (one shingle pass, lazily
    // checkpointed): FOUR consumers read it (exact-loser anti-join,
    // LSH, near-dup anti-join, decontam), which amortizes the
    // materialization — measured 2.02s vs 2.24s for the unshared
    // composition (ProbeCurate interleaved A/B, sf0.1 min-of-5).
    // curateCorpus, with fewer consumers, measured the OTHER way and
    // keeps the unshared form; the stage math is identical in both
    // (MinHash is duplicate-invariant), so audit ≡ pipeline row for
    // row stays spec-pinned
    val sharedN = Dedup.LshConfig().shingleSize // single shared constant (r18 ADVICE)
    val shared = exact
      .withColumn("__sh", array_distinct(Dedup.shingles(col(textCol), sharedN)))
      .localCheckpoint(eager = false)
    val exactLosers = qpass.select(col(idCol))
      .join(shared.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("__exact", lit(true))
    val pairs = Dedup.minhashNearDuplicatesPreShingled(
      shared, idCol, "__sh", nearThreshold)
    val nearLosers = pairs.select(col("id_b").as(idCol)).distinct()
      .withColumn("__near", lit(true))
    val deduped = shared.join(nearLosers.select(col(idCol)), Seq(idCol), "left_anti")
    val contam = Decontamination.overlapsPreShingled(
        deduped, idCol, "__sh", evalDocs, evalTextCol, n = sharedN, minOverlap = minOverlap)
      .select(col(idCol)).withColumn("__cont", lit(true))
    val bounds = splits.scanLeft(0L) { case (acc, (_, w)) => acc + (w * 1000).toLong }
    val splitExpr = splits.zipWithIndex.foldLeft(lit("dropped:remainder")) {
      case (acc, ((name, _), i)) =>
        when(Sampling.hashBucket(col(idCol)) >= bounds(i) &&
          Sampling.hashBucket(col(idCol)) < bounds(i + 1), lit(s"kept:$name"))
          .otherwise(acc)
    }
    docs.select(col(idCol), langOk.as("__lang"), qualOk.as("__qual"), lenOk.as("__len"))
      .join(exactLosers, Seq(idCol), "left")
      .join(nearLosers, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
      .select(col(idCol),
        when(!col("__lang"), "lang")
          .when(!col("__qual"), "quality")
          .when(!col("__len"), "length")
          .when(col("__exact"), "exact_dup")
          .when(col("__near"), "near_dup")
          .when(col("__cont"), "decontam")
          .otherwise(splitExpr).as("stage"))
  }

  /**
   * Per-source corpus statistics + mixing weights: document counts,
   * token volumes, and a temperature-scaled sampling weight
   * `n_docs^alpha / Σ n_docs^alpha` (the multinomial source-mixing
   * scheme of multilingual/multi-corpus pretraining, alpha < 1 upweights
   * small sources). One partial-aggregated groupBy over the corpus; the
   * normalizer is a broadcast scalar, so no second corpus pass and no
   * global window.
   */
  def sourceMix(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, alpha: Double = 0.7): DataFrame = {
    val n = TextAnalysis.tokenCount(col(textCol))
    val grouped = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(n.cast("long")).as("sum_tokens"),
        avg(n).as("avg_tokens_raw"))
    val total = grouped.agg(sum(pow(col("n_docs"), alpha)).as("__total"))
    grouped.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("sum_tokens"),
        round(col("avg_tokens_raw"), 4).as("avg_tokens"),
        round(pow(col("n_docs"), alpha) / col("__total"), 6).as("mix_weight"))
  }

  /**
   * Corpus quality filter: language allow-list + quality floor + length
   * band, composed as ONE narrow filter over the scan — no join, no
   * shuffle; the language/quality/token expressions evaluate once per row
   * inside a single whole-stage-codegen span and the filter sits directly
   * on the source. (The previous semi-join against the full analyze
   * projection re-evaluated the analysis trees on both sides of the join
   * — measured 2.5× slower at sf0.1 and a needless shuffle at 100 TB.)
   */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      minTokens: Int = 5, maxTokens: Int = 100000): DataFrame = {
    val t = col(textCol)
    docs.where(
      TextAnalysis.langId(t).isin(allowedLangs: _*) &&
        TextAnalysis.qualityScore(t) >= minQuality &&
        TextAnalysis.tokenCount(t).between(minTokens, maxTokens))
  }

  /**
   * Token-budget mixing plan: given a total training-token budget and
   * the [[sourceMix]] temperature weights, compute each source's
   * target token allocation and the deterministic per-mille sampling
   * rate that realizes it (capped at 1.0 — a source smaller than its
   * allocation contributes everything it has; the remainder is
   * reported, not silently redistributed). The planning face of the
   * "sample sources to a budget" step every pretraining data recipe
   * runs after weighting (the GPT-3/Pile-style table of
   * tokens-per-source); [[sampleToBudget]] enforces it.
   *
   * One corpus-pass groupBy (map-side combined) + a broadcast scalar —
   * the [[sourceMix]] shape with the budget arithmetic appended.
   */
  def sourceBudgetPlan(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Long,
      alpha: Double = 0.7): DataFrame = {
    require(budgetTokens > 0)
    val n = TextAnalysis.tokenCount(col(textCol))
    val grouped = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(n.cast("long")).as("sum_tokens"))
    val total = grouped.agg(sum(pow(col("n_docs"), alpha)).as("__total"))
    grouped.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("sum_tokens"),
        round(pow(col("n_docs"), alpha) / col("__total"), 6).as("mix_weight"),
        round(lit(budgetTokens.toDouble) * pow(col("n_docs"), alpha) / col("__total"), 0)
          .cast("long").as("target_tokens"),
        // per-mille granularity: the rate the hash filter can actually
        // realize (floor, so the budget is never overshot)
        (floor(least(lit(1.0),
          lit(budgetTokens.toDouble) * pow(col("n_docs"), alpha) /
            col("__total") / col("sum_tokens")) * 1000) / 1000).as("rate"))
  }

  /** Enforce a [[sourceBudgetPlan]]: keep each document iff its id-hash
    * per-mille bucket falls under its source's planned rate — one
    * id-keyed hash filter after a |sources|-row broadcast join,
    * deterministic across runs/partitionings/engines. */
  def sampleToBudget(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Long, alpha: Double = 0.7): DataFrame = {
    val plan = sourceBudgetPlan(docs, idCol, textCol, sourceCol, budgetTokens, alpha)
      .select(col("source").as("__mix_source"), col("rate").as("__mix_rate"))
    docs.join(broadcast(plan), docs(sourceCol) === plan("__mix_source"))
      .where(Sampling.hashBucket(col(idCol)) < (col("__mix_rate") * 1000).cast("long"))
      .drop("__mix_source", "__mix_rate")
  }

  /**
   * Per-source dataset card: the summary row a corpus release ships
   * with ("Datasheets for Datasets", Gebru et al., CACM 2021) — doc and
   * token volumes, mean quality, language spread, and exact-duplicate
   * exposure, one row per source. One enrichment projection inside the
   * scan's codegen span (token count, quality, md5 fingerprint — no
   * UDF), then two source-keyed aggregations (the duplicate exposure
   * needs the (source, fingerprint) grain first) joined on the
   * |sources|-row frame. Shuffles carry fingerprints and counters,
   * never text.
   */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val enriched = docs.select(col(sourceCol).as("source"), col(langCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("__tok"),
      TextAnalysis.qualityScore(col(textCol)).as("__q"),
      md5(col(textCol)).as("__fp"))
    val dupDocs = enriched.groupBy("source", "__fp")
      .agg(count(lit(1L)).as("n"))
      .where(col("n") > 1)
      .groupBy("source").agg(sum("n").as("__dup"))
    enriched.groupBy("source")
      .agg(count(lit(1L)).as("n_docs"),
        sum("__tok").as("sum_tokens"),
        round(avg("__q"), 4).as("avg_quality"),
        countDistinct(col(langCol)).as("n_langs"))
      .join(dupDocs, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("sum_tokens"),
        col("avg_quality"), col("n_langs"),
        coalesce(col("__dup"), lit(0L)).as("dup_docs"),
        round(coalesce(col("__dup"), lit(0L)).cast("double") / col("n_docs"), 4)
          .as("dup_rate"))
  }
}
