package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Global sequence packing — the concat-and-chunk step between a curated
 * corpus and a pretraining run: concatenate every document's token
 * stream in one deterministic total order and slice the stream into
 * fixed-length training sequences, letting documents SPLIT across
 * sequence boundaries. [[Pipelines.packSequences]] is the bin-packing
 * sibling (whole docs into per-shard bins, no splitting); this operator
 * is the zero-padding-except-tail layout GPT-style pipelines use. The
 * reference has no packing surface (its pipeline returns whole records,
 * `app/ai/nl2mongo.py:66-67`); training-data extension per the north
 * star.
 *
 * The core is a DISTRIBUTED PREFIX SUM over the document order — the
 * one part that does not compose from a plain groupBy:
 *
 *   1. `repartitionByRange(idCol)` — the same sampled range exchange a
 *      global `orderBy` plans, so ordered key runs land in ordered
 *      partitions (skew handled by the range sampler);
 *   2. per-partition running sum via a window PARTITIONED by
 *      `spark_partition_id()` — parallel, no single-partition window;
 *   3. per-partition totals (a |partitions|-row frame) prefix-summed on
 *      the tiny frame and broadcast-joined back as each partition's
 *      base offset.
 *
 * The partition BOUNDARIES are sampled (nondeterministic), but the
 * output is partition-invariant: prefix(base) + local running sum
 * telescopes to the same global offset under ANY contiguous split of
 * the order, so results are deterministic given unique `idCol`. The
 * tiny-frame prefix uses an unpartitioned window over |partitions|
 * rows — bounded by cluster size, never by data (the documented
 * bounded-frame window pattern). Steps 2-3 both consume ONE persisted
 * materialization of the ranged frame (see [[globalPrefixSum]] — the
 * PackingSpec plan pin asserts both consumers read the cache), and the
 * frame is narrow (id + count) either way.
 *
 * Every output column is an exact BIGINT (hashed-oracle-surface rule,
 * COVERAGE.md): token counts, global offsets, sequence ids, in-sequence
 * offsets — no doubles anywhere.
 *
 * At 100 TB: the corpus crosses the wire once as (id, n_tokens) — two
 * narrow columns, not text; the range exchange is the same cost as any
 * global sort of the id column; everything after is per-partition
 * window arithmetic plus a cluster-sized side frame.
 */
object Packing {

  /** Scale-adaptive range-partition count for the prefix sum: every
    * public entry point defaults `partitions = 0`, meaning "derive from
    * the input's optimizer size estimate" — a fixed constant is wrong at
    * BOTH ends (64 partitions over a kilobyte fixture pays 64× the task
    * overhead for nothing; 64 over a 100 TB corpus's counts frame makes
    * multi-GB partitions). Target ~32 MB of the narrow (id, count)
    * frame per partition, floored at 1 and capped at
    * max(4 × defaultParallelism, 64) so the count grows with the
    * cluster, not unboundedly with a bad estimate. Inputs with no
    * usable estimate (> 1 PiB ≈ the catalyst unknown-stats sentinel,
    * e.g. LogicalRDD-backed streaming batches) keep the historical 64.
    * Explicit `partitions > 0` is honored verbatim (the PackingSpec
    * partition-invariance pin relies on it; results are
    * partition-invariant either way).
    *
    * Known low-side limitation (r18 ADVICE): the estimate comes from
    * Catalyst stats, which can badly UNDERestimate after selective
    * filters/joins, deriving too few partitions and serializing the
    * sort — a perf-only risk (results are partition-invariant). Callers
    * packing a heavily filtered input should pass `partitions`
    * explicitly; an automatic floor was considered and rejected because
    * it would re-introduce constant-factor task overhead on the common
    * (unfiltered scan) path the derivation exists to fix. */
  private[operators] def derivePartitions(df: DataFrame, explicit: Int): Int =
    if (explicit > 0) explicit
    else {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val cap = math.max(4L * df.sparkSession.sparkContext.defaultParallelism, 64L)
      if (bytes > (BigInt(1L) << 50)) 64
      else math.max(1L, math.min(bytes.toLong / (32L << 20) + 1L, cap)).toInt
    }

  /** Exclusive global token offset of each row under the total order
    * `orderCol` (must be unique): (columns of `df`) + `__off`.
    * `nTokensCol` must be a non-negative BIGINT.
    *
    * The ranged frame is persisted internally: the per-partition window
    * and the per-partition totals both key on `spark_partition_id()`,
    * and the RangePartitioner samples its boundaries per physical
    * exchange — two independently-planned exchanges could sample
    * DIFFERENT boundaries and silently misalign base offsets against
    * local sums. One cached materialization pins one partitioning for
    * both consumers (same contract as the LSH candidate persist,
    * `Dedup.minhashNearDuplicates`); the frame is narrow (key + count).
    * Long-lived sessions release it via `spark.catalog.clearCache()`
    * after materializing the result. */
  private[graft] def globalPrefixSum(df: DataFrame, orderCol: String,
      nTokensCol: String, partitions: Int): DataFrame = {
    val ranged = df.repartitionByRange(derivePartitions(df, partitions), col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val localW = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("__local",
      coalesce(sum(col(nTokensCol)).over(localW), lit(0L)))
    // |partitions|-row totals frame: prefix on the tiny frame only —
    // an unpartitioned window over a cluster-sized (never data-sized)
    // frame, the documented bounded-frame pattern
    val baseW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = ranged.groupBy(col("__pid"))
      .agg(sum(col(nTokensCol)).as("__ptotal"))
      .withColumn("__base", coalesce(sum(col("__ptotal")).over(baseW), lit(0L)))
      .select(col("__pid"), col("__base"))
    local.join(broadcast(bases), Seq("__pid"))
      .withColumn("__off", col("__base") + col("__local"))
      .drop("__pid", "__local", "__base")
  }

  /**
   * Pre-tokenized form — the actual engine: `df` carries `idCol`
   * (unique, orderable) and `nTokensCol` (non-negative BIGINT). Output
   * one row per document, all BIGINT:
   *
   *   - `n_tokens`    — the document's token count;
   *   - `global_off`  — tokens before this document in the stream;
   *   - `first_seq`   — sequence index of the document's first token
   *                     (`global_off div seqLen`);
   *   - `last_seq`    — sequence index of its last token; an EMPTY
   *                     document occupies no tokens and reports
   *                     `last_seq = first_seq` (it "sits at" its
   *                     stream position);
   *   - `seq_off`     — offset of the first token inside `first_seq`.
   */
  def packOffsetsFromCounts(df: DataFrame, idCol: String,
      nTokensCol: String, seqLen: Int, partitions: Int = 0,
      base: Long = 0L): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // `base` shifts the whole stream: the streaming maintainer packs
    // each arriving batch CONTINUING from the tokens already ingested
    // (`Streams.PackingMaintainer`), so fold ≡ batch under ordered
    // arrival.
    // `div`, not `/`: long/long division in Spark returns DOUBLE, and a
    // 100 TB stream's offsets exceed the 2^53 exact-double range
    globalPrefixSum(
      df.select(col(idCol), col(nTokensCol).cast("long").as("n_tokens")),
      idCol, "n_tokens", partitions)
      .withColumn("__off", col("__off") + lit(base))
      .select(col(idCol), col("n_tokens"),
        col("__off").as("global_off"),
        expr(s"__off div ${seqLen}L").as("first_seq"),
        expr(s"(__off + greatest(n_tokens, 1L) - 1L) div ${seqLen}L")
          .as("last_seq"),
        pmod(col("__off"), lit(seqLen.toLong)).as("seq_off"))
  }

  /** [[packOffsetsFromCounts]] over raw text: whitespace token counts
    * ([[TextAnalysis.tokenCount]] semantics — blank text counts 0). */
  def packOffsets(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, partitions: Int = 0): DataFrame =
    packOffsetsFromCounts(
      docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqLen, partitions)

  /**
   * One-row packing summary, all BIGINT: total token count, number of
   * `seqLen` sequences (ceiling), padding tokens in the final partial
   * sequence, and how many documents straddle a sequence boundary —
   * the fragmentation number an attention-masking design reads (a
   * split doc needs cross-boundary masking or suffers context
   * truncation). Derivable per-doc spans come from [[packOffsets]];
   * this is the corpus-level scorecard.
   */
  def packingStats(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, partitions: Int = 0): DataFrame = {
    val packed = packOffsets(docs, idCol, textCol, seqLen, partitions)
    // ceil-div in exact longs: (a + L - 1) div L
    val nSeqs = expr(s"(total_tokens + ${seqLen.toLong - 1}L) div ${seqLen}L")
    packed.agg(
      coalesce(sum("n_tokens"), lit(0L)).as("total_tokens"),
      coalesce(sum(when(col("first_seq") =!= col("last_seq"), 1L)
        .otherwise(0L)), lit(0L)).as("split_docs"))
      .select(col("total_tokens"), nSeqs.as("n_seqs"),
        (nSeqs * lit(seqLen.toLong) - col("total_tokens")).as("pad_tokens"),
        col("split_docs"))
  }

  /**
   * Materialize the packed training sequences themselves — the write
   * path consuming [[packOffsets]]' layout: every sequence `s` is the
   * ordered concatenation of the token slices that land in
   * `[s·seqLen, (s+1)·seqLen)`. Output one row per sequence, all
   * hashable-exact types: (`seq_id` BIGINT, `n_tokens` BIGINT — seqLen
   * everywhere except the final partial sequence, `seq_text` the
   * space-joined tokens).
   *
   * Scale: the prefix sum runs on the NARROW (id, count) projection —
   * the internal cache and the range exchange never carry token
   * arrays — and the arrays join back by id afterwards (one hash
   * exchange; re-tokenizing the source scan is codegen-cheap, caching
   * a tokenized 100 TB corpus is not). After that, each document
   * explodes into one row per sequence it touches (≤ n/seqLen + 1 —
   * output-sized, not quadratic), and the regroup is ONE corpus-sized
   * exchange keyed by `seq_id` — the unavoidable write-path shuffle.
   * Per-sequence state is bounded by `seqLen` tokens regardless of
   * document sizes (a 1M-token doc contributes 1-token-to-seqLen
   * slices, never itself), so no group can blow an executor.
   */
  def materializeSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val l = seqLen.toLong
    // counts branch: the allocation-free counting expression — same
    // whitespace semantics as the array build (blank → 0), no array
    // materialized just to take its size
    val offs = globalPrefixSum(
      docs.select(col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n")),
      idCol, "__n", partitions)
      .select(col(idCol), col("__n"), col("__off"))
    // join RAW TEXT back (one compact string beats a per-element
    // string array on the wire) and tokenize ONCE, after the join
    val withSeqs = docs.select(col(idCol), col(textCol)).join(offs, Seq(idCol))
      .where(col("__n") > 0) // empty docs occupy no tokens in any sequence
      .select(
        filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0).as("__t"),
        col("__n"), col("__off"),
        explode(sequence(expr(s"__off div ${l}L"),
          expr(s"(__off + __n - 1) div ${l}L"))).as("seq_id"))
    val pieces = withSeqs.select(col("seq_id"),
      greatest(col("seq_id") * l - col("__off"), lit(0L)).as("__s"),
      least(col("__n"), (col("seq_id") + 1L) * l - col("__off")).as("__e"),
      col("__off"), col("__t"))
      .select(col("seq_id"), (col("__off") + col("__s")).as("__gpos"),
        slice(col("__t"), (col("__s") + 1L).cast("int"),
          (col("__e") - col("__s")).cast("int")).as("__piece"))
    pieces.groupBy("seq_id").agg(
      sum(size(col("__piece")).cast("long")).as("n_tokens"),
      array_join(flatten(transform(
        array_sort(collect_list(struct(col("__gpos").as("p"), col("__piece").as("w")))),
        x => x("w"))), " ").as("seq_text"))
  }

  /**
   * Token-budget prefix selection — curation by TOKENS, not documents:
   * order the corpus by (`rankCol` desc, `idCol` asc — quality first,
   * id as the deterministic tiebreak) and keep the maximal prefix whose
   * token count fits `budgetTokens`. "Take the best 10B tokens" is the
   * budgeted form of every quality cut; a per-document top-k keeps the
   * wrong amount whenever length and quality correlate. A document is
   * kept iff it fits ENTIRELY (exclusive prefix + its own count ≤
   * budget) — documents are never truncated, and because the running
   * offset is monotone the kept set is exactly the maximal PREFIX of
   * the quality order that fits (nothing after the first overflow can
   * fit; a prefix cut, not bin packing). Zero-token documents are
   * never selected — they contribute nothing to a token budget.
   *
   * Same distributed prefix sum as [[packOffsets]], ordered by the
   * rank key instead of the id. Output: (idCol, n_tokens, global_off)
   * for kept documents — all BIGINT.
   */
  def selectByTokenBudget(docs: DataFrame, idCol: String, textCol: String,
      rankCol: String, budgetTokens: Long, partitions: Int = 0): DataFrame = {
    require(budgetTokens >= 0, s"budget must be non-negative, got $budgetTokens")
    // `col(rankCol) * -1` on a non-numeric column would not fail — it
    // would silently null the sort key (ANSI off) and scramble the
    // quality order. Numeric ranks only; fail loud at plan time.
    val rankType = docs.schema(rankCol).dataType
    require(rankType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"rank column '$rankCol' must be numeric (got ${rankType.simpleString}); " +
        "cast or derive a numeric quality score first")
    // rank desc ≡ range-partition asc on a negated sort key; idCol
    // breaks rank ties so the prefix order (and thus the kept set) is
    // total. The struct key keeps ONE range exchange for the pair.
    val keyed = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      struct((col(rankCol) * -1).as("r"), col(idCol).as("i")).as("__key"))
    globalPrefixSum(keyed, "__key", "n_tokens", partitions)
      .where(col("__off") + col("n_tokens") <= budgetTokens
        && col("n_tokens") > 0)
      .select(col(idCol), col("n_tokens"), col("__off").as("global_off"))
  }
}
