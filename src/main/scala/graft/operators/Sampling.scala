package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data curation.
 *
 * Sampling at 100 TB must be (a) a NARROW filter — no shuffle, no
 * global count, pushdown-friendly — and (b) reproducible across runs and
 * executors, so reruns and incremental jobs keep/drop the same rows.
 * Both follow from hashing a stable id column instead of using RNG state
 * (`sample()` is seed-stable but partition-layout-dependent; an id hash
 * is not).
 */
object Sampling {

  /** Knuth's multiplicative-hash constant (2654435761 = 2^32 / φ). The
    * per-mille bucket is `(id * K) mod 1000` — uniform for sequential
    * ids, exact integer arithmetic reproducible in any SQL dialect. */
  val HashK = 2654435761L

  /** Per-mille hash bucket in [0, 1000) of an integral id column. */
  def hashBucket(id: Column): Column = pmod(id.cast("long") * HashK, lit(1000L))

  /** Pseudo-random but reproducible ordering key: multiplicative hash
    * of the id over a prime modulus. Pure integer arithmetic — the same
    * permutation in any engine, any run, any partitioning. */
  def shuffleKey(id: Column, seed: Long = 17L): Column =
    pmod(id.cast("long") * HashK + seed, lit(1000003L))

  /**
   * Deterministic global shuffle for training export. LM training wants
   * examples decorrelated from ingest order — source, crawl date, and
   * URL locality all correlate with content, and a corpus written in
   * that order trains on hours of one distribution at a time. Ordering
   * by [[shuffleKey]] (id tiebreak) is a stable pseudo-random
   * permutation: ONE range-partitioned sort, the same shuffle any
   * global sort pays, absorbed by the export write that follows it.
   * Reproducible across runs and engines by construction, unlike
   * `ORDER BY rand()`.
   */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 17L): DataFrame =
    df.orderBy(shuffleKey(col(idCol), seed), col(idCol))

  /**
   * Partition-local variant: hash-distribute rows to `numFiles` output
   * partitions, shuffle-order WITHIN each. No total order — and no
   * range-exchange or cutpoint sampling either — but every output file
   * is an unbiased, ingest-order-free sample of the corpus, which is
   * what a training data loader that itself interleaves files needs.
   * At 100 TB this is the cheaper export: the repartition hash shuffle
   * replaces the global sort's skew-sensitive range exchange.
   */
  def shuffledExport(df: DataFrame, idCol: String, numFiles: Int,
      seed: Long = 17L): DataFrame = {
    require(numFiles > 0)
    df.repartition(numFiles, shuffleKey(col(idCol), seed) % numFiles)
      .sortWithinPartitions(shuffleKey(col(idCol), seed), col(idCol))
  }

  /** Deterministic Bernoulli sample: keep ≈ `rate` of rows by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.where(hashBucket(col(idCol)) < (rate * 1000).toLong)
  }

  /**
   * Deterministic train/validation/test split: the id-hash per-mille
   * bucket routes every row to exactly one named split with the given
   * weights (must sum to ≤ 1; any remainder is dropped). Reproducible
   * across runs, partitionings, and engines — the property a dataset
   * split must have so later pipeline runs never leak validation rows
   * into training.
   */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0) && weights.map(_._2).sum <= 1.0 + 1e-9)
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) => acc + (w * 1000).toLong }
    val splitExpr = weights.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), i)) =>
        when(hashBucket(col(idCol)) >= bounds(i) && hashBucket(col(idCol)) < bounds(i + 1), lit(name))
          .otherwise(acc)
    }
    df.withColumn("split", splitExpr).where(col("split").isNotNull)
  }

  /**
   * LEAKAGE-SAFE split: near-duplicate documents must never straddle
   * train/test — a test doc whose near-copy sits in train is
   * memorized, not generalized to (the Lee et al. ACL'22 dedup-test
   * motivation). Each document splits by its duplicate-GROUP key (the
   * connected-component label from [[Dedup.duplicateGroups]] over the
   * near-dup pair graph; docs outside any group key by their own id),
   * so whole duplicate clusters land in one split while the per-split
   * proportions stay ≈ `weights` (groups are a tiny fraction of a
   * deduplicated corpus).
   *
   * Scale: `groups` carries duplicate MEMBERS only — small on a clean
   * corpus, but at web-scale dup rates (30–60% of a crawl) it is a
   * corpus-scale frame, so the join back carries NO broadcast hint:
   * AQE broadcasts it when it actually fits (pinned at fixture scale
   * in PlanQualitySpec) and falls back to a key-partitioned shuffle
   * join when it does not (pinned at force scale in ProbeForceScale's
   * dup-heavy corpus) — a forced broadcast would OOM executors at
   * exactly the scale this operator exists for. The split rule itself
   * stays the one narrow hash expression of [[split]], applied to the
   * group key.
   */
  def leakageSafeSplit(df: DataFrame, idCol: String, groups: DataFrame,
      weights: Seq[(String, Double)]): DataFrame = {
    val g = groups.select(col("id").as("__gm_id"), col("group_id").as("__group"))
    val keyed = df.join(g, df(idCol) === col("__gm_id"), "left")
      .withColumn("__split_key", coalesce(col("__group"), col(idCol)))
      .drop("__gm_id", "__group")
    split(keyed, "__split_key", weights).drop("__split_key")
  }

  /**
   * Split-leakage AUDIT — the verification side of [[leakageSafeSplit]]:
   * given an already-assigned corpus (`assigned` carries `splitCol`) and
   * the near-duplicate pair graph, return every pair whose members
   * landed in DIFFERENT splits, with both split labels. Empty output is
   * the release gate a training pipeline asserts before shipping a
   * split; non-empty output is the actionable violation list (which
   * pairs leak, from which split to which). Run it on a split produced
   * by the plain hash [[split]] and it QUANTIFIES why the group-keyed
   * split exists.
   *
   * Scale: two hash joins of the (≪ corpus) pair list against the
   * narrow (id, split) projection — the pair side is dup-rate-sized, so
   * both joins broadcast it; the corpus is scanned twice, two columns,
   * and never shuffled.
   */
  def splitLeakageAudit(assigned: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame): DataFrame = {
    val a = assigned.select(col(idCol).as("id_a"), col(splitCol).as("split_a"))
    val b = assigned.select(col(idCol).as("id_b"), col(splitCol).as("split_b"))
    pairs.select("id_a", "id_b")
      .join(a, "id_a")
      .join(b, "id_b")
      .where(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "split_a", "split_b")
  }

  /**
   * Stratified deterministic sample: each row's stratum (a string
   * column) looks up its sampling rate; unlisted strata drop. Rates are
   * per-mille-exact. The stratum expression and the filter fuse into one
   * codegen span over the scan — this is how a quality-binned mixing
   * policy ("keep 10% of low-quality, all of high-quality") runs at
   * corpus scale.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratum: Column,
      rates: Seq[(String, Double)]): DataFrame = {
    require(rates.nonEmpty && rates.forall { case (_, r) => r >= 0.0 && r <= 1.0 })
    val rateExpr = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(stratum === s, lit((r * 1000).toLong)).otherwise(acc)
    }
    df.withColumn("stratum", stratum)
      .where(hashBucket(col(idCol)) < rateExpr)
  }

  /**
   * Deterministic WEIGHTED sample: each row carries its own keep
   * probability in `weight` (clamped to [0, 1] — e.g. a quality score,
   * an importance weight from source mixing, or a length-derived
   * up/down-weight) and survives iff its id-hash per-mille bucket falls
   * under weight·1000. The per-row generalization of
   * [[deterministicSample]]: still one narrow codegen'd filter over the
   * scan, still reproducible across runs/partitionings/engines — the
   * shape importance-resampling takes at corpus scale.
   */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.where(hashBucket(col(idCol)) <
      (least(greatest(weight.cast("double"), lit(0.0)), lit(1.0)) * 1000).cast("long"))

  /**
   * Keep the top `keepFraction` of each stratum BY SCORE — the
   * quantile-threshold curation cut ("keep the best 30% of every
   * source") real pipelines run between quality scoring and mixing.
   * Unlike [[stratifiedSample]] (uniform within a stratum) or
   * [[weightedSample]] (per-row independent coin), the survivor set
   * here is the score-ordered TOP of each stratum: the per-stratum
   * threshold is the exact interpolated `percentile(score, 1 − f)` and
   * rows with `score >= threshold` survive (ties at the boundary are
   * all kept — deterministic, slightly over `f`).
   *
   * Scale: ONE |strata|-sized percentile aggregation pass over the
   * corpus, joined back with no broadcast hint — AQE broadcasts the
   * tiny threshold frame when it fits and degrades to a shuffle join at
   * pathological stratum cardinality (the anomaly-operator discipline).
   * Never a global or per-stratum sort of the corpus. `exact = true`
   * (the oracle-matched default) buffers a STRATUM'S VALUES in the
   * aggregation buffer — fine to ~10⁷ rows per stratum; at 100 TB with
   * few strata pass `exact = false` for the Greenwald-Khanna sketch
   * (`approx_percentile`), whose memory is bounded by `accuracy`, not
   * the stratum.
   */
  def selectTopQuantilePerStratum(df: DataFrame, stratumCol: String,
      scoreCol: String, keepFraction: Double, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0)
    val pct =
      if (exact) s"percentile($scoreCol, ${1.0 - keepFraction})"
      else s"approx_percentile($scoreCol, ${1.0 - keepFraction}, $accuracy)"
    val thresholds = df.groupBy(col(stratumCol))
      .agg(expr(pct).cast("double").as("__thr"))
      .withColumnRenamed(stratumCol, "__strat")
    // null-SAFE stratum match: a NULL stratum is a real group (groupBy
    // emits its threshold row) and must not silently vanish through an
    // equi-join; rows with a NULL SCORE are dropped by the comparison —
    // a score the percentile itself ignored cannot clear the cut
    df.join(thresholds, df(stratumCol) <=> col("__strat"))
      .where(col(scoreCol) >= col("__thr"))
      .select(df.columns.map(df(_)): _*)
  }

  /** Deterministic per-row Gumbel perturbation of a log-weight: the
    * Gumbel-max key `logw − ln(−ln(u))` with `u ∈ (0,1)` derived from
    * the row id and seed through md5's first six hex digits (an exact
    * 24-bit integer — bit-identical in any engine with md5, so the
    * oracle replicates the whole key digit-for-digit). */
  def gumbelKey(id: Column, logWeight: Column, seed: Long = 17L): Column = {
    val h = md5(concat(id.cast("string"), lit(":"), lit(seed.toString)))
    val v = (1 to 6).map { j =>
      (instr(lit("0123456789abcdef"), substring(h, j, 1)) - 1).cast("double") *
        math.pow(16, 6 - j)
    }.reduce(_ + _)
    val u = (v + 0.5) / 16777216.0
    logWeight.cast("double") - log(-log(u))
  }

  /**
   * Gumbel top-k: sample `k` rows WITHOUT replacement with probability
   * proportional to `exp(logWeight)` — the selection step of
   * importance resampling (Xie et al., NeurIPS 2023 use exactly this
   * to draw the training subset from DSIR log-weights; Vieira 2014
   * popularized the trick). Adding independent Gumbel noise to each
   * log-weight and taking the arg-top-k IS a weighted sample, and
   * because the noise is a deterministic hash of (id, seed) the draw
   * is reproducible across runs, partitionings, and engines.
   *
   * Scale: one narrow projection over the scan, then a
   * TakeOrderedAndProject — per-partition heaps of size k and a
   * k-row driver merge, never a global sort. Output keeps the input
   * columns plus `gumbel_key` (the perturbed weight, highest first).
   */
  def gumbelTopK(df: DataFrame, idCol: String, logWeight: Column, k: Int,
      seed: Long = 17L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.withColumn("gumbel_key", gumbelKey(col(idCol), logWeight, seed))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /**
   * Length-bucketed inference batching: group documents whose token
   * counts fall in the same `bucketWidth`-token band, order each band by
   * (token count, id), and cut batches of `batchSize` — the standard
   * padding-minimizing batcher for model inference/scoring over a
   * corpus (batching arbitrary lengths together wastes compute on pad
   * tokens; batching within a band bounds waste to `bucketWidth`).
   *
   * Scale: the window partitions BY BUCKET (token-band) — many bounded
   * partitions, never the single global sort the d14 verdict flagged.
   * `batch_id` is unique across buckets (bucket · 10⁹ + index), and the
   * ordering is deterministic, so reruns produce identical batches.
   *
   * Output: (idCol, n_tokens, bucket, batch_id).
   */
  def lengthBatches(df: DataFrame, idCol: String, textCol: String,
      bucketWidth: Int = 32, batchSize: Int = 8): DataFrame = {
    require(bucketWidth > 0 && batchSize > 0)
    import org.apache.spark.sql.expressions.Window
    val n = TextAnalysis.tokenCount(col(textCol))
    val w = Window.partitionBy(col("bucket")).orderBy(col("n_tokens"), col(idCol))
    // explicit floor: Spark's cast truncates but DuckDB's CAST rounds,
    // so the oracle mirrors these as integer `//` divisions
    df.select(col(idCol), n.as("n_tokens"))
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth).cast("int"))
      .withColumn("batch_id",
        col("bucket").cast("long") * 1000000000L +
          floor((row_number().over(w) - 1).cast("double") / batchSize).cast("long"))
  }
}
