package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Mergeable-sketch indexes: DataSketches HLL (distinct counts), Theta
 * (set algebra across cohorts), and KLL (quantiles) over corpus columns.
 *
 * This is the 100 TB summary pattern the exact operators can't serve:
 * build one small sketch PER PARTITION (per day, per source shard) in a
 * single pass at ingest, persist the sketch rows (kilobytes each), and
 * answer any later rollup — distinct users over an arbitrary day range,
 * cohort overlap, a p95 over a month — by merging the covered sketches.
 * The corpus is scanned once, ever; every query after that touches only
 * the index. All three families are Spark-native aggregates
 * (`hll_sketch_agg` / `theta_sketch_agg` / `kll_sketch_agg_double`),
 * so the build is a partial+final ObjectHashAggregate: partial sketches
 * form map-side and only sketch bytes cross the shuffle — the same
 * partial-aggregation shape the exact COUNT(DISTINCT) path cannot take
 * (it must shuffle every distinct value).
 *
 * Extension surface (the reference has no sketch layer; its distinct
 * counting is exact SQL — `app/schema/crawler.py:244-246` runs plain
 * COUNT DISTINCT per column): sized against the reference's analytics
 * goals at corpus scale.
 *
 * Accuracy contracts (enforced by the x_sketch_* oracle queries and
 * SketchesSpec): HLL lgK=12 → ~0.8% RSE, contract ±5%; Theta default
 * nominal entries 4096 → EXACT below 4096 distinct, ±5% contract
 * above; KLL k=200 → ~1.65% single-sided normalized rank error,
 * contract ±3 rank points.
 */
object Sketches {

  // ---------------------------------------------------------------- HLL

  /** Distinct-count index: one HLL sketch per `partCols` key (e.g.
    * (event_type, day)). One corpus pass; the result is
    * |keys| rows × ~2^lgK bytes, persistable as plain parquet (binary
    * column). At 1000 executors the build is embarrassingly parallel:
    * partial sketches merge map-side, the shuffle carries sketches,
    * never values. */
  def hllIndex(df: DataFrame, partCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll an HLL index up to `groupCols` (⊆ the index's partition
    * columns; empty → one global row): lossless HLL_8 union of the
    * covered sketches, then the estimate. Merging n sketch rows costs
    * O(n · 2^lgK) bytes — independent of corpus size. */
  def hllEstimate(index: DataFrame, groupCols: Seq[String],
      estimateCol: String = "distinct_est"): DataFrame = {
    val merged = hll_sketch_estimate(hll_union_agg(col("hll"), lit(true)))
    if (groupCols.isEmpty) index.agg(merged.as(estimateCol))
    else index.groupBy(groupCols.map(col): _*).agg(merged.as(estimateCol))
  }

  // -------------------------------------------------------------- Theta

  /** One Theta sketch per cohort (distinct `valueCol` per `cohortCol`
    * value). Unlike HLL, Theta sketches support INTERSECTION and
    * DIFFERENCE — cohort-overlap questions ("users who did A and B")
    * without a self-join of the corpus. */
  def thetaCohorts(df: DataFrame, cohortCol: String, valueCol: String): DataFrame =
    df.groupBy(col(cohortCol))
      .agg(theta_sketch_agg(col(valueCol)).as("theta"))

  /** Set algebra between two cohort sketches: estimates of |A|, |B|,
    * |A ∩ B|, |A ∪ B| and the Jaccard similarity. The two single-row
    * sides cross-join (1×1 — Catalyst broadcasts; no corpus access). */
  def thetaOverlap(cohorts: DataFrame, cohortCol: String,
      a: String, b: String): DataFrame = {
    val sa = cohorts.where(col(cohortCol) === a).select(col("theta").as("__ta"))
    val sb = cohorts.where(col(cohortCol) === b).select(col("theta").as("__tb"))
    sa.crossJoin(sb)
      .select(
        theta_sketch_estimate(col("__ta")).as("est_a"),
        theta_sketch_estimate(col("__tb")).as("est_b"),
        theta_sketch_estimate(theta_intersection(col("__ta"), col("__tb"))).as("est_both"),
        theta_sketch_estimate(theta_union(col("__ta"), col("__tb"))).as("est_either"))
      .withColumn("jaccard",
        when(col("est_either") > 0, col("est_both") / col("est_either")).otherwise(0.0))
  }

  // ---------------------------------------------------------------- CMS

  /** Frequency index: one Count-Min sketch per `partCols` key over
    * `valueCol` occurrences. Build uses Spark's native
    * `count_min_sketch` aggregate (partial+final, sketch bytes on the
    * shuffle); rollups merge through [[graft.functions.cms_merge]] —
    * the custom TypedImperativeAggregate supplying the merge half Spark
    * lacks. Same (eps, confidence, seed) across the index is REQUIRED:
    * Count-Min merge is exact only for same-shape sketches. */
  def cmsIndex(df: DataFrame, partCols: Seq[String], valueCol: String,
      eps: Double = 0.001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Roll a CMS index up to `groupCols` (empty → one global sketch). */
  def cmsMerge(index: DataFrame, groupCols: Seq[String]): DataFrame = {
    val merged = graft.functions.cms_merge(col("cms")).as("cms")
    if (groupCols.isEmpty) index.agg(merged)
    else index.groupBy(groupCols.map(col): _*).agg(merged)
  }

  /** Frequency estimates for a SMALL key frame against a merged sketch
    * (heavy-hitter candidates, a mined domain — never the corpus): the
    * one-row sketch cross-joins the keys (broadcast) and each key
    * probes via [[graft.functions.cms_estimate]]. CMS error is
    * one-sided: estimate ≥ true count, ≤ true + ε·N with probability ≥
    * confidence. */
  def cmsCounts(mergedSketch: DataFrame, keys: DataFrame, keyCol: String,
      estimateCol: String = "freq_est"): DataFrame =
    keys.crossJoin(mergedSketch)
      .select(col(keyCol),
        graft.functions.cms_estimate(col("cms"), col(keyCol)).as(estimateCol))

  // ---------------------------------------------------------------- KLL

  /** Quantile index: one KLL doubles sketch per `partCols` key. Same
    * build shape as [[hllIndex]]; answers any quantile/rank question
    * over any covered partition range from ~3 KB per sketch. */
  def kllIndex(df: DataFrame, partCols: Seq[String], valueCol: String,
      k: Int = 200): DataFrame =
    df.groupBy(partCols.map(col): _*)
      .agg(kll_sketch_agg_double(col(valueCol).cast("double"), lit(k)).as("kll"))

  /** Roll a KLL index up to `groupCols` and evaluate `probs` quantiles
    * plus the EXACT item count (`kll_sketch_get_n` is exact — the
    * sketch counts every update). Column per quantile: `q_<prob with
    * '.'→'_'>` (q_0_5, q_0_95). */
  def kllQuantiles(index: DataFrame, groupCols: Seq[String],
      probs: Seq[Double]): DataFrame = {
    val merged = kll_merge_agg_double(col("kll")).as("__m")
    val base =
      if (groupCols.isEmpty) index.agg(merged)
      else index.groupBy(groupCols.map(col): _*).agg(merged)
    val qCols = probs.map(p =>
      kll_sketch_get_quantile_double(col("__m"), lit(p))
        .as(s"q_${p.toString.replace('.', '_')}"))
    base.select(groupCols.map(col) ++ qCols :+
      kll_sketch_get_n_double(col("__m")).as("n"): _*)
  }
}
