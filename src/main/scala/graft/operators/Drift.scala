package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distribution-drift monitoring between two snapshots of the same
 * column: Population Stability Index per key — the standard
 * model-monitoring statistic (PSI < 0.1 stable, 0.1–0.25 moderate,
 * > 0.25 shifted). Companion to the one-pass `Expectations` checks:
 * expectations gate a single snapshot, PSI compares two.
 *
 * Scale: each snapshot reduces to a (key, bucket) histogram in ONE
 * partial-aggregated pass (≤ |keys|·|buckets| rows on the shuffle,
 * never values); the PSI fold joins the two tiny histograms. Buckets
 * are FIXED-width integer cells of `value / bucketWidth` clamped to
 * `numBuckets` — deterministic across engines and runs, no
 * quantile-fitting step that would itself drift between snapshots.
 * Empty cells floor at p = 1e-6 (the standard PSI guard), so the
 * statistic is finite even under disjoint supports — including keys
 * present in only one snapshot, which report a large finite PSI
 * ('shifted') rather than dropping out of the report.
 */
object Drift {

  def psi(reference: DataFrame, current: DataFrame, keyCol: String,
      valueCol: String, bucketWidth: Double = 10.0,
      numBuckets: Int = 10): DataFrame = {
    def bucketed(df: DataFrame, cntCol: String): DataFrame =
      df.groupBy(col(keyCol),
          least(lit(numBuckets - 1),
            greatest(lit(0), floor(col(valueCol) / bucketWidth)))
            .cast("int").as("bucket"))
        .agg(count(lit(1)).as(cntCol))
    val r = bucketed(reference, "__nr")
    val c = bucketed(current, "__nc")
    val tr = r.groupBy(col(keyCol)).agg(sum("__nr").as("__tr"))
    val tc = c.groupBy(col(keyCol)).agg(sum("__nc").as("__tc"))
    // LEFT joins against the per-side totals: a key present in only ONE
    // snapshot (brand-new or vanished segment — the maximally drifted
    // case) keeps its cells, and the missing side's probabilities floor
    // at 1e-6, so PSI comes out ≈ Σ p·ln(p·1e6) — large, finite, and
    // verdict 'shifted' — instead of the key silently vanishing from
    // the report (cells is full-outer over r∪c, so every key reaches
    // at least one total row).
    val cells = r.join(c, Seq(keyCol, "bucket"), "full_outer")
      .join(tr, Seq(keyCol), "left").join(tc, Seq(keyCol), "left")
      .select(col(keyCol),
        greatest(coalesce(
          coalesce(col("__nr"), lit(0L)).cast("double") / col("__tr"), lit(0.0)),
          lit(1e-6)).as("__pr"),
        greatest(coalesce(
          coalesce(col("__nc"), lit(0L)).cast("double") / col("__tc"), lit(0.0)),
          lit(1e-6)).as("__pc"))
    cells.groupBy(col(keyCol))
      .agg(round(sum((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr"))), 6)
        .as("psi"), count(lit(1)).as("n_cells"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") < 0.25, "moderate")
          .otherwise("shifted"))
  }
}
