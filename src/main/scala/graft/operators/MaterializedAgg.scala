package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-aggregate maintenance: keep a grouped
 * aggregate state (COUNT / SUM / MIN / MAX per key) current under
 * insert and delete batches WITHOUT re-aggregating the corpus. The
 * reference recomputes every aggregate per request (`app/routes_ai.py:91`
 * runs each generated query fresh against the live snapshot via the
 * SQLAlchemy engine, `app/db.py:5`) — viable at demo scale, not at
 * 100 TB where the dominant serving cost is re-scanning unchanged data.
 * This is the classic algebraic incremental-view-maintenance model
 * (deltas for the distributive aggregates, bounded partial recompute
 * for the non-retractable extremes); composes directly with
 * [[Cdc.netChanges]], which classifies exactly the insert/delete rows
 * a refresh needs.
 *
 * Scale design, per refresh:
 *  - COUNT and SUM are retractable: the change batches aggregate down
 *    to key-sized delta frames (one map-side-combined shuffle over the
 *    CHANGES, never the corpus), merged into the state with key-sized
 *    full-outer joins.
 *  - MIN/MAX are NOT retractable (deleting the minimum reveals an
 *    unknown runner-up). Inserts still merge algebraically
 *    (`least`/`greatest`); only groups where a DELETED value touches
 *    the stored extreme (`del_min <= min_v` / `del_max >= max_v`) are
 *    recomputed, via a broadcast LEFT SEMI join of the affected-keys
 *    frame (bounded by group count) against the current table — one
 *    scan, zero shuffle of unaffected rows; with storage partitioned
 *    or bucketed by the group key this prunes to the affected
 *    partitions.
 *
 * Null measures count toward `n` but are skipped by SUM/MIN/MAX (SQL
 * aggregate semantics on both build and refresh paths); a deleted NULL
 * can never touch an extreme, so it triggers no recompute.
 */
object MaterializedAgg {

  /** State column names: group keys ++ (n, sum_v, min_v, max_v). */
  val StateCols: Seq[String] = Seq("n", "sum_v", "min_v", "max_v")

  /** Build the aggregate state in one partial+final pass over the base
    * table — the bootstrap; every later refresh is change-sized. */
  def build(base: DataFrame, keyCols: Seq[String], measure: String): DataFrame =
    base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(measure)).as("sum_v"),
      min(col(measure)).as("min_v"),
      max(col(measure)).as("max_v"))

  /**
   * Refresh `mv` (built by [[build]] with the same keys/measure) under
   * an insert batch and a delete batch. `current` is the post-change
   * table, consulted ONLY for groups whose stored extreme was deleted.
   * Returns the refreshed state — identical to `build(current, …)`.
   *
   * Contract: `deletes` rows must exist in the pre-change table and
   * `inserts` must be new rows (the [[Cdc.netChanges]] I/D classes; an
   * update is a delete + insert pair). Groups whose count reaches zero
   * drop out of the state.
   */
  def refresh(mv: DataFrame, inserts: DataFrame, deletes: DataFrame,
      current: DataFrame, keyCols: Seq[String], measure: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val m = col(measure)
    val keys = keyCols.map(col)
    val sumType = mv.schema("sum_v").dataType
    val zeroN = lit(0L)
    val zeroS = lit(0).cast(sumType)

    // change-sized delta frames: one map-side-combined shuffle each
    val ins = inserts.groupBy(keys: _*).agg(
      count(lit(1)).as("i_n"), sum(m).cast(sumType).as("i_sum"),
      min(m).as("i_min"), max(m).as("i_max"))
    val del = deletes.groupBy(keys: _*).agg(
      count(lit(1)).as("del_n"), sum(m).cast(sumType).as("del_sum"),
      min(m).as("del_min"), max(m).as("del_max"))

    val merged = mv.join(ins, keyCols, "full_outer").join(del, keyCols, "full_outer")
    val n2 = coalesce(col("n"), zeroN) + coalesce(col("i_n"), zeroN) -
      coalesce(col("del_n"), zeroN)
    val sum2 = coalesce(col("sum_v"), zeroS) + coalesce(col("i_sum"), zeroS) -
      coalesce(col("del_sum"), zeroS)
    // a delete only invalidates the stored extreme when it touches it;
    // NULL comparisons (no mv row / null-measure deletes) coalesce to
    // "recompute" only when a delete actually hit an existing group
    val boundaryHit = coalesce(
      col("del_min") <= col("min_v") || col("del_max") >= col("max_v"),
      col("del_n").isNotNull && col("n").isNull)
    val withFlags = merged
      .withColumn("n2", n2).withColumn("sum2", sum2)
      .withColumn("needs_rc", coalesce(boundaryHit, lit(false)))
      .where(col("n2") > 0)

    val affected = withFlags.where(col("needs_rc")).select(keys: _*)
    val recomputed = current.join(broadcast(affected), keyCols, "left_semi")
      .groupBy(keys: _*).agg(min(m).as("rc_min"), max(m).as("rc_max"))

    withFlags.join(recomputed, keyCols, "left_outer")
      .select(keys ++ Seq(
        col("n2").as("n"),
        col("sum2").as("sum_v"),
        when(col("needs_rc"), col("rc_min"))
          .otherwise(least(col("min_v"), col("i_min"))).as("min_v"),
        when(col("needs_rc"), col("rc_max"))
          .otherwise(greatest(col("max_v"), col("i_max"))).as("max_v")): _*)
  }
}
