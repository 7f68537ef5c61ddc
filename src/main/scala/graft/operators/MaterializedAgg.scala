package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-aggregate maintenance: keep a grouped
 * aggregate state (COUNT / non-null COUNT / SUM / MIN / MAX per key,
 * for one or several measure columns) current under insert and delete
 * batches WITHOUT re-aggregating the corpus. The reference recomputes
 * every aggregate per request (`app/routes_ai.py:91` runs each
 * generated query fresh against the live snapshot via the SQLAlchemy
 * engine, `app/db.py:5`) — viable at demo scale, not at 100 TB where
 * the dominant serving cost is re-scanning unchanged data. This is the
 * classic algebraic incremental-view-maintenance model (deltas for the
 * distributive aggregates, bounded partial recompute for the
 * non-retractable extremes); composes directly with
 * [[Cdc.netChanges]], which classifies exactly the insert/delete rows
 * a refresh needs.
 *
 * Scale design, per refresh:
 *  - COUNT, non-null COUNT, and SUM are retractable: the change batches
 *    aggregate down to key-sized delta frames (one map-side-combined
 *    shuffle over the CHANGES, never the corpus), merged into the state
 *    with key-sized full-outer joins.
 *  - MIN/MAX are NOT retractable (deleting the minimum reveals an
 *    unknown runner-up). Inserts still merge algebraically
 *    (`least`/`greatest`); only groups where a DELETED value touches
 *    a stored extreme (`del_min <= min_v` / `del_max >= max_v` on any
 *    measure) are recomputed, via a broadcast LEFT SEMI join of the
 *    affected-keys frame (bounded by group count) against the current
 *    table — one scan, zero shuffle of unaffected rows; with storage
 *    partitioned or bucketed by the group key this prunes to the
 *    affected partitions.
 *
 * Null measures count toward `n` but are skipped by the per-measure
 * COUNT/SUM/MIN/MAX (SQL aggregate semantics on both build and refresh
 * paths); a deleted NULL can never touch an extreme, so it triggers no
 * recompute. The non-null count (`cnt_v`) exists so AVG can be served
 * correctly as sum/cnt even when the measure column carries NULLs —
 * SQL AVG divides by the non-null count, not the row count.
 */
object MaterializedAgg {

  /** State column names (single measure): group keys ++ these. */
  val StateCols: Seq[String] = Seq("n", "cnt_v", "sum_v", "min_v", "max_v")

  /** Per-measure state column names (cnt, sum, min, max). The
    * single-measure state keeps the legacy unsuffixed names so existing
    * registrations and stream maintainers are unchanged; multi-measure
    * states suffix each column with its measure name. One source of
    * truth shared with [[graft.plans.MvRewrite]]'s serving map. */
  def colNames(measures: Seq[String]): Seq[(String, (String, String, String, String))] =
    if (measures.sizeIs == 1)
      Seq(measures.head -> (("cnt_v", "sum_v", "min_v", "max_v")))
    else
      measures.map(m => m -> ((s"cnt_$m", s"sum_$m", s"min_$m", s"max_$m")))

  /** Build the aggregate state in one partial+final pass over the base
    * table — the bootstrap; every later refresh is change-sized. */
  def build(base: DataFrame, keyCols: Seq[String], measure: String): DataFrame =
    buildMulti(base, keyCols, Seq(measure))

  /** [[build]] over several measure columns at once — one shared pass,
    * one shared `n`, per-measure cnt/sum/min/max columns. */
  def buildMulti(base: DataFrame, keyCols: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "at least one measure column")
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      colNames(measures).flatMap { case (m, (c, s, mn, mx)) =>
        Seq(count(col(m)).as(c), sum(col(m)).as(s),
          min(col(m)).as(mn), max(col(m)).as(mx))
      }
    base.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

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
      current: DataFrame, keyCols: Seq[String], measure: String): DataFrame =
    refreshMulti(mv, inserts, deletes, current, keyCols, Seq(measure))

  /** [[refresh]] for a multi-measure state ([[buildMulti]]). A group
    * recomputes its extremes when ANY measure's stored extreme was
    * deleted; the recompute pass then refreshes every measure's
    * extremes for that group (the scan is per-group either way). */
  def refreshMulti(mv: DataFrame, inserts: DataFrame, deletes: DataFrame,
      current: DataFrame, keyCols: Seq[String], measures: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(measures.nonEmpty, "at least one measure column")
    val keys = keyCols.map(col)
    val named = colNames(measures).zipWithIndex.map { case ((m, ns), i) => (m, ns, i) }
    def sumType(s: String) = mv.schema(s).dataType
    val zeroN = lit(0L)

    // change-sized delta frames: one map-side-combined shuffle each
    val insAggs: Seq[Column] = count(lit(1)).as("i_n") +:
      named.flatMap { case (m, (_, s, _, _), i) =>
        Seq(count(col(m)).as(s"i_c_$i"), sum(col(m)).cast(sumType(s)).as(s"i_s_$i"),
          min(col(m)).as(s"i_min_$i"), max(col(m)).as(s"i_max_$i"))
      }
    val delAggs: Seq[Column] = count(lit(1)).as("del_n") +:
      named.flatMap { case (m, (_, s, _, _), i) =>
        Seq(count(col(m)).as(s"del_c_$i"), sum(col(m)).cast(sumType(s)).as(s"del_s_$i"),
          min(col(m)).as(s"del_min_$i"), max(col(m)).as(s"del_max_$i"))
      }
    val ins = inserts.groupBy(keys: _*).agg(insAggs.head, insAggs.tail: _*)
    val del = deletes.groupBy(keys: _*).agg(delAggs.head, delAggs.tail: _*)

    val merged = mv.join(ins, keyCols, "full_outer").join(del, keyCols, "full_outer")
    val n2 = coalesce(col("n"), zeroN) + coalesce(col("i_n"), zeroN) -
      coalesce(col("del_n"), zeroN)
    // a delete only invalidates a stored extreme when it touches it;
    // NULL comparisons (no mv row / null-measure deletes) coalesce to
    // "recompute" only when a delete actually hit an existing group
    val groupMissing = coalesce(col("del_n").isNotNull && col("n").isNull, lit(false))
    val boundaryHit = named.map { case (_, (_, _, mn, mx), i) =>
      coalesce(col(s"del_min_$i") <= col(mn) || col(s"del_max_$i") >= col(mx),
        lit(false))
    }.reduce(_ || _)
    val withFlags = named.foldLeft(
      merged.withColumn("n2", n2)
        .withColumn("needs_rc", groupMissing || boundaryHit)) {
      case (df, (_, (c, s, _, _), i)) =>
        df.withColumn(s"c2_$i",
            coalesce(col(c), zeroN) + coalesce(col(s"i_c_$i"), zeroN) -
              coalesce(col(s"del_c_$i"), zeroN))
          // SQL SUM over zero non-null values is NULL, not 0 — gate the
          // retractable-delta algebra on the refreshed non-null count
          .withColumn(s"s2_$i",
            when(col(s"c2_$i") > 0,
              coalesce(col(s), lit(0).cast(sumType(s))) +
                coalesce(col(s"i_s_$i"), lit(0).cast(sumType(s))) -
                coalesce(col(s"del_s_$i"), lit(0).cast(sumType(s))))
              .otherwise(lit(null).cast(sumType(s))))
    }.where(col("n2") > 0)

    val affected = withFlags.where(col("needs_rc")).select(keys: _*)
    val rcAggs: Seq[Column] = named.flatMap { case (m, _, i) =>
      Seq(min(col(m)).as(s"rc_min_$i"), max(col(m)).as(s"rc_max_$i"))
    }
    val recomputed = current.join(broadcast(affected), keyCols, "left_semi")
      .groupBy(keys: _*).agg(rcAggs.head, rcAggs.tail: _*)

    withFlags.join(recomputed, keyCols, "left_outer")
      .select(keys ++ (col("n2").as("n") +:
        named.flatMap { case (_, (c, s, mn, mx), i) =>
          Seq(
            col(s"c2_$i").as(c),
            col(s"s2_$i").as(s),
            when(col("needs_rc"), col(s"rc_min_$i"))
              .otherwise(least(col(mn), col(s"i_min_$i"))).as(mn),
            when(col("needs_rc"), col(s"rc_max_$i"))
              .otherwise(greatest(col(mx), col(s"i_max_$i"))).as(mx))
        }): _*)
  }
}
