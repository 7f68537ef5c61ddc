package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row, attach the latest right row with
 * `rightTs <= leftTs` (optionally within `toleranceMs`), per key.
 *
 * Composed from built-ins (preference order (a) in the project brief):
 * union-tag both sides, sort within key, and carry the last right row
 * forward with `last(_, ignoreNulls)` over an unbounded-preceding window.
 * ONE shuffle on the key (the window partition); no per-row probing, no
 * nested-loop range join. At 100 TB both inputs shuffle once on the join
 * key — same cost shape as a sort-merge join.
 */
object AsOfJoin {

  /**
   * @param left        probe side (keeps every row)
   * @param right       reference side (its latest-at-or-before row attaches)
   * @param keyCols     equi-join keys present on both sides
   * @param leftTs      event-time column on `left`
   * @param rightTs     event-time column on `right`
   * @param valueCols   right-side columns to attach (default: all non-key,
   *                    non-ts columns)
   * @param toleranceMs matches older than this are nulled (<=0: unbounded)
   */
  def asOf(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      valueCols: Seq[String] = Nil,
      toleranceMs: Long = 0L): DataFrame = {
    val attach = if (valueCols.nonEmpty) valueCols
      else right.columns.filterNot(c => keyCols.contains(c) || c == rightTs).toSeq
    require(attach.nonEmpty, "no right-side columns to attach")

    val ts = "__asof_ts"
    val side = "__asof_side"
    val l = left
      .withColumn(ts, col(leftTs).cast("timestamp"))
      .withColumn(side, lit(0))
      // right-side payload columns as nulls (filled by the window carry)
      .select((left.columns.map(col) ++ Seq(col(ts), col(side)) ++
        attach.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)
    // key columns come through from the right side; other left columns are null
    val rKeyed = right
      .withColumn(ts, col(rightTs).cast("timestamp"))
      .withColumn(side, lit(1))
      .select((left.columns.map { c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(col(ts), col(side)) ++ attach.map(c => col(c).as(s"__r_$c"))): _*)

    // Right rows sort BEFORE left rows at the same timestamp (side asc
    // puts right first? no: right must be visible to a left row with the
    // SAME ts, so right sorts first -> side desc? side: left=0, right=1.
    // Order by (ts, side DESC) puts right(1) before left(0) at equal ts.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ts).asc, col(side).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = attach.foldLeft(l.unionByName(rKeyed)) { (df, c) =>
      df.withColumn(s"__last_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }.withColumn("__last_ts",
      last(when(col(side) === 1, col(ts)), ignoreNulls = true).over(w))

    val leftOnly = carried.where(col(side) === 0)
    val withTolerance =
      if (toleranceMs <= 0) leftOnly
      else {
        val ok = col("__last_ts").isNotNull &&
          (unix_millis(col(ts)) - unix_millis(col("__last_ts"))) <= toleranceMs
        attach.foldLeft(leftOnly) { (df, c) =>
          df.withColumn(s"__last_$c", when(ok, col(s"__last_$c")))
        }
      }
    withTolerance.select(
      (left.columns.map(col) ++ attach.map(c => col(s"__last_$c").as(c))): _*)
  }
}
