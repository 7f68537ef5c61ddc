package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Top-k rows per group WITHOUT a window sort: the standard
 * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` plan
 * shuffles every row and sorts each hash partition in full; this
 * operator aggregates with the bounded-heap
 * [[graft.functions.TopKByValue]] aggregate instead, so map tasks
 * partial-aggregate (ObjectHashAggregate partial → final) and the
 * shuffle carries at most k pairs per (group × map-split) — an
 * index-sized summary, not the corpus. The trade: the payload is the
 * (ord, id) pair; callers needing more columns re-join on the id, which
 * touches only groups × k rows.
 *
 * Output: groupCols, rank (1-based, ord desc / id asc within the
 * group), idCol, ordCol.
 */
object GroupTopK {

  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ordCol: String,
      idCol: String, k: Int): DataFrame = {
    // the aggregate is typed (double ord, bigint id); numeric inputs of
    // other widths are cast here so callers aren't surprised at analysis
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.top_k_by_value(
        col(ordCol).cast("double"), col(idCol).cast("long"), k).as("__topk"))
    agged.select(groupCols.map(col) :+ posexplode(col("__topk")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol),
        col("col.ord").as(ordCol)): _*)
  }
}
