package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Retrieval evaluation metrics — recall@k and MRR (mean reciprocal
 * rank) over a predicted ranking vs a gold relevance set, the
 * measurement loop every ANN/hybrid-search deployment runs against a
 * labeled slice before trusting an index at corpus scale (and the
 * number the IVF/PQ recall contracts in this repo compute ad hoc in
 * specs — promoted here to a first-class operator). The reference
 * evaluates its NL→SQL layer with execution-accuracy metrics
 * (`NLP_SQLizer/README.md:183-187`); this is the retrieval-side
 * counterpart its vector surface would need.
 *
 * Scale: one equi-join of predictions against gold on (query, id) —
 * both frames are query-sized (k rows per query / gold rows per
 * query), never corpus-sized; the per-query aggregate is map-side
 * combined, and the macro summary is a second tiny aggregate. No
 * broadcast hints — AQE decides (gold is usually small, but a
 * million-query sweep is exactly when a hint would OOM).
 */
object RetrievalMetrics {

  /**
   * Per-query metrics: (query_id, n_gold, n_hit, recall, rr) where
   * `recall` = |gold ∩ top-k| / |gold| and `rr` = 1/rank of the FIRST
   * relevant prediction (0.0 when none). Queries present in `gold`
   * but absent from `pred` (or with no relevant prediction in top-k)
   * surface with zero metrics — silent drops would inflate averages.
   */
  def perQuery(pred: DataFrame, qCol: String, idCol: String, rankCol: String,
      gold: DataFrame, gQCol: String, gIdCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val p = pred.select(col(qCol).as("query_id"), col(idCol).as("id"),
      col(rankCol).cast("long").as("rank")).where(col("rank") <= k)
    val g = gold.select(col(gQCol).as("query_id"), col(gIdCol).as("id"))
    val goldCounts = g.groupBy("query_id").agg(count(lit(1L)).as("n_gold"))
    val hits = p.join(g, Seq("query_id", "id"))
      .groupBy("query_id")
      .agg(count(lit(1L)).as("n_hit"), min(col("rank")).as("__first"))
    goldCounts.join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_gold"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_gold"), 6)
          .as("recall"),
        round(when(col("__first").isNotNull, lit(1.0) / col("__first"))
          .otherwise(0.0), 6).as("rr"))
  }

  /** Macro summary: (n_queries, macro_recall, mrr) — unweighted means
    * over queries, the standard reporting convention. */
  def summary(perQueryFrame: DataFrame): DataFrame =
    perQueryFrame.agg(
      count(lit(1L)).as("n_queries"),
      round(avg(col("recall")), 6).as("macro_recall"),
      round(avg(col("rr")), 6).as("mrr"))
}
