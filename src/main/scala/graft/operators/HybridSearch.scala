package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.cosine_sim

/**
 * Hybrid lexical + vector retrieval with reciprocal-rank fusion —
 * the two-tower serving shape retrieval/RAG pipelines standardize on
 * (Cormack, Clarke & Büttcher SIGIR'09: RRF outperforms either list
 * alone and needs no score calibration between BM25's unbounded sums
 * and cosine's [-1,1]). The reference's retrieval surface is lexical
 * candidate ranking plus embedding top-k
 * (`app/models/trainer.py:194-230`, `app/routes_ai.py:91` ask-path
 * candidate ranking); fusing them rank-wise is the standard
 * composition.
 *
 * Scale: each list is produced by its own pruned plan (BM25's
 * query-term-filtered aggregate, cosine's scan →
 * TakeOrderedAndProject) and is at most `nPerList` rows; ranking and
 * fusion therefore run on driver-sized frames — the corpus is never
 * sorted globally and never windowed corpus-wide. The fused frame is
 * ≤ Σ|lists| rows regardless of corpus size.
 *
 * Determinism contract (what makes the oracle exact): every list is
 * selected AND ranked by its 4-dp-ROUNDED score with the id as
 * tiebreak, so engine-level 1e-15 drift in score accumulation cannot
 * flip membership or rank; the fused score rounds to 6 dp.
 */
object HybridSearch {

  /** Dense ranks 1..n over an already-limited list — the window is
    * unpartitioned BY DESIGN: its input is a top-N frame (≤ nPerList
    * rows), not the corpus. */
  private[operators] def rankList(list: DataFrame, idCol: String, scoreCol: String): DataFrame =
    list.select(col(idCol),
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol))).as("rank"))

  /**
   * Reciprocal-rank fusion of ranked lists: score(d) = Σ_lists
   * 1/(rrfK + rank_list(d)), ties broken by id. `lists` pairs each
   * top-N frame with its score column; all frames must share `idCol`.
   */
  def rrfFuse(lists: Seq[(DataFrame, String)], idCol: String, k: Int,
      rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists.map { case (l, sc) => rankList(l, idCol, sc) }
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(round(sum(lit(1.0) / (lit(rrfK) + col("rank"))), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(k)
  }

  /**
   * BM25 + cosine hybrid search over a document corpus with aligned
   * embeddings (embedding id = document id). Output:
   * (doc_id, rrf, n_lists).
   */
  def searchDocuments(docs: DataFrame, idCol: String, textCol: String,
      emb: DataFrame, embIdCol: String, embCol: String,
      queryTerms: Seq[String], queryVec: Array[Double],
      nPerList: Int = 50, k: Int = 10, rrfK: Int = 60): DataFrame = {
    val lexical = TextAnalysis.bm25TopK(docs, idCol, textCol, queryTerms, k = nPerList)
    val q = array(queryVec.map(lit): _*)
    // selection by ROUNDED cosine + id (see determinism contract)
    val vector = emb
      .select(col(embIdCol).as("doc_id"),
        round(cosine_sim(col(embCol), q), 4).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col("doc_id"))
      .limit(nPerList)
    rrfFuse(Seq((lexical, "score"), (vector, "cosine")), "doc_id", k, rrfK)
  }
}
