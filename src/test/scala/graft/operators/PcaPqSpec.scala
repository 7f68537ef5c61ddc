package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composition pin: PCA rotation before product quantization lifts ADC
  * recall on cross-subspace-correlated embeddings — the OPQ motivation
  * (Ge et al. CVPR'13; Jégou TPAMI'11 §IV.C), demonstrated with this
  * repo's own operators end to end (Pca → ProductQuantization →
  * RetrievalMetrics). */
class PcaPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** 400 deterministic vectors where dims 8..15 copy dims 0..7 (plus
    * small noise): the two PQ subspaces are maximally correlated, the
    * worst case for independent per-subspace codebooks. */
  private def corpus(): DataFrame = {
    val rows = (0 until 400).map { i =>
      def tri(k: Int) = (((i * 47 + k * 89) % 200) - 100) / 100.0
      val half = Array.tabulate(8)(j => tri(j + 1))
      val x = Array.tabulate(dim)(d =>
        if (d < 8) half(d) else half(d - 8) + 0.05 * tri(d + 20))
      (i.toLong, x.toSeq)
    }
    rows.toDF("vec_id", "emb")
  }

  /** ADC recall@10 (no exact re-rank healing: candidates = k) against
    * the exact cosine top-10 in the same representation. */
  private def adcRecall(df: DataFrame): Double = {
    val queries = df.where(col("vec_id") < 20)
    val gold = Similarity.knnJoin(df, "vec_id", "emb",
      queries, "vec_id", "emb", k = 10).select("query_id", "id")
    val model = ProductQuantization.fit(df, "vec_id", "emb", m = 2, k = 16)
    val qVecs = queries.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val preds = qVecs.flatMap { case (qid, v) =>
      ProductQuantization.adcTopK(df, "vec_id", "emb", model, v, k = 10,
          candidates = 10)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, r.getLong(0), (i + 1).toLong) }
    }.toSeq.toDF("query_id", "id", "rank")
    val summary = RetrievalMetrics.summary(RetrievalMetrics.perQuery(
      preds, "query_id", "id", "rank", gold, "query_id", "id", k = 10))
      .collect()(0)
    summary.getDouble(1)
  }

  test("PCA rotation before PQ lifts ADC recall on correlated subspaces") {
    val raw = corpus()
    val model = Pca.fit(raw, "emb", k = dim)
    val rotated = Pca.project(raw, "emb", model, outCol = "pca")
      .select(col("vec_id"), col("pca").as("emb"))
    val rawRecall = adcRecall(raw)
    val pcaRecall = adcRecall(rotated)
    info(f"ADC recall@10 raw=$rawRecall%.4f pca=$pcaRecall%.4f")
    // the pin is the LIFT, not an absolute bar: 16 centroids per half
    // quantize 8-dim content coarsely in any basis (measured
    // 0.425 raw → 0.490 rotated on this fixture); the rotation's win
    // is separating signal from noise dims so codebook entries stop
    // encoding noise — the OPQ direction, demonstrated end to end
    assert(pcaRecall >= rawRecall + 0.03,
      f"rotation should lift recall: raw=$rawRecall%.4f pca=$pcaRecall%.4f")
  }
}
