package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def embs = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  test("int8 quantization: codes bounded, max component hits ±127, rmse within half-step") {
    val rows = Quantization.quantizeInt8(embs, "vec_id", "emb").collect()
    assert(rows.nonEmpty)
    // reconstruction error of symmetric round-to-nearest is at most
    // scale/2 per component, so rmse <= scale/2
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val rmse = r.getAs[Double]("rmse")
      assert(rmse <= scale / 2 + 1e-9, s"vec ${r.get(0)}: rmse $rmse vs scale $scale")
    }
    // the largest-|x| component quantizes to exactly ±127 ⇒ qnorm ≥ 127²
    val qnorms = rows.map(_.getAs[Long]("qnorm"))
    assert(qnorms.forall(_ >= 127L * 127L))
  }

  test("quantized top-k agrees with float top-k on the fixture (int8 loses no neighbor here)") {
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val quant = Quantization.quantizedTopK(embs, "vec_id", "emb", q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = Similarity.topK(embs, "vec_id", "emb",
        q.map(_.toFloat), k = 10)
      .select("vec_id").as[Long].collect().toSet
    // 64-dim embeddings with well-separated cosines: int8 keeps the set
    assert((quant intersect exact).size >= 9, s"quant=$quant exact=$exact")
  }

  test("quantized top-k plans scan → TakeOrderedAndProject (no shuffle)") {
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val plan = Quantization.quantizedTopK(embs, "vec_id", "emb", q, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("random projection: deterministic, outDim rows per vector, cosine roughly preserved") {
    val p = Quantization.randomProject(embs.where($"vec_id" < 20), "vec_id", "emb", outDim = 8)
    val rows = p.collect()
    assert(rows.length == 20 * 8)
    val again = Quantization.randomProject(embs.where($"vec_id" < 20), "vec_id", "emb", outDim = 8)
      .collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // JL sanity: projected self-norms are positive (non-degenerate signs)
    val norms = rows.groupBy(_.getLong(0)).map { case (_, rs) =>
      rs.map(r => math.pow(r.getAs[Double]("value"), 2)).sum
    }
    assert(norms.forall(_ > 0))
  }
}
