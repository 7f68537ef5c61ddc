package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed logistic regression: gradient exactness, full-batch
  * training on separable data, scoring, and regularization. */
class LogRegSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic separable data: y = 1 iff 2·x1 − x2 > 0, with a
    * margin (no points near the boundary). */
  private def separable() = {
    val rows = (0 until 400).map { i =>
      def tri(k: Int) = (((i * 53 + k * 97) % 200) - 100) / 100.0
      val x1 = tri(1); val x2 = tri(2)
      val m = 2.0 * x1 - x2
      // push points off the boundary so the problem is cleanly separable
      val x1s = if (m >= 0) x1 + 0.3 else x1 - 0.3
      (i.toLong, x1s, x2, if (2.0 * x1s - x2 > 0) 1.0 else 0.0)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  test("gradientFrame at zero weights equals the closed form mean((0.5 - y)·x)") {
    val d = separable()
    val g = LogReg.gradientFrame(d, Seq("x1", "x2"), "y", Array(0.0, 0.0, 0.0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expected = d.agg(
      avg((lit(0.5) - col("y")) * col("x1")),
      avg((lit(0.5) - col("y")) * col("x2")),
      avg(lit(0.5) - col("y"))).collect()(0)
    assert(math.abs(g("x1") - expected.getDouble(0)) < 1e-6)
    assert(math.abs(g("x2") - expected.getDouble(1)) < 1e-6)
    assert(math.abs(g("__bias") - expected.getDouble(2)) < 1e-6)
  }

  test("train separates the planted data and score thresholds correctly") {
    val d = separable()
    val w = LogReg.train(d, Seq("x1", "x2"), "y", epochs = 200, learningRate = 2.0)
    // learned direction matches the planted (2, -1) up to scale
    // on separable data LR converges toward SOME separating hyperplane
    // (the direction is not unique) — the sign pattern and the accuracy
    // below are the contract, not the exact planted ratio
    assert(w(0) > 0 && w(1) < 0, s"sign pattern: ${w.toSeq}")
    val acc = LogReg.score(d, Seq("x1", "x2"), w)
      .select(avg(((col("prob") > 0.5).cast("double") === col("y")).cast("double")))
      .collect()(0).getDouble(0)
    assert(acc >= 0.99, s"training accuracy $acc")
    // loss decreased from the chance level ln 2
    assert(LogReg.loss(d, Seq("x1", "x2"), "y", w) < 0.3)
  }

  test("training is deterministic across runs") {
    val d = separable()
    val w1 = LogReg.train(d, Seq("x1", "x2"), "y", epochs = 20)
    val w2 = LogReg.train(d, Seq("x1", "x2"), "y", epochs = 20)
    assert(w1.toSeq == w2.toSeq)
  }

  test("l2 regularization shrinks weights") {
    val d = separable()
    val w = LogReg.train(d, Seq("x1", "x2"), "y", epochs = 100, learningRate = 2.0)
    val wr = LogReg.train(d, Seq("x1", "x2"), "y", epochs = 100, learningRate = 2.0, l2 = 0.1)
    assert(math.abs(wr(0)) < math.abs(w(0)) && math.abs(wr(1)) < math.abs(w(1)))
  }

  test("score is a narrow shuffle-free projection") {
    val d = separable()
    val out = LogReg.score(d, Seq("x1", "x2"), Array(1.0, -1.0, 0.0))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }
}
