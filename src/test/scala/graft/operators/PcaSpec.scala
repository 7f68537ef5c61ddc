package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening: covariance pass, Jacobi eigensolver,
  * projection and whitening contracts. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic planted data: x = a·u + b·w + mean, with var(a) ≫
    * var(b) and u ⟂ w in dim 6 — the top component must recover ±u. */
  private def planted() = {
    val u = Array(1.0, 1.0, 0.0, 0.0, 1.0, 1.0).map(_ / 2.0)
    val w = Array(1.0, -1.0, 0.0, 0.0, 1.0, -1.0).map(_ / 2.0)
    val mean = Array(5.0, -3.0, 2.0, 0.0, 1.0, 4.0)
    val rows = (0 until 400).map { i =>
      // triangle-ish deterministic pseudo-noise in [-1, 1]
      def tri(k: Int) = (((i * 37 + k * 101) % 200) - 100) / 100.0
      val a = 10.0 * tri(1)
      val b = 1.0 * tri(2)
      val x = Array.tabulate(6)(d => a * u(d) + b * w(d) + mean(d) + 0.01 * tri(3 + d))
      (i.toLong, x.toSeq)
    }
    (rows.toDF("id", "emb"), u, w, mean)
  }

  test("jacobiEigen: exact on a hand-built symmetric matrix") {
    // diag(3, 1) rotated 45°: eigenvalues 3 and 1, eigenvectors ±(1,±1)/√2
    val m = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (values, vectors) = Pca.jacobiEigen(m)
    assert(math.abs(values(0) - 3.0) < 1e-10 && math.abs(values(1) - 1.0) < 1e-10)
    val v0 = vectors(0)
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(v0(0) - v0(1)) < 1e-10, "first eigenvector is along (1,1)")
  }

  test("fit recovers the planted principal direction and variance order") {
    val (df, u, _, mean) = planted()
    val model = Pca.fit(df, "emb", k = 3)
    assert(model.dim == 6 && model.k == 3)
    // mean recovered
    model.mean.zip(mean).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.1, s"mean: $got vs $want")
    }
    // top component aligns with ±u
    val dot = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    // the deterministic pseudo-noise correlates mildly with the signal
    // (same LCG stream), so alignment lands ~0.9988 rather than 1-1e-6
    assert(math.abs(dot) > 0.995, s"top component misaligned: |dot| = ${math.abs(dot)}")
    // eigenvalues strictly ordered, top one dominant
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) > model.eigenvalues(2))
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
  }

  test("project: scores are centered; whitening makes variances ~1") {
    val (df, _, _, _) = planted()
    val model = Pca.fit(df, "emb", k = 2)
    val proj = Pca.project(df, "emb", model, whiten = true)
    val stats = proj.select(
      avg(element_at(col("pca"), 1)).as("m1"),
      stddev_samp(element_at(col("pca"), 1)).as("s1"),
      stddev_samp(element_at(col("pca"), 2)).as("s2")).collect()(0)
    assert(math.abs(stats.getDouble(0)) < 1e-6, "projections are centered")
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.05, s"whitened var ~1: ${stats.getDouble(1)}")
    assert(math.abs(stats.getDouble(2) - 1.0) < 0.05, s"whitened var ~1: ${stats.getDouble(2)}")
  }

  test("covarianceLong matches fit's covariance on the diagonal") {
    val (df, _, _, _) = planted()
    val model = Pca.fit(df, "emb", k = 6)
    val cov = Pca.covarianceLong(df, "emb")
      .where(col("i") === col("j")).orderBy("i").collect()
    // trace equals total variance = sum of eigenvalues
    val trace = cov.map(_.getAs[Double]("cov")).sum
    val evSum = model.eigenvalues.sum
    assert(math.abs(trace - evSum) < 1e-3, s"trace $trace vs Σλ $evSum")
  }

  test("covariance aggregate shuffles dimension-sized rows, not corpus-sized") {
    val (df, _, _, _) = planted()
    val out = Pca.covarianceLong(df, "emb")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // partial aggregation before the exchange is the scale contract
    assert(plan.contains("HashAggregate"), s"expected hash aggregation:\n$plan")
  }
}
