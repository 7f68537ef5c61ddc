package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed PCA / whitening over an embedding column — the
 * decorrelation step embedding pipelines run before product
 * quantization, SemDeDup-style clustering, or low-rank compression
 * (OPQ rotates into exactly this basis; Jégou et al. TPAMI'11 §IV.C
 * notes PQ's sensitivity to correlated dimensions). The reference's
 * vector surface stops at storing embeddings (`app/models/
 * trainer.py:194-230`); this is extension surface for the 100 TB
 * story.
 *
 * Architecture: the DATA never leaves the cluster — one corpus pass
 * computes the d×d second-moment sums as a long-form grouped aggregate
 * (the [[Similarity.kmeansStep]] shape: posexplode fans out d² rows
 * per vector, map-side partial aggregation collapses each split to
 * ≤ d² partial sums, so the shuffle carries d² × splits rows —
 * DIMENSION-sized, never corpus-sized). The d×d eigenproblem is
 * driver-side cyclic Jacobi (d ≤ a few hundred in any embedding
 * pipeline; 64×64 solves in microseconds), and the projection back
 * over the corpus is a broadcast-literal zip_with/aggregate expression
 * — narrow, codegen'd, shuffle-free.
 */
object Pca {

  /** Long-form sample covariance of an `array<float|double>` column:
    * (i, j, cov) for the upper triangle (i ≤ j, 0-based dims), exact
    * from one-pass sums — the oracle-checkable face of [[fit]]. */
  def covarianceLong(df: DataFrame, embCol: String): DataFrame = {
    val e = df.select(col(embCol).cast("array<double>").as("__e"))
      .where(col("__e").isNotNull)
    e.select(posexplode(col("__e")).as(Seq("i", "xi")), col("__e"))
      .select(col("i"), col("xi"), posexplode(col("__e")).as(Seq("j", "xj")))
      .where(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1L)).as("__n"), sum(col("xi")).as("__sx"),
        sum(col("xj")).as("__sy"), sum(col("xi") * col("xj")).as("__sxy"))
      .select(col("i"), col("j"),
        (round((col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__n") - 1), 6) + lit(0.0)).as("cov"))
  }

  /** Fitted model: per-dimension mean, eigenvalues (variance along each
    * component, descending), and row-major components (k × d). */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /**
   * Fit a k-component PCA: one distributed pass for (n, Σx, Σxxᵀ) —
   * same aggregate shape as [[covarianceLong]] but over the full
   * matrix — then a driver-side Jacobi eigendecomposition of the d×d
   * sample covariance. Deterministic: the aggregate sums are the only
   * distributed arithmetic and the eigensolver is seedless.
   */
  def fit(df: DataFrame, embCol: String, k: Int): PcaModel = {
    val e = df.select(col(embCol).cast("array<double>").as("__e"))
      .where(col("__e").isNotNull)
    val rows = e.select(posexplode(col("__e")).as(Seq("i", "xi")), col("__e"))
      .select(col("i"), col("xi"), posexplode(col("__e")).as(Seq("j", "xj")))
      .where(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1L)).as("n"), sum(col("xi")).as("sx"),
        sum(col("xj")).as("sy"), sum(col("xi") * col("xj")).as("sxy"))
      .collect()
    require(rows.nonEmpty, "PCA fit over an empty frame")
    val d = rows.map(_.getAs[Int]("j")).max + 1
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val n = rows.head.getAs[Long]("n").toDouble
    require(n > 1, "PCA needs at least 2 vectors")
    val mean = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      if (i == j) mean(i) = r.getAs[Double]("sx") / n
      val c = (r.getAs[Double]("sxy") -
        r.getAs[Double]("sx") * r.getAs[Double]("sy") / n) / (n - 1)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(mean, values.take(k), vectors.take(k))
  }

  /**
   * Project embeddings onto the model's components: output
   * (all input columns, `outCol` = array<double> of k scores).
   * `whiten` divides each score by √eigenvalue so every output
   * dimension carries unit variance (the preconditioner metric
   * learning and some ANN distance models expect). Broadcast-free by
   * construction — the model rides inside the expression tree as
   * literals.
   */
  def project(df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val meanArr = array(model.mean.map(lit(_)): _*)
    val centered = zip_with(col(embCol).cast("array<double>"), meanArr,
      (x, m) => x - m)
    val scores = model.components.zip(model.eigenvalues).map {
      case (comp, ev) =>
        val w = array(comp.map(lit(_)): _*)
        val dot = aggregate(zip_with(centered, w, (x, c) => x * c),
          lit(0.0), (acc, v) => acc + v)
        if (whiten) dot / math.sqrt(math.max(ev, 1e-12)) else dot
    }
    df.withColumn(outCol, array(scores: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, matching row eigenvectors), deterministic.
    * O(d³) per sweep, a handful of sweeps to 1e-12 — microseconds at
    * embedding dimensionality (Golub & Van Loan §8.5). */
  private[operators] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            // θ = 0 (equal diagonals) still needs the full 45° rotation
            val sgn = if (theta >= 0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
