package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed logistic regression over scalar feature columns — the
 * model-based quality filter of a corpus pipeline (the fastText-style
 * classifier CCNet/GPT-3-era curation trains on "good vs crawl" labels
 * and applies corpus-wide; Joulin et al. 2017 describe the shape). The
 * reference trains its NL models driver-side on collected samples
 * (`app/models/trainer.py:275-303`); this is the distributed analogue
 * for corpus-scale labels.
 *
 * Architecture (the [[graft.operators.Pca]] discipline): the WEIGHTS
 * live on the driver (d+1 doubles), each epoch is ONE distributed
 * aggregate — the gradient is a (d+1)-sized sum the executors combine
 * map-side, so the shuffle per epoch carries d+1 doubles per split,
 * never rows. Scoring inlines the final weights as literals — a
 * narrow, shuffle-free projection. Nothing corpus-sized ever
 * concentrates anywhere.
 */
object LogReg {

  /** σ(z) column expression, numerically safe for |z| ≤ ~700. */
  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Margin z = b + Σ wⱼ·xⱼ with literal weights. */
  private def margin(featCols: Seq[String], w: Array[Double]): Column =
    featCols.zipWithIndex.map { case (c, j) => col(c).cast("double") * w(j) }
      .reduce(_ + _) + lit(w.last)

  /**
   * One gradient evaluation in LONG FORM — (feature, grad) rows, one
   * per feature plus `__bias`, where grad = mean((σ(z) − y)·x) — the
   * oracle-checkable face of [[train]] (the x_kmeans_step precedent:
   * pin a single exactly-reproducible step, spec-test the loop).
   * `w` holds the d feature weights with the bias LAST.
   */
  def gradientFrame(df: DataFrame, featCols: Seq[String], labelCol: String,
      w: Array[Double]): DataFrame = {
    require(w.length == featCols.length + 1, "weights = features + bias")
    val err = (sigmoid(margin(featCols, w)) - col(labelCol).cast("double")).as("__e")
    val base = df.select(featCols.map(c => col(c).cast("double").as(c)) :+ err: _*)
    val agg = base.agg(
      avg(col("__e") * lit(1.0)).as("__bias"),
      featCols.map(c => avg(col("__e") * col(c)).as(c)): _*)
    // long form via stack: (feature, grad)
    val pairs = (featCols :+ "__bias").map(c => s"'$c', `$c`").mkString(", ")
    agg.selectExpr(s"stack(${featCols.length + 1}, $pairs) as (feature, grad)")
      .select(col("feature"), (round(col("grad"), 6) + lit(0.0)).as("grad"))
  }

  /** Mean logistic loss under fixed weights (diagnostic). */
  def loss(df: DataFrame, featCols: Seq[String], labelCol: String,
      w: Array[Double]): Double = {
    val z = margin(featCols, w)
    val y = col(labelCol).cast("double")
    // -[y·ln σ(z) + (1-y)·ln(1-σ(z))] = ln(1+e^z) - y·z  (stable form)
    df.agg(avg(
      when(z > 0, z + log(lit(1.0) + exp(-z))).otherwise(log(lit(1.0) + exp(z)))
        - y * z).as("l")).collect()(0).getDouble(0)
  }

  /**
   * Full-batch gradient descent: `epochs` rounds, each ONE distributed
   * aggregate (d+1 averaged error-products, map-side combined), weight
   * update on the driver. Deterministic given the data and
   * hyperparameters — no sampling, no row order sensitivity beyond
   * double-sum associativity. Returns the weight vector, bias last.
   */
  def train(df: DataFrame, featCols: Seq[String], labelCol: String,
      epochs: Int = 50, learningRate: Double = 1.0,
      l2: Double = 0.0): Array[Double] = {
    require(epochs >= 1 && learningRate > 0)
    val w = new Array[Double](featCols.length + 1)
    val y = col(labelCol).cast("double")
    var e = 0
    while (e < epochs) {
      val err = (sigmoid(margin(featCols, w)) - y).as("__e")
      val base = df.select(featCols.map(c => col(c).cast("double").as(c)) :+ err: _*)
      val row = base.agg(
        avg(col("__e")).as("__bias"),
        featCols.map(c => avg(col("__e") * col(c)).as(c)): _*).collect()(0)
      var j = 0
      while (j < featCols.length) {
        w(j) -= learningRate * (row.getDouble(j + 1) + l2 * w(j))
        j += 1
      }
      w(featCols.length) -= learningRate * row.getDouble(0)
      e += 1
    }
    w
  }

  /** Score with literal weights: adds `probCol` = σ(z). Narrow
    * projection, shuffle-free, codegen'd — the corpus-wide apply. */
  def score(df: DataFrame, featCols: Seq[String], w: Array[Double],
      probCol: String = "prob"): DataFrame =
    df.withColumn(probCol, sigmoid(margin(featCols, w)))
}
