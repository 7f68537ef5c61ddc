package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/**
 * Product-quantization expressions (Jégou et al., "Product quantization
 * for nearest neighbor search", TPAMI 2011): the embedding splits into
 * `m` contiguous subvectors, each encoded as the id of its nearest
 * codebook centroid — m small integers (m·log2(k) bits) instead of
 * dim·32 float bits per vector.
 *
 * Both expressions are single-pass primitive loops carrying their
 * parameters (codebooks / distance table) INSIDE the expression
 * instance — the same pattern as MinHashSignature's seeds — so nothing
 * re-evaluates per element and nothing broadcasts separately: the
 * (tiny) tables ship inside the serialized plan.
 */

/** Codes: `array<int>` of length m; subspace s encodes to the centroid
  * minimizing squared L2 distance over that slice (ties → lower id).
  * With `normalize` the vector is L2-normalized before slicing (one
  * extra primitive pass inside the same expression): on unit vectors
  * squared L2 is 2−2·cos, so ADC ranking by the resulting codes is
  * COSINE ranking — the contract the search path needs. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnarySelfRefCodegen {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    // exact-length guard: a LONGER vector would silently encode only the
    // first m*subDim dims (while normalize divides by the full-vector
    // norm) — surface any dimension mismatch as null, the same contract
    // as PqAdcDistance's (m, k) mismatch handling
    if (n != m * subDim) return null
    val f = isFloat
    var inv = 1.0
    if (normalize) {
      var n2 = 0.0
      var i = 0
      while (i < n) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        n2 += x * x
        i += 1
      }
      if (n2 > 0) inv = 1.0 / math.sqrt(n2)
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = codebooks(s)(c)
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (f) a.getFloat(base + d).toDouble else a.getDouble(base + d)) * inv
          val diff = x - cent(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; bestC = c }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Asymmetric-distance (ADC) score of a code vector against a query's
 * precomputed per-subspace distance table (`table(s*k + c)` = squared
 * L2 between the query's subvector s and centroid c): the approximate
 * squared distance is m table lookups per row — no float vector is
 * read at ranking time, which is the entire point of PQ at index scale.
 */
/**
 * Per-subspace quantization residuals: `errors[s]` = squared L2 between
 * the (optionally normalized) vector's subvector s and its NEAREST
 * codebook centroid — the fit-quality / drift signal an index operator
 * monitors (rising residuals mean the codebooks no longer match the
 * embedding distribution and the index needs refitting). Same
 * single-pass argmin loop as [[PqEncode]], keeping the distance instead
 * of the index.
 */
case class PqSubspaceErrors(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnarySelfRefCodegen {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_subspace_errors expects array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != m * subDim) return null
    val f = isFloat
    var inv = 1.0
    if (normalize) {
      var n2 = 0.0
      var i = 0
      while (i < n) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        n2 += x * x
        i += 1
      }
      if (n2 > 0) inv = 1.0 / math.sqrt(n2)
    }
    val errors = new Array[Double](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cent = codebooks(s)(c)
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (f) a.getFloat(base + d).toDouble else a.getDouble(base + d)) * inv
          val diff = x - cent(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) bestD = d2
        c += 1
      }
      errors(s) = bestD
      s += 1
    }
    new GenericArrayData(errors)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * A query vector's ADC lookup table as a row value: `table[s*k + c]` =
 * squared L2 between the (optionally L2-normalized) query's subvector s
 * and codebook centroid c — the per-QUERY half of batch ADC serving.
 * One evaluation per query row (m·k·subDim work), after which every
 * (query, code) pair scores in m lookups via [[PqAdcLookup]]; computing
 * the full distance per pair instead would be dim work per pair, i.e.
 * no better than scanning the float vectors.
 */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnarySelfRefCodegen {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_table expects array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    // same exact-length contract as PqEncode: a mismatched query
    // dimension surfaces as null, not a silent prefix ranking
    if (n != m * subDim) return null
    val f = isFloat
    var inv = 1.0
    if (normalize) {
      var n2 = 0.0
      var i = 0
      while (i < n) {
        val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
        n2 += x * x
        i += 1
      }
      if (n2 > 0) inv = 1.0 / math.sqrt(n2)
    }
    val t = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val cent = codebooks(s)(c)
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (f) a.getFloat(s * subDim + d).toDouble else a.getDouble(s * subDim + d)) * inv
          val diff = x - cent(d)
          d2 += diff * diff
          d += 1
        }
        t(s * k + c) = d2
        c += 1
      }
      s += 1
    }
    new GenericArrayData(t)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Batch ADC score: codes (`array<int>`, left) against a PER-ROW lookup
 * table (`array<double>`, right — a [[PqAdcTable]] value carried on the
 * joined query row). m table lookups per pair, the two-argument form of
 * [[PqAdcDistance]] the batch k-NN serving join needs (there the table
 * is not a plan-time constant — each query row brings its own).
 */
case class PqAdcLookup(left: Expression, right: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with BinarySelfRefCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_lookup expects (array<int>, array<double>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(codesIn: Any, tableIn: Any): Any = {
    val codes = codesIn.asInstanceOf[ArrayData]
    val table = tableIn.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m * k != table.numElements()) return null
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= k) return null
      sum += table.getDouble(s * k + c)
      s += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class PqAdcDistance(child: Expression, table: Array[Double], k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with UnarySelfRefCodegen {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_distance expects array<int>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val m = a.numElements()
    // codes from a model with different (m, k) would silently read
    // another subspace's entries — surface the mismatch as null instead
    if (m * k != table.length) return null
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = a.getInt(s)
      if (c < 0 || c >= k) return null
      sum += table(s * k + c)
      s += 1
    }
    sum
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
