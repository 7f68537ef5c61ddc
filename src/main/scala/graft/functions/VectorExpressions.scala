package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Vector similarity expressions (SURVEY.md §2.11 `cosine_sim`; north-star
 * similarity search over the `embeddings` fixture).
 *
 * Implemented as a native Catalyst expression — a tight primitive loop
 * over the unboxed `ArrayData`, accumulating in double — rather than a
 * Scala UDF (boxing per element) or higher-order `aggregate`/`zip_with`
 * (interpreted lambda per element). Codegen: the loop is emitted via
 * `doGenCode`, so it stays inside whole-stage codegen.
 */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {


  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val la = isFloat(left); val lb = isFloat(right)
    var i = 0
    while (i < n) {
      val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (lb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.$getA($i);
         |  double y = (double) $b.$getB($i);
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Random-hyperplane sign-bit LSH signature (Charikar, STOC 2002) in one
 * pass: projects the
 * vector onto `numBits` deterministic hyperplanes (seeded splitmix64
 * components in [-1, 1)) and packs the signs into a long. One expression
 * evaluation per row — NOT `numBits` separate dot-product expressions,
 * which would rebuild `numBits` literal arrays per row and multiply the
 * projection cost under projection collapse.
 */
case class SignBitsLsh(child: Expression, numBits: Int, dim: Int, seed: Long = 42L)
    extends UnaryExpression with UnarySelfRefCodegen {
  require(numBits >= 1 && numBits <= 64)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // planes[b][d], deterministic from the seed — identical on every executor
  @transient private lazy val planes: Array[Array[Double]] = {
    val out = Array.ofDim[Double](numBits, dim)
    var s = seed
    var b = 0
    while (b < numBits) {
      var d = 0
      while (d < dim) {
        s = graft.functions.HashUtil.mix64(s)
        out(b)(d) = s.toDouble / Long.MaxValue.toDouble
        d += 1
      }
      b += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val fl = isFloat
    var sig = 0L
    var b = 0
    while (b < numBits) {
      val p = planes(b)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += p(i) * (if (fl) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dot product of two numeric arrays (building block for IVF/LSH scoring). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    val la = isFloat(left); val lb = isFloat(right)
    var i = 0
    while (i < n) {
      val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (lb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Symmetric int8 quantization statistics in ONE pass: per-vector
 * `struct<scale double, qnorm bigint, rmse double>` where
 * scale = max|x|/127, q_i = round(x_i/scale) clamped to ±127 (ties away
 * from zero, matching DuckDB `round`), qnorm = Σ q_i², and rmse the
 * reconstruction error √(Σ(x_i − q_i·scale)²/dim).
 *
 * A native expression rather than `transform`/`aggregate` composition:
 * an outer alias referenced inside a higher-order-function lambda is
 * re-inlined by CollapseProject and re-evaluated PER ELEMENT (the
 * array_max scan made the composed version O(dim²) per row — measured
 * 2× on the sf0.1 embeddings). Two primitive passes (max, then
 * accumulate), no array materialized at all.
 */
case class Int8QuantizeStats(child: Expression)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qnorm", LongType, nullable = false),
    StructField("rmse", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_quantize_stats expects array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def roundAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (f) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    var qnorm = 0L
    var err2 = 0.0
    i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      val q = if (scale == 0) 0L else math.max(-127L, math.min(127L, roundAway(x / scale)))
      qnorm += q * q
      val d = x - q * scale
      err2 += d * d
      i += 1
    }
    val rmse = if (n == 0) 0.0 else math.sqrt(err2 / n)
    new GenericInternalRow(Array[Any](scale, qnorm, rmse))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * The int8 code vector as `array<double>` (double-typed so it feeds
 * `cosine_sim` directly — per-vector scales cancel inside cosine, so
 * ranking quantized vectors needs exactly these codes). Same arithmetic
 * as [[Int8QuantizeStats]]; one max pass + one code pass per row,
 * immune to the lambda-scope re-evaluation that made the
 * `transform(..., array_max ...)` composition quadratic.
 */
case class Int8Codes(child: Expression)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"int8_codes expects array<float|double>, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def roundAway(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val f = isFloat
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (f) a.getFloat(i).toDouble else a.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = if (scale == 0) 0.0 else math.max(-127L, math.min(127L, roundAway(x / scale))).toDouble
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
