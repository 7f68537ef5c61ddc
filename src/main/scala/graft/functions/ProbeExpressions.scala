package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * Broadcast-probe expressions: per-row membership/assignment probes
 * against a driver-built structure (Bloom filter, eval-hash set, IVF
 * centroids). These replace the Scala UDFs those operators started
 * with — a UDF boxes every array element crossing the closure boundary
 * (each shingle hash of each corpus row on the decontamination path),
 * while these read primitives straight off `ArrayData` inside the
 * scan's codegen span via [[UnarySelfRefCodegen]].
 *
 * Shipping: big probe structures (Bloom filter, eval hashes) ride a
 * `Broadcast` handle — the expression serializes as a tiny reference
 * and each executor fetches the blocks once; small ones (centroids)
 * ship inline in the serialized plan like [[PqEncode]]'s codebooks.
 */

/** Count of `array<long>` elements the broadcast Bloom filter might
  * contain — the decontamination screen (no false negatives by Bloom
  * contract, so `hits < minOverlap` can never drop a contaminated row). */
case class BloomCountHits(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_count_hits expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val b = bloom.value
    var hits = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && b.mightContainLong(a.getLong(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of `array<long>` elements present in the broadcast SORTED hash
  * array (binary search per element — primitive, no per-element boxing,
  * no hash-set node chasing). The array MUST be sorted ascending. */
case class SortedHashOverlapCount(child: Expression, hashes: Broadcast[Array[Long]])
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"overlap_count expects array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val hs = hashes.value
    var hits = 0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i) && java.util.Arrays.binarySearch(hs, a.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Quantile rank of a double value against the inline SORTED cutpoint
  * array: the count of cutpoints `<= value` (upper bound by binary
  * search — ~8 comparisons for 255 cuts). Replaces the higher-order
  * `size(filter(array(cuts…), x <= v))` form on the z-order layout
  * path, which built and filtered a fresh 255-element array per row
  * per column OUTSIDE codegen. Cuts ship inline in the plan —
  * (2^bits - 1) doubles, the same size class as PQ codebooks. NaN
  * ranks `cuts.length` (top bucket): Spark SQL orders NaN greater
  * than every double, so the HOF form counted every cut `<= NaN`. */
case class QuantileBucket(child: Expression, cuts: Array[Double])
    extends UnaryExpression with UnarySelfRefCodegen {
  require(cuts.nonEmpty, "quantile_bucket needs at least one cutpoint")
  require((1 until cuts.length).forall(i => cuts(i - 1) <= cuts(i)),
    "quantile_bucket cutpoints must be sorted ascending")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantile_bucket expects double, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    if (java.lang.Double.isNaN(v)) return cuts.length
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

private[functions] object CentroidProbe {
  /** Squared L2 between a centroid and the row vector (shorter length
    * wins, matching the UDF these expressions replace). */
  def sqDist(c: Array[Double], a: ArrayData, isFloat: Boolean): Double = {
    val n = math.min(c.length, a.numElements())
    var d = 0.0
    var j = 0
    while (j < n) {
      val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      val diff = c(j) - x
      d += diff * diff
      j += 1
    }
    d
  }

  def isFloatArray(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType

  def checkVec(name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$name expects array<float|double>, got ${t.sql}")
  }
}

/** Id of the squared-L2-nearest centroid (ties → the earlier entry,
  * matching the UDF it replaces). Centroids ship inline in the plan —
  * nlist·dim doubles, the same size class as PQ codebooks. */
case class NearestCentroidId(child: Expression, centroids: Array[(Int, Array[Double])])
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidProbe.checkVec("nearest_centroid", child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = CentroidProbe.isFloatArray(child.dataType)
    var bi = 0
    var bd = Double.MaxValue
    var ci = 0
    while (ci < centroids.length) {
      val d = CentroidProbe.sqDist(centroids(ci)._2, a, f)
      if (d < bd) { bd = d; bi = centroids(ci)._1 }
      ci += 1
    }
    bi
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Ids of the `nprobe` squared-L2-nearest centroids, nearest first
  * (bounded insertion over the centroid list — nlist is small, so a
  * heap buys nothing; ties keep centroid-list order, matching the
  * stable sortBy of the UDF it replaces). */
case class NearestCentroidIds(child: Expression, centroids: Array[(Int, Array[Double])],
    nprobe: Int) extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidProbe.checkVec("nearest_centroids", child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = CentroidProbe.isFloatArray(child.dataType)
    val np = math.min(nprobe, centroids.length)
    val bestId = new Array[Int](np)
    val bestD = new Array[Double](np)
    var filled = 0
    var ci = 0
    while (ci < centroids.length) {
      val d = CentroidProbe.sqDist(centroids(ci)._2, a, f)
      if (filled < np || d < bestD(filled - 1)) {
        // stable insertion: strictly-smaller moves left, equal keeps order
        var pos = if (filled < np) filled else np - 1
        while (pos > 0 && bestD(pos - 1) > d) {
          bestD(pos) = bestD(pos - 1)
          bestId(pos) = bestId(pos - 1)
          pos -= 1
        }
        bestD(pos) = d
        bestId(pos) = centroids(ci)._1
        if (filled < np) filled += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestId, filled))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
