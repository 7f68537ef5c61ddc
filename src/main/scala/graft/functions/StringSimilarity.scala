package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro-Winkler string similarity as a native Catalyst expression — the
 * pairwise scorer for cross-source entity resolution
 * ([[graft.operators.EntityResolution]]). Classic definition (Winkler
 * 1990): Jaro similarity (bounded match window of
 * `max(|a|,|b|)/2 - 1`, half-transposition counting) plus the common-
 * prefix bonus `l·p·(1−jaro)` with `l ≤ 4`, `p = 0.1`, applied only
 * above the 0.7 boost threshold. Empty strings score 0 even against
 * each other — both conventions match DuckDB's
 * `jaro_winkler_similarity`, so the oracle can recompute scores
 * exactly.
 *
 * O(|a|·|b|) per pair — which is why the operator only ever evaluates
 * it on BLOCKED candidate pairs, never all-pairs.
 */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with BinarySelfRefCodegen {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    JaroWinklerSimilarity.jaroWinkler(a, b)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinklerSimilarity {

  def jaro(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val ma = new Array[Boolean](a.length)
    val mb = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - t / 2) / m) / 3.0
  }

  def jaroWinkler(a: String, b: String, p: Double = 0.1,
      boostThreshold: Double = 0.7): Double = {
    val j = jaro(a, b)
    if (j <= boostThreshold) return j
    var l = 0
    val max = math.min(4, math.min(a.length, b.length))
    while (l < max && a.charAt(l) == b.charAt(l)) l += 1
    j + l * p * (1.0 - j)
  }
}
