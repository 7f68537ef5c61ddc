package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character-distribution statistics in ONE pass over the string:
 * `struct<char_entropy double, n_distinct_chars int>`.
 *
 * `char_entropy` is the Shannon entropy (bits per character, log2) of the
 * code-point frequency distribution — the classic gibberish/boilerplate
 * quality signal for corpus curation (near-zero for `aaaa…`, ~4.2 for
 * English prose, ~6+ for base64/binary spew). Matches DuckDB's
 * `entropy()` aggregate over the exploded characters, which is how the
 * oracle replicates it — but computed here as a narrow per-row
 * expression instead of an explode → groupBy over corpus-length rows
 * (at 100 TB an explode-per-character shuffle is ~10× the corpus in
 * row overhead; this stays inside the scan's codegen span).
 *
 * Counting is per Unicode code point (surrogate pairs count once), the
 * same unit as DuckDB's single-character `string_split` pieces. ASCII
 * code points hit a flat 128-slot array; the general path falls back to
 * a hash map. Empty strings yield (0.0, 0).
 */
case class CharDistribution(child: Expression)
    extends UnaryExpression with UnarySelfRefCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("char_entropy", DoubleType, nullable = false),
    StructField("n_distinct_chars", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val slot = other.computeIfAbsent(cp, _ => new Array[Int](1))
        slot(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    var distinct = 0
    var sumCLogC = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { distinct += 1; sumCLogC += c * math.log(c) }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        distinct += 1
        sumCLogC += c * math.log(c)
      }
    }
    // H = log2(n) - (1/n) Σ c·log2(c), computed in nats then converted
    val entropy =
      if (n == 0) 0.0
      else (math.log(n) - sumCLogC / n) / math.log(2.0)
    new GenericInternalRow(Array[Any](entropy, distinct))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
