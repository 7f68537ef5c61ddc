package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mutable merge buffer: null until the first non-null input sketch. */
final class CmsBuffer(var sketch: CountMinSketch)

/**
 * Merge aggregate for Count-Min sketches — the missing half of Spark's
 * CMS support: `count_min_sketch(col, eps, conf, seed)` BUILDS a sketch
 * per group, but nothing ships to merge already-built sketch rows, so a
 * per-day CMS index could not roll up without rescanning rows. This
 * aggregate merges binary sketch columns (`CountMinSketch.mergeInPlace`
 * — exact for same-(depth, width, seed) sketches, which a builder using
 * one (eps, confidence, seed) triple guarantees), completing the same
 * build-once/merge-forever contract the HLL/Theta/KLL families get
 * natively.
 *
 * State is one sketch (depth × width longs) regardless of input count;
 * partial aggregation ships sketch bytes, never rows. A null input
 * column is skipped; a group with no sketches evaluates to null.
 */
case class CmsMergeSketches(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects a binary sketch column, got ${other.sql}")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(null)

  override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
    val bytes = child.eval(input)
    if (bytes != null) {
      val sk = CountMinSketch.readFrom(
        new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
      if (buf.sketch == null) buf.sketch = sk
      else buf.sketch.mergeInPlace(sk)
    }
    buf
  }

  override def merge(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
    if (b.sketch != null) {
      if (a.sketch == null) a.sketch = b.sketch
      else a.sketch.mergeInPlace(b.sketch)
    }
    a
  }

  override def eval(buf: CmsBuffer): Any =
    if (buf.sketch == null) null else toBytes(buf.sketch)

  private def toBytes(sk: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  override def serialize(buf: CmsBuffer): Array[Byte] =
    if (buf.sketch == null) Array.emptyByteArray else toBytes(buf.sketch)
  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    if (bytes.isEmpty) new CmsBuffer(null)
    else new CmsBuffer(CountMinSketch.readFrom(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(offset: Int): CmsMergeSketches =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsMergeSketches =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): CmsMergeSketches =
    copy(child = children(0))
  override def prettyName: String = "cms_merge"
}

/**
 * Frequency estimate of `item` in a binary Count-Min sketch. Item
 * representations MATCH Spark's `CountMinSketchAgg` build paths —
 * strings probe by their UTF-8 bytes (the builder's
 * `addBinary(UTF8String.getBytes)`), integral types by their long
 * value — so estimates are consistent with sketches built by the
 * native aggregate.
 *
 * The sketch deserializes per evaluated ROW: this expression is for
 * probing a merged sketch against a SMALL key frame (heavy-hitter
 * candidates, a dimension's domain), never corpus-side — at that
 * cardinality the deserialization cost is irrelevant and the
 * CMS one-sided error contract (est ≥ exact, est ≤ exact + ε·N with
 * probability ≥ confidence) holds per probe.
 */
case class CmsEstimateCount(left: Expression, right: Expression)
    extends BinaryExpression with BinarySelfRefCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType | ByteType | ShortType | IntegerType | LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, string-or-integral item), got (${l.sql}, ${r.sql})")
  }

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val sk = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    item match {
      case s: UTF8String => sk.estimateCount(s.getBytes)
      case b: java.lang.Byte => sk.estimateCount(java.lang.Long.valueOf(b.longValue()))
      case sh: java.lang.Short => sk.estimateCount(java.lang.Long.valueOf(sh.longValue()))
      case i: java.lang.Integer => sk.estimateCount(java.lang.Long.valueOf(i.longValue()))
      case l: java.lang.Long => sk.estimateCount(l)
      case other => sk.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimateCount =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}
