package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k-per-group aggregate: keeps the k best (ord, id) pairs —
 * ord descending, ties to the smaller id — in a fixed-size binary heap.
 *
 * This is the SCALE path for "top N rows per group": the standard
 * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` plan
 * shuffles and sorts EVERY row of the corpus (WindowExec sorts each
 * hash partition in full), while this aggregate partial-aggregates
 * map-side — each map task ships at most k pairs per group it saw, so
 * the shuffle volume is bounded by groups × k × splits-per-group
 * instead of the row count, and nothing global ever sorts. At 100 TB
 * with per-user top-k this is the difference between shuffling the
 * corpus and shuffling an index-sized summary.
 *
 * State is O(k) per group (a min-heap ordered worst-first, so the
 * replacement test against the heap head is O(1) for the common
 * below-threshold row), serialized as a flat (count, pairs) byte image
 * for inter-stage merge.
 *
 * Null handling: rows with a null ord or id are SKIPPED (top-k over
 * present values — a group of only-null ords yields an empty array and
 * disappears under posexplode), which diverges from a raw
 * `row_number()` window that would rank null rows last; NaN follows
 * Spark's total order (greater than every value, first under DESC).
 */
case class TopKByValue(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (ord.dataType, id.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (o, i) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_value expects (double ord, bigint id), got (${o.sql}, ${i.sql}) — cast at the call site")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      buf.offer(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  override def eval(buf: TopKHeap): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (o, i) =>
      new GenericInternalRow(Array[Any](o, i)): Any
    })
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TopKByValue =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByValue =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): TopKByValue =
    copy(ord = children(0), id = children(1))
  override def prettyName: String = "top_k_by_value"
}

/** Fixed-capacity binary min-heap over (ord, id), ordered WORST-first
  * (smaller ord, then larger id), so `peek` is the current cutoff. */
final class TopKHeap(val k: Int) {
  private val ords = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** a is worse than b under (ord desc, id asc) ranking.
    * `Double.compare` gives the same TOTAL order Spark's sort uses
    * (NaN greater than any value, so a window's DESC ranks it first) —
    * a `<` comparison is false in both directions for NaN and would
    * corrupt the heap invariant. */
  @inline private def worse(oa: Double, ia: Long, ob: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(oa, ob)
    c < 0 || (c == 0 && ia > ib)
  }

  def offer(o: Double, i: Long): Unit = {
    if (n < k) {
      ords(n) = o; ids(n) = i; n += 1
      var c = n - 1
      while (c > 0 && worse(ords(c), ids(c), ords((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(ords(0), ids(0), o, i)) {
      ords(0) = o; ids(0) = i
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var c = 0
    var done = false
    while (!done) {
      val l = 2 * c + 1; val r = 2 * c + 2
      var w = c
      if (l < n && worse(ords(l), ids(l), ords(w), ids(w))) w = l
      if (r < n && worse(ords(r), ids(r), ords(w), ids(w))) w = r
      if (w == c) done = true else { swap(c, w); c = w }
    }
  }

  def absorb(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { offer(other.ords(i), other.ids(i)); i += 1 }
  }

  def sortedBestFirst: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (ords(i), ids(i)); i += 1 }
    // best first: ord desc, id asc (Double.compare for NaN totality)
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1)
        c > 0 || (c == 0 && a._2 < b._2)
      })
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ords(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}
