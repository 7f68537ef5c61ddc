package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/**
 * Minimal BSON codec for the document-source wire client
 * ([[MongoWire]]) — just the element types the adapter's connection /
 * inspection traffic actually carries (ref `app/mongodb_adapter.py`
 * commands: ping, listDatabases, listCollections, find/limit, count):
 * double, string, embedded document, array, boolean, null, int32,
 * int64. Encoded per the public BSON 1.1 spec (little-endian sizes,
 * cstring keys, type-prefixed elements, NUL-terminated documents).
 *
 * Documents are `Seq[(String, Any)]` — ORDER MATTERS: a wire command's
 * first element is the command name. Decoding returns the same shape
 * (nested docs as `Seq[(String, Any)]`, arrays as `Seq[Any]`).
 *
 * Deliberately NOT a general BSON library: unknown element types fail
 * loudly (the stub-server tests and the adapter traffic never produce
 * them), and there is no ObjectId/date/binary — the engine's document
 * fixtures carry JSON-expressible values only.
 */
object Bson {

  type Doc = Seq[(String, Any)]

  def encode(doc: Doc): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val payload = body.toByteArray
    val total = 4 + payload.length + 1
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(total)
    out.put(payload)
    out.put(0.toByte)
    out.array()
  }

  private def writeElement(out: java.io.ByteArrayOutputStream, key: String, v: Any): Unit = {
    def cstring(s: String): Unit = {
      out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0)
    }
    def i32(i: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i)
      out.write(b.array())
    }
    def i64(l: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l)
      out.write(b.array())
    }
    v match {
      case d: Double => out.write(0x01); cstring(key); i64(java.lang.Double.doubleToLongBits(d))
      case s: String =>
        out.write(0x02); cstring(key)
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        i32(bytes.length + 1); out.write(bytes); out.write(0)
      // an EMPTY Seq encodes as an empty embedded document (the scaladoc
      // contract: `Seq.empty[(String, Any)]` = empty doc, `BsonArray(Nil)`
      // = empty array); a non-empty Seq must be key-value shaped
      case doc: Seq[_] if doc.isEmpty ||
          (doc.forall(_.isInstanceOf[(_, _)]) &&
            doc.head.asInstanceOf[(Any, Any)]._1.isInstanceOf[String]) =>
        out.write(0x03); cstring(key); out.write(encode(doc.asInstanceOf[Doc]))
      case BsonArray(items) =>
        out.write(0x04); cstring(key)
        out.write(encode(items.zipWithIndex.map { case (it, i) => i.toString -> it }))
      case b: Boolean => out.write(0x08); cstring(key); out.write(if (b) 1 else 0)
      case null => out.write(0x0A); cstring(key)
      case i: Int => out.write(0x10); cstring(key); i32(i)
      case l: Long => out.write(0x12); cstring(key); i64(l)
      case other => sys.error(s"Bson.encode: unsupported value $other (${other.getClass})")
    }
  }

  /** Wrapper distinguishing a BSON array from an embedded document
    * (both are Seqs in Scala). An empty `Seq[(String, Any)]` is
    * ambiguous — use `Seq.empty[(String, Any)]` for an empty doc and
    * `BsonArray(Nil)` for an empty array. */
  final case class BsonArray(items: Seq[Any])

  def decode(bytes: Array[Byte]): Doc = decodeDoc(
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))

  private def decodeDoc(buf: ByteBuffer): Doc = {
    val start = buf.position()
    val len = buf.getInt
    // Wire-supplied lengths are UNTRUSTED: a malformed/malicious peer
    // can send a negative or huge size that would otherwise throw
    // NegativeArraySizeException or allocate gigabytes before failing.
    // Validate against the bytes actually present first.
    require(len >= 5 && len - 4 <= buf.remaining(),
      s"invalid BSON document length $len (${buf.remaining()} bytes remain)")
    val out = Seq.newBuilder[(String, Any)]
    while (buf.position() < start + len - 1) {
      val tpe = buf.get()
      val key = readCString(buf)
      val v: Any = tpe match {
        case 0x01 => java.lang.Double.longBitsToDouble(buf.getLong)
        case 0x02 =>
          val n = buf.getInt
          require(n >= 1 && n <= buf.remaining(),
            s"invalid BSON string length $n (${buf.remaining()} bytes remain)")
          val arr = new Array[Byte](n - 1); buf.get(arr); buf.get() // NUL
          new String(arr, StandardCharsets.UTF_8)
        case 0x03 => decodeDoc(buf)
        case 0x04 => BsonArray(decodeDoc(buf).map(_._2))
        case 0x08 => buf.get() != 0
        case 0x0A => null
        case 0x10 => buf.getInt
        case 0x12 => buf.getLong
        case other => sys.error(s"Bson.decode: unsupported element type 0x${other.toInt.toHexString}")
      }
      out += key -> v
    }
    buf.get() // trailing NUL
    out.result()
  }

  private def readCString(buf: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var b = buf.get()
    while (b != 0) { sb.write(b); b = buf.get() }
    new String(sb.toByteArray, StandardCharsets.UTF_8)
  }
}
