package graft.sources

import java.net.Socket
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Minimal MongoDB wire-protocol client over OP_MSG (opcode 2013, the
 * modern command transport — public wire spec), upgrading [[DocSource]]
 * from a JSON-fixture reader to a real source adapter (round-16 verdict
 * #5, carried-missing #1). Connection semantics mirror the reference
 * adapter (ref `app/mongodb_adapter.py:32-95`):
 *
 *  - URL parsing: database from the path (`mongodb://host/db`), else
 *    the `defaultDatabase` query param, else `authSource`, else
 *    `admin`; a `ping` probes the connection.
 *  - `listCollectionNames(db)`, `allDatabasesWithCollections` (system
 *    dbs admin/local/config skipped, empty dbs omitted).
 *  - `sampleFind(db, coll, limit)` — the bounded sampling the schema
 *    inference runs on (ref sample_size=100).
 *
 * One short-lived socket per request (the adapter's traffic is a
 * handful of inspection commands, not a data plane); responses are
 * decoded with [[Bson]]. No auth/TLS/compression — the sandbox hosts
 * no real server; [[graft.sources]]' DocSourceWireSpec drives this
 * against an in-process stub speaking the same frames, the pattern
 * HttpLlmClientSpec established for the LLM client.
 */
final class MongoWire(url: String) {

  /** Parsed per the reference's rules. */
  val (host: String, port: Int, databaseName: String) = {
    val u = java.net.URI.create(url)
    require(u.getScheme == "mongodb", s"not a mongodb:// url: $url")
    val params = Option(u.getQuery).getOrElse("").split("&").filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    val pathDb = Option(u.getPath).map(_.stripPrefix("/")).filter(_.nonEmpty)
    val db = pathDb
      .orElse(params.get("defaultDatabase"))
      .orElse(params.get("authSource"))
      .getOrElse("admin")
    (u.getHost, if (u.getPort > 0) u.getPort else 27017, db)
  }

  private val requestId = new java.util.concurrent.atomic.AtomicInteger(1)

  /** One OP_MSG round-trip: header(16) + flags(4) + section kind 0 +
    * BSON command body. Returns the reply body. */
  def runCommand(db: String, command: Bson.Doc): Bson.Doc = {
    val body = Bson.encode(command :+ ("$db" -> db))
    val len = 16 + 4 + 1 + body.length
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(len).putInt(requestId.getAndIncrement()).putInt(0).putInt(2013)
    buf.putInt(0) // flagBits
    buf.put(0.toByte) // section kind 0: single body document
    buf.put(body)
    val sock = new Socket(host, port)
    try {
      sock.getOutputStream.write(buf.array())
      sock.getOutputStream.flush()
      val in = sock.getInputStream
      val head = in.readNBytes(4)
      require(head.length == 4, "connection closed mid-header")
      val total = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
      val rest = in.readNBytes(total - 4)
      require(rest.length == total - 4, "connection closed mid-message")
      val r = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
      r.getInt; r.getInt; val opCode = r.getInt // requestID, responseTo, opCode
      require(opCode == 2013, s"unexpected reply opcode $opCode")
      r.getInt // flagBits
      require(r.get() == 0, "expected section kind 0")
      val bodyBytes = new Array[Byte](rest.length - r.position())
      r.get(bodyBytes)
      val doc = Bson.decode(bodyBytes)
      doc.find(_._1 == "ok") match {
        case Some((_, ok: Double)) if ok == 1.0 => doc
        case Some((_, ok: Int)) if ok == 1 => doc
        case _ => sys.error(s"command failed: $doc")
      }
    } finally sock.close()
  }

  /** Connection test — the adapter pings admin before anything else. */
  def ping(): Boolean =
    try { runCommand("admin", Seq("ping" -> 1)); true }
    catch { case scala.util.control.NonFatal(_) => false }

  def listDatabaseNames(): Seq[String] =
    runCommand("admin", Seq("listDatabases" -> 1, "nameOnly" -> true))
      .collectFirst { case ("databases", Bson.BsonArray(dbs)) =>
        dbs.collect { case d: Seq[(String, Any)] @unchecked =>
          d.collectFirst { case ("name", n: String) => n }
        }.flatten
      }.getOrElse(Nil)

  def listCollectionNames(db: String): Seq[String] =
    runCommand(db, Seq("listCollections" -> 1, "nameOnly" -> true))
      .collectFirst { case ("cursor", cur: Seq[(String, Any)] @unchecked) =>
        cur.collectFirst { case ("firstBatch", Bson.BsonArray(cs)) =>
          cs.collect { case c: Seq[(String, Any)] @unchecked =>
            c.collectFirst { case ("name", n: String) => n }
          }.flatten
        }.getOrElse(Nil)
      }.getOrElse(Nil)

  /** Non-system databases that actually hold collections (ref
    * get_all_databases_with_collections: admin/local/config skipped,
    * empty dbs omitted). */
  def allDatabasesWithCollections(): Map[String, Seq[String]] =
    listDatabaseNames()
      .filterNot(Set("admin", "local", "config"))
      .map(db => db -> listCollectionNames(db))
      .filter(_._2.nonEmpty)
      .toMap

  /** Bounded sample scan — the docs schema inference runs on. */
  def sampleFind(db: String, collection: String, limit: Int = 100): Seq[Bson.Doc] =
    runCommand(db, Seq("find" -> collection, "limit" -> limit))
      .collectFirst { case ("cursor", cur: Seq[(String, Any)] @unchecked) =>
        cur.collectFirst { case ("firstBatch", Bson.BsonArray(docs)) =>
          docs.collect { case d: Seq[(String, Any)] @unchecked => d }
        }.getOrElse(Nil)
      }.getOrElse(Nil)

  def countDocuments(db: String, collection: String): Long =
    runCommand(db, Seq("count" -> collection))
      .collectFirst {
        case ("n", n: Int) => n.toLong
        case ("n", n: Long) => n
      }.getOrElse(0L)
}

object MongoWire {

  /** Render a decoded BSON document as a JSON line (the docs the wire
    * returned, re-expressed in the format [[DocSource.register]]'s
    * sampled inference consumes — so wire-sourced and fixture-sourced
    * collections run the SAME inference path). */
  def toJsonLine(doc: Bson.Doc): String = {
    def value(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
      case b: Boolean => b.toString
      case i: Int => i.toString
      case l: Long => l.toString
      case Bson.BsonArray(items) => items.map(value).mkString("[", ",", "]")
      case d: Seq[(String, Any)] @unchecked => render(d)
      case other => sys.error(s"toJsonLine: unsupported $other")
    }
    def render(d: Bson.Doc): String =
      d.map { case (k, v) => "\"" + k + "\":" + value(v) }.mkString("{", ",", "}")
    render(doc)
  }

  /** Register a wire-sourced collection as a temp view through the SAME
    * sampled-inference path as the fixture reader: sample over the
    * wire, re-render as JSON lines, infer with Spark's JSON reader
    * (ref get_collection_schema's sample_size=100 find().limit()). */
  def register(spark: org.apache.spark.sql.SparkSession, client: MongoWire,
      db: String, collection: String, sampleSize: Int = 100): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val lines = client.sampleFind(db, collection, sampleSize).map(toJsonLine)
    val df = spark.read.json(lines.toDS())
    df.createOrReplaceTempView(collection)
    df
  }
}
