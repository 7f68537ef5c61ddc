package graft.sources

import graft.SparkSpec
import java.net.ServerSocket
import java.nio.{ByteBuffer, ByteOrder}

/**
 * Wire-protocol spec for [[MongoWire]] against an IN-PROCESS stub
 * server speaking real OP_MSG frames + BSON (the HttpLlmClientSpec
 * pattern: no live server exists in the sandbox, so the protocol layer
 * is exercised against a faithful local implementation of the public
 * wire format). Closes round-16 carried-missing #1: the document path's
 * connection semantics (ref `app/mongodb_adapter.py:32-95` URL parsing,
 * collection listing, sampled find) now run over actual sockets, and
 * the wire-sourced registration is asserted to produce THE SAME
 * inference results as the JSON-fixture path.
 */
class DocSourceWireSpec extends SparkSpec {

  /** In-memory documents served by the stub (nested + typed so the
    * inference comparison is non-trivial). */
  private val people: Seq[Bson.Doc] = (1 to 12).map { i =>
    Seq(
      "_id" -> i.toLong,
      "name" -> s"P$i",
      "age" -> (20 + i),
      "active" -> (i % 2 == 0),
      "score" -> (i * 1.5),
      "contact" -> Seq("city" -> s"C${i % 3}", "zip" -> (10000 + i).toLong),
      "tags" -> Bson.BsonArray(Seq(s"t${i % 2}", "all")))
  }
  private val stores: Map[String, Map[String, Seq[Bson.Doc]]] = Map(
    "shop" -> Map("people" -> people, "carts" -> people.take(3)),
    "emptydb" -> Map.empty,
    "local" -> Map("system_stuff" -> people.take(1)))

  /** Stub OP_MSG server: one command per connection, framed exactly as
    * the client sends (header + flags + kind-0 BSON body). */
  private def withStub[A](f: Int => A): A = {
    val server = new ServerSocket(0)
    @volatile var running = true
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          try {
            val in = sock.getInputStream
            val head = in.readNBytes(4)
            if (head.length == 4) {
              val total = ByteBuffer.wrap(head).order(ByteOrder.LITTLE_ENDIAN).getInt
              val rest = in.readNBytes(total - 4)
              val r = ByteBuffer.wrap(rest).order(ByteOrder.LITTLE_ENDIAN)
              val reqId = { r.getInt; r.getInt(4) } // skip requestID read below properly
              r.position(0); val requestId = r.getInt; r.getInt; r.getInt // req, respTo, op
              r.getInt // flags
              r.get() // kind 0
              val body = new Array[Byte](rest.length - r.position())
              r.get(body)
              val cmd = Bson.decode(body)
              val db = cmd.collectFirst { case ("$db", d: String) => d }.getOrElse("admin")
              val reply: Bson.Doc = cmd.head match {
                case ("ping", _) => Seq("ok" -> 1.0)
                case ("listDatabases", _) => Seq(
                  "databases" -> Bson.BsonArray(
                    (stores.keys.toSeq.sorted :+ "admin").map(n => Seq("name" -> n))),
                  "ok" -> 1.0)
                case ("listCollections", _) => Seq(
                  "cursor" -> Seq(
                    "firstBatch" -> Bson.BsonArray(
                      stores.getOrElse(db, Map.empty).keys.toSeq.sorted
                        .map(n => Seq("name" -> n, "type" -> "collection"))),
                    "id" -> 0L, "ns" -> s"$db.$$cmd.listCollections"),
                  "ok" -> 1.0)
                case ("find", coll: String) =>
                  val limit = cmd.collectFirst { case ("limit", n: Int) => n }.getOrElse(100)
                  val docs = stores.getOrElse(db, Map.empty).getOrElse(coll, Nil).take(limit)
                  Seq("cursor" -> Seq(
                    "firstBatch" -> Bson.BsonArray(docs),
                    "id" -> 0L, "ns" -> s"$db.$coll"), "ok" -> 1.0)
                case ("count", coll: String) => Seq(
                  "n" -> stores.getOrElse(db, Map.empty).getOrElse(coll, Nil).size,
                  "ok" -> 1.0)
                case other => Seq("ok" -> 0.0, "errmsg" -> s"unknown command $other")
              }
              val rb = Bson.encode(reply)
              val len = 16 + 4 + 1 + rb.length
              val out = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
              out.putInt(len).putInt(999).putInt(requestId).putInt(2013)
              out.putInt(0).put(0.toByte).put(rb)
              sock.getOutputStream.write(out.array())
              sock.getOutputStream.flush()
            }
          } finally sock.close()
        } catch { case _: Throwable => /* server closing */ }
      }
    })
    t.setDaemon(true)
    t.start()
    try f(server.getLocalPort)
    finally { running = false; server.close() }
  }

  test("URL parsing follows the adapter's db-resolution order (path, defaultDatabase, authSource, admin)") {
    assert(new MongoWire("mongodb://h:1/shop").databaseName == "shop")
    assert(new MongoWire("mongodb://h:1/?defaultDatabase=atlasdb").databaseName == "atlasdb")
    assert(new MongoWire("mongodb://h:1/?authSource=authdb").databaseName == "authdb")
    assert(new MongoWire("mongodb://h:1").databaseName == "admin")
    // path wins over params; default port applies
    val full = new MongoWire("mongodb://h/shop?authSource=other")
    assert(full.databaseName == "shop" && full.port == 27017)
  }

  test("ping probes the connection; a dead endpoint reads false, never throws") {
    withStub { port =>
      assert(new MongoWire(s"mongodb://127.0.0.1:$port/shop").ping())
    }
    val dead = new ServerSocket(0); val deadPort = dead.getLocalPort; dead.close()
    assert(!new MongoWire(s"mongodb://127.0.0.1:$deadPort/shop").ping())
  }

  test("database/collection listing skips system dbs and empty dbs (adapter parity)") {
    withStub { port =>
      val c = new MongoWire(s"mongodb://127.0.0.1:$port/shop")
      assert(c.listDatabaseNames().contains("shop"))
      assert(c.listCollectionNames("shop").sorted == Seq("carts", "people"))
      val all = c.allDatabasesWithCollections()
      assert(all.keySet == Set("shop"), all) // local skipped, emptydb omitted, admin skipped
      assert(c.countDocuments("shop", "people") == 12L)
    }
  }

  test("wire-sourced registration infers the SAME schema and results as the fixture path") {
    withStub { port =>
      val c = new MongoWire(s"mongodb://127.0.0.1:$port/shop")
      val wireDf = MongoWire.register(spark, c, "shop", "people", sampleSize = 100)

      // fixture path: the SAME documents as JSON lines on disk
      val dir = java.nio.file.Files.createTempDirectory("graft_wire_fix")
      val lines = people.map(MongoWire.toJsonLine).mkString("\n")
      java.nio.file.Files.writeString(dir.resolve("people.json"), lines)
      val fixDf = DocSource.register(spark, dir.toString, "people_fixture")

      assert(wireDf.schema == fixDf.schema,
        s"wire=${wireDf.schema.treeString} fixture=${fixDf.schema.treeString}")
      // identical find() results through the SAME DocSource executor
      val spec = DocSource.FindSpec(
        filter = Seq(DocSource.Gte("age", 25)),
        projection = Seq("name", "age", "contact.city"),
        sort = Seq("age" -> false), limit = 5)
      val a = DocSource.find(wireDf, spec).collect().map(_.toString).toSeq
      val b = DocSource.find(fixDf, spec).collect().map(_.toString).toSeq
      assert(a == b, s"wire=$a fixture=$b")
      assert(a.nonEmpty)
    }
  }
}
