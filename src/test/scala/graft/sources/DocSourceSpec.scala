package graft.sources

import graft.SparkSpec
import graft.sources.DocSource._

class DocSourceSpec extends SparkSpec {

  /** Nested JSON docs exercising the sample-inference + nested-sink path
    * (FIXTURES.md §A5: "a view with nested struct/array columns"). */
  lazy val docsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs")
    val lines = Seq(
      """{"_id": "a1", "user": {"name": "ana", "age": 31}, "tags": ["x", "y"], "score": 10.5, "city": "lima"}""",
      """{"_id": "a2", "user": {"name": "bob", "age": 25}, "tags": ["y"], "score": 7.0, "city": "quito"}""",
      """{"_id": "a3", "user": {"name": "cho", "age": 41}, "tags": [], "score": 12.25, "city": "lima"}""",
      """{"_id": "a4", "user": {"name": "dee"}, "score": 3.0, "city": "lima"}""")
    java.nio.file.Files.write(dir.resolve("docs.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  lazy val docs = register(spark, docsPath, "people")

  test("schema inference unions field types and keeps nesting") {
    val f = docs.schema("user").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(f.fieldNames.contains("name") && f.fieldNames.contains("age"))
    assert(docs.schema("tags").dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    assert(spark.table("people").count() == 4) // registered as view
  }

  test("find: filter + projection + sort + limit, _id forced first") {
    val out = find(docs, FindSpec(
      filter = Seq(Eq("city", "lima"), Gt("score", 5.0)),
      projection = Seq("score", "city"),
      sort = Seq(("score", false)),
      limit = 10))
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("_id", "score", "city"))
    assert(rows.map(_.getString(0)).toSeq == Seq("a3", "a1")) // sorted desc by score
  }

  test("find supports dotted paths into nested structs") {
    val out = find(docs, FindSpec(filter = Seq(Gte("user.age", 30)),
      projection = Seq("user.name"), sort = Seq(("user.name", true))))
    assert(out.collect().map(_.getString(1)).toSeq == Seq("ana", "cho"))
  }

  test("aggregate pipeline: $match -> $group -> $sort with auto-$limit") {
    val out = aggregate(docs, Seq(
      MatchStage(Seq(ExistsP("score"))),
      GroupStage(Some("city"), Seq(("n", "count", "*"), ("avg_score", "avg", "score"))),
      SortStage(Seq(("_id", true)))))
    val rows = out.collect()
    assert(out.columns.toSeq == Seq("_id", "n", "avg_score"))
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("lima", 3L), ("quito", 1L)))
    // auto-limit present in the plan
    assert(out.queryExecution.analyzed.toString.contains("GlobalLimit"))
  }

  test("whole-collection group (_id null)") {
    val out = aggregate(docs, Seq(GroupStage(None, Seq(("total", "sum", "score")))))
    val r = out.collect()(0)
    assert(r.isNullAt(0) && math.abs(r.getDouble(1) - 32.75) < 1e-9)
  }

  test("json envelope: _id first, nested values as JSON strings") {
    val (cols, rows) = jsonEnvelope(docs.orderBy("_id"))
    assert(cols.head == "_id")
    val tagIdx = cols.indexOf("tags")
    val userIdx = cols.indexOf("user")
    assert(rows.head(tagIdx) == """["x","y"]""")
    assert(rows.head(userIdx).toString.contains("\"name\":\"ana\""))
  }

  test("explain capture returns a physical plan") {
    assert(DocSource.explain(find(docs, FindSpec())).contains("== Physical Plan =="))
  }

  test("$unwind: one row per array element, empty/missing arrays dropped, group over elements") {
    // tag frequency across docs — the canonical $unwind → $group pipeline
    val out = aggregate(docs, Seq(
      UnwindStage("tags"),
      GroupStage(Some("tags"), Seq(("agg_value", "count", "*"))),
      SortStage(Seq(("_id", true)))))
    val rows = out.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // a1 has [x, y], a2 has [y]; a3's empty array and a4's missing field
    // contribute nothing (Mongo's default $unwind)
    assert(rows == Seq("x" -> 1L, "y" -> 2L), rows.toSeq)
    // a $match between unwind and group filters elements, not documents
    val filtered = aggregate(docs, Seq(
      UnwindStage("tags"),
      MatchStage(Seq(Eq("tags", "y"))),
      GroupStage(None, Seq(("agg_value", "count", "*")))))
    assert(filtered.collect()(0).getLong(1) == 2L)
    // dotted unwind paths are rejected loudly, not silently mis-executed
    intercept[IllegalArgumentException] {
      aggregate(docs, Seq(UnwindStage("user.name"))).collect()
    }
    // render echoes the Mongo stage shape
    val q = graft.gen.Nl2Doc.DocQuery("people", Right(Seq(UnwindStage("tags"))))
    assert(q.render.contains("""{"$unwind": "$tags"}"""), q.render)
  }
}
