package graft.api

import graft.SparkSpec

class ResponsesSpec extends SparkSpec {

  lazy val engine: Engine = Engine.forFixtures(spark, sfDir)

  test("success envelope is valid JSON with the reference field set") {
    val json = Responses.render(engine.run("SELECT c_name FROM customer ORDER BY c_custkey LIMIT 2"))
    // parse with Spark's JSON reader as an independent validity check
    import spark.implicits._
    val parsed = spark.read.json(Seq(json).toDS)
    val row = parsed.collect()(0)
    assert(row.getAs[Boolean]("ok"))
    assert(row.getAs[Long]("rowcount") == 2)
    assert(parsed.columns.toSet ==
      Set("ok", "sql", "columns", "rows", "rowcount", "explain", "explanation", "lineage"))
    // the provenance enrichment reaches the WIRE, not just QueryResult
    assert(json.contains(""""lineage": {"c_name": ["customer.c_name"]}"""), json)
  }

  test("failure envelope is the always-answer error shape") {
    val json = Responses.render(engine.run("DROP TABLE customer"))
    import spark.implicits._
    val row = spark.read.json(Seq(json).toDS).collect()(0)
    assert(!row.getAs[Boolean]("ok"))
    assert(row.getAs[String]("error") == "unsafe_sql")
    assert(row.getAs[Long]("rowcount") == 0)
  }

  test("control characters and quotes are escaped") {
    val qr = graft.core.QueryResult("SELECT '\"x\"\n'", Seq("c"), Seq(Seq("a\tb")), 1, "plan\n")
    val json = Responses.success(qr)
    import spark.implicits._
    assert(spark.read.json(Seq(json).toDS).collect()(0).getAs[Boolean]("ok"))
  }
}
