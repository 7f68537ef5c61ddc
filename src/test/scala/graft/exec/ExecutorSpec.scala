package graft.exec

import graft.SparkSpec
import graft.core.PlanTooLargeError
import graft.safety.Validator
import graft.sources.Sources

class ExecutorSpec extends SparkSpec {

  lazy val tables: Set[String] = Sources.register(spark, sfDir).toSet

  test("unbounded select gets LIMIT injected (cap 100)") {
    val r = Executor.runSql(spark, "SELECT l_orderkey FROM lineitem", tables)
    assert(r.exists(_.rowcount == 100))
  }

  test("explicit limit is preserved, not overridden") {
    val r = Executor.runSql(spark, "SELECT l_orderkey FROM lineitem LIMIT 7", tables)
    assert(r.exists(_.rowcount == 7))
  }

  test("requested limit above MaxRows is clamped") {
    val r = Executor.runSql(spark, "SELECT l_orderkey FROM lineitem", tables, limit = 10000)
    assert(r.exists(_.rowcount == Executor.MaxRows))
  }

  test("cost gate rejects an unbounded cartesian explosion") {
    tables // force registration
    val df = spark.sql(
      "SELECT * FROM lineitem a CROSS JOIN lineitem b CROSS JOIN lineitem c")
    assert(Executor.costGate(df, maxEstimatedRows = 100000) ==
      Left(PlanTooLargeError(Executor.costGate(df, 100000).swap.toOption.get.message)))
  }

  test("cost gate admits a limited query") {
    tables
    val v = Validator.validate(spark, "SELECT * FROM lineitem LIMIT 10", tables).toOption.get
    val df = Executor.frame(spark, v)
    assert(Executor.costGate(df).isRight)
  }

  test("result shape matches the reference envelope") {
    val r = Executor.runSql(spark,
      "SELECT c_name, c_acctbal FROM customer ORDER BY c_custkey LIMIT 3", tables)
    val qr = r.toOption.get
    assert(qr.columns == Seq("c_name", "c_acctbal"))
    assert(qr.rowcount == 3 && qr.rows.size == 3)
    assert(qr.explain.nonEmpty)
  }

  test("jsonSafe coerces decimals, dates and timestamps") {
    assert(Executor.jsonSafe(new java.math.BigDecimal("1.5")) == 1.5)
    assert(Executor.jsonSafe(java.sql.Date.valueOf("2024-01-02")) == "2024-01-02")
    assert(Executor.jsonSafe(java.sql.Timestamp.valueOf("2024-01-02 03:04:05"))
      .toString.startsWith("2024-01-02T03:04:05"))
  }

  test("jsonSafe renders nested values as valid JSON (json.dumps shape)") {
    // A text value containing `", ]"` must not corrupt the envelope.
    val v = Executor.jsonSafe(Seq("a\"b", ", ]", "c"))
    assert(v == """["a\"b", ", ]", "c"]""")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readTree(v.asInstanceOf[String])
    assert(parsed.isArray && parsed.size == 3 && parsed.get(1).asText == ", ]")
    // maps and rows nest recursively; scalar coercion still applies inside
    val m = Executor.jsonSafe(Map("k\"1" -> Seq(1, 2), "d" -> java.sql.Date.valueOf("2024-01-02")))
    val pm = mapper.readTree(m.asInstanceOf[String])
    assert(pm.get("k\"1").get(1).asInt == 2 && pm.get("d").asText == "2024-01-02")
  }

  test("timeout cancels a long-running query") {
    tables
    val v = Validator.validate(spark,
      "SELECT COUNT(*) AS c FROM (SELECT a.l_orderkey FROM lineitem a CROSS JOIN lineitem b CROSS JOIN lineitem c) t",
      tables).toOption.get
    val df = spark.sql(v.sql)
    val r = Executor.collectWithTimeout(spark, df, timeoutMs = 900)
    assert(r.isLeft)
  }
}
