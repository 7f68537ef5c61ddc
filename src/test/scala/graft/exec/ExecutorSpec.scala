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

  /** r15 ADVICE (high + medium), verified as the advisor ran it: the
    * try_reflect ALIAS walked the full default path because (a) the
    * parse-time name denylist didn't know it and (b) nothing ever set
    * spark.graft.readOnly, so the resolved-expression layer never
    * engaged. Both layers now fire on Executor.run itself. */
  test("try_reflect (and every reflection alias) is denied on the default runSql path") {
    Seq(
      "SELECT try_reflect('java.lang.System', 'getenv', 'PATH') AS v FROM nation LIMIT 1",
      "SELECT reflect('java.lang.System', 'getenv', 'PATH') AS v FROM nation LIMIT 1"
    ).foreach { sql =>
      val r = Executor.runSql(spark, sql, tables)
      assert(r.isLeft, s"must not execute: $sql")
      // and no result row ever carried an environment value
      assert(!r.exists(_.rows.exists(_.exists(v => v != null && v.toString.contains("/")))))
    }
  }

  test("guarded execution never mutates the session-global readOnly conf (race-free by design)") {
    // own the initial state (the shared session may carry another
    // suite's leftover value): the resolved-plan layer is applied
    // per-query inside run(), NOT by toggling the session conf — a
    // set/restore window would race with concurrent work on a shared
    // session (round-16 self-review)
    spark.conf.unset("spark.graft.readOnly")
    assert(Executor.runSql(spark, "SELECT n_name FROM nation LIMIT 3", tables).isRight)
    assert(spark.conf.get("spark.graft.readOnly", "unset") == "unset")
    // a caller-pinned value is untouched either way
    spark.conf.set("spark.graft.readOnly", "true")
    try {
      assert(Executor.runSql(spark, "SELECT n_name FROM nation LIMIT 3", tables).isRight)
      assert(spark.conf.get("spark.graft.readOnly") == "true")
    } finally spark.conf.unset("spark.graft.readOnly")
  }

  /** The resolved-plan layer must hold even when the parse-time NAME
    * denylist is bypassed entirely (the r15 hole class: an alias the
    * list didn't know). Simulate the bypass by handing Executor.run a
    * pre-"Validated" reflection query directly — the run-side scan of
    * the analyzed plan (all aliases resolve to CallMethodViaReflection)
    * must still refuse to execute it. */
  test("reflection survives a name-denylist bypass: Executor.run's resolved-plan layer refuses") {
    tables
    val smuggled = Validator.Validated(
      "SELECT try_reflect('java.lang.System', 'getenv', 'PATH') AS v FROM nation LIMIT 1",
      spark.sessionState.sqlParser.parsePlan("SELECT 1"), needsLimit = false)
    val r = Executor.run(spark, smuggled)
    assert(r.isLeft, "a smuggled reflection query must not execute")
    assert(!r.exists(_.rows.exists(_.exists(v => v != null && v.toString.contains("/")))))
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
