package graft.safety

import graft.SparkSpec
import graft.core.{ParseError, SqlSafetyError}

class ValidatorSpec extends SparkSpec {

  val allowed = Set("customer", "orders", "lineitem", "part", "supplier", "nation", "region")

  /** Adversarial corpus mirroring the reference's safety probes
    * (Report 2 §8: 10/10 DDL/write prompts blocked). */
  val writeStatements = Seq(
    "DROP TABLE customer",
    "DELETE FROM orders",
    "DELETE FROM orders WHERE o_orderkey = 1",
    "UPDATE customer SET c_acctbal = 0",
    "INSERT INTO orders VALUES (1)",
    "CREATE TABLE evil (x INT)",
    "ALTER TABLE customer ADD COLUMN hacked INT",
    "TRUNCATE TABLE lineitem",
    "MERGE INTO customer USING orders ON c_custkey = o_custkey WHEN MATCHED THEN DELETE",
    "CREATE OR REPLACE VIEW v AS SELECT * FROM customer")

  test("all write/DDL statements are rejected (10/10)") {
    writeStatements.foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
      assert(r.swap.exists(e => e.isInstanceOf[SqlSafetyError] || e.isInstanceOf[ParseError]))
    }
  }

  /** Second adversarial wave (round 14): obfuscated and INDIRECT
    * mutations — comment cloaking, case mangling, trailing-statement
    * smuggling, write-shaped "selects" (INSERT OVERWRITE DIRECTORY),
    * and session/metadata commands that are not writes but are not
    * SELECTs either (SET, CACHE, ADD JAR, REFRESH, ANALYZE: each can
    * change engine behavior or leak state across tenants). */
  val obfuscatedStatements = Seq(
    "/* harmless cleanup */ DROP TABLE customer -- routine",
    "dRoP tAbLe customer",
    "SELECT 1; DROP TABLE customer",
    "WITH d AS (DELETE FROM orders) SELECT 1",
    "INSERT OVERWRITE DIRECTORY '/tmp/exfil' SELECT * FROM customer",
    "CREATE TEMPORARY VIEW v AS SELECT * FROM customer",
    "CACHE TABLE t AS SELECT * FROM customer",
    "SET spark.sql.shuffle.partitions=1",
    "ADD JAR 'file:///tmp/evil.jar'",
    "REFRESH TABLE customer",
    "ANALYZE TABLE customer COMPUTE STATISTICS",
    "EXPLAIN DROP TABLE customer")

  test("obfuscated and indirect mutations are rejected (round-14 wave)") {
    obfuscatedStatements.foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
      assert(r.swap.exists(e => e.isInstanceOf[SqlSafetyError] || e.isInstanceOf[ParseError]))
    }
  }

  /** Third adversarial wave (round 15): Spark-4 SQL pipe syntax
    * (`FROM t |> op |> op`). Pipe queries parse to ORDINARY logical
    * plans (PipeOperator wrappers around Project/Filter/Aggregate), so
    * both safety layers see through them — but the round-14 holes were
    * both "new parse shape the denylist didn't know", so the wave pins
    * it: pipe-written reads validate, pipe-smuggled writes deny, the
    * allow-list and LIMIT detection work through pipes. */
  test("pipe syntax: reads validate, writes and bypasses deny (round-15 wave)") {
    // legitimate pipe reads pass the whole chain
    Seq(
      "FROM customer |> WHERE c_acctbal > 0 |> SELECT c_name, c_acctbal |> LIMIT 5",
      "TABLE customer |> SELECT c_custkey",
      "FROM orders |> AGGREGATE COUNT(*) AS n GROUP BY o_orderstatus",
      "FROM customer |> SELECT c_custkey |> UNION ALL (FROM supplier |> SELECT s_suppkey)"
    ).foreach { sql =>
      assert(Validator.validate(spark, sql, allowed).isRight, s"should allow: $sql")
    }
    // pipe-smuggled writes, exfiltration, dynamic SQL, and allow-list
    // violations all deny
    Seq(
      "INSERT INTO t2 FROM customer |> SELECT c_name",
      "INSERT OVERWRITE DIRECTORY '/tmp/exfil' FROM customer |> SELECT c_name",
      "EXECUTE IMMEDIATE 'FROM customer |> SELECT c_name'",
      "FROM secret_tbl |> SELECT *",
      "WITH g AS (FROM secret_tbl |> SELECT *) SELECT * FROM g"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
      assert(r.swap.exists(e => e.isInstanceOf[SqlSafetyError] || e.isInstanceOf[ParseError]))
    }
    // LIMIT detection sees the pipe-built GlobalLimit (no double cap)
    val limited = Validator.validate(spark,
      "FROM customer |> SELECT c_custkey |> LIMIT 7", allowed)
    assert(limited.exists(!_.needsLimit))
    val unlimited = Validator.validate(spark,
      "FROM customer |> SELECT c_custkey", allowed)
    assert(unlimited.exists(_.needsLimit))
  }

  /** Fourth adversarial wave (round 15): two REAL holes found by the
    * scout probe and closed. IDENTIFIER('sup' || 'plier') read a
    * forbidden table straight through the allow-list (the deferred
    * name is invisible to referencedTables); reflect()/java_method()
    * exfiltrated System.getenv through the whole chain. Both are
    * statically un-vettable constructs — denied outright at parse
    * time, with the guard layer carrying the resolved-reflection case. */
  test("IDENTIFIER() dynamic names and JVM reflection are rejected (round-15 holes)") {
    Seq(
      // the actual bypass the probe executed: forbidden table via concat
      "SELECT * FROM IDENTIFIER('sup' || 'plier') LIMIT 5",
      // even a literal, allow-listed name: dynamic-name machinery is
      // denied as a class, not by what it happens to resolve to today
      "SELECT * FROM IDENTIFIER('nation') LIMIT 5",
      // expression-level deferred names (column/function positions)
      "SELECT IDENTIFIER('c_name') FROM customer LIMIT 5",
      // the exfiltration pair, plain and nested
      "SELECT reflect('java.lang.System', 'getenv', 'HOME') AS v FROM nation LIMIT 1",
      "SELECT java_method('java.lang.System', 'getProperty', 'user.dir') AS v FROM nation LIMIT 1",
      "SELECT c_name FROM customer WHERE c_name = (SELECT reflect('java.lang.System', 'getenv', 'X') FROM nation LIMIT 1)",
      "WITH g AS (SELECT reflect('java.lang.System', 'getenv', 'X') AS v FROM nation) SELECT * FROM g",
      // r15 ADVICE (high): try_reflect is a registry ALIAS resolving to
      // the same CallMethodViaReflection — it walked the whole chain
      // while reflect was blocked. Name-denied here; the resolved-
      // expression layer (ReadOnlyGuard) catches any future alias.
      "SELECT try_reflect('java.lang.System', 'getenv', 'PATH') AS v FROM nation LIMIT 1"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
      assert(r.swap.exists(e => e.isInstanceOf[SqlSafetyError] || e.isInstanceOf[ParseError]))
    }
    // benign reflection-free functions still pass (no overreach)
    assert(Validator.validate(spark,
      "SELECT upper(c_name) AS u FROM customer LIMIT 5", allowed).isRight)
  }

  /** Fifth adversarial wave (round 16, r15 verdict #7): sweep the
    * remaining Spark-4 parse surfaces. DECLARE / SET VAR / SET parse to
    * Commands (already denied); file-path relations
    * (parquet.`/path`) carry their full dotted name into the
    * allow-list (already denied, incl. via LATERAL and CTE bodies).
    * Two soft spots hardened here: parameter markers validated and then
    * died at bind time (now denied statically — a marker is a
    * substitution hole), and FROM-position TVFs sat entirely outside
    * the table allow-list (now vetted against an allow-list of known
    * pure generators, deny-by-default for anything new). */
  test("parameter markers and unknown TVFs are rejected; generator TVFs still pass (round-16 wave)") {
    Seq(
      "SELECT :p AS v FROM nation LIMIT 1",
      "SELECT ? AS v FROM nation LIMIT 1",
      "SELECT c_name FROM customer WHERE c_acctbal > :bal LIMIT 5",
      // markers inside subqueries/CTEs are the same hole
      "WITH g AS (SELECT :p AS v FROM nation) SELECT * FROM g LIMIT 1",
      // unknown / qualified TVFs deny by default (allow-list, not denylist)
      "SELECT * FROM sql_keywords() LIMIT 5",
      "SELECT * FROM builtin.range(5)"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
      assert(r.swap.exists(e => e.isInstanceOf[SqlSafetyError] || e.isInstanceOf[ParseError]))
    }
    // the known pure generators still pass (no overreach)
    Seq(
      "SELECT * FROM range(5)",
      "SELECT * FROM explode(array(1, 2, 3)) LIMIT 5",
      "SELECT * FROM inline(array(struct(1, 'a'))) LIMIT 5"
    ).foreach { sql =>
      assert(Validator.validate(spark, sql, allowed).isRight, s"should allow: $sql")
    }
    // the statement-level surfaces stay dead (Commands)
    Seq(
      "DECLARE VARIABLE gv STRING DEFAULT 'supplier'",
      "SET VAR gv = 'supplier'",
      "SET spark.sql.ansi.enabled=false"
    ).foreach { sql =>
      assert(Validator.validate(spark, sql, allowed).isLeft, s"should reject: $sql")
    }
    // file-path relations: full dotted name hits the allow-list, on the
    // plain, LATERAL, and CTE paths
    Seq(
      "SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet` LIMIT 3",
      "SELECT * FROM text.`/etc/passwd` LIMIT 3",
      "SELECT n_name FROM nation, LATERAL (SELECT * FROM text.`/etc/passwd` LIMIT 1)",
      "WITH g AS (SELECT * FROM text.`/etc/passwd`) SELECT * FROM g LIMIT 3"
    ).foreach { sql =>
      assert(Validator.validate(spark, sql, allowed).isLeft, s"should reject: $sql")
    }
  }

  test("recursive CTEs: allow-list sees the recursive body; runaway recursion is engine-bounded") {
    // the recursive surface is admitted (it is a read), and a
    // forbidden table inside the recursive body is still caught
    assert(Validator.validate(spark,
      "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM s WHERE n < 5) SELECT * FROM s",
      allowed).isRight)
    val r = Validator.validate(spark,
      "WITH RECURSIVE r(n) AS (SELECT o_orderkey FROM forbidden_tbl UNION ALL SELECT n FROM r WHERE 1=0) SELECT COUNT(*) FROM r",
      allowed)
    assert(r.isLeft && r.swap.exists(_.message.contains("forbidden_tbl")))
    // unbounded recursion passes static validation (nothing static
    // distinguishes it) but the ENGINE bounds it: level limit 100,
    // loud failure — a recursion DoS cannot run away
    val e = intercept[Exception] {
      spark.sql("WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r) SELECT COUNT(*) FROM r").collect()
    }
    assert(e.getMessage.contains("RECURSION_LEVEL_LIMIT_EXCEEDED"), e.getMessage.take(200))
  }

  test("dynamic-SQL smuggling is rejected: EXECUTE IMMEDIATE and SQL scripting") {
    Seq(
      "EXECUTE IMMEDIATE 'DROP TABLE customer'",
      "EXECUTE IMMEDIATE 'SELECT * FROM secrets'",
      "BEGIN DROP TABLE customer; END",
      "BEGIN SELECT * FROM customer; END"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft, s"should reject: $sql")
    }
  }

  test("qualified references cannot impersonate allow-listed names") {
    // matching on the terminal name part let these pass as "customer"
    // while resolving to a DIFFERENT relation than the vetted view
    Seq(
      "SELECT * FROM spark_catalog.default.customer",
      "SELECT * FROM global_temp.customer",
      "SELECT * FROM other.customer"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft && r.swap.toOption.get.message.contains("customer"), sql)
    }
  }

  test("select statements with subqueries/CTEs/unions are admitted") {
    Seq(
      "SELECT * FROM customer LIMIT 5",
      "WITH x AS (SELECT c_custkey FROM customer) SELECT * FROM x LIMIT 5",
      "SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders",
      "SELECT * FROM (SELECT c_name FROM customer) t LIMIT 5"
    ).foreach(sql => assert(Validator.validate(spark, sql, allowed).isRight, sql))
  }

  test("unknown tables are rejected; CTE names are not treated as tables") {
    assert(Validator.validate(spark, "SELECT * FROM secrets", allowed).isLeft)
    val cte = "WITH tmp AS (SELECT c_custkey FROM customer) SELECT * FROM tmp"
    assert(Validator.validate(spark, cte, allowed).isRight)
  }

  test("allow-list sees through subquery expressions — no bypass via IN/EXISTS/scalar") {
    Seq(
      "SELECT * FROM customer WHERE c_custkey IN (SELECT k FROM secrets)",
      "SELECT * FROM customer WHERE EXISTS (SELECT 1 FROM secrets)",
      "SELECT * FROM customer WHERE c_acctbal > (SELECT MAX(v) FROM secrets)",
      // nested one level deeper
      "SELECT * FROM customer WHERE c_custkey IN " +
        "(SELECT o_custkey FROM orders WHERE o_orderkey IN (SELECT k FROM secrets))"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft && r.swap.toOption.get.message.contains("secrets"), sql)
    }
  }

  test("aggregation requirement satisfied by an aggregate inside a scalar subquery") {
    val p = Validator.parse(spark,
      "SELECT * FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)").toOption.get
    assert(Validator.validateAggregationRequirement(p, needsAggregation = true).isRight)
  }

  test("allow-list sees through CTE definition bodies — no bypass via WITH") {
    // UnresolvedWith keeps its cteRelations OUTSIDE children, so plain
    // collect never enters a WITH body; before round 9 every one of
    // these walked straight through the allow-list
    Seq(
      "WITH g AS (SELECT * FROM secrets) SELECT * FROM g",
      "WITH g AS (SELECT * FROM customer WHERE c_custkey IN (SELECT k FROM secrets)) SELECT * FROM g",
      // nested WITH inside a CTE body
      "WITH g AS (WITH h AS (SELECT * FROM secrets) SELECT * FROM h) SELECT * FROM g"
    ).foreach { sql =>
      val r = Validator.validate(spark, sql, allowed)
      assert(r.isLeft && r.swap.toOption.get.message.contains("secrets"), sql)
    }
    // and legitimate CTE names still do not read as table references
    val ok = Validator.validate(spark,
      "WITH g AS (SELECT c_custkey FROM customer) SELECT * FROM g", allowed)
    assert(ok.isRight, ok)
  }

  test("aggregation requirement satisfied by an aggregate inside a CTE body") {
    val p = Validator.parse(spark,
      "WITH g AS (SELECT c_mktsegment, AVG(c_acctbal) AS a FROM customer GROUP BY c_mktsegment) " +
        "SELECT * FROM g a JOIN g b ON a.c_mktsegment < b.c_mktsegment").toOption.get
    assert(Validator.validateAggregationRequirement(p, needsAggregation = true).isRight)
  }

  test("structure check: subquery predicates count as the multi-table linkage") {
    val exists = Validator.parse(spark,
      "SELECT COUNT(*) FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)").toOption.get
    assert(Validator.validateStructure(exists, wantsDistinct = false).isRight)
  }

  test("limit detection: needsLimit false iff top-level LIMIT present") {
    assert(Validator.validate(spark, "SELECT * FROM customer", allowed).toOption.get.needsLimit)
    assert(!Validator.validate(spark, "SELECT * FROM customer LIMIT 10", allowed).toOption.get.needsLimit)
    assert(!Validator.validate(spark,
      "WITH x AS (SELECT 1 AS a) SELECT * FROM x LIMIT 3", allowed).toOption.get.needsLimit)
  }

  test("aggregation requirement check") {
    val plan = Validator.parse(spark, "SELECT c_mktsegment, COUNT(*) FROM customer GROUP BY c_mktsegment").toOption.get
    assert(Validator.validateAggregationRequirement(plan, needsAggregation = true).isRight)
    val noAgg = Validator.parse(spark, "SELECT c_name FROM customer").toOption.get
    assert(Validator.validateAggregationRequirement(noAgg, needsAggregation = true).isLeft)
  }

  test("structure check: multi-table without join rejected, with join ok") {
    val bad = Validator.parse(spark, "SELECT * FROM customer, orders").toOption.get
    // comma join parses to a Join node in Spark; cross reference via scalar subquery does not
    val scalarOk = Validator.parse(spark,
      "SELECT c_custkey FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)").toOption.get
    assert(Validator.validateStructure(scalarOk, wantsDistinct = false).isRight)
    val joined = Validator.parse(spark,
      "SELECT * FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey").toOption.get
    assert(Validator.validateStructure(joined, wantsDistinct = false).isRight)
    assert(Validator.validateStructure(bad, wantsDistinct = false).isRight) // comma join = Join node
  }

  test("distinct requirement") {
    val d = Validator.parse(spark, "SELECT DISTINCT c_mktsegment FROM customer").toOption.get
    assert(Validator.validateStructure(d, wantsDistinct = true).isRight)
    val nod = Validator.parse(spark, "SELECT c_mktsegment FROM customer").toOption.get
    assert(Validator.validateStructure(nod, wantsDistinct = true).isLeft)
  }

  test("SQL extraction strips fences and prose") {
    val raw =
      """Here is the query you asked for:
        |```sql
        |SELECT c_name
        |FROM customer
        |WHERE c_acctbal > 0
        |```
        |This selects the customers.""".stripMargin
    val sql = Validator.extractSql(raw)
    assert(sql.contains("SELECT c_name FROM customer WHERE c_acctbal > 0"))
  }

  test("SQL extraction stops at semicolon") {
    val sql = Validator.extractSql("SELECT 1; DROP TABLE x")
    assert(sql.contains("SELECT 1"))
  }

  test("no SELECT found yields None") {
    assert(Validator.extractSql("I cannot answer that question").isEmpty)
  }
}
