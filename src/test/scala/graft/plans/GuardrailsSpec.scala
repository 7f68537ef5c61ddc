package graft.plans

import graft.SparkSpec

class GuardrailsSpec extends SparkSpec {

  private def withReadOnly[A](f: => A): A = {
    spark.conf.set("spark.graft.readOnly", "true")
    try f finally spark.conf.set("spark.graft.readOnly", "false")
  }

  test("read-only session rejects commands at analysis time") {
    withReadOnly {
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE guardrail_t (x INT) USING parquet")
      }
      assert(e.getMessage.contains("read-only"), e.getMessage)
      intercept[Exception] { spark.sql("DROP TABLE IF EXISTS guardrail_t") }
    }
  }

  test("read-only session rejects INSERT OVERWRITE DIRECTORY (not a Command node)") {
    graft.sources.Sources.register(spark, sfDir)
    withReadOnly {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE DIRECTORY '/tmp/guardrail_exfil' USING parquet SELECT * FROM nation")
      }
      assert(e.getMessage.contains("read-only"), e.getMessage)
    }
  }

  test("read-only session rejects DDL smuggled through EXECUTE IMMEDIATE") {
    withReadOnly {
      val e = intercept[Exception] {
        spark.sql("EXECUTE IMMEDIATE 'CREATE TABLE guardrail_ei (x INT) USING parquet'")
      }
      // the payload re-enters analysis, where the guard sees the Command
      assert(e.getMessage.contains("read-only"), e.getMessage)
    }
  }

  test("read-only session rejects pipe-syntax writes and answers pipe reads (round-15 wave)") {
    graft.sources.Sources.register(spark, sfDir)
    withReadOnly {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE DIRECTORY '/tmp/guardrail_pipe' USING parquet FROM nation |> SELECT n_name")
      }
      assert(e.getMessage.contains("read-only"), e.getMessage)
      // the pipe READ is an ordinary plan and still answers
      assert(spark.sql("FROM nation |> AGGREGATE COUNT(*) AS n").collect()(0).getLong(0) == 25L)
    }
  }

  test("read-only session rejects JVM reflection expressions (round-15 hole, second layer)") {
    graft.sources.Sources.register(spark, sfDir)
    withReadOnly {
      Seq(
        "SELECT reflect('java.lang.System', 'getenv', 'HOME') FROM nation LIMIT 1",
        "SELECT java_method('java.lang.System', 'getProperty', 'user.dir') FROM nation LIMIT 1",
        // the r16 alias hole: try_reflect resolves to TryEval over the
        // same CallMethodViaReflection — caught by the resolved-
        // expression match, which recurses through children
        "SELECT try_reflect('java.lang.System', 'getenv', 'PATH') FROM nation LIMIT 1",
        // reflection hiding inside a SCALAR SUBQUERY expression: a
        // children-only plan walk never enters the subquery's plan —
        // the guard must use the subquery-expanding deep scan
        // (round-16 self-review)
        "SELECT (SELECT reflect('java.lang.System', 'getenv', 'PATH') FROM range(1)) AS v FROM nation LIMIT 1"
      ).foreach { sql =>
        val e = intercept[Exception] { spark.sql(sql).collect() }
        assert(e.getMessage.contains("read-only"), s"$sql => ${e.getMessage}")
      }
    }
  }

  test("read-only session still answers SELECTs") {
    graft.sources.Sources.register(spark, sfDir)
    withReadOnly {
      assert(spark.sql("SELECT COUNT(*) FROM nation").collect()(0).getLong(0) == 25L)
    }
  }

  test("guard is inert by default (views and DDL work)") {
    spark.sql("CREATE TABLE IF NOT EXISTS guardrail_ok (x INT) USING parquet")
    spark.sql("DROP TABLE IF EXISTS guardrail_ok")
  }
}
