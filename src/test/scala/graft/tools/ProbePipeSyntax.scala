package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: how Spark 4 parses SQL pipe syntax (`|>`) and what the
  * safety layers see — the round-15 adversarial-wave scout. */
object ProbePipeSyntax {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cases = Seq(
      "pipe_select" -> "FROM customer |> WHERE c_acctbal > 0 |> SELECT c_name, c_acctbal |> LIMIT 5",
      "pipe_agg" -> "FROM orders |> AGGREGATE COUNT(*) AS n GROUP BY o_orderstatus",
      "pipe_forbidden" -> "FROM secret_tbl |> SELECT *",
      "pipe_insert" -> "INSERT INTO t2 FROM customer |> SELECT c_name",
      "pipe_in_insert_dir" -> "INSERT OVERWRITE DIRECTORY '/tmp/x' FROM customer |> SELECT c_name",
      "table_pipe" -> "TABLE customer |> SELECT c_custkey",
      "pipe_setop" -> "FROM customer |> SELECT c_custkey |> UNION ALL (FROM supplier |> SELECT s_suppkey)",
      "pipe_exec_imm" -> "EXECUTE IMMEDIATE 'FROM customer |> SELECT c_name'")
    cases.foreach { case (name, sql) =>
      try {
        val p = spark.sessionState.sqlParser.parsePlan(sql)
        println(s"PROBE $name PARSED root=${p.getClass.getSimpleName}")
        println(("  " + p.toString.linesIterator.take(8).mkString(" | ")).take(400))
        val v = graft.safety.Validator.validate(spark, sql,
          Set("customer", "orders", "supplier"))
        println(s"PROBE $name validate=${v.fold(e => "DENY " + e.message.take(90), _ => "ALLOW")}")
      } catch {
        case e: Throwable =>
          println(s"PROBE $name PARSE-FAIL ${e.getMessage.linesIterator.take(2).mkString(" ").take(200)}")
      }
    }
    spark.stop()
  }
}
