package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-15 scout: Spark-4 recursive CTE support — does the syntax
  * parse, does the validator admit it, is runaway recursion bounded,
  * and can a recursive body smuggle a forbidden table? */
object ProbeRecursiveCte {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.001")
    val allowed = Set("customer", "nation")
    val cases = Seq(
      "rcte_series" -> ("WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 24) " +
        "SELECT s.n, CAST(COUNT(c.c_custkey) AS BIGINT) AS cnt " +
        "FROM seq s LEFT JOIN customer c ON c.c_nationkey = s.n GROUP BY s.n ORDER BY s.n"),
      "rcte_unbounded" -> ("WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r) " +
        "SELECT COUNT(*) AS c FROM r"),
      "rcte_forbidden" -> ("WITH RECURSIVE r(n) AS (SELECT s_suppkey FROM supplier UNION ALL SELECT n FROM r WHERE 1=0) " +
        "SELECT COUNT(*) AS c FROM r"))
    cases.foreach { case (name, sql) =>
      val v = graft.safety.Validator.validate(spark, sql, allowed)
      val verdict = v.fold(e => "DENY " + e.message.take(90), _ => "ALLOW")
      println(s"PROBE $name validate=$verdict")
      if (verdict == "ALLOW") {
        try {
          val t0 = System.nanoTime()
          val rows = spark.sql(sql).collect()
          println(s"PROBE $name EXECUTED rows=${rows.length} " +
            s"wall=${"%.1f".format((System.nanoTime() - t0) / 1e9)}s first=${rows.headOption}")
        } catch { case e: Throwable =>
          println(s"PROBE $name exec-fail ${e.getMessage.linesIterator.take(2).mkString(" ").take(220)}")
        }
      }
    }
    spark.stop()
  }
}
