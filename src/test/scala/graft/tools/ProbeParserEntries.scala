package graft.tools

import org.apache.spark.sql.SparkSession

/** Which parser entry points accept analysis-executing constructs
  * (EXECUTE IMMEDIATE / SQL scripting), and can they NEST inside a
  * larger statement so the top-level-node guard misses them? */
object ProbeParserEntries {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val p = spark.sessionState.sqlParser
    val stmts = Seq(
      "EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=13'",
      "BEGIN SET spark.sql.shuffle.partitions=13; END",
      "WITH d AS (EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=13') SELECT 1",
      "SELECT * FROM (EXECUTE IMMEDIATE 'SELECT 1')",
      "SELECT (EXECUTE IMMEDIATE 'SELECT 1') AS v",
      "BEGIN EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=13'; END",
      "BEGIN BEGIN SET spark.sql.shuffle.partitions=13; END; END",
      "SELECT 1 WHERE EXISTS (EXECUTE IMMEDIATE 'SELECT 1')")
    for (s <- stmts) {
      def attempt(label: String, f: => Any): Unit = {
        val r = try {
          val x = f
          s"OK ${x.getClass.getSimpleName}: " + x.toString.linesIterator.take(3).mkString(" | ").take(160)
        } catch { case e: Exception => "ERR " + e.getMessage.linesIterator.next().take(100) }
        println(s"PROBE [$label] ${s.take(70)} => $r")
      }
      attempt("parsePlan", p.parsePlan(s))
      attempt("parseQuery", p.parseQuery(s))
      attempt("parseExpression", p.parseExpression(s"EXISTS ($s)"))
    }
    spark.stop()
  }
}
