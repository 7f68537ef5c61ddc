package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: what do EXECUTE IMMEDIATE / BEGIN…END parse and
  * analyze to in Spark 4, and does ANALYSIS alone execute the payload? */
object ProbeExecImm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def probe(sql: String): Unit = {
      println(s"=== $sql")
      try {
        val parsed = spark.sessionState.sqlParser.parsePlan(sql)
        println(s"  parsed:   ${parsed.getClass.getSimpleName} :: ${parsed.nodeName}")
        val analyzed = spark.sessionState.executePlan(parsed).analyzed
        println(s"  analyzed: ${analyzed.getClass.getSimpleName} :: ${analyzed.nodeName}")
        println(s"  offense:  ${graft.plans.ReadOnlyGuard.firstOffenseDeep(analyzed)}")
      } catch { case e: Throwable => println(s"  threw: ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }
    }
    probe("SET spark.sql.shuffle.partitions=9")
    println("conf after SET analyze-only: " + spark.conf.get("spark.sql.shuffle.partitions"))
    probe("EXECUTE IMMEDIATE 'SET spark.sql.shuffle.partitions=7'")
    println("conf after EXEC IMM SET analyze-only: " + spark.conf.get("spark.sql.shuffle.partitions"))
    probe("EXECUTE IMMEDIATE 'ADD JAR \\'/tmp/nonexistent_evil.jar\\''")
    probe("BEGIN DROP TABLE customer; END")
    probe("BEGIN SELECT reflect('java.lang.System', 'getenv', 'X'); END")
    probe("EXECUTE IMMEDIATE 'SELECT reflect(''java.lang.System'', ''getenv'', ''X'')'")
    spark.stop()
  }
}
