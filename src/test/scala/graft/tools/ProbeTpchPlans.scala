package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev probe: dump formatted plans of the round-15 TPC-H rows. */
object ProbeTpchPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    Seq("d45_tpch_q4", "d46_tpch_q13", "d47_tpch_q16", "d48_tpch_q18", "d49_tpch_q21",
      "d50_tpch_q2", "d51_tpch_q11", "d52_tpch_q15", "d53_tpch_q17", "d54_tpch_q20", "d55_tpch_q22",
      "d56_tpch_q6", "d57_tpch_q7", "d58_tpch_q8", "d59_tpch_q9", "d60_tpch_q10",
      "d61_tpch_q12", "d62_tpch_q14", "d63_tpch_q19")
      .foreach { n =>
        val p = graft.SparkEntry.queries(n)(spark, dir)
          .queryExecution.explainString(FormattedMode)
        println(s"===== $n =====")
        println(p.linesIterator.takeWhile(!_.startsWith("(1) ")).mkString("\n"))
      }
    spark.stop()
  }
}
