package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev probe: dump formatted plans for queries under plan-pin work. */
object ProbePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    for (q <- args(0).split(",")) {
      val p = graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(FormattedMode)
      println(s"=====$q=====")
      println(p)
    }
    spark.stop()
  }
}
