package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

object ProbeClusterPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("x_cluster_assign")(spark, "/root/testdata/sf0.001")
    df.queryExecution.explainString(FormattedMode).linesIterator
      .foreach(l => println("PROBE " + l))
    spark.stop()
  }
}
