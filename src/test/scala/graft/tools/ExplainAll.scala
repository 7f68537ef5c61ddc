package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for declared queries to check
  * pushdown/pruning/join strategy (the SURVEY scale mandate). */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("d03_filter_and", "d07_join_fk", "d08_join_chain", "d10_groupby_sum_avg", "d15_topn", "d18_in_subquery")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(3500))
    }
    spark.stop()
  }
}
