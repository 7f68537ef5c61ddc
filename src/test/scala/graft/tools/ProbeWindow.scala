package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeWindow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    def show(q: String): Unit = eng.ask(q) match {
      case Right(r) => println(s"PROBE [$q] => ${r.sql.take(110)} rows=${r.rowcount}")
      case Left(e) => println(s"PROBE [$q] => ERR ${e.kind}: ${e.message.take(80)}")
    }
    show("show customer rows along with the average acctbal per mktsegment")
    show("suppliers compared to the total acctbal by nationkey")
    show("along with the average") // degenerate: window phrasing, no table/column
    spark.stop()
  }
}
