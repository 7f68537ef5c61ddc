package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeJson {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    println("JSONOUT " + graft.api.Responses.render(
      eng.run("SELECT c_name, c_acctbal FROM customer ORDER BY c_custkey LIMIT 2")).take(400))
    println("JSONERR " + graft.api.Responses.render(eng.run("DELETE FROM orders")))
    println("JSONTRICKY " + graft.api.Responses.success(graft.core.QueryResult(
      "SELECT '\"\n\t'", Seq("weird\"col"), Seq(Seq("line1\nline2", null, Double.NaN)), 1, "ex")))
    spark.stop()
  }
}
