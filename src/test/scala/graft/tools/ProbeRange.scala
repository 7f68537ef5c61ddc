package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeRange {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    // real-data range join: lineitem quantities against price-band intervals
    val points = spark.table("lineitem").select(col("l_extendedprice").as("p"),
      col("l_orderkey"), col("l_linenumber"))
    import spark.implicits._
    val bands = Seq((1L, 900.0, 10000.0), (2L, 10000.0, 50000.0), (3L, 50000.0, 120000.0))
      .toDF("band_id", "lo", "hi")
    val t0 = System.nanoTime()
    val binned = graft.operators.RangeJoin.pointInInterval(points, bands, "p", "lo", "hi")
    val n1 = binned.count()
    val t1 = System.nanoTime()
    val naive = points.join(bands, col("p") >= col("lo") && col("p") <= col("hi")).count()
    val t2 = System.nanoTime()
    println(f"PROBE range => binned=$n1 naive=$naive equal=${n1 == naive} t_binned=${(t1-t0)/1e9}%.2f s t_naive=${(t2-t1)/1e9}%.2f s")
    val plan = binned.queryExecution.executedPlan.toString
    println("PROBE range_plan_nested_loop_in_main => " +
      plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin")))
    spark.stop()
  }
}
