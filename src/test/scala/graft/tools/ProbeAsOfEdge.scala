package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession

object ProbeAsOfEdge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val trades = Seq((1L, "A", Timestamp.valueOf("2024-01-01 10:01:00"), 100.0))
      .toDF("trade_id", "sym", "t_ts", "t_price")
    val emptyQuotes = Seq.empty[(String, Timestamp, Double)].toDF("sym", "q_ts", "q_price")
    val out = graft.operators.AsOfJoin.asOf(trades, emptyQuotes, Seq("sym"), "t_ts", "q_ts")
    println("PROBE asof_empty_right => rows=" + out.count() + " q_price_null=" + out.collect()(0).isNullAt(4))
    try {
      graft.operators.AsOfJoin.asOf(trades, emptyQuotes.select("sym", "q_ts"), Seq("sym"), "t_ts", "q_ts")
      println("PROBE asof_no_attach => NO ERROR (unexpected)")
    } catch {
      case e: IllegalArgumentException => println("PROBE asof_no_attach => clean error: " + e.getMessage)
    }
    spark.stop()
  }
}
