package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/**
 * Force probe for the TWS sessionizer's degenerate hot key (round-14
 * verdict #2): ONE key receiving millions of events in a SINGLE
 * micro-batch. `handleInputRows` must sort the burst before the gap
 * walk, so the whole burst buffers in executor memory — since round 15
 * as (epoch-ms, value) primitive pairs (~32 B/event with array
 * overhead), not full rows. The probe measures the wall cost of the
 * buffered sort-walk and pins correctness: sessions out of the
 * one-batch replay must equal the batch gaps-and-islands answer.
 *
 * Numbers recorded in COVERAGE.md next to the documented bound
 * (Streams.scala scaladoc).
 */
object ProbeTwsHotKey {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // one key; a 31-minute gap every 100k events splits sessions so the
    // walk does real work (gap = 30 min); values are the event index
    val gapEvery = 100000
    val base = 1700000000000L
    def tsOf(i: Int): Long = base + i.toLong * 1000L + (i / gapEvery).toLong * 1860000L
    val events = (0 until n).map { i =>
      graft.streaming.Streams.Event(i.toLong, new Timestamp(tsOf(i)), 1L, "e", (i % 1000).toDouble)
    }
    val sentinel = graft.streaming.Streams.Event(
      -1L, new Timestamp(base + 10L * 365 * 86400 * 1000L), -1L, "sentinel", 0.0)

    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streams.Event]
    in.addData(events :+ sentinel: _*)
    val t0 = System.nanoTime()
    val q = graft.streaming.Streams.sessionizeTws(in.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("probe_hotkey_sink")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val done = q.awaitTermination(600000); q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val got = spark.table("probe_hotkey_sink")
      .where($"user_id" === 1L)
      .select("n_events", "session_value", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)

    // batch gaps-and-islands oracle over the same burst
    val batch = events.toDF()
      .selectExpr("user_id", "unix_millis(ts) AS tms", "value")
      .selectExpr("*",
        "CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) > 1800000 THEN 1 ELSE 0 END AS brk")
      .selectExpr("*",
        "SUM(brk) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid")
      .groupBy("user_id", "sid")
      .agg(org.apache.spark.sql.functions.count("*").as("n_events"),
        org.apache.spark.sql.functions.sum("value").as("session_value"),
        org.apache.spark.sql.functions.min("tms").as("start_ms"),
        org.apache.spark.sql.functions.max("tms").as("end_ms"))
      .select("n_events", "session_value", "start_ms", "end_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._3)

    println(s"PROBE hotkey n=$n terminated=$done wall=${"%.1f".format(wall)}s " +
      s"sessions=${got.length} batchSessions=${batch.length} " +
      s"equal=${got.toSeq == batch.toSeq} " +
      s"bufferBound=${"%.0f".format(n * 32.0 / 1048576)}MB(32B/event)")
    spark.stop()
  }
}
