package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Feasibility probe for an oracled timer-sessionizer row: replay the
 * real events fixture through `Streams.sessionizeTws` with a
 * far-future sentinel advancing the watermark past every real
 * session's close, under a single AvailableNow run — does the trigger
 * run the trailing no-data batch that fires the timers? Compares the
 * closed-session count to the batch `session_window` answer.
 */
object ProbeTwsSessions {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.sources.Sources.register(spark, dir)

    val ev = spark.table("events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Streams.Event].collect()
    val sentinel = graft.streaming.Streams.Event(
      -1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.Streams.Event]
    in.addData((ev :+ sentinel).toSeq: _*)
    val q = graft.streaming.Streams.sessionizeTws(in.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("probe_tws_sess")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val streamed = spark.table("probe_tws_sess").where(col("user_id") >= 0)
    val nStreamed = streamed.count()
    val batch = spark.table("events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val nBatch = batch.count()
    println(s"PROBE sessions streamed=$nStreamed batch=$nBatch equal=${nStreamed == nBatch}")
    // value-level check: per-user session event counts multiset
    val a = streamed.groupBy("user_id").agg(sum("n_events").as("s"), count(lit(1)).as("c"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = batch.groupBy("user_id").agg(sum("n_events").as("s"), count(lit(1)).as("c"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"PROBE perUser equal=${a.toSeq == b.toSeq}")
    spark.stop()
  }
}
