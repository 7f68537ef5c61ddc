package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 experiment: how much of the replayed stream-join queries is
  * state-store partition overhead vs fixture collect/feed? Replicates
  * x_stream_join's harness with the shuffle-partition count as a
  * parameter and times each phase. */
object ProbeR18Stream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.sources.Sources.register(spark, sfDir)

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val ev = t("collect events (views+purchases)") {
      spark.table("events")
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .as[(Long, Long, java.sql.Timestamp, String)].collect()
    }
    println(s"PROBE n_events = ${ev.length}")

    Seq(4, 2, 1, 4).foreach { parts =>
      (1 to 2).foreach { round =>
        t(s"stream_join parts=$parts round=$round") {
          val vs = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Long, java.sql.Timestamp)]
          val ps = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, Long, java.sql.Timestamp)]
          vs.addData(ev.filter(_._4 == "view").map(e => (e._1, e._2, e._3)).toSeq: _*)
          ps.addData(ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3)).toSeq: _*)
          val joined = graft.streaming.Streams.intervalJoinStream(
            vs.toDF().toDF("view_id", "user_id", "v_ts"),
            ps.toDF().toDF("buy_id", "user_id", "b_ts"),
            "user_id", "v_ts", "b_ts", horizon = "30 minutes")
          spark.catalog.dropTempView(s"probe_sj_sink_${parts}_$round")
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
          try {
            val q = joined.writeStream.format("memory")
              .queryName(s"probe_sj_sink_${parts}_$round")
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
            q.awaitTermination()
          } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
          val n = spark.table(s"probe_sj_sink_${parts}_$round").count()
          println(s"PROBE   rows=$n")
        }
      }
    }
    spark.stop()
  }
}
