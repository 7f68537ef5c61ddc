package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 state-partition A/B for the stream-stream interval join
  * (x_stream_join replayed verbatim): the join carries FOUR stores per
  * partition, so the tws-optimal count may not transfer. Asserts the
  * emitted row set is identical across variants.
  * Usage: Test/runMain graft.tools.ProbeR19JoinParts <sfDir>
  */
object ProbeR19JoinParts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/forcedata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())

    val ev = spark.table("events")
      .where(col("event_type").isin("view", "purchase") && col("user_id") < 100)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    println(s"PROBE feed rows=${ev.length} partsDerived=${math.min(4, ev.length / 150000 + 1)}")

    def run(stateParts: Int): Unit = {
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
      spark.catalog.dropTempView("probe_join_sink")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
      try {
        val t0 = System.nanoTime()
        val q = joined.writeStream.format("memory").queryName("probe_join_sink")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        val done = q.awaitTermination(120000)
        if (!done) q.stop()
        val s = (System.nanoTime() - t0) / 1e9
        val sig = spark.table("probe_join_sink")
          .select(xxhash64(struct(col("*"))).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
        println(f"PROBE state=$stateParts%-3d ${s}%6.2fs rows=${sig.get(0)} hash=${sig.get(1)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.catalog.clearCache()
    }

    (1 to 2).foreach { r =>
      println(s"PROBE ---- round $r ----")
      Seq(4, 8, 16).foreach(run)
    }
    spark.stop()
  }
}
