package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 A/B for the tws replay shape at force scale: feed
  * partitions (MemoryStream numPartitions) × state partitions
  * (scoped spark.sql.shuffle.partitions), timing the streaming query
  * and checking the emitted result set stays IDENTICAL (count +
  * 2dp-rounded content hash) across variants.
  * Usage: Test/runMain graft.tools.ProbeR19TwsParts <sfDir>
  */
object ProbeR19TwsParts {
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
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[graft.streaming.Streams.Event].collect()
    println(s"PROBE feed rows=${ev.length}")

    def run(feedParts: Option[Int], stateParts: Int, label: String): Unit = {
      val in = feedParts match {
        case Some(n) => new org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.Streams.Event](
            scala.util.Random.nextInt(100000), spark, Some(n))
        case None => org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.Streams.Event]
      }
      in.addData(ev.toSeq: _*)
      spark.catalog.dropTempView("probe_tws_sink2")
      val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
      try {
        val t0 = System.nanoTime()
        val q = graft.streaming.Streams.topKRecentStream(in.toDS(), k = 3, recentSize = 20)
          .writeStream.format("memory").queryName("probe_tws_sink2")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        val done = q.awaitTermination(120000)
        if (!done) q.stop()
        val s = (System.nanoTime() - t0) / 1e9
        val sig = spark.table("probe_tws_sink2")
          .select(col("user_id"), col("rank"), col("event_type"), col("n_events"),
            col("recent_n"), round(col("recent_min"), 2), round(col("recent_max"), 2))
          .select(xxhash64(struct(col("*"))).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
        println(f"PROBE $label%-32s ${s}%6.2fs rows=${sig.get(0)} hash=${sig.get(1)}")
      } finally {
        prevProv match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      spark.catalog.clearCache()
    }

    (1 to 2).foreach { r =>
      println(s"PROBE ---- round $r ----")
      run(None, 4, "feed=1 state=4 (current)")
      run(None, 8, "feed=1 state=8")
      run(None, 16, "feed=1 state=16")
      run(Some(8), 4, "feed=8 state=4")
      run(Some(8), 8, "feed=8 state=8")
      run(Some(16), 16, "feed=16 state=16")
    }
    spark.stop()
  }
}
