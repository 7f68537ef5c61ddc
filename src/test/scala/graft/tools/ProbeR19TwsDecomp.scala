package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 decomposition of the tws replay cost at force scale: how
  * much of x_tws_topk / x_tws_totals is (a) the driver collect of the
  * feed, (b) MemoryStream.addData, (c) the streaming query itself —
  * and within (c), job/stage/task counts from a listener. Replays the
  * DECLARED query's exact steps in place.
  * Usage: Test/runMain graft.tools.ProbeR19TwsDecomp <sfDir>
  */
object ProbeR19TwsDecomp {
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

    @volatile var jobs = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })
    def timed[A](label: String)(f: => A): A = {
      jobs = 0; tasks = 0; taskMs = 0
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs jobs=$jobs tasks=$tasks taskSec=${taskMs / 1e3}%6.2f")
      r
    }

    (1 to 2).foreach { round =>
      println(s"PROBE ---- round $round ----")
      val ev = timed("collect feed") {
        spark.table("events")
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.Streams.Event].collect()
      }
      println(s"PROBE feed rows=${ev.length}")
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Streams.Event]
      timed("addData")(in.addData(ev.toSeq: _*))
      spark.catalog.dropTempView("probe_tws_sink")
      val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.min(4, ev.length / 150000 + 1).toString)
      try {
        timed("streaming query (topk)") {
          val q = graft.streaming.Streams.topKRecentStream(in.toDS(), k = 3, recentSize = 20)
            .writeStream.format("memory").queryName("probe_tws_sink")
            .outputMode("update")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          val done = q.awaitTermination(120000)
          if (!done) q.stop()
        }
        timed("sink read")(spark.table("probe_tws_sink").count())
      } finally {
        prevProv match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
