package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18: split a transformWithState replay (x_tws_totals shape)
  * into collect / feed / stream-run / read-back phases, twice, to see
  * which part owns the ~1.5s. */
object ProbeR18Tws {
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
    spark.table("events").count()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    (1 to 2).foreach { round =>
      val ev = t(s"r$round collect events") {
        spark.table("events")
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.Streams.Event].collect()
      }
      println(s"PROBE   n=${ev.length}")
      val in = t(s"r$round feed MemoryStream") {
        val m = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.Streams.Event]
        m.addData(ev.toSeq: _*)
        m
      }
      spark.catalog.dropTempView(s"probe_tws_$round")
      val prevProv = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      try {
        t(s"r$round stream run") {
          val q = graft.streaming.Streams.runningTotalsStream(in.toDS())
            .writeStream.format("memory").queryName(s"probe_tws_$round")
            .outputMode("update")
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
      } finally {
        prevProv match {
          case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      t(s"r$round read sink") {
        spark.table(s"probe_tws_$round").count()
      }
    }
    spark.stop()
  }
}
