package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-19 A/B: RocksDB changelog checkpointing for the
  * transformWithState replay family (VERDICT r18 item 4). Runs the
  * DECLARED queries (not a standalone replay — ProbeR18Tws showed
  * those mis-measure) interleaved with the conf off/on, min-of-N,
  * in one session. Changelog checkpointing writes per-batch changelogs
  * instead of zipping+uploading a full RocksDB snapshot at every
  * commit — for a single AvailableNow batch that removes the snapshot
  * upload from the critical path.
  * Usage: Test/runMain graft.tools.ProbeR19Tws <sfDir> <runs> <name>...
  */
object ProbeR19Tws {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("x_tws_totals", "x_tws_bootstrap", "x_tws_topk", "x_tws_sessions")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())
    val key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm both paths once (JIT, store init)
      spark.conf.set(key, "false"); fn(spark, sfDir).count()
      spark.conf.set(key, "true"); fn(spark, sfDir).count()
      spark.catalog.clearCache()
      val (offs, ons) = (1 to runs).map { _ =>
        spark.conf.set(key, "false")
        var t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val off = (System.nanoTime() - t0) / 1e9
        spark.conf.set(key, "true")
        t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val on = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (off, on)
      }.unzip
      spark.conf.unset(key)
      println(f"PROBE $name%-18s off=${offs.min}%6.2fs on=${ons.min}%6.2fs " +
        f"(runs off=${offs.map(o => f"$o%.2f").mkString(",")} on=${ons.map(o => f"$o%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
