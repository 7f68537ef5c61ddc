package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 decomposition + A/B for x_anomaly_mad: is the med
  * aggregation computed twice (no ReuseExchange across the two
  * broadcast sites), and does sharing the key-sized med/stats frames
  * (lazy localCheckpoint — |keys| rows, not corpus) pay at force
  * scale? Asserts identical output before timing.
  * Usage: Test/runMain graft.tools.ProbeR19Mad <sfDir>
  */
object ProbeR19Mad {
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
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())
    val events = spark.table("events")
    val threshold = 3.0

    def current = graft.operators.EventAnalytics.anomalyMad(
      events, "event_type", "value", Seq("event_id"), threshold)

    // shared variant: med and the (med ⋈ mad) stats frames are
    // KEY-sized; lazy-localCheckpoint them so each percentile pass and
    // the final filter run once over the corpus
    def shared = {
      val med = events.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("__med"))
        .localCheckpoint(eager = false)
      val madF = events.join(med, "event_type")
        .withColumn("__adev", abs(col("value") - col("__med")))
        .groupBy(col("event_type"))
        .agg(expr("percentile(__adev, 0.5)").as("__mad"))
      val stats = med.join(madF, "event_type")
      events.join(stats, "event_type")
        .withColumn("__adev", abs(col("value") - col("__med")))
        .where(col("__mad") > 0 && col("__adev") > lit(threshold) * 1.4826 * col("__mad"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("__med")) / (lit(1.4826) * col("__mad")), 4)
            .as("robust_z"))
    }

    val d1 = current.exceptAll(shared).count()
    val d2 = shared.exceptAll(current).count()
    println(s"PROBE equivalence: cur-minus=$d1 shared-minus=$d2 " +
      (if (d1 == 0 && d2 == 0) "IDENTICAL" else "*** MISMATCH ***"))

    val plan = current.queryExecution.executedPlan.toString
    println(s"PROBE current plan ReusedExchange=${plan.contains("ReusedExchange")} " +
      s"percentileAggs=${"percentile".r.findAllIn(plan).length}")

    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val n1 = current.count()
      val s1 = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val n2 = shared.count()
      val s2 = (System.nanoTime() - t0) / 1e9
      println(f"PROBE ab round$r: current=$s1%5.2fs ($n1) shared=$s2%5.2fs ($n2)")
    }
    spark.stop()
  }
}
