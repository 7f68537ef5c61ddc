package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-18 optimization probe: run named declared queries (bench
  * methodology: warm registration, `.count()` action, min of `runs`)
  * and report per-query wall time plus JOB / STAGE / TASK counts and
  * summed task time from a SparkListener — separates scheduler-round
  * overhead (iterative algorithms, AQE stage waves) from real compute.
  * Usage: Test/runMain graft.tools.ProbeR18Hot <sfDir> <runs> <name>...
  */
object ProbeR18Hot {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 2
    val names = if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskMs += t.taskInfo.duration
      }
    })

    graft.sources.Sources.register(spark, dir).foreach(t => spark.table(t).count())
    println(f"PROBE ${"query"}%-26s ${"best_s"}%8s ${"runs_s"}%-18s jobs stages tasks taskSec")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val perRun = (1 to runs).map { _ =>
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        (s, jobs, stages, tasks, taskMs)
      }
      spark.catalog.clearCache()
      val best = perRun.minBy(_._1)
      val runsStr = perRun.map(r => f"${r._1}%.2f").mkString(",")
      println(f"PROBE $name%-26s ${best._1}%8.3f $runsStr%-18s ${best._2}%4d ${best._3}%6d ${best._4}%5d ${best._5 / 1e3}%7.2f")
    }
    spark.stop()
  }
}
