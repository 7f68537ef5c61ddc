package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-18 tail anatomy: for representative CHEAP declared queries,
  * split per-run time into frame build (analysis), optimize+plan
  * (explain cost), and execution (count), min-of-3 each — is the 0.2s
  * tail median planning or running? */
object ProbeR18Tail {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d01_project_limit", "d03_filter_and", "d07_join_fk",
        "d10_groupby_sum_avg", "d15_topn", "d41_tpch_q3", "d49_tpch_q21",
        "x_len_hist", "x_split", "x_sketch_hll")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())

    def min3(f: => Unit): Double = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      best
    }
    println(f"PROBE ${"query"}%-22s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val build = min3 { fn(spark, sfDir) }
      val df = fn(spark, sfDir)
      val plan = min3 { fn(spark, sfDir).queryExecution.executedPlan }
      val exec = min3 { fn(spark, sfDir).count() }
      spark.catalog.clearCache()
      println(f"PROBE $n%-22s $build%7.3f $plan%7.3f $exec%7.3f")
    }
    spark.stop()
  }
}
