package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproduce the bench environment exactly (extensions on, same configs,
  * runs=2 min) for a selected query list, to explain the BENCH_r04 gap
  * (probe 13s vs bench 65s for x_curate). args: sfDir query... */
object ProbeBenchRepro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("x_curate")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir).foreach(t => spark.table(t).count())
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        println(f"PROBE $name%-20s run$i ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      }
    }
    spark.stop()
  }
}
