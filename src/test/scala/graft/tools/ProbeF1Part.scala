package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeF1Part {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")

    // distributed F1 on real tables: identical (column order shuffled) = 1.0
    val a = spark.table("orders").select("o_orderkey", "o_orderstatus")
    val b = spark.table("orders").select("o_orderstatus", "o_orderkey")
    println("PROBE f1_identical => " + graft.eval.Evaluation.distributedF1(a, b))
    val half = a.where(col("o_orderkey") % 2 === 0)
    println(f"PROBE f1_half => ${graft.eval.Evaluation.distributedF1(a, half)}%.4f (expect ~0.667 for a half subset)")
    val disjoint = a.withColumn("o_orderkey", col("o_orderkey") + 10000000)
    println("PROBE f1_disjoint => " + graft.eval.Evaluation.distributedF1(a, disjoint))

    // partitioned layout on real orders + pruning evidence
    val dir = java.nio.file.Files.createTempDirectory("probe-part").toString
    graft.sources.Sinks.writeDatePartitioned(spark.table("orders"), dir, "o_orderdate")
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part_date=")).length
    val back = spark.read.parquet(dir)
    val pruned = back.where(col("part_date") === "1995-03-01")
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("NONE").trim
    println(s"PROBE partitions => $parts dirs, pruned_rows=${pruned.count()} / total=${back.count()}")
    println("PROBE pruning => " + pf.take(160))
    spark.stop()
  }
}
