package graft.sources

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  lazy val df = {
    Sources.register(spark, sfDir)
    spark.table("nation").orderBy("n_nationkey").limit(5)
  }

  test("jsonRows mirrors the reference result envelope") {
    val (cols, rows) = Sinks.jsonRows(df)
    assert(cols == Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(rows.size == 5)
    assert(rows.head.forall(v => v == null || v.isInstanceOf[Int] || v.isInstanceOf[String]))
  }

  test("csv round-trips with header") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    Sinks.singleCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.columns.toSeq == df.columns.toSeq)
    assert(back.count() == 5)
    // single file export
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".csv")) == 1)
  }

  test("json round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    Sinks.writeJson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 5)
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
  }

  test("date-partitioned layout prunes partitions at planning time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val orders = spark.table("orders")
    Sinks.writeDatePartitioned(orders, dir, "o_orderdate")
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    val pruned = back.where(col("part_date") === "1995-03-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("part_date"), plan.take(1200))
    // pruned scan reads strictly fewer files than the full table
    assert(pruned.count() < orders.count() && pruned.count() > 0)
  }

  test("dynamic partition pruning: a filtered broadcast dim prunes fact partitions at runtime") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val orders = spark.table("orders")
    Sinks.writeDatePartitioned(orders, dir, "o_orderdate")
    val fact = spark.read.parquet(dir)
    // dim must be a FILTERED SCAN (not a local relation) for DPP's
    // selectivity heuristic to fire: persist the month dimension, read
    // it back, filter ONE month — the fact's partition set is only
    // knowable at runtime from the dim's surviving rows
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    fact.select(col("part_date")).distinct()
      .withColumn("label", date_format(col("part_date"), "yyyy-MM"))
      .write.mode("overwrite").parquet(dimDir)
    val picked = spark.read.parquet(dimDir).where(col("label") === "1995-03")
    val joined = fact.join(broadcast(picked), Seq("part_date"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(1500))
    val expected = fact
      .where(date_format(col("part_date"), "yyyy-MM") === "1995-03").count()
    assert(expected > 0 && joined.count() === expected)
  }
}
