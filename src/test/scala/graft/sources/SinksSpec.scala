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
}
