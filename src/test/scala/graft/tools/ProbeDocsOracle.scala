package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the x_docs_* oracle rows (r15 verdict #1): derive the
  * JSON collection from the shared customer table, route NL questions
  * through Engine.askDocs, and print the generated query + envelope so
  * the DuckDB oracle SQL can be written against the exact output. */
object ProbeDocsOracle {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = graft.sources.Sources.register(spark, dir)
    val fixDir = s"/tmp/graft_docfix_${new java.io.File(dir).getName}/customers"
    spark.table("customer").select(
      col("c_custkey").as("_id"),
      col("c_name").as("name"),
      col("c_acctbal").as("balance"),
      col("c_mktsegment").as("segment"),
      struct(col("c_nationkey").as("nation")).as("contact"))
      .write.mode("overwrite").json(fixDir)
    graft.sources.DocSource.register(spark, fixDir, "customers")
    println("PROBE schema => " + spark.table("customers").schema.treeString)
    val eng = new graft.api.Engine(spark, tables, graft.sources.Sources.fixtureFks,
      docCollections = Seq("customers"))
    Seq(
      "top 5 customers by balance where segment is BUILDING",
      "average balance per segment for customers where balance is greater than 0",
      "how many customers have balance between 9990 and 10000",
      "customers with balance greater than 9995 sorted by name"
    ).foreach { q =>
      eng.askDocs(q) match {
        case Right(r) =>
          println(s"PROBE q => $q")
          println(s"PROBE gen => ${r.sql}")
          println(s"PROBE cols => ${r.columns.mkString(",")}")
          r.rows.take(8).foreach(row => println(
            "PROBE row => " + row.map(v => s"$v:${if (v == null) "null" else v.getClass.getSimpleName}").mkString(" | ")))
          println(s"PROBE n => ${r.rowcount}")
        case Left(e) => println(s"PROBE q => $q\nPROBE ERR => $e")
      }
    }
    spark.stop()
  }
}
