package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeProfiler {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    val meta = graft.catalog.Profiler.crawl(spark,
      Seq("orders", "nation", "lineitem", "embeddings"), graft.sources.Sources.fixtureFks)
    val os = meta.tables("orders").columns.find(_.name == "o_orderstatus").get
    println(s"PROBE domain_orderstatus => ${os.uniqueValues}")
    val op = meta.tables("orders").columns.find(_.name == "o_orderpriority").get
    println(s"PROBE domain_orderpriority => ${op.uniqueValues}")
    val nn = meta.tables("nation").columns.find(_.name == "n_name").get
    println(s"PROBE domain_nation_names => size=${nn.uniqueValues.map(_.size)} sortedFirst=${nn.uniqueValues.map(_.take(3))}")
    val nk = meta.tables("nation").columns.find(_.name == "n_nationkey").get
    println(s"PROBE domain_numeric_sorted => ${nk.uniqueValues.map(_.take(5))}")
    val lq = meta.tables("lineitem").columns.find(_.name == "l_orderkey").get
    println(s"PROBE highcard_no_domain => ${lq.uniqueValues.isEmpty} distinct=${lq.distinctCount}")
    val emb = meta.tables("embeddings").columns.find(_.name == "embedding").get
    println(s"PROBE array_col_no_domain => ${emb.uniqueValues.isEmpty}")
    spark.stop()
  }
}
