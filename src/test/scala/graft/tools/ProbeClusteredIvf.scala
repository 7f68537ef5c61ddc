package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print the two new round-6 ANN queries at a given SF dir so
  * their output can be eyeballed against the DuckDB oracle while
  * iterating on nprobe/nlist choices. */
object ProbeClusteredIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("x_ann_ivf_clustered", "x_pq_persisted", "x_ann_ivf", "x_pq_topk")) {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(q)(spark, sfDir).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      println(s"== $q (${ms.round} ms)")
      rows.foreach(r => println(r.toString))
    }
    spark.stop()
  }
}
