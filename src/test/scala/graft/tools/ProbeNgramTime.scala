package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeNgramTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.1")
    spark.table("documents").count()
    for (q <- Seq("x_dedup_ngram", "x_dedup_minhash")) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"PROBE $q rows=$n time=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
