package graft.tools
import org.apache.spark.sql.SparkSession

object ProbeTfidf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.001", "sf0.01", "sf0.1"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("x_tfidf_top")(spark, s"/root/testdata/$sf").count()
      println(f"PROBE tfidf $sf run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
