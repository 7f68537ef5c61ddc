package graft.tools

import org.apache.spark.sql.SparkSession

object ProbeRetrieve {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("probe-r").toString
    val id = eng.train(dir)
    val (model, enc) = graft.ml.ModelStore.load(spark, dir, id)
    val q = "average customer account balance per market segment"
    val r = graft.ml.Embeddings.retrieve(spark, model, enc, q)
    println("PROBE tables => " + r.tables.mkString(","))
    r.similarities.toSeq.sortBy(-_._2).take(10).foreach { case (k, s) =>
      println(f"PROBE score $k%-40s $s%.3f")
    }
    spark.stop()
  }
}
