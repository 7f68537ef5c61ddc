package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity}
object ProbePq0 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         cand <- Seq(100, 150)) {
      spark.catalog.clearCache()
      graft.sources.Sources.register(spark, dir)
      val e = spark.table("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val model = ProductQuantization.fit(e, "vec_id", "emb", m = 16, k = 16)
      val q = e.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
      val pq = ProductQuantization.adcTopK(e, "vec_id", "emb", model, q, 10, cand)
        .select("vec_id").as[Long].collect().toSeq
      val exact = Similarity.topK(e, "vec_id", "emb", q.map(_.toFloat), 10)
        .select("vec_id").as[Long].collect().toSeq
      println(s"PROBE $dir cand=$cand equal=${pq == exact} n=${e.count()}")
    }
  }
}
