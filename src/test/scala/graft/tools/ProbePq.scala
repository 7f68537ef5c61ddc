package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity}

/** Dev probe: PQ ADC recall@10 vs brute force across (m, k, candidates)
  * configs on the embeddings fixture — picks the config for the oracled
  * recall contract. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      spark.catalog.clearCache()
      graft.sources.Sources.register(spark, dir)
      val e = spark.table("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val n = e.count()
      import spark.implicits._
      for (m <- Seq(8, 16); k <- Seq(16, 32); cand <- Seq(50, 100)) {
        val model = ProductQuantization.fit(e, "vec_id", "emb", m = m, k = k)
        val recalls = (0 to 7).map { qi =>
          val q = e.where($"vec_id" === qi).select("emb").head().getSeq[Double](0).toArray
          val pq = ProductQuantization.adcTopK(e, "vec_id", "emb", model, q, 10, cand)
            .select("vec_id").as[Long].collect().toSet
          val exact = Similarity.topK(e, "vec_id", "emb", q.map(_.toFloat), 10)
            .select("vec_id").as[Long].collect().toSet
          (pq intersect exact).size / 10.0
        }
        println(f"PROBE $dir n=$n m=$m k=$k cand=$cand => min=${recalls.min}%.1f mean=${recalls.sum / recalls.size}%.2f")
      }
    }
  }
}
