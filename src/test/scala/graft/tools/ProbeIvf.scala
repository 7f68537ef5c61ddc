package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object ProbeIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1"); reps <- Seq(1, 2)) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val query = e.where(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0).toArray
      val gold = Similarity.topK(e, "vec_id", "embedding", query, 10).collect().map(_.getLong(0)).toSet
      val t0 = System.nanoTime()
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 16, assignReplicas = reps)
      val got = Similarity.ivfTopK(idx, query, k = 10, nprobe = 6).collect().map(_.getLong(0)).toSet
      println(f"PROBE $sf reps=$reps exact=${got == gold} time=${(System.nanoTime()-t0)/1e9}%.2fs missing=${gold -- got}")
    }
    spark.stop()
  }
}
