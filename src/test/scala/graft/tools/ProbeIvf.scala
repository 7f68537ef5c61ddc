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
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val e = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val query = e.where(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0).toArray
      val gold = Similarity.topK(e, "vec_id", "embedding", query, 10).collect().map(_.getLong(0)).toSet
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 16)
      idx.assigned.cache().count()
      for (np <- Seq(6, 8, 10, 12)) {
        val got = Similarity.ivfTopK(idx, query, k = 10, nprobe = np).collect().map(_.getLong(0)).toSet
        println(s"PROBE $sf nprobe=$np exact=${got == gold} missing=${gold -- got}")
      }
      idx.assigned.unpersist()
    }
    spark.stop()
  }
}
