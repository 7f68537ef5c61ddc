package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Where does the brute-force top-10 land in the IVF cells, and how does
  * the centroid ranking order those cells (sf0.01 recall contract). */
object ProbeIvfCells {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    val e = spark.table("embeddings")
    println("PROBE n=" + e.count())
    val query = e.where(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0).toArray
    val gold = Similarity.topK(e.select(col("vec_id"), col("embedding")), "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0))
    println("PROBE gold top10 = " + gold.mkString(","))
    for (seed <- Seq(103L, 146L, 148L, 155L)) {
      val nlist = 16
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = nlist, seed = seed,
        assignReplicas = 2)
      val cellsOf = idx.assigned.select("id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ranked = idx.centroids.map { case (i, c) =>
        var d = 0.0; var j = 0; val n = math.min(c.length, query.length)
        while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
        (i, d)
      }.sortBy(_._2).map(_._1)
      val worst = gold.map(id => cellsOf(id).map(c => ranked.indexOf(c)).min).max
      println(s"PROBE seed=$seed replicas=2 worst effective rank=$worst")
      val sizes = idx.assigned.groupBy("cell").count().collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(-_._2)
      println(s"PROBE seed=$seed cell sizes desc = " + sizes.map(_._2).mkString(","))
      println(s"PROBE seed=$seed gold cells = " + gold.map(id => cellsOf(id).mkString("/")).mkString(" "))
    }
    spark.stop()
  }
}
