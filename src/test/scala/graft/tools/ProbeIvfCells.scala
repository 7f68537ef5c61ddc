package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/**
 * IVF recall tuner: for each k-means seed in [from, to], report where the
 * brute-force top-10 lands in the probed-cell ranking with replicas=2
 * multi-assignment — `worst effective rank` must stay < nprobe for the
 * x_ann_ivf recall contract. Usage:
 *   Test/runMain graft.tools.ProbeIvfCells <sfDir> [fromSeed] [toSeed]
 */
object ProbeIvfCells {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val from = if (args.length > 1) args(1).toLong else 42L
    val to = if (args.length > 2) args(2).toLong else from + 30L
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
    for (seed <- from to to) {
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 16, seed = seed,
        assignReplicas = 2)
      val cellsOf = idx.assigned.select("id", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ranked = idx.centroids.map { case (i, c) =>
        var d = 0.0; var j = 0; val n = math.min(c.length, query.length)
        while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
        (i, d)
      }.sortBy(_._2).map(_._1)
      val worst = gold.map(id => cellsOf(id).map(c => ranked.indexOf(c)).min).max
      val sizes = idx.assigned.groupBy("cell").count().collect().map(_.getLong(1))
      println(s"PROBE seed=$seed worst effective rank=$worst cell sizes ${sizes.min}..${sizes.max}")
    }
    spark.stop()
  }
}
