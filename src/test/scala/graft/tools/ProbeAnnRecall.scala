package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    val e = spark.table("embeddings")
    val query = e.where(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0).toArray
    val gold = Similarity.topK(e, "vec_id", "embedding", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println("PROBE gold ids: " + gold.toSeq.sorted.mkString(","))
    for (bits <- Seq(8, 16)) {
      val dim = query.length
      val planes = Similarity.hyperplanes(bits, dim, 42L)
      var qsig = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        var dot = 0.0; var j = 0
        while (j < dim) { dot += p(j) * query(j); j += 1 }
        if (dot >= 0) qsig |= (1L << i)
      }
      val sigs = e.withColumn("sig", Similarity.signBits(col("embedding"), bits, dim, 42L))
        .where(col("vec_id").isin(gold.toSeq: _*))
        .select(col("vec_id"), graft.functions.hamming64(col("sig"), lit(qsig)).as("ham"))
        .collect().map(r => (r.getLong(0), r.get(1).toString.toLong))
      println(s"PROBE bits=$bits gold hams: " + sigs.sortBy(_._2).mkString(" "))
    }
    // IVF: which cells hold the gold ids, and at what centroid rank
    for (nlist <- Seq(8, 16)) {
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = nlist)
      val cells = idx.centroids.map { case (i, c) =>
        var d = 0.0; val n = math.min(c.length, query.length); var j = 0
        while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
        (i, d)
      }.sortBy(_._2).map(_._1)
      val cellOf = idx.assigned.where(col("id").isin(gold.toSeq: _*))
        .select("id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val ranks = cellOf.values.toSeq.map(c => cells.indexOf(c))
      println(s"PROBE nlist=$nlist gold cell-ranks: " + ranks.sorted.mkString(",") + s" (need nprobe=${ranks.max + 1})")
    }
    spark.stop()
  }
}
