package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object ProbeSimhashGold {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    val docs = spark.table("documents")
    val gold = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
    val sh = Dedup.withSimhash(docs, "doc_id", "text")
    val j = gold
      .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("simhash", "h_a"), "id_a")
      .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("simhash", "h_b"), "id_b")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3).as("j"),
        graft.functions.hamming64(col("h_a"), col("h_b")).as("ham"))
    println("PROBE gold pair hamming distribution:")
    j.groupBy("ham").count().orderBy("ham").collect().foreach(r => println(s"PROBE ham=${r.get(0)} n=${r.get(1)}"))
    println("PROBE max ham: " + j.agg(max("ham")).collect()(0).get(0))
    // how many simhash pairs exist at various maxDistance (precision side)
    for (d <- Seq(3, 6, 8, 10)) {
      val n = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxDistance = d).count()
      println(s"PROBE simhash pairs at maxDistance=$d: $n")
    }
    spark.stop()
  }
}
