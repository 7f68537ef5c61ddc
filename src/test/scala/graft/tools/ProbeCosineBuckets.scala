package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnoses the x_cosine_neardup cost under the round-8 regenerated
  * embeddings fixture: band-bucket size distribution, raw in-bucket pair
  * volume, hamming-prescreen survivors. */
object ProbeCosineBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val planted = e.where(col("vec_id") < 25)
      .select((col("vec_id") + 100000).as("vec_id"),
        concat(array(element_at(col("emb"), 1) + lit(0.25)), slice(col("emb"), 2, 63)).as("emb"))
    val df = e.union(planted)
    val chunks = 8; val bits = 64 / chunks
    val sig = df.withColumn("sig", graft.operators.Similarity.signBits(col("emb"), 64, 64, 42L))
    val bandStructs = (0 until chunks).map { i =>
      struct(lit(i).as("band"),
        shiftrightunsigned(col("sig"), i * bits).bitwiseAND(lit((1L << bits) - 1)).as("value"))
    }
    val banded = sig.select(struct(col("vec_id").as("id"), col("sig")).as("m"),
        explode(array(bandStructs: _*)).as("c"))
      .select(col("m"), col("c.band"), col("c.value"))
    val buckets = banded.groupBy("band", "value").agg(count(lit(1)).as("n"))
    println("PROBE rows => " + df.count())
    buckets.agg(count(lit(1)).as("buckets"), max("n").as("max_n"),
      sum(col("n") * (col("n") - 1) / 2).as("raw_pairs")).show(false)
    buckets.orderBy(col("n").desc).show(20, false)
    val hamCut = math.min(64, math.ceil(64.0 * math.acos(0.95) / math.Pi).toInt + 12)
    println("PROBE hamCut => " + hamCut)
    val b2 = banded.groupBy("band", "value")
      .agg(collect_list(col("m")).as("ms"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("n") <= 10000)
    val pairs = b2.select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.id") < col("b.id"))
    println("PROBE rawExploded => " + pairs.count())
    val kept = pairs.where(graft.functions.hamming64(col("a.sig"), col("b.sig")) <= hamCut)
      .select("a.id", "b.id").distinct()
    println("PROBE afterHamming => " + kept.count())
    spark.stop()
  }
}
