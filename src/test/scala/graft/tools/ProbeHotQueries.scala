package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sub-stage timing of the round-4 hot bench queries (ivf, ngram,
  * minhash, quality_filter) at bench scale. */
object ProbeHotQueries {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    val docs = spark.table("documents")
    val embs = spark.table("embeddings")
    time("warmup counts")(docs.count() + embs.count())

    import graft.operators.{Dedup, Similarity, TextAnalysis, Pipelines}

    // ---- x_ann_ivf ----
    val query = time("ivf: collect query vec")(
      embs.where(col("vec_id") === 0).select("embedding").collect()(0).getSeq[Float](0).toArray)
    val idx = time("ivf: ivfIndex (kmeans+assign)")(
      Similarity.ivfIndex(embs, "vec_id", "embedding", nlist = 16))
    time("ivf: assigned.count")(idx.assigned.count())
    time("ivf: topk count")(Similarity.ivfTopK(idx, query, k = 10, nprobe = 6).count())

    // ---- x_dedup_ngram ----
    val sh = docs.select(col("doc_id").as("id"), array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    time("ngram: shingle project count")(sh.count())
    val postings = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("shingle"))
    time("ngram: postings count")(postings.count())
    val lists = postings.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("ps"))
      .where(size(col("ps")).between(2, 500))
    time("ngram: lists count")(lists.count())
    time("ngram: FULL pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())

    // ---- x_dedup_minhash ----
    time("minhash: buckets count")(Dedup.minhashBuckets(docs, "doc_id", "text").count())
    time("minhash: candidates count")(Dedup.minhashCandidatePairs(docs, "doc_id", "text").count())
    time("minhash: FULL verified")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.7).count())

    // ---- x_quality_filter ----
    time("quality: analyze count")(TextAnalysis.analyze(docs, "doc_id", "text").count())
    time("quality: FULL filter")(Pipelines.qualityFilter(docs, "doc_id", "text",
      allowedLangs = Seq("en"), minQuality = 0.3, minTokens = 5, maxTokens = 100000).count())

    // second pass (warm JIT) for the two biggest
    time("ivf: FULL warm")(Similarity.ivfTopK(
      Similarity.ivfIndex(embs, "vec_id", "embedding", nlist = 16), query, 10, 6).count())
    time("ngram: FULL warm")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count())
    time("minhash: FULL warm")(Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.7).count())
    time("quality: FULL warm")(Pipelines.qualityFilter(docs, "doc_id", "text",
      allowedLangs = Seq("en"), minQuality = 0.3, minTokens = 5, maxTokens = 100000).count())
    spark.stop()
  }
}
