package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.interop.{toColumn => column, toExpression => expression}

/**
 * Column-level API over the engine's custom Catalyst expressions
 * (SURVEY.md §2.11), mirroring `org.apache.spark.sql.functions` style.
 */
package object functions {

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  def sign_bits_lsh(embedding: Column, numBits: Int, dim: Int, seed: Long = 42L): Column =
    column(SignBitsLsh(expression(embedding), numBits, dim, seed))

  def minhash_signature(tokens: Column, numHashes: Int, seed: Long = 42L): Column =
    column(MinHashSignature(expression(tokens), numHashes, seed))

  def minhash_buckets(tokens: Column, numHashes: Int, bands: Int, seed: Long = 42L): Column =
    column(MinHashBuckets(expression(tokens), numHashes, bands, seed))

  def word_shingles(text: Column, n: Int): Column =
    column(WordShingles(expression(text), n))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(tokens), seed))

  def hamming64(a: Column, b: Column): Column =
    column(HammingDistance64(expression(a), expression(b)))

  def jaro_winkler(a: Column, b: Column): Column =
    column(JaroWinklerSimilarity(expression(a), expression(b)))

  def doc_fingerprint(text: Column, k: Int = 16): Column =
    column(RollingHashFingerprint(expression(text), k))

  def text_counts(text: Column): Column =
    column(TextCounts(expression(text)))

  def lang_id(text: Column, langStopwords: Seq[(String, Seq[String])]): Column =
    column(LangIdHeuristic(expression(text), langStopwords))

  def array_top_count(arr: Column): Column =
    column(ArrayTopCount(expression(arr)))

  def bpe_tokens(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeUnits(expression(text), merges, emitPairs = false))

  def bpe_pairs(text: Column, merges: Seq[(String, String)]): Column =
    column(BpeUnits(expression(text), merges, emitPairs = true))

  def char_distribution(text: Column): Column =
    column(CharDistribution(expression(text)))

  def int8_quantize_stats(emb: Column): Column =
    column(Int8QuantizeStats(expression(emb)))

  def int8_codes(emb: Column): Column =
    column(Int8Codes(expression(emb)))

  def top_k_by_value(ord: Column, id: Column, k: Int): Column =
    column(TopKByValue(expression(ord), expression(id), k).toAggregateExpression())

  def bloom_count_hits(hashes: Column,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    column(BloomCountHits(expression(hashes), bloom))

  def sorted_overlap_count(hashes: Column,
      sortedHashes: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    column(SortedHashOverlapCount(expression(hashes), sortedHashes))

  def nearest_centroid(emb: Column, centroids: Array[(Int, Array[Double])]): Column =
    column(NearestCentroidId(expression(emb), centroids))

  def nearest_centroids(emb: Column, centroids: Array[(Int, Array[Double])], nprobe: Int): Column =
    column(NearestCentroidIds(expression(emb), centroids, nprobe))

  def quantile_bucket(value: Column, cuts: Array[Double]): Column =
    column(QuantileBucket(expression(value), cuts))

  def cms_merge(sketch: Column): Column =
    column(CmsMergeSketches(expression(sketch)).toAggregateExpression())

  def cms_estimate(sketch: Column, item: Column): Column =
    column(CmsEstimateCount(expression(sketch), expression(item)))

  /** Register SQL names for the custom expressions
    * (`SELECT cosine_sim(a, b) …`). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "built-in")
    reg.createOrReplaceTempFunction("hamming64", es => HammingDistance64(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("doc_fingerprint", es => RollingHashFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction("char_distribution", es => CharDistribution(es.head), "built-in")
    reg.createOrReplaceTempFunction("int8_quantize_stats", es => Int8QuantizeStats(es.head), "built-in")
    reg.createOrReplaceTempFunction("int8_codes", es => Int8Codes(es.head), "built-in")
  }
}
