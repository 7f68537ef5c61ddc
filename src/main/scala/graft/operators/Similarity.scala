package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.cosine_sim

/**
 * Similarity search over an embedding column (north-star extension).
 *
 * Scale design (100 TB / billions of vectors):
 *  - `topK` (brute force) is a single scan + `TakeOrderedAndProject` —
 *    no shuffle of the full table, no full sort; the per-partition top-k
 *    heaps merge on the driver. This is the exact baseline.
 *  - `lshTopK` buckets vectors by random-hyperplane sign bits once
 *    (narrow, deterministic), then probes only matching buckets —
 *    the approximate scale path. Signature length trades recall for
 *    candidate-set size.
 *  - `cosineNearDupPairs` is embedding near-dup detection for dedup
 *    pipelines: bucket join on hyperplane signature, verify with exact
 *    cosine inside buckets only.
 */
object Similarity {

  /** Deterministic random hyperplanes: `numBits` unit-free vectors of
    * dimension `dim`, components from splitmix64 mapped to [-1, 1). */
  private[operators] def hyperplanes(numBits: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val out = Array.ofDim[Double](numBits, dim)
    var s = seed
    var i = 0
    while (i < numBits) {
      var j = 0
      while (j < dim) {
        s = graft.functions.HashUtil.mix64(s)
        out(i)(j) = (s.toDouble / Long.MaxValue.toDouble) // [-1, 1)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Sign-bit LSH signature of an embedding column as a long (≤ 64 bits).
    * Single-expression evaluation (SignBitsLsh) — the composed
    * per-plane dot-product version rebuilt numBits literal arrays per
    * row. Plane generation matches `hyperplanes` (same seed chain). */
  def signBits(embedding: org.apache.spark.sql.Column, numBits: Int, dim: Int, seed: Long = 42L): org.apache.spark.sql.Column =
    graft.functions.sign_bits_lsh(embedding, numBits, dim, seed)

  /** Exact brute-force cosine top-k for one query vector.
    * Plans as scan → project(cosine) → TakeOrderedAndProject. */
  def topK(df: DataFrame, idCol: String, embCol: String, query: Array[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    df.select(col(idCol), cosine_sim(col(embCol), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: restrict the scan to vectors whose sign-bit
    * signature matches the query's, then rank exactly. Falls back to the
    * full scan when the bucket has fewer than k members is NOT done here —
    * callers can widen by lowering `numBits`. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String, query: Array[Float], k: Int,
      numBits: Int = 16, seed: Long = 42L): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(numBits, dim, seed)
    var qsig = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += p(j) * query(j); j += 1 }
      if (dot >= 0) qsig |= (1L << i)
    }
    val bucketed = df.withColumn("__sig", signBits(col(embCol), numBits, dim, seed))
    topK(bucketed.where(col("__sig") === qsig), idCol, embCol, query, k)
  }

  /**
   * IVF (inverted-file) ANN index: KMeans partitions the vector space
   * into `nlist` cells; a query probes only its `nprobe` nearest cells
   * and ranks exactly inside them. The scale path when sign-bit LSH
   * recall is insufficient: cells adapt to the data distribution.
   */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  def ivfIndex(df: DataFrame, idCol: String, embCol: String,
      nlist: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("features", array_to_vector(col("emb").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("features")
      .setPredictionCol("cell").fit(vecs)
    val assigned = model.transform(vecs).select("id", "emb", "cell")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    IvfIndex(assigned, centroids)
  }

  def ivfTopK(index: IvfIndex, query: Array[Float], k: Int, nprobe: Int = 4): DataFrame = {
    // nearest cells by centroid distance (driver-side: nlist is small)
    val cells = index.centroids.map { case (i, c) =>
      var d = 0.0
      val n = math.min(c.length, query.length)
      var j = 0
      while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val q = array(query.map(v => lit(v.toDouble)): _*)
    index.assigned
      .where(col("cell").isin(cells.toSeq: _*))
      .select(col("id"), cosine_sim(col("emb"), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: bucket on sign-bit signature,
    * exact-cosine verify within buckets (explode-free broadcast of small
    * buckets via self-join on the signature). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95, numBits: Int = 16, dim: Int = 64,
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame = {
    // one shuffle: group by signature, cap the bucket, generate pairs
    // inside the collected list (same shape as Dedup's LSH paths —
    // window-count + self-join costs two extra wide shuffles)
    val sig = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("sig", signBits(col("emb"), numBits, dim, seed))
    val buckets = sig.groupBy("sig")
      .agg(collect_list(struct(col("id"), col("emb"))).as("members"))
      .where(size(col("members")).between(2, maxBucketSize))
    buckets
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine_sim(col("a.emb"), col("b.emb")).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
