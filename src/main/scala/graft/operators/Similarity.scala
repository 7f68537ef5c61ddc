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

  /**
   * Deterministic driver-side k-means (k-means++ seeding, Lloyd
   * iterations) for IVF centroid training. Runs on a bounded sample the
   * driver collects — the faiss recipe: centroid quality needs thousands
   * of vectors regardless of corpus size, and a driver-local loop over a
   * ≤20k-point sample beats a distributed fit's per-iteration job
   * scheduling by orders of magnitude (measured: MLlib KMeans fit on the
   * 2k-vector fixture ≈ 3.9s; this ≈ 0.05s for identical recall).
   * Deterministic: splitmix64 RNG chain from `seed`, ties keep the
   * lower index, empty clusters keep their previous center.
   */
  private[operators] object LocalKMeans {
    def fit(points: Array[Array[Double]], k: Int, seed: Long, maxIter: Int = 10): Array[Array[Double]] = {
      require(points.nonEmpty, "k-means needs a non-empty sample")
      val n = points.length
      val dim = points(0).length
      var s = seed
      def nextDouble(): Double = {
        s = graft.functions.HashUtil.mix64(s)
        (s >>> 11).toDouble / (1L << 53).toDouble
      }
      def d2(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var j = 0; val m = math.min(a.length, b.length)
        while (j < m) { val x = a(j) - b(j); d += x * x; j += 1 }
        d
      }
      val nc = math.min(k, n)
      val centers = new Array[Array[Double]](nc)
      centers(0) = points(math.min((nextDouble() * n).toInt, n - 1))
      // k-means++: each next center sampled ∝ distance² to nearest chosen
      val minD = Array.fill(n)(Double.MaxValue)
      var c = 1
      while (c < nc) {
        var i = 0
        while (i < n) {
          val d = d2(points(i), centers(c - 1)); if (d < minD(i)) minD(i) = d
          i += 1
        }
        var total = 0.0; i = 0
        while (i < n) { total += minD(i); i += 1 }
        val r = nextDouble() * total
        var acc = 0.0; i = 0
        while (i < n - 1 && acc + minD(i) < r) { acc += minD(i); i += 1 }
        centers(c) = points(i)
        c += 1
      }
      val assign = new Array[Int](n)
      java.util.Arrays.fill(assign, -1)
      var iter = 0
      var changed = true
      while (iter < maxIter && changed) {
        changed = false
        var i = 0
        while (i < n) {
          var bi = 0; var bd = Double.MaxValue; var ci = 0
          while (ci < nc) {
            val d = d2(points(i), centers(ci))
            if (d < bd) { bd = d; bi = ci }
            ci += 1
          }
          if (assign(i) != bi) { assign(i) = bi; changed = true }
          i += 1
        }
        val sums = Array.ofDim[Double](nc, dim)
        val counts = new Array[Int](nc)
        i = 0
        while (i < n) {
          val a = assign(i); counts(a) += 1
          val p = points(i); var j = 0; val m = math.min(dim, p.length)
          while (j < m) { sums(a)(j) += p(j); j += 1 }
          i += 1
        }
        var ci = 0
        while (ci < nc) {
          if (counts(ci) > 0) {
            var j = 0
            while (j < dim) { sums(ci)(j) /= counts(ci); j += 1 }
            centers(ci) = sums(ci)
          }
          ci += 1
        }
        iter += 1
      }
      centers
    }
  }

  /**
   * UNBIASED deterministic training sample: the `n` rows with the
   * smallest `xxhash64(id)` (ties to lower id), returned in (hash, id)
   * order.
   *
   * Head-of-table `limit(n)` is NOT a uniform sample — at 100 TB with
   * time- or source-ordered ingest the first 20k vectors are one shard
   * of one source, and centroid/codebook quality (hence recall) silently
   * collapses on the rest of the corpus. Hash order is pseudorandom and
   * independent of ingest order, so the selected SET is an unbiased
   * draw, and the returned ORDER — TakeOrderedAndProject emits rows in
   * (hash, id) sort order — is a pure function of the id set, so the
   * trained model no longer depends on which partition happened to
   * deliver first (LocalKMeans seeding is order-sensitive).
   *
   * Plan shape: one narrow projection + TakeOrderedAndProject — a
   * per-partition bounded heap, never a full sort of the corpus.
   */
  private[operators] def trainingSample(df: DataFrame, idCol: String,
      embCol: String, n: Int): Array[Array[Double]] =
    // NULL embeddings are excluded up front (a single null row would
    // NPE the collect — the query paths null-guard cosine the same way)
    df.where(col(embCol).isNotNull)
      .select(col(idCol), col(embCol).cast("array<double>").as("__emb"),
        xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h"), col(idCol))
      .limit(n)
      .collect()
      .map(_.getSeq[Double](1).toArray)

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
  def topK(df: DataFrame, idCol: String, embCol: String, query: Array[Float], k: Int): DataFrame =
    topK(df, idCol, embCol, query.map(_.toDouble), k)

  /** Double-precision query variant (see the [[ivfTopK]] double overload
    * for why computed query vectors must not truncate to float32). */
  def topK(df: DataFrame, idCol: String, embCol: String, query: Array[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), cosine_sim(col(embCol), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /**
   * Metadata-FILTERED exact vector search: cosine top-k restricted to
   * vectors whose metadata row satisfies `predicate` — the filtered-
   * retrieval shape serving stacks need (lang / source / license
   * constraints applied at query time, reference `app/routes_ai.py:91`'s
   * ask surface re-expressed over vectors).
   *
   * Scale: the predicate is applied to the METADATA frame before any
   * join or scoring, so it reaches the metadata parquet scan as a
   * pushed filter and only surviving ids meet the embedding frame.
   * No broadcast hint — AQE broadcasts the survivor id set when it
   * fits and falls back to a key-partitioned shuffle join when the
   * filter is unselective (the leakageSafeSplit lesson). Vectors
   * outside the filter are NEVER scored; the ranking is scan →
   * TakeOrderedAndProject, never a corpus-wide window.
   */
  def filteredTopK(emb: DataFrame, idCol: String, embCol: String,
      meta: DataFrame, metaIdCol: String, predicate: org.apache.spark.sql.Column,
      query: Array[Double], k: Int): DataFrame = {
    val allowed = meta.where(predicate).select(col(metaIdCol).as(idCol))
    topK(emb.join(allowed, idCol), idCol, embCol, query, k)
  }

  /** Float-query variant of [[filteredTopK]]. */
  def filteredTopK(emb: DataFrame, idCol: String, embCol: String,
      meta: DataFrame, metaIdCol: String, predicate: org.apache.spark.sql.Column,
      query: Array[Float], k: Int): DataFrame =
    filteredTopK(emb, idCol, embCol, meta, metaIdCol, predicate, query.map(_.toDouble), k)

  /**
   * Filtered IVF search: probe the query's `nprobe` nearest cells,
   * LeftSemi-join the cell candidates against the allowed-id frame,
   * then rank exactly — the filter prunes candidates AFTER the
   * cell-level pruning, so per-query work stays
   * (nprobe/nlist)·|base| regardless of filter selectivity, and the
   * semi-join never widens rows. Callers with highly selective
   * filters should raise `nprobe` (the standard filtered-ANN recall
   * dial: a filter that removes most of a probed cell leaves fewer
   * than k candidates unless more cells are probed).
   */
  def ivfTopKFiltered(index: IvfIndex, query: Array[Double], k: Int, nprobe: Int,
      allowed: DataFrame, allowedIdCol: String): DataFrame = {
    val cells = index.centroids.map { case (i, c) =>
      var d = 0.0
      val n = math.min(c.length, query.length)
      var j = 0
      while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    val allow = allowed.select(col(allowedIdCol).cast("long").as("id"))
    index.assigned
      .where(col("cell").isin(cells.toSeq: _*))
      .join(allow, Seq("id"), "left_semi")
      .select(col("id"), cosine_sim(col("emb"), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .dropDuplicates("id")
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Sign-bit signature of a query vector against the same deterministic
    * hyperplanes as [[signBits]]. */
  private[operators] def querySignature(query: Array[Float], numBits: Int, seed: Long): Long = {
    val dim = query.length
    val planes = hyperplanes(numBits, dim, seed)
    var qsig = 0L
    planes.zipWithIndex.foreach { case (p, i) =>
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += p(j) * query(j); j += 1 }
      if (dot >= 0) qsig |= (1L << i)
    }
    qsig
  }

  /**
   * Approximate top-k with MULTI-PROBE: candidates are all vectors whose
   * signature lies within Hamming radius `r` of the query signature,
   * with `r` chosen adaptively — the smallest radius whose candidate
   * count reaches `max(k, minCandidates)` (single cheap histogram pass
   * over the signature column, ≤ numBits+1 rows to the driver). This
   * fixes the single-bucket recall cliff (a neighbor differing in one
   * sign bit was invisible) and guarantees ≥ k candidates whenever the
   * table has ≥ k rows.
   *
   * Scale: the signature scan is a narrow projection; the histogram is a
   * map-side-combined 65-row aggregate; the final exact ranking is
   * scan + TakeOrderedAndProject over the radius-filtered subset. For
   * strongly clustered corpora small radii stop early; for unstructured
   * data the adaptive radius degrades gracefully toward a full scan
   * (correct, just less pruned) instead of silently returning low-recall
   * results. IVF ([[ivfTopK]]) remains the sanctioned approximate path
   * when the corpus has cluster structure.
   */
  def lshTopK(df: DataFrame, idCol: String, embCol: String, query: Array[Float], k: Int,
      numBits: Int = 16, seed: Long = 42L, minCandidates: Int = 0): DataFrame = {
    val dim = query.length
    val qsig = querySignature(query, numBits, seed)
    val sigged = df.withColumn("__sig", signBits(col(embCol), numBits, dim, seed))
      .withColumn("__ham", graft.functions.hamming64(col("__sig"), lit(qsig)))
    val target = math.max(k, minCandidates).toLong
    val hist = sigged.groupBy("__ham").count().collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1))).sortBy(_._1)
    var cum = 0L
    var radius = numBits.toLong
    val it = hist.iterator
    var found = false
    while (it.hasNext && !found) {
      val (h, n) = it.next()
      cum += n
      if (cum >= target) { radius = h; found = true }
    }
    topK(sigged.where(col("__ham") <= radius), idCol, embCol, query, k)
      .select(col(idCol), col("cosine"))
  }

  /**
   * IVF (inverted-file) ANN index: KMeans partitions the vector space
   * into `nlist` cells; a query probes only its `nprobe` nearest cells
   * and ranks exactly inside them. The scale path when sign-bit LSH
   * recall is insufficient: cells adapt to the data distribution.
   */
  final case class IvfIndex(assigned: DataFrame, centroids: Array[(Int, Array[Double])])

  /** Build the inverted file. Centroids train DRIVER-SIDE on a bounded
    * collected sample ([[LocalKMeans]] — the faiss recipe: k-means
    * quality needs thousands of vectors, not billions, so the driver
    * collects ≤`trainSample` vectors once and iterates locally instead
    * of paying a distributed fit's per-iteration job scheduling);
    * every vector is then assigned to its `assignReplicas` nearest cells
    * in ONE distributed pass against the broadcast centroid array
    * (nlist × dim doubles). Multi-assignment (replicas > 1) trades
    * index size for recall: a vector sitting on a cell boundary is
    * findable from either side. Measured caveat: it only helps when
    * missed neighbors actually straddle boundaries — on the UNCLUSTERED
    * embeddings fixture, replicas=2 leaves sf0.1 recall@10 at 0.8
    * (the missed vectors' second cells also rank far from the query);
    * genuine cluster structure is what makes any IVF variant effective. */
  def ivfIndex(df: DataFrame, idCol: String, embCol: String,
      nlist: Int = 16, seed: Long = 42L, trainSample: Int = 20000,
      assignReplicas: Int = 1): IvfIndex = {
    require(assignReplicas >= 1 && assignReplicas <= nlist)
    val sample = trainingSample(df, idCol, embCol, trainSample)
    val cents = LocalKMeans.fit(sample, nlist, seed)
    val centroids = cents.zipWithIndex.map { case (c, i) => (i, c) }
    val bc = df.sparkSession.sparkContext.broadcast(cents)
    val k = assignReplicas
    import df.sparkSession.implicits._
    // null embeddings are unindexable — drop them here rather than NPE
    // in the assignment loop (query paths null-guard cosine the same way)
    val assigned = df
      .where(col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(embCol).cast("array<double>").as("emb"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.flatMap { case (id, emb) =>
          if (k == 1) {
            // common case: single nearest cell, no sort allocation
            var bi = 0; var bd = Double.MaxValue; var ci = 0
            while (ci < cs.length) {
              val c = cs(ci)
              var d = 0.0
              val n = math.min(c.length, emb.length)
              var j = 0
              while (j < n) { val diff = c(j) - emb(j); d += diff * diff; j += 1 }
              if (d < bd) { bd = d; bi = ci }
              ci += 1
            }
            Iterator.single((id, emb, bi))
          } else {
            val dists = cs.indices.map { ci =>
              val c = cs(ci)
              var d = 0.0
              val n = math.min(c.length, emb.length)
              var j = 0
              while (j < n) { val diff = c(j) - emb(j); d += diff * diff; j += 1 }
              (ci, d)
            }
            dists.sortBy(_._2).take(k).map { case (ci, _) => (id, emb, ci) }.iterator
          }
        }
      }.toDF("id", "emb", "cell")
    IvfIndex(assigned, centroids)
  }

  def ivfTopK(index: IvfIndex, query: Array[Float], k: Int, nprobe: Int = 4): DataFrame =
    ivfTopK(index, query.map(_.toDouble), k, nprobe)

  /** Double-precision query variant: a COMPUTED query vector (e.g. a
    * centroid or a derived fixture vector) must rank at full precision —
    * truncating it to float32 would perturb cosines by ~1e-7, enough to
    * flip near-tied neighbors at the top-k boundary. */
  def ivfTopK(index: IvfIndex, query: Array[Double], k: Int, nprobe: Int): DataFrame = {
    // nearest cells by centroid distance (driver-side: nlist is small)
    val cells = index.centroids.map { case (i, c) =>
      var d = 0.0
      val n = math.min(c.length, query.length)
      var j = 0
      while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val q = array(query.map(lit): _*)
    index.assigned
      .where(col("cell").isin(cells.toSeq: _*))
      .select(col("id"), cosine_sim(col("emb"), q).as("cosine"))
      .where(col("cosine").isNotNull)
      .dropDuplicates("id") // multi-assigned vectors appear in 2+ probed cells
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /**
   * k-NN JOIN: for EVERY query vector in a (small) query set, the top-k
   * corpus neighbors by cosine — batch similarity search, the retrieval
   * shape of augmentation/labeling pipelines (one `topK` call per query
   * would launch |queries| jobs; this is ONE plan).
   *
   * Scale: queries broadcast (the fan-out is |queries|× the corpus
   * scan, inherent to brute-force k-NN join); the per-query top-k is a
   * window partitioned BY QUERY — as many partitions as queries, never
   * a global sort. When the corpus carries an IVF index, prune with
   * [[ivfTopK]] per query or restrict the fan-out by joining on cell
   * instead of broadcasting — brute force is the exact baseline the
   * oracle checks.
   */
  def knnJoin(corpus: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, qIdCol: String, qEmbCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col(qIdCol).as("query_id"), col(qEmbCol).as("__qemb")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("id"))
    corpus.select(col(idCol).as("id"), col(embCol).as("__cemb"))
      .crossJoin(q)
      .select(col("query_id"), col("id"),
        cosine_sim(col("__cemb"), col("__qemb")).as("cosine"))
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * Contrastive hard-negative mining: for each anchor, the k most
   * cosine-similar corpus vectors carrying a DIFFERENT label — the
   * negatives hardest to distinguish from the anchor, the mining step
   * of contrastive training (ANCE, Xiong et al. ICLR 2021; the
   * in-batch-negatives upgrade SimCSE-style pipelines use). Same
   * broadcast-fan-out contract as [[knnJoin]] (anchors are the bounded
   * working set of one mining round; corpus side streams); the label
   * mismatch filters BEFORE scoring, so same-label neighbors never
   * consume negative slots and their cosines are never computed. For
   * corpus-scale anchor sets, compose the same filter with
   * [[knnJoinIvf]]'s cell-pruned equi-join instead.
   */
  def hardNegatives(corpus: DataFrame, idCol: String, embCol: String,
      labelCol: String, anchors: DataFrame, aIdCol: String, aEmbCol: String,
      aLabelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = broadcast(anchors.select(col(aIdCol).as("anchor_id"),
      col(aEmbCol).as("__aemb"), col(aLabelCol).as("__albl")))
    val w = Window.partitionBy("anchor_id").orderBy(col("cosine").desc, col("id"))
    corpus.select(col(idCol).as("id"), col(embCol).as("__cemb"),
      col(labelCol).as("__clbl"))
      .crossJoin(a)
      .where(col("__clbl") =!= col("__albl"))
      .select(col("anchor_id"), col("id"), col("__clbl").as("neg_label"),
        cosine_sim(col("__cemb"), col("__aemb")).as("cosine"))
      .where(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /**
   * IVF-PRUNED k-NN join: the scale path for LARGE query sets, where
   * [[knnJoin]]'s broadcast fan-out (|queries| × corpus cosines) stops
   * being affordable. Each query maps to its `nprobe` nearest IVF cells
   * (one narrow pass against the broadcast centroid array — the same
   * shape as index assignment), then queries meet corpus vectors by an
   * EQUI-JOIN ON CELL, so each corpus row is scored only against the
   * queries probing its cell: expected work is |queries| × (nprobe /
   * nlist) × corpus instead of |queries| × corpus, and the plan is a
   * hash join keyed on cell — never a cartesian. The per-query top-k is
   * the bounded-heap aggregate ([[GroupTopK]]): the shuffle after
   * scoring carries at most k (cosine, id) pairs per (query ×
   * map-split), not the candidate set.
   *
   * Same recall contract as every IVF path: exact within the probed
   * cells, so on clustered corpora (the case IVF exists for) small
   * nprobe reproduces the brute-force result; [[knnJoin]] remains the
   * exact baseline.
   *
   * Output matches [[knnJoin]]: (query_id, id, cosine, rank).
   */
  def knnJoinIvf(index: IvfIndex, queries: DataFrame, qIdCol: String,
      qEmbCol: String, k: Int, nprobe: Int = 4): DataFrame = {
    // nprobe nearest cells per query as a plain projection (no typed
    // Dataset: the query-id column keeps its source type — string ids
    // must survive, matching knnJoin's contract; only CORPUS ids carry
    // the index's long contract); native centroid-argmin expression,
    // centroids inline in the plan
    val probes = queries
      .select(col(qIdCol).as("query_id"),
        col(qEmbCol).cast("array<double>").as("__qemb"))
      .withColumn("cell",
        explode(graft.functions.nearest_centroids(col("__qemb"), index.centroids, nprobe)))
    val scored = index.assigned.join(probes, "cell")
      .select(col("query_id"), col("id"),
        cosine_sim(col("emb"), col("__qemb")).as("cosine"))
      .where(col("cosine").isNotNull)
      // multi-assigned vectors (assignReplicas > 1) can meet the same
      // query in 2+ probed cells; the pair's cosine is identical, so
      // distinct-by-pair keeps the heap input duplicate-free
      .dropDuplicates("query_id", "id")
    GroupTopK.topKPerGroup(scored, Seq("query_id"), "cosine", "id", k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }

  /**
   * Assign every vector to its nearest centroid by cosine similarity —
   * the semantic-sharding / cluster-labeling pass of a corpus pipeline
   * (and the E-step any distributed k-means iterates). Centroids arrive
   * as a (small) DataFrame so they can come from anywhere: a trained
   * model, a fixed probe set, or [[ivfIndex]]'s output.
   *
   * Scale: centroids broadcast (explicitly — the per-vector fan-out is
   * |centroids|×, never a shuffle of the corpus); the argmax collapses
   * the fan-out with a partial+final max-of-struct aggregate keyed on
   * the vector id (SortAggregate — struct buffers aren't
   * hash-aggregable — but the partial phase still combines map-side,
   * so the shuffle carries one row per vector), not a window sort.
   * Ties break to the lower centroid id via the (cosine, −id) struct
   * ordering.
   */
  def assignNearestCentroid(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, centIdCol: String, centEmbCol: String): DataFrame = {
    val cents = broadcast(centroids.select(
      col(centIdCol).as("__cid"), col(centEmbCol).as("__cemb")))
    df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .crossJoin(cents)
      .select(col("id"),
        struct(cosine_sim(col("emb"), col("__cemb")).as("cosine"),
          (-col("__cid")).as("neg_cid")).as("__s"))
      .groupBy("id")
      .agg(max(col("__s")).as("__best"))
      .select(col("id"), (-col("__best.neg_cid")).as("cluster"),
        col("__best.cosine").as("cosine"))
  }

  /**
   * One distributed k-means update: the broadcast E-step of
   * [[assignNearestCentroid]] followed by the M-step mean, emitted in
   * LONG FORM — (cluster, pos, value, n_members), the new centroid's
   * component at each dimension plus the cluster size. Long form keeps
   * the M-step a plain grouped aggregate (and directly comparable to a
   * SQL replica); [[kmeansNewCentroids]] reassembles arrays for the
   * next iteration. This is the semantic-sharding refinement loop a
   * corpus pipeline runs when probe/sampled centroids need tightening
   * on the full distribution — the distributed complement of the
   * driver-side [[LocalKMeans]] fit.
   *
   * Scale: the E-step is the broadcast argmax (one corpus pass, shuffle
   * of one row per vector); the assignment joins back to the vectors by
   * id (the semanticNearDupPairs shape); the M-step posexplode emits
   * corpus×dim rows but partial aggregation compresses each map split
   * to ≤ clusters×dim partial sums, so the shuffle carries
   * clusters × dim × splits rows — index-sized, not corpus-sized.
   */
  def kmeansStep(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, centIdCol: String, centEmbCol: String): DataFrame = {
    val assign = assignNearestCentroid(df, idCol, embCol, centroids, centIdCol, centEmbCol)
      .select(col("id"), col("cluster"))
    df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .join(assign, "id")
      .select(col("cluster"), posexplode(col("emb")).as(Seq("pos", "value")))
      .groupBy("cluster", "pos")
      .agg(round(avg(col("value")), 6).as("value"), count(lit(1)).as("n_members"))
  }

  /** The [[kmeansStep]] output reassembled as (cluster, emb) centroid
    * rows for the next E-step. */
  def kmeansNewCentroids(step: DataFrame): DataFrame =
    step.groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("value")))),
        s => s.getField("value")).as("emb"))

  /** `iterations` rounds of [[kmeansStep]] + [[kmeansNewCentroids]],
    * returning the refined (cluster, emb) centroids. Each round
    * localCheckpoints the (clusters-sized) centroid frame — without the
    * truncation every iteration's plan would nest the previous one's
    * E-step join and aggregate, the same lineage blow-up the
    * duplicate-groups CC loop guards against. */
  def kmeansIterate(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, centIdCol: String, centEmbCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 1, "iterations must be positive")
    var cents = centroids.select(col(centIdCol).cast("long").as("cluster"),
      col(centEmbCol).as("emb"))
    var i = 0
    while (i < iterations) {
      cents = kmeansNewCentroids(
        kmeansStep(df, idCol, embCol, cents, "cluster", "emb"))
        .localCheckpoint()
      i += 1
    }
    cents
  }

  /**
   * Embedding-cosine near-duplicate pairs, BANDED: a 64-bit sign
   * signature is split into `chunks` bands; any pair agreeing exactly on
   * at least one band is a candidate, then exact cosine verifies inside
   * candidate pairs only (same pigeonhole shape as SimHash banding —
   * a single full-signature match has a recall cliff: at cosine 0.95 a
   * pair disagrees on ~10% of sign bits, so requiring all 64 to match
   * misses almost everything, while ≥1-of-8-bands agreement catches it
   * with P[miss] ≈ (1-(1-p)^8)^8 < 0.3%).
   *
   * Scale: one narrow signature projection, one shuffle on (band,
   * value), pair generation inside capped buckets only — never
   * all-pairs. Bucket rows carry (id, signature) ONLY — 16 bytes per
   * member, so a hot bucket at maxBucketSize=10000 aggregates ~160 KB,
   * not ~30 MB of 384-d vectors — and candidate pairs PRESCREEN on
   * full-signature Hamming distance before any vector is read (chance
   * single-band collisions are ~10× the true near-miss set; see
   * cosineNearDupCore); the exact-cosine verify then semi-joins
   * embeddings back by id for surviving candidate members alone — the
   * same verify shape as minhashNearDuplicates. Expected raw candidate
   * volume ≈ chunks · N² / 2^bitsPerChunk for unstructured data;
   * near-duplicate clusters concentrate in shared buckets.
   */
  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95, dim: Int = 64, chunks: Int = 8,
      seed: Long = 42L, maxBucketSize: Int = 10000): DataFrame =
    // Shared intermediates (candidate pairs, member vectors) materialize
    // via LAZY localCheckpoint: blocks are owned by the RDD, not the
    // session CacheManager, so they release when the result frame is
    // garbage-collected — a handle-less call can never leak session
    // caches (the BENCH_r04 failure mode). Tradeoff: lineage is
    // truncated, so a lost executor fails the job instead of
    // recomputing; long-lived production pipelines should prefer
    // [[cosineNearDupPairsWithCleanup]] (lineage-preserving persist +
    // explicit release).
    cosineNearDupCore(df, idCol, embCol, threshold, dim, chunks,
      seed, maxBucketSize, d => d.localCheckpoint(eager = false))._1

  /** [[cosineNearDupPairs]] plus a cleanup handle for the internal
    * candidate-pair cache (the [[graft.operators.Dedup.minhashNearDuplicatesWithCleanup]]
    * contract: callers with a terminal action release the cache once the
    * returned frame has been materialized). */
  def cosineNearDupPairsWithCleanup(df: DataFrame, idCol: String, embCol: String,
      threshold: Double = 0.95, dim: Int = 64, chunks: Int = 8,
      seed: Long = 42L, maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel
    cosineNearDupCore(df, idCol, embCol, threshold, dim, chunks, seed,
      maxBucketSize, d => d.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Shared banded-signature pipeline; `share` decides how the two
    * reused candidate-sized frames materialize (persist vs lazy
    * localCheckpoint — see the two public entry points). The returned
    * cleanup handle unpersists whatever `share` cached (a no-op for the
    * checkpoint strategy: RDD blocks are GC-managed).
    *
    * Bucket members carry (id, 64-bit signature) — 16 bytes, still no
    * vectors (a 10k-cap hot bucket aggregates ~160 KB) — so pair
    * generation can PRESCREEN on full-signature Hamming distance before
    * any vector is read: a band match is 8 agreeing bits, but a true
    * near-duplicate at cosine t agrees on ~64·(1−acos(t)/π) of all 64,
    * so pairs beyond `hamCut` (the expected Hamming at the threshold
    * plus a 12-bit ≈ 5σ slack — far stricter than the banding's own
    * ~0.3% miss rate) are chance band collisions, not candidates. On
    * the sf0.1 fixture this cuts candidate pairs ~10× (72.6k → the
    * near-dup-and-near-miss set), which shrinks every downstream stage:
    * the member semi-join, both verify joins, and the shared caches. */
  private def cosineNearDupCore(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, dim: Int, chunks: Int, seed: Long,
      maxBucketSize: Int, share: DataFrame => DataFrame): (DataFrame, () => Unit) = {
    require(chunks >= 1 && chunks <= 64 && 64 % chunks == 0, "chunks must divide 64")
    val bits = 64 / chunks
    val hamCut = math.min(64,
      math.ceil(64.0 * math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi).toInt + 12)
    val sig = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("sig", signBits(col("emb"), 64, dim, seed))
      .select(col("id"), col("sig")) // ids + 8-byte signatures; vectors stay behind
    val bandStructs = (0 until chunks).map { i =>
      struct(lit(i).as("band"),
        shiftrightunsigned(col("sig"), i * bits).bitwiseAND(lit((1L << bits) - 1)).as("value"))
    }
    val banded = sig.select(struct(col("id"), col("sig")).as("m"),
        explode(array(bandStructs: _*)).as("c"))
      .select(col("m"), col("c.band"), col("c.value"))
    val buckets = banded.groupBy("band", "value")
      .agg(collect_list(col("m")).as("ms"), count(lit(1)).as("n"))
      .where(col("n") > 1 && col("n") <= maxBucketSize)
    // candidate pairs are shared (tiny: hamming-prescreened bucket
    // coincidences) so the member id set below doesn't re-run the
    // signature pipeline
    val pairs = share(buckets
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.id") < col("b.id") &&
        graft.functions.hamming64(col("a.sig"), col("b.sig")) <= hamCut)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct())
    // exact verify reads float vectors for CANDIDATE MEMBERS ONLY; the
    // member frame is shared too (candidate-sized, like pairs) so the
    // two verify joins don't each re-scan the corpus for it
    val candIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val emb = share(df.join(candIds, df(idCol) === candIds("id"), "left_semi")
      .select(col(idCol).as("id"), col(embCol).as("emb")))
    val verified = pairs
      .join(emb.withColumnRenamed("id", "id_a").withColumnRenamed("emb", "__ea"), "id_a")
      .join(emb.withColumnRenamed("id", "id_b").withColumnRenamed("emb", "__eb"), "id_b")
      .select(col("id_a"), col("id_b"), cosine_sim(col("__ea"), col("__eb")).as("cosine"))
      .where(col("cosine") >= threshold)
    (verified, () => {
      pairs.unpersist(blocking = false)
      emb.unpersist(blocking = false)
      ()
    })
  }

  /**
   * SemDeDup-style semantic near-duplicate pairs (Abbas et al., 2023,
   * "SemDeDup: Data-efficient learning at web-scale through semantic
   * deduplication"): assign every vector to its nearest centroid, then
   * compare pairs WITHIN each cluster only — the cluster is the bucket,
   * so pair generation is cluster-local by definition (that scoping IS
   * the SemDeDup contract, not an approximation of a global pair scan).
   *
   * Scale: centroid assignment is the broadcast argmax of
   * [[assignNearestCentroid]]; the self-join shuffles the corpus once on
   * the cluster id; `maxClusterSize` drops (and thereby bounds)
   * degenerate clusters the same way the LSH operators cap buckets — at
   * production scale the centroid count grows with the corpus
   * (k ∝ √n or n/target-cluster-size), keeping clusters small.
   *
   * Output: (id_a, id_b, cluster, cosine) with id_a < id_b and
   * cosine ≥ `threshold`.
   */
  def semanticNearDupPairs(df: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame, centIdCol: String, centEmbCol: String,
      threshold: Double = 0.95, maxClusterSize: Int = 100000): DataFrame = {
    val assign = assignNearestCentroid(df, idCol, embCol, centroids, centIdCol, centEmbCol)
      .select(col("id"), col("cluster"))
    val v = df.select(col(idCol).as("id"), col(embCol).as("__emb"))
      .join(assign, "id")
    val okClusters = v.groupBy("cluster").agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1 && col("__n") <= maxClusterSize)
      .select("cluster")
    val member = v.join(okClusters, "cluster")
    member.select(col("cluster"), col("id").as("id_a"), col("__emb").as("__ea"))
      .join(member.select(col("cluster"), col("id").as("id_b"), col("__emb").as("__eb")), "cluster")
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine_sim(col("__ea"), col("__eb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cluster", "cosine")
  }
}
