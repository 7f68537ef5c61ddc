package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.interop.{toColumn => column, toExpression => expression}

/**
 * Product quantization for billion-scale similarity search (Jégou et
 * al., TPAMI 2011 — the faiss `PQ` index family): embeddings split into
 * `m` contiguous subvectors, each quantized to one of `k` learned
 * centroids, so a vector stores as m·log2(k) bits (64-dim float32 at
 * m=8, k=16 → 4 bytes, a 64× compression) and query ranking reads ONLY
 * the codes via an asymmetric-distance table (m lookups per vector).
 *
 * Division of labor at 100 TB (same rationale as ivfIndex):
 *  - codebook FIT is driver-side deterministic k-means per subspace on a
 *    bounded sample (codebook quality needs thousands of points, not the
 *    corpus; a distributed fit pays per-iteration scheduling for the
 *    same centroids);
 *  - ENCODE is one narrow distributed pass (PqEncode native expression,
 *    codebooks serialized inside the plan);
 *  - SEARCH is a scan of the CODES column (int array — at scale a
 *    parquet column ~100× narrower than the embeddings) + ADC scoring +
 *    TakeOrderedAndProject for the candidate set, then an exact re-rank
 *    that touches float vectors for candidates only.
 */
object ProductQuantization {

  final case class PqModel(m: Int, k: Int, subDim: Int,
      codebooks: Array[Array[Array[Double]]])

  /** Fit per-subspace codebooks on a driver-collected sample — bounded,
    * deterministic, and UNBIASED: rows are drawn by smallest
    * `xxhash64(id)` ([[Similarity.trainingSample]]), not head-of-table,
    * so at 100 TB with time/source-ordered ingest the codebooks train
    * across the whole corpus instead of one shard of one source.
    * Vectors are L2-NORMALIZED before slicing: the search contract is
    * cosine, and on unit vectors ADC's squared L2 is 2−2·cos, so codes
    * trained and ranked in normalized space order candidates by cosine. */
  def fit(df: DataFrame, idCol: String, embCol: String, m: Int = 8, k: Int = 16,
      seed: Long = 42L, maxSample: Int = 20000): PqModel = {
    val sample = Similarity.trainingSample(df, idCol, embCol, maxSample)
      .map(normalized)
    require(sample.nonEmpty, "pq fit needs a non-empty sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      Similarity.LocalKMeans.fit(sub, k, seed + s)
    }
    PqModel(m, k, subDim, codebooks)
  }

  /** Probe-codebook model for oracle-checkable tests: codebook c of
    * subspace s is the matching slice of the vector with id = c — no
    * training, fully SQL-replicable (the x_cluster_assign trick). */
  def probeModel(df: DataFrame, idCol: String, embCol: String, m: Int, k: Int): PqModel = {
    val rows = df.select(col(idCol), col(embCol))
      .where(col(idCol) < k).orderBy(col(idCol))
      .collect().map(_.getSeq[Double](1).toArray)
    require(rows.length == k, s"probe model needs ids 0..${k - 1}")
    val dim = rows(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = Array.tabulate(m) { s =>
      rows.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
    }
    PqModel(m, k, subDim, codebooks)
  }

  private def normalized(v: Array[Double]): Array[Double] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { n2 += v(i) * v(i); i += 1 }
    if (n2 <= 0) v
    else {
      val inv = 1.0 / math.sqrt(n2)
      v.map(_ * inv)
    }
  }

  /** Distributed encode: one narrow projection adding `array<int>` codes.
    * `normalize` must match how the model was fit (true for [[fit]],
    * false for [[probeModel]]). */
  def encode(df: DataFrame, idCol: String, embCol: String, model: PqModel,
      normalize: Boolean = false): DataFrame =
    df.select(col(idCol),
      column(graft.functions.PqEncode(expression(col(embCol)), model.codebooks, normalize))
        .as("codes"))

  /** Long-form encode (one row per subspace) — the oracle-comparable
    * shape. */
  def encodeLong(df: DataFrame, idCol: String, embCol: String, model: PqModel): DataFrame =
    encode(df, idCol, embCol, model)
      .select(col(idCol), posexplode(col("codes")).as(Seq("subspace", "code")))

  /** The query's ADC table: squared L2 from each query subvector to each
    * centroid, flattened as table(s*k + c). */
  private def adcTable(query: Array[Double], model: PqModel): Array[Double] = {
    val t = new Array[Double](model.m * model.k)
    var s = 0
    while (s < model.m) {
      var c = 0
      while (c < model.k) {
        var d2 = 0.0
        var d = 0
        while (d < model.subDim) {
          val diff = query(s * model.subDim + d) - model.codebooks(s)(c)(d)
          d2 += diff * diff
          d += 1
        }
        t(s * model.k + c) = d2
        c += 1
      }
      s += 1
    }
    t
  }

  /**
   * ADC top-k with exact re-rank: rank ALL vectors by m-table-lookup
   * approximate distance (codes only), keep `candidates` (default 5·k),
   * then exact-cosine re-rank just those against the float vectors.
   * Plan: codes scan → ADC project → TakeOrderedAndProject (candidates)
   * → broadcast-semi-join back to the float column for ≤ candidates
   * rows → TakeOrderedAndProject (k). No shuffle of the corpus.
   */
  def adcTopK(df: DataFrame, idCol: String, embCol: String, model: PqModel,
      query: Array[Double], k: Int, candidates: Int = 0): DataFrame =
    searchEncoded(encode(df, idCol, embCol, model, normalize = true),
      df, idCol, embCol, model, query, k, candidates)

  /**
   * IVF-PQ index: the billion-scale serving composition (faiss
   * `IVFxx,PQyy`). `codes` is the NARROW persisted frame — (id, cell,
   * array<int> codes), ~8 bytes of code per vector instead of the
   * 512-byte float row — encoded ONCE at build time; float vectors stay
   * only in the caller's base frame and are read at query time for the
   * candidate re-rank alone. Write `codes` to parquet partitioned by
   * `cell` and each query's probed-cell filter becomes partition
   * pruning on a codes-only scan.
   */
  /** `replicas` records the build's `assignReplicas`: with single
    * assignment (the default) a vector appears in exactly one cell, so
    * query paths can skip the candidate dedup — at force scale that
    * dedup is a full shuffle of the scored frame (measured 2.2 GB /
    * 64M rows for 1k queries against a 1M-row index, ProbeForceScale)
    * for zero semantic effect. */
  final case class IvfPqIndex(codes: DataFrame,
      centroids: Array[(Int, Array[Double])], model: PqModel,
      replicas: Int = 1)

  /** Build the IVF-PQ index: IVF cell assignment ([[Similarity.ivfIndex]])
    * composed with one distributed [[encode]] pass — codes are computed
    * at BUILD time, never at query time. */
  def ivfPqIndex(df: DataFrame, idCol: String, embCol: String, model: PqModel,
      nlist: Int = 16, seed: Long = 42L, trainSample: Int = 20000,
      assignReplicas: Int = 1): IvfPqIndex = {
    val ivf = Similarity.ivfIndex(df, idCol, embCol, nlist, seed, trainSample, assignReplicas)
    val codes = ivf.assigned.select(col("id"), col("cell"),
      column(graft.functions.PqEncode(expression(col("emb")), model.codebooks,
        normalize = true)).as("codes"))
    IvfPqIndex(codes, ivf.centroids, model, assignReplicas)
  }

  /**
   * IVF-PQ top-k: IVF cell pruning cuts the scanned fraction to
   * ~nprobe/nlist, and within the probed cells ranking reads the STORED
   * PQ codes only (ADC lookups — no float vector is touched until the
   * exact cosine re-rank of the candidate set, via [[searchEncoded]]'s
   * semi-join against the base frame `df`). At 10^10 vectors the
   * per-query work drops from a corpus scan of 512-byte rows to
   * (nprobe/nlist) × 8-byte code rows + a candidate-sized float read.
   */
  def ivfPqTopK(index: IvfPqIndex, df: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int, nprobe: Int = 4, candidates: Int = 0): DataFrame = {
    val nCand = if (candidates > 0) candidates else math.max(5 * k, 50)
    val cells = index.centroids.map { case (i, c) =>
      var d = 0.0
      val n = math.min(c.length, query.length)
      var j = 0
      while (j < n) { val diff = c(j) - query(j); d += diff * diff; j += 1 }
      (i, d)
    }.sortBy(_._2).take(nprobe).map(_._1)
    val inCells = index.codes.where(col("cell").isin(cells.toSeq: _*))
    // multi-assigned vectors appear in 2+ probed cells; single-assigned
    // indexes skip the dedup shuffle entirely
    val probed = (if (index.replicas > 1) inCells.dropDuplicates("id") else inCells)
      .withColumnRenamed("id", idCol)
    searchEncoded(probed, df, idCol, embCol, index.model, query, k, nCand)
  }

  /**
   * Encode-once / search-many: rank a PRE-ENCODED codes frame (the
   * persisted index a production deployment stores — [[encode]] run once
   * at ingest) so each query reads only the codes column; [[adcTopK]] is
   * the convenience wrapper that encodes inline for one-shot use. The
   * exact re-rank joins back to the float frame for candidates only.
   */
  /**
   * Persist an IVF-PQ index: codes parquet PARTITIONED BY CELL (each
   * query's probed-cell filter becomes directory-level partition
   * pruning — the scan touches nprobe/nlist of the files, no row-group
   * stats needed) plus a JSON sidecar with centroids and codebooks
   * (nlist×dim + m×k×subDim doubles — kilobytes). This completes the
   * encode-once/search-many contract as an API: build and [[writeIndex]]
   * at ingest, [[readIndex]] + [[ivfPqTopK]] per query.
   */
  def writeIndex(index: IvfPqIndex, path: String): Unit = {
    index.codes.write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    def arr2(a: Array[Double]): String = a.mkString("[", ",", "]")
    val centroidsJson = index.centroids.sortBy(_._1)
      .map { case (i, c) => s"""{"cell": $i, "center": ${arr2(c)}}""" }
      .mkString("[", ",", "]")
    val m = index.model
    val codebooksJson = m.codebooks.map(cb => cb.map(arr2).mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val json = s"""{"m": ${m.m}, "k": ${m.k}, "subDim": ${m.subDim}, """ +
      s""""replicas": ${index.replicas}, """ +
      s""""centroids": $centroidsJson, "codebooks": $codebooksJson}"""
    // the sidecar rides the SAME filesystem as the codes parquet (a
    // production index path is hdfs/s3a, not the driver's local disk)
    val spark = index.codes.sparkSession
    val sidecar = new org.apache.hadoop.fs.Path(path, "index.json")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val outStream = fs.create(sidecar, true)
    try outStream.write(json.getBytes("UTF-8")) finally outStream.close()
  }

  def readIndex(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqIndex = {
    val codes = spark.read.parquet(s"$path/codes")
      .select(col("id"), col("cell").cast("int").as("cell"), col("codes"))
    val sidecar = new org.apache.hadoop.fs.Path(path, "index.json")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inStream = fs.open(sidecar)
    val text = try new String(inStream.readAllBytes(), "UTF-8") finally inStream.close()
    // the sidecar is engine-written (no foreign input) — parse with a
    // small recursive-descent reader over the fixed shape
    val parsed = ujsonLite(text)
    // older sidecars carry no replicas field → conservative multi-
    // assignment reading (dedup stays on)
    val replicas = """"replicas":\s*(\d+)""".r.findFirstMatchIn(text)
      .map(_.group(1).toInt).getOrElse(2)
    IvfPqIndex(codes, parsed._1, parsed._2, replicas)
  }

  final case class CompactionStats(filesBefore: Long, filesAfter: Long,
      rowsBefore: Long, rowsAfter: Long)

  /**
   * Compact a persisted IVF-PQ index in place — the maintenance step of
   * the index lifecycle (build [[writeIndex]] → stream-append
   * [[graft.streaming.Streams.encodeStream]] → COMPACT → drift-detect →
   * refit): streaming micro-batches leave one small file per cell per
   * batch, and re-ingested ids (updated embeddings) appear twice —
   * possibly under DIFFERENT cells when the new vector lands nearer
   * another centroid, so dedup must be global, not per-partition.
   *
   * Latest-file-wins dedup keys on the hidden `_metadata` columns
   * (modification time, path) — no schema change to the streamed rows.
   * One shuffle of (id, cell, codes) rows (~20 B each; the codes column
   * IS the index, there is no wide payload), then a per-cell rewrite:
   * `filesPerCell` output files per cell partition replacing the
   * accumulated micro-batch files. The swap is rename-based
   * (codes → codes.old, compact → codes, drop codes.old) so a reader
   * never sees a half-written directory.
   */
  def compactIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      filesPerCell: Int = 1): CompactionStats = {
    val codesPath = s"$path/codes"
    val raw = spark.read.parquet(codesPath).select(
      col("id"), col("cell").cast("int").as("cell"), col("codes"),
      col("_metadata.file_modification_time").as("__mtime"),
      col("_metadata.file_path").as("__file"))
    val before = raw.agg(count(lit(1)), countDistinct(col("__file"))).head()
    val deduped = raw
      .groupBy("id")
      .agg(max_by(struct(col("cell"), col("codes")),
        struct(col("__mtime"), col("__file"))).as("w"))
      .select(col("id"), col("w.cell").as("cell"), col("w.codes").as("codes"))
    val tmp = s"$path/codes.compact"
    deduped
      .repartition(col("cell"), pmod(xxhash64(col("id")), lit(filesPerCell)))
      .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(codesPath)
    val old = new org.apache.hadoop.fs.Path(s"$path/codes.old")
    fs.delete(old, true)
    require(fs.rename(cur, old) && fs.rename(new org.apache.hadoop.fs.Path(tmp), cur),
      s"compaction swap failed under $path")
    fs.delete(old, true)
    val after = spark.read.parquet(codesPath)
      .agg(count(lit(1)), countDistinct(col("_metadata.file_path"))).head()
    CompactionStats(before.getLong(1), after.getLong(1), before.getLong(0), after.getLong(0))
  }

  /** Minimal parser for the [[writeIndex]] sidecar's fixed JSON shape. */
  private def ujsonLite(text: String): (Array[(Int, Array[Double])], PqModel) = {
    def intField(name: String): Int =
      s""""$name":\\s*(\\d+)""".r.findFirstMatchIn(text).get.group(1).toInt
    val m = intField("m"); val k = intField("k"); val subDim = intField("subDim")
    def doubles(s: String): Array[Double] =
      s.split(',').filter(_.nonEmpty).map(_.trim.toDouble)
    // centroids: [{"cell": i, "center": [..]}, ...]
    val centRe = """\{"cell":\s*(\d+),\s*"center":\s*\[([^\]]*)\]\}""".r
    val centroids = centRe.findAllMatchIn(text)
      .map(mm => (mm.group(1).toInt, doubles(mm.group(2)))).toArray
    // codebooks: [[[..],[..]], ...] — m outer, k inner, subDim doubles
    val cbStart = text.indexOf("\"codebooks\":")
    val cbText = text.substring(cbStart)
    val leafRe = """\[([^\[\]]*)\]""".r
    val leaves = leafRe.findAllMatchIn(cbText).map(mm => doubles(mm.group(1))).toArray
    require(leaves.length == m * k,
      s"codebook sidecar carries ${leaves.length} centroids, expected ${m * k}")
    val codebooks = Array.tabulate(m)(s => Array.tabulate(k)(c => leaves(s * k + c)))
    (centroids, PqModel(m, k, subDim, codebooks))
  }

  /**
   * Batch k-NN join against a (persisted) IVF-PQ index — the 100 TB
   * serving shape for LARGE query sets ([[ivfPqTopK]] serves one vector;
   * launching it per query would be |queries| driver jobs):
   *
   *  1. each query row computes its own ADC table ONCE
   *     ([[graft.functions.PqAdcTable]] — m·k·subDim work per query,
   *     normalized to match the build-time encode) and its `nprobe`
   *     nearest cells (broadcast-free: centroids ship inline, one
   *     narrow projection);
   *  2. queries meet STORED codes by an equi-join on cell — a hash
   *     join, never a cartesian; expected pairs =
   *     |queries| × (nprobe/nlist) × corpus, each scored in m table
   *     lookups ([[graft.functions.PqAdcLookup]]) off the codes column
   *     alone (over a [[readIndex]] frame partitioned by cell the
   *     probed-cell filter prunes parquet partitions; no float column
   *     is read);
   *  3. per-query candidate cut (`candidates`, default 5·k) via the
   *     bounded-heap aggregate — the post-scoring shuffle carries at
   *     most `candidates` (adc, id) pairs per query per map split;
   *  4. exact cosine re-rank reads float vectors for candidate rows
   *     only (hash join on id against the base frame), then the
   *     bounded heap again for the final k.
   *
   * Output matches [[Similarity.knnJoin]]: (query_id, id, cosine, rank).
   * Recall contract: exact within the probed cells given enough
   * `candidates` (the ADC cut is the only approximation beyond IVF
   * pruning; `candidates` ≥ probed-cell population makes the re-rank
   * exact, the contract the oracle query pins on the clustered fixture).
   */
  def knnJoinIvfPq(index: IvfPqIndex, base: DataFrame, idCol: String, embCol: String,
      queries: DataFrame, qIdCol: String, qEmbCol: String,
      k: Int, nprobe: Int = 4, candidates: Int = 0): DataFrame = {
    val nCand = if (candidates > 0) candidates else math.max(5 * k, 50)
    val probes = queries
      .select(col(qIdCol).as("query_id"),
        col(qEmbCol).cast("array<double>").as("__qemb"))
      .withColumn("__adc_table",
        column(graft.functions.PqAdcTable(expression(col("__qemb")),
          index.model.codebooks, normalize = true)))
      .withColumn("cell",
        explode(graft.functions.nearest_centroids(col("__qemb"), index.centroids, nprobe)))
      .select("query_id", "cell", "__adc_table")
    val scored = index.codes.join(probes, "cell")
      .select(col("query_id"), col("id"),
        column(graft.functions.PqAdcLookup(expression(col("codes")),
          expression(col("__adc_table")), index.model.k)).as("__adc"))
      .where(col("__adc").isNotNull)
    // multi-assigned vectors (assignReplicas > 1) can meet the same
    // query in 2+ probed cells with the same adc — keep one. With
    // single assignment the dedup would be a full shuffle of the scored
    // frame (the force-scale probe measured 2.2 GB for 64M scored rows)
    // for no effect, so it is gated on the index's build setting.
    val deduped =
      if (index.replicas > 1) scored.dropDuplicates("query_id", "id") else scored
    val heaped = deduped
      // bounded heap keeps the LARGEST ord; ADC is a distance
      .withColumn("__negadc", -col("__adc"))
    val cands = GroupTopK.topKPerGroup(heaped, Seq("query_id"), "__negadc", "id", nCand)
      .select(col("query_id"), col("id"))
    val qemb = queries.select(col(qIdCol).as("query_id"), col(qEmbCol).cast("array<double>").as("__qemb"))
    // no broadcast hint on either join: the candidate side is
    // |queries|·candidates rows and the query side |queries| rows — AQE
    // broadcasts whichever is small enough at runtime, and for query
    // sets too large to broadcast both joins hash-shuffle on their keys
    val reranked = cands
      .join(base.select(col(idCol).as("id"), col(embCol).as("__cemb")), "id")
      .join(qemb, "query_id")
      .select(col("query_id"), col("id"),
        graft.functions.cosine_sim(col("__cemb"), col("__qemb")).as("cosine"))
      .where(col("cosine").isNotNull)
    GroupTopK.topKPerGroup(reranked, Seq("query_id"), "cosine", "id", k)
      .select(col("query_id"), col("id"), col("cosine"), col("rank"))
  }

  /**
   * Codebook fit-quality / drift monitoring: per-subspace quantization
   * residual statistics over a corpus — (subspace, n, avg_sq_error,
   * max_sq_error). A production index watches this on each ingest
   * batch: residuals rising above the fit-time baseline mean the
   * embedding distribution has drifted off the codebooks (new domains,
   * new encoder version) and the index needs refitting — BEFORE recall
   * quietly degrades.
   *
   * Scale: one narrow pass ([[graft.functions.PqSubspaceErrors]] —
   * the PqEncode argmin loop keeping the distance), a posexplode to
   * m rows per vector, and a partial+final aggregate on the (tiny)
   * subspace key. No shuffle of vectors, no join.
   */
  def quantizationErrorStats(df: DataFrame, idCol: String, embCol: String,
      model: PqModel, normalize: Boolean = false): DataFrame =
    df.select(posexplode(
        column(graft.functions.PqSubspaceErrors(expression(col(embCol)),
          model.codebooks, normalize))).as(Seq("subspace", "sq_error")))
      .groupBy("subspace")
      .agg(count(lit(1)).as("n"),
        avg(col("sq_error")).as("avg_sq_error"),
        max(col("sq_error")).as("max_sq_error"))

  def searchEncoded(coded: DataFrame, df: DataFrame, idCol: String, embCol: String,
      model: PqModel, query: Array[Double], k: Int, candidates: Int = 0): DataFrame = {
    val nCand = if (candidates > 0) candidates else math.max(5 * k, 50)
    val table = adcTable(normalized(query), model)
    val cands = coded
      .select(col(idCol),
        column(graft.functions.PqAdcDistance(expression(col("codes")), table, model.k)).as("__adc"))
      .where(col("__adc").isNotNull)
      .orderBy(col("__adc").asc, col(idCol))
      .limit(nCand)
      .select(col(idCol))
    val qlit = array(query.map(lit): _*)
    df.join(broadcast(cands), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(graft.functions.cosine_sim(col(embCol), qlit), 4).as("cosine"))
      .where(col("cosine").isNotNull)
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
