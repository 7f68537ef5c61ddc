package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional clustered data layout (Z-order / Morton curve).
 *
 * At 100 TB the scan is the query: a filter can only skip data the
 * LAYOUT lets it skip. Partitioning handles ONE coarse dimension
 * (date); a single-column sort makes min/max file stats tight on that
 * column and useless on every other. Interleaving the bits of
 * per-column quantile ranks (the Morton curve — the technique behind
 * Delta/Iceberg `OPTIMIZE ZORDER BY`) makes each output file cover a
 * small hyper-rectangle of the clustering space, so parquet min/max
 * stats prune files and row groups for predicates on ANY clustered
 * column, not just the first sort key.
 *
 * The reference engine records per-table B-tree indexes for its
 * filtered scans (`app/schema/crawler.py:177-179` reads them via
 * SQLAlchemy inspector); columnar Spark has no row index — clustered
 * layout + stats pruning is the idiomatic equivalent at scale.
 *
 * Scale shape: one pass to sample quantile cutpoints
 * (`percentile_approx`, mergeable sketch, no shuffle of data rows), one
 * range-repartition on the z-value (the only full shuffle — it IS the
 * rewrite), local sort within each output file. Rank buckets come from
 * QUANTILES, not min/max scaling, so skewed columns still spread over
 * all 2^bits buckets and no file degenerates to the whole range.
 */
object Layout {

  /** Quantile buckets per clustering column (2^BucketBits). 8 bits =
    * 256 buckets: file-level pruning needs far fewer distinct ranks
    * than rows, and 2 columns interleave into 16-bit z-values — cheap
    * longs everywhere. */
  val BucketBits = 8

  /** Interior quantile cutpoints (2^BucketBits - 1 of them) for each
    * clustering column, from one mergeable-sketch aggregate pass. */
  def quantileCuts(df: DataFrame, cols: Seq[String]): Map[String, Array[Double]] = {
    val n = 1 << BucketBits
    val qs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val row = df.agg(
      percentile_approx(col(cols.head).cast("double"), qs, lit(10000)).as(cols.head),
      cols.tail.map(c =>
        percentile_approx(col(c).cast("double"), qs, lit(10000)).as(c)): _*).head()
    cols.map(c => c -> row.getSeq[Double](row.fieldIndex(c)).toArray).toMap
  }

  /** The column's quantile rank in [0, 2^BucketBits): how many
    * cutpoints lie at or below the value. A native expression doing an
    * upper-bound binary search over the inline sorted cutpoints (~8
    * comparisons for 255 cuts) inside the scan's codegen span — the
    * higher-order `size(filter(array(cuts…), …))` form it replaces
    * built and filtered a fresh 255-element array per row per column
    * in the interpreter (~30× slower end-to-end on the z-value pass). */
  def bucketOf(c: Column, cuts: Array[Double]): Column =
    graft.functions.quantile_bucket(c.cast("double"), cuts)

  /** Morton interleave: bit b of bucket i lands at position
    * b * n + i, so every column contributes equally at every scale of
    * the curve. Pure long arithmetic — stays inside codegen. */
  def zorderValue(buckets: Seq[Column]): Column = {
    val n = buckets.size
    require(n >= 1 && n * BucketBits <= 62, s"$n columns exceed the z-value budget")
    (0 until BucketBits).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, i) =>
        shiftleft(shiftright(bk.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` as `numFiles` parquet files clustered on `cols`:
    * range-partition by z-value (each file owns a compact z-range → a
    * small hyper-rectangle of the clustered space), sort within
    * partitions so ROW GROUPS inside each file tighten too. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
      numFiles: Int = 32): Unit = {
    val cuts = quantileCuts(df, cols)
    val z = zorderValue(cols.map(c => bucketOf(col(c), cuts(c))))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file [min, max] of each clustered column — the pruning power a
    * reader gets from the layout, as data: `span = (max-min)/range`
    * near 1/numFiles^(1/ncols) means tight hyper-rectangles; near 1
    * means that column cannot prune. */
  def fileSpans(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * File-pruning plan from zone-map spans: the files a range predicate
   * `lo <= col <= hi` could possibly touch. Pure METADATA logic — the
   * spans frame has one row per file (~1M rows for 100 TB of 100 MB
   * files), so the plan is computed without listing, opening, or
   * footer-reading a single data file. This is the metadata-layer scan
   * planning of lakehouse formats (Delta/Iceberg keep per-file column
   * stats for exactly this; parquet footers alone give row-group
   * skipping only AFTER every footer is opened — at 1M files that is
   * 1M reads before the first data byte).
   *
   * Interval-overlap test (`max >= lo AND min <= hi`), null-safe: a
   * file whose span is unknown (all-null column chunk) must be kept —
   * pruning may only drop files PROVEN disjoint.
   */
  def pruneFiles(spans: DataFrame, fileCol: String, colName: String,
      lo: Double, hi: Double): DataFrame =
    spans.where(
      (col(s"${colName}_max").isNull || col(s"${colName}_max") >= lo) &&
      (col(s"${colName}_min").isNull || col(s"${colName}_min") <= hi))
      .select(col(fileCol), col(s"${colName}_min"), col(s"${colName}_max"))

  /**
   * Pruned read: scan ONLY the files a materialized spans frame (from
   * [[fileSpans]], persisted at write time — recomputing it would read
   * the data and defeat the point) says can match, then re-apply the
   * predicate for row-level exactness. The surviving path list is
   * collected to the driver — legitimate at scale: it is strictly
   * smaller than the file listing Spark's own `InMemoryFileIndex`
   * already holds on the driver for ANY parquet read of the directory.
   */
  def prunedRead(spark: SparkSession, dir: String, spans: DataFrame,
      fileCol: String, colName: String, lo: Double, hi: Double): DataFrame = {
    val paths = pruneFiles(spans, fileCol, colName, lo, hi)
      .select(fileCol).collect().map(_.getString(0))
    if (paths.isEmpty)
      // no file can match: empty result with the table's schema
      // (schema comes from footers of the listed dir; no data read)
      spark.read.parquet(dir).where(lit(false))
    else spark.read.parquet(paths.toIndexedSeq: _*)
      .where(col(colName) >= lo && col(colName) <= hi)
  }

  /**
   * Compaction plan — the small-files half of lakehouse `OPTIMIZE`
   * (Z-order above is the clustering half): assign files to
   * target-sized rewrite bins. Greedy cumulative assignment over
   * size-DESCENDING order: `bin = floor(bytes_before / target)`, where
   * `bytes_before` is the running total of larger-or-equal files. Each
   * bin closes within one file of the target; a file already at or
   * above the target lands at a bin boundary and effectively keeps its
   * own bin (it needs no rewrite). Deterministic (size then file-id
   * tiebreak), so plans are replayable.
   *
   * The input is FILE METADATA — one row per file, ~1M rows for 100 TB
   * of 100 MB files — so the single-partition running-sum window is a
   * metadata-sized sort, not a data scan; the data itself moves only in
   * the rewrite jobs the plan drives, one job per bin.
   */
  def compactionPlan(files: DataFrame, fileCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(bytesCol).desc, col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    files.select(col(fileCol), col(bytesCol))
      .withColumn("bin",
        floor((sum(col(bytesCol)).over(w) - col(bytesCol)) /
          targetBytes.toDouble).cast("long"))
  }

  /**
   * Transfer-integrity manifest — the validation companion of every
   * export path ([[zorderWrite]], `Sinks`, the packed-sequence writer):
   * per shard, an order-independent content fingerprint a receiver
   * recomputes after copying 100 TB to confirm every row arrived intact.
   * Output one row per shard, all exact BIGINTs:
   *
   *   - `n_rows`, `min_id`, `max_id` — cardinality + key-range bounds;
   *   - `xor_lo` / `xor_hi` — XOR folds of two independent 48-bit keys
   *     derived from `md5(id)` (hex digits 1-12 and 17-28). XOR is
   *     commutative, associative and overflow-free, so the fold is
   *     row-order-independent, map-side combinable, and NEVER overflows
   *     under ANSI arithmetic — an additive checksum over 10¹² rows
   *     would (long SUM throws on overflow in ANSI mode). Two
   *     independent folds because XOR alone cancels duplicate PAIRS;
   *     a pair would have to collide in both 48-bit keys AND leave
   *     n_rows even to slip through;
   *   - `sum_tokens` — token-count total when `textCol` is given
   *     (token counts are small; their sum is overflow-safe).
   *
   * md5, not xxhash: the two engines' native hash functions differ, so
   * an oracle-checkable fingerprint must come from the one hash both
   * compute identically (the x_dsir precedent).
   *
   * Scale: one partial-aggregated pass; only |shards| rows cross the
   * shuffle. Compare sender vs receiver with [[manifestDiff]].
   */
  def integrityManifest(df: DataFrame, idCol: String, shardCol: Column,
      textCol: Option[String] = None): DataFrame = {
    def key(from: Int): Column =
      conv(substring(md5(col(idCol).cast("string")), from, 12), 16, 10)
        .cast("long")
    df.select(shardCol.as("shard"), col(idCol).as("__id"),
      key(1).as("__klo"), key(17).as("__khi"),
      textCol.map(t => TextAnalysis.tokenCount(col(t)).cast("long"))
        .getOrElse(lit(0L)).as("__nt"))
      .groupBy("shard")
      .agg(count(lit(1L)).as("n_rows"),
        min("__id").as("min_id"), max("__id").as("max_id"),
        expr("bit_xor(__klo)").as("xor_lo"),
        expr("bit_xor(__khi)").as("xor_hi"),
        sum("__nt").as("sum_tokens"))
  }

  /** Hadoop `Configuration` is not `Serializable`; Spark's own shim is
    * `private[spark]`, so [[footerRowCounts]] carries this minimal one
    * (write/readFields round-trip) to the executors. */
  private class SerializableHadoopConf(
      @transient var conf: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit =
      conf.write(out)
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      conf = new org.apache.hadoop.conf.Configuration(false)
      conf.readFields(in)
    }
  }

  /**
   * Per-file row counts from parquet FOOTERS only — the metadata-only
   * first-line receiver check of a transfer: row counts come from each
   * file's footer (a few KB read per file), so a 100 TB directory
   * validates its cardinality without scanning a single data byte.
   * When counts disagree, [[integrityManifest]]/[[manifestDiff]] is the
   * content-level second line. Footer reads are DISTRIBUTED (one task
   * per batch of files — at 1M files the driver holds only the path
   * list, which Spark's own file index holds for any read anyway);
   * imperative parquet-API access is exactly the per-partition
   * I/O-bound work `parallelize` exists for. Output: (file, n_rows).
   */
  def footerRowCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hconf.conf)
    // recursive: partitioned layouts (writeDatePartitioned, zorderWrite
    // under partition dirs) keep their files in subdirectories
    val it = fs.listFiles(root, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.endsWith(".parquet"))
        buf += s.getPath.toString
    }
    val files = buf.result().sorted
    spark.sparkContext
      .parallelize(files, math.max(1, math.min(files.size, 64)))
      .map { p =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(p), hconf.conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try (p, r.getRecordCount) finally r.close()
      }.toDF("file", "n_rows")
  }

  /**
   * Shards whose manifests disagree between a sender (`a`) and a
   * receiver (`b`): full-outer join on the shard key, keep rows where
   * any field differs or a side is missing entirely. Empty result =
   * transfer verified. Output: (shard, present_a, present_b,
   * n_rows_a, n_rows_b) — booleans + BIGINTs, metadata-sized.
   */
  def manifestDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val fields = Seq("n_rows", "min_id", "max_id", "xor_lo", "xor_hi", "sum_tokens")
    val l = fields.foldLeft(a)((d, f) => d.withColumnRenamed(f, s"${f}_a"))
    val r = fields.foldLeft(b)((d, f) => d.withColumnRenamed(f, s"${f}_b"))
    l.join(r, Seq("shard"), "full_outer")
      .where(fields.map(f => !(col(s"${f}_a") <=> col(s"${f}_b")))
        .reduce(_ || _))
      .select(col("shard"),
        col("n_rows_a").isNotNull.as("present_a"),
        col("n_rows_b").isNotNull.as("present_b"),
        col("n_rows_a"), col("n_rows_b"))
  }
}
