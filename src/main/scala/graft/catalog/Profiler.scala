package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/**
 * Schema profiler (S4–S6, A6–A8 in SURVEY.md §2; ref
 * `app/schema/crawler.py:142-275`): row counts, per-column distinct
 * cardinality, numeric min/max/avg, categorical domain extraction
 * (distinct ≤ `domainCap`), and row samples.
 *
 * Scale design: where the reference issues one SQL query per column per
 * statistic (a connection-bound loop), this computes ALL per-column
 * statistics of a table in a SINGLE aggregation pass (one job, one scan —
 * partial aggregation map-side). Distinct counts default to
 * `approx_count_distinct` (HLL++, mergeable, no shuffle explosion at
 * 100 TB); `exact = true` restores the reference's exact semantics for
 * parity tests. Domain extraction only scans columns the first pass proved
 * low-cardinality.
 */
object Profiler {

  val DomainCap = 100 // ref crawler.py:249
  val SampleSize = 100 // ref routes_models.py:179

  /** The reference's numeric-type classification rule: type-string
    * substring match (ref crawler.py:255). */
  def isNumericType(typeName: String): Boolean = {
    val t = typeName.toLowerCase
    Seq("int", "numeric", "decimal", "float", "double", "real").exists(t.contains)
  }

  /**
   * Seeded UNBIASED row sample (r15 verdict #6). The parity sampler
   * below (`limit(n)`, ref crawler.py:204-220) reads head-of-file: at
   * 100 TB that "sample" is the first rows of ONE parquet file — any
   * write-order correlation (ingest date, source, partition key) makes
   * it wildly unrepresentative. This variant ranks every row by a
   * seeded uniform draw and keeps the global top-n: Catalyst plans it
   * as TakeOrderedAndProject — a per-partition n-row heap merged on the
   * driver, i.e. a distributed reservoir at one-scan cost, no full
   * sort, no shuffle. Determinism: `rand(seed)` derives each
   * partition's stream from (seed, partitionId), so a fixed seed over a
   * fixed file layout reproduces the same sample (spec-pinned).
   */
  def sampleUnbiased(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  def profileTable(
      spark: SparkSession,
      name: String,
      df: DataFrame,
      exact: Boolean = false,
      domainCap: Int = DomainCap,
      sampleSize: Int = SampleSize,
      sampleSeed: Option[Long] = None): TableInfo = {
    val fields = df.schema.fields

    // Single-pass aggregation: count(*) + per-column [distinct, min, max, avg]
    val distinctAggs = fields.map { f =>
      val d = if (exact) countDistinct(col(f.name)) else approx_count_distinct(col(f.name))
      d.cast("long").as(s"__d_${f.name}")
    }
    val numericAggs = fields.filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).flatMap { f =>
      Seq(
        min(col(f.name)).cast("double").as(s"__mn_${f.name}"),
        max(col(f.name)).cast("double").as(s"__mx_${f.name}"),
        avg(col(f.name)).cast("double").as(s"__av_${f.name}"))
    }
    val aggs = (Seq(count(lit(1)).as("__rows")) ++ distinctAggs ++ numericAggs)
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    def opt(colName: String): Option[Double] =
      if (row.schema.fieldNames.contains(colName) && !row.isNullAt(row.fieldIndex(colName)))
        Some(row.getDouble(row.fieldIndex(colName)))
      else None

    val rowCount = row.getLong(row.fieldIndex("__rows"))

    // Domain extraction only for proven-low-cardinality columns
    // (ref crawler.py:249-252: DISTINCT col ORDER BY col LIMIT 100).
    // ONE second pass for ALL qualifying columns via bounded collect_set
    // (executor-side state ≤ domainCap values per column) instead of a
    // distinct+sort job per column.
    val lowCard = fields.filter { f =>
      val d = row.getLong(row.fieldIndex(s"__d_${f.name}"))
      d <= domainCap && d > 0 &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
        !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
    }
    val domains: Map[String, Seq[String]] =
      if (lowCard.isEmpty) Map.empty
      else {
        val domAggs = lowCard.map(f =>
          slice(sort_array(collect_set(col(f.name))), 1, domainCap)
            .cast("array<string>").as(s"__dom_${f.name}"))
        val domRow = df.agg(domAggs.head, domAggs.tail: _*).collect()(0)
        lowCard.map(f =>
          f.name -> domRow.getSeq[String](domRow.fieldIndex(s"__dom_${f.name}")).toSeq).toMap
      }

    val columns = fields.map { f =>
      val d = row.getLong(row.fieldIndex(s"__d_${f.name}"))
      val domain = domains.get(f.name)
      ColumnInfo(
        name = f.name,
        dataType = f.dataType.sql,
        nullable = f.nullable,
        distinctCount = Some(d),
        min = opt(s"__mn_${f.name}"),
        max = opt(s"__mx_${f.name}"),
        avg = opt(s"__av_${f.name}"),
        uniqueValues = domain)
    }

    // sampleSeed selects the sampler: None keeps the reference's
    // head-rows parity (crawler.py:204-220); Some(seed) draws the
    // seeded uniform sample — the profile-quality path at scale.
    // Everything above (counts, min/max/avg, domains) stays EXACT
    // either way; only the illustrative sampleRows differ.
    val n = math.min(sampleSize, 10)
    val sampleDf = sampleSeed match {
      case Some(seed) => sampleUnbiased(df, n, seed)
      case None => df.limit(n)
    }
    val samples = sampleDf.collect().map { r =>
      fields.map(f => f.name -> String.valueOf(r.get(r.fieldIndex(f.name)))).toMap
    }

    TableInfo(name, columns.toSeq, rowCount = Some(rowCount), sampleRows = samples.toSeq)
  }

  /**
   * Categorical domains of one table's STRING columns: `{column →
   * sorted values}` for columns whose approximate distinct count is ≤
   * `domainCap` (the A7 domain-extraction rule, restricted to the
   * value-linking use case — NL tokens like "math" resolving to
   * `dept = 'math'`). Two bounded passes like [[profileTable]]: an
   * HLL++ gate so high-cardinality columns never reach `collect_set`,
   * then one bounded-state collect over the qualifying columns only.
   */
  def stringDomains(spark: SparkSession, table: String,
      domainCap: Int = DomainCap): Map[String, Seq[String]] = {
    val df = spark.table(table)
    val strCols = df.schema.fields.toSeq
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    if (strCols.isEmpty) return Map.empty
    val gateAggs = strCols.map(c =>
      approx_count_distinct(col(c)).cast("long").as(s"__d_$c"))
    val gate = df.agg(gateAggs.head, gateAggs.tail: _*).collect()(0)
    val lowCard = strCols.filter { c =>
      val d = gate.getLong(gate.fieldIndex(s"__d_$c")); d > 0 && d <= domainCap
    }
    if (lowCard.isEmpty) return Map.empty
    val domAggs = lowCard.map(c =>
      slice(sort_array(collect_set(col(c))), 1, domainCap).as(s"__dom_$c"))
    val domRow = df.agg(domAggs.head, domAggs.tail: _*).collect()(0)
    lowCard.map(c =>
      c -> domRow.getSeq[String](domRow.fieldIndex(s"__dom_$c")).toSeq).toMap
  }

  /**
   * Sketch-based profiling for 100 TB scale: one pass computing HLL++
   * distinct estimates and t-digest-style approximate quantiles per
   * numeric column — mergeable sketches, no exact sort/shuffle anywhere.
   */
  def sketchStats(df: DataFrame, cols: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.95, 0.99)): Map[String, (Long, Seq[Double])] = {
    if (cols.isEmpty) return Map.empty
    val aggs = cols.flatMap { c =>
      Seq(
        approx_count_distinct(col(c)).as(s"__d_$c"),
        percentile_approx(col(c), array(percentiles.map(lit): _*), lit(10000))
          .cast("array<double>").as(s"__p_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.map { c =>
      c -> (row.getLong(row.fieldIndex(s"__d_$c")),
        row.getSeq[Double](row.fieldIndex(s"__p_$c")).toSeq)
    }.toMap
  }

  /**
   * EXACT per-group percentiles (linear interpolation at rank
   * p·(n−1), the ANSI PERCENTILE_CONT definition) — the exact
   * complement to [[sketchStats]]'s mergeable approximations, for
   * groups that fit a single aggregation buffer (per-group state is
   * the group's values). At corpus scale with huge groups, prefer
   * `sketchStats`; this is the parity/verification path and the right
   * tool for moderate group cardinality × group size (the common
   * "latency percentiles per endpoint" shape).
   */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      percentiles: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    val pcts = percentile(col(valueCol), array(percentiles.map(lit): _*))
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), pcts.as("__p"))
    // Output names derive from the FULL fraction, not the rounded
    // percent — p=0.954 names p95_4, never colliding with p=0.95's p95
    // (rounding both to p95 made the second withColumn silently
    // overwrite the first, dropping a requested percentile).
    val names = percentiles.map { p =>
      val s = (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      "p" + s.replace(".", "_").replace("-", "m")
    }
    require(names.distinct.size == names.size,
      s"duplicate percentiles requested: $percentiles")
    names.zipWithIndex.foldLeft(agg) { case (d, (name, i)) =>
      d.withColumn(name, round(element_at(col("__p"), i + 1), 4))
    }.drop("__p")
  }

  /** Heavy hitters per column (frequent-items sketch, single pass). */
  def heavyHitters(df: DataFrame, cols: Seq[String], support: Double = 0.01): Map[String, Seq[Any]] = {
    val row = df.stat.freqItems(cols.toArray, support).collect()(0)
    cols.zipWithIndex.map { case (c, i) => c -> row.getSeq[Any](i).toSeq }.toMap
  }

  /** Crawl a set of registered views into SchemaMetadata with the FK
    * sidecar + mined synonyms (the reference's deep crawl, crawler.py:142-194). */
  def crawl(
      spark: SparkSession,
      tables: Seq[String],
      fks: Seq[FkEdge],
      exact: Boolean = false): SchemaMetadata = {
    val infos = tables.map { t =>
      val fkCols = fks.filter(_.fromTable == t).map(_.fromColumn)
      val ti = profileTable(spark, t, spark.table(t), exact)
      t -> ti.copy(foreignKeyColumns = fkCols,
        columns = ti.columns.map(c => c.copy(isForeignKey = fkCols.contains(c.name))))
    }.toMap
    val light = infos.map { case (t, ti) => t -> ti.columns.map(_.name) }
    SchemaMetadata(infos, fks, Synonyms.mine(light))
  }
}
