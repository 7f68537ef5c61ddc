package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.FkEdge

/**
 * Source registry: registers parquet tables as temp views and carries the
 * FK sidecar graph (Spark has no FK catalog concept; the reference keeps
 * relationships in SchemaMetadata — `app/schema/crawler.py:116-139`).
 *
 * Scale note: a temp view over `spark.read.parquet` keeps scans lazy and
 * fully pushdown-capable (filters + column pruning reach the parquet
 * reader). At cluster scale the same registry would point at a
 * partitioned table root instead of a single file — the engine only ever
 * sees view names.
 */
object Sources {

  /** TPC-H-ish fixture tables + extension tables (see /root/repo/FIXTURES.md §B). */
  val fixtureTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  /** FK sidecar mirroring the reference's `relationships` arrays
    * (ref metadata shape: `backend/models/2564b10e49e9651a/metadata.json`). */
  val fixtureFks: Seq[FkEdge] = Seq(
    FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem", "l_partkey", "part", "p_partkey"),
    FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
    FkEdge("nation", "n_regionkey", "region", "r_regionkey"))

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Some event fixtures carry TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects; read nanos as long and rebuild a micros timestamp.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      val tsCol = df.schema("ts").dataType match {
        // TIMESTAMP(NANOS) surfaced as raw long: EXACT µs floor via
        // integral division — `/` on longs goes through double, whose
        // ~0.2 µs rounding error at epoch magnitudes put ~0.04% of
        // timestamps one microsecond off the true grid; invisible to
        // range filters, but row-adjacent comparisons (LAG gaps, as-of
        // ties) expose every wrong value. NanosTimestampPushdown keeps
        // row-group pruning alive for this derived column.
        case LongType => timestamp_micros(expr("ts div 1000"))
        // TIMESTAMP_NTZ (plain µs parquet): same instant under the UTC
        // session, cast keeps the engine-wide TimestampType contract
        // and stays a bare column reference — pushdown works natively.
        case TimestampNTZType => col("ts").cast(TimestampType)
        case _ => col("ts")
      }
      df.withColumn("ts", tsCol)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else df
  }

  private val registered = new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Seq[String]]()

  /** Register every fixture table found under `dir` as a temp view.
    * Idempotent and memoized per (session, dir) — repeated calls (one per
    * declared query in Verify/Bench) skip the parquet footer re-reads. */
  def register(spark: SparkSession, dir: String): Seq[String] =
    registered.computeIfAbsent((spark, dir), { _ =>
      fixtureTables.flatMap { name =>
        val path = new java.io.File(s"$dir/$name.parquet")
        if (path.exists()) {
          table(spark, dir, name).createOrReplaceTempView(name)
          Some(name)
        } else None
      }
    })

  /** Catalog reflection: `{table -> [(name, type, nullable)]}`
    * (ref: `app/main.py:235-252` /schema/overview). */
  def overview(spark: SparkSession, tables: Seq[String]): Map[String, Seq[(String, String, Boolean)]] =
    tables.map { t =>
      t -> spark.table(t).schema.fields.toSeq.map(f => (f.name, f.dataType.sql, f.nullable))
    }.toMap
}
