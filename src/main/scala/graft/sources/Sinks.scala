package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.exec.Executor

/**
 * Result sinks (S8/S9 in SURVEY.md §2.1; ref `app/ai/nl2sql.py:325-360`
 * result JSON, README.md:165 CSV export).
 *
 * `jsonRows` mirrors the reference's `(columns, rows)` envelope with its
 * exact coercions (Decimal→double, temporal→ISO-8601, nested→JSON
 * strings). File sinks are distributed writes; `singleCsv` coalesces to
 * one file ONLY because the export contract is "a file the user
 * downloads" — always behind the LIMIT cap, never on unbounded results.
 */
object Sinks {

  /** `(columns, rows)` JSON-safe envelope (bounded by the caller's LIMIT). */
  def jsonRows(df: DataFrame): (Seq[String], Seq[Seq[Any]]) =
    (df.columns.toSeq, df.collect().toSeq.map(_.toSeq.map(Executor.jsonSafe)))

  /** Distributed CSV write (header on, one part per partition). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Single-file CSV export for result grids (UI download contract). */
  def singleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Distributed JSON-lines write. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /**
   * Date-partitioned parquet layout (100 TB posture): facts written under
   * `part_date=YYYY-MM-01/` directories so temporal predicates prune whole
   * partitions at planning time (explain shows `PartitionFilters`) —
   * the dominant scan-reduction lever for time-series facts.
   */
  def writeDatePartitioned(df: DataFrame, path: String, tsCol: String): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("part_date", date_trunc("month", col(tsCol)).cast("date"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("part_date")
      .parquet(path)
  }

  /**
   * Balanced-shard parquet writer for curated training corpora: exactly
   * `shards` output files of near-equal row counts. `repartition(n, id)`
   * routes rows by Murmur3(id) mod n — deterministic across runs and
   * input partitionings for the same corpus, and uniform for unique ids —
   * and gives each writer task exactly one shard (no post-hoc file
   * merging). This is the shape data-loader fleets expect: N equal
   * shards, not one skewed file per upstream partition.
   */
  def writeBalancedShards(df: DataFrame, path: String, idCol: String, shards: Int): Unit = {
    import org.apache.spark.sql.functions.col
    require(shards > 0)
    df.repartition(shards, col(idCol))
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
  }
}
