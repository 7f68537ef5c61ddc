package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed tables for shuffle-free co-located joins (100 TB posture:
 * "co-locate joins via bucketing or pre-partitioning").
 *
 * Writing both join sides bucketed by the join key into the session
 * catalog lets Catalyst plan a SortMergeJoin with NO Exchange on either
 * side — at cluster scale this converts the dominant shuffle of a
 * fact-fact join into local sorts. Works with the in-memory session
 * catalog + parquet (no Hive metastore needed).
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** True when a join of the two bucketed tables on `key` planned without
    * any shuffle Exchange (diagnostic used by specs/benchmarks). */
  def joinIsShuffleFree(spark: SparkSession, left: String, right: String, key: String): Boolean = {
    val plan = spark.table(left).join(spark.table(right), key)
      .queryExecution.executedPlan.toString
    !plan.contains("Exchange hashpartitioning")
  }
}
