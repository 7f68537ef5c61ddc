package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities (100 TB posture; see project brief: "salting
 * for skew, AQE for runtime re-plan").
 *
 * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
 * default with AQE) covers sort-merge joins at runtime. These helpers
 * cover the two places AQE does not: aggregations over a hot key, and
 * broadcast-infeasible joins against a replicable build side.
 */
object Skew {

  /**
   * Two-phase salted aggregation: spread a hot group key over
   * `saltBuckets` partial groups, aggregate, then merge. Only
   * sum-decomposable aggregates (count/sum/min/max) are offered — avg is
   * derived as sum/count at the merge.
   *
   * Phase 1 shuffles on (key, salt) — hot keys split `saltBuckets` ways;
   * phase 2 shuffles `saltBuckets`·|distinct keys| pre-aggregated rows.
   */
  def saltedAggregate(
      df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 1)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
      .groupBy(col(keyCol))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("sum"),
        min(col("__min")).as("min"), max(col("__max")).as("max"))
      .withColumn("avg", col("sum") / col("cnt"))
  }

  /**
   * Salted join for a skewed probe side against a small-but-not-broadcast
   * build side: the probe side gets a random salt in [0, saltFactor); the
   * build side is replicated `saltFactor` times (explode), so matching
   * rows co-locate per (key, salt). Use when the build side is too big
   * for `broadcast()` but small enough to replicate `saltFactor`×.
   */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 1)
    val saltedProbe = probe.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)).cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Top skewed keys with their share of rows — the diagnostic used to
    * decide whether salting is needed at all. */
  def keySkewProfile(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / total, 6))
      .orderBy(col("rows").desc)
      .limit(topN)
  }
}
