package graft.operators

import graft.functions.jaro_winkler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Cross-source entity resolution (record linkage): match records that
 * name the SAME real-world entity across two tables with no shared key
 * — merging crawl snapshots, joining a vendor feed to a master table,
 * linking authors across corpora. The classic Fellegi-Sunter shape
 * (blocking → pairwise comparison → decision), built Spark-first:
 *
 *  - BLOCKING bounds the candidate space: records join on a cheap
 *    normalized key (first `k` alphanumeric characters), so comparison
 *    cost is Σ |block_l|·|block_r| instead of |L|·|R|. Oversized blocks
 *    (stopword-like keys) are DROPPED on both sides via a pre-computed
 *    key-frequency cap — the standard guard that keeps worst-case cost
 *    bounded at web scale; at 100 TB the block join is a plain
 *    key-partitioned shuffle join, never a cartesian.
 *  - SCORING is the native [[graft.functions.JaroWinklerSimilarity]]
 *    expression — whole-stage-codegen-resident, O(|a|·|b|) only on
 *    blocked pairs.
 *  - DECISION keeps pairs at/above `threshold` and ranks the best
 *    `topPerLeft` matches per left record with a window PARTITIONED BY
 *    the left id (many bounded partitions, never a global sort),
 *    deterministic tie-break on the right id.
 *
 * The reference has no linkage operator (its nearest analogue is the
 * fuzzy schema linker, `app/ai/nl2sql.py:20-46`, which matches QUESTION
 * words to schema names with the same partial-ratio family) — this is a
 * north-star extension: training-data pipelines dedup/join entity
 * tables across sources at exactly the scale where all-pairs dies.
 */
object EntityResolution {

  /** Normalized blocking key: lowercase, alphanumerics only, first `k`
    * characters. Deterministic and cheap — one narrow projection. */
  def blockKey(c: Column, k: Int = 2): Column =
    substring(regexp_replace(lower(c), "[^a-z0-9]", ""), 1, k)

  /**
   * Blocked candidate pairs: `(l_id, l_name, r_id, r_name)` for records
   * sharing a block key, with blocks larger than `maxBlockSize` (on
   * EITHER side) dropped entirely. Dropping is a recall/cost dial, not
   * a correctness hedge — callers needing those keys re-block them with
   * a longer prefix.
   */
  def candidatePairs(left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      prefixLen: Int = 2, maxBlockSize: Int = 1000): DataFrame = {
    val l = left.select(col(leftId).as("l_id"), col(leftName).as("l_name"),
      blockKey(col(leftName), prefixLen).as("bk"))
    val r = right.select(col(rightId).as("r_id"), col(rightName).as("r_name"),
      blockKey(col(rightName), prefixLen).as("bk"))
    def capped(df: DataFrame): DataFrame = {
      val counts = df.groupBy("bk").agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBlockSize).select("bk")
      df.join(counts, "bk") // key-sized frame; AQE broadcasts when it fits
    }
    capped(l).join(capped(r), "bk").drop("bk")
  }

  /**
   * Resolve: blocked pairs scored with Jaro-Winkler, thresholded, best
   * `topPerLeft` matches per left record. Output:
   * `(l_id, l_name, r_id, r_name, sim, rank)`.
   */
  def resolve(left: DataFrame, leftId: String, leftName: String,
      right: DataFrame, rightId: String, rightName: String,
      threshold: Double = 0.9, topPerLeft: Int = 1,
      prefixLen: Int = 2, maxBlockSize: Int = 1000): DataFrame = {
    val scored = candidatePairs(left, leftId, leftName,
      right, rightId, rightName, prefixLen, maxBlockSize)
      .withColumn("sim", jaro_winkler(col("l_name"), col("r_name")))
      .where(col("sim") >= threshold)
    val w = Window.partitionBy(col("l_id"))
      .orderBy(col("sim").desc, col("r_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topPerLeft)
  }
}
