package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for Streams.DupGroupsMaintainer: 5M near-dup
 * pairs (1M 5-chains) arriving in 10 batches of 500k. Measures each
 * incremental fold and compares the final labels EXACTLY against one
 * batch CC over all pairs. The claim under test: per-batch fold cost
 * is ∝ labeled nodes + batch pairs (the contracted graph), not the
 * growing pair history, and chains that straddle batches still merge.
 */
object ProbeIncCcScale {
  def main(args: Array[String]): Unit = {
    val nChains = 1000000L // chain i: nodes 10i..10i+4 linked in a path
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 4 edges per chain: (10i+j, 10i+j+1) j=0..3 → 5M edges total.
    // Batch b takes a deterministic 1/10 slice BY EDGE (not by chain),
    // so most chains straddle batches and must merge incrementally.
    val allPairs = spark.range(nChains * 4).select(
      ((col("id") / 4).cast("long") * 10 + pmod(col("id"), lit(4))).as("id_a"),
      ((col("id") / 4).cast("long") * 10 + pmod(col("id"), lit(4)) + 1).as("id_b"))
    val m = new graft.streaming.Streams.DupGroupsMaintainer
    var total = 0.0
    (0 until 10).foreach { b =>
      val batch = allPairs.where(pmod(hash(col("id_a"), col("id_b")), lit(10)) === b)
      val t0 = System.nanoTime()
      m.onBatch(batch, b.toLong)
      val t = (System.nanoTime() - t0) / 1e9
      total += t
      println(f"PROBE inc_cc batch=$b wall=$t%.2fs labeled=${m.currentLabels.get.count()}")
    }
    val t1 = System.nanoTime()
    val batchLabels = graft.operators.Dedup.duplicateGroups(allPairs)
    val mismatches = batchLabels.join(m.currentLabels.get
        .select(col("id"), col("group_id").as("g2")), "id")
      .where(col("group_id") =!= col("g2")).count()
    val tBatch = (System.nanoTime() - t1) / 1e9
    println(f"PROBE inc_cc_total incremental=$total%.2fs one_rebuild=$tBatch%.2fs " +
      f"mismatches=$mismatches")
    spark.stop()
  }
}
