package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for Graphs.triangleStats: a 5M-node ring plus one
 * 100k-degree HUB — the adversarial shape for wedge enumeration (a
 * naive wedge join at the hub generates deg² = 10^10 pairs and dies;
 * degree-ordered orientation points every hub edge INTO the hub, so
 * the hub contributes zero oriented wedges). Expected count is closed
 * form: hub neighbors are 1..100000, so triangles = consecutive ring
 * pairs (i, i+1) with both endpoints hub-adjacent = 99,999.
 */
object ProbeTriangleScale {
  def main(args: Array[String]): Unit = {
    val n = 5000000L
    val hubDeg = 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ring = spark.range(n).select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
    val hub = spark.range(1, hubDeg + 1).select(lit(0L).as("src"), col("id").as("dst"))
    val t0 = System.nanoTime()
    val r = graft.operators.Graphs.triangleStats(ring.unionAll(hub)).collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val ok = r.getLong(2) == hubDeg - 1
    println(f"PROBE triangles_hub n_edges=${r.getLong(1)} tri=${r.getLong(2)} " +
      f"expected=${hubDeg - 1} exact=$ok wall=$wall%.2fs")
    spark.stop()
  }
}
