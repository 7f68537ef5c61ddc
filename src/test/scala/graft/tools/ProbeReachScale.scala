package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for [[graft.operators.Graphs.reachability]]: BFS
 * over a 50M-edge / 5M-node random digraph (out-degree 10) from one
 * source. The claim under test: per-level cost tracks the FRONTIER's
 * out-edges (never |nodes|² and never exponential path counts), the
 * visited anti-join keeps levels disjoint, and the walk exits early
 * once the reachable set saturates. With out-degree 10 the frontier
 * saturates in a handful of levels — the probe reports per-level
 * growth and total wall. Numbers recorded in COVERAGE.md.
 */
object ProbeReachScale {
  def main(args: Array[String]): Unit = {
    val nNodes = if (args.nonEmpty) args(0).toLong else 5000000L
    val outDeg = 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nEdges = nNodes * outDeg
    val edges = spark.range(nEdges).select(
      (col("id") % nNodes).as("src"),
      pmod(hash(col("id"), lit(3)), lit(nNodes)).as("dst"))
    val src = spark.range(1).select(lit(0L).as("node"))

    val t0 = System.nanoTime()
    val reached = graft.operators.Graphs.reachability(edges, src, maxDepth = 12)
      .localCheckpoint()
    val byDepth = reached.groupBy("depth").count().orderBy("depth")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val wall = (System.nanoTime() - t0) / 1e9
    val total = byDepth.map(_._2).sum
    println(f"PROBE reach nodes=$nNodes edges=$nEdges reached=$total wall=$wall%.1fs " +
      s"levels=${byDepth.map { case (d, c) => s"$d:$c" }.mkString(",")}")
    println(s"PROBE reach saturated=${total >= (nNodes * 0.99).toLong} " +
      s"maxLevel=${byDepth.map(_._1).max}")
    spark.stop()
  }
}
