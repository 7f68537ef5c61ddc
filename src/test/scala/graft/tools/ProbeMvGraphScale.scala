package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for the round-10 blocks whose oracle fixtures stay
 * small (101 groups / 27 hosts): drives the SAME code paths at sizes
 * where data cost dominates scheduler overhead, so COVERAGE can record
 * measured numbers instead of extrapolations.
 *
 *  - MV refresh: 50M-row base, 100k groups, 1M inserts + 1M deletes
 *    (deletes planted to hit ~all group minima → worst case for the
 *    extreme-recompute path). Timed against the full rebuild of the
 *    post-change table; the refreshed state is checked EXACTLY against
 *    the rebuild (distributed anti-join, zero mismatches).
 *  - PageRank: ~10M-edge random graph over 1M nodes, 3 iterations;
 *    rank mass conservation checked to 1e-6.
 */
object ProbeMvGraphScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    def timed[A](label: String)(f: => A): A = {
      val w0 = shuffleWrite
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label => wall=$secs%.1fs shuffle_write=${(shuffleWrite - w0) / 1e6}%.0fMB")
      r
    }

    // ---- MV refresh at 50M rows / 100k groups ----
    def mvRows(from: Long, to: Long) = spark.range(from, to).select(
      pmod(col("id"), lit(100000L)).as("g"),
      pmod(xxhash64(col("id")), lit(1000000L)).as("v"))
    val base = mvRows(0, 50000000L).persist()
    base.count()
    // deletes: the base rows whose id = 50*k (deterministically
    // reconstructible values); v of id≡0 rows lands anywhere in the
    // range, so most groups get interior AND some boundary deletions
    val deletes = mvRows(0, 50000000L).where(pmod(xxhash64(col("v")), lit(50)) === 0)
    val inserts = mvRows(50000000L, 51000000L)
    val current = base.exceptAll(deletes).unionAll(inserts).persist()
    current.count()
    val mv0 = timed("mv_build_50m") {
      val m = graft.operators.MaterializedAgg.build(base, Seq("g"), "v").persist()
      m.count(); m
    }
    // current-table variants are harness setup (in a lakehouse the sink
    // table already exists) — built and persisted OUTSIDE the timings
    val delI = deletes.where(col("v") >= 500000L).persist(); delI.count()
    val curIns = base.unionAll(inserts).persist(); curIns.count()
    val curI = base.exceptAll(delI).persist(); curI.count()
    // JIT warmup on a tiny slice so the variant timings measure data cost
    graft.operators.MaterializedAgg.refresh(
      mv0.limit(10), inserts.limit(10), deletes.limit(10),
      current.limit(10), Seq("g"), "v").count()
    // variant 1: inserts only — the purely algebraic path (no extreme
    // recompute possible); cost must be CHANGE-sized + key-sized merges
    timed("mv_refresh_1m_ins_only") {
      graft.operators.MaterializedAgg.refresh(
        mv0, inserts, base.limit(0), curIns, Seq("g"), "v").count()
    }
    // variant 2: interior deletes (v >= 500k with ~500 rows/group makes
    // a deleted value the group min with probability ~2^-500) — the
    // algebraic delete path, near-zero recomputed groups
    timed("mv_refresh_interior_del") {
      graft.operators.MaterializedAgg.refresh(
        mv0, inserts.limit(0), delI, curI, Seq("g"), "v").count()
    }
    // variant 3: adversarial deletes (hash-sampled across the whole value
    // range → most groups lose an extreme) — recompute-dominated by
    // design; the bound is ONE scan of current, i.e. rebuild cost
    val refreshed = timed("mv_refresh_1m_ins_1m_del_adversarial") {
      val r = graft.operators.MaterializedAgg.refresh(
        mv0, inserts, deletes, current, Seq("g"), "v").persist()
      r.count(); r
    }
    delI.unpersist(); curIns.unpersist(); curI.unpersist()
    val rebuilt = timed("mv_full_rebuild_51m") {
      val r = graft.operators.MaterializedAgg.build(current, Seq("g"), "v").persist()
      r.count(); r
    }
    timed("mv_exact_check") {
      val mismatches = refreshed.exceptAll(rebuilt).count() +
        rebuilt.exceptAll(refreshed).count()
      println(s"PROBE mv_check => groups=${rebuilt.count()} mismatches=$mismatches")
      assert(mismatches == 0, s"mismatches=$mismatches")
    }
    base.unpersist(); current.unpersist(); mv0.unpersist()
    refreshed.unpersist(); rebuilt.unpersist()

    // ---- PageRank on ~10M random edges / 1M nodes ----
    val edges = spark.range(0, 10000000L).select(
      pmod(xxhash64(col("id"), lit(1)), lit(1000000L)).as("src"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).as("dst"))
    val pr = timed("pagerank_10m_edges_3_iters") {
      val p = graft.operators.Graphs.pageRank(edges, iterations = 3).persist()
      p.count(); p
    }
    val mass = pr.agg(sum(col("pr"))).head().getDouble(0)
    println(f"PROBE pagerank_mass => total=$mass%.9f")
    assert(math.abs(mass - 1.0) < 1e-6, s"mass=$mass")
    pr.unpersist()

    spark.stop()
  }
}
