package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Round-11 force-scale probes (VERDICT r10 tasks 2/4/6):
 *
 *  - Dup-heavy leakage-safe split: 5M docs with 50% of the corpus in
 *    near-dup groups → the group map (2.5M rows) exceeds the broadcast
 *    threshold, so the now-hint-free join must complete via a
 *    key-partitioned shuffle join (plan asserted: NO broadcast of the
 *    group map), with group atomicity verified distributed (no group
 *    straddles splits). This is exactly the scale where the former
 *    forced `broadcast()` hint would have OOMed.
 *  - Multi-measure MV refresh at 20M rows / 100k groups / 2 measures:
 *    refreshMulti must equal buildMulti over the post-change table
 *    EXACTLY (symmetric distributed anti-join, zero rows differ).
 *  - PageRank 10M edges / 1M nodes / 3 iterations with the
 *    single-action iteration (dangling mass folded into the
 *    iteration job): force-scale wall must stay in the r10 band
 *    (~21s) and rank mass must stay 1.
 */
object ProbeForceScale11 {
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

    // ---- leakage split with a corpus-scale group map ----
    val docs = spark.range(0, 5000000L).select(col("id").as("doc_id")).persist()
    docs.count()
    // every even doc belongs to a 50-member group: 2.5M member rows,
    // far over spark.sql.adaptive.autoBroadcastJoinThreshold
    val groups = spark.range(0, 5000000L).where(pmod(col("id"), lit(2)) === 0)
      .select(col("id"), (col("id") - pmod(col("id"), lit(100L))).as("group_id"))
      .persist()
    groups.count()
    timed("leakage_split_5m_docs_2p5m_groupmap") {
      val split = graft.operators.Sampling.leakageSafeSplit(
        docs, "doc_id", groups, Seq("train" -> 0.9, "test" -> 0.1))
      val out = split.persist()
      val n = out.count()
      val plan = out.queryExecution.executedPlan.toString
      val broadcastJoined = plan.contains("BroadcastHashJoin")
      // group atomicity, checked distributed: every group maps to ONE split
      val straddlers = out.join(groups.withColumnRenamed("id", "doc_id"), "doc_id")
        .groupBy("group_id").agg(countDistinct(col("split")).as("k"))
        .where(col("k") > 1).count()
      val testShare = out.where(col("split") === "test").count().toDouble / n
      println(s"PROBE leakage_check => rows=$n broadcast_join=$broadcastJoined " +
        f"straddling_groups=$straddlers test_share=$testShare%.3f")
      assert(!broadcastJoined, "corpus-scale group map must NOT broadcast:\n" + plan.take(2000))
      assert(straddlers == 0, s"$straddlers groups straddle splits")
      assert(math.abs(testShare - 0.1) < 0.05, s"share $testShare")
      out.unpersist()
    }
    docs.unpersist(); groups.unpersist()

    // ---- multi-measure MV refresh ≡ rebuild at 20M rows ----
    def rows(from: Long, to: Long) = spark.range(from, to).select(
      pmod(col("id"), lit(100000L)).as("g"),
      pmod(xxhash64(col("id")), lit(1000000L)).as("v1"),
      when(pmod(col("id"), lit(5)) === 0, lit(null).cast("long"))
        .otherwise(pmod(xxhash64(col("id") * 31), lit(1000L))).as("v2"))
    val base = rows(0, 20000000L).persist(); base.count()
    val deletes = rows(0, 20000000L).where(pmod(xxhash64(col("v1")), lit(40)) === 0)
      .persist(); deletes.count()
    val inserts = rows(20000000L, 20500000L).persist(); inserts.count()
    val current = base.exceptAll(deletes).unionAll(inserts).persist(); current.count()
    val mv0 = graft.operators.MaterializedAgg.buildMulti(
      base, Seq("g"), Seq("v1", "v2")).persist()
    mv0.count()
    timed("mv_multi_refresh_20m") {
      val refreshed = graft.operators.MaterializedAgg.refreshMulti(
        mv0, inserts, deletes, current, Seq("g"), Seq("v1", "v2")).persist()
      val rebuilt = graft.operators.MaterializedAgg.buildMulti(
        current, Seq("g"), Seq("v1", "v2"))
      val extra = refreshed.exceptAll(rebuilt).count()
      val missing = rebuilt.exceptAll(refreshed).count()
      println(s"PROBE mv_multi_check => groups=${refreshed.count()} extra=$extra missing=$missing")
      assert(extra == 0 && missing == 0, s"extra=$extra missing=$missing")
      refreshed.unpersist()
    }
    base.unpersist(); deletes.unpersist(); inserts.unpersist(); current.unpersist()

    // ---- PageRank at 10M edges with single-action iterations ----
    val edges = spark.range(0, 10000000L).select(
      pmod(xxhash64(col("id")), lit(1000000L)).as("src"),
      pmod(xxhash64(col("id") * 31 + 7), lit(1000000L)).as("dst"))
    timed("pagerank_10m_edges_3iters_single_action") {
      val pr = graft.operators.Graphs.pageRank(edges, iterations = 3)
      val mass = pr.agg(sum(col("pr"))).collect()(0).getDouble(0)
      println(f"PROBE pagerank_check => nodes=${pr.count()} mass=$mass%.6f")
      assert(math.abs(mass - 1.0) < 1e-6, s"mass $mass")
    }
    spark.stop()
  }
}
