package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * One-off force-scale probe (VERDICT r9 task 7): the sf0.001→0.1
 * scaling sweep can't separate data cost from scheduler overhead for
 * the two operators whose fixture graphs stay tiny — connected
 * components (74k edges at sf0.1 → driver union-find) and the IVF-PQ
 * k-NN join (2k vectors). This probe synthesizes inputs big enough
 * that data cost dominates and drives the DISTRIBUTED paths:
 *
 *  - CC: 5M edges (2.5× `smallGraphThreshold`) → min-label propagation
 *    rounds, never the driver; labels verified exactly against the
 *    planted chain structure.
 *  - k-NN: 1M-row base, dim 16, IVF-PQ (m=4, k=16, nlist=64,
 *    nprobe=4) — per-query work is (nprobe/nlist)·|base| ADC lookups
 *    off the codes column, 1024 queries ⇒ ~64M scored rows.
 *
 * Prints wall seconds + total shuffle bytes per phase so COVERAGE can
 * record the measured numbers.
 */
object ProbeForceScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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

    // ---- CC: 6.25M nodes in chains of 5 → exactly 5M edges ----
    val edges = spark.range(0, 6250000L).where(pmod(col("id"), lit(5)) =!= 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val labels = timed("cc_5m_edges_distributed") {
      val g = graft.operators.Dedup.duplicateGroups(edges)
      // every node's label must be its chain head (min id of the
      // 5-node component) — exact, distributed check
      val bad = g.where(col("group_id") =!= col("id") - pmod(col("id"), lit(5))).count()
      val n = g.count()
      println(s"PROBE cc_check => nodes=$n mismatches=$bad")
      assert(bad == 0 && n == 6250000L, s"bad=$bad n=$n")
      n
    }

    // ---- IVF-PQ k-NN join: 1M-row base, 1024 queries ----
    val dim = 16
    def vecs(n: Long) = spark.range(0, n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col("id") * dim + j), lit(1000)).cast("double") - 500.0) / 500.0)
        .as("emb"))
    val base = vecs(1000000L).persist()
    base.count()
    val queries = vecs(1024L).withColumnRenamed("id", "qid")
    val (model, idx) = timed("ivfpq_build_1m") {
      val m = graft.operators.ProductQuantization.fit(base, "id", "emb", m = 4, k = 16)
      val i = graft.operators.ProductQuantization.ivfPqIndex(base, "id", "emb", m, nlist = 64)
      i.codes.persist().count()
      (m, i)
    }
    timed("ivfpq_knn_join_1m_base_1k_queries") {
      val r = graft.operators.ProductQuantization.knnJoinIvfPq(
        idx, base, "id", "emb", queries, "qid", "emb",
        k = 10, nprobe = 4, candidates = 50)
      val n = r.count()
      val perQuery = r.groupBy("query_id").count()
        .agg(min("count"), max("count")).collect()(0)
      println(s"PROBE knn_check => rows=$n per_query_min=${perQuery.get(0)} max=${perQuery.get(1)}")
      assert(n == 1024L * 10, s"n=$n")
    }
    // ---- CDC: 20M-record changelog over 2M keys (10 versions/key) ----
    // winner per key k is version k+18M; ~1/7 of winners are deletes,
    // so the exact expected state is computable in closed form and the
    // check is a distributed anti-join, never a collect
    timed("cdc_apply_20m_changes_2m_keys") {
      val log = spark.range(0, 20000000L).select(
        pmod(col("id"), lit(2000000L)).as("k"),
        col("id").as("ver"),
        when(pmod(col("id"), lit(7)) === 0, "D").otherwise("U").as("op"),
        (col("id") * 2).cast("double").as("val"))
      val state = graft.operators.Cdc.applyChangelog(log, Seq("k"), "ver", "op")
      val expected = spark.range(0, 2000000L).select(
        col("id").as("k"), (col("id") + 18000000L).as("ver"))
        .where(pmod(col("ver"), lit(7)) =!= 0)
      val n = state.count()
      val bad = state.join(expected, Seq("k"))
        .where(state("ver") =!= expected("ver")).count()
      val missing = expected.join(state, Seq("k"), "left_anti").count()
      println(s"PROBE cdc_check => rows=$n wrong_version=$bad missing=$missing")
      assert(bad == 0 && missing == 0, s"bad=$bad missing=$missing")
    }
    timed("cdc_netdiff_20m") {
      val log = spark.range(0, 20000000L).select(
        pmod(col("id"), lit(2000000L)).as("k"),
        col("id").as("ver"),
        when(pmod(col("id"), lit(7)) === 0, "D").otherwise("U").as("op"),
        (col("id") * 2).cast("double").as("val"))
      val net = graft.operators.Cdc.netChanges(
        log, Seq("k"), "ver", "op", lit(10000000L), lit(Long.MaxValue))
      println(s"PROBE cdc_net => rows=${net.count()}")
    }
    val _ = (labels, model)
    spark.stop()
  }
}
