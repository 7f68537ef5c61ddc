package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for [[graft.operators.MaterializedJoin]] — the
 * claim: maintaining a stored join view costs the CHANGE, not the
 * corpus. Honest accounting on both sides: fact (20M) and dim (1M)
 * live as parquet (as they would), and each strategy pays its own
 * WRITE — rebuild re-joins the grown bases and rewrites the whole
 * view; refresh computes only the three delta-join terms (old sides
 * scanned from storage, delta sides broadcast-sized) and APPENDS them.
 * The refresh's floor is one scan of each stored base (the A⋈ΔB /
 * ΔA⋈B old sides) — what bucketed/partitioned storage would prune —
 * but it never pays the base⋈base shuffle-join nor the 20M-row
 * rewrite. Equality: view ∪ appended-delta row count must equal the
 * rebuild's. PROBE lines recorded in COVERAGE.md.
 */
object ProbeMvJoinScale {
  def main(args: Array[String]): Unit = {
    val nFact = if (args.nonEmpty) args(0).toLong else 20000000L
    // arg 2: dim size. 1M broadcasts (refresh ≈ rebuild — both are one
    // fact scan); 10M+ forces the rebuild into a sort-merge of BOTH
    // bases while refresh still broadcasts its deltas — the shape
    // where delta maintenance actually pays.
    val nDim = if (args.length > 1) args(1).toLong else 1000000L
    val dFact = 100000L
    val dDim = 10000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def factGen(from: Long, n: Long) = spark.range(from, from + n).select(
      col("id").as("f_id"), pmod(hash(col("id"), lit(2)), lit(nDim + dDim)).as("k"),
      (col("id") % 1000L).as("v"))
    def dimGen(from: Long, n: Long) = spark.range(from, from + n).select(
      col("id").as("k"), (col("id") % 97L).as("attr"))

    val base = java.nio.file.Files.createTempDirectory("probe_mvjoin").toString
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    factGen(0, nFact).write.parquet(s"$base/fact")
    dimGen(0, nDim).write.parquet(s"$base/dim")
    val factOld = spark.read.parquet(s"$base/fact")
    val dimOld = spark.read.parquet(s"$base/dim")

    // bootstrap: build and STORE the view
    val (nView, tBuild) = time {
      graft.operators.MaterializedJoin.build(factOld, dimOld, Seq("k"))
        .write.mode("overwrite").parquet(s"$base/view")
      spark.read.parquet(s"$base/view").count()
    }
    println(f"PROBE build fact=$nFact dim=$nDim viewRows=$nView wall=$tBuild%.2fs")

    // refresh: compute ONLY the delta terms and append them
    val (nDelta, tRefresh) = time {
      val view0 = spark.read.parquet(s"$base/view").limit(0) // schema-only view head
      graft.operators.MaterializedJoin.refreshInserts(
        view0, factOld, dimOld,
        factGen(nFact, dFact), dimGen(nDim, dDim), Seq("k"))
        .write.mode("append").parquet(s"$base/view")
      spark.read.parquet(s"$base/view").count()
    }
    println(f"PROBE refresh dFact=$dFact dDim=$dDim viewRows=$nDelta wall=$tRefresh%.2fs " +
      f"(scan both bases once + broadcast deltas + append ${"%,d".format(nDelta - nView)} rows)")

    // retraction: anti-join the stored view on 100k provenance keys
    val (nRet, tRetract) = time {
      graft.operators.MaterializedJoin.retract(
        spark.read.parquet(s"$base/view"),
        factGen(0, dFact).select("f_id"), Seq("f_id")).count()
    }
    println(f"PROBE retract dels=$dFact rows=$nRet wall=$tRetract%.2fs")

    // rebuild: re-join the grown bases, rewrite the whole view
    val (nRebuild, tRebuild) = time {
      graft.operators.MaterializedJoin.build(
        factOld.unionByName(factGen(nFact, dFact)),
        dimOld.unionByName(dimGen(nDim, dDim)), Seq("k"))
        .write.mode("overwrite").parquet(s"$base/view_rebuilt")
      spark.read.parquet(s"$base/view_rebuilt").count()
    }
    println(f"PROBE rebuild rows=$nRebuild wall=$tRebuild%.2fs " +
      f"refreshSpeedup=${tRebuild / tRefresh}%.1fx")
    println(s"PROBE equal maintainedRows=${nDelta == nRebuild}")

    // bucketed store: the A⋈ΔB old-side scan prunes to the delta's
    // buckets (round-15: the MaterializedJoin.scala:29-31 claim
    // force-proven). A SMALL dim delta (8 keys, the common "few dim
    // rows changed" case) against the 64-bucket fact store should read
    // ≤8 buckets — SelectedBucketsCount in the plan — vs all 64 for
    // the unpruned scan, and the wall-clock should follow the I/O.
    graft.sources.Bucketing.writeBucketed(
      factGen(0, nFact), "probe_mvj_fact", "k", numBuckets = 64)
    // keep the bucketed read (and with it bucket pruning) on even when
    // the delta broadcast-joins — DisableUnnecessaryBucketedScan would
    // otherwise turn both off for this shape
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val factBkt = spark.table("probe_mvj_fact")
    val smallDimDelta = dimGen(nDim, 8).cache()
    smallDimDelta.count()
    val prunedOld = graft.operators.MaterializedJoin.oldSideKeyPruned(
      factBkt, smallDimDelta, Seq("k"))
    val planStr = prunedOld.join(smallDimDelta, Seq("k"))
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: \\d+ out of \\d+".r
      .findFirstIn(planStr).getOrElse("NONE")
    val (nPruned, tPruned) = time { prunedOld.join(smallDimDelta, Seq("k")).count() }
    val (nPlain, tPlain) = time { factBkt.join(smallDimDelta, Seq("k")).count() }
    println(f"PROBE bucketed [$sel] prunedTermRows=$nPruned wall=$tPruned%.2fs " +
      f"unprunedWall=$tPlain%.2fs speedup=${tPlain / tPruned}%.1fx equal=${nPruned == nPlain}")
    spark.sql("DROP TABLE IF EXISTS probe_mvj_fact")

    spark.stop()
  }
}
