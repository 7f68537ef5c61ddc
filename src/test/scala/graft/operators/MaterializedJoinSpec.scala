package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaterializedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0), (4L, 30L, 9.0)
  ).toDF("id", "k", "v")
  private def dims = Seq((10L, "a"), (20L, "b")).toDF("k", "label")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "k", "v", "label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet

  test("refreshInserts equals a rebuild over the grown states") {
    val aIns = Seq((5L, 10L, 2.0), (6L, 40L, 3.0)).toDF("id", "k", "v")
    val bIns = Seq((30L, "c"), (40L, "d")).toDF("k", "label")
    val view = MaterializedJoin.build(facts, dims, Seq("k"))
    val refreshed = MaterializedJoin.refreshInserts(
      view, facts, dims, aIns, bIns, Seq("k"))
    val rebuilt = MaterializedJoin.build(
      facts.unionByName(aIns), dims.unionByName(bIns), Seq("k"))
    assert(rows(refreshed) === rows(rebuilt))
    // the ΔA⋈ΔB term is real: fact 6 joins dim 40, both insert-born
    assert(rows(refreshed).exists(_._1 == 6L))
    // fact 4 (k=30) only matches through the dim INSERT — the A⋈ΔB term
    assert(rows(refreshed).exists(_._1 == 4L))
  }

  test("retract removes exactly the deleted provenance rows, null-safely") {
    val withNull = facts.unionByName(
      Seq[(java.lang.Long, Long, Double)]((null, 10L, 0.0))
        .toDF("id", "k", "v").select(col("id").cast("long"), col("k"), col("v")))
    val view = MaterializedJoin.build(withNull, dims, Seq("k"))
    val dels = Seq[java.lang.Long](2L, null)
      .toDF("id").select(col("id").cast("long"))
    val kept = MaterializedJoin.retract(view, dels, Seq("id"))
    val ids = kept.select("id").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    // row 2 and the NULL-keyed row are gone; 1 and 3 remain (4 had no dim)
    assert(ids === Set(Some(1L), Some(3L)))
  }

  test("applyUpdatesA equals a rebuild over the updated A state") {
    val view = MaterializedJoin.build(facts, dims, Seq("k"))
    // update rows 2 and 3 in place: new values, same keys
    val upd = Seq((2L, 10L, 70.0), (3L, 20L, 10.0)).toDF("id", "k", "v")
    val maintained = MaterializedJoin.applyUpdatesA(
      view, dims, upd, Seq("k"), Seq("id"))
    val rebuilt = MaterializedJoin.build(
      facts.where(!col("id").isin(2L, 3L)).unionByName(upd), dims, Seq("k"))
    assert(rows(maintained) === rows(rebuilt))
    // the updated image won, not the stale one
    assert(rows(maintained).exists(r => r._1 == 2L && r._3 == 70.0))
  }

  test("applyUpdatesA moves a row across join keys (key-changing update)") {
    val view = MaterializedJoin.build(facts, dims, Seq("k"))
    // row 1 migrates from dim 10 to dim 20 — retraction is by
    // provenance id, so the stale (k=10) image goes away entirely
    val upd = Seq((1L, 20L, 5.5)).toDF("id", "k", "v")
    val maintained = MaterializedJoin.applyUpdatesA(
      view, dims, upd, Seq("k"), Seq("id"))
    val r1 = rows(maintained).filter(_._1 == 1L)
    assert(r1 === Set((1L, 20L, 5.5, "b")))
  }

  test("refreshInsertsPruned equals refreshInserts; oversized key sets fall back unfiltered") {
    val aIns = Seq((5L, 10L, 2.0), (6L, 40L, 3.0)).toDF("id", "k", "v")
    val bIns = Seq((30L, "c"), (40L, "d")).toDF("k", "label")
    val view = MaterializedJoin.build(facts, dims, Seq("k"))
    val pruned = MaterializedJoin.refreshInsertsPruned(
      view, facts, dims, aIns, bIns, Seq("k"))
    val plain = MaterializedJoin.refreshInserts(
      view, facts, dims, aIns, bIns, Seq("k"))
    assert(rows(pruned) === rows(plain))
    // maxKeys = 1 forces the fallback on both 2-key deltas — still equal
    val fallback = MaterializedJoin.refreshInsertsPruned(
      view, facts, dims, aIns, bIns, Seq("k"), maxKeys = 1)
    assert(rows(fallback) === rows(plain))
    // composite keys skip pruning entirely (single-column contract)
    assert(MaterializedJoin.oldSideKeyPruned(
      facts, aIns, Seq("k", "id")).count() === facts.count())
  }

  test("oldSideKeyPruned reads only the delta's buckets from a bucketed store") {
    graft.sources.Bucketing.writeBucketed(facts, "mvj_fact_bkt", "k", numBuckets = 8)
    // DisableUnnecessaryBucketedScan turns the bucketed read off for a
    // bare filter scan (no operator needs the distribution) — and with
    // it, bucket PRUNING. A store serving pruned delta lookups pins
    // the scan on, as here.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val bIns = Seq((10L, "z")).toDF("k", "label")
      val prunedScan = MaterializedJoin.oldSideKeyPruned(
        spark.table("mvj_fact_bkt"), bIns, Seq("k"))
      val plan = prunedScan.queryExecution.executedPlan.toString
      // the IN filter on the bucket column turns into bucket pruning:
      // one key → one selected bucket out of 8
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(1500))
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS mvj_fact_bkt")
    }
  }

  test("refresh plan never re-joins the stored view — it only unions and anti-joins") {
    val aIns = Seq((5L, 10L, 2.0)).toDF("id", "k", "v")
    val bIns = Seq((40L, "d")).toDF("k", "label")
    // stand-in for a STORED view: a local frame not derived from a/b
    val stored = Seq((1L, 10L, 5.0, "a")).toDF("id", "k", "v", "label")
    val refreshed = MaterializedJoin.refreshInserts(
      stored, facts, dims, aIns, bIns, Seq("k"))
    val plan = refreshed.queryExecution.executedPlan.toString
    // exactly the three delta joins; the view contributes via Union only
    assert("Join".r.findAllIn(plan).size <= 3, plan.take(1200))
    assert(plan.contains("Union"))
  }
}
