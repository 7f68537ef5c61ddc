package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, op, value)
  private def changes(rows: (Long, Long, String, String)*) =
    rows.toDF("k", "ver", "op", "val")

  test("applyChangelog: last writer wins, deletes hide keys, reinsert after delete") {
    val log = changes(
      (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"), (1L, 2L, "U", "a2"), // out-of-order arrivals
      (2L, 1L, "U", "b1"), (2L, 2L, "D", ""),                        // deleted
      (3L, 1L, "U", "c1"), (3L, 2L, "D", ""), (3L, 5L, "U", "c5"))   // reinserted
    val state = Cdc.applyChangelog(log, Seq("k"), "ver", "op")
      .select("k", "ver", "val").as[(Long, Long, String)].collect().sortBy(_._1)
    assert(state.toSeq == Seq((1L, 3L, "a3"), (3L, 5L, "c5")))
  }

  test("scd2History: intervals chain per key, deletes close without a row, reinsert reopens") {
    val log = changes(
      (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"), (1L, 2L, "U", "a2"),
      (2L, 1L, "U", "b1"), (2L, 2L, "D", ""),   // deleted: only closed history
      (2L, 5L, "U", "b5"),                       // reinserted: new open row
      (3L, 4L, "U", "c4"))
    val h = Cdc.scd2History(log, Seq("k"), "ver", "op")
      .select("k", "valid_from", "valid_to", "val", "is_current")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3), r.getBoolean(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(h === Seq(
      (1L, 1L, Some(2L), "a1", false),
      (1L, 2L, Some(3L), "a2", false),
      (1L, 3L, None, "a3", true),
      (2L, 1L, Some(2L), "b1", false), // closed by the delete at v2
      (2L, 5L, None, "b5", true),      // reopened after the delete
      (3L, 4L, None, "c4", true)))
    // contract: current slice of the history == the materialized state
    val current = Cdc.scd2History(log, Seq("k"), "ver", "op")
      .where($"is_current").select("k", "val").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val state = Cdc.applyChangelog(log, Seq("k"), "ver", "op")
      .select("k", "val").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(current === state)
  }

  test("scd2Apply: incremental fold equals the full-log rebuild (refresh ≡ rebuild)") {
    val prefix = changes(
      (1L, 1L, "U", "a1"), (1L, 2L, "U", "a2"), // key 1: open at a2
      (2L, 1L, "U", "b1"),                       // key 2: open, untouched by the batch
      (3L, 1L, "U", "c1"), (3L, 2L, "D", ""))    // key 3: fully closed (delete)
    val suffix = changes(
      (1L, 5L, "U", "a5"),                       // extends key 1: closes a2 at 5
      (3L, 6L, "U", "c6"),                       // reopens the deleted key 3
      (4L, 7L, "U", "d7"), (4L, 8L, "D", ""),    // new key, deleted inside the batch
      (5L, 9L, "U", "e9"))                       // brand-new open key
    val applied = Cdc.scd2Apply(
      Cdc.scd2History(prefix, Seq("k"), "ver", "op"),
      suffix, Seq("k"), "ver", "op")
    val rebuilt = Cdc.scd2History(prefix.unionByName(suffix), Seq("k"), "ver", "op")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "valid_from", "valid_to", "val", "is_current")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3), r.getBoolean(4)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(applied) === canon(rebuilt))
    // the boundary really happened: a2 closed at the batch's version 5
    assert(canon(applied).contains((1L, 2L, Some(5L), "a2", false)))
    // untouched key 2 still open; in-batch delete left key 4 closed
    assert(canon(applied).contains((2L, 1L, None, "b1", true)))
    assert(canon(applied).contains((4L, 7L, Some(8L), "d7", false)))
  }

  test("scd2AsOf time travel equals the changelog snapshot at every cutoff") {
    val log = changes(
      (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"), (1L, 6L, "D", ""),
      (2L, 2L, "U", "b2"), (2L, 5L, "U", "b5"),
      (3L, 4L, "U", "c4"))
    val hist = Cdc.scd2History(log, Seq("k"), "ver", "op")
    (1L to 7L).foreach { v =>
      val served = Cdc.scd2AsOf(hist, lit(v)).select("k", "val").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val snap = Cdc.snapshotAsOf(log, Seq("k"), "ver", "op", lit(v))
        .select("k", "val").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(served === snap, s"as-of $v")
    }
  }

  test("streaming SCD2 maintenance: per-batch scd2Apply folds equal the full-log build") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val b1 = Seq((1L, 1L, "U", "a1"), (2L, 2L, "U", "b2"), (1L, 3L, "U", "a3"))
    val b2 = Seq((1L, 5L, "D", ""), (3L, 6L, "U", "c6"), (2L, 7L, "U", "b7"))
    val in = MemoryStream[(Long, Long, String, String)]
    // history state held across batches, maintained by scd2Apply —
    // the foreachBatch shape of a streaming SCD2 maintainer (each
    // micro-batch carries strictly newer versions, which event order
    // guarantees for an append-only changelog)
    var hist = Cdc.scd2History(
      changes(), Seq("k"), "ver", "op").localCheckpoint(true)
    val q = in.toDF().toDF("k", "ver", "op", "val")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty)
          hist = Cdc.scd2Apply(hist, b, Seq("k"), "ver", "op").localCheckpoint(true)
        ()
      }.start()
    in.addData(b1: _*); q.processAllAvailable()
    in.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val rebuilt = Cdc.scd2History(changes(b1 ++ b2: _*), Seq("k"), "ver", "op")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "valid_from", "valid_to", "val", "is_current")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3), r.getBoolean(4)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(canon(hist) === canon(rebuilt))
  }

  test("temporal dimension enrichment: facts join the SCD2 interval containing their event version") {
    // the consumption shape SCD2 history exists FOR: each fact picks
    // the dimension image valid AT its own time — one containment
    // predicate on the history, equal to per-fact snapshotAsOf
    val log = changes(
      (1L, 1L, "U", "a1"), (1L, 4L, "U", "a4"), (1L, 8L, "D", ""),
      (2L, 2L, "U", "b2"))
    val hist = Cdc.scd2History(log, Seq("k"), "ver", "op")
    val facts = Seq((10L, 1L, 1L), (11L, 1L, 5L), (12L, 1L, 9L), (13L, 2L, 3L))
      .toDF("fact_id", "k", "at_ver")
    val enriched = facts.join(hist,
        facts("k") === hist("k") &&
          col("valid_from") <= col("at_ver") &&
          (col("valid_to").isNull || col("valid_to") > col("at_ver")),
        "left")
      .select(col("fact_id"), col("val"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(enriched === Set(
      (10L, Some("a1")),  // at 1: first image
      (11L, Some("a4")),  // at 5: second image
      (12L, None),        // at 9: key deleted at 8 — no valid image
      (13L, Some("b2"))))
    // agreement with per-fact snapshotAsOf on the matched rows
    facts.collect().foreach { f =>
      val (k, v) = (f.getLong(1), f.getLong(2))
      val snap = Cdc.snapshotAsOf(log, Seq("k"), "ver", "op", lit(v))
        .where($"k" === k).select("val").collect().headOption.map(_.getString(0))
      val got = enriched.collectFirst { case (id, x) if id == f.getLong(0) => x }.get
      assert(got === snap, s"fact ${f.getLong(0)}")
    }
  }

  test("snapshotAsOf reconstructs historical state at any version cutoff") {
    val log = changes(
      (1L, 1L, "U", "a1"), (1L, 4L, "U", "a4"),
      (2L, 2L, "U", "b2"), (2L, 3L, "D", ""))
    def at(v: Long) = Cdc.snapshotAsOf(log, Seq("k"), "ver", "op", lit(v))
      .select("k", "val").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(at(1) == Seq((1L, "a1")))
    assert(at(2) == Seq((1L, "a1"), (2L, "b2")))
    assert(at(3) == Seq((1L, "a1")))          // key 2 deleted at v3
    assert(at(4) == Seq((1L, "a4")))
  }

  test("netChanges classifies insert/update/delete and drops unchanged keys") {
    val log = changes(
      (1L, 1L, "U", "same"),                  // unchanged across the window
      (2L, 1L, "U", "old"), (2L, 5L, "U", "new"),   // updated
      (3L, 5L, "U", "born"),                  // inserted after v2
      (4L, 1L, "U", "gone"), (4L, 5L, "D", ""))     // deleted after v2
    val net = Cdc.netChanges(log, Seq("k"), "ver", "op", lit(2L), lit(9L))
      .select("k", "net_op", "val").as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(net == Seq((2L, "U", "new"), (3L, "I", "born"), (4L, "D", "gone")))
  }

  test("null payload values do not read as key-absent in netChanges") {
    val log = Seq(
      (1L, 1L, "U", Option.empty[String]),    // present with NULL payload before and after
      (2L, 3L, "U", Option("x")))             // inserted
    .toDF("k", "ver", "op", "val")
    val net = Cdc.netChanges(log, Seq("k"), "ver", "op", lit(2L), lit(9L))
      .select("k", "net_op").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(net == Seq((2L, "I"))) // key 1 unchanged (NULL = NULL), not D/I
  }

  test("version ties break deterministically (op, then payload) and never flap") {
    val log = changes((1L, 7L, "U", "alpha"), (1L, 7L, "U", "zeta"))
    val r1 = Cdc.applyChangelog(log, Seq("k"), "ver", "op").select("val").as[String].head()
    val r2 = Cdc.applyChangelog(log.orderBy(desc("val")), Seq("k"), "ver", "op")
      .select("val").as[String].head()
    assert(r1 == "zeta" && r2 == "zeta") // lexicographic max of the payload
  }

  test("streaming materialization equals the batch reduction over the same records") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, 1L, "U", "a1"), (1L, 3L, "U", "a3"),
      (2L, 1L, "U", "b1"), (2L, 2L, "D", ""),
      (3L, 4L, "U", "c4"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String, String)]
    input.addData(rows: _*)
    val q = graft.streaming.Streams.applyChangelogStream(
        input.toDF().toDF("k", "ver", "op", "val"), Seq("k"), "ver", "op")
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("cdc_stream")
      .select("k", "ver", "val").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val batch = Cdc.applyChangelog(changes(rows: _*), Seq("k"), "ver", "op")
      .select("k", "ver", "val").as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
    assert(streamed == Seq((1L, 3L, "a3"), (3L, 4L, "c4")))
  }

  test("plan: materialization is one partial+final aggregate, no window sort of the changelog") {
    val log = changes((1L, 1L, "U", "a"))
    val plan = Cdc.applyChangelog(log, Seq("k"), "ver", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_max") || plan.contains("partial"), plan)
  }
}
