package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedAggSpec extends SparkSpec {
  import spark.implicits._

  // (group, measure)
  private def rows(rs: (String, Long)*): DataFrame = rs.toDF("g", "v")

  private def collectState(df: DataFrame): Seq[(String, Long, Long, Long, Long)] =
    df.select(col("g"), col("n"), col("sum_v"), col("min_v"), col("max_v"))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("build produces count/sum/min/max per group") {
    val st = collectState(MaterializedAgg.build(
      rows(("a", 1L), ("a", 5L), ("b", 7L)), Seq("g"), "v"))
    assert(st == Seq(("a", 2L, 6L, 1L, 5L), ("b", 1L, 7L, 7L, 7L)))
  }

  test("refresh equals a full rebuild on a mixed insert/delete batch") {
    val base = rows(("a", 1L), ("a", 5L), ("a", 9L), ("b", 7L), ("c", 3L), ("c", 4L))
    val inserts = rows(("a", 2L), ("d", 11L))            // existing + new group
    val deletes = rows(("a", 1L), ("c", 3L), ("c", 4L))  // min hit + full-group delete
    val current = base.exceptAll(deletes).unionAll(inserts)
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(base, Seq("g"), "v"),
      inserts, deletes, current, Seq("g"), "v")
    assert(collectState(refreshed) == collectState(
      MaterializedAgg.build(current, Seq("g"), "v")))
  }

  test("fully-deleted groups drop out; insert-born groups appear") {
    val base = rows(("a", 1L), ("b", 2L))
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(base, Seq("g"), "v"),
      rows(("z", 10L), ("z", 20L)), rows(("b", 2L)),
      rows(("a", 1L), ("z", 10L), ("z", 20L)), Seq("g"), "v")
    assert(collectState(refreshed) ==
      Seq(("a", 1L, 1L, 1L, 1L), ("z", 2L, 30L, 10L, 20L)))
  }

  test("deleting the stored extreme recomputes only affected groups (broadcast semi-join)") {
    val base = rows(("a", 1L), ("a", 5L), ("b", 2L), ("b", 8L))
    val deletes = rows(("a", 1L))            // a's min goes; b untouched
    val current = base.exceptAll(deletes)
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(base, Seq("g"), "v"),
      rows(), deletes, current, Seq("g"), "v")
    assert(collectState(refreshed) ==
      Seq(("a", 1L, 5L, 5L, 5L), ("b", 2L, 10L, 2L, 8L)))
    val plan = refreshed.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("Broadcast"), plan)
  }

  test("interior deletes merge algebraically (no extreme touched)") {
    val base = rows(("a", 1L), ("a", 4L), ("a", 9L))
    val deletes = rows(("a", 4L))
    val current = base.exceptAll(deletes)
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(base, Seq("g"), "v"),
      rows(), deletes, current, Seq("g"), "v")
    assert(collectState(refreshed) == Seq(("a", 2L, 10L, 1L, 9L)))
  }

  test("null measures count toward n, never toward extremes, and trigger no recompute") {
    val base = Seq(("a", Option(3L)), ("a", Option.empty[Long])).toDF("g", "v")
    val st = MaterializedAgg.build(base, Seq("g"), "v")
    val deletes = Seq(("a", Option.empty[Long])).toDF("g", "v")
    val current = Seq(("a", Option(3L))).toDF("g", "v")
    val refreshed = MaterializedAgg.refresh(st, current.limit(0), deletes, current, Seq("g"), "v")
    assert(collectState(refreshed) == Seq(("a", 1L, 3L, 3L, 3L)))
  }

  test("state carries the non-null measure count (cnt_v) and refresh keeps it retractable") {
    val base = Seq(("a", Option(3L)), ("a", Option.empty[Long]), ("a", Option(5L)))
      .toDF("g", "v")
    val st = MaterializedAgg.build(base, Seq("g"), "v")
    assert(st.columns.toSeq == Seq("g") ++ MaterializedAgg.StateCols)
    assert(st.select("n", "cnt_v").as[(Long, Long)].collect().toSeq == Seq((3L, 2L)))
    // delete a null row and a non-null row: n drops by 2, cnt by 1
    val deletes = Seq(("a", Option.empty[Long]), ("a", Option(3L))).toDF("g", "v")
    val current = Seq(("a", Option(5L))).toDF("g", "v")
    val refreshed = MaterializedAgg.refresh(
      st, current.limit(0), deletes, current, Seq("g"), "v")
    assert(refreshed.select("n", "cnt_v", "sum_v")
      .as[(Long, Long, Long)].collect().toSeq == Seq((1L, 1L, 5L)))
  }

  test("multi-measure refresh equals a full rebuild (per-measure cnt/sum/min/max, shared recompute)") {
    val mk = (rs: Seq[(String, Long, Option[Long])]) => rs.toDF("g", "v1", "v2")
    val base = mk(Seq(("a", 1L, Some(10L)), ("a", 5L, None), ("a", 9L, Some(2L)),
      ("b", 7L, Some(7L)), ("c", 3L, None), ("c", 4L, Some(1L))))
    val inserts = mk(Seq(("a", 2L, Some(20L)), ("d", 11L, None)))
    val deletes = mk(Seq(("a", 1L, Some(10L)), ("c", 3L, None), ("c", 4L, Some(1L))))
    val current = base.exceptAll(deletes).unionAll(inserts)
    val refreshed = MaterializedAgg.refreshMulti(
      MaterializedAgg.buildMulti(base, Seq("g"), Seq("v1", "v2")),
      inserts, deletes, current, Seq("g"), Seq("v1", "v2"))
    val rebuilt = MaterializedAgg.buildMulti(current, Seq("g"), Seq("v1", "v2"))
    assert(refreshed.columns.toSeq == rebuilt.columns.toSeq)
    val cols = refreshed.columns.map(col)
    def dump(df: DataFrame) =
      df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
    assert(dump(refreshed) == dump(rebuilt), s"${dump(refreshed)} vs ${dump(rebuilt)}")
  }

  test("composes with Cdc snapshots: refresh across a version window matches the later snapshot's rebuild") {
    val log = Seq(
      (1L, 1L, "U", 10L), (2L, 1L, "U", 20L), (3L, 1L, "U", 30L),
      (2L, 5L, "D", 0L), (4L, 6L, "U", 40L)).toDF("k", "ver", "op", "v")
      .withColumn("g", lit("all"))
    val before = Cdc.snapshotAsOf(log, Seq("k"), "ver", "op", lit(2L)).select("g", "v")
    val after = Cdc.applyChangelog(log, Seq("k"), "ver", "op").select("g", "v")
    val inserts = after.exceptAll(before)
    val deletes = before.exceptAll(after)
    val refreshed = MaterializedAgg.refresh(
      MaterializedAgg.build(before, Seq("g"), "v"),
      inserts, deletes, after, Seq("g"), "v")
    assert(collectState(refreshed) == collectState(
      MaterializedAgg.build(after, Seq("g"), "v")))
  }
}
