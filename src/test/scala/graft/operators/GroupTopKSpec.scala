package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupTopKSpec extends SparkSpec {
  import spark.implicits._

  private def events = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("events")
  }

  test("top-k per group equals the window row_number plan") {
    val viaAgg = GroupTopK.topKPerGroup(events, Seq("user_id"), "value", "event_id", k = 3)
      .select("user_id", "rank", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    val viaWindow = events
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(w).as("rank"))
      .where(col("rank") <= 3)
      .select("user_id", "rank", "event_id", "value")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("heap merge across many partitions stays correct (forced repartition)") {
    val sprayed = events.repartition(16)
    val a = GroupTopK.topKPerGroup(sprayed, Seq("user_id"), "value", "event_id", k = 5)
      .select("user_id", "rank", "event_id").collect().map(_.toString).sorted
    val b = GroupTopK.topKPerGroup(events.coalesce(1), Seq("user_id"), "value", "event_id", k = 5)
      .select("user_id", "rank", "event_id").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 7.0), (2L, 20L, 1.0))
      .toDF("g", "id", "v")
    val out = GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 10)
      .orderBy("g", "rank").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 11L && out(0).getInt(1) == 1) // 7.0 first
    assert(out(1).getLong(2) == 10L && out(1).getInt(1) == 2)
    assert(out(2).getLong(2) == 20L && out(2).getInt(1) == 1)
  }

  test("ties rank deterministically to the smaller id") {
    val df = Seq((1L, 12L, 5.0), (1L, 10L, 5.0), (1L, 11L, 5.0)).toDF("g", "id", "v")
    val out = GroupTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 11L))
  }

  test("plans as partial+final ObjectHashAggregate with no WindowExec") {
    val plan = GroupTopK.topKPerGroup(events, Seq("user_id"), "value", "event_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_top_k_by_value"), plan)
    assert(!plan.contains("Window"), plan)
    // the full-row sort a window plan would need must not exist before
    // the aggregate; the only exchange is the group-key shuffle
    assert(!plan.contains("Sort [value"), plan)
  }
}
