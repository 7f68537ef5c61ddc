package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // points 0..999; intervals of mixed widths incl. one huge interval
  lazy val points = spark.range(1000).select($"id".cast("double").as("p"), $"id".as("point_id"))
  lazy val intervals = Seq(
    (1L, 10.0, 19.0),    // 10 points
    (2L, 100.0, 104.0),  // 5 points
    (3L, 500.0, 500.0),  // 1 point
    (4L, 0.0, 999.0),    // huge: exercises the broadcast fallback
    (5L, 2000.0, 2100.0) // matches nothing
  ).toDF("iv_id", "lo", "hi")

  def naive: Set[(Long, Long)] =
    points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select("point_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("binned range join equals the naive inequality join") {
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
      Some(RangeJoin.Config(binWidth = 8.0, maxBinsPerInterval = 16)))
      .select("point_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == naive)
    assert(out.size == 10 + 5 + 1 + 1000)
  }

  test("main path plans a hash join on the bin, not a nested loop") {
    val narrowOnly = intervals.where($"iv_id" =!= 4L)
    val plan = RangeJoin.pointInInterval(points, narrowOnly, "p", "lo", "hi",
      Some(RangeJoin.Config(binWidth = 8.0, maxBinsPerInterval = 16)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("auto bin width from interval statistics") {
    val w = RangeJoin.suggestBinWidth(intervals, "lo", "hi")
    assert(w > 0)
    val out = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi")
      .select("point_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == naive)
  }
}
