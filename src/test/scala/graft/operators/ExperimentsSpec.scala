package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExperimentsSpec extends SparkSpec {
  import spark.implicits._

  // users 0,2 control; 1,3 treatment; conversion = >=2 'buy' events
  private val events = Seq(
    (0L, "buy"), (0L, "buy"), (0L, "view"),   // control, converts
    (2L, "buy"), (2L, "view"),                // control, 1 buy: no
    (1L, "buy"), (1L, "buy"),                 // treatment, converts
    (3L, "view"), (3L, "view")                // treatment, no
  ).toDF("user_id", "event_type")

  test("abConversion: hand-computed two-proportion z") {
    val r = Experiments.abConversion(events, "user_id",
      pmod(col("user_id"), lit(2)), col("event_type") === "buy",
      minConversions = 2L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (2L, 2L, 1L, 1L))
    // micro-unit BIGINT rates (the hashed surface is pure-integer)
    assert(r.getLong(4) == 500000L && r.getLong(5) == 500000L && r.getLong(6) == 0L)
    assert(r.getDouble(7) == 0.0) // identical rates → z = 0
    // plant a difference: make user 3 convert too → lift 0.5
    val boosted = events.union(Seq((3L, "buy"), (3L, "buy")).toDF("user_id", "event_type"))
    val r2 = Experiments.abConversion(boosted, "user_id",
      pmod(col("user_id"), lit(2)), col("event_type") === "buy", 2L).collect()(0)
    assert(r2.getLong(6) == 500000L)
    // z = 0.5 / sqrt(0.75*0.25*(1/2+1/2)) = 1.1547
    assert(math.abs(r2.getDouble(7) - 1.1547) < 1e-4)
  }

  test("abConversion: zero-variance pool (all convert) reports z = 0, not NaN") {
    val all = Seq((0L, "buy"), (1L, "buy")).toDF("user_id", "event_type")
    val r = Experiments.abConversion(all, "user_id",
      pmod(col("user_id"), lit(2)), col("event_type") === "buy").collect()(0)
    assert(r.getDouble(7) == 0.0 && r.getLong(6) == 0L)
  }

  test("abConversion is one pass: single user-keyed aggregate, no join") {
    val plan = Experiments.abConversion(events, "user_id",
      pmod(col("user_id"), lit(2)), col("event_type") === "buy")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }
}
