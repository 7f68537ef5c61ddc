package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NanosTimestampPushdown: the implied raw-nanos bound reaches the
  * parquet scan, results stay exact at window boundaries, and the rule
  * is fixpoint-safe.
  *
  * The fixture is a self-written TIMESTAMP(NANOS)-style parquet (raw
  * long `ts`) derived from the real events table — the driver fixture
  * itself now ships native µs timestamps (covered by the last test:
  * native timestamps must push down with NO rewrite), while the rule
  * continues to guard genuinely nanos-typed sources. */
class PushdownSpec extends SparkSpec {

  /** events-shaped table whose `ts` is raw nanos-as-long on disk; read
    * back through the registry derivation (`Sources.table` LongType
    * branch: `timestamp_micros(ts div 1000)`). */
  private lazy val events = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.sources.Sources.table(spark, dir, "events")
  }

  test("time-range filters push an implied raw-nanos bound into PushedFilters") {
    for ((cond, op) <- Seq(
        (col("ts") >= lit("2024-01-10").cast("timestamp"), "GreaterThanOrEqual(ts,"),
        (col("ts") > lit("2024-01-10").cast("timestamp"), "GreaterThan(ts,"),
        (col("ts") < lit("2024-01-10").cast("timestamp"), "LessThan(ts,"),
        (col("ts") <= lit("2024-01-10").cast("timestamp"), "LessThanOrEqual(ts,"))) {
      val p = events.where(cond).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains(op), s"no implied pushdown for $cond:\n" + p.take(2500))
    }
  }

  test("results are exact at window boundaries (implied bound is a superset, exact filter remains)") {
    // count the same half-open window through the nanos derivation (rule
    // in play) and against the native-timestamp original — same rows
    val cutoff = "2024-01-10 00:00:00"
    val got = events.where(col("ts") >= lit(cutoff).cast("timestamp")).count()
    val expected = spark.read.parquet(s"$sfDir/events.parquet")
      .where(col("ts").cast("timestamp") >= lit(cutoff).cast("timestamp"))
      .count()
    assert(got == expected && got > 0 && got < events.count())
  }

  test("the rule is idempotent: one implied conjunct, not one per optimizer pass") {
    val p = events.where(col("ts") >= lit("2024-01-10").cast("timestamp"))
      .queryExecution.optimizedPlan.toString
    // exactly one raw-bound conjunct in the optimized condition
    val hits = "ts#\\d+L >= \\d{15,}".r.findAllIn(p).size
    assert(hits == 1, p)
  }

  test("post-2262 sentinel bounds emit no implied conjunct instead of overflowing negative") {
    // `m * 1000` for a year-9999 micros literal wraps a Long; an implied
    // `raw <= negative` conjunct would silently return zero rows. The
    // rule must skip the conjunct (the exact predicate remains, so
    // skipping is conservative) and the query must still see every row.
    val all = events.count()
    val sentinel = events.where(col("ts") <= lit("9999-12-31 00:00:00").cast("timestamp"))
    assert(sentinel.count() == all)
    val opt = sentinel.queryExecution.optimizedPlan.toString
    assert(!"ts#\\d+L <= -\\d+".r.findAllIn(opt).hasNext, opt)
    // and the lower-bound spelling: ts >= far-future keeps 0 rows but
    // must not wrap either (a wrapped negative lower bound would keep
    // ALL rows in the implied conjunct — harmless — while a wrapped
    // EqualTo pair could conflict; assert no negative literal appears)
    val hi = events.where(col("ts") === lit("9999-12-31 00:00:00").cast("timestamp"))
    assert(hi.count() == 0)
    assert(!"ts#\\d+L [<>]= -\\d+".r.findAllIn(hi.queryExecution.optimizedPlan.toString).hasNext)
  }

  test("equality bounds stay flat conjuncts inside the fixed point (no growth, both bounds pushed)") {
    // EqualTo adds TWO separate conjuncts; a nested And would re-split
    // next pass, fail the already-present check, and grow the condition
    // every iteration of the operator-optimization batch
    val df = events.where(col("ts") === lit("2024-01-10 12:00:00").cast("timestamp"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert("ts#\\d+L >= \\d{15,}".r.findAllIn(opt).size == 1, opt)
    assert("ts#\\d+L <= \\d{15,}".r.findAllIn(opt).size == 1, opt)
    val p = df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThanOrEqual(ts,"),
      p.take(2500))
  }

  test("native µs-timestamp events (driver fixture) push down with no rewrite") {
    // The registry's TimestampNTZ branch is a bare cast — the filter
    // must reach PushedFilters natively, and the optimized condition
    // must carry NO implied raw-long conjunct (nothing to imply).
    graft.sources.Sources.register(spark, sfDir)
    val df = spark.table("events")
      .where(col("ts") >= lit("2024-01-10").cast("timestamp"))
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("GreaterThanOrEqual(ts,"), p.take(2500))
    assert(!"ts#\\d+L >= \\d{15,}".r.findAllIn(df.queryExecution.optimizedPlan.toString).hasNext)
    assert(df.count() > 0)
  }
}
