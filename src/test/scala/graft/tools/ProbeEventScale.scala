package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for the event-analytics family at 50M events /
 * 1M users / 60 days — the r10/r11 methodology: exercise the
 * distributed paths where data cost, not scheduler overhead,
 * dominates. Prints PROBE lines; numbers recorded in COVERAGE.md.
 */
object ProbeEventScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 50000000L
    val users = 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic log: 60 days, 5 types, heavy-ish users
    val types = Seq("signup", "click", "purchase", "view", "error")
    val events = spark.range(n).select(
      col("id").as("event_id"),
      (lit(1704067200L) + pmod(hash(col("id"), lit(1)), lit(60L * 86400)))
        .cast("timestamp").as("ts"),
      pmod(hash(col("id"), lit(2)), lit(users)).as("user_id"),
      element_at(typedLit(types), (pmod(hash(col("id"), lit(3)), lit(5)) + 1).cast("int"))
        .as("event_type"),
      (pmod(hash(col("id"), lit(4)), lit(10000)).cast("double") / 100.0).as("value"))
    // NOT materialized: the frame is a pure projection of range(), so
    // each operator pays its own honest corpus scan (and 50M cached
    // rows would not fit the probe JVM anyway)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (fr, t1) = time {
      graft.operators.EventAnalytics.funnel(events, "user_id", "ts",
        "event_type", Seq("signup", "click", "purchase"))
        .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    }
    println(f"PROBE funnel n=$n wall=$t1%.2fs steps=$fr")

    val (rc, t2) = time {
      graft.operators.EventAnalytics.retentionCohorts(events, "user_id", "ts").count()
    }
    println(f"PROBE retention_exact n=$n wall=$t2%.2fs cells=$rc")

    val (rs, t3) = time {
      graft.operators.EventAnalytics.rollingRetentionSketch(events, "user_id", "ts",
        Seq(1, 7)).count()
    }
    println(f"PROBE retention_sketch n=$n wall=$t3%.2fs cells=$rs")

    // uniform values bound |z| at sqrt(3)≈1.732, so the threshold sits
    // just inside the support to exercise nonzero flagging volume
    val (an, t4) = time {
      graft.operators.EventAnalytics.anomalyZscores(events, "event_type", "value",
        Seq("event_id"), threshold = 1.72).count()
    }
    println(f"PROBE anomaly n=$n wall=$t4%.2fs flagged=$an")

    val (ro, t5) = time {
      graft.operators.EventAnalytics.rollingDailyStats(events, "event_type", "ts",
        "value", windowDays = 7).count()
    }
    println(f"PROBE rolling_stats n=$n wall=$t5%.2fs rows=$ro")

    // window-per-user at 1M partitions over 50M rows
    val (tr, t6) = time {
      graft.operators.EventAnalytics.eventTransitions(events, "user_id", "ts",
        "event_type", "event_id").count()
    }
    println(f"PROBE transitions n=$n wall=$t6%.2fs pairs=$tr")

    // basket self-join keyed on (user, day): ~50M distinct basket rows
    val (co, t7) = time {
      graft.operators.EventAnalytics.typeCooccurrence(events, "user_id", "ts",
        "event_type").count()
    }
    println(f"PROBE cooccurrence n=$n wall=$t7%.2fs pairs=$co")
    spark.stop()
  }
}
