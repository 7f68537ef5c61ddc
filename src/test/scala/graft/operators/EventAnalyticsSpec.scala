package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1 completes the whole funnel in order; user 2 does the steps
  // OUT of order (click before signup — must not count past step 1);
  // user 3 signs up only; user 4 never signs up
  lazy val fixture = Seq(
    (1L, ts("2024-01-01 10:00:00"), "signup", 1.0),
    (1L, ts("2024-01-02 10:00:00"), "click", 1.0),
    (1L, ts("2024-01-03 10:00:00"), "purchase", 1.0),
    (2L, ts("2024-01-01 09:00:00"), "click", 1.0),
    (2L, ts("2024-01-01 10:00:00"), "signup", 1.0),
    (2L, ts("2024-01-02 10:00:00"), "purchase", 1.0),
    (3L, ts("2024-01-05 10:00:00"), "signup", 1.0),
    (4L, ts("2024-01-01 10:00:00"), "view", 1.0)
  ).toDF("user_id", "ts", "event_type", "value")

  test("funnel: strict ordering — out-of-order steps do not count") {
    val out = EventAnalytics.funnel(fixture, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase"))
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // step1: users 1,2,3 signed up; step2: only user 1 clicked AFTER
    // signup (user 2's click preceded it); step3: only user 1
    assert(out.toSeq == Seq(
      (1, "signup", 3L, 1.0), (2, "click", 1L, 0.3333), (3, "purchase", 1L, 0.3333)))
  }

  test("funnel with an unreachable first step returns zero rows per step, conv 0") {
    val out = EventAnalytics.funnel(fixture, "user_id", "ts", "event_type",
      Seq("refund", "signup")).orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0))
  }

  test("retentionCohorts: offsets and retained fractions are exact") {
    val out = EventAnalytics.retentionCohorts(fixture, "user_id", "ts")
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // cohort 2024-01-01 = users 1,2,4 (3 users): day0 all 3 active,
    // day1 users 1,2, day2 user 1; cohort 2024-01-05 = user 3 day0
    assert(out.toSeq == Seq(
      ("2024-01-01", 0, 3L, 1.0), ("2024-01-01", 1, 2L, 0.6667),
      ("2024-01-01", 2, 1L, 0.3333), ("2024-01-05", 0, 1L, 1.0)))
  }

  test("rollingRetentionSketch equals the exact day-pair intersections on the fixture") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"user_id", $"ts")
    val got = EventAnalytics.rollingRetentionSketch(events, "user_id", "ts", Seq(1, 7))
      .orderBy("day", "day_offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // exact gold: distinct (day, user) self-joined at the same offsets
    val act = events.select(to_date($"ts").as("day"), $"user_id").distinct()
      .localCheckpoint()
    val exact = Seq(1, 7).flatMap { k =>
      val b = act.select(col("day").as("day2"), col("user_id").as("uid2"))
      act.join(b, col("day2") === date_add(col("day"), k) && col("user_id") === col("uid2"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("n_both"))
        .collect().map(r => (r.getDate(0).toString, k) -> r.getLong(1))
    }.toMap
    val dayN = act.groupBy("day").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (day, k, nDay, nRet, ret) =>
      assert(nDay == dayN(day), s"$day n_day")
      assert(nRet == exact.getOrElse((day, k), 0L), s"$day+$k n_retained")
      assert(math.abs(ret - nRet.toDouble / nDay) < 1e-4)
    }
  }

  test("funnelTiming: hours between step completions, hand-computed") {
    val out = EventAnalytics.funnelTiming(fixture, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase")).orderBy("transition").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // only user 1 converts in order: signup→click 24h, click→purchase 24h
    assert(out.toSeq == Seq(
      ("click→purchase", 1L, 24.0, 24.0), ("signup→click", 1L, 24.0, 24.0)))
  }

  test("eventTransitions: per-user ordered pairs with conditional probabilities") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1L),
      (1L, ts("2024-01-01 11:00:00"), "b", 2L),
      (1L, ts("2024-01-01 12:00:00"), "a", 3L),
      (2L, ts("2024-01-01 10:00:00"), "a", 4L),
      (2L, ts("2024-01-01 11:00:00"), "c", 5L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.eventTransitions(df, "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // a→b (user1), a→c (user2), b→a (user1): P(b|a)=P(c|a)=0.5, P(a|b)=1
    assert(out.toSeq == Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("eventTransitions breaks timestamp ties by the id column") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq((1L, t0, "x", 2L), (1L, t0, "y", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val out = EventAnalytics.eventTransitions(df, "user_id", "ts", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("y", "x"))) // id 1 ('y') precedes id 2 ('x')
  }

  test("typeCooccurrence: hand-computed support/confidence/lift over (user, day) baskets") {
    // baskets: (1, d1)={a,b}, (1, d2)={a}, (2, d1)={a,b,c} → 3 baskets
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a", 1.0), (1L, ts("2024-01-01 11:00:00"), "b", 1.0),
      (1L, ts("2024-01-01 11:30:00"), "b", 1.0), // dup type in basket: ignored
      (1L, ts("2024-01-02 10:00:00"), "a", 1.0),
      (2L, ts("2024-01-01 10:00:00"), "a", 1.0), (2L, ts("2024-01-01 11:00:00"), "b", 1.0),
      (2L, ts("2024-01-01 12:00:00"), "c", 1.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = EventAnalytics.typeCooccurrence(df, "user_id", "ts", "event_type")
      .orderBy("type_a", "type_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // n(a)=3, n(b)=2, n(c)=1, baskets=3; ab in 2, ac in 1, bc in 1
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 0.666667, 0.666667, 1.0),
      ("a", "c", 1L, 0.333333, 0.333333, 1.0),
      ("b", "c", 1L, 0.333333, 0.5, 1.5)))
  }

  test("Drift.psi: identical snapshots score ~0 stable; shifted snapshot flags") {
    val ref = (1 to 1000).map(i => ("t", (i % 100).toDouble)).toDF("k", "value")
    val same = Drift.psi(ref, ref, "k", "value").collect()(0)
    assert(same.getDouble(1) == 0.0 && same.getString(3) == "stable")
    // shift everything up 50: mass moves across buckets → large PSI
    val cur = (1 to 1000).map(i => ("t", (i % 100).toDouble + 50)).toDF("k", "value")
    val shifted = Drift.psi(ref, cur, "k", "value").collect()(0)
    assert(shifted.getDouble(1) > 0.25 && shifted.getString(3) == "shifted")
  }

  test("Drift.psi: a key present in only one snapshot surfaces as shifted, not dropped") {
    // r11 ADVICE: the totals inner-join silently dropped brand-new and
    // vanished keys — the maximally drifted cases
    val ref = ((1 to 100).map(i => ("stays", (i % 100).toDouble)) ++
      (1 to 50).map(i => ("vanished", (i % 100).toDouble))).toDF("k", "value")
    val cur = ((1 to 100).map(i => ("stays", (i % 100).toDouble)) ++
      (1 to 50).map(i => ("brand_new", (i % 100).toDouble))).toDF("k", "value")
    val out = Drift.psi(ref, cur, "k", "value").orderBy("k").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq("brand_new", "stays", "vanished"))
    val byKey = out.map(t => t._1 -> t).toMap
    assert(byKey("stays")._2 == 0.0 && byKey("stays")._3 == "stable")
    assert(byKey("brand_new")._2 > 0.25 && byKey("brand_new")._3 == "shifted")
    assert(byKey("vanished")._2 > 0.25 && byKey("vanished")._3 == "shifted")
  }

  test("rollingDailyStats: RANGE frame ages out gap days (hand-computed)") {
    // key 'a': days 1,2,3 then a GAP to day 12 — the day-12 window
    // must contain only day 12 (range frame, not a 3-row frame)
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 10.0),
      ("a", ts("2024-01-02 10:00:00"), 20.0),
      ("a", ts("2024-01-03 10:00:00"), 30.0),
      ("a", ts("2024-01-12 10:00:00"), 40.0),
      ("b", ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("event_type", "ts", "value")
    val out = EventAnalytics.rollingDailyStats(df, "event_type", "ts", "value", windowDays = 7)
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3), r.getDouble(4), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 10.0, 10.0, 1L),
      ("a", "2024-01-02", 30.0, 15.0, 2L),
      ("a", "2024-01-03", 60.0, 20.0, 3L),
      ("a", "2024-01-12", 40.0, 40.0, 1L),   // gap aged the first three out
      ("b", "2024-01-01", 5.0, 5.0, 1L)))
  }

  test("anomalyZscores flags exactly the planted outlier") {
    val base = (1 to 50).map(i => (i.toLong, "click", 10.0 + (i % 5) * 0.1))
    val df = (base :+ (99L, "click", 1000.0)).toDF("event_id", "event_type", "value")
    val out = EventAnalytics.anomalyZscores(df, "event_type", "value",
      Seq("event_id"), threshold = 3.0).collect()
    assert(out.length == 1 && out(0).getLong(0) == 99L)
    assert(out(0).getDouble(2) == 1000.0 && out(0).getDouble(3) > 3.0)
  }

  test("anomalyZscores plan: stats broadcast back, no sort-merge join") {
    val df = (1 to 100).map(i => (i.toLong, s"t${i % 3}", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val plan = EventAnalytics.anomalyZscores(df, "event_type", "value",
      Seq("event_id")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("anomalyMad flags the planted outlier and survives contamination that breaks z-scores") {
    // 20 inliers at 10±0.2 plus FIVE planted outliers at 1000: the
    // outliers inflate the stddev enough that z-scores miss them at
    // threshold 3 (masking), while median/MAD still flags all five
    val base = (1 to 20).map(i => (i.toLong, "click", 10.0 + (i % 5) * 0.1))
    val outliers = (91 to 95).map(i => (i.toLong, "click", 1000.0))
    val df = (base ++ outliers).toDF("event_id", "event_type", "value")
    val z = EventAnalytics.anomalyZscores(df, "event_type", "value",
      Seq("event_id"), threshold = 3.0).collect()
    assert(z.isEmpty, s"z-scores masked by contamination, got ${z.length}")
    val m = EventAnalytics.anomalyMad(df, "event_type", "value",
      Seq("event_id"), threshold = 3.0).collect()
    assert(m.map(_.getLong(0)).sorted.toSeq == (91L to 95L), m.mkString(","))
    assert(m.forall(_.getDouble(3) > 3.0))
  }

  test("anomalyMad plan: both stats passes broadcast back, no event-keyed shuffle join") {
    val df = (1 to 100).map(i => (i.toLong, s"t${i % 3}", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val plan = EventAnalytics.anomalyMad(df, "event_type", "value",
      Seq("event_id")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("ksStatistic: hand-computed sup gap; identical samples score zero; plan is range-partitioned") {
    // A = {1,2,3}, B = {2,3,4}: F_a - F_b is 1/3 at x=1,2,3 and 0 at 4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val ks = EventAnalytics.ksStatistic(df, "v", "g", "a", "b", partitions = 2)
      .collect()(0).getDouble(0)
    assert(math.abs(ks - 1.0 / 3.0) < 1e-12)
    // identical distributions: sup gap is exactly zero
    val same = Seq(("a", 1.0), ("a", 5.0), ("b", 1.0), ("b", 5.0)).toDF("g", "v")
    assert(EventAnalytics.ksStatistic(same, "v", "g", "a", "b")
      .collect()(0).getDouble(0) === 0.0)
    // disjoint supports: KS = 1 (total separation)
    val disj = Seq(("a", 1.0), ("a", 2.0), ("b", 9.0)).toDF("g", "v")
    assert(EventAnalytics.ksStatistic(disj, "v", "g", "a", "b")
      .collect()(0).getDouble(0) === 1.0)
    // scale shape: cumulative counts ride a RANGE exchange with
    // pid-partitioned windows — no data-sized single-partition window.
    // Asserted on the lineage-preserving WithCleanup variant (the
    // handle-less overload's lazy localCheckpoint truncates the visible
    // plan at a Scan ExistingRDD); same answer, and the release handle
    // actually clears the internal cache (r15 advice: the old persist
    // leaked into the session CacheManager until session end).
    val emptyBefore = spark.sharedState.cacheManager.isEmpty
    val (kdf, release) = EventAnalytics.ksStatisticWithCleanup(df, "v", "g", "a", "b")
    assert(math.abs(kdf.collect()(0).getDouble(0) - 1.0 / 3.0) < 1e-12)
    val plan = kdf.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"), plan.take(1500))
    assert(!spark.sharedState.cacheManager.isEmpty, "ranged frame should be cached pre-release")
    release()
    // only a meaningful assertion when this suite owns the whole cache
    // (the JVM-wide session is shared across suites)
    if (emptyBefore)
      assert(spark.sharedState.cacheManager.isEmpty, "release must unpersist the ranged frame")
  }

  test("wasserstein1: hand-computed shift distance; partition seams contribute their spans") {
    // A = {0, 10}, B = {5, 15}: a pure +5 shift → W1 = 5
    // gaps: [0,5): 1/2; [5,10): 0; [10,15): 1/2 → 2.5 + 0 + 2.5 = 5
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 5.0), ("b", 15.0)).toDF("g", "v")
    val w = EventAnalytics.wasserstein1(df, "v", "g", "a", "b", partitions = 1)
      .collect()(0).getDouble(0)
    assert(math.abs(w - 5.0) < 1e-12, s"got $w")
    // with MORE partitions than rows the seam spans cross partition
    // boundaries — the boundary frame must supply them (same answer)
    val w4 = EventAnalytics.wasserstein1(df, "v", "g", "a", "b", partitions = 4)
      .collect()(0).getDouble(0)
    assert(math.abs(w4 - 5.0) < 1e-12, s"seam-split got $w4")
    // identical distributions: zero distance
    val same = Seq(("a", 1.0), ("a", 7.0), ("b", 1.0), ("b", 7.0)).toDF("g", "v")
    assert(EventAnalytics.wasserstein1(same, "v", "g", "a", "b")
      .collect()(0).getDouble(0) === 0.0)
  }

  test("mannWhitneyU: tie-averaged ranks, dominance extremes, partition invariance") {
    // A = {1, 2, 3}, B = {2, 3, 4}: ranks 1, (2,3)→2.5, (4,5)→4.5, 6
    // R_a = 1 + 2.5 + 4.5 = 8; U_a = 8 − 6 = 2; ρ = 2/9
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0)).toDF("g", "v")
    val r = EventAnalytics.mannWhitneyU(df, "v", "g", "a", "b", partitions = 2)
      .collect()(0)
    assert(r.getDouble(0) === 2.0 && math.abs(r.getDouble(1) - 2.0 / 9.0) < 1e-15)
    // total dominance: every A above every B → ρ = 1; reversed → 0
    val dom = Seq(("a", 10.0), ("a", 11.0), ("b", 1.0)).toDF("g", "v")
    assert(EventAnalytics.mannWhitneyU(dom, "v", "g", "a", "b")
      .collect()(0).getDouble(1) === 1.0)
    assert(EventAnalytics.mannWhitneyU(dom, "v", "g", "b", "a")
      .collect()(0).getDouble(1) === 0.0)
    // exactness is partition-independent (integer/half arithmetic)
    val p1 = EventAnalytics.mannWhitneyU(df, "v", "g", "a", "b", partitions = 1)
      .collect()(0).getDouble(0)
    val p4 = EventAnalytics.mannWhitneyU(df, "v", "g", "a", "b", partitions = 4)
      .collect()(0).getDouble(0)
    assert(p1 === p4)
  }

  test("funnel reach joins are user-keyed equi-joins (no cartesian)") {
    val reach = EventAnalytics.funnel(fixture, "user_id", "ts", "event_type",
      Seq("signup", "click"))
    assert(reach.count() == 2)
  }

  test("batch sessionize: strictly-greater gap splits, exact-gap does not, one shuffle plan") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: events at 00:00, +30:00 EXACTLY (same session — split
      // is strictly > gap), then +30:00.001 after that (new session)
      (1L, t("2024-01-01 00:00:00"), 1.0),
      (1L, t("2024-01-01 00:30:00"), 2.0),
      (1L, new java.sql.Timestamp(t("2024-01-01 01:00:00").getTime + 1), 4.0),
      // user 2: one lone event
      (2L, t("2024-01-01 12:00:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val out = EventAnalytics.sessionize(ev, "user_id", "ts", "value")
      .orderBy("user_id", "start_ms").collect()
    assert(out.length == 3, out.mkString(";"))
    // user 1 session 1: both first events, value 3.0, span 30min
    assert(out(0).getAs[Long]("n_events") == 2 &&
      out(0).getAs[Double]("session_value") == 3.0 &&
      out(0).getAs[Long]("end_ms") - out(0).getAs[Long]("start_ms") == 1800000L)
    // user 1 session 2: the single event 30:00.001 later
    assert(out(1).getAs[Long]("n_events") == 1 &&
      out(1).getAs[Double]("session_value") == 4.0)
    assert(out(2).getAs[Long]("user_id") == 2L)
    // plan: gaps-and-islands shares ONE user-key exchange across both
    // windows and the aggregate — a second exchange would re-shuffle
    // the corpus per stage at scale
    val p = EventAnalytics.sessionize(ev, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p.take(2000))
  }
}
