package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.Streams.Event

class StreamsSpec extends SparkSpec {

  def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  val sample = Seq(
    Event(1, ts(0), 100, "click", 1.0),
    Event(2, ts(1), 100, "click", 2.0),
    Event(3, ts(2), 200, "view", 3.0),
    Event(4, ts(31), 100, "click", 4.0),
    Event(5, ts(32), 200, "view", 5.0),
    Event(6, ts(59), 300, "error", 6.0))

  /** Run a streaming query over a MemoryStream to completion and return
    * the memory-sink table. */
  def runStream(name: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = build(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    spark.table(name)
  }

  test("tumbling window counts match the batch computation") {
    import spark.implicits._
    val streamed = runStream("t_tumbling")(df => Streams.tumblingCounts(df, "1 hour", "10 minutes"))
      .orderBy("window_start", "event_type").collect()
    val batch = Streams.tumblingCounts(sample.toDF(), "1 hour", "10 minutes")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(batch.map(_.getAs[Long]("cnt")).sum == sample.size)
  }

  test("sliding windows assign events to overlapping windows") {
    import spark.implicits._
    val out = Streams.slidingAvg(sample.toDF(), "30 minutes", "15 minutes").collect()
    // each event falls into 2 windows of 30min sliding by 15min
    assert(out.map(_.getAs[Long]("cnt")).sum == sample.size * 2)
  }

  test("sessionization closes sessions after the gap") {
    import spark.implicits._
    val sessions = Streams.sessionize(sample.toDF(), "10 minutes")
      .orderBy("user_id", "session_start").collect()
    // user 100: events at minute 0,1 then 31 -> two sessions
    val u100 = sessions.filter(_.getAs[Long]("user_id") == 100L)
    assert(u100.length == 2)
    assert(u100(0).getAs[Long]("n_events") == 2L)
    assert(u100(1).getAs[Long]("n_events") == 1L)
  }

  test("stream-stream interval join equals the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = Seq((1L, 100L, ts(0)), (2L, 100L, ts(40)), (3L, 200L, ts(5)))
    val buys = Seq((10L, 100L, ts(10)), (11L, 100L, ts(45)), (12L, 200L, ts(50)))
    val vs = MemoryStream[(Long, Long, Timestamp)]
    val ps = MemoryStream[(Long, Long, Timestamp)]
    vs.addData(views: _*)
    ps.addData(buys: _*)
    val q = Streams.intervalJoinStream(
      vs.toDF().toDF("view_id", "user_id", "v_ts"),
      ps.toDF().toDF("buy_id", "user_id", "b_ts"),
      "user_id", "v_ts", "b_ts", horizon = "30 minutes")
      .writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("t_ssjoin").select("view_id", "buy_id")
      .orderBy("view_id", "buy_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // view1@10:00–buy10@10:10 and view2@10:40–buy11@10:45 match;
    // view3@10:05 sees buy12@10:50 only, 45min past the horizon
    assert(streamed.toSeq === Seq((1L, 10L), (2L, 11L)))
    // the unified API runs the same operator on batch frames
    // (EliminateEventTimeWatermark drops the no-op watermark)
    val batch = Streams.intervalJoinStream(
      views.toDF("view_id", "user_id", "v_ts"),
      buys.toDF("buy_id", "user_id", "b_ts"),
      "user_id", "v_ts", "b_ts", horizon = "30 minutes")
      .select("view_id", "buy_id").orderBy("view_id", "buy_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("interval join accepts identically-named left/right ts columns (internal rename)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val views = Seq((1L, 100L, ts(0)), (2L, 100L, ts(40)))
    val buys = Seq((10L, 100L, ts(10)), (11L, 100L, ts(45)))
    // both sides call their event time "ts" — pre-round-15 this failed
    // analysis with an ambiguous column reference; now both are renamed
    // internally and the right one surfaces as ts_r
    val out = Streams.intervalJoinStream(
      views.toDF("view_id", "user_id", "ts"),
      buys.toDF("buy_id", "user_id", "ts"),
      "user_id", "ts", "ts", horizon = "30 minutes")
    assert(out.columns.count(_ == "ts") === 1 && out.columns.contains("ts_r"))
    val got = out.select("view_id", "buy_id").orderBy("view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 10L), (2L, 11L)))
  }

  test("left-outer interval join emits unmatched views once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vs = MemoryStream[(Long, Long, Timestamp)]
    val ps = MemoryStream[(Long, Long, Timestamp)]
    val q = Streams.intervalJoinStream(
      vs.toDF().toDF("view_id", "user_id", "v_ts"),
      ps.toDF().toDF("buy_id", "user_id", "b_ts"),
      "user_id", "v_ts", "b_ts", horizon = "10 minutes",
      watermark = "5 minutes", joinType = "leftOuter")
      .writeStream.format("memory").queryName("t_ssjoin_outer")
      .outputMode("append").start()
    vs.addData((1L, 100L, ts(0)), (2L, 200L, ts(0)))
    ps.addData((10L, 100L, ts(5)))
    q.processAllAvailable()
    // advance BOTH watermarks far past view 2's join window so the
    // no-data batch emits its null row
    val far = Timestamp.valueOf("2024-01-01 12:00:00")
    vs.addData((99L, 999L, far))
    ps.addData((98L, 998L, far))
    q.processAllAvailable()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("t_ssjoin_outer").where($"view_id" === 2L).collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(out(0).fieldIndex("buy_id")))
    // the matched row emitted eagerly, not at watermark time
    val matched = spark.table("t_ssjoin_outer").where($"view_id" === 1L).collect()
    assert(matched.length === 1 && matched(0).getAs[Long]("buy_id") === 10L)
  }

  test("transformWithState running totals: two-batch fold equals the batch aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Event]
      val q = Streams.runningTotalsStream(input.toDS())
        .writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
      input.addData(sample.take(3): _*)
      q.processAllAvailable()
      input.addData(sample.drop(3): _*)
      q.processAllAvailable()
      q.stop()
      // update mode emits one row per user per batch; totals are
      // monotone (positive values), so max() picks the final state
      val streamed = spark.table("t_tws").groupBy("user_id")
        .agg(max("events").as("events"), max("total_value").as("total_value"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val batch = sample.toDS().groupBy($"user_id")
        .agg(count(lit(1)).as("events"), sum($"value").as("total_value"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.toSeq === batch.toSeq)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("tws bootstrap: snapshot seeds all keys once; a checkpoint restart never re-applies it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // user 100: snapshot + stream; user 300: snapshot-ONLY in phase 1
      val snapshot = Seq((100L, 2L, 30.0), (300L, 5L, 99.0)).toDS()
      val ckpt = java.nio.file.Files.createTempDirectory("tws_boot_ckpt").toString
      val input = MemoryStream[Event]
      val emitted = scala.collection.mutable.ListBuffer.empty[Streams.UserTotal]
      def start() = Streams.runningTotalsBootstrapped(input.toDS(), snapshot)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.UserTotal], _: Long) =>
          emitted.synchronized { emitted ++= b.collect() }; ()
        }
        .start()
      // phase 1: first batch of a fresh checkpoint — handleInitialState
      // runs for BOTH snapshot keys; only user 100 has input, so only
      // it emits, with snapshot-included totals
      val q1 = start()
      input.addData(Event(1, ts(0), 100, "click", 10.0))
      q1.processAllAvailable(); q1.stop()
      assert(emitted.toSeq === Seq(Streams.UserTotal(100L, 3L, 40.0)))
      // phase 2: RESTART from the checkpoint with the same snapshot
      // passed again — the engine must skip handleInitialState entirely
      // (state already in the store): user 100 folds on top of (3, 40),
      // not on a re-seeded (2, 30); user 300's phase-1 seed is in the
      // restored state even though it never emitted
      emitted.clear()
      val q2 = start()
      input.addData(Event(2, ts(1), 100, "view", 5.0), Event(3, ts(2), 300, "view", 1.0))
      q2.processAllAvailable(); q2.stop()
      val byUser = emitted.map(u => u.user_id -> ((u.events, u.total_value))).toMap
      assert(byUser(100L) === ((4L, 45.0)), s"restart must not re-seed: $byUser")
      assert(byUser(300L) === ((6L, 100.0)), s"phase-1 seed must survive restart: $byUser")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState top-k: MapState counts + trimmed ListState buffer fold equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val b1 = Seq(Event(1, ts(0), 100, "click", 10.0), Event(2, ts(1), 100, "click", 20.0),
        Event(3, ts(2), 100, "view", 30.0), Event(4, ts(3), 200, "view", 5.0))
      val b2 = Seq(Event(5, ts(10), 100, "view", 40.0), Event(6, ts(11), 100, "error", 50.0),
        Event(7, ts(12), 100, "view", 60.0))
      val input = MemoryStream[Event]
      val perBatch = scala.collection.mutable.ListBuffer
        .empty[(Long, Seq[Streams.TopTypeEntry])]
      val q = Streams.topKRecentStream(input.toDS(), k = 3, recentSize = 2)
        .writeStream.outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.TopTypeEntry], id: Long) =>
          perBatch.synchronized { perBatch += ((id, b.collect().toSeq)) }; ()
        }
        .start()
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      q.stop()
      // user 100's final emission: lifetime counts folded across both
      // batches, ranked (count DESC, type ASC)
      val last = perBatch.last._2.filter(_.user_id == 100L).sortBy(_.rank)
      assert(last.map(e => (e.rank, e.event_type, e.n_events)) ===
        Seq((1, "view", 3L), (2, "click", 2L), (3, "error", 1L)))
      // ListState trimmed to the 2 newest (events 6 @50.0 and 7 @60.0);
      // batch-1 entries aged out of the buffer but NOT out of the counts
      assert(last.forall(e =>
        e.recent_n == 2L && e.recent_min == 50.0 && e.recent_max == 60.0))
      // user 200 appears only in batch 0 — its emission is final state
      val u200 = perBatch.head._2.filter(_.user_id == 200L)
      assert(u200.map(e => (e.rank, e.event_type, e.n_events, e.recent_n,
        e.recent_min)) === Seq((1, "view", 1L, 1L, 5.0)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState top-k per-variable TTL: the buffer expires, lifetime counts do not") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // same two-AvailableNow-runs-over-one-checkpoint shape as the
      // runningTotals TTL test: the restart lets the 1ms TTL lapse
      val ckpt = java.nio.file.Files.createTempDirectory("tws_topk_ttl").toString
      val input = MemoryStream[Event]
      val got = scala.collection.mutable.ListBuffer.empty[Streams.TopTypeEntry]
      def runOnce(): Unit = {
        val q = Streams.topKRecentStream(input.toDS(), k = 3, recentSize = 5,
            ttlRecent = java.time.Duration.ofMillis(1))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.TopTypeEntry], _: Long) =>
            got.synchronized { got ++= b.collect() }; ()
          }
          .start()
        q.awaitTermination(120000); q.stop()
      }
      input.addData(Event(1, ts(0), 100, "click", 1.0))
      runOnce()
      Thread.sleep(300)
      input.addData(Event(2, ts(1), 100, "click", 2.0))
      runOnce()
      // second emission: the MapState count ACCUMULATED (TTLConfig.NONE)
      // while the ListState buffer restarted at 1 entry (1ms TTL lapsed)
      assert(got.map(e => (e.n_events, e.recent_n, e.recent_min)).toSeq ===
        Seq((1L, 1L, 1.0), (2L, 1L, 2.0)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState TTL: idle state vanishes without timer bookkeeping") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // ProcessingTime mode keeps scheduling batches (TTL sweep), so
      // processAllAvailable never sees the engine idle — run two
      // AvailableNow queries over ONE checkpoint instead: state (and
      // its TTL clock) persists across the restart
      val ckpt = java.nio.file.Files.createTempDirectory("tws_ttl").toString
      val input = MemoryStream[Event]
      val got = scala.collection.mutable.ListBuffer.empty[(Long, Double)]
      def runOnce(): Unit = {
        // foreachBatch sink: the memory sink cannot RECOVER from a
        // checkpoint, and restart is exactly what this test exercises
        val q = Streams.runningTotalsStream(input.toDS(),
            ttl = java.time.Duration.ofMillis(1))
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.UserTotal], _: Long) =>
            got.synchronized {
              got ++= b.collect().map(t => (t.events, t.total_value))
            }; ()
          }
          .start()
        q.awaitTermination(120000); q.stop()
      }
      input.addData(Event(1, ts(0), 100, "click", 1.0))
      runOnce()
      assert(got.toSeq === Seq((1L, 1.0)))
      Thread.sleep(300) // processing-time TTL of 1ms is long expired
      input.addData(Event(2, ts(1), 100, "click", 2.0))
      runOnce() // same checkpoint: state (and its TTL clock) persists
      // the restarted query read batch 2 against EXPIRED state:
      // (1, 2.0), not the accumulated (2, 3.0)
      assert(got.toSeq === Seq((1L, 1.0), (1L, 2.0)))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("transformWithState sessionizer: in-batch gap splits emit now, the tail closes on the timer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // the tail-close fires in the trailing NO-DATA batch (timers expire
    // against the watermark advanced by the previous batch) — make sure
    // the userActivity quirk-guard hasn't disabled no-data batches
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try {
      val input = MemoryStream[Event]
      val q = Streams.sessionizeTws(input.toDS(), gapMs = 10L * 60 * 1000,
          lateness = "10 seconds")
        .writeStream.format("memory").queryName("t_tws_sess")
        .outputMode("append").start()
      // user 100: minutes 0,1 then 31 — the 30min hop splits IN-batch;
      // user 200: minute 2 — stays open until the watermark passes
      input.addData(
        Event(1, ts(0), 100, "click", 1.0), Event(2, ts(1), 100, "click", 2.0),
        Event(3, ts(31), 100, "click", 4.0), Event(4, ts(2), 200, "view", 3.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("t_tws_sess")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value"))).toSet
      // the split session emitted synchronously; user 200's tail ALSO
      // closed already — batch 1's own watermark (minute 31 − 10s)
      // passed its 10:12 timer, and the trailing no-data batch fired
      // it. Only user 100's tail (timer 10:41) is still open.
      assert(afterBatch1 === Set((100L, 2L, 3.0), (200L, 1L, 3.0)))
      // watermark jump: a far-future event closes both open sessions
      input.addData(Event(9, Timestamp.valueOf("2024-01-01 13:00:00"), 300, "click", 9.0))
      q.processAllAvailable()
      q.stop()
      val all = spark.table("t_tws_sess")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value"), r.getAs[Long]("start_ms"),
          r.getAs[Long]("end_ms"))).toSet
      assert(all === Set(
        (100L, 2L, 3.0, ts(0).getTime, ts(1).getTime),
        (100L, 1L, 4.0, ts(31).getTime, ts(31).getTime),
        (200L, 1L, 3.0, ts(2).getTime, ts(2).getTime)))
      // user 300's session is still open — not emitted
      assert(!all.exists(_._1 == 300L))
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("flatMapGroupsWithState accumulates per-user running state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = Streams.userActivity(input.toDS())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table("t_state").collect()
    val byUser = rows.map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("events"), r.getAs[Double]("total_value"))).toMap
    assert(byUser(100L) == ((3L, 7.0)))
    assert(byUser(200L) == ((2L, 8.0)))
    assert(byUser(300L) == ((1L, 6.0)))
  }

  test("streaming dedup drops duplicate keys within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    // event 1 and 2 arrive twice (same event_id), 3 once
    input.addData(
      Event(1, ts(0), 100, "click", 1.0), Event(1, ts(0), 100, "click", 1.0),
      Event(2, ts(1), 100, "click", 2.0), Event(3, ts(2), 200, "view", 3.0),
      Event(2, ts(1), 100, "click", 2.0))
    val q = Streams.dedupStream(input.toDF(), Seq("event_id"), lateness = "1 hour")
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("t_dedup").select("event_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("file-source stream over the events fixture produces rows") {
    // copy the events parquet into a stream dir (sf0.001 -> small)
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    val out = new java.io.File(dir, "in"); out.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt")
    graft.sources.Sources.table(spark, sfDir, "events")
      .write.mode("overwrite").parquet(out.getPath)
    val stream = Streams.readEventStream(spark, out.getPath)
    assert(stream.isStreaming)
    val q = Streams.tumblingCounts(stream, "1 hour", "1 minute")
      .writeStream.format("memory").queryName("t_file")
      .outputMode("complete")
      .option("checkpointLocation", ckpt.getPath)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.table("t_file").count() > 0)
  }

  test("stateless curation operators (quality filter -> PII redaction -> sampling) run unchanged on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.{Pipelines, PiiRedaction, Sampling}
    import org.apache.spark.sql.functions.lit
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it runs far away from the field today"),
      (2L, "contact the admin at root@ex.io for the password to the server on this host"),
      (3L, "xq zt"), // no stopword hits -> lang 'und' -> filtered
      (4L, "el la de que y los del las por un una"), // spanish -> filtered
      (5L, "the data pipeline processes the documents with the spark engine and the catalyst optimizer"))
    def curate(df: org.apache.spark.sql.DataFrame) =
      PiiRedaction.redactDocuments(
        Sampling.stratifiedSample(
          Pipelines.qualityFilter(df, "doc_id", "text", minQuality = 0.0, minTokens = 3),
          "doc_id", lit("all"), Seq("all" -> 1.0)),
        "doc_id", "text")
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = curate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("t_curate")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("t_curate").collect().map(_.toSeq).toSet
    val batch = curate(docs.toDF("doc_id", "text")).collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streaming != batch: $streamed vs $batch")
    assert(streamed.map(_.head) == Set(1L, 2L, 5L))
    val redacted = spark.table("t_curate").where($"doc_id" === 2L)
      .select("redacted").as[String].collect().head
    assert(redacted.contains("<EMAIL>") && !redacted.contains("root@ex.io"))
  }

  test("streaming near-dup detection surfaces planted duplicates, bucket-locally") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the rain falls " +
      "softly on the quiet village and the river winds slowly through the green valley below"
    val other = "spark catalyst compiles declarative query plans into whole stage generated " +
      "java bytecode executing vectorized over compressed columnar parquet row groups efficiently"
    val docs = Seq(
      (1L, base),
      (2L, other),
      (3L, base), // exact copy of 1 -> est 1.0
      (4L, base + " extra words appended")) // near copy of 1
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = Streams.nearDupStream(input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.8)
      .writeStream.format("memory").queryName("t_neardup")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val pairs = spark.table("t_neardup")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)), s"exact copy missed: $pairs")
    assert(pairs.subsetOf(Set((1L, 3L), (1L, 4L), (3L, 4L))), s"false positives: $pairs")
    val est13 = spark.table("t_neardup").where($"id_a" === 1L && $"id_b" === 3L)
      .select("est_jaccard").as[Double].collect()
    assert(est13.forall(_ == 1.0))
  }

  test("streaming decontamination agrees with the batch operator (stream-static, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchmark = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while the sun sets slowly behind the distant mountains tonight"
    val docs = Seq(
      (1L, benchmark + " with extra trailing words appended here today"), // contaminated
      (2L, "completely unrelated text about catalyst optimizer internals shuffles and codegen stages"),
      (3L, benchmark), // exact benchmark copy
      (4L, "short clean doc"))
    val evalDf = Seq(benchmark).toDF("text")
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = Streams.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", evalDf, "text",
        n = 3, minOverlap = 5)
      .writeStream.format("memory").queryName("t_decontam")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val kept = spark.table("t_decontam").select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(2L, 4L)), kept.mkString(","))
    // bit-for-bit agreement with the batch operator on the same data
    val batchKept = graft.operators.Decontamination.decontaminate(
        docs.toDF("doc_id", "text"), "doc_id", "text", evalDf, "text", n = 3, minOverlap = 5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(batchKept), s"stream=$kept batch=$batchKept")
  }

  test("streaming decontamination preserves every input column and non-numeric ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchmark = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while the sun sets slowly behind the distant mountains tonight"
    val input = MemoryStream[(String, String, String)]
    input.addData(
      ("doc-a", benchmark, "web"), // contaminated — dropped
      ("doc-b", "completely unrelated text about catalyst optimizer internals and stages", "books"))
    val q = Streams.decontaminateStream(
        input.toDF().toDF("doc_id", "text", "source"), "doc_id", "text",
        Seq(benchmark).toDF("text"), "text", n = 3, minOverlap = 5)
      .writeStream.format("memory").queryName("t_decontam_cols")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("t_decontam_cols")
    assert(out.columns.toSeq == Seq("doc_id", "text", "source"))
    val rows = out.select("doc_id", "source").as[(String, String)].collect().toSet
    assert(rows == Set(("doc-b", "books")), rows.toString)
  }

  test("streaming leakage-safe split routes arriving near-dup group members like the batch split") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // planted near-dup corpus: docs 1..40; 1≈21, 2≈22, 3≈23 are
    // near-copies (one appended token on a long doc)
    val base = (1L to 20L).map(i => (i,
      s"document number $i with a reasonably long body of unique text " +
        s"covering topic $i in detail across several sentences and words " +
        (1 to 30).map(j => s"tok${i}_$j").mkString(" ")))
    val copies = (1L to 3L).map(i => (i + 20L, base(i.toInt - 1)._2 + " extra"))
    val docs = base ++ copies
    // duplicate-group labels from the batch CC over verified pairs
    val pairs = graft.operators.Dedup
      .ngramJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b")
    val groups = graft.operators.Dedup.duplicateGroups(pairs)
      .select("id", "group_id")
    val weights = Seq("train" -> 0.8, "test" -> 0.2)
    val input = MemoryStream[(Long, String)]
    input.addData(docs: _*)
    val q = Streams.leakageSafeSplitStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", groups, weights)
      .select("doc_id", "split")
      .writeStream.format("memory").queryName("t_leak_split")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("t_leak_split").as[(Long, String)].collect().toMap
    // bit-for-bit agreement with the batch operator on the same data
    val batch = graft.operators.Sampling
      .leakageSafeSplit(docs.toDF("doc_id", "text"), "doc_id", groups, weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // and the leakage contract: every near-dup group lands in ONE split
    for ((a, b) <- Seq((1L, 21L), (2L, 22L), (3L, 23L)))
      assert(streamed(a) == streamed(b), s"pair ($a, $b) straddles splits: $streamed")
  }

  test("streaming codebook-drift monitor equals the batch quantization-error stats") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0.0, 0.0, 0.0, 0.0)),
      (1L, Array(1.0, 1.0, 1.0, 1.0)),
      (2L, Array(0.0, 0.0, 1.0, 1.0)),
      (3L, Array(0.5, 0.0, 1.0, 2.0)))
    val model = graft.operators.ProductQuantization
      .probeModel(vecs.toDF("vec_id", "emb"), "vec_id", "emb", m = 2, k = 2)
    val input = MemoryStream[(Long, Array[Double])]
    input.addData(vecs: _*)
    val q = Streams.quantizationErrorStream(
        input.toDF().toDF("vec_id", "emb"), "emb", model)
      .writeStream.format("memory").queryName("t_pq_drift")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("t_pq_drift")
      .select($"subspace", $"n", org.apache.spark.sql.functions.round($"avg_sq_error", 6), org.apache.spark.sql.functions.round($"max_sq_error", 6))
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.ProductQuantization
      .quantizationErrorStats(vecs.toDF("vec_id", "emb"), "vec_id", "emb", model)
      .select($"subspace", $"n", org.apache.spark.sql.functions.round($"avg_sq_error", 6), org.apache.spark.sql.functions.round($"max_sq_error", 6))
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(streamed == Seq((0, 4L, 0.0625, 0.25), (1, 4L, 0.25, 1.0)))
  }

  test("streaming IVF-PQ ingest encodes arriving vectors identically to the batch index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.sources.Sources.register(spark, sfDir)
    val e = spark.table("embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val model = graft.operators.ProductQuantization.fit(e, "vec_id", "emb", m = 16, k = 16)
    val index = graft.operators.ProductQuantization
      .ivfPqIndex(e, "vec_id", "emb", model, nlist = 8)
    // replay a slice of the corpus as an arriving stream
    val arriving = e.where($"vec_id" < 50)
      .as[(Long, Array[Double])].collect()
    val input = MemoryStream[(Long, Array[Double])]
    input.addData(arriving.toIndexedSeq: _*)
    val q = Streams.encodeStream(input.toDF().toDF("vec_id", "emb"),
        "vec_id", "emb", index.centroids, model)
      .writeStream.format("memory").queryName("t_encode")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("t_encode")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    // the batch index's rows for the same ids — cell and codes identical
    val batch = index.codes.where($"id" < 50)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    assert(streamed.size == 50 && streamed == batch)
  }

  test("streaming top-k per group: heap state accumulates across micro-batches, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = Streams.topKPerGroupStream(input.toDF(), Seq("user_id"), "value", "event_id", k = 2)
      .writeStream.format("memory").queryName("t_topk")
      .outputMode("complete")
      .start()
    try {
      input.addData(sample.take(3): _*)
      q.processAllAvailable()
      input.addData(sample.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_topk").orderBy("user_id")
      .collect().map(_.toString).toSeq
    val batch = Streams.topKPerGroupStream(sample.toDF(), Seq("user_id"), "value", "event_id", k = 2)
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(streamed == batch)
    // user 100 saw values 1.0, 2.0, 4.0 -> top-2 = events 4 (4.0) and 2 (2.0)
    val u100 = spark.table("t_topk").where($"user_id" === 100L)
      .select($"topk").collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(u100.map(_.getLong(1)) == Seq(4L, 2L))
  }

  test("streaming ANN serving answers arriving queries like the batch ADC ranking") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    graft.sources.Sources.register(spark, sfDir)
    val e = spark.table("embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val model = graft.operators.ProductQuantization.fit(e, "vec_id", "emb", m = 16, k = 16)
    val index = graft.operators.ProductQuantization
      .ivfPqIndex(e, "vec_id", "emb", model, nlist = 8)
    // five corpus vectors replayed as arriving queries
    val queries = e.where($"vec_id" < 5).as[(Long, Array[Double])].collect()
    val input = MemoryStream[(Long, Array[Double])]
    val q = Streams.annQueryStream(input.toDF().toDF("qid", "emb"),
        "qid", "emb", index, k = 10, nprobe = 8)
      .writeStream.format("memory").queryName("t_ann")
      .outputMode("complete")
      .start()
    try {
      input.addData(queries.take(2).toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(queries.drop(2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_ann").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSeq).toMap
    assert(streamed.size == 5)
    // batch equivalent: the same probes + ADC scoring + bounded top-k,
    // run as a plain DataFrame over the same index
    val batch = Streams.annQueryStream(
        e.where($"vec_id" < 5).toDF("qid", "emb"), "qid", "emb",
        index, k = 10, nprobe = 8)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toSeq).toMap
    assert(streamed == batch)
    // a query replaying corpus vector v must rank v itself first
    // (ADC distance of a vector to its own codes is the quantization
    // floor — nothing in the probed cells scores lower)
    for (id <- 0L until 5L) assert(streamed(id).head == id,
      s"query $id top hit ${streamed(id).head}")
  }

  test("streaming sketch ingest: stream-built daily sketches roll up like batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two days of events, arriving across two micro-batches that SPLIT
    // day 1 (the state-merge path must combine partial sketches)
    def ev(id: Long, day: Int, user: Long, v: Double) = Event(
      id, Timestamp.valueOf(f"2024-01-0$day 10:00:00"), user, "click", v)
    val batch1 = (0 until 40).map(i => ev(i, 1, i % 25, i.toDouble))
    val batch2 = (40 until 60).map(i => ev(i, 1, i % 25, i.toDouble)) ++
      (60 until 100).map(i => ev(i, 2, i % 37, i.toDouble))
    val input = MemoryStream[Event]
    val q = Streams.distinctSketchStream(
        input.toDF(), "ts", Seq("event_type"), "user_id")
      .writeStream.format("memory").queryName("t_sketch")
      .outputMode("complete")
      .start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamIdx = spark.table("t_sketch")
    assert(streamIdx.count() == 2, "one sketch row per (event_type, day)")
    // the streamed index rolls up through the SAME batch estimator, and
    // HLL_8 union is lossless, so estimates equal the batch-built index's
    val streamEst = graft.operators.Sketches
      .hllEstimate(streamIdx, Seq("event_type")).collect()(0).getAs[Long]("distinct_est")
    val all = (batch1 ++ batch2).toDF()
      .withColumn("day", org.apache.spark.sql.functions.to_date($"ts"))
    val batchEst = graft.operators.Sketches.hllEstimate(
      graft.operators.Sketches.hllIndex(all, Seq("event_type", "day"), "user_id"),
      Seq("event_type")).collect()(0).getAs[Long]("distinct_est")
    assert(streamEst == batchEst, s"stream=$streamEst batch=$batchEst")
    assert(streamEst == 37L, s"exact at this cardinality: $streamEst")
    // KLL: streamed quantile index merges to the same n and a valid median
    val input2 = MemoryStream[Event]
    val q2 = Streams.quantileSketchStream(
        input2.toDF(), "ts", Seq("event_type"), "value")
      .writeStream.format("memory").queryName("t_sketch_kll")
      .outputMode("complete")
      .start()
    try {
      input2.addData(batch1: _*)
      q2.processAllAvailable()
      input2.addData(batch2: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val kq = graft.operators.Sketches.kllQuantiles(
      spark.table("t_sketch_kll"), Seq("event_type"), Seq(0.5)).collect()(0)
    assert(kq.getAs[Long]("n") == 100L, kq)
    val med = kq.getAs[Double]("q_0_5")
    assert(med >= 40.0 && med <= 60.0, s"median $med off the 0..99 stream")
    // CMS: stream-built daily frequency sketches merge to the exact
    // per-user counts at this cardinality (error bound << 1)
    val input3 = MemoryStream[Event]
    val q3 = Streams.frequencySketchStream(
        input3.toDF(), "ts", Seq("event_type"), "user_id")
      .writeStream.format("memory").queryName("t_sketch_cms")
      .outputMode("complete")
      .start()
    try {
      input3.addData(batch1: _*)
      q3.processAllAvailable()
      input3.addData(batch2: _*)
      q3.processAllAvailable()
    } finally q3.stop()
    val keys = (batch1 ++ batch2).map(_.user_id).distinct.toDF("user_id")
    val est = graft.operators.Sketches.cmsCounts(
      graft.operators.Sketches.cmsMerge(
        spark.table("t_sketch_cms").select("cms"), Seq.empty),
      keys, "user_id").as[(Long, Long)].collect().toMap
    val exact = (batch1 ++ batch2).groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
    assert(est == exact, s"stream CMS est=$est exact=$exact")
  }

  test("streaming MV maintenance: foreachBatch refresh folds equal a batch rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // (g, v, op): inserts and delete-retractions across micro-batches
    val base = Seq(("a", 1L), ("a", 5L), ("b", 7L), ("c", 2L)).toDF("g", "v")
    val maintainer = new Streams.AggMaintainer(base, Seq("g"), "v")
    val input = MemoryStream[(String, Long, String)]
    val q = input.toDF().toDF("g", "v", "op")
      .writeStream.foreachBatch(maintainer.onBatch _)
      .outputMode("append")
      .start()
    try {
      input.addData(("a", 2L, "I"), ("c", 2L, "D"))       // insert + full-group delete
      q.processAllAvailable()
      input.addData(("a", 1L, "D"), ("d", 9L, "I"))       // min retraction + new group
      q.processAllAvailable()
    } finally q.stop()
    val finalTable = Seq(("a", 5L), ("a", 2L), ("b", 7L), ("d", 9L)).toDF("g", "v")
    val got = maintainer.currentState
      .select("g", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = graft.operators.MaterializedAgg.build(finalTable, Seq("g"), "v")
      .select("g", "n", "sum_v", "min_v", "max_v")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, s"stream=$got batch=$want")
    // the maintained table advanced to the post-change rows too
    assert(maintainer.currentTable.count() == 4)
  }

  test("AggMaintainer treats a NULL op as an insert (not silently dropped by 3VL)") {
    import spark.implicits._
    val base = Seq(("a", 1L)).toDF("g", "v")
    val maintainer = new Streams.AggMaintainer(base, Seq("g"), "v")
    val batch = Seq(("a", 2L, Option("I")), ("b", 9L, Option.empty[String]),
      ("a", 1L, Option("D"))).toDF("g", "v", "op")
    maintainer.onBatch(batch, 0L)
    val got = maintainer.currentState.select("g", "n", "sum_v")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1L, 2L), ("b", 1L, 9L)), got.toString)
  }

  test("incremental duplicate groups: contracted-graph folds equal batch CC, merges included") {
    import spark.implicits._
    val b1 = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 3L), (20L, 21L)).toDF("id_a", "id_b") // extends {1,2}
    val b3 = Seq((3L, 10L)).toDF("id_a", "id_b")            // MERGES {1,2,3} with {10,11}
    val m = new Streams.DupGroupsMaintainer
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) => m.onBatch(b, i.toLong) }
    val got = m.currentLabels.get.as[(Long, Long)].collect().sortBy(_._1).toSeq
    val batch = graft.operators.Dedup.duplicateGroups(b1.union(b2).union(b3))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == batch, s"inc=$got batch=$batch")
    // the merged component is labeled by the global min (1)
    assert(got.filter(_._1 >= 10L).filter(_._1 <= 11L).forall(_._2 == 1L))
  }

  test("streaming funnel: time-ordered batch folds equal the batch funnel") {
    import org.apache.spark.sql.functions.{col, dayofmonth}
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_type"))
    val steps = Seq("signup", "click", "purchase")
    val m = new Streams.FunnelMaintainer("user_id", "ts", "event_type", steps)
    // three time-ordered micro-batches (append-log ingest contract)
    m.onBatch(events.where(dayofmonth(col("ts")) <= 10), 0L)
    m.onBatch(events.where(dayofmonth(col("ts")).between(11, 20)), 1L)
    m.onBatch(events.where(dayofmonth(col("ts")) > 20), 2L)
    val batch = graft.operators.EventAnalytics.funnel(
      events, "user_id", "ts", "event_type", steps)
      .orderBy("step").collect().map(_.getLong(2)).toSeq
    assert(m.currentCounts == batch, s"stream=${m.currentCounts} batch=$batch")
    // multi-step advance within ONE batch also works
    val m2 = new Streams.FunnelMaintainer("user_id", "ts", "event_type", steps)
    m2.onBatch(events, 0L)
    assert(m2.currentCounts == batch)
  }

  test("streaming boilerplate maintainer: sketch-folded cleaning equals the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, pmod, col => fcol}
    // 60 docs: a shared cookie line on every doc (boilerplate), a shared
    // nav line on every third doc (20 docs, still over threshold), and
    // a unique body line per doc
    val docs = (1 to 60).map { i =>
      val nav = if (i % 3 == 0) "\nnav menu home about" else ""
      (i.toLong, s"body text $i alpha\ncookie notice applies$nav")
    }.toDF("doc_id", "text")
    val m = new Streams.BoilerplateMaintainer("doc_id", "text")
    // before any batch: pass-through
    assert(m.clean(docs, 10).where($"n_removed" > 0).count() == 0)
    // fold three micro-batches split by id hash
    (0 until 3).foreach(i => m.onBatch(docs.where(pmod($"doc_id", lit(3)) === i), i.toLong))
    // state is ONE sketch row regardless of volume
    assert(m.currentSketch.get.count() == 1)
    val streamed = m.clean(docs, 10).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batch = graft.operators.TextAnalysis
      .removeBoilerplateLines(docs, "doc_id", "text", minDocs = 10)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // at this size the CMS estimates are exact, so the sketch path must
    // reproduce the exact operator row-for-row (one-sided error means
    // at scale it can only ever over-drop, never miss boilerplate)
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.forall { case (_, t, _) => !t.contains("cookie") && !t.contains("nav") })
    assert(streamed.forall { case (id, t, _) => t.contains(s"body text $id") })
  }

  test("streaming vocab-drift maintainer: folded divergence equals the batch operator exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    val ref = docs.where(col("lang") === "en")
    val stream = docs.where(col("lang") =!= "en")
    val m = new Streams.VocabDriftMaintainer("text")
    assert(m.vocabSize == 0)
    // fold three micro-batches split by id hash; unigram counts are
    // associative, and the divergence computes through the same fold as
    // the batch operator, so stream-maintained == batch
    (0 until 3).foreach(i => m.onBatch(stream.where(pmod($"doc_id", lit(3)) === i), i.toLong))
    val streamed = m.divergenceFrom(ref, "text").collect()(0)
    val batch = graft.operators.TextAnalysis.vocabDivergence(ref, stream, "text").collect()(0)
    // histograms are integer-exact, so the vocab counts must match
    // exactly; the divergence fold sums per-token DOUBLE terms whose
    // partial-aggregation order differs between the driver-built and
    // corpus histograms, so allow the micro grid's ±1 boundary cell
    // (ADVICE r12 #4 — don't let a rounding-boundary sum flake this)
    assert((0 to 2).forall(i => streamed.getLong(i) == batch.getLong(i)),
      s"$streamed vs $batch")
    assert((3 to 5).forall(i => math.abs(streamed.getLong(i) - batch.getLong(i)) <= 1),
      s"$streamed vs $batch")
    assert(m.vocabSize > 0 && streamed.getLong(3) > 0L)
    // the attribution half shares the guarantee
    val topS = m.topDivergentFrom(ref, "text", k = 10).collect().map(_.toSeq)
    val topB = graft.operators.TextAnalysis.divergentTokens(ref, stream, "text", k = 10)
      .collect().map(_.toSeq)
    assert(topS.toSeq == topB.toSeq)
  }

  test("streaming packing maintainer: ordered-arrival fold equals the batch pack") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t t t"), (2L, "t t t t t"), (3L, ""), (4L, "t t t t"),
      (5L, "t t"), (6L, "t t t t t t t")).toDF("doc_id", "text")
    val m = new Streams.PackingMaintainer("doc_id", "text", seqLen = 4,
      partitions = 2)
    assert(m.totalTokens == 0L)
    // three micro-batches in id order (append-log ingest): the folded
    // assignment must equal the terminal batch pack over everything
    val folded = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L)).zipWithIndex
      .flatMap { case (ids, i) =>
        m.onBatch(docs.where($"doc_id".isin(ids: _*)), i.toLong).collect()
      }.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val batch = graft.operators.Packing.packOffsets(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(folded == batch.toSeq, s"$folded vs ${batch.toSeq}")
    assert(m.totalTokens == 21L)
    spark.catalog.clearCache()
  }

  test("streaming packing maintainer through a real foreachBatch query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq((1L, "t t t"), (2L, "t t t t t"), (3L, "t t t t"),
      (4L, "t t"), (5L, "t t t t t t t"))
    val m = new Streams.PackingMaintainer("doc_id", "text", seqLen = 4,
      partitions = 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        out ++= m.onBatch(b, id).collect().map(_.toSeq)
        ()
      }
      .outputMode("append")
      .start()
    try {
      input.addData(docs.take(2): _*); q.processAllAvailable()
      input.addData(docs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val batch = graft.operators.Packing.packOffsets(
      docs.toDF("doc_id", "text"), "doc_id", "text", 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(out.sortBy(_.head.asInstanceOf[Long]).toSeq == batch,
      s"stream=$out batch=$batch")
    assert(m.totalTokens == 21L)
    spark.catalog.clearCache()
  }

  test("streaming manifest maintainer: any batch split folds to the batch manifest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = (1L to 60L).map(i => (i, s"w$i w${i * 3} w${i * 7}"))
      .toDF("doc_id", "text")
    val shard = pmod(col("doc_id"), lit(4L))
    val batch = graft.operators.Layout
      .integrityManifest(docs, "doc_id", shard, Some("text"))
      .orderBy("shard").collect().map(_.toSeq).toSeq
    // UNORDERED, uneven split — every manifest field is commutative/
    // associative, so no ordered-arrival caveat applies
    val m = new Streams.ManifestMaintainer("doc_id", Some("text"))
    m.onBatch(docs.where(col("doc_id") % 3 === 1), shard, 0L)
    m.onBatch(docs.where(col("doc_id") % 3 === 2), shard, 1L)
    m.onBatch(docs.where(col("doc_id") % 3 === 0), shard, 2L)
    val folded = m.current(spark).orderBy("shard").collect().map(_.toSeq).toSeq
    assert(folded == batch, s"fold=$folded batch=$batch")
  }

  test("streaming DSIR maintainer: folded model scores equal the batch fit exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    val m = new Streams.DsirModelMaintainer("doc_id", "text", col("lang") === "en")
    assert(m.currentTotals == (0L, 0L))
    // fold three micro-batches split by id hash
    (0 until 3).foreach(i => m.onBatch(docs.where(pmod($"doc_id", lit(3)) === i), i.toLong))
    val streamed = m.score(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    val batch = graft.operators.TextAnalysis
      .dsirWeightsWhere(docs, col("lang") === "en", "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    // counts are associative, the scoring pass is shared — fold ≡ fit
    assert(streamed.toSeq == batch.toSeq)
    assert(m.currentTotals._1 > m.currentTotals._2 && m.currentTotals._2 > 0)
  }

  test("streaming anomaly stats: folded moments equal batch mean/stddev; flags match batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{avg, count, lit, pmod, stddev_samp}
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"event_id", $"event_type", $"value".cast("double").as("value"))
    val m = new Streams.AnomalyStatsMaintainer("event_type", "value")
    // feed in three micro-batches split by id hash
    (0 until 3).foreach(i => m.onBatch(events.where(pmod($"event_id", lit(3)) === i), i.toLong))
    val streamed = m.currentStats.get.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val batch = events.groupBy("event_type")
      .agg(count("value").as("n"), avg("value").as("mu"), stddev_samp("value").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (n, mu, sd)) =>
      val (sn, smu, ssd) = streamed(k)
      assert(sn == n)
      assert(math.abs(smu - mu) / math.abs(mu) < 1e-9, s"$k mu $smu vs $mu")
      assert(math.abs(ssd - sd) / sd < 1e-6, s"$k sd $ssd vs $sd")
    }
    // flagging everything seen against the maintained stats picks the
    // same events as the batch operator (boundary margin ~1e-3 >> 1e-6)
    val streamFlags = m.flag(events, Seq("event_id"), 2.5)
      .select("event_id").as[Long].collect().toSet
    val batchFlags = graft.operators.EventAnalytics.anomalyZscores(
      events, "event_type", "value", Seq("event_id"), 2.5)
      .select("event_id").as[Long].collect().toSet
    assert(streamFlags == batchFlags)
  }

  test("serveThrough auto-advances the served MV snapshot on every batch commit") {
    import spark.implicits._
    try {
      val base = Seq(("a", 1L), ("a", 5L), ("b", 7L)).toDF("g", "v")
      base.createOrReplaceTempView("mv_stream_base")
      val maintainer = new Streams.AggMaintainer(base, Seq("g"), "v")
        .serveThrough("mv_stream_base", mvName = "mv_stream_state")
      val sql = "SELECT g, COUNT(*) AS c, SUM(v) AS s FROM mv_stream_base GROUP BY g"
      def served = spark.sql(sql)
      def noAgg(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isEmpty
      assert(noAgg(served), served.queryExecution.optimizedPlan.toString)
      // two batches land: no manual re-registration anywhere below
      maintainer.onBatch(Seq(("a", 2L, "I"), ("b", 7L, "D")).toDF("g", "v", "op"), 0L)
      maintainer.onBatch(Seq(("c", 4L, "I")).toDF("g", "v", "op"), 1L)
      val after = served
      assert(noAgg(after), after.queryExecution.optimizedPlan.toString)
      val got = after.as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      // equals the batch rebuild over the post-batch records, even though
      // the mv_stream_base VIEW still holds the pre-change rows — the
      // registered state is the serving truth and it advanced per commit
      assert(got == Seq(("a", 3L, 8L), ("c", 1L, 4L)), got.toString)
    } finally graft.plans.MvCatalog.clear(spark)
  }

  test("streaming entity resolution links arriving records like the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val master = Seq((11L, "lavender chiffon"), (12L, "goldenrod spring"),
      (13L, "midnight azure")).toDF("id", "name")
    val input = MemoryStream[(Long, String)]
    val q = Streams.resolveStream(input.toDF().toDF("id", "name"), "id", "name",
        master, "id", "name", threshold = 0.9, k = 1)
      .writeStream.format("memory").queryName("t_resolve")
      .outputMode("complete")
      .start()
    try {
      input.addData((1L, "lavendr chiffon"), (2L, "goldnrod spring"))
      q.processAllAvailable()
      input.addData((3L, "midnght azure"), (4L, "zzz unrelated"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_resolve")
      .select($"l_id",
        org.apache.spark.sql.functions.element_at($"topk", 1)
          .getField("id").as("r_id"))
      .as[(Long, Long)].collect().toMap
    // matches the batch operator's links; the unrelated record never
    // crosses the threshold so it holds no match state row
    val batch = graft.operators.EntityResolution.resolve(
      Seq((1L, "lavendr chiffon"), (2L, "goldnrod spring"), (3L, "midnght azure"),
        (4L, "zzz unrelated")).toDF("id", "name"), "id", "name",
      master, "id", "name", threshold = 0.9, topPerLeft = 1)
      .select("l_id", "r_id").as[(Long, Long)].collect().toMap
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got == Map(1L -> 11L, 2L -> 12L, 3L -> 13L))
  }

  test("DistinctIndexMaintainer re-adopts the sketch index per batch; estimates track everything seen") {
    import spark.implicits._
    val cat = new graft.catalog.SketchCatalog(spark)
    try {
      val mk = (ids: Seq[Int]) => ids.map(i =>
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "click", i.toLong))
        .toDF("ts", "event_type", "user_id")
      val m = new Streams.DistinctIndexMaintainer(
        cat, "events_m", "user_id", Seq("event_type"))
      m.onBatch(mk(1 to 60), 0L)
      m.onBatch(mk(40 to 100), 1L) // overlaps batch 0: distinct = 100
      val served = cat.route("roughly how many distinct user_id per event_type",
        requireMarker = false).getOrElse(fail("route did not fire"))
      val est = served.select("distinct_est").as[Double].collect()(0)
      assert(math.abs(est - 100.0) <= 5.0, s"est $est vs exact 100")
    } finally cat.clear()
  }
}
