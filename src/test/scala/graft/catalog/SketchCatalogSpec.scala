package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Serving-layer contracts beyond the EngineSpec routing case: the CMS
  * frequency route, the catalog save/load lifecycle (build once, serve
  * in a later session without the corpus), and the routing refusals. */
class SketchCatalogSpec extends SparkSpec {

  test("frequency route: CMS estimate within the one-sided contract; two indexes decline") {
    graft.sources.Sources.register(spark, sfDir)
    val cat = new SketchCatalog(spark)
    spark.sql("SELECT event_type, to_date(ts) AS day FROM events")
      .createOrReplaceTempView("events_freq")
    cat.indexFrequencies("events_freq", "event_type", Seq("day"))
    try {
      val df = cat.route("roughly how many times did purchase occur").get
      val est = df.collect()(0).getLong(1)
      val exact = spark.table("events").where(col("event_type") === "purchase").count()
      val total = spark.table("events").count()
      // one-sided CMS error: never an undercount, over by <= eps*N + 1
      assert(est >= exact && est <= exact + (0.001 * total).toLong + 1,
        s"est=$est exact=$exact")
      // a never-seen key estimates ~0 (bounded by eps*N) — no fabrication
      // risk in serving arbitrary keys
      val ghost = cat.route("roughly how many times did zzzghost occur").get
        .collect()(0).getLong(1)
      assert(ghost <= (0.001 * total).toLong + 1, s"ghost=$ghost")
      // with TWO frequency indexes the key word cannot pick one — decline
      spark.sql("SELECT user_id, to_date(ts) AS day FROM events")
        .createOrReplaceTempView("events_freq2")
      cat.indexFrequencies("events_freq2", "user_id", Seq("day"))
      assert(cat.route("roughly how many times did purchase occur").isEmpty)
    } finally cat.clear()
  }

  test("idempotent re-registration keeps the shared cache entry; a changed plan releases the old one") {
    import graft.streaming.Streams
    graft.sources.Sources.register(spark, sfDir)
    val cat = new SketchCatalog(spark)
    spark.sql("SELECT event_type, user_id FROM events")
      .createOrReplaceTempView("events_rereg")
    // fresh QueryExecution per check (select("*")) so cache
    // substitution reflects the CURRENT cache state, not a memoized one
    def cached(df: org.apache.spark.sql.DataFrame): Boolean =
      df.select(col("*")).queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }.nonEmpty
    try {
      // Spark's cache is PLAN-keyed: re-registering with identical args
      // yields a sameResult twin sharing ONE cache entry — releasing the
      // replaced entry's frame there would uncache the NEW registration
      // and silently turn every routed answer back into a corpus pass
      val e1 = cat.indexDistinct("events_rereg", "user_id", Seq("event_type"))
      val e2 = cat.indexDistinct("events_rereg", "user_id", Seq("event_type"))
      assert(cached(e2.index), "idempotent re-registration must stay cached")
      // the routed plan still reads the in-memory index only
      val routed = cat.route("roughly how many distinct user_id").get
      assert(routed.queryExecution.optimizedPlan.collectLeaves()
        .forall(_.nodeName.contains("InMemoryRelation")))
      // drift monitors: same contract — and a genuinely NEW reference
      // plan releases the replaced histogram while the new one serves
      val docs = spark.table("documents")
      val m = new Streams.VocabDriftMaintainer("text")
      m.onBatch(docs.where(col("lang") =!= "en"), 0L)
      val d1 = cat.registerDrift("crawl", m, docs.where(col("lang") === "en"), "text")
      val d2 = cat.registerDrift("crawl", m, docs.where(col("lang") === "en"), "text")
      assert(cached(d2.refHist), "idempotent drift re-registration must stay cached")
      val d3 = cat.registerDrift("crawl", m, docs.where(col("lang") === "es"), "text")
      assert(cached(d3.refHist), "refreshed reference must be cached")
      assert(!cached(d1.refHist), "the replaced (different-plan) histogram must be released")
    } finally cat.clear()
  }

  test("cross-key plan sharing: replacing one drift monitor never demotes its twin") {
    import graft.streaming.Streams
    graft.sources.Sources.register(spark, sfDir)
    val cat = new SketchCatalog(spark)
    def cached(df: org.apache.spark.sql.DataFrame): Boolean =
      df.select(col("*")).queryExecution.withCachedData.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }.nonEmpty
    try {
      val docs = spark.table("documents")
      val ref = docs.where(col("lang") === "en")
      // two monitors under DIFFERENT names sharing ONE reference plan —
      // the plan-keyed cache gives them one shared entry
      val m1 = new Streams.VocabDriftMaintainer("text")
      val m2 = new Streams.VocabDriftMaintainer("text")
      m1.onBatch(docs.where(col("lang") === "es"), 0L)
      m2.onBatch(docs.where(col("lang") === "de"), 0L)
      val e1 = cat.registerDrift("crawl_es", m1, ref, "text")
      cat.registerDrift("crawl_de", m2, ref, "text")
      // replacing crawl_es with a DIFFERENT reference must release e1's
      // claim WITHOUT uncaching crawl_de's shared entry (round-13
      // advice: the old check compared only the same-key successor)
      val e3 = cat.registerDrift("crawl_es", m1, docs.where(col("lang") === "fr"), "text")
      assert(cached(e3.refHist), "the new reference must be cached")
      assert(cached(e1.refHist),
        "the shared-plan twin (crawl_de's histogram) must stay cached")
      // and the surviving twin still serves from the index
      val served = cat.route("how different is the crawl_de from the reference corpus?")
      assert(served.isDefined && served.get.collect().length == 1)
    } finally cat.clear()
  }

  test("unregistered drift-token name falls through to later routes") {
    import graft.streaming.Streams
    graft.sources.Sources.register(spark, sfDir)
    spark.sql("SELECT event_type, user_id FROM events")
      .createOrReplaceTempView("events_ft")
    val cat = new SketchCatalog(spark)
    cat.indexDistinct("events_ft", "user_id", Seq("event_type"))
    try {
      // matches driftTokensRe but names no registered monitor — must NOT
      // block the question's sketch route (round-13 advice: the early
      // None returned before any later route could serve)
      val q = "which tokens drive the drift in the nosuchmonitor, " +
        "and roughly how many distinct user_id per event_type"
      val served = cat.route(q)
      assert(served.isDefined, "sketch route must still fire after an unmatched drift name")
      assert(served.get.columns.contains("event_type"))
    } finally cat.clear()
  }

  test("adopted split-built index (the stream+history shape) serves like one batch pass") {
    graft.sources.Sources.register(spark, sfDir)
    import graft.operators.Sketches
    val events = spark.sql(
      "SELECT event_type, user_id, to_date(ts) AS day, event_id FROM events")
    // two disjoint halves sketched separately (batch history + a
    // stream-built tail are the same shape: independent daily rows)
    val halfA = Sketches.hllIndex(
      events.where(col("event_id") % 2 === 0), Seq("event_type", "day"), "user_id")
    val halfB = Sketches.hllIndex(
      events.where(col("event_id") % 2 === 1), Seq("event_type", "day"), "user_id")
    val cat = new SketchCatalog(spark)
    cat.adoptDistinct("events", "user_id", Seq("event_type", "day"), halfA.union(halfB))
    try {
      val served = cat.route("roughly how many distinct user_id per event_type").get
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = spark.table("events").groupBy("event_type")
        .agg(countDistinct("user_id").as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served.keySet == exact.keySet)
      served.foreach { case (k, est) =>
        assert(math.abs(est - exact(k)) <= exact(k) * 0.05, s"$k: $est vs ${exact(k)}") }
    } finally cat.clear()
  }

  test("save/load lifecycle: a reloaded catalog serves identical estimates, corpus-free") {
    graft.sources.Sources.register(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("sketch_catalog").toString
    spark.sql("SELECT event_type, user_id, value, to_date(ts) AS day FROM events")
      .createOrReplaceTempView("events_keyed")
    val built = new SketchCatalog(spark)
    built.indexDistinct("events_keyed", "user_id", Seq("event_type", "day"))
    built.indexQuantiles("events_keyed", "value", Seq("event_type", "day"))
    built.indexCohorts("events_keyed", "event_type", "user_id")
    def serve(c: SketchCatalog): Seq[String] = Seq(
      c.route("roughly how many distinct user_id per event_type").get
        .collect().map(_.toString).mkString("|"),
      c.route("roughly how many user_id did both purchase and click").get
        .collect().map(_.toString).mkString("|"))
    def median(c: SketchCatalog): Double =
      c.route("roughly the median value").get.collect()(0).getDouble(0)
    val before = serve(built)
    val medianBefore = median(built)
    built.save(dir)
    built.clear()
    val loaded = new SketchCatalog(spark)
    loaded.load(dir)
    try {
      // HLL/Theta estimates are merge-order-independent: identical
      // after the round-trip
      assert(serve(loaded) == before)
      // KLL compaction is randomized per merge order, so the reloaded
      // rollup may differ slightly — both sides must sit within the
      // index's ±3-rank-point contract at p50
      def rankOf(v: Double): Double = {
        val (below, total) = (
          spark.table("events").where(col("value") <= v).count().toDouble,
          spark.table("events").count().toDouble)
        below / total
      }
      assert(math.abs(rankOf(medianBefore) - 0.5) <= 0.03, medianBefore)
      assert(math.abs(rankOf(median(loaded)) - 0.5) <= 0.03, median(loaded))
      // and the reloaded route still never touches a corpus table: its
      // leaves are the persisted in-memory index relations
      val leaves = loaded.route("roughly how many distinct user_id per event_type").get
        .queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(_.nodeName.contains("InMemoryRelation")),
        leaves.map(_.nodeName).mkString(","))
    } finally loaded.clear()
  }
}
