package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sketches: mergeability (the property the whole index pattern rests
  * on), build-plan shape (partial sketch aggregation), and the accuracy
  * contracts the x_sketch_* oracle queries assert at every SF. */
class SketchesSpec extends SparkSpec {

  private lazy val events = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("events").withColumn("day", to_date(col("ts")))
  }

  test("HLL: union of per-day sketches equals the single-pass estimate exactly") {
    // HLL_8 union at the same lgK is lossless, so rolling up the daily
    // index must give the SAME estimate as sketching the whole corpus
    // in one pass — this equality is what lets an ingest pipeline build
    // sketches incrementally and never rescan
    val daily = Sketches.hllIndex(events, Seq("day"), "user_id")
    val merged = Sketches.hllEstimate(daily, Seq.empty)
      .collect()(0).getLong(0)
    val single = Sketches.hllIndex(events.withColumn("__one", lit(1)), Seq("__one"), "user_id")
    val direct = Sketches.hllEstimate(single, Seq.empty).collect()(0).getLong(0)
    assert(merged == direct, s"merged=$merged single-pass=$direct")
  }

  test("HLL: estimate within the ±5% contract of exact distinct") {
    val exact = events.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val est = Sketches.hllEstimate(
      Sketches.hllIndex(events, Seq("day"), "user_id"), Seq.empty)
      .collect()(0).getLong(0)
    assert(math.abs(est - exact) <= exact * 0.05, s"est=$est exact=$exact")
  }

  test("HLL index build: partial sketch aggregation, only sketch bytes shuffle") {
    val p = Sketches.hllIndex(events, Seq("event_type", "day"), "user_id")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // DataSketches aggregates are ObjectHashAggregate-backed with a
    // partial phase — the map-side combine that makes the build one
    // corpus pass with sketch-sized shuffle rows
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_hll_sketch_agg"), p.take(2000))
  }

  test("Theta: planted cohorts give exact set algebra below nominal entries") {
    import spark.implicits._
    // cohort A = {0..599}, cohort B = {400..999}: |A∩B|=200, |A∪B|=1000
    val df = ((0 until 600).map(i => ("a", i.toLong)) ++
      (400 until 1000).map(i => ("b", i.toLong))).toDF("cohort", "uid")
    val ov = Sketches.thetaOverlap(
      Sketches.thetaCohorts(df, "cohort", "uid"), "cohort", "a", "b")
      .collect()(0)
    assert(ov.getAs[Long]("est_a") == 600L, ov)
    assert(ov.getAs[Long]("est_b") == 600L, ov)
    assert(ov.getAs[Long]("est_both") == 200L, ov)
    assert(ov.getAs[Long]("est_either") == 1000L, ov)
    assert(math.abs(ov.getAs[Double]("jaccard") - 0.2) < 1e-9, ov)
  }

  test("HLL index persists as plain parquet and answers day-range rollups") {
    // the serving pattern: the index is written once (binary sketch
    // column through the ordinary parquet path — no custom
    // serialization), and any later day-range distinct count merges the
    // covered sketch rows only
    val dir = java.nio.file.Files.createTempDirectory("graft-hll-idx").toString
    Sketches.hllIndex(events, Seq("day"), "user_id")
      .write.mode("overwrite").parquet(dir)
    val idx = spark.read.parquet(dir)
    val lastDays = idx.where(col("day") >= lit("2024-01-15"))
    val est = Sketches.hllEstimate(lastDays, Seq.empty).collect()(0).getLong(0)
    val exact = events.where(col("day") >= lit("2024-01-15"))
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(est - exact) <= exact * 0.05, s"range est=$est exact=$exact")
    // and the full-index rollup equals the unpersisted one (byte-stable
    // through parquet)
    val persisted = Sketches.hllEstimate(idx, Seq.empty).collect()(0).getLong(0)
    val direct = Sketches.hllEstimate(
      Sketches.hllIndex(events, Seq("day"), "user_id"), Seq.empty)
      .collect()(0).getLong(0)
    assert(persisted == direct, s"persisted=$persisted direct=$direct")
  }

  test("CMS: merged daily sketches estimate like one global sketch, error one-sided") {
    import spark.implicits._
    val keys = events.select("event_type").distinct()
    val exact = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val n = events.count()
    // merged per-day index
    val mergedEst = Sketches.cmsCounts(
      Sketches.cmsMerge(Sketches.cmsIndex(events, Seq("day"), "event_type"), Seq.empty),
      keys, "event_type").as[(String, Long)].collect().toMap
    // single global sketch (no day split) — merge must not change estimates
    val globalEst = Sketches.cmsCounts(
      Sketches.cmsIndex(events.withColumn("__one", lit(1)), Seq("__one"), "event_type")
        .select("cms"),
      keys, "event_type").as[(String, Long)].collect().toMap
    assert(mergedEst == globalEst, s"merged=$mergedEst global=$globalEst")
    for ((k, ex) <- exact) {
      val est = mergedEst(k)
      assert(est >= ex, s"CMS undercounted $k: $est < $ex")
      assert(est <= ex + (0.001 * n).toLong + 1, s"CMS overcount out of contract for $k: $est vs $ex")
    }
  }

  test("CMS index build keeps partial aggregation; merge is an ObjectHashAggregate") {
    val build = Sketches.cmsIndex(events, Seq("day"), "event_type")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(build.contains("partial_count_min_sketch"), build.take(2000))
    val merge = Sketches.cmsMerge(
      Sketches.cmsIndex(events, Seq("day"), "event_type"), Seq.empty)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(merge.contains("cms_merge"), merge.take(2000))
    assert(merge.contains("ObjectHashAggregate"), merge.take(2000))
  }

  test("KLL: merged count is exact; merged quantiles meet the rank contract") {
    val n = events.count()
    val q = Sketches.kllQuantiles(
      Sketches.kllIndex(events, Seq("day"), "value"), Seq.empty, Seq(0.5, 0.95))
      .collect()(0)
    assert(q.getAs[Long]("n") == n, s"sketch n=${q.getAs[Long]("n")} exact=$n")
    for ((p, cname) <- Seq((0.5, "q_0_5"), (0.95, "q_0_95"))) {
      val est = q.getAs[Double](cname)
      val rank = events.where(col("value") <= est).count().toDouble / n
      assert(math.abs(rank - p) <= 0.03, s"quantile $p estimate $est has rank $rank")
    }
  }
}
