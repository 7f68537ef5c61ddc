package graft.operators

import graft.SparkSpec

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("dedupCorpus removes exact and near duplicates with a faithful report") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup
      (4L, "completely unrelated text about spark catalyst optimizer rules and plans"),
      (5L, "another very different document discussing parquet columnar storage formats")
    ).toDF("doc_id", "text")
    val (deduped, report) = Pipelines.dedupCorpus(docs, "doc_id", "text",
      nearThreshold = 0.5, Dedup.LshConfig(numHashes = 64, bands = 16))
    val kept = deduped.select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L)) // 2 exact-removed, 3 near-removed
    assert(report == Pipelines.DedupReport(5, 4, 3, 1, 1))
  }

  test("dedupCorpus caches the exact-dedup corpus (one window computation)") {
    val docs = (1L to 50L).map(i => (i, s"document number $i with some shared words " + ("x " * (i % 5).toInt)))
      .toDF("doc_id", "text")
    val (deduped, _) = Pipelines.dedupCorpus(docs, "doc_id", "text")
    // the anti-join's physical plan must read the persisted exact corpus
    // (InMemoryTableScan), not recompute the dedup window from the source
    val plan = deduped.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("Scan ExistingRDD"),
      "expected cached exact corpus in plan:\n" + plan.take(2000))
  }

  test("qualityFilter keeps substantial english docs only") {
    val docs = Seq(
      (1L, "the cat is on the mat and it is quite happy with the morning sun today"),
      (2L, "el gato esta en la casa y el perro con la luna para los dos amigos"),
      (3L, "ok"),
      (4L, "!!! ### 123 @@@")
    ).toDF("doc_id", "text")
    val kept = Pipelines.qualityFilter(docs, "doc_id", "text", minQuality = 0.1)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("frame sampling emits one row per frame with per-frame features") {
    val media = Multimodal.synthetic(spark, 30)
    val frames = Multimodal.sampleFrames(media, dim = 8, everyMs = 500).collect()
    val videos = media.collect().filter(_.kind == "video")
    val videoFrames = frames.filter(f => videos.exists(_.media_id == f.media_id))
    assert(videoFrames.groupBy(_.media_id).forall(_._2.length >= 2))
    // per-frame features differ (stub mixes the frame index)
    val g = videoFrames.groupBy(_.media_id).head._2
    assert(g.map(_.features.toSeq).distinct.length == g.length)
    assert(frames.forall(_.features.length == 8))
  }

  test("resize caps dimensions preserving aspect, bytes untouched") {
    val media = Multimodal.synthetic(spark, 10)
    val resized = Multimodal.resize(media, 32, 32).collect()
    val orig = media.collect()
    assert(resized.forall(r => r.meta.width <= 32 && r.meta.height <= 32))
    assert(resized.map(_.bytes.toSeq).toSeq == orig.map(_.bytes.toSeq).toSeq)
  }
}
