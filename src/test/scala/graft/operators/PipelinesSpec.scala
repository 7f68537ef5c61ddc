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

  test("chunkDocuments windows overlap correctly and cover every token") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "short doc"), (3L, "")).toDF("doc_id", "text")
    val chunks = Pipelines.chunkDocuments(docs, "doc_id", "text", chunkTokens = 32, overlapTokens = 8)
      .orderBy("doc_id", "chunk_index").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    // ceil((100-8)/24) = 4 chunks; windows at 1,25,49,73
    assert(d1.length == 4)
    assert(d1(0).getString(2).startsWith("w1 ") && d1(0).getInt(3) == 32)
    assert(d1(1).getString(2).startsWith("w25 ")) // stride 24, so 8 tokens shared
    assert(d1(3).getInt(3) == 28) // tail chunk: tokens 73..100
    // every token appears in some chunk
    val covered = d1.flatMap(_.getString(2).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"w$i").toSet)
    // short doc: single chunk; empty doc: no chunks
    assert(chunks.count(_.getLong(0) == 2L) == 1)
    assert(!chunks.exists(_.getLong(0) == 3L))
  }

  test("packSequences bounds every pack by capacity and keeps shards independent") {
    val docs = (1L to 60L).map(i => (i, ("tok " * (10 + (i % 7)).toInt).trim)).toDF("doc_id", "text")
    val packed = Pipelines.packSequences(docs, "doc_id", "text", capacityTokens = 50, shards = 4).collect()
    assert(packed.length == 60)
    // a pack never exceeds capacity + one overflowing doc (greedy cumsum
    // splits at the boundary; a doc larger than the remainder starts in
    // the same pack its cumsum-before places it in)
    val byPack = packed.groupBy(_.getLong(3))
    assert(byPack.values.forall(_.map(_.getInt(1)).sum <= 50 + 16))
    // shards partition the id space deterministically
    assert(packed.forall(r => r.getInt(2) == (r.getLong(0) % 4).toInt))
    assert(packed.forall(r => r.getLong(3) / 1000000L == r.getInt(2).toLong))
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
