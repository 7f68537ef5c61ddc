package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def embs = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  test("probe-codebook encode: the codebook vectors encode to their own id in every subspace") {
    val model = ProductQuantization.probeModel(embs, "vec_id", "emb", m = 8, k = 16)
    val own = ProductQuantization.encodeLong(embs.where($"vec_id" < 16), "vec_id", "emb", model)
      .collect()
    assert(own.length == 16 * 8)
    assert(own.forall(r => r.getInt(2) == r.getLong(0).toInt))
  }

  test("trained codebooks: ADC top-k with re-rank equals exact brute-force top-k") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val pq = ProductQuantization.adcTopK(embs, "vec_id", "emb", model, q, k = 10, candidates = 100)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.topK(embs, "vec_id", "emb", q.map(_.toFloat), k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(pq == exact, s"pq=$pq exact=$exact")
  }

  test("ADC recall across many query vectors (codes-only candidate set keeps the true top-10)") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val recalls = (1 to 5).map { qi =>
      val q = embs.where($"vec_id" === qi).select("emb").head().getSeq[Double](0).toArray
      val pq = ProductQuantization.adcTopK(embs, "vec_id", "emb", model, q, k = 10, candidates = 100)
        .select("vec_id").as[Long].collect().toSet
      val exact = Similarity.topK(embs, "vec_id", "emb", q.map(_.toFloat), k = 10)
        .select("vec_id").as[Long].collect().toSet
      (pq intersect exact).size / 10.0
    }
    assert(recalls.sum / recalls.size >= 0.9, recalls)
  }

  test("searchEncoded over a pre-encoded codes frame equals the inline adcTopK") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val coded = ProductQuantization.encode(embs, "vec_id", "emb", model, normalize = true)
    val q = embs.where($"vec_id" === 2).select("emb").head().getSeq[Double](0).toArray
    val viaIndex = ProductQuantization
      .searchEncoded(coded, embs, "vec_id", "emb", model, q, 10, 100)
      .collect().map(_.toString).toSeq
    val inline = ProductQuantization.adcTopK(embs, "vec_id", "emb", model, q, 10, 100)
      .collect().map(_.toString).toSeq
    assert(viaIndex == inline)
  }

  test("mismatched model/table ADC scores null out instead of reading wrong entries") {
    val m16 = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val coded = ProductQuantization.encode(embs, "vec_id", "emb", m16, normalize = true)
    val m8 = ProductQuantization.fit(embs, "vec_id", "emb", m = 8, k = 16)
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    // codes have 16 entries but the m=8 model's table has 8*16 — every row nulls
    val out = ProductQuantization.searchEncoded(coded, embs, "vec_id", "emb", m8, q, 10, 100)
    assert(out.count() == 0)
  }

  test("IVF-PQ: full probe equals brute force; partial probe keeps high recall") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val index = ProductQuantization.ivfPqIndex(embs, "vec_id", "emb", model, nlist = 8)
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val exact = Similarity.topK(embs, "vec_id", "emb", q.map(_.toFloat), k = 10)
      .select("vec_id").as[Long].collect().toSeq
    // probing every cell removes IVF pruning error; PQ candidates + exact
    // re-rank must then reproduce the brute-force ranking
    val full = ProductQuantization
      .ivfPqTopK(index, embs, "vec_id", "emb", q, k = 10, nprobe = 8, candidates = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact, s"full-probe=$full exact=$exact")
    // half the cells: the pruned path keeps most of the true top-10
    val partial = ProductQuantization
      .ivfPqTopK(index, embs, "vec_id", "emb", q, k = 10, nprobe = 4, candidates = 100)
      .select("vec_id").as[Long].collect().toSet
    assert((partial intersect exact.toSet).size >= 8, s"partial=$partial exact=$exact")
  }

  test("persisted IVF-PQ index: ranking scans the codes parquet, touching no float column") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val index = ProductQuantization.ivfPqIndex(embs, "vec_id", "emb", model, nlist = 8)
    assert(index.codes.columns.toSeq == Seq("id", "cell", "codes"))
    // encode-once: persist the codes frame (what production stores),
    // then query against the PERSISTED index
    val dir = java.nio.file.Files.createTempDirectory("pq_codes").toString
    index.codes.write.mode("overwrite").parquet(dir)
    val persisted = index.copy(codes = spark.read.parquet(dir))
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val out = ProductQuantization.ivfPqTopK(persisted, embs, "vec_id", "emb", q, k = 10)
    val plan = out.queryExecution.executedPlan.toString
    // no query-time encode anywhere in the plan (expressions render by
    // nodeName: PqEncode → pqencode); pqadcdistance must be what ranks
    assert(!plan.contains("pqencode"), plan)
    assert(plan.contains("pqadcdistance"), plan)
    // the codes-parquet scan prunes to (id, cell, codes): the ranking
    // side reads no float/emb column — that comes in only via the
    // candidate re-rank scan of the base frame
    val codeScan = plan.linesIterator.filter(l => l.contains(dir.split('/').last)).mkString("\n")
    assert(codeScan.nonEmpty, plan)
    assert(!codeScan.contains("emb"), codeScan)
    // and the search result over the persisted index matches brute force
    val exact = Similarity.topK(embs, "vec_id", "emb", q.map(_.toFloat), k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val got = ProductQuantization
      .ivfPqTopK(persisted, embs, "vec_id", "emb", q, k = 10, nprobe = 8, candidates = 100)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == exact, s"got=$got exact=$exact")
  }

  test("batch kNN join over the persisted index: brute-force equality, codes-only ranking, no cartesian") {
    // planted-cluster frame (the knnJoinIvf fixture): centers = vec_id<8,
    // every vector = its center + 0.05× itself, so 2/8 probed cells keep
    // the exact neighbors
    val centers = embs.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"emb".as("cemb"))
    val clustered = embs.join(broadcast(centers), pmod($"vec_id", lit(8)) === $"cid")
      .select($"vec_id", zip_with($"cemb", $"emb", (c, x) => c + lit(0.05) * x).as("emb"))
    val queries = clustered.where($"vec_id".isin(1, 2, 3))
    val model = ProductQuantization.fit(clustered, "vec_id", "emb", m = 16, k = 16)
    val index = ProductQuantization.ivfPqIndex(clustered, "vec_id", "emb", model, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_knn_index").toString
    ProductQuantization.writeIndex(index, dir)
    val loaded = ProductQuantization.readIndex(spark, dir)
    val got = ProductQuantization.knnJoinIvfPq(loaded, clustered, "vec_id", "emb",
      queries, "vec_id", "emb", k = 5, nprobe = 2, candidates = 400)
    val brute = Similarity.knnJoin(clustered, "vec_id", "emb", queries, "vec_id", "emb", k = 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id".cast("long"), $"id", round($"cosine", 6), $"rank")
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(rows(got) == rows(brute))
    // plan pins: no query-time encode, no cartesian/nested-loop pairing,
    // and the codes scan reads no float column (floats enter only via
    // the candidate re-rank against the base frame)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("pqencode"), plan)
    assert(plan.contains("pqadclookup"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    val formatted = got.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val codeScan = formatted.linesIterator
      .filter(l => l.contains("ReadSchema") && l.contains("codes")).mkString("\n")
    assert(codeScan.nonEmpty, formatted.take(3000))
    assert(!codeScan.contains("emb"), codeScan)
  }

  test("replicated index: knnJoin dedups multi-assigned candidates; single-assignment skips the dedup shuffle") {
    val centers = embs.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"emb".as("cemb"))
    val clustered = embs.join(broadcast(centers), pmod($"vec_id", lit(8)) === $"cid")
      .select($"vec_id", zip_with($"cemb", $"emb", (c, x) => c + lit(0.05) * x).as("emb"))
    val queries = clustered.where($"vec_id".isin(1, 2, 3))
    val model = ProductQuantization.fit(clustered, "vec_id", "emb", m = 16, k = 16)
    val single = ProductQuantization.ivfPqIndex(clustered, "vec_id", "emb", model, nlist = 8)
    val replicated = ProductQuantization.ivfPqIndex(clustered, "vec_id", "emb", model,
      nlist = 8, assignReplicas = 2)
    assert(single.replicas == 1 && replicated.replicas == 2)
    def rows(idx: ProductQuantization.IvfPqIndex) = ProductQuantization
      .knnJoinIvfPq(idx, clustered, "vec_id", "emb", queries, "vec_id", "emb",
        k = 5, nprobe = 2, candidates = 400)
      .select($"query_id".cast("long"), $"id", round($"cosine", 6), $"rank")
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val r = rows(replicated)
    // no duplicate (query, id) survives the replicated path, and both
    // paths agree on the results (replication only widens probe reach)
    assert(r.distinct == r)
    assert(rows(single) == r)
    // the sidecar round-trips the replica count (an old sidecar without
    // the field loads conservatively, dedup stays on)
    val dir = java.nio.file.Files.createTempDirectory("pq_rep_index").toString
    ProductQuantization.writeIndex(replicated, dir)
    assert(ProductQuantization.readIndex(spark, dir).replicas == 2)
  }

  test("writeIndex/readIndex round-trip: cell-partitioned codes, partition pruning, identical results") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val index = ProductQuantization.ivfPqIndex(embs, "vec_id", "emb", model, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_index").toString
    ProductQuantization.writeIndex(index, dir)
    val loaded = ProductQuantization.readIndex(spark, dir)
    // sidecar round-trips the model and centroids exactly
    assert(loaded.model == model.copy(codebooks = loaded.model.codebooks)
      && loaded.model.m == model.m && loaded.model.k == model.k)
    assert(loaded.model.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq)
    assert(loaded.centroids.map(_._1).toSeq == index.centroids.map(_._1).toSeq)
    assert(loaded.centroids.flatMap(_._2).toSeq == index.centroids.flatMap(_._2).toSeq)
    val q = embs.where($"vec_id" === 3).select("emb").head().getSeq[Double](0).toArray
    val fromMem = ProductQuantization
      .ivfPqTopK(index, embs, "vec_id", "emb", q, k = 10, nprobe = 4, candidates = 100)
      .collect().map(_.toString).toSeq
    val search = ProductQuantization
      .ivfPqTopK(loaded, embs, "vec_id", "emb", q, k = 10, nprobe = 4, candidates = 100)
    assert(search.collect().map(_.toString).toSeq == fromMem)
    // probed-cell filter prunes PARTITIONS of the codes parquet (no
    // row-group guessing): the scan must report a cell partition filter
    val plan = search.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(3000))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("cell"), plan.take(3000))
  }

  test("compactIndex: micro-batch appends merge to one file per cell, latest codes win, search parity") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    val base = embs.where($"vec_id" < 400)
    val index = ProductQuantization.ivfPqIndex(base, "vec_id", "emb", model, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("pq_compact").toString
    ProductQuantization.writeIndex(index, dir)
    // simulate streaming ingest: two appended micro-batches in the same
    // (id, cell, codes) layout encodeStream emits — one batch of NEW ids,
    // one UPDATING existing ids with different vectors (cells may move)
    Thread.sleep(1100) // file-mtime granularity: appended files strictly newer
    val newRows = graft.streaming.Streams.encodeStream(
      embs.where($"vec_id" >= 400 && $"vec_id" < 450), "vec_id", "emb",
      index.centroids, model)
    newRows.write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
    Thread.sleep(1100)
    val updated = embs.where($"vec_id" < 50)
      .select($"vec_id", reverse($"emb").as("emb")) // a genuinely different vector
    val updRows = graft.streaming.Streams.encodeStream(
      updated, "vec_id", "emb", index.centroids, model)
    updRows.write.mode("append").partitionBy("cell").parquet(s"$dir/codes")

    val stats = ProductQuantization.compactIndex(spark, dir)
    assert(stats.rowsBefore == 400 + 50 + 50 && stats.rowsAfter == 450, stats)
    assert(stats.filesAfter < stats.filesBefore, stats)
    // one file per cell partition after compaction (filesPerCell = 1)
    assert(stats.filesAfter == 8, stats)
    // latest-file-wins: the updated ids carry the SECOND batch's codes
    val loaded = ProductQuantization.readIndex(spark, dir)
    val expectUpd = updRows.select($"id", $"cell", $"codes").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    val got = loaded.codes.where($"id" < 50).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Int](2)))).toMap
    assert(got == expectUpd)
    // search over the compacted index ≡ brute force over the updated set
    val current = embs.where($"vec_id" >= 50 && $"vec_id" < 450)
      .unionAll(updated.withColumnRenamed("vec_id", "vec_id"))
    val q = embs.where($"vec_id" === 7).select("emb").head().getSeq[Double](0).toArray
    val viaIndex = ProductQuantization
      .ivfPqTopK(loaded, current, "vec_id", "emb", q, k = 10, nprobe = 8, candidates = 450)
      .select("vec_id").as[Long].collect().toSeq
    val exact = Similarity.topK(current, "vec_id", "emb", q.map(_.toFloat), k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(viaIndex == exact, s"index=$viaIndex exact=$exact")
  }

  test("codes compress 32x vs float32 (m log2 k bits) and the ADC scan reads no float vector") {
    val model = ProductQuantization.fit(embs, "vec_id", "emb", m = 16, k = 16)
    // m=16 codes of 4 bits = 8 bytes/vector vs 64 floats = 256 bytes (32x)
    assert(model.m * (math.log(model.k) / math.log(2)).round / 8 == 8)
    val q = embs.where($"vec_id" === 0).select("emb").head().getSeq[Double](0).toArray
    val plan = ProductQuantization.adcTopK(embs, "vec_id", "emb", model, q, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
