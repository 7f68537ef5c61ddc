package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-4 training-pipeline operators: duplicate-group connected
  * components, benchmark decontamination, PII redaction, deterministic
  * stratified sampling, corpus vocabulary. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateGroups: transitive chain collapses to the component minimum (both strategies)") {
    // A(1)-B(2), B(2)-C(3) but never A-C; separate pair D(10)-E(11)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L)
    // default: small integral-id graph → driver-side union-find
    val uf = Dedup.duplicateGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == expected)
    // threshold 0 forces the distributed min-label path — same answer
    val dist = Dedup.duplicateGroups(pairs, smallGraphThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("duplicateGroups: long chain needs multiple propagation rounds (distributed path)") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val groups = Dedup.duplicateGroups(chain.toDF("id_a", "id_b"), smallGraphThreshold = 0L)
      .collect()
    assert(groups.forall(_.getLong(1) == 1L), groups.mkString(","))
    // and the union-find path agrees on the same chain
    val uf = Dedup.duplicateGroups(chain.toDF("id_a", "id_b")).collect()
    assert(uf.forall(_.getLong(1) == 1L), uf.mkString(","))
  }

  test("weightedSample: per-row keep probability, deterministic, clamped") {
    val df = (1L to 2000L).map(i => (i, i.toDouble / 1000.0)).toDF("id", "w")
    val kept = Sampling.weightedSample(df, "id", col("w")).select("id").as[Long].collect().toSet
    // reproducible across partitionings
    val kept2 = Sampling.weightedSample(df.repartition(7), "id", col("w"))
      .select("id").as[Long].collect().toSet
    assert(kept == kept2)
    // weight >= 1 always keeps; weight 0 never keeps
    val extremes = Seq((1L, 0.0), (2L, 1.0), (3L, 5.0), (4L, -2.0)).toDF("id", "w")
    val e = Sampling.weightedSample(extremes, "id", col("w")).select("id").as[Long].collect().toSet
    assert(e.contains(2L) && e.contains(3L) && !e.contains(1L) && !e.contains(4L), e.toString)
    // aggregate rate tracks the mean weight (≈ 0.75 for ramp to 2.0 clamped)
    val rate = kept.size.toDouble / 2000
    assert(rate > 0.65 && rate < 0.85, rate.toString)
  }

  test("lengthBatches: batches stay within one token band and at most batchSize") {
    val docs = (1L to 50L).map(i => (i, ("w " * (i % 40 + 1).toInt).trim)).toDF("doc_id", "text")
    val r = Sampling.lengthBatches(docs, "doc_id", "text", bucketWidth = 8, batchSize = 4).collect()
    val byBatch = r.groupBy(_.getAs[Long]("batch_id"))
    byBatch.foreach { case (b, rows) =>
      assert(rows.length <= 4, s"batch $b has ${rows.length} rows")
      assert(rows.map(_.getAs[Int]("bucket")).distinct.length == 1, s"batch $b spans buckets")
      val spread = rows.map(_.getAs[Int]("n_tokens"))
      assert(spread.max - spread.min < 8, s"batch $b token spread ${spread.min}..${spread.max}")
    }
    assert(r.length == 50) // every doc lands in exactly one batch
  }

  test("decontamination flags docs overlapping the eval set and keeps the rest") {
    val evalDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val docs = Seq(
      (1L, evalDoc + " with extra trailing words appended here"), // heavy overlap
      (2L, "completely unrelated text about spark catalyst optimizer internals and shuffles"),
      (3L, evalDoc)) // exact copy
      .toDF("doc_id", "text")
    val evalSet = Seq(evalDoc).toDF("text")
    val clean = Decontamination.decontaminate(docs, "doc_id", "text", evalSet, "text",
      n = 3, minOverlap = 5).select("doc_id").as[Long].collect().sorted
    assert(clean.sameElements(Array(2L)))
    val hits = Decontamination.overlaps(docs, "doc_id", "text", evalSet, "text",
      n = 3, minOverlap = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(1L, 3L) && hits(3L) >= 11)
  }

  test("PII redaction replaces e-mails, phones and IPs and counts them") {
    val docs = Seq(
      (1L, "write to alice.smith+spam@corp.example.org or bob@ex.io, call 415-555-0199, server 192.168.0.1"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val r = PiiRedaction.redactDocuments(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Int]("n_emails") == 2)
    assert(r(0).getAs[Int]("n_phones") == 1)
    assert(r(0).getAs[Int]("n_ips") == 1)
    val red = r(0).getAs[String]("redacted")
    assert(red == "write to <EMAIL> or <EMAIL>, call <PHONE>, server <IP>", red)
    assert(r(1).getAs[String]("redacted") == "no pii here at all")
  }

  test("stratified sampling is deterministic, respects rates, and keeps rate-1.0 strata fully") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "keep_all" else "sparse"))
      .toDF("id", "kind")
    val rates = Seq("keep_all" -> 1.0, "sparse" -> 0.1)
    val s1 = Sampling.stratifiedSample(df, "id", col("kind"), rates)
    val s2 = Sampling.stratifiedSample(df, "id", col("kind"), rates)
    val r1 = s1.select("id").as[Long].collect().sorted
    assert(r1.sameElements(s2.select("id").as[Long].collect().sorted), "not deterministic")
    // all 1000 keep_all rows survive; sparse lands near 10% (hash uniformity)
    val byKind = s1.groupBy("kind").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKind("keep_all") == 1000L)
    assert(byKind("sparse") > 50 && byKind("sparse") < 150, byKind.toString)
    // unlisted strata drop
    val s3 = Sampling.stratifiedSample(df, "id", col("kind"), Seq("keep_all" -> 1.0))
    assert(s3.where(col("kind") === "sparse").count() == 0)
  }

  test("repetitionStats: repeated tokens and dominant bigrams score high; clean text scores low") {
    val docs = Seq(
      (1L, "spam spam spam spam"), // dup 3/4, top bigram "spam spam" 3/3
      (2L, "every word here is different today"), // dup 0
      (3L, ""), // blank -> zeros
      (4L, "ab")) // single word -> one degenerate bigram
      .toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getDouble(2) == 0.75 && r(0).getDouble(3) == 1.0)
    assert(r(1).getDouble(2) == 0.0 && r(1).getDouble(3) < 0.5)
    assert(r(2).getInt(1) == 0 && r(2).getDouble(2) == 0.0 && r(2).getDouble(3) == 0.0)
    assert(r(3).getDouble(3) == 1.0)
  }

  test("sourceMix weights are temperature-scaled and sum to ~1") {
    val docs = (1L to 110L).map(i => (i, "some text here", if (i <= 100) "big" else "small"))
      .toDF("doc_id", "text", "source")
    val m = Pipelines.sourceMix(docs, "doc_id", "text", "source", alpha = 0.7)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-4)
    // alpha < 1 upweights the small source relative to raw proportion
    assert(m("small") > 10.0 / 110.0, m.toString)
    assert(m("big") > m("small"))
  }

  test("split is deterministic, disjoint, exhaustive and near the requested weights") {
    val df = (1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val w = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val s1 = Sampling.split(df, "id", w)
    assert(s1.count() == 1000, "weights sum to 1 -> no row dropped")
    val sizes = s1.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes("train") > 850 && sizes("train") < 950, sizes.toString)
    assert(sizes("val") > 20 && sizes("val") < 80, sizes.toString)
    // deterministic: same assignment on rerun
    val a1 = s1.select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Sampling.split(df, "id", w).select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 == a2)
    // partial weights drop the remainder
    assert(Sampling.split(df, "id", Seq("sample" -> 0.2)).count() < 300)
  }

  test("deterministicShuffle: stable pseudo-random permutation — reproducible, order-free, complete") {
    val df = (1L to 2000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val p1 = Sampling.deterministicShuffle(df, "id").select("id").collect().map(_.getLong(0))
    val p2 = Sampling.deterministicShuffle(df, "id").select("id").collect().map(_.getLong(0))
    assert(p1.sameElements(p2), "same permutation on rerun")
    assert(p1.sorted.sameElements(1L to 2000L), "a permutation: every row exactly once")
    assert(!p1.sameElements(1L to 2000L), "not ingest order")
    // decorrelated from ingest order: adjacent output ids are far apart
    val adjacentGap = p1.zip(p1.tail).map { case (a, b) => math.abs(b - a) }
    assert(adjacentGap.count(_ <= 2) < 100, s"${adjacentGap.count(_ <= 2)} near-adjacent pairs")
    // a different seed is a different permutation
    val p3 = Sampling.deterministicShuffle(df, "id", seed = 99L)
      .select("id").collect().map(_.getLong(0))
    assert(!p1.sameElements(p3))
  }

  test("shuffledExport: every partition is an unbiased ingest-order-free slice; rows complete") {
    val df = (1L to 4000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val out = Sampling.shuffledExport(df, "id", numFiles = 8)
    val withPart = out.withColumn("p", spark_partition_id())
      .select("p", "id").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(withPart.map(_._2).sorted.sameElements(1L to 4000L))
    // each partition holds a hash-routed (not contiguous) id slice whose
    // mean sits near the corpus mean — an unbiased sample per file
    val byPart = withPart.groupBy(_._1).map { case (_, rows) => rows.map(_._2.toDouble) }
    byPart.foreach { ids =>
      assert(ids.size > 4000 / 8 / 2, s"balanced-ish: ${ids.size}")
      val mean = ids.sum / ids.size
      assert(math.abs(mean - 2000.0) < 400, s"partition mean $mean biased")
      val span = ids.max - ids.min
      assert(span > 3000, s"partition covers the id range, not a contiguous block: $span")
    }
  }

  test("leakageSafeSplit: duplicate groups never straddle splits; singletons match the plain split") {
    val df = (1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    // planted near-dup groups spanning ids whose plain-split assignments
    // differ (90=train-bucket vs 954/957=val/test buckets under HashK)
    val pairs = Seq((90L, 954L), (954L, 957L), (10L, 20L))
      .toDF("id_a", "id_b")
    val groups = Dedup.duplicateGroups(pairs)
    val w = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = Sampling.leakageSafeSplit(df, "id", groups, w)
    assert(out.count() == 1000)
    val bySplit = out.select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every pair member shares its split (transitively: the whole group)
    assert(bySplit(90L) == bySplit(954L) && bySplit(954L) == bySplit(957L))
    assert(bySplit(10L) == bySplit(20L))
    // group members take the GROUP key's split (component min = 90)
    val plain = Sampling.split(df, "id", w).select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bySplit(90L) == plain(90L))
    // docs outside any group keep their plain-split assignment exactly
    val grouped = Set(90L, 954L, 957L, 10L, 20L)
    assert(bySplit.filterNot(kv => grouped(kv._1)) ==
      plain.filterNot(kv => grouped(kv._1)))
  }

  test("kmeansIterate converges to the true cluster means on a planted fixture") {
    // two tight clusters around (1,0) and (0,1); probe centroids start
    // OFF-center (the cluster members themselves)
    val vecs = Seq(
      (0L, Array(0.9, 0.1)), (1L, Array(0.1, 0.9)), // initial probes
      (2L, Array(1.1, -0.1)), (3L, Array(1.0, 0.0)),
      (4L, Array(-0.1, 1.1)), (5L, Array(0.0, 1.0)))
      .toDF("vec_id", "emb")
    val init = vecs.where($"vec_id" < 2)
    val cents = Similarity.kmeansIterate(vecs, "vec_id", "emb", init, "vec_id", "emb", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // after round 1 the assignment is already the planted partition, so
    // round 2 reproduces the exact member means — a fixed point
    assert(cents(0L) == Seq(1.0, 0.0), cents.toString)
    assert(cents(1L) == Seq(0.0, 1.0), cents.toString)
    val three = Similarity.kmeansIterate(vecs, "vec_id", "emb", init, "vec_id", "emb", 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(three == cents, "fixed point must be stable")
  }

  test("writeBalancedShards produces exactly N near-equal parquet shards") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toFile
    val df = (1L to 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    graft.sources.Sinks.writeBalancedShards(df, dir.getPath, "id", 8)
    val parts = dir.listFiles().filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 8, parts.map(_.getName).mkString(","))
    val back = spark.read.parquet(dir.getPath)
    assert(back.count() == 1000)
    // per-file row counts are near-uniform (Murmur3 on unique ids)
    import org.apache.spark.sql.functions.input_file_name
    val counts = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(counts.length == 8 && counts.min > 60 && counts.max < 200, counts.mkString(","))
  }

  test("curateCorpus composes quality -> dedup -> decontam -> split over the fixture") {
    graft.sources.Sources.register(spark, sfDir)
    val d = spark.table("documents")
    val curated = Pipelines.curateCorpus(d, "doc_id", "text",
      d.where(col("doc_id") % 97 === 0), "text")
    val n = d.count()
    val out = curated.select("doc_id", "split").collect()
    assert(out.length > 0 && out.length < n, s"${out.length} of $n")
    // benchmark members themselves are contaminated by construction
    assert(!out.exists(_.getLong(0) % 97 == 0))
    assert(out.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // pipeline output only keeps quality-passing survivors: every kept id
    // also appears in the standalone quality filter
    val quality = Pipelines.qualityFilter(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => quality.contains(r.getLong(0))))
  }

  test("curationAudit agrees with curateCorpus row for row and covers every input") {
    graft.sources.Sources.register(spark, sfDir)
    val d = spark.table("documents")
    val evalSet = d.where(col("doc_id") % 97 === 0)
    val audit = Pipelines.curationAudit(d, "doc_id", "text", evalSet, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // one row per INPUT document
    assert(audit.size == d.count())
    // kept:* ids are exactly the pipeline's output, split labels included
    val curated = Pipelines.curateCorpus(d, "doc_id", "text", evalSet, "text")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> s"kept:${r.getString(1)}").toMap
    val keptAudit = audit.filter(_._2.startsWith("kept:"))
    assert(keptAudit == curated,
      s"audit kept ${keptAudit.size} vs pipeline ${curated.size}")
    // every drop carries a named stage in pipeline vocabulary
    val stages = Set("lang", "quality", "length", "exact_dup", "near_dup", "decontam")
    assert(audit.values.filterNot(_.startsWith("kept:")).forall(stages.contains))
    // benchmark members that survive the earlier gates are decontam drops
    assert(audit.exists { case (id, s) => id % 97 == 0 && s == "decontam" })
  }

  test("curationAudit stage precedence on a crafted fixture") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val docs = Seq(
      (1L, good), // kept
      (2L, good), // exact dup of 1 -> exact_dup
      (3L, "le chat et le chien sont dans la maison avec les enfants ce soir"), // lang
      // detectably English (3 en-only stopwords), quality >= 0.3 via the
      // word-length bonus, but only 4 tokens -> the LENGTH gate fires
      (4L, "that understanding with this"))
      .toDF("doc_id", "text")
    val evalSet = Seq((99L, "no overlap here at all")).toDF("doc_id", "text")
    val audit = Pipelines.curationAudit(docs, "doc_id", "text", evalSet, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(audit(1L).startsWith("kept:"), audit(1L))
    assert(audit(2L) == "exact_dup", audit(2L))
    assert(audit(3L) == "lang", audit(3L))
    assert(audit(4L) == "length", audit(4L))
  }

  test("sourceBudgetPlan + sampleToBudget: caps at 1.0, honors the budget, keeps tiny sources whole") {
    import spark.implicits._
    // big: 1000 docs x 20 tokens = 20k tokens; tiny: 10 docs x 20 = 200
    val text = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 1000).map(i => (i.toLong, text, "big")) ++
      (1000 until 1010).map(i => (i.toLong, text, "tiny")))
      .toDF("doc_id", "text", "source")
    val plan = Pipelines.sourceBudgetPlan(docs, "doc_id", "text", "source",
        budgetTokens = 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(4), r.getAs[Double]("rate"))).toMap
    // tiny's temperature-weighted target (10000 * w_tiny) far exceeds
    // its 200 tokens -> rate caps at 1.0 (everything contributes)
    assert(plan("tiny")._3 == 1.0, plan("tiny").toString)
    // big is capped below 1: its target is less than its 20k tokens
    val (bigTokens, bigTarget, bigRate) = plan("big")
    assert(bigTokens == 20000L && bigTarget < 20000L && bigRate < 1.0)
    // floor-to-per-mille: rate never overshoots target/sum
    assert(bigRate <= bigTarget.toDouble / bigTokens)
    val sampled = Pipelines.sampleToBudget(docs, "doc_id", "text", "source",
      budgetTokens = 10000L)
    val byarr = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byarr("tiny") == 10L, "tiny source fully kept")
    // realized big count tracks rate·1000 docs (hash per-mille buckets)
    val expectBig = (bigRate * 1000 * 1000).toLong / 1000
    assert(math.abs(byarr("big") - expectBig) < 0.2 * expectBig,
      s"big: ${byarr("big")} vs ~$expectBig")
  }

  test("removeDuplicatedSpans: cross-document 3-grams cut, unique text survives in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta unique one two"),
      (2L, "prefix words alpha beta gamma delta suffix"),
      (3L, "totally different text with nothing shared"),
      (4L, "tiny doc"), // < 3 tokens: no spans, untouched
      (5L, "")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2))).toMap
    // "alpha beta gamma delta" is shared between docs 1 and 2: its two
    // 3-grams cover those 4 tokens in both documents
    assert(r(1L) == (("unique one two", 4L)), r(1L).toString)
    assert(r(2L) == (("prefix words suffix", 4L)), r(2L).toString)
    // nothing shared -> untouched, order preserved
    assert(r(3L) == (("totally different text with nothing shared", 0L)))
    // sub-n documents carry no spans and pass through
    assert(r(4L) == (("tiny doc", 0L)))
    assert(r(5L) == (("", 0L)))
  }

  test("removeDuplicatedSpans: within-document repetition alone is not shared") {
    import spark.implicits._
    val docs = Seq(
      (1L, "echo echo echo echo echo echo"), // repeats only inside itself
      (2L, "other words entirely here")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(2) == 0L, "single-doc repetition must survive")
    assert(r(1).getLong(2) == 0L)
  }

  test("topTerms ranks by document frequency with total term counts") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "beta beta delta"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.topTerms(docs, "doc_id", "text", k = 2).collect()
    assert(top(0).getString(0) == "alpha" && top(0).getLong(1) == 2 && top(0).getLong(2) == 3)
    assert(top(1).getString(0) == "beta" && top(1).getLong(1) == 2 && top(1).getLong(2) == 3)
  }

  test("canonicalPerGroup keeps the highest-scored member; min id breaks score ties") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L))
      .toDF("id", "group_id")
    val scored = Seq((1L, 0.2), (2L, 0.9), (3L, 0.5), (7L, 0.4), (9L, 0.4))
      .toDF("doc_id", "q")
    val out = graft.operators.Dedup.canonicalPerGroup(
        labels, "id", "group_id", scored, "doc_id", "q")
      .orderBy("group_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 0.9), (7L, 7L, 0.4))) // group 7: tie -> min id
  }

  test("vocabDivergence: identical corpora diverge 0; disjoint corpora diverge symmetrically") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val same = TextAnalysis.vocabDivergence(a, a, "text").collect()(0)
    assert(same.getLong(0) == 3 && same.getLong(1) == 3 && same.getLong(2) == 3)
    assert(same.getLong(3) == 0L && same.getLong(4) == 0L && same.getLong(5) == 0L)
    val b = Seq((3L, "delta epsilon")).toDF("doc_id", "text")
    val diff = TextAnalysis.vocabDivergence(a, b, "text").collect()(0)
    assert(diff.getLong(0) == 3 && diff.getLong(1) == 2 && diff.getLong(2) == 0)
    // α=0.5 smoothing over 5 union tokens with counts this small caps
    // the JSD well under ln 2 — the signal is the ORDERING, not scale
    // (divergences are micro-unit BIGINTs: value × 10⁶)
    assert(diff.getLong(3) > 150000L, s"disjoint corpora must diverge: $diff")
    // exact per-token recomputation with p = (c+0.5)/(tot+0.5·V), V=5:
    // counts (alpha, beta, gamma, delta, epsilon) = A(2,2,1,0,0), B(0,0,0,1,1)
    val v = 5.0
    def p(c: Long, tot: Long) = (c + 0.5) / (tot + 0.5 * v)
    val tokens = Seq((2L, 0L), (2L, 0L), (1L, 0L), (0L, 1L), (0L, 1L))
    val expKlAb = tokens.map { case (ca, cb) =>
      val pa = p(ca, 5L); val qb = p(cb, 2L)
      pa * math.log(pa / qb)
    }.sum
    assert(math.abs(diff.getLong(4) - math.floor(expKlAb * 1e6 + 0.5)) <= 1,
      s"kl_ab_micro ${diff.getLong(4)} vs expected $expKlAb")
  }

  test("oovRate: vocabulary covers the frequent tokens; rare-token groups show higher OOV") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "common common common word"),
      (2L, "en", "common word word"),
      (3L, "zh", "rare unique tokens common"))
      .toDF("doc_id", "lang", "text")
    // vocab size 2 = {common(5), word(3)} (freq desc, token asc)
    val out = TextAnalysis.oovRate(df, "text", "lang", vocabSize = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("en", 7L, 7L, 0.0),          // all en tokens in vocab
      ("zh", 4L, 1L, 0.75)))        // only 'common' covered
  }

  test("divergentTokens ranks by |log ratio| with a total order") {
    import spark.implicits._
    val a = Seq((1L, "alpha alpha alpha shared")).toDF("doc_id", "text")
    val b = Seq((2L, "omega omega omega shared")).toDF("doc_id", "text")
    val out = TextAnalysis.divergentTokens(a, b, "text", k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // alpha (3 vs 0) and omega (0 vs 3) are the extremes, tie on |ratio|
    // -> token asc; shared (1 vs 1) is least divergent
    assert(out.take(2).map(_._1).toSeq == Seq("alpha", "omega"), out.mkString(","))
    assert(out(2)._1 == "shared")
  }

  test("selectTopQuantilePerStratum keeps each stratum's top fraction by score, ties kept") {
    import spark.implicits._
    val df = ((1 to 10).map(i => (i.toLong, "s1", i * 10)) ++
      (11 to 14).map(i => (i.toLong, "s2", 7))).toDF("id", "src", "score")
    val kept = graft.operators.Sampling
      .selectTopQuantilePerStratum(df, "src", "score", keepFraction = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // s1: percentile(score, 0.7) over 10..100 = 73 -> keep 80,90,100 (ids 8,9,10)
    assert(kept.filter(_._2 == "s1").map(_._1).toSeq == Seq(8L, 9L, 10L))
    // s2: all scores tie at 7 = threshold -> ALL kept (boundary ties kept)
    assert(kept.filter(_._2 == "s2").map(_._1).toSeq == Seq(11L, 12L, 13L, 14L))
    // the sketch path (the 100 TB default) agrees on this fixture
    val approx = graft.operators.Sampling
      .selectTopQuantilePerStratum(df, "src", "score", 0.3, exact = false)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(approx.filter(_._2 == "s2").map(_._1).toSeq == Seq(11L, 12L, 13L, 14L))
    // a NULL stratum is a real group: it must get its own threshold and
    // survive the (null-safe) join rather than silently vanish
    val withNull = ((1 to 10).map(i => (i.toLong, Option("s1"), i * 10)) ++
      (21 to 24).map(i => (i.toLong, Option.empty[String], i)))
      .toDF("id", "src", "score")
    val keptNull = graft.operators.Sampling
      .selectTopQuantilePerStratum(withNull, "src", "score", keepFraction = 0.3)
      .collect().map(_.getLong(0)).sorted
    // null stratum scores 21..24: percentile 0.7 = 23.1 -> keep 24
    assert(keptNull.toSeq == Seq(8L, 9L, 10L, 24L), keptNull.mkString(","))
  }

  test("canonicalPerGroup: STRING ids keep the deterministic smallest-id tie-break") {
    import spark.implicits._
    // r11 ADVICE: (-col(id)) on a string id cast to a NULL double and
    // silently lost the documented tie-break; string ids now negate the
    // numeric score and take the min over (-score, id)
    val labels = Seq(("docB", "g1"), ("docA", "g1"), ("docC", "g1"), ("x2", "g2"), ("x1", "g2"))
      .toDF("id", "group_id")
    val scored = Seq(("docA", 0.4), ("docB", 0.4), ("docC", 0.1), ("x1", 0.7), ("x2", 0.9))
      .toDF("doc_id", "q")
    val out = graft.operators.Dedup.canonicalPerGroup(
        labels, "id", "group_id", scored, "doc_id", "q")
      .orderBy("group_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // g1: score tie 0.4/0.4 -> lexicographically smallest id docA wins
    assert(out.toSeq == Seq(("g1", "docA", 0.4), ("g2", "x2", 0.9)))
  }

  test("minhashDroppedBuckets reports oversized LSH buckets; cap drops them from pairs") {
    import spark.implicits._
    // 8 identical boilerplate docs -> every band's bucket has 8 members;
    // cap at 4 drops them all, and the diagnostic must say so
    val docs = (1L to 8L).map(i => (i, "the same boilerplate sentence repeated verbatim here"))
      .toDF("doc_id", "text")
    val cfg = graft.operators.Dedup.LshConfig(maxBucketSize = 4)
    val pairs = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text", cfg)
    assert(pairs.count() == 0, "capped buckets must produce no pairs")
    val stats = graft.operators.Dedup.minhashDroppedBuckets(docs, "doc_id", "text", cfg)
      .agg(org.apache.spark.sql.functions.sum("dropped_buckets"),
        org.apache.spark.sql.functions.max("largest_bucket")).collect()(0)
    assert(stats.getLong(0) == cfg.bands.toLong, s"expect one dropped bucket per band: $stats")
    assert(stats.getLong(1) == 8L, s"largest bucket should be 8: $stats")
  }

  test("removeDuplicatedSpansWithCleanup matches the plain variant; cleanup releases the cache") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta shared span here omega"),
      (2L, "uno dos shared span here tres quatro"),
      (3L, "totally unique words nothing repeats at all"))
      .toDF("doc_id", "text")
    val plain = Dedup.removeDuplicatedSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // other suites' GC-owned localCheckpoint blocks may linger in the
    // shared session — assert on the DELTA, not the absolute registry
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (df, cleanup) = Dedup.removeDuplicatedSpansWithCleanup(docs, "doc_id", "text")
    val cached = df.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(cached.toSeq == plain.toSeq)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).nonEmpty,
      "WithCleanup should persist the token projection")
    cleanup()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "cleanup() must release the persisted tokens")
    // the shared 3-grams "shared span here" cover 3 tokens in docs 1 and 2
    assert(plain.map(_._3).toSeq == Seq(3L, 3L, 0L))
  }
}
