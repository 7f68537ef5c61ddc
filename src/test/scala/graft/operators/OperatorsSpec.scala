package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim matches a hand-computed value and is 1.0 on self") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),   // orthogonal -> 0
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f)),   // identical -> 1
      (Array(1.0f, 0.0f), Array(1.0f, 1.0f))    // 45 degrees -> 1/sqrt(2)
    ).toDF("a", "b")
    val out = df.select(cosine_sim($"a", $"b")).as[Double].collect()
    assert(math.abs(out(0)) < 1e-12)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("cosine_sim returns null for zero vectors") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(cosine_sim($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("cosine_sim survives codegen (used inside a filter + projection)") {
    val df = Seq.tabulate(100)(i => (i.toLong, Array(i.toFloat, 1.0f))).toDF("id", "v")
    val q = array(lit(1.0f), lit(1.0f))
    val n = df.where(cosine_sim($"v", q) > 0.9).count()
    assert(n > 0 && n < 100)
  }

  test("minhash signature is deterministic, fixed-length, set-like") {
    val df = Seq(
      Tuple1(Seq("a b c", "b c d", "c d e")),
      Tuple1(Seq("c d e", "b c d", "a b c")), // same set, different order
      Tuple1(Seq("x y z", "y z w", "z w v"))
    ).toDF("sh")
    val sigs = df.select(minhash_signature($"sh", 64)).as[Seq[Long]].collect()
    assert(sigs(0).length == 64)
    assert(sigs(0) == sigs(1)) // order-independent
    assert(sigs(0) != sigs(2))
  }

  test("simhash: near-identical token sets land within small hamming distance") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "changed")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(Tuple1(base), Tuple1(near), Tuple1(far)).toDF("t")
    val hs = df.select(simhash64($"t")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) <= 8)
    assert(ham(hs(0), hs(2)) > 16)
  }

  test("doc_fingerprint stable and sensitive") {
    val df = Seq("the quick brown fox jumps over the lazy dog" * 3).toDF("t")
    val f1 = df.select(doc_fingerprint($"t")).as[Long].collect()(0)
    val f2 = df.select(doc_fingerprint($"t")).as[Long].collect()(0)
    assert(f1 == f2)
    val g = Seq("a completely different document body with other words" * 3).toDF("t")
    assert(g.select(doc_fingerprint($"t")).as[Long].collect()(0) != f1)
  }

  test("SQL registration exposes the functions") {
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    assert(spark.sql("SELECT hamming64(0L, 7L) AS h").collect()(0).getInt(0) == 3)
    val cd = spark.sql("SELECT char_distribution('abab') AS d").collect()(0).getStruct(0)
    assert(cd.getDouble(0) == 1.0 && cd.getInt(1) == 2)
    val q = spark.sql("SELECT int8_quantize_stats(array(1.0d, -0.5d)) AS s").collect()(0).getStruct(0)
    assert(q.getLong(1) == 127L * 127 + 64L * 64) // round(-0.5/ (1/127)) = -64 (ties away)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 1
    (4L, "completely unrelated text about spark catalyst optimizer rules and plans"),
    (5L, "another very different document discussing parquet columnar storage formats")
  ).toDF("doc_id", "text")

  test("exact duplicate groups find the planted dup") {
    val g = Dedup.exactDuplicateGroups(docs, "doc_id", Seq("text")).collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("keep_id") == 1L && g(0).getAs[Long]("dup_count") == 2L)
  }

  test("dedupExact keeps the minimal id deterministically") {
    val kept = Dedup.dedupExact(docs, "doc_id", Seq("text")).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("minhash near-dups find exact and near pair, not unrelated docs") {
    val pairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text", threshold = 0.5,
      Dedup.LshConfig(numHashes = 64, bands = 16)).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)))
    assert(ids.contains((1L, 3L)) || ids.contains((2L, 3L)))
    assert(!ids.exists { case (a, b) => Set(a, b).contains(4L) || Set(a, b).contains(5L) })
    val j12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    assert(j12 == 1.0) // identical text -> jaccard exactly 1
  }

  test("simhash near-dups agree on the exact pair") {
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard matches minhash-verified jaccard for the near pair") {
    val ng = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(ng((1L, 2L)) == 1.0)
    assert(ng.contains((1L, 3L)))
    val mh = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 0.5,
      Dedup.LshConfig(numHashes = 64, bands = 16))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(ng((1L, 3L)) - mh((1L, 3L))) < 1e-12) // both exact-verified
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("brute-force topK: self is rank 1 with cosine 1.0") {
    val q = embeddings.where($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val top = Similarity.topK(embeddings, "vec_id", "embedding", q, 5).collect()
    assert(top(0).getLong(0) == 7L)
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-9)
    val cosines = top.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sortBy(-_.toDouble)))
  }

  test("hardNegatives: nearest DIFFERENT-label vectors only, never a same-label one") {
    val df = Seq(
      (1L, Array(1.0, 0.0), "a"),   // anchor
      (2L, Array(0.99, 0.14), "a"), // same label, nearest overall -> excluded
      (3L, Array(0.9, 0.44), "b"),  // different label, near -> rank 1
      (4L, Array(0.0, 1.0), "b"),   // different label, far -> rank 2
      (5L, Array(0.95, 0.31), "a")  // same label -> excluded
    ).toDF("vec_id", "emb", "lbl")
    val anchors = df.where($"vec_id" === 1)
    val out = Similarity.hardNegatives(df, "vec_id", "emb", "lbl",
      anchors, "vec_id", "emb", "lbl", k = 5).orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 4L))
    assert(out.forall(_.getString(2) == "b"))
    assert(out(0).getInt(4) == 1 && out(1).getInt(4) == 2)
  }

  test("lsh topK returns a subset consistent with brute force ranking") {
    val q = embeddings.where($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val lsh = Similarity.lshTopK(embeddings, "vec_id", "embedding", q, 10, numBits = 4)
      .collect()
    assert(lsh.nonEmpty)
    assert(lsh(0).getLong(0) == 7L) // query always hashes to its own bucket
  }

  test("multi-probe lshTopK hits recall@10 >= 0.9 at a 300-candidate budget") {
    val q = embeddings.where($"vec_id" === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val gold = Similarity.topK(embeddings, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val lsh = Similarity.lshTopK(embeddings, "vec_id", "embedding", q, 10,
      numBits = 16, minCandidates = 300)
      .collect().map(_.getLong(0)).toSet
    val recall = gold.intersect(lsh).size.toDouble / gold.size
    assert(recall >= 0.9, s"recall@10 = $recall (gold $gold vs lsh $lsh)")
  }

  test("banded cosineNearDupPairs finds planted perturbed pairs (recall) and nothing else (precision)") {
    import org.apache.spark.sql.functions._
    val e = embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val planted = e.where($"vec_id" < 10)
      .select(($"vec_id" + 100000).as("vec_id"),
        concat(array(element_at($"emb", 1) + lit(0.25)), slice($"emb", 2, 63)).as("emb"))
    val pairs = Similarity.cosineNearDupPairs(e.union(planted), "vec_id", "emb",
      threshold = 0.95, dim = 64, chunks = 8).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == (0L until 10L).map(i => (i, i + 100000)).toSet, s"got $found")
    assert(pairs.forall(_.getDouble(2) >= 0.95))
  }

  test("topK plans as TakeOrderedAndProject (no full sort, no shuffle of all rows)") {
    val q = Array.fill(64)(0.1f)
    val plan = Similarity.topK(embeddings, "vec_id", "embedding", q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("clustered corpus: IVF at the default seed prunes to 2/8 cells with recall@10 = 1.0") {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val centers = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"emb".as("cemb"))
    val clustered = e.join(org.apache.spark.sql.functions.broadcast(centers),
        pmod($"vec_id", org.apache.spark.sql.functions.lit(8)) === $"cid")
      .select($"vec_id", zip_with($"cemb", $"emb",
        (c, x) => c + org.apache.spark.sql.functions.lit(0.05) * x).as("emb"))
    val q = clustered.where($"vec_id" === 1).select("emb").head().getSeq[Double](0).toArray
    val exact = Similarity.topK(clustered, "vec_id", "emb", q, 10)
      .select("vec_id").as[Long].collect().toSet
    val idx = Similarity.ivfIndex(clustered, "vec_id", "emb", nlist = 8)
    val got = Similarity.ivfTopK(idx, q, 10, nprobe = 2)
      .select("id").as[Long].collect().toSet
    assert(got == exact, s"ivf=$got exact=$exact")
  }

  test("IVF-pruned knn join equals the brute-force knn join on the clustered frame, with no cartesian") {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val centers = e.where($"vec_id" < 8).select($"vec_id".as("cid"), $"emb".as("cemb"))
    val clustered = e.join(org.apache.spark.sql.functions.broadcast(centers),
        pmod($"vec_id", org.apache.spark.sql.functions.lit(8)) === $"cid")
      .select($"vec_id", zip_with($"cemb", $"emb",
        (c, x) => c + org.apache.spark.sql.functions.lit(0.05) * x).as("emb"))
    val q = clustered.where($"vec_id".isin(1, 2, 3))
    val brute = Similarity.knnJoin(clustered, "vec_id", "emb", q, "vec_id", "emb", k = 5)
      .select($"query_id", $"id", round($"cosine", 4).as("c"), $"rank")
      .collect().map(_.toString).sorted.toSeq
    val idx = Similarity.ivfIndex(clustered, "vec_id", "emb", nlist = 8)
    val pruned = Similarity.knnJoinIvf(idx, q, "vec_id", "emb", k = 5, nprobe = 2)
      .select($"query_id", $"id", round($"cosine", 4).as("c"), $"rank")
    assert(pruned.collect().map(_.toString).sorted.toSeq == brute)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    // per-query top-k is the bounded-heap aggregate, not a window sort
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("WindowExec"), plan.take(3000))
  }

  test("trainingSample draws across the whole id range of a skew-ordered frame, deterministically") {
    import spark.implicits._
    // one partition, physically ordered by id: head-of-table = ids 0..n-1
    // (the time/source-ordered-ingest shape where limit(n) is one shard)
    val skewed = (0L until 1000L).map(i => (i, Array(i.toDouble, 1.0)))
      .toDF("id", "emb").coalesce(1).sortWithinPartitions("id")
    def ids(): Seq[Long] =
      Similarity.trainingSample(skewed, "id", "emb", 100).map(_(0).toLong).toSeq
    val s = ids()
    assert(s.size == 100)
    // head-of-table would give exactly 0..99; the hash draw must span
    // the range — every quartile of the id space represented
    val quartiles = s.map(_ / 250).toSet
    assert(quartiles == Set(0L, 1L, 2L, 3L), s"sample ids: $s")
    assert(s.max > 900 && s.min < 100, s"sample ids: $s")
    // and it is a pure function of the id set: same call, same sample
    assert(ids() == s)
    // TakeOrderedAndProject, never a full sort of the corpus
    val plan = skewed.select($"id", $"emb".cast("array<double>").as("__emb"),
      org.apache.spark.sql.functions.xxhash64($"id").as("__h"))
      .orderBy($"__h", $"id").limit(100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and bpe-ish") {
    val df = Seq("hello world", "  a  b   c ", "", "don't stop!").toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount($"text").as("n"),
      TextAnalysis.bpeishTokenCount($"text").as("b")).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2, 3, 0, 2))
    // don't stop! -> [don, ', t, stop, !] = 5
    assert(out(3).getInt(1) == 5)
  }

  test("langId identifies stopword-heavy languages deterministically") {
    val df = Seq(
      "the cat is on the mat and it is happy with the sun",
      "el gato esta en la casa y el perro con la luna para los dos",
      "der hund und die katze sind in den garten mit dem ball",
      "zxq wvu ppo").toDF("text")
    val langs = df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(langs == Seq("en", "es", "de", "und"))
  }

  test("quality score is in [0,1], higher for substantial text") {
    val df = Seq(
      "short",
      ("a meaningful sentence with reasonable words and structure " * 10).trim,
      "!!! ??? ### 123 456 @@@ %%%").toDF("text")
    val q = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1) > q(0))
    assert(q(1) > q(2))
  }

  test("analyze emits the full typed projection") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextAnalysis.analyze(docs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "n_subtokens",
      "punct_ratio", "digit_ratio", "avg_word_len", "lang_pred", "quality", "fingerprint"))
    assert(out.count() == docs.count())
  }
}
