package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-statistics operators added this round: duplicated-span
  * detection, TF-IDF keywords, bigram LM counts, URL extraction, exact
  * group percentiles, nearest-centroid assignment. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("duplicatedSpanStats: shared spans counted per doc, unique docs at zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma".."gamma delta epsilon" with 2
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")) // no shared spans
      .toDF("doc_id", "text")
    val r = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 3)
      .orderBy("id").collect()
    // doc 1: 3 spans, all inside doc 2 → frac 1.0
    assert(r(0).getAs[Long]("n_shared") == 3L && r(0).getAs[Double]("dup_span_frac") == 1.0)
    // doc 2: 4 spans, 3 shared → 0.75
    assert(r(1).getAs[Int]("n_spans") == 4 && r(1).getAs[Long]("n_shared") == 3L)
    // doc 3: nothing shared
    assert(r(2).getAs[Long]("n_shared") == 0L && r(2).getAs[Double]("dup_span_frac") == 0.0)
  }

  test("duplicatedSpanStats: empty/whitespace-only docs get a defined zero row, not nulls") {
    val docs = Seq(
      (1L, ""),
      (2L, "   \t  "),
      (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val r = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 3)
      .orderBy("id").collect()
    assert(r.length == 3)
    Seq(0, 1).foreach { i =>
      assert(!r(i).isNullAt(r(i).fieldIndex("n_spans")), s"row $i n_spans null")
      assert(r(i).getAs[Int]("n_spans") == 0)
      assert(r(i).getAs[Long]("n_shared") == 0L)
      assert(r(i).getAs[Double]("dup_span_frac") == 0.0)
    }
    assert(r(2).getAs[Int]("n_spans") == 2)
  }

  test("tfidfTopTerms: corpus-wide words rank below distinctive ones") {
    val docs = Seq(
      (1L, "common common spark catalyst"),
      (2L, "common tungsten tungsten tungsten"),
      (3L, "common shuffle"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .orderBy("id").collect()
    // "common" appears in every doc → idf = ln(1) = 0; the distinctive
    // term must win in each doc
    assert(top.map(_.getAs[String]("token")).toSeq == Seq("catalyst", "tungsten", "shuffle"))
    assert(top.forall(_.getAs[Int]("rank") == 1))
  }

  test("bigramModel: counts and conditional probabilities") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "single")) // < 2 tokens → no bigram
      .toDF("doc_id", "text")
    val m = TextAnalysis.bigramModel(docs, "text", k = 10).collect()
      .map(r => r.getAs[String]("bigram") -> (r.getAs[Long]("n"), r.getAs[Double]("cond_p"))).toMap
    // doc1: "a b", "b a", "a b"; doc2: "a b", "b c"
    assert(m("a b")._1 == 3L && m("a b")._2 == 1.0) // all "a ·" bigrams are "a b"
    assert(m("b a")._1 == 1L && m("b a")._2 == 0.5) // "b ·" splits between a and c
    assert(m("b c")._1 == 1L && m("b c")._2 == 0.5)
    assert(!m.keySet.exists(_.contains("single")))
  }

  test("extractUrls: one row per occurrence with host; no-URL docs vanish") {
    val docs = Seq(
      (1L, "see https://a.example.com/x/y and http://b.example.org plus https://a.example.com/x/y"),
      (2L, "no links here"))
      .toDF("doc_id", "text")
    val u = TextAnalysis.extractUrls(docs, "doc_id", "text").collect()
    assert(u.length == 3)
    assert(u.count(_.getAs[String]("domain") == "a.example.com") == 2)
    assert(u.forall(_.getAs[Long]("doc_id") == 1L))
  }

  test("exactPercentiles: PERCENTILE_CONT interpolation per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0))
      .toDF("g", "v")
    val r = graft.catalog.Profiler.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 0.95))
      .orderBy("g").collect()
    // group a: p50 at rank 0.5*3 = 1.5 → 2.5; p95 at 2.85 → 3.85
    assert(r(0).getAs[Double]("p50") == 2.5 && r(0).getAs[Double]("p95") == 3.85)
    assert(r(1).getAs[Double]("p50") == 10.0 && r(1).getAs[Long]("n") == 1L)
  }

  test("exactPercentiles: close fractions get distinct column names, never silently collide") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("g", "v")
    val r = graft.catalog.Profiler.exactPercentiles(df, Seq("g"), "v", Seq(0.95, 0.954))
    // p=0.95 and p=0.954 both round to 95% — names must still differ
    assert(r.columns.contains("p95") && r.columns.contains("p95_4"), r.columns.mkString(","))
    val row = r.collect()(0)
    assert(!row.isNullAt(row.fieldIndex("p95")) && !row.isNullAt(row.fieldIndex("p95_4")))
    intercept[IllegalArgumentException] {
      graft.catalog.Profiler.exactPercentiles(df, Seq("g"), "v", Seq(0.5, 0.5))
    }
  }

  test("removeBoilerplate: high-frequency segments drop, documents reassemble in order") {
    // a 4-token boilerplate footer shared by 3 docs (chunkTokens = 4)
    val footer = "all rights reserved footer"
    val docs = Seq(
      (1L, "alpha beta gamma delta " + footer),
      (2L, "epsilon zeta eta theta " + footer),
      (3L, "iota kappa lambda mu " + footer),
      (4L, "unique content only here nothing shared at all today")) // 2 chunks, both kept
      .toDF("doc_id", "text")
    val r = Pipelines.removeBoilerplate(docs, "doc_id", "text", chunkTokens = 4, maxDocFreq = 2)
      .orderBy("doc_id").collect()
    assert(r.length == 4)
    assert(r(0).getAs[String]("clean_text") == "alpha beta gamma delta")
    assert(r(0).getAs[Long]("n_kept_chunks") == 1L)
    // the unique doc keeps both chunks, stitched in order
    assert(r(3).getAs[String]("clean_text") ==
      "unique content only here nothing shared at all today")
    // a doc that is ALL boilerplate disappears
    val all = Seq((1L, footer), (2L, footer), (3L, footer), (4L, footer)).toDF("doc_id", "text")
    assert(Pipelines.removeBoilerplate(all, "doc_id", "text", 4, 2).count() == 0)
  }

  test("knnJoin: per-query top-k equals the single-query topK operator") {
    graft.sources.Sources.register(spark, sfDir)
    val e = spark.table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val queries = e.where(col("vec_id") < 3)
    val joined = Similarity.knnJoin(e, "vec_id", "emb", queries, "vec_id", "emb", k = 4)
      .collect().groupBy(_.getAs[Long]("query_id"))
    assert(joined.keySet == Set(0L, 1L, 2L))
    for (qid <- Seq(0L, 1L, 2L)) {
      val qv = spark.table("embeddings").where(col("vec_id") === qid)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val single = Similarity.topK(
        spark.table("embeddings"), "vec_id", "embedding", qv, k = 4)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      val batch = joined(qid).sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
      assert(batch == single, s"query $qid: $batch vs $single")
    }
  }

  test("assignNearestCentroid: argmax cosine, ties to lower centroid id") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), // centroid 0
      (1L, Array(0.0, 1.0)), // centroid 1
      (10L, Array(0.9, 0.1)), // → centroid 0
      (11L, Array(0.1, 0.9)), // → centroid 1
      (12L, Array(1.0, 1.0))) // equidistant → tie to centroid 0
      .toDF("vec_id", "emb")
    val cents = vecs.where(col("vec_id") < 2)
    val r = Similarity.assignNearestCentroid(vecs, "vec_id", "emb", cents, "vec_id", "emb")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("cluster")).toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("kmeansStep: M-step means and member counts per (cluster, dimension)") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), // centroid 0
      (1L, Array(0.0, 1.0)), // centroid 1
      (10L, Array(0.8, 0.2)), // → cluster 0
      (11L, Array(0.6, 0.4)), // → cluster 0
      (12L, Array(0.1, 0.9))) // → cluster 1
      .toDF("vec_id", "emb")
    val cents = vecs.where(col("vec_id") < 2)
    val r = Similarity.kmeansStep(vecs, "vec_id", "emb", cents, "vec_id", "emb")
      .collect().map(x => (x.getAs[Long]("cluster"), x.getAs[Int]("pos")) ->
        (x.getAs[Double]("value"), x.getAs[Long]("n_members"))).toMap
    // cluster 0 = {0, 10, 11}: mean (1.0+0.8+0.6)/3 = 0.8, (0+0.2+0.4)/3 = 0.2
    assert(r((0L, 0)) == (0.8, 3L) && r((0L, 1)) == (0.2, 3L))
    // cluster 1 = {1, 12}: mean (0+0.1)/2 = 0.05, (1.0+0.9)/2 = 0.95
    assert(r((1L, 0)) == (0.05, 2L) && r((1L, 1)) == (0.95, 2L))
    // centroid reassembly round-trips for the next E-step
    val cents2 = Similarity.kmeansNewCentroids(
      Similarity.kmeansStep(vecs, "vec_id", "emb", cents, "vec_id", "emb"))
      .collect().map(x => x.getAs[Long]("cluster") -> x.getSeq[Double](1)).toMap
    assert(cents2(0L) == Seq(0.8, 0.2) && cents2(1L) == Seq(0.05, 0.95))
  }

  test("bm25TopK: exact docs rank by tf saturation and idf, query-term filter inside the scan") {
    val docs = Seq(
      (1L, "spark spark spark run"), // tf=3 but saturating
      (2L, "spark run fast"), // tf=1, shorter doc
      (3L, "merge sort run"), // rarer term → higher idf
      (4L, "run fast slow deep")) // no query term → absent
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("spark", "merge"), k = 10)
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(!rows.contains(4L)) // docs without query terms never scored
    // doc 3's 'merge' (df=1) outweighs single-'spark' doc 2 (df=2)
    assert(rows(3L) > rows(2L), rows)
    // tf saturation: tf=3 scores above tf=1 for the same term but far
    // below 3x
    assert(rows(1L) > rows(2L) && rows(1L) < 3 * rows(2L), rows)
    // no corpus-sized shuffle: the postings side is filtered before any
    // aggregation, and ranking is TakeOrderedAndProject
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("semanticNearDupPairs: pairs form within clusters only, cross-cluster dupes invisible") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), // centroid 0
      (1L, Array(0.0, 1.0)), // centroid 1
      (10L, Array(0.9, 0.1)), // cluster 0
      (11L, Array(0.91, 0.1)), // cluster 0, near-dup of 10
      (20L, Array(0.1, 0.9)), // cluster 1
      (21L, Array(0.1, 0.91))) // cluster 1, near-dup of 20
      .toDF("vec_id", "emb")
    val cents = vecs.where(col("vec_id") < 2)
    val pairs = Similarity.semanticNearDupPairs(vecs, "vec_id", "emb",
        cents, "vec_id", "emb", threshold = 0.999)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // within-cluster near-dups surface; the 10↔20 style cross-cluster
    // pairs (cosine ~0.2) never even reach the cosine check
    assert(pairs.contains((10L, 11L)) && pairs.contains((20L, 21L)), pairs.toString)
    assert(pairs.forall { case (a, b) => Set(Set(10L, 11L), Set(20L, 21L), Set(0L, 10L), Set(0L, 11L),
      Set(1L, 20L), Set(1L, 21L)).exists(s => s == Set(a, b)) || a == b }, pairs.toString)
    // cluster scoping: a planted twin assigned to a DIFFERENT cluster is
    // by-design invisible (SemDeDup semantics), so no pair crosses clusters
    val assign = Similarity.assignNearestCentroid(vecs, "vec_id", "emb", cents, "vec_id", "emb")
      .collect().map(x => x.getAs[Long]("id") -> x.getAs[Long]("cluster")).toMap
    pairs.foreach { case (a, b) => assert(assign(a) == assign(b), s"cross-cluster pair ($a,$b)") }
  }

  test("bigramPerplexity: repetitive docs score lower perplexity than unpredictable ones") {
    val docs = Seq(
      (1L, "a b a b a b a b"), // every "a"→"b", "b"→"a": P=1 except corpus-level mixing
      (2L, "a b a c a d a e"), // "a" followed by 4 different words
      (3L, "single")) // < 2 tokens → absent
      .toDF("doc_id", "text")
    val r = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_bigrams"), x.getAs[Double]("perplexity"))).toMap
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L)._1 == 7L && r(2L)._1 == 7L)
    assert(r(1L)._2 < r(2L)._2, s"repetitive ${r(1L)._2} !< varied ${r(2L)._2}")
  }

  test("attributionReport: names the leaking eval doc with the shared-shingle count") {
    val benchmark = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while the sun sets slowly behind distant mountains"
    val other = "completely different benchmark text about query plans shuffles and " +
      "codegen stages inside the catalyst optimizer pipeline"
    val docs = Seq(
      (1L, benchmark + " with extra trailing words appended"), // leaks eval 100
      (2L, "clean document about unrelated streaming topics with watermark handling"),
      (3L, other + " plus more words at the end here")) // leaks eval 200
      .toDF("doc_id", "text")
    val evals = Seq((100L, benchmark), (200L, other)).toDF("eval_id", "text")
    val r = graft.operators.Decontamination.attributionReport(
        docs, "doc_id", "text", evals, "eval_id", "text", n = 3, minOverlap = 5)
      .collect().map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("eval_id"))).toSet
    assert(r == Set((1L, 100L), (3L, 200L)), r.toString)
  }

  test("crossEntropyDiff: target-like docs score positive, off-domain negative") {
    val raw = Seq(
      (1L, "spark shuffle codegen spark shuffle"),     // target-like
      (2L, "pasta recipe garlic olive pasta garlic"),  // off-domain
      (3L, "spark recipe")                             // mixed
    ).toDF("doc_id", "text")
    val target = Seq(
      Tuple1("spark shuffle codegen catalyst spark"),
      Tuple1("shuffle codegen spark partitions")).toDF("text")
    val out = graft.operators.TextAnalysis
      .crossEntropyDiff(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_tokens") === 5L)
    assert(out(0).getAs[Boolean]("selected"))      // spark-heavy -> selected
    assert(!out(1).getAs[Boolean]("selected"))     // pasta -> not selected
    assert(out(0).getAs[Double]("ce_diff") > out(2).getAs[Double]("ce_diff"))
    assert(out(2).getAs[Double]("ce_diff") > out(1).getAs[Double]("ce_diff"))
  }

  test("normalizeText folds case, accents and whitespace; variant docs share a fingerprint") {
    val df = Seq(
      (1L, "Café  au   lait"),
      (2L, "café AU LAIT"),
      (3L, "cafe au lait"),
      (4L, "completely different")
    ).toDF("doc_id", "text")
    val n = df.select($"doc_id",
      graft.operators.TextAnalysis.normalizeText($"text").as("nt")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(n(1L) === "cafe au lait")
    assert(n(2L) === "cafe au lait")
    assert(n(3L) === "cafe au lait")
    val g = graft.operators.TextAnalysis
      .normalizedDuplicateGroups(df, "doc_id", "text")
      .where($"n_docs" > 1).collect()
    assert(g.length === 1)
    assert(g(0).getAs[Long]("n_docs") === 3L)
    assert(g(0).getAs[Long]("first_doc") === 1L && g(0).getAs[Long]("last_doc") === 3L)
  }

  test("removeBoilerplateLines drops corpus-frequent lines, keeps order, never drops a doc") {
    val docs = Seq(
      (1L, "unique alpha\ncookie banner\nunique beta"),
      (2L, "cookie banner\nsolo line two"),
      (3L, "cookie banner"), // entirely boilerplate -> survives empty
      (4L, "final doc\ncookie banner\nlast words")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .removeBoilerplateLines(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out(0) === ((1L, "unique alpha\nunique beta", 1L)))
    assert(out(1) === ((2L, "solo line two", 1L)))
    assert(out(2) === ((3L, "", 1L))) // doc kept, text emptied
    assert(out(3) === ((4L, "final doc\nlast words", 1L)))
  }

  test("removeBoilerplateLines counts DISTINCT docs (repeats within one doc don't trip the threshold)") {
    val docs = Seq(
      (1L, "chorus\nchorus\nchorus\nchorus\nverse one"),
      (2L, "other text")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .removeBoilerplateLines(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    // "chorus" appears 4x but in only ONE doc -> not boilerplate
    assert(out(0).getString(1) === "chorus\nchorus\nchorus\nchorus\nverse one")
    assert(out(0).getLong(2) === 0L)
  }
}
