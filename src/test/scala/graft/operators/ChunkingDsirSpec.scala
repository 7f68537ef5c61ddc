package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Token-window chunking and DSIR hashed-n-gram importance weights. */
class ChunkingDsirSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens: window layout, overlap, and short-tail semantics") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b c"), //  3 tokens, single chunk
      (3L, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")) // 11 → short tail
      .toDF("doc_id", "text")
    val r = Chunking.chunkByTokens(docs, "doc_id", "text", size = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: step 3 → chunks at 0/3/6, each 4 tokens, exactly covering
    val d1 = r.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(d1.map(_.getAs[Long]("start_token")).toSeq == Seq(0L, 3L, 6L))
    assert(d1.forall(_.getAs[Long]("n_chunk_tokens") == 4L))
    // consecutive chunks share exactly `overlap` tokens
    assert(d1(0).getAs[String]("chunk_text").split(" ").last ==
      d1(1).getAs[String]("chunk_text").split(" ").head)
    // doc 2: fewer tokens than size → one whole-doc chunk
    val d2 = r.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getAs[String]("chunk_text") == "a b c" &&
      d2(0).getAs[Long]("n_chunk_tokens") == 3L)
    // doc 3: 11 tokens → 4 chunks, last one the 2-token tail at 9
    val d3 = r.filter(_.getLong(0) == 3L)
    assert(d3.length == 4 && d3.last.getAs[Long]("start_token") == 9L &&
      d3.last.getAs[String]("chunk_text") == "x9 x10")
  }

  test("chunkByTokens: blank text keeps the document with one empty chunk") {
    val docs = Seq((1L, ""), (2L, "  \t "), (3L, "solo")).toDF("doc_id", "text")
    val r = Chunking.chunkByTokens(docs, "doc_id", "text", size = 8, overlap = 2)
      .orderBy("doc_id").collect()
    assert(r.length == 3)
    assert(r(0).getAs[String]("chunk_text") == "" &&
      r(0).getAs[Long]("n_chunk_tokens") == 0L)
    assert(r(1).getAs[String]("chunk_text") == "")
    assert(r(2).getAs[String]("chunk_text") == "solo")
  }

  test("chunkByTokens: pure flat-map — no shuffle in the executed plan") {
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", size = 3, overlap = 1)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("chunkByTokens: invalid size/overlap rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(docs, "doc_id", "text", size = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(docs, "doc_id", "text", size = 0, overlap = 0)
    }
  }

  test("dsirWeights: target-like docs score positive, off-domain negative") {
    val target = (1 to 30).map(i => (i.toLong, "spark shuffle partition broadcast join"))
      .toDF("doc_id", "text")
    val raw = (
      (1 to 10).map(i => (i.toLong, "spark shuffle partition broadcast join")) ++
      (11 to 20).map(i => (i.toLong, "pizza pasta basil oven tomato"))
    ).toDF("doc_id", "text")
    val r = TextAnalysis.dsirWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 20)
    r.filter(_.getLong(0) <= 10).foreach { row =>
      assert(row.getAs[Boolean]("selected"), s"target-like doc ${row.getLong(0)}")
      assert(row.getAs[Double]("dsir_logw") > 0)
    }
    r.filter(_.getLong(0) > 10).foreach { row =>
      assert(!row.getAs[Boolean]("selected"), s"off-domain doc ${row.getLong(0)}")
      assert(row.getAs[Double]("dsir_logw") < 0)
    }
  }

  test("dsirWeights: feature count is unigrams + bigrams; blanks absent") {
    val d = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "solo"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.dsirWeights(d, d, "doc_id", "text")
      .orderBy("doc_id").collect()
    // blank doc 2 carries no features and is absent
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // 3 words → 3 unigrams + 2 bigrams
    assert(r(0).getAs[Long]("n_feats") == 5L)
    // 1 word → WordShingles yields the whole text for BOTH n=1 and n=2
    assert(r(1).getAs[Long]("n_feats") == 2L)
  }

  test("dsirWeightsWhere: single-pass predicate variant equals the two-frame form") {
    val d = (1 to 60).map { i =>
      (i.toLong, if (i % 3 == 0) "spark shuffle join broadcast" else s"misc w$i text body", i % 3 == 0)
    }.toDF("doc_id", "text", "is_en")
    val a = TextAnalysis.dsirWeights(d, d.where(col("is_en")), "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = TextAnalysis.dsirWeightsWhere(d, col("is_en"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.length == b.length && a.length == 60)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x vs $y") }
  }

  test("dsirBucket: deterministic and inside [0, buckets)") {
    val d = (0 until 500).map(i => s"token$i word${i * 7}").toDF("ngram")
    val b = d.select(TextAnalysis.dsirBucket(col("ngram"), 4096).as("b"))
      .agg(min("b"), max("b"), countDistinct("b")).collect()(0)
    assert(b.getInt(0) >= 0 && b.getInt(1) < 4096)
    assert(b.getLong(2) > 100, "500 distinct ngrams should spread over >100 buckets")
  }

  test("dsirWeights: scoring model is bucket-bounded and broadcast back") {
    val d = (1 to 200).map(i => (i.toLong, s"w$i w${i + 1} w${i + 2} common")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(d, d.where(col("doc_id") <= 50), "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // (the 1-row totals crossJoin is a broadcast nested-loop by nature;
    // the corpus-side scoring join is the one that must hash-broadcast)
    assert(plan.contains("BroadcastHashJoin"), s"score join should be a broadcast hash join:\n$plan")
  }

  test("gumbelTopK: deterministic, weight-dominated, seed-sensitive") {
    // ±20 log-weight gap: Gumbel noise spans about [-3.2, 17.3] on a
    // 24-bit uniform, so no light row can ever outscore a heavy one
    val d = (1 to 1000).map(i =>
      (i.toLong, if (i <= 100) 20.0 else -20.0)).toDF("id", "logw")
    val a = Sampling.gumbelTopK(d, "id", col("logw"), k = 50).collect()
    val b = Sampling.gumbelTopK(d, "id", col("logw"), k = 50).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "must be deterministic")
    assert(a.length == 50)
    assert(a.forall(_.getLong(0) <= 100L), "all draws must come from the heavy rows")
    // keys arrive highest-first
    val keys = a.map(_.getAs[Double]("gumbel_key")).toSeq
    assert(keys == keys.sorted.reverse)
    // a different seed reorders the draw within the heavy rows
    val c = Sampling.gumbelTopK(d, "id", col("logw"), k = 50, seed = 99L).collect()
    assert(c.map(_.getLong(0)).toSeq != a.map(_.getLong(0)).toSeq)
  }

  test("gumbelTopK: equal weights draw a spread sample via TakeOrdered, not a global sort") {
    val d = (1 to 2000).map(i => (i.toLong, 0.0)).toDF("id", "logw")
    val out = Sampling.gumbelTopK(d, "id", col("logw"), k = 100)
    val rows = out.collect()
    assert(rows.length == 100)
    // uniform draw: ids should spread across the whole range, not cluster
    val ids = rows.map(_.getLong(0))
    assert(ids.count(_ <= 1000) > 20 && ids.count(_ > 1000) > 20)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a bounded heap, not a global sort:\n$plan")
  }
}
