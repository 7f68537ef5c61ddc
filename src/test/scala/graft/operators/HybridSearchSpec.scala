package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Filtered vector search + hybrid BM25/cosine RRF fusion. */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")
  lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def queryVec: Array[Float] =
    embeddings.where($"vec_id" === 0).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

  test("filteredTopK equals topK over the pre-filtered frame") {
    val pred = col("lang") === "en"
    val got = Similarity.filteredTopK(embeddings, "vec_id", "embedding",
      documents, "doc_id", pred, queryVec, k = 5).collect()
    val allowedIds = documents.where(pred).select("doc_id")
      .as[Long].collect().toSet
    val manual = Similarity.topK(
      embeddings.where($"vec_id".isInCollection(allowedIds)),
      "vec_id", "embedding", queryVec, 5).collect()
    assert(got.map(_.getLong(0)).toSeq == manual.map(_.getLong(0)).toSeq)
    got.foreach(r => assert(allowedIds.contains(r.getLong(0)),
      s"vec ${r.getLong(0)} outside the filter"))
  }

  test("filteredTopK pushes the metadata predicate to the documents scan and ranks via TakeOrderedAndProject") {
    val plan = Similarity.filteredTopK(embeddings, "vec_id", "embedding",
      documents, "doc_id", col("lang") === "en", queryVec, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(lang,en)"),
      s"lang predicate not pushed to the parquet scan:\n$plan")
  }

  test("ivfTopKFiltered at full probe equals exact filteredTopK") {
    val pred = col("lang") === "en"
    val idx = Similarity.ivfIndex(embeddings, "vec_id", "embedding",
      nlist = 4, assignReplicas = 2)
    val allowed = documents.where(pred).select("doc_id")
    val got = Similarity.ivfTopKFiltered(idx, queryVec.map(_.toDouble), k = 5,
      nprobe = 4, allowed, "doc_id").collect().map(_.getLong(0)).toSeq
    val exact = Similarity.filteredTopK(embeddings, "vec_id", "embedding",
      documents, "doc_id", pred, queryVec, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("ivfTopKFiltered never returns ids outside the allowed set") {
    val idx = Similarity.ivfIndex(embeddings, "vec_id", "embedding", nlist = 4)
    val allowed = documents.where(col("lang") === "zh").select("doc_id")
    val allowedSet = allowed.as[Long].collect().toSet
    val got = Similarity.ivfTopKFiltered(idx, queryVec.map(_.toDouble), k = 10,
      nprobe = 4, allowed, "doc_id").collect().map(_.getLong(0))
    got.foreach(id => assert(allowedSet.contains(id)))
  }

  test("rrfFuse: hand-computed fusion, doc in both lists outranks single-list docs") {
    val lex = Seq((10L, 3.0), (20L, 2.0), (30L, 1.0)).toDF("doc_id", "score")
    val vec = Seq((20L, 0.9), (40L, 0.8), (10L, 0.7)).toDF("doc_id", "cosine")
    val fused = HybridSearch.rrfFuse(
      Seq((lex, "score"), (vec, "cosine")), "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def rrf(ranks: Seq[Int]): Double =
      BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // lex ranks: 10->1, 20->2, 30->3; vec ranks: 20->1, 40->2, 10->3
    val expected = Seq(
      (20L, rrf(Seq(2, 1)), 2L), (10L, rrf(Seq(1, 3)), 2L),
      (40L, rrf(Seq(2)), 1L), (30L, rrf(Seq(3)), 1L))
    assert(fused.toSeq == expected, s"got ${fused.toSeq}")
  }

  test("searchDocuments fuses BM25 and cosine lists and keeps both signals") {
    val out = HybridSearch.searchDocuments(
      documents, "doc_id", "text", embeddings, "vec_id", "embedding",
      Seq("spark", "window", "merge"), queryVec.map(_.toDouble),
      nPerList = 20, k = 10)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // scores strictly ordered desc with id tiebreak; n_lists in {1, 2}
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sortBy(-_.toDouble)))
    rows.foreach(r => assert(r.getLong(2) == 1L || r.getLong(2) == 2L))
    // vec 0 is the query itself: cosine rank 1 guarantees membership
    assert(rows.map(_.getLong(0)).contains(0L))
  }

  test("searchDocuments list subplans rank via TakeOrderedAndProject (no corpus-wide sort)") {
    val plan = HybridSearch.searchDocuments(
      documents, "doc_id", "text", embeddings, "vec_id", "embedding",
      Seq("spark", "window", "merge"), queryVec.map(_.toDouble),
      nPerList = 20, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
