package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end RAG preprocessing + retrieval composition, built ONLY
 * from this library's operators: documents → token-window chunks
 * (Chunking) → hashed bag-of-words chunk embeddings (the DSIR bucket
 * hash as a feature hasher — deterministic, no model needed) → IVF
 * index (Similarity) → snippet query answered by nearest-chunk
 * retrieval, graded with RetrievalMetrics. The pin: querying with a
 * verbatim snippet of a document retrieves that document's chunk at
 * rank 1, through the same index shapes the operators ship for 100 TB
 * (flat-map chunking, narrow embedding projection, cell-pruned IVF
 * probe).
 */
class RagPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** Hashed bag-of-words embedding: count word-unigrams per md5 bucket
    * — a deterministic stand-in for a model encoder with the same
    * shape (array<double> column from a narrow projection). */
  private def hashEmbed(text: Column): Column = {
    val shingles = coalesce(graft.functions.word_shingles(text, 1), array())
    transform(sequence(lit(0), lit(dim - 1)), d =>
      size(filter(shingles, t =>
        TextAnalysis.dsirBucket(t, dim) === d)).cast("double"))
  }

  test("chunk -> hash-embed -> IVF index -> snippet retrieves its source chunk at rank 1") {
    // 40 documents with distinct vocabularies (doc i speaks words
    // w{i*50}..w{i*50+39}), each long enough to chunk
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${i * 50 + j}").mkString(" "))
    }.toDF("doc_id", "text")

    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", size = 16, overlap = 4)
      .withColumn("chunk_id", col("doc_id") * 100 + col("chunk_idx"))
    // 40 tokens, size 16, step 12 -> chunks at 0/12/24 = 3 per doc
    val nChunks = chunks.count()
    assert(nChunks == 40 * 3, s"40 docs x 3 chunks, got $nChunks")

    val embedded = chunks.select(col("chunk_id"), col("doc_id"),
      hashEmbed(col("chunk_text")).as("emb"))
    val index = Similarity.ivfIndex(embedded, "chunk_id", "emb", nlist = 8)

    // queries: a verbatim mid-chunk snippet from each of 10 documents
    // (tokens 12..19 live inside chunk 1, tokens 12..27)
    val queries = (0 until 10).map { i =>
      (i.toLong, (12 until 20).map(j => s"w${i * 50 + j}").mkString(" "))
    }.toDF("q_doc", "snippet")
    val qVecs = queries.select(col("q_doc"), hashEmbed(col("snippet")).as("qemb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

    val preds: DataFrame = qVecs.flatMap { case (qDoc, v) =>
      Similarity.ivfTopK(index, v, k = 3, nprobe = 4)
        .collect().zipWithIndex
        .map { case (r, i) => (qDoc, r.getLong(0), (i + 1).toLong) }
    }.toSeq.toDF("query_id", "id", "rank")

    // gold: any chunk of the snippet's source document is relevant
    val gold = chunks.select((col("doc_id")).as("query_id"), col("chunk_id").as("id"))
      .where(col("query_id") < 10)
    val pq = RetrievalMetrics.perQuery(preds, "query_id", "id", "rank",
      gold, "query_id", "id", k = 3).collect()
    // rank-1 hit for every query: disjoint vocabularies make the
    // source document's chunks the only ones sharing any bucket mass
    pq.foreach { r =>
      assert(r.getAs[Double]("rr") == 1.0,
        s"query ${r.getLong(0)} first relevant not at rank 1: $r")
    }
    // and specifically the rank-1 chunk belongs to the right document
    val rank1 = preds.where(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 10L).foreach { q =>
      assert(rank1(q) / 100 == q, s"query $q rank-1 chunk ${rank1(q)} from wrong doc")
    }
  }
}
