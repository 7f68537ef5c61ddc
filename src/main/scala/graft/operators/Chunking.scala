package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document chunking for retrieval / context-window pipelines: split
 * each document into fixed-token-budget windows with a configurable
 * overlap — the standard preprocessing step between a curated corpus
 * and an embedding index (every RAG stack chunks before it embeds, and
 * context-window packing consumes the same shape). The reference has
 * no chunking surface — its document pipeline operates on whole
 * records (`app/ai/nl2mongo.py:66-67`: find/pipeline queries return
 * complete documents under a LIMIT); this is part of the
 * training-data extension surface.
 *
 * Semantics: tokens are the whitespace-split words of the trimmed
 * text (empty text → zero tokens but still ONE empty chunk, so every
 * document appears in the output and downstream joins never lose
 * ids). Chunk `i` covers tokens `[i*step, i*step + size)` with
 * `step = size - overlap`; the last chunk may be shorter, and the
 * chunk count is `1 + ceil((n - size) / step)` for `n > size`, else 1
 * — no trailing degenerate chunk that a plain `ceil(n / step)` would
 * emit when the final window starts inside the previous one's tail.
 *
 * Scale: everything is per-row array arithmetic (split, slice,
 * sequence) inside whole-stage codegen — NO shuffle, NO UDF. Output
 * size is `(1/step)`× token count, so the operator is a flat map the
 * optimizer can pipeline into whatever scan or write follows; at
 * 100 TB it parallelizes by input split with zero coordination.
 */
object Chunking {

  /** Whitespace tokens of the trimmed text, empty-token-free (blank
    * text → empty array, matching the corpus-wide token accounting). */
  private def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /**
   * (id, chunk_idx, start_token, n_chunk_tokens, chunk_text) — one row
   * per chunk, `chunk_idx` 0-based and dense per document.
   */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 64, overlap: Int = 16): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    val nChunks = {
      val n = col("__n")
      when(n <= size, lit(1L))
        .otherwise(ceil((n - size).cast("double") / step).cast("long") + 1L)
    }
    docs
      .select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n",
        org.apache.spark.sql.functions.size(col("__t")).cast("long"))
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .withColumn("__slice",
        slice(col("__t"), (col("chunk_idx") * step + 1L).cast("int"), lit(size)))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * step).as("start_token"),
        org.apache.spark.sql.functions.size(col("__slice"))
          .cast("long").as("n_chunk_tokens"),
        array_join(col("__slice"), " ").as("chunk_text"))
  }
}
