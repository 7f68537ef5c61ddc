package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Composite training-data pipelines: the end-to-end corpus operations a
 * data-curation job runs, composed from the individual operators.
 */
object Pipelines {

  final case class DedupReport(
      input: Long, afterExact: Long, afterNear: Long,
      exactRemoved: Long, nearRemoved: Long)

  /**
   * Corpus deduplication: exact dedup (keep min id) then MinHash near-dup
   * removal (from each near-dup pair, drop the larger id — transitive
   * chains collapse to their minimum via iterated pair pruning on the
   * pair list, computed once).
   *
   * Returns the deduplicated corpus and a row-count report. Two shuffles
   * for exact (window) + the LSH pipeline for near; no driver-side data
   * except the bounded pair list aggregation counts.
   */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
      nearThreshold: Double = 0.85,
      cfg: Dedup.LshConfig = Dedup.LshConfig()): (DataFrame, DedupReport) = {
    import org.apache.spark.storage.StorageLevel
    val input = docs.count()
    // The exact-dedup window feeds three consumers (its own count, the
    // LSH pipeline, and the anti-join) — persist so the window computes
    // once instead of three times over the full corpus.
    val exact = Dedup.dedupExact(docs, idCol, Seq(textCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = exact.count()

    val pairs = Dedup.minhashNearDuplicates(exact, idCol, textCol, nearThreshold, cfg)
    // drop the larger id of every near-dup pair; a doc surviving means no
    // pair names it as the larger member
    val losers = pairs.select(col("id_b").as(idCol)).distinct()
    val deduped = exact.join(losers, Seq(idCol), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterNear = deduped.count()
    exact.unpersist(blocking = false)

    (deduped, DedupReport(
      input, afterExact, afterNear,
      exactRemoved = input - afterExact,
      nearRemoved = afterExact - afterNear))
  }

  /**
   * Corpus quality filter: language allow-list + quality floor + length
   * band, all pushdown-friendly column predicates over the text-analysis
   * projection.
   */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      allowedLangs: Seq[String] = Seq("en"),
      minQuality: Double = 0.3,
      minTokens: Int = 5, maxTokens: Int = 100000): DataFrame = {
    val analyzed = TextAnalysis.analyze(docs, idCol, textCol)
    docs.join(
      analyzed.where(
        col("lang_pred").isin(allowedLangs: _*) &&
          col("quality") >= minQuality &&
          col("n_tokens").between(minTokens, maxTokens))
        .select(idCol),
      Seq(idCol), "left_semi")
  }
}
