package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = Seq("x_dedup_ngram", "x_dedup_minhash", "x_dedup_simhash",
      "x_cosine_neardup", "x_dedup_corpus", "x_text_chunks", "x_events_sessions",
      // round-4 operators
      "x_dedup_groups", "x_decontam", "x_pii_redact", "x_stratified_sample",
      "x_vocab_top", "x_quality_filter", "x_ann_ivf",
      "x_repetition", "x_source_mix", "x_split", "x_curate",
      // round-4b operators
      "x_span_dup", "x_tfidf_top", "x_bigram_lm", "x_url_extract",
      "x_percentiles", "x_cluster_assign",
      // round-5 operators
      "x_semdedup", "x_perplexity", "x_decontam_report",
      // round-5b operators
      "x_entropy", "x_host_stats", "x_embed_quantize", "x_quantized_topk",
      "x_rand_proj", "x_bloom_decontam", "x_group_topk",
      "x_dedup_incremental", "x_pq_encode", "x_pq_topk",
      // round-6 operators
      "x_ann_ivf_clustered", "x_pq_persisted", "x_knn_join_ivf",
      "x_relative_date", "x_bm25", "x_kmeans_step", "x_leakage_split",
      "x_running_total",
      // round-7 operators
      "x_knn_join_ivfpq", "x_split_audit", "x_pq_errors", "x_zorder_value",
      "x_bpe_pairs",
      // round-9 operators (sketch indexes + FK inference)
      "x_sketch_distinct", "x_sketch_overlap", "x_sketch_quantiles",
      "x_fk_infer", "x_cms_counts",
      // round-10 operators (sketch-index query SERVING: build + route)
      "x_serve_distinct", "x_serve_quantile", "x_serve_overlap")
    val sfs = Seq("sf0.001" -> 0.001, "sf0.01" -> 0.01, "sf0.1" -> 0.1)
    // warmup at smallest sf (JIT + codegen)
    for ((q, _) <- Seq(queries.head -> 0)) graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
    val results = for (q <- queries) yield {
      val times = for ((sf, _) <- sfs) yield {
        val dir = s"/root/testdata/$sf"
        // min of 2 runs: a 27-query × 3-sf session accumulates JIT
        // recompiles and GC pauses that can inflate a single sample 10×
        // (an isolated session re-times the same query at 1/20th); the
        // exponent should measure the operator, not the session noise
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(q)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        // release operator-internal persists (same leak Bench clears) so
        // late queries don't measure earlier queries' eviction churn
        spark.catalog.clearCache()
        t
      }
      // log-log slope between sf0.01 and sf0.1 (10x data)
      val slope = math.log(times(2) / times(1)) / math.log(10.0)
      println(f"PROBE $q%-22s t(0.001)=${times(0)}%6.2fs t(0.01)=${times(1)}%6.2fs t(0.1)=${times(2)}%6.2fs  10x-exponent=${slope}%.2f")
      (q, slope)
    }
    println("PROBE exponent<=1.2 (near-linear) for all: " + results.forall(_._2 <= 1.2))
    spark.stop()
  }
}
