package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{HybridSearch, Similarity}

/**
 * Force-scale probe for the round-11 retrieval additions: filtered
 * vector search and hybrid BM25+cosine RRF at 1M rows — where data
 * cost, not scheduler overhead, dominates (the r10/r11 probe
 * methodology). Prints PROBE lines; numbers recorded in COVERAGE.md.
 *
 * Checks:
 *  1. filteredTopK at 1M vectors with a 50% metadata filter — once
 *     with AQE free to broadcast the (narrow, id-only) allowed frame,
 *     once with broadcast disabled so the semi side must SHUFFLE —
 *     identical top-k either way (strategy changes must not change
 *     semantics), wall for both.
 *  2. hybrid searchDocuments at 1M synthetic docs + 1M vectors:
 *     end-to-end wall; the BM25 list scans the corpus once
 *     (term-filtered), the cosine list is scan→TakeOrdered, fusion is
 *     driver-sized.
 */
object ProbeRetrievalScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000000
    val dim = 16
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic synthetic corpus: unit-free pseudo-random vectors,
    // 50% 'en', 20 sources, text drawn from a 32-word vocab with the
    // probe terms planted in ~6% of docs
    val emb = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => pmod(hash(col("id"), j), lit(1000)).cast("double") / 500.0 - 1.0)
        .as("embedding"))
      .localCheckpoint()
    val vocab = (0 until 32).map(i => s"w$i")
    val meta = spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, "en").otherwise("de").as("lang"),
      concat(lit("src"), pmod(col("id"), lit(20))).as("source"),
      concat_ws(" ",
        (0 until 12).map(j => element_at(
          typedLit(vocab), (pmod(hash(col("id"), lit(j)), lit(32)) + 1).cast("int"))) ++
        Seq(when(pmod(col("id"), lit(17)) === 0, "spark"),
          when(pmod(col("id"), lit(19)) === 0, "window"),
          when(pmod(col("id"), lit(23)) === 0, "merge")): _*).as("text"))
      .localCheckpoint()
    val query = emb.where(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Double](0).toArray
    val pred = col("lang") === "en"

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // 1) filtered ANN, AQE free to broadcast the narrow id frame
    val (r1, t1) = time {
      Similarity.filteredTopK(emb, "vec_id", "embedding", meta, "doc_id",
        pred, query, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    println(f"PROBE filtered_ann_aqe n=$n wall=$t1%.2fs top=${r1.take(3)}")

    // 2) same query with broadcast DISABLED: allowed side must shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val dfShuffle = Similarity.filteredTopK(emb, "vec_id", "embedding",
      meta, "doc_id", pred, query, k = 10)
    val (r2, t2) = time {
      dfShuffle.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val plan2 = dfShuffle.queryExecution.executedPlan.toString
    val shuffled = !plan2.contains("BroadcastHashJoin")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    println(f"PROBE filtered_ann_shuffle n=$n wall=$t2%.2fs broadcast_free=$shuffled match=${r1 == r2}")

    // 3) hybrid retrieval end-to-end at n docs
    val (r3, t3) = time {
      HybridSearch.searchDocuments(meta, "doc_id", "text", emb, "vec_id",
        "embedding", Seq("spark", "window", "merge"), query,
        nPerList = 50, k = 10).collect().map(_.getLong(0)).toSeq
    }
    println(f"PROBE hybrid_rrf n=$n wall=$t3%.2fs top=${r3.take(5)}")
    spark.stop()
  }
}
