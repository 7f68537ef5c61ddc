package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the dedupCorpus pipeline at bench scale.
  * NOTE: the stages below hand-inline Pipelines.dedupCorpus (so each can
  * be timed separately) — keep them structurally in sync with it; the
  * threshold/config come from the pipeline's own defaults. */
object ProbeCorpusTime {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    val docs = spark.table("documents")
    time("docs.count")(docs.count())

    import graft.operators.{Dedup, Pipelines}
    import org.apache.spark.storage.StorageLevel
    val exact = Dedup.dedupExact(docs, "doc_id", Seq("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("exact.count")(exact.count())
    val pairs = Dedup.minhashNearDuplicates(exact, "doc_id", "text", Pipelines.DefaultNearThreshold)
    time("pairs.count")(pairs.count())
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("deduped.count")(deduped.count())
    exact.unpersist(blocking = false)
    time("sorted-limit-count")(deduped.select(col("doc_id")).orderBy("doc_id").limit(1000).count())
    deduped.unpersist(blocking = false)

    // now the whole thing as the bench runs it
    time("FULL x_dedup_corpus") {
      val (d, _) = Pipelines.dedupCorpus(spark.table("documents"), "doc_id", "text")
      d.select(col("doc_id")).orderBy("doc_id").limit(1000).count()
    }
    spark.stop()
  }
}
