package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 deliverable: `.explain("formatted")` before/after dumps for
  * every query this optimization round touches, written to plans/r19/.
  * "Before" plans are reconstructed by composing the SAME declared
  * query shapes over the kept pre-round reference implementations
  * (e.g. [[graft.operators.Dedup.ngramJaccardPairsUngrouped]]), so the
  * dumped shapes are exactly the pre-change plans.
  * Usage: Test/runMain graft.tools.ProbeR19Plans <sfDir>
  */
object ProbeR19Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    Files.createDirectories(Paths.get("plans/r19"))

    def dump(name: String, df: DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r19/$name.txt"), s)
      println(s"PROBE wrote plans/r19/$name.txt (${s.length} chars)")
      spark.catalog.clearCache()
    }
    def after(q: String): Unit =
      dump(s"${q}_after", graft.SparkEntry.queries(q)(spark, dir))

    import graft.operators.{Dedup, Sampling}
    val docs = spark.table("documents")

    // ---- ngram-pairs kernel family: before = ungrouped kernel composed
    // exactly like each declared query ----
    def oldPairs = Dedup.ngramJaccardPairsUngrouped(
      docs, "doc_id", "text", n = 3, threshold = 0.8)

    dump("x_dedup_ngram_before",
      oldPairs.select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b").limit(100))
    after("x_dedup_ngram")

    dump("x_dedup_groups_before",
      Dedup.duplicateGroups(oldPairs.select(col("id_a"), col("id_b")))
        .orderBy("id").limit(1000))
    after("x_dedup_groups")

    dump("x_dedup_canonical_before", {
      val pairs = oldPairs.select(col("id_a"), col("id_b"))
      val groups = Dedup.duplicateGroups(pairs)
      val scored = docs
        .join(groups.select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.qualityScore(col("text")).as("q"))
      Dedup.canonicalPerGroup(groups, "id", "group_id", scored, "doc_id", "q")
        .orderBy("group_id")
    })
    after("x_dedup_canonical")

    dump("x_split_audit_before", {
      val assigned = Sampling.split(docs, "doc_id", Seq("train" -> 0.8, "test" -> 0.2))
      Sampling.splitLeakageAudit(assigned, "doc_id", "split", oldPairs)
        .orderBy("id_a", "id_b").limit(500)
    })
    after("x_split_audit")

    dump("x_leakage_split_before", {
      val groups = Dedup.duplicateGroups(oldPairs.select(col("id_a"), col("id_b")))
      Sampling.leakageSafeSplit(docs, "doc_id", groups,
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
    })
    after("x_leakage_split")

    spark.stop()
  }
}
