package graft.tools

import org.apache.spark.sql.SparkSession

object ProbePipelines {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, "/root/testdata/sf0.01")
    val docs = spark.table("documents")
    val (deduped, report) = graft.operators.Pipelines.dedupCorpus(docs, "doc_id", "text", 0.7)
    println(s"PROBE dedup_corpus => $report survivors=${deduped.count()}")
    val filtered = graft.operators.Pipelines.qualityFilter(docs, "doc_id", "text",
      allowedLangs = Seq("en", "es", "de", "fr", "it", "pt", "und"), minQuality = 0.2)
    println(s"PROBE quality_filter => kept=${filtered.count()} of ${docs.count()}")
    spark.stop()
  }
}
