package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev probe main for end-to-end driving of the newest modules. */
object ProbeRound {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")

    // train -> persist -> reload -> ask
    val dir = java.nio.file.Files.createTempDirectory("probe-models").toString
    val id = eng.train(dir)
    println(s"PROBE train => id=$id exists=${graft.ml.ModelStore.exists(dir, id)} files=${new java.io.File(dir + "/" + id).list().sorted.mkString(",")}")
    val id2 = eng.train(dir) // idempotent skip
    println(s"PROBE train_again => same=${id == id2}")
    eng.askWithModel(dir, "average customer account balance per market segment") match {
      case Right(r) => println(s"PROBE askWithModel => sql=[${r.sql.take(80)}] rows=${r.rowcount}")
      case Left(e) => println(s"PROBE askWithModel => ERR ${e.kind} ${e.message.take(80)}")
    }
    eng.askWithModel("/nonexistent/dir", "how many orders") match {
      case Right(r) => println(s"PROBE askWithModel_nodir => fallback ok rows=${r.rowcount}")
      case Left(e) => println(s"PROBE askWithModel_nodir => ERR ${e.kind}")
    }

    // streaming over the real events fixture via file source
    val tmp = java.nio.file.Files.createTempDirectory("probe-stream").toFile
    val in = new java.io.File(tmp, "in"); in.mkdirs()
    graft.sources.Sources.table(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(in.getPath)
    val q = graft.streaming.Streams.tumblingCounts(
      graft.streaming.Streams.readEventStream(spark, in.getPath), "1 hour", "1 minute")
      .writeStream.format("memory").queryName("probe_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val st = spark.table("probe_stream")
    println(s"PROBE streaming => windows=${st.count()} sample=${st.orderBy("window_start", "event_type").collect().take(2).mkString(" | ")}")

    // multimodal
    val media = graft.operators.Multimodal.synthetic(spark, 20)
    val feats = graft.operators.Multimodal.extractFeatures(media, dim = 16).collect()
    println(s"PROBE multimodal => n=${feats.length} dims=${feats.map(_.features.length).toSet} kinds=${feats.map(_.kind).toSet}")

    // profiler on embeddings table (array column regression)
    val meta = graft.catalog.Profiler.crawl(spark, Seq("embeddings"), Nil)
    val emb = meta.tables("embeddings").columns.find(_.name == "embedding").get
    println(s"PROBE profiler_array => type=${emb.dataType} min=${emb.min} distinct=${emb.distinctCount.isDefined}")
    spark.stop()
  }
}
