package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: print retrieval cosine scores (not part of the API). */
object DebugRetrieval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    val meta = graft.catalog.Profiler.crawl(spark, Seq("customer", "orders", "nation"), eng.fks)
    val (model, enc) = graft.ml.Embeddings.train(spark, "x", meta)
    val qv = graft.ml.Embeddings.encode(spark, enc, Seq(args.headOption.getOrElse("customer account balance"))).head
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < math.min(a.length, b.length)) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    model.embeddings.toSeq.map { case (k, v) => k -> cos(qv, v) }
      .sortBy(-_._2).take(10)
      .foreach { case (k, s) => println(f"PROBE $k%-42s $s%.3f") }
    spark.stop()
  }
}
