package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: drive DocSource + ranking through the library surface. */
object ProbeDocs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.DocSource._

    val dir = java.nio.file.Files.createTempDirectory("probe-docs")
    java.nio.file.Files.write(dir.resolve("c.json"),
      ("""{"_id":"x1","user":{"name":"ana","age":31},"tags":["a","b"],"amount":10.5}""" + "\n" +
       """{"_id":"x2","user":{"name":"bob","age":25},"tags":[],"amount":4.0}""" + "\n" +
       """{"_id":"x3","user":{"age":44},"amount":"not-a-number"}""").getBytes)
    val docs = register(spark, dir.toString, "coll")
    println("PROBE schema => " + docs.schema.simpleString)
    val f = find(docs, FindSpec(filter = Seq(Gte("user.age", 30)), projection = Seq("user.name"), sort = Seq(("_id", true))))
    println("PROBE find => " + f.collect().mkString(" | "))
    val (cols, rows) = jsonEnvelope(docs.orderBy("_id"))
    println("PROBE envelope => cols=" + cols.mkString(",") + " row0=" + rows.head.mkString("; "))
    val agg = aggregate(docs, Seq(GroupStage(Some("user.age"), Seq(("n", "count", "*")))))
    println("PROBE agg_autolimit => " + agg.queryExecution.analyzed.toString.linesIterator.next())
    // conflicting-type field: amount is string in one doc
    println("PROBE type_union => amount type = " + docs.schema("amount").dataType.simpleString)
    // bad pipeline op
    try { aggregate(docs, Seq(GroupStage(None, Seq(("x", "median", "amount"))))).collect() }
    catch { case e: IllegalArgumentException => println("PROBE bad_op => " + e.getMessage) }
    // ranking boost: agg question through full ask
    val eng = graft.api.Engine.forFixtures(spark, "/root/testdata/sf0.001")
    val modelDir = java.nio.file.Files.createTempDirectory("probe-m").toString
    eng.train(modelDir)
    eng.askWithModel(modelDir, "average customer account balance per market segment") match {
      case Right(r) => println("PROBE ask_rank => " + r.sql.take(110))
      case Left(e) => println("PROBE ask_rank => ERR " + e.kind)
    }
    spark.stop()
  }
}
