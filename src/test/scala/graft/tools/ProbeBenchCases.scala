package graft.tools

import org.apache.spark.sql.SparkSession

/** Debugger for the round-16 benchmark-derived eval cases: for each
  * failing case id, print the slice, the top-ranked candidates, and the
  * engine's chosen SQL — so trigger/ranking gaps are visible per shape. */
object ProbeBenchCases {
  def main(args: Array[String]): Unit = {
    val only: Set[String] = if (args.nonEmpty) args.toSet else Set.empty
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engines = scala.collection.mutable.Map.empty[String, (graft.api.Engine, Map[String, Seq[String]])]
    def engineFor(f: String) = engines.getOrElseUpdate(f, {
      val s = spark.newSession()
      val (tables, fks) = f match {
        case "school" => (graft.eval.ReferenceSchemas.registerSchool(s), graft.eval.ReferenceSchemas.schoolFks)
        case "store" => (graft.eval.ReferenceSchemas.registerStore(s), graft.eval.ReferenceSchemas.storeFks)
        case _ => (graft.eval.ReferenceSchemas.registerTravel(s), graft.eval.ReferenceSchemas.travelFks)
      }
      val schema = tables.map(t => t -> s.table(t).schema.fieldNames.toSeq).toMap
      (new graft.api.Engine(s, tables, fks), schema)
    })
    graft.eval.ExternalEval.cases.filter(c => c.clazz == "benchmark-derived" &&
        (only.isEmpty || only.contains(c.id))).foreach { c =>
      val (engine, schema) = engineFor(c.fixture)
      val slice = graft.link.Fuzzy.selectRelevant(c.question, schema)
      val analysis = graft.link.Intent.analyze(c.question, schema.keys.toSeq)
      val fks = c.fixture match {
        case "school" => graft.eval.ReferenceSchemas.schoolFks
        case "store" => graft.eval.ReferenceSchemas.storeFks
        case _ => graft.eval.ReferenceSchemas.travelFks
      }
      val cands = graft.gen.Templates.candidates(slice, fks, analysis, c.question)
      println(s"PROBE ${c.id} q=${c.question}")
      println(s"PROBE ${c.id} slice=${slice.tables.keys.toSeq.sorted}")
      graft.gen.Ranker.rank(cands, slice.tables.keySet).take(3).foreach { case (cd, s) =>
        println(f"PROBE ${c.id} rank s=$s%.3f conf=${cd.confidence}%.3f ${cd.method} :: ${cd.sql.take(110)}")
      }
      engine.ask(c.question) match {
        case Right(r) => println(s"PROBE ${c.id} CHOSE ${r.sql.take(140)}")
        case Left(e) => println(s"PROBE ${c.id} ERR ${e.message.take(120)}")
      }
    }
    spark.stop()
  }
}
