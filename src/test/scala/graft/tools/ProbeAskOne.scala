package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.eval.SchoolFixture
object ProbeAskOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = SchoolFixture.register(spark)
    val fks = SchoolFixture.fks
    val engine = new Engine(spark, tables, fks)
    args.foreach { q =>
      val schema = tables.map(t => t -> spark.table(t).schema.fieldNames.toSeq).toMap
      val slice = graft.link.Fuzzy.selectRelevant(q, schema)
      println(s"PROBE slice=${slice.tables}")
      val analysis = graft.link.Intent.analyze(q, tables)
      val cands = graft.gen.Templates.candidates(slice, fks, analysis, q)
      cands.filter(_.method.contains("universal_period")).foreach(c => println(s"PROBE cand=$c"))
      graft.gen.Ranker.rank(cands, slice.tables.keySet).take(4).foreach { case (c, s) =>
        println(f"PROBE rank s=$s%.3f conf=${c.confidence}%.3f ${c.method} :: ${c.sql.take(90)}")
      }
      engine.ask(q) match {
        case Right(r) => println(s"PROBE SQL=${r.sql}\nPROBE ROWS=${r.rows.take(3)}")
        case Left(e) => println(s"PROBE ERR=${e.message}")
      }
    }
    spark.stop()
  }
}
