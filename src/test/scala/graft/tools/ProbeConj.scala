package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeConj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = graft.eval.ReferenceSchemas.registerSchool(spark)
    val fks = graft.eval.ReferenceSchemas.schoolFks
    val engine = new graft.api.Engine(spark, tables, fks)
    val qs = Seq(
      "List students who received a C but have a numeric score above 75.",
      "List students who took course X in Fall 2015 with a grade of C but a score < 75.")
    import graft.link.{Fuzzy, Intent}
    qs.foreach { q =>
      val slice = Fuzzy.selectRelevant(q, tables.map(t => t -> spark.table(t).schema.fieldNames.toSeq).toMap)
      println(s"PROBE slice => ${slice.tables.keySet}")
      val vals: String => Map[String, Seq[String]] = t =>
        try graft.catalog.Profiler.stringDomains(spark, t) catch { case _: Throwable => Map.empty }
      val cands = graft.gen.Templates.conjunctiveConstraintsCandidates(slice, fks, q, vals)
      println(s"PROBE conj [$q] => ${cands.map(c => c.sql + " @" + c.confidence)}")
      val all = graft.gen.Templates.candidates(slice, fks, Intent.analyze(q, tables), q, vals)
      println(s"PROBE top3 => ${all.take(3).map(c => c.method + "@" + c.confidence).mkString("; ")}")
    }
    spark.stop()
  }
}
