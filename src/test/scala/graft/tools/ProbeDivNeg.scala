package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: why does division_with_negation not win the ranking? */
object ProbeDivNeg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new graft.api.Engine(spark,
      graft.eval.SchoolFixture.register(spark), graft.eval.SchoolFixture.fks)
    val q = "students who took a course in every department but never got an A"
    val schema = Map(
      "students" -> Seq("student_id", "student_name", "grade_level", "age"),
      "courses" -> Seq("course_id", "course_name", "dept"),
      "scores" -> Seq("score_id", "student_id", "course_id", "score", "grade", "year"))
    val slice = graft.link.Fuzzy.selectRelevant(q, schema)
    val analysis = graft.link.Intent.analyze(q, schema.keys.toSeq)
    val vals = (t: String) =>
      try graft.catalog.Profiler.stringDomains(spark, t)
      catch { case _: Throwable => Map.empty[String, Seq[String]] }
    val cands = graft.gen.Templates.candidates(slice, graft.eval.SchoolFixture.fks,
      analysis, q, vals)
    cands.take(5).foreach(c =>
      println(s"PROBE cand conf=${c.confidence} tag=${c.method} sql=${c.sql.take(90)}"))
    val r = engine.ask(q)
    println("PROBE asked => " + r.toOption.map(_.sql.take(120)).getOrElse(r.toString))
    spark.stop()
  }
}
