package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs the externally-sourced eval set (eval/ExternalEval.scala) and
  * writes the committed artifact EXTERNAL_EVAL.json plus a console
  * summary. Numbers are reported as measured — the set exists to show
  * generalization beyond the self-authored ladder, so low is honest. */
object ProbeExternalEval {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val report = graft.eval.ExternalEval.run(spark)
    val json = graft.eval.ExternalEval.toJson(report)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("EXTERNAL_EVAL.json"), json)
    println(json)
    report.cases.foreach { o =>
      val f1 = if (o.f1.isNaN) "exec-only" else f"f1=${o.f1}%.2f"
      println(f"[${o.intent}%-22s] exec=${o.executed}%-5s $f1%-12s ${o.question}")
      if (o.generatedSql.nonEmpty) println(s"    -> ${o.generatedSql.take(160)}")
      if (o.error.nonEmpty) println(s"    !! ${o.error.take(160)}")
    }
    spark.stop()
  }
}
