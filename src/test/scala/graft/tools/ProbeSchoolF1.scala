package graft.tools
import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.eval.{Evaluation, SchoolFixture}

/** Per-case F1 over the school corpus — shows exactly which cases hold
  * the macro-F1 below 1.0 so template work targets them. */
object ProbeSchoolF1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new Engine(spark, SchoolFixture.register(spark), SchoolFixture.fks)
    val rep = Evaluation.run(engine, Evaluation.schoolCorpus)
    rep.cases.foreach { o =>
      val shown = if (o.executed) o.generatedSql else s"ERR ${o.error.take(80)}"
      println(f"PROBE f1=${o.f1}%4.2f exec=${o.executed} [${o.intent}%-16s] ${o.question}%-50s -> ${shown.take(120)}")
    }
    println(f"PROBE TOTAL school macroF1=${rep.macroF1}%.4f exec=${rep.execSuccessRate}%.2f")
    spark.stop()
  }
}
