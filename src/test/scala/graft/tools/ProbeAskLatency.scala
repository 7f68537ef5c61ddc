package graft.tools

import org.apache.spark.sql.SparkSession
import graft.api.Engine
import graft.eval.ReferenceSchemas

/** End-to-end NL→answer latency over the full shape battery (~300
  * candidate generators + validation + execution), after the round-18
  * lazy-val fix removed the per-ask catalog re-read. Reports warm
  * ms/ask over a mixed question set on the school fixture. */
object ProbeAskLatency {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = ReferenceSchemas.registerSchool(spark)
    val eng = new Engine(spark, tables, ReferenceSchemas.schoolFks)
    val qs = Seq(
      "How many records are in students?",
      "Count of students per grade letter",
      "Which students achieved the highest numeric score?",
      "What is the average of each course's maximum score?",
      "Which students have never enrolled in Biology?",
      "For each term, what are the top 2 courses by number of enrollments?",
      "What is the average score in Biology?",
      "Top 5 courses by average score last year")
    qs.foreach(q => eng.ask(q)) // warm: JIT, domain mining, first plans
    val t0 = System.nanoTime()
    val rounds = 5
    (1 to rounds).foreach(_ => qs.foreach(q => eng.ask(q)))
    val ms = (System.nanoTime() - t0) / 1e6 / (rounds * qs.size)
    println(f"PROBE ask-latency warm ${ms}%.0f ms/ask over ${qs.size} question shapes x $rounds rounds")
    spark.stop()
  }
}
