package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Global plan audit (SUPERSEDED as a gate since round 15: graft.Verify
 * now emits plan_audit.json with the same checks on every full run —
 * this probe remains as the standalone/ad-hoc form): build EVERY
 * declared query at sf0.01 and flag
 * plans containing an all-pairs join. `CartesianProduct` is always a
 * red flag; `BroadcastNestedLoopJoin` is reported but acceptable when
 * one side is a 1-row totals/constants frame (the crossJoin(broadcast)
 * pattern several integer-exact oracles use deliberately). Queries
 * whose builders EXECUTE eagerly (streaming rows, iterative fits) are
 * audited on whatever plan their returned frame carries. Prints one
 * PROBE line per offender plus a summary; findings recorded in
 * COVERAGE.md.
 */
object ProbePlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, dir)
    var cart = 0; var bnlj = 0; var err = 0
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val p = graft.SparkEntry.queries(n)(spark, dir)
          .queryExecution.executedPlan.toString
        val hasCart = p.contains("CartesianProduct")
        val nB = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        if (hasCart) { cart += 1; println(s"PROBE CARTESIAN $n") }
        if (nB > 0) { bnlj += 1; println(s"PROBE BNLJ $n n=$nB") }
        spark.catalog.clearCache()
      } catch {
        case e: Throwable => err += 1; println(s"PROBE ERROR $n ${e.getClass.getSimpleName}")
      }
    }
    println(s"PROBE summary queries=${names.size} cartesian=$cart bnlj=$bnlj errors=$err")
    spark.stop()
  }
}
