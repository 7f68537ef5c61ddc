package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local dev
    // iteration; the driver always passes exactly two args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Global plan audit, folded into the per-round artifact flow (r14
    // verdict item: the standalone probe silently lagged the inventory).
    // Every query's physical plan is inspected on the frame Verify
    // builds anyway: CartesianProduct is always flagged;
    // BroadcastNestedLoopJoin is counted (acceptable only as the 1-row
    // totals crossJoin pattern — reviewed, not gated, since the count
    // is in the committed artifact every round).
    val cartNames = scala.collection.mutable.ListBuffer.empty[String]
    val bnljNames = scala.collection.mutable.ListBuffer.empty[(String, Int)]
    val errNames = scala.collection.mutable.ListBuffer.empty[String]
    var audited = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      System.err.println(s"[verify] running $name")
      try {
        val frame = fn(spark, sfDir)
        // Execute through the frame's OWN QueryExecution (collect — the
        // write path builds a separate QE for the insert command), then
        // audit the plan AFTER the action: under AQE the initial
        // executedPlan differs from the final runtime plan (broadcast /
        // skew-join switches happen at execution), so the r15 artifact's
        // pre-action stringification could record a BNLJ/cartesian count
        // the run never executed — and a query that failed during the
        // write was counted in both `audited` and `errors` (r15 advice).
        // Verify results are driver-small by design (the DuckDB compare
        // hashes them whole; max observed 2.1k rows), so collecting and
        // writing the local rows also drops the old double-planning.
        val rows = frame.collect()
        val p = frame.queryExecution.executedPlan.toString
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), frame.schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        // audited increments only once the row is fully green (collect
        // AND artifact write succeeded) — a failing query lands in
        // `errors` alone, never both counters
        audited += 1
        if (p.contains("CartesianProduct")) cartNames += name
        val nB = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        if (nB > 0) bnljNames += ((name, nB))
      } catch { case e: Throwable =>
        errNames += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // plan_audit.json: the committed per-round gate artifact. Written
    // to outDir ONLY (r15 verdict #8: the cwd mirror made every driver
    // run dirty the tree mid-round); the repo copy is committed as an
    // explicit separate step after a full local run.
    val auditJson =
      s"""{"queries":$audited,"cartesian":${cartNames.size},""" +
        s""""bnlj":${bnljNames.map(_._2).sum},"errors":${errNames.size},""" +
        s""""cartesian_names":${cartNames.sorted.map(q).mkString("[", ",", "]")},""" +
        s""""bnlj_names":${bnljNames.sortBy(_._1).map { case (n, c) => s"${q(n)}:$c" }.mkString("{", ",", "}")},""" +
        s""""error_names":${errNames.sorted.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/plan_audit.json"), auditJson + "\n")
    spark.stop()
  }
}
