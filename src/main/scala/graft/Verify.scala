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
        val p = frame.queryExecution.executedPlan.toString
        audited += 1
        if (p.contains("CartesianProduct")) cartNames += name
        val nB = "BroadcastNestedLoopJoin".r.findAllIn(p).size
        if (nB > 0) bnljNames += ((name, nB))
        frame.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
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
    // to outDir always; mirrored to the repo cwd only on FULL runs (a
    // name-filtered dev run must not overwrite the round's record).
    val auditJson =
      s"""{"queries":$audited,"cartesian":${cartNames.size},""" +
        s""""bnlj":${bnljNames.map(_._2).sum},"errors":${errNames.size},""" +
        s""""cartesian_names":${cartNames.sorted.map(q).mkString("[", ",", "]")},""" +
        s""""bnlj_names":${bnljNames.sortBy(_._1).map { case (n, c) => s"${q(n)}:$c" }.mkString("{", ",", "}")},""" +
        s""""error_names":${errNames.sorted.map(q).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(s"$outDir/plan_audit.json"), auditJson + "\n")
    if (only.isEmpty)
      try Files.writeString(Paths.get("plan_audit.json"), auditJson + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[verify] write plan_audit.json failed: ${e.getMessage}")
      }
    spark.stop()
  }
}
