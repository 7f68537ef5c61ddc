package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measured scale argument for `RankLimit.groupedTopK` (round-18 oracle
 * row `x_grouped_topk`): A/B the WindowGroupLimit rank pushdown on a
 * 50M-row frame with heavy group skew, against the same plan with the
 * pushdown disabled (`spark.sql.optimizer.windowGroupLimitThreshold`
 * = -1). The pushdown prunes every partition to its top k BEFORE the
 * shuffle and again after, so the sort-and-number pass sees
 * |groups|·k·partitions rows instead of all 50M — the property that
 * makes per-group state bounded under skew at 100 TB.
 *
 * Truth check: both variants must return identical rows (the pushdown
 * is an optimization, not a semantics change), verified by sorted
 * collect comparison on the k·|groups| result.
 */
object ProbeGroupedTopkScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 1000 groups, zipfian-ish skew: group 0 holds ~10% of all rows
    val df = spark.range(rows).select(
      when(col("id") % 10 === 0, 0L).otherwise(pmod(hash(col("id")), lit(1000)).cast("long")).as("g"),
      (hash(col("id") * 31).cast("double") / 2147483647.0).as("score"),
      col("id"))
    df.cache(); df.count()

    def run(label: String, threshold: String): Seq[String] = {
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", threshold)
      val q = graft.plans.RankLimit.groupedTopK(df,
        Seq(col("g")), Seq(col("score").desc, col("id")), k = 5)
        .select("g", "id")
      val plan = q.queryExecution.executedPlan.toString
      val hasWgl = plan.contains("WindowGroupLimit")
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        q.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-12s rows=$rows wgl=$hasWgl times=${times.map(t => f"$t%.2f").mkString(",")}s")
      q.orderBy("g", "id").collect().map(_.toString).toSeq
    }

    val on = run("pushdown-on", "1000000")
    val off = run("pushdown-off", "-1")
    println(s"PROBE identical-results ${on == off} (${on.size} rows)")
    spark.stop()
  }
}
