package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for entity resolution: 2M-record master linked from
 * a 2M-record perturbed snapshot (suffix noise keeps the blocking key
 * stable, so every record has exactly one true twin plus same-block
 * decoys). Asserts the linkage is EXACT (every left record ranks its
 * twin first — distributed check, no collect), the candidate join is a
 * shuffle join over blocks (never broadcast of a corpus-scale side,
 * never cartesian), and prints wall + shuffle volume for COVERAGE.
 */
object ProbeErScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    // 500k distinct leading tokens; prefixLen 5 = "w" + 4 hex digits
    // (~31k live prefixes, ~64-row blocks). prefixLen 4 makes ~1954
    // blocks of ~1024 rows — just OVER the 1000 cap, and the cap
    // correctly drops them all (verified: 128 survivors from the
    // boundary blocks) — the dial the operator docs describe.
    def names(n: Long) = spark.range(0, n).select(col("id"),
      concat(format_string("w%05x", pmod(col("id"), lit(500000L))),
        lit(" item "), col("id")).as("name"))
    val left = names(2000000L).persist(); left.count()
    val right = names(2000000L)
      .select((col("id") + 10000000L).as("id"),
        concat(col("name"), lit(" cpy")).as("name")).persist()
    right.count()

    val w0 = shuffleWrite
    val t0 = System.nanoTime()
    val resolved = graft.operators.EntityResolution.resolve(
      left, "id", "name", right, "id", "name",
      threshold = 0.9, topPerLeft = 1, prefixLen = 5, maxBlockSize = 1000)
      .persist()
    val n = resolved.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val mb = (shuffleWrite - w0) / 1e6
    // every left record must link exactly its shifted twin
    val wrong = resolved.where(col("r_id") =!= col("l_id") + 10000000L).count()
    val plan = resolved.queryExecution.executedPlan.toString
    val cartesian = plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")
    println(f"PROBE er_resolve_2m_x_2m => wall=$secs%.1fs shuffle_write=$mb%.0fMB")
    println(s"PROBE er_check => matched=$n wrong_twin=$wrong cartesian=$cartesian")
    assert(n == 2000000L, s"matched $n of 2000000")
    assert(wrong == 0, s"$wrong records linked a non-twin")
    assert(!cartesian, plan.take(2000))
    spark.stop()
  }
}
