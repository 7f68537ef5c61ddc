package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * High-cardinality-key force probe for the anomaly operators (r11
 * "What's wrong" #3): events keyed at USER grain, so the per-key stats
 * frame is millions of rows — far over the AQE broadcast threshold.
 * With the r11 forced broadcast() hints this shape OOMs at exactly the
 * scale the operators target; without hints it must degrade to a
 * shuffle join (asserted on the executed plan) and stay exact.
 *
 * Fixture: 20 events per user, values pmod(id,7) noise (sd>0 for every
 * key), plus one planted 1e6 outlier on every 1000th user's first
 * event. Per planted key z = 0.95·H / (H·√0.05) ≈ 4.25 > 3; noise keys
 * max |z| ≈ 1.5 — so the flag set is EXACTLY the planted events.
 * Same construction for MAD: median 3, MAD 2, planted adev ≈ 1e6 ≫
 * 3·1.4826·2, noise adev ≤ 3 below it.
 */
object ProbeAnomalyScale {
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
    def timed[A](label: String)(f: => A): A = {
      val w0 = shuffleWrite
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label => wall=${(System.nanoTime() - t0) / 1e9}%.1fs " +
        f"shuffle_write=${(shuffleWrite - w0) / 1e6}%.0fMB")
      r
    }

    def events(nUsers: Long, perUser: Long) = spark.range(0, nUsers * perUser)
      .select(col("id").as("event_id"),
        (col("id") / perUser).cast("long").as("user_id"),
        (pmod(col("id"), lit(7L)).cast("double") +
          when(pmod((col("id") / perUser).cast("long"), lit(1000L)) === 0 &&
            pmod(col("id"), lit(perUser)) === 0, lit(1000000.0)).otherwise(lit(0.0)))
          .as("value"))

    // ---- z-scores: 2.5M user keys × 20 events = 50M rows ----
    val zUsers = 2500000L
    val ze = events(zUsers, 20L).persist(); ze.count()
    timed("anomaly_zscore_50m_events_2p5m_keys") {
      val out = graft.operators.EventAnalytics
        .anomalyZscores(ze, "user_id", "value", Seq("event_id"))
      val flagged = out.persist()
      val n = flagged.count()
      val plan = flagged.queryExecution.executedPlan.toString
      val planted = flagged.where(col("value") > 999999).count()
      println(s"PROBE anomaly_zscore_check => flagged=$n (want ${zUsers / 1000}) " +
        s"planted=$planted broadcast=${plan.contains("BroadcastHashJoin")}")
      assert(!plan.contains("BroadcastHashJoin"),
        "2.5M-key stats frame must NOT broadcast:\n" + plan.take(2000))
      assert(n == zUsers / 1000 && planted == n, s"flag set wrong: n=$n planted=$planted")
      flagged.unpersist()
    }
    ze.unpersist()

    // ---- MAD: 1M user keys × 20 events = 20M rows ----
    val mUsers = 1000000L
    val me = events(mUsers, 20L).persist(); me.count()
    timed("anomaly_mad_20m_events_1m_keys") {
      val out = graft.operators.EventAnalytics
        .anomalyMad(me, "user_id", "value", Seq("event_id"))
      val flagged = out.persist()
      val n = flagged.count()
      val plan = flagged.queryExecution.executedPlan.toString
      val planted = flagged.where(col("value") > 999999).count()
      println(s"PROBE anomaly_mad_check => flagged=$n (want ${mUsers / 1000}) " +
        s"planted=$planted broadcast=${plan.contains("BroadcastHashJoin")}")
      assert(!plan.contains("BroadcastHashJoin"),
        "1M-key stats frames must NOT broadcast:\n" + plan.take(2000))
      assert(n == mUsers / 1000 && planted == n, s"flag set wrong: n=$n planted=$planted")
      flagged.unpersist()
    }
    me.unpersist()

    spark.stop()
  }
}
