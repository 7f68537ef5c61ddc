package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for the classifier/metrics wave:
 *
 *  - Logistic regression over 20M rows with a planted separating
 *    hyperplane (y = 1 iff 2·x1 − x2 + 0.5 > 0, points pushed off the
 *    boundary): 20 full-batch epochs, each ONE distributed aggregate;
 *    the trained model must score ≥ 99.9% training accuracy, and the
 *    per-epoch shuffle must stay bytes-sized (d+1 doubles per split).
 *  - Retrieval metrics over 1M queries × 10 predictions (10M pred
 *    rows) against planted gold (every query's gold = its twin id,
 *    planted at a known rank): closed-form macro recall and MRR.
 */
object ProbeClassifierScale {
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
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label => wall=$secs%.1fs shuffle_write=${(shuffleWrite - w0) / 1e6}%.1fMB")
      r
    }

    // ---- logistic regression at 20M rows ----
    val n = 20000000L
    val x1 = (pmod(xxhash64(col("id"), lit(1)), lit(2000L)).cast("double") - 1000.0) / 1000.0
    val x2 = (pmod(xxhash64(col("id"), lit(2)), lit(2000L)).cast("double") - 1000.0) / 1000.0
    val margin = lit(2.0) * col("x1") - col("x2") + 0.5
    val d = spark.range(0, n).select(col("id"), x1.as("x1"), x2.as("x2"))
      // push every point 0.2 off the boundary so the problem separates
      .withColumn("x1", col("x1") + when(margin >= 0, 0.1).otherwise(-0.1))
      .withColumn("y", (lit(2.0) * col("x1") - col("x2") + 0.5 > 0).cast("double"))
      .persist()
    d.count()
    val w = timed("lr_train_20m_x20epochs") {
      graft.ml.LogReg.train(d, Seq("x1", "x2"), "y", epochs = 20, learningRate = 2.0)
    }
    timed("lr_score_20m") {
      val acc = graft.ml.LogReg.score(d, Seq("x1", "x2"), w)
        .select(avg(((col("prob") > 0.5).cast("double") === col("y")).cast("double")).as("acc"))
        .collect()(0).getDouble(0)
      println(f"PROBE lr_check => weights=${w.toSeq.map(v => f"$v%.3f")} acc=$acc%.5f (want >= 0.999)")
      assert(acc >= 0.999)
    }
    d.unpersist()

    // ---- retrieval metrics at 1M queries x 10 preds ----
    timed("retrieval_metrics_1m_queries") {
      val queries = spark.range(0, 1000000L).select(col("id").as("query_id"))
      // 10 predictions per query; the gold twin (id = query_id + 10^7)
      // is planted at rank (query_id % 10) + 1; other slots are misses
      val pred = queries
        .select(col("query_id"), explode(sequence(lit(1L), lit(10L))).as("rank"))
        .select(col("query_id"), col("rank"),
          when(col("rank") === pmod(col("query_id"), lit(10L)) + 1,
            col("query_id") + 10000000L)
            .otherwise(col("query_id") * 100L + col("rank") + 20000000L).as("id"))
      val gold = queries.select(col("query_id"),
        (col("query_id") + 10000000L).as("id"))
      val s = graft.operators.RetrievalMetrics.summary(
        graft.operators.RetrievalMetrics.perQuery(
          pred, "query_id", "id", "rank", gold, "query_id", "id", k = 10))
        .collect()(0)
      // every gold twin is found -> recall 1; MRR = mean over ranks
      // 1..10 of 1/r = H(10)/10
      val h10 = (1 to 10).map(1.0 / _).sum / 10
      println(f"PROBE metrics_check => n=${s.getLong(0)} recall=${s.getDouble(1)}%.6f " +
        f"mrr=${s.getDouble(2)}%.6f (want 1000000 / 1.0 / $h10%.6f)")
      assert(s.getLong(0) == 1000000L && s.getDouble(1) == 1.0 &&
        math.abs(s.getDouble(2) - h10) < 1e-4)
    }

    spark.stop()
  }
}
