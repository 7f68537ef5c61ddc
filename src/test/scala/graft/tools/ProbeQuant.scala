package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does the staged int8 scale column survive optimization as
  * a per-row computation, or does CollapseProject inline it back into
  * the transform lambda (per-element array_max)? Prints timing + plan. */
object ProbeQuant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.sources.Sources.register(spark, dir)
    val e = spark.table("embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.where(col("vec_id") === 0).select("emb").collect()(0).getSeq[Double](0).toArray
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label => ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val topk = graft.operators.Quantization.quantizedTopK(e, "vec_id", "emb", q, 10)
    time("quantized_topk_cold")(topk.count())
    time("quantized_topk_warm")(topk.count())
    val report = graft.operators.Quantization.quantizeInt8(e, "vec_id", "emb")
    time("quantize_report_warm") { report.count(); report.count() }
    val plan = topk.queryExecution.optimizedPlan.toString
    println("PROBE inlined_array_max_in_lambda => " +
      plan.linesIterator.exists(l => l.contains("lambdafunction") && l.contains("array_max")))
  }
}
