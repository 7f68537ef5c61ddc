package graft.tools

import org.apache.spark.sql.SparkSession

/** Re-times the force-bench's flagged (≥10×-growth) queries with a
  * warm second run at BOTH scales, so the superlinear-or-noise call in
  * COVERAGE rests on steady-state numbers, not a single cold pass. */
object ProbeForceHot {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "d28_ilike", "x_cosine_neardup", "x_dedup_canonical", "x_leakage_split",
      "x_dedup_ngram", "x_split_audit", "x_dedup_groups", "x_dedup_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.1", "/root/repo/forcedata/sf1").foreach { dir =>
      graft.sources.Sources.register(spark, dir).foreach(t => spark.table(t).count())
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, dir).collect()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $dir $n min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
