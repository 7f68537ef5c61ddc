package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 A/B for typeCooccurrence: basket self-join (join on the
  * (user, day) key + t < t2 filter) vs per-basket COMBINATIONS
  * (group types per basket, posexplode + suffix slice) — one exchange
  * instead of a join, and k(k−1)/2 generated rows instead of k².
  * Asserts identical output before timing.
  * Usage: Test/runMain graft.tools.ProbeR19Cooc <sfDir>
  */
object ProbeR19Cooc {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/forcedata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir).foreach(t => spark.table(t).count())
    val events = spark.table("events")

    def current = graft.operators.EventAnalytics.typeCooccurrence(
      events, "user_id", "ts", "event_type")

    def combos = {
      val baskets = events
        .select(col("user_id").as("__u"), to_date(col("ts")).as("__d"),
          col("event_type").as("__t"))
        .distinct()
        .localCheckpoint()
      val nBaskets = baskets.select("__u", "__d").distinct().count().toDouble
      val perType = baskets.groupBy(col("__t")).agg(count(lit(1)).as("__n1"))
      val pairs = baskets.groupBy(col("__u"), col("__d"))
        .agg(sort_array(collect_list(col("__t"))).as("__ts"))
        .select(posexplode(col("__ts")).as(Seq("__i", "__t")), col("__ts"))
        .select(col("__t"),
          explode(slice(col("__ts"), col("__i") + 2, size(col("__ts")) - col("__i") - 1)).as("__t2"))
        .groupBy(col("__t"), col("__t2")).agg(count(lit(1)).as("n_both"))
      pairs
        .join(perType.select(col("__t"), col("__n1").as("__na")), "__t")
        .join(perType.select(col("__t").as("__t2"), col("__n1").as("__nb")), "__t2")
        .select(col("__t").as("type_a"), col("__t2").as("type_b"), col("n_both"),
          round(col("n_both") / nBaskets, 6).as("support"),
          round(col("n_both").cast("double") / col("__na"), 6).as("confidence"),
          round((col("n_both").cast("double") / col("__na")) /
            (col("__nb") / nBaskets), 6).as("lift"))
    }

    val c = current
    val n = combos
    val d1 = c.exceptAll(n).count(); val d2 = n.exceptAll(c).count()
    println(s"PROBE equivalence: cur-minus=$d1 combo-minus=$d2 " +
      (if (d1 == 0 && d2 == 0) "IDENTICAL" else "*** MISMATCH ***"))

    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val n1 = current.count()
      val s1 = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val n2 = combos.count()
      val s2 = (System.nanoTime() - t0) / 1e9
      println(f"PROBE ab round$r: join=$s1%5.2fs ($n1) combos=$s2%5.2fs ($n2)")
    }
    spark.stop()
  }
}
