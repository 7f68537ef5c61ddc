package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * A/B probe (r15 verdict #5): AQE's runtime skew-join splitting vs the
 * manual [[graft.operators.Skew]] operators, under a planted ~100:1 hot
 * key at force scale. Questions answered with measurements:
 *
 *  1. Does `OptimizeSkewedJoin` actually split the hot partition on the
 *     plain shuffle join (final plan carries the skew marker)?
 *  2. Given (1), when is `Skew.saltedJoin` still worth its build-side
 *     replication cost?
 *  3. Aggregation skew: AQE has NO skew handling for hash aggregates —
 *     measure `Skew.saltedAggregate` vs the plain groupBy on the same
 *     hot key.
 */
object ProbeSkewAB {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 150000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // plain join must be a real shuffle join for the A/B to mean
      // anything — the build side would broadcast at 1.6 MB otherwise
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // probe side: every 3rd row on the hot key 1. Skew detection reads
    // COMPRESSED MapOutputStatistics bytes, and a partition of identical
    // keys + cyclic payloads LZ4s to almost nothing (measured: a 17M-row
    // hot partition registered under the 256 MB default threshold and
    // AQE "saw" no skew) — so the payload is a hash-derived double the
    // codec cannot fold, as real fact-table payloads are. Default n=150M
    // puts the hot partition at ~50M rows / >1 GB raw: over threshold on
    // PRODUCTION defaults, no hand-tuned toy configs.
    val probe = spark.range(n).select(
      when(pmod(col("id"), lit(3)) === 0, lit(1L))
        .otherwise(pmod(hash(col("id")), lit(100000L)) + 2L).as("k"),
      (hash(col("id"), lit(7)).cast("double") / 1000.0).as("q"))
    val build = spark.range(100002).select(
      col("id").as("k"), (col("id") % 97).as("nk"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    def planJoin() = probe.join(build, "k").groupBy("nk")
      .agg(count(lit(1)).as("n"), sum("q").as("s"))

    // --- join A0: AQE skew split DISABLED — the unsplit baseline a
    //     single straggler task pays for the whole hot key ---
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val (rBase, tBase) = time(planJoin().collect())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // --- join A: plain shuffle join, AQE skew split at DEFAULTS ---
    val plain = planJoin()
    val (rPlain, tPlain) = time(plain.collect())
    val plan = plain.queryExecution.executedPlan.toString
    val skewMarked = plan.contains("isSkew=true") || plan.contains("skewed")
    println(f"PROBE skewjoin unsplit=$tBase%.1fs aqe=$tPlain%.1fs aqe_split=$skewMarked rows=${rPlain.length}")
    println("PROBE skewjoin plan_snippet=" +
      plan.linesIterator.filter(l => l.contains("AQEShuffleRead") || l.toLowerCase.contains("skew"))
        .take(4).mkString(" | ").take(300))

    // --- join B: manual salted join (8-way build replication) ---
    val salted = graft.operators.Skew.saltedJoin(probe, build, "k", saltFactor = 8)
      .groupBy("nk").agg(count(lit(1)).as("n"), sum("q").as("s"))
    val (rSalt, tSalt) = time(salted.collect())
    println(f"PROBE skewjoin salted wall=$tSalt%.1fs rows=${rSalt.length} " +
      s"equal=${rPlain.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
        rSalt.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq &&
        rBase.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
        rSalt.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq}")

    // --- agg A: plain groupBy on the hot key (AQE cannot split this) ---
    val (aPlain, tAggPlain) = time(
      probe.groupBy("k").agg(count(lit(1)).as("cnt"), sum("q").as("sum")).count())
    // --- agg B: salted two-phase aggregate ---
    val (aSalt, tAggSalt) = time(
      graft.operators.Skew.saltedAggregate(probe, "k", "q").count())
    println(f"PROBE skewagg plain=$tAggPlain%.1fs salted=$tAggSalt%.1fs " +
      s"groups_plain=$aPlain groups_salted=$aSalt")
    spark.stop()
  }
}
