package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Force-scale fixture generator (round-16 verdict #3): replicate the
 * sf0.1 tables 10× into an sf1.0-equivalent directory so the FULL
 * declared suite can run once at force scale — per-query sub-second
 * times at sf0.1 can hide a driver-side constant that only dominates
 * at scale, and the dedicated force probes cover ~8 operators, not 230.
 *
 * Construction: each copy i shifts every ENTITY KEY by i·(max+1) with
 * the SAME offset applied to its foreign-key references, so join
 * cardinalities scale exactly linearly (10× customers each still own
 * their own orders — no cross-copy fan-out). `nation`/`region` are
 * fixed dimension vocabularies and stay single-copy (FK targets remain
 * valid for every shifted copy, mirroring how a real corpus grows:
 * facts multiply, vocabularies do not). Text/vector payloads repeat
 * verbatim — a deliberate worst case for the dedup/ANN family (10-way
 * exact duplicate groups, 10× denser LSH buckets and IVF cells).
 *
 * Usage: Test/runMain graft.tools.ProbeForceGen [copies] [outDir]
 * then SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_RUNS=1 runMain
 * graft.Bench → BENCH_force.json.
 */
object ProbeForceGen {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.drop(1).headOption.getOrElse("/root/repo/forcedata/sf1")
    val srcDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def src(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // one offset constant per ENTITY (not per column): the shift must
    // agree between a key and every FK referencing it
    def span(t: String, c: String): Long =
      src(t).agg(max(col(c))).collect()(0).getLong(0) + 1L

    val spans = Map(
      "cust" -> span("customer", "c_custkey"),
      "ord" -> span("orders", "o_orderkey"),
      "part" -> span("part", "p_partkey"),
      "supp" -> span("supplier", "s_suppkey"),
      "event" -> span("events", "event_id"),
      "user" -> span("events", "user_id"),
      "doc" -> span("documents", "doc_id"),
      "vec" -> span("embeddings", "vec_id"))

    // (table, shifted columns → entity span); nation/region single-copy
    val shifted: Seq[(String, Map[String, String])] = Seq(
      "customer" -> Map("c_custkey" -> "cust"),
      "orders" -> Map("o_orderkey" -> "ord", "o_custkey" -> "cust"),
      "lineitem" -> Map("l_orderkey" -> "ord", "l_partkey" -> "part", "l_suppkey" -> "supp"),
      "part" -> Map("p_partkey" -> "part"),
      "supplier" -> Map("s_suppkey" -> "supp"),
      "events" -> Map("event_id" -> "event", "user_id" -> "user"),
      "documents" -> Map("doc_id" -> "doc"),
      "embeddings" -> Map("vec_id" -> "vec"))

    shifted.foreach { case (t, shifts) =>
      val base = src(t)
      val union = (0 until copies).map { i =>
        shifts.foldLeft(base) { case (df, (c, entity)) =>
          df.withColumn(c, col(c) + lit(i.toLong * spans(entity)))
        }
      }.reduce(_ unionByName _)
      union.repartition(16).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[forcegen] $t x$copies written")
    }
    Seq("nation", "region").foreach { t =>
      src(t).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[forcegen] $t (single copy) written")
    }
    println(s"[forcegen] done → $outDir")
    spark.stop()
  }
}
