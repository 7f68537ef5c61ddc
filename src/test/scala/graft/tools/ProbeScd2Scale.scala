package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for [[graft.operators.Cdc.scd2History]] /
 * [[graft.operators.Cdc.scd2Apply]] — the claim: maintaining a stored
 * SCD2 history costs the CHANGE plus one scan of the stored table,
 * never the full-log window rebuild. Honest accounting like
 * ProbeMvJoinScale: the history lives as parquet, each strategy pays
 * its own write — rebuild re-windows the whole grown changelog and
 * rewrites the history; apply closes open intervals via one key-sized
 * broadcast join (scan + rewrite of the stored table, batch-sized
 * window only). Equality: applied rows ≡ rebuilt rows (count + open
 * interval count). PROBE lines recorded in COVERAGE.md.
 */
object ProbeScd2Scale {
  def main(args: Array[String]): Unit = {
    val nLog = if (args.nonEmpty) args(0).toLong else 50000000L
    val dLog = 200000L
    val nKeys = 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // changelog: version = id (globally monotone), ~nLog/nKeys versions
    // per key, every 13th record a delete
    def logGen(from: Long, n: Long) = spark.range(from, from + n).select(
      pmod(hash(col("id"), lit(7)), lit(nKeys)).as("k"),
      col("id").as("ver"),
      when(col("id") % 13 === 0, "D").otherwise("U").as("op"),
      (col("id") % 1000L).cast("double").as("val"))

    val base = java.nio.file.Files.createTempDirectory("probe_scd2").toString
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    logGen(0, nLog).write.parquet(s"$base/log")
    val log = spark.read.parquet(s"$base/log")

    val (nHist, tBuild) = time {
      graft.operators.Cdc.scd2History(log, Seq("k"), "ver", "op")
        .write.mode("overwrite").parquet(s"$base/hist")
      spark.read.parquet(s"$base/hist").count()
    }
    println(f"PROBE scd2 build log=$nLog keys=$nKeys histRows=$nHist wall=$tBuild%.2fs")

    // incremental: fold a 200k batch into the STORED history
    val batch = logGen(nLog, dLog)
    val (nApplied, tApply) = time {
      graft.operators.Cdc.scd2Apply(
        spark.read.parquet(s"$base/hist"), batch, Seq("k"), "ver", "op")
        .write.mode("overwrite").parquet(s"$base/hist2")
      spark.read.parquet(s"$base/hist2").count()
    }
    println(f"PROBE scd2 apply batch=$dLog histRows=$nApplied wall=$tApply%.2fs " +
      "(one stored-history scan+rewrite + batch-sized window)")

    // rebuild: window the whole grown changelog, rewrite everything
    val (nRebuilt, tRebuild) = time {
      graft.operators.Cdc.scd2History(
        log.unionByName(batch), Seq("k"), "ver", "op")
        .write.mode("overwrite").parquet(s"$base/hist3")
      spark.read.parquet(s"$base/hist3").count()
    }
    val openApplied = spark.read.parquet(s"$base/hist2")
      .where(col("is_current")).count()
    val openRebuilt = spark.read.parquet(s"$base/hist3")
      .where(col("is_current")).count()
    println(f"PROBE scd2 rebuild rows=$nRebuilt wall=$tRebuild%.2fs " +
      f"applySpeedup=${tRebuild / tApply}%.1fx")
    println(s"PROBE scd2 equal rows=${nApplied == nRebuilt} " +
      s"open=${openApplied == openRebuilt} ($openApplied)")
    spark.stop()
  }
}
