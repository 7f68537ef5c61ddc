package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Force-scale probe for `Streams.intervalJoinStream` — the claim under
 * test is the scaladoc's: with the time-range conjunct, stream-stream
 * join state is bounded by ingest-rate × horizon per side, NOT by
 * stream length. 5M events per side (arg-overridable) replayed as a
 * time-ordered 8-chunk file stream; the probe checks
 *   (a) EXACT equality (count + row checksum) of the streamed result
 *       with the batch interval join over the same frames, and
 *   (b) max state rows across batches ≪ total input — eviction works.
 * Files are written time-ordered so no row arrives below the
 * watermark (the fixture-replay analogue of an ordered log); the
 * safety argument for boundary matches: a right row in batch k+1 has
 * ts ≥ the batch-k frontier, and left eviction lags the joint
 * watermark by horizon, so every in-horizon left partner is still in
 * state. Prints PROBE lines; numbers recorded in COVERAGE.md.
 */
object ProbeStreamJoinScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    // arg 2: state store provider — "hdfs" (default) or "rocksdb" (the
    // production choice for large state: changelog-checkpointed native
    // store instead of rewriting the whole map as a delta file)
    val provider =
      if (args.length > 1 && args(1) == "rocksdb")
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val users = 100000L
    val spanSec = 30L * 86400
    val chunks = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    println(s"PROBE provider=${provider.split('.').last}")
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic, time-ORDERED synthetic streams (ts monotone in id)
    def side(salt: Int): DataFrame = spark.range(n).select(
      col("id").as("event_id"),
      (lit(1704067200L) + col("id") * spanSec / n).cast("timestamp").as("ts"),
      pmod(hash(col("id"), lit(salt)), lit(users)).as("user_id"))
    val views = side(2)
    val buys = side(7)

    val base = java.nio.file.Files.createTempDirectory("probe_ssjoin").toString
    def replayDir(df: DataFrame, name: String): String = {
      val dir = s"$base/$name"
      val per = n / chunks
      (0 until chunks).foreach { i =>
        df.where(col("event_id") >= i * per &&
            (col("event_id") < (i + 1) * per || lit(i == chunks - 1)))
          .coalesce(1).write.mode("append").parquet(dir)
      }
      dir
    }
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType)))
    def stream(dir: String): DataFrame =
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val (dirs, tWrite) = time {
      (replayDir(views, "views"), replayDir(buys, "buys"))
    }
    println(f"PROBE write n=$n x2 chunks=$chunks wall=$tWrite%.2fs")

    // streamed: 8 paired micro-batches through the watermarked join
    val cnt = spark.sparkContext.longAccumulator("pairs")
    val chk = spark.sparkContext.longAccumulator("checksum")
    val joined = graft.streaming.Streams.intervalJoinStream(
      stream(dirs._1).toDF("view_id", "v_ts", "user_id"),
      stream(dirs._2).toDF("buy_id", "b_ts", "user_id"),
      "user_id", "v_ts", "b_ts",
      horizon = "30 minutes", watermark = "10 minutes")
    val ((maxState, batches), tStream) = time {
      val q = joined.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val r = b.agg(count(lit(1L)), sum(col("view_id") * 31 + col("buy_id")))
            .collect()(0)
          cnt.add(r.getLong(0)); chk.add(if (r.isNullAt(1)) 0L else r.getLong(1))
        }
        .start()
      q.awaitTermination(1200000)
      val progress = q.recentProgress
      (progress.map(p => p.stateOperators.map(_.numRowsTotal).sum).max,
        progress.length)
    }
    println(f"PROBE streamed wall=$tStream%.2fs batches=$batches pairs=${cnt.value} " +
      f"checksum=${chk.value} maxStateRows=$maxState of ${2 * n} input " +
      f"(${100.0 * maxState / (2 * n)}%.2f%%)")

    // batch reference on the identical frames
    val (bRow, tBatch) = time {
      graft.streaming.Streams.intervalJoinStream(
        views.toDF("view_id", "v_ts", "user_id"),
        buys.toDF("buy_id", "b_ts", "user_id"),
        "user_id", "v_ts", "b_ts", horizon = "30 minutes")
        .agg(count(lit(1L)), sum(col("view_id") * 31 + col("buy_id")))
        .collect()(0)
    }
    val (bCnt, bSum) = (bRow.getLong(0), if (bRow.isNullAt(1)) 0L else bRow.getLong(1))
    println(f"PROBE batch wall=$tBatch%.2fs pairs=$bCnt checksum=$bSum")
    println(s"PROBE equal count=${cnt.value == bCnt} checksum=${chk.value == bSum}")

    spark.stop()
  }
}
