package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Force-scale probe for global sequence packing: 20M pre-counted
 * documents (~2B tokens) through the distributed prefix sum. The probe
 * asserts (a) exact global invariants that only hold if every partition
 * base is aligned with its local sums — last doc's offset + count ==
 * the exact total, and per-doc offsets telescope (checked by sampling
 * contiguous id windows); (b) the shuffle stays NARROW — (id, count)
 * pairs, never anything corpus-text-sized; (c) wall time stays linear-
 * ish (single-digit seconds per 10M docs on local[32]).
 */
object ProbePackingScale {
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

    val nDocs = 20000000L
    val seqLen = 2048
    // deterministic pseudo-random counts in [0, 200): exact total is
    // checkable without materializing anything corpus-sized
    val docs = spark.range(0, nDocs).select(col("id").as("doc_id"),
      pmod(xxhash64(col("id")), lit(200L)).as("n"))

    val w0 = shuffleWrite
    val t0 = System.nanoTime()
    val packed = graft.operators.Packing.packOffsetsFromCounts(
      docs, "doc_id", "n", seqLen, partitions = 64)
    // exact invariants over the full result in one distributed agg
    val inv = packed.agg(
      sum("n_tokens").as("total"),
      max(col("global_off") + col("n_tokens")).as("end"),
      count(lit(1L)).as("rows"),
      sum(when(col("seq_off") =!= pmod(col("global_off"), lit(seqLen.toLong)), 1L)
        .otherwise(0L)).as("bad_mod")).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    val mb = (shuffleWrite - w0) / 1e6
    val total = inv.getAs[Long]("total")
    println(f"PROBE pack_20m_docs => wall=$secs%.1fs shuffle_write=$mb%.0fMB " +
      s"total_tokens=$total")
    assert(inv.getAs[Long]("rows") == nDocs)
    // base+local alignment: the stream must END exactly at the total
    assert(inv.getAs[Long]("end") == total,
      s"stream end ${inv.getAs[Long]("end")} != total $total — partition bases misaligned")
    assert(inv.getAs[Long]("bad_mod") == 0L)
    // telescoping: offsets over a contiguous id window must advance by
    // exactly the window's own counts (checks cross-partition joints
    // wherever the sampled range boundaries landed)
    val win = packed.where(col("doc_id").between(9999000L, 10001000L))
      .orderBy("doc_id").collect()
    win.sliding(2).foreach { case Array(p, q) =>
      assert(q.getAs[Long]("global_off") ==
        p.getAs[Long]("global_off") + p.getAs[Long]("n_tokens"),
        s"offset gap between ${p.getLong(0)} and ${q.getLong(0)}")
    }
    // narrow shuffle: ~16B/row of (id, n) through one range exchange
    // (plus the window's cache traffic) — NOT text-sized
    assert(mb < 2500, f"prefix-sum shuffle should be narrow, got $mb%.0fMB")
    spark.catalog.clearCache()

    // write path: materialize 2M short docs (~40M tokens) into
    // 2048-token sequences — the one corpus-sized seq_id exchange
    val nText = 2000000L
    val text = spark.range(0, nText).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 20).map(k => concat(lit("w"),
        pmod(xxhash64(col("id") * 13 + k), lit(30000L)).cast("string"))): _*)
        .as("text"))
    text.persist().count()
    val t1 = System.nanoTime()
    val seqs = graft.operators.Packing.materializeSequences(
      text, "doc_id", "text", seqLen = 2048, partitions = 64)
    val sInv = seqs.agg(sum("n_tokens").as("total"), count(lit(1L)).as("n_seqs"),
      sum(when(col("n_tokens") === 2048L, 1L).otherwise(0L)).as("full")).collect()(0)
    val secs2 = (System.nanoTime() - t1) / 1e9
    val totalT = sInv.getAs[Long]("total")
    println(f"PROBE materialize_2m_docs => wall=$secs2%.1fs " +
      s"total_tokens=$totalT n_seqs=${sInv.getAs[Long]("n_seqs")}")
    assert(totalT == nText * 20, s"token loss: $totalT")
    assert(sInv.getAs[Long]("n_seqs") == (totalT + 2047) / 2048)
    // every sequence except at most the final partial one is full
    assert(sInv.getAs[Long]("full") >= sInv.getAs[Long]("n_seqs") - 1)
    spark.catalog.clearCache()
    spark.stop()
  }
}
