package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * CONTROLLED-duplication scaling A/B for the dedup family (round-17
 * force-bench follow-up): the full-suite force run grows the dedup
 * rows ~11× on 10× data, but that input REPLICATES every document
 * verbatim — within-bucket candidate pairs grow ~100×, so the wall
 * growth is input-driven, not a plan defect. This probe PROVES that
 * claim with a control: synthetic corpora at N and 10N with a FIXED 1%
 * duplication rate (pair workload scales LINEARLY), timing the exact
 * operators the force bench flagged. Expected: ratios near 10× (linear
 * in rows) — a plan-defect superlinearity would survive the control,
 * an input artifact would not.
 *
 * Prints PROBE lines; run with Test/runMain.
 */
object ProbeForceDedupControl {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    /** Deterministic pseudo-text; ids ≡ 99 (mod 100) duplicate the
      * previous id's text — a fixed 1% duplication rate at any N. */
    def corpus(n: Long) = spark.range(n).select(
      col("id"),
      {
        val seed = when(col("id") % 100 === 99, col("id") - 1).otherwise(col("id"))
        // 40 words drawn from a 1k-word vocabulary by a hash chain:
        // unique docs share few shingles, duplicates share all
        concat_ws(" ", (0 until 40).map(k =>
          concat(lit("w"), pmod(xxhash64(seed * 41 + lit(k)), lit(1000)))): _*)
      }.as("text"))
      .localCheckpoint() // timings measure the OPERATOR, not text synthesis

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    Seq(base.toLong, base * 10L).foreach { n =>
      val docs = corpus(n)
      docs.count() // materialize the checkpoint outside the timings
      val tMinhash = time {
        graft.operators.Dedup.minhashNearDuplicates(docs, "id", "text").count()
      }
      val tNgram = time {
        graft.operators.Dedup.ngramJaccardPairs(docs, "id", "text").count()
      }
      val pairs = graft.operators.Dedup.minhashNearDuplicates(docs, "id", "text")
        .select("id_a", "id_b").localCheckpoint()
      pairs.count()
      val tGroups = time {
        graft.operators.Dedup.duplicateGroups(pairs).count()
      }
      val groups = graft.operators.Dedup.duplicateGroups(pairs)
        .select(col("id"), col("group_id")).localCheckpoint()
      groups.count()
      val tSplit = time {
        graft.operators.Sampling.leakageSafeSplit(docs, "id", groups,
          Seq("train" -> 0.9, "test" -> 0.1)).groupBy("split").count().collect()
      }
      println(f"PROBE n=$n%-9d minhash=$tMinhash%6.2f ngram=$tNgram%6.2f " +
        f"groups=$tGroups%6.2f split=$tSplit%6.2f")
    }
    spark.stop()
  }
}
