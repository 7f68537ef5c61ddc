package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Same-session interleaved A/B for the materializeSequences layout
 * decision (round 14): V1 ships token ARRAYS through the range exchange
 * and caches the tokenized corpus for both prefix-sum consumers; V3
 * (shipped) runs the prefix sum on the narrow (id, count) projection
 * and joins RAW TEXT back, tokenizing once after the join. Cross-window
 * comparisons were noise-contaminated (the 20M-offsets probe, unchanged
 * code, swung 12.1→16.7s between sessions) — this probe interleaves
 * min-of-3 so both arms share every noise window (ProbeCurate
 * precedent). 2M docs / 40M tokens, 2048-token sequences.
 */
object ProbePackAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nText = 2000000L
    val text = spark.range(0, nText).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 20).map(k => concat(lit("w"),
        pmod(xxhash64(col("id") * 13 + k), lit(30000L)).cast("string"))): _*)
        .as("text"))
    text.persist().count()

    // V1: arrays ride the range exchange; tokenized corpus cached
    def v1(docs: DataFrame): DataFrame = {
      val l = 2048L
      val toks = docs.select(col("doc_id"),
        filter(split(trim(col("text")), "\\s+"), t => length(t) > 0).as("__t"))
        .withColumn("__n", size(col("__t")).cast("long"))
      val ranged = toks.repartitionByRange(64, col("doc_id"))
        .withColumn("__pid", spark_partition_id()).persist()
      val localW = Window.partitionBy(col("__pid")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = ranged.withColumn("__local",
        coalesce(sum(col("__n")).over(localW), lit(0L)))
      val baseW = Window.orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bases = ranged.groupBy(col("__pid"))
        .agg(sum(col("__n")).as("__ptotal"))
        .withColumn("__base", coalesce(sum(col("__ptotal")).over(baseW), lit(0L)))
        .select(col("__pid"), col("__base"))
      val withSeqs = local.join(broadcast(bases), Seq("__pid"))
        .withColumn("__off", col("__base") + col("__local"))
        .where(col("__n") > 0)
        .select(col("__t"), col("__n"), col("__off"),
          explode(sequence(expr(s"__off div ${l}L"),
            expr(s"(__off + __n - 1) div ${l}L"))).as("seq_id"))
      val pieces = withSeqs.select(col("seq_id"),
        greatest(col("seq_id") * l - col("__off"), lit(0L)).as("__s"),
        least(col("__n"), (col("seq_id") + 1L) * l - col("__off")).as("__e"),
        col("__off"), col("__t"))
        .select(col("seq_id"), (col("__off") + col("__s")).as("__gpos"),
          slice(col("__t"), (col("__s") + 1L).cast("int"),
            (col("__e") - col("__s")).cast("int")).as("__piece"))
      pieces.groupBy("seq_id").agg(
        sum(size(col("__piece")).cast("long")).as("n_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("__gpos").as("p"), col("__piece").as("w")))),
          x => x("w"))), " ").as("seq_text"))
    }

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f
      require(n == 19532L, s"wrong seq count $n")
      spark.catalog.clearCache(); text.persist().count()
      (System.nanoTime() - t0) / 1e9
    }
    val (a, b) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (1 to 3).foreach { _ =>
      a += time(v1(text).count())
      b += time(graft.operators.Packing
        .materializeSequences(text, "doc_id", "text", 2048, 64).count())
    }
    val (ra, rb) = (a.result(), b.result())
    println(f"PROBE pack_ab => v1_arrays_cached min=${ra.min}%.2f runs=${ra.map(x => f"$x%.2f").mkString(",")}" +
      f" | v3_narrow_join min=${rb.min}%.2f runs=${rb.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
