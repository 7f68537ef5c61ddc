package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding compression for similarity search at corpus scale: symmetric
 * int8 quantization (the standard serving-index trick — 4× smaller than
 * float32, 8× smaller than the double arrays Spark materializes) and
 * deterministic signed random projection (Johnson–Lindenstrauss
 * dimensionality reduction, Achlioptas "Database-friendly random
 * projections", 2001 — ±1 entries suffice).
 *
 * Scale rationale (100 TB, ~10^10 vectors): the ANN candidate index
 * (IVF lists / LSH buckets) should hold QUANTIZED codes — int8 codes for
 * a 64-dim corpus are 64 B/vector instead of 512 B, so a 10^10-vector
 * index drops from 5 TB to 640 GB and each probe reads 8× fewer shuffle
 * bytes. Per-vector scales cancel inside cosine, so candidate ranking on
 * the int8 codes needs no dequantization at all; only the final exact
 * re-rank (top-k·4 candidates, tiny) touches float vectors.
 *
 * The quantization arithmetic lives in the one-pass native expressions
 * `Int8QuantizeStats` / `Int8Codes` (a `transform` + `array_max`
 * composition re-evaluates the scale per ELEMENT once CollapseProject
 * inlines it into the lambda — measured O(dim²)/row); the random
 * projection composes built-ins whose lambda only reads its own
 * arguments. Both are replicated exactly by the DuckDB oracles
 * (list_transform / list_sum), which is what makes the operators
 * hash-verifiable.
 */
object Quantization {

  /**
   * Quantization report: scale, integer code norm (exact — the
   * hash-stable part of the contract) and reconstruction RMSE per
   * vector. Narrow projection over the embedding scan; nothing
   * shuffles.
   */
  def quantizeInt8(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    // one-pass native expression, NOT a transform/aggregate composition:
    // an outer alias referenced inside a higher-order-function lambda is
    // re-inlined by CollapseProject and re-evaluated per ELEMENT, which
    // made the composed version's array_max O(dim²) per row
    df.select(col(idCol), graft.functions.int8_quantize_stats(col(embCol)).as("__s"))
      .select(col(idCol),
        round(col("__s.scale"), 6).as("scale"),
        col("__s.qnorm").as("qnorm"),
        round(col("__s.rmse"), 6).as("rmse"))
  }

  /**
   * Exact top-k cosine ranking over the QUANTIZED codes: per-vector
   * scales cancel in cosine, so ranking int8 codes against the int8
   * query needs only integer dot products (8× less data movement than
   * the float path at the same plan shape: scan → project →
   * TakeOrderedAndProject, no shuffle). The small accuracy loss vs
   * float cosine is the quantization trade; [[quantizeInt8]] reports it.
   */
  def quantizedTopK(df: DataFrame, idCol: String, embCol: String,
      query: Array[Double], k: Int): DataFrame = {
    val qscale = query.map(math.abs).max / 127.0
    // ties round away from zero, same as round()/DuckDB round on doubles
    def halfUp(v: Double): Long =
      if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
    val qcodes = query.map { x =>
      if (qscale == 0) 0d
      else math.max(-127L, math.min(127L, halfUp(x / qscale))).toDouble
    }
    val qlit = array(qcodes.map(lit): _*)
    // int8_codes is a native one-pass expression (see quantizeInt8 on
    // lambda-scope re-evaluation) already typed array<double> for cosine
    df.select(col(idCol),
        round(graft.functions.cosine_sim(
          graft.functions.int8_codes(col(embCol)), qlit), 4).as("qcosine"))
      .where(col("qcosine").isNotNull)
      .orderBy(col("qcosine").desc, col(idCol))
      .limit(k)
  }

  /**
   * Deterministic ±1 random projection to `outDim` dimensions:
   * `proj[j] = Σ_i emb[i] · sign(sin(i·12.9898 + j·78.233))` with i, j
   * 1-based. The trig-hash sign pattern is seedless and engine-portable
   * (both JVM and DuckDB `sin` are correctly-rounded libm within 1 ulp;
   * the sign only disagrees on |sin| below ulp — measure-zero), which
   * keeps the operator ORACLE-CHECKABLE, unlike an RNG-generated
   * projection matrix. Left-fold accumulation via `aggregate` keeps
   * summation order deterministic.
   *
   * Scale: one narrow projection per row — the projection matrix is
   * never materialized (regenerated from (i, j) inside codegen), so
   * nothing broadcasts and nothing shuffles; output is outDim/dim of
   * the input bytes.
   */
  def randomProject(df: DataFrame, idCol: String, embCol: String, outDim: Int): DataFrame = {
    val e = col(embCol)
    val projections = (1 to outDim).map { j =>
      val dot = aggregate(
        zip_with(e, sequence(lit(1), size(e)), (x, i) =>
          x * when(sin(i.cast("double") * lit(12.9898) + lit(j * 78.233)) > 0, lit(1.0))
            .otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      struct(lit(j).as("dim"), round(dot, 4).as("value"))
    }
    df.select(col(idCol), explode(array(projections: _*)).as("p"))
      .select(col(idCol), col("p.dim").as("dim"), col("p.value").as("value"))
  }
}
