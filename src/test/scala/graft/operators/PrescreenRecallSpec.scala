package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Recall certification for the round-7 Hamming prescreen in
 * [[Similarity.cosineNearDupPairs]]: the prescreen cut
 * (ceil(64·acos(t)/π) + 12 bits) must never reject a pair the banding
 * itself surfaced at cosine ≥ threshold. Planted pairs here sit AT the
 * threshold boundary (not comfortably above it like the fixture's 0.97
 * copies), across several deterministic seeds and perturbation angles,
 * so the slack — not the easy margin — is what's exercised.
 */
class PrescreenRecallSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random unit vector from a seed (splitmix-ish). */
  private def vec(seed: Long, dim: Int): Array[Double] = {
    var s = seed
    val v = Array.ofDim[Double](dim)
    var i = 0
    while (i < dim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      v(i) = ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
      i += 1
    }
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Rotate `a` toward an orthogonalized direction by angle θ — produces
    * a pair at EXACTLY cos(θ) to `a`. */
  private def rotated(a: Array[Double], dir: Array[Double], theta: Double): Array[Double] = {
    val dot = a.zip(dir).map { case (x, y) => x * y }.sum
    val orth0 = dir.zip(a).map { case (y, x) => y - dot * x }
    val n = math.sqrt(orth0.map(x => x * x).sum)
    val orth = orth0.map(_ / n)
    a.zip(orth).map { case (x, o) => math.cos(theta) * x + math.sin(theta) * o }
  }

  test("prescreen keeps every boundary-cosine pair the banding surfaces (seeds x angles)") {
    val dim = 64
    val threshold = 0.95
    val thetaAt = math.acos(threshold)
    for (seed <- Seq(1L, 7L, 1234L); frac <- Seq(0.999, 0.9, 0.5)) {
      // 40 base vectors; each planted partner at cos = cos(frac·θ) ≥ t
      val theta = thetaAt * frac
      val bases = (0 until 40).map(i => (i.toLong, vec(seed * 1000 + i, dim)))
      val partners = bases.map { case (id, a) =>
        (id + 10000L, rotated(a, vec(seed * 7777 + id, dim), theta))
      }
      val df = (bases ++ partners).toDF("vec_id", "emb")
      val found = Similarity.cosineNearDupPairs(df, "vec_id", "emb",
          threshold = threshold, dim = dim, chunks = 8)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      // banding miss probability at the boundary is ~2% per pair; the
      // prescreen must not ADD misses on top of it. Reference = the same
      // banding WITHOUT a prescreen: every pair whose signatures agree
      // on ≥1 band. Computed here driver-side from the same signatures.
      val sigs = df
        .select($"vec_id", graft.functions.sign_bits_lsh($"emb", 64, dim, 42L).as("sig"))
        .as[(Long, Long)].collect().toMap
      def bandsAgree(a: Long, b: Long): Boolean = (0 until 8).exists { i =>
        ((sigs(a) >>> (i * 8)) & 0xffL) == ((sigs(b) >>> (i * 8)) & 0xffL)
      }
      val expected = bases.map(_._1).filter(id => bandsAgree(id, id + 10000L))
        .map(id => (id, id + 10000L)).toSet
      val missed = expected -- found
      assert(missed.isEmpty,
        s"seed=$seed frac=$frac: prescreen dropped banding-surfaced pairs $missed")
    }
  }
}
