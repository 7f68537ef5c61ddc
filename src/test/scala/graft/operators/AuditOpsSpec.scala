package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-7 pipeline-audit operators: split-leakage audit and PQ
  * quantization-error stats. */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("splitLeakageAudit: empty on a leakage-safe split, lists straddlers on the naive split") {
    val base = (1L to 30L).map(i => (i,
      s"document $i body " + (1 to 25).map(j => s"tok${i}_$j").mkString(" ")))
    // copy ids at +500: the id-hash bucket is (id·2654435761) % 1000 and
    // 500·2654435761 ≡ 500 (mod 1000), so each copy's bucket sits exactly
    // 500 past its base's — ALWAYS the other half of a 50/50 split
    val copies = (1L to 6L).map(i => (i + 500L, base(i.toInt - 1)._2 + " extra"))
    val docs = (base ++ copies).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select("id_a", "id_b")
    assert(pairs.count() == 6) // each copy pairs with its base only
    val weights = Seq("train" -> 0.5, "test" -> 0.5)
    val groups = Dedup.duplicateGroups(pairs).select("id", "group_id")
    val safe = Sampling.leakageSafeSplit(docs, "doc_id", groups, weights)
    assert(Sampling.splitLeakageAudit(safe, "doc_id", "split", pairs).count() == 0)
    // naive hash split: every +500 copy lands opposite its base
    val naive = Sampling.split(docs, "doc_id", weights)
    val violations = Sampling.splitLeakageAudit(naive, "doc_id", "split", pairs)
      .as[(Long, Long, String, String)].collect()
    assert(violations.length == 6, violations.mkString(","))
    assert(violations.forall { case (a, b, sa, sb) => b == a + 500L && sa != sb })
  }

  test("quantizationErrorStats: codebook vectors quantize to zero error; stats match a hand computation") {
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 codebook entries
    // formed from vec_id 0 and 1 (probeModel contract)
    val vecs = Seq(
      (0L, Array(0.0, 0.0, 0.0, 0.0)),
      (1L, Array(1.0, 1.0, 1.0, 1.0)),
      (2L, Array(0.0, 0.0, 1.0, 1.0)), // exact mix of the two codebooks
      (3L, Array(0.5, 0.0, 1.0, 2.0))  // residuals: s0 min((.5²),(.5²+1)) = .25; s1 min(1+4, 0+1) = 1
    ).toDF("vec_id", "emb")
    val model = ProductQuantization.probeModel(vecs, "vec_id", "emb", m = 2, k = 2)
    val stats = ProductQuantization.quantizationErrorStats(vecs, "vec_id", "emb", model)
      .orderBy("subspace")
      .select($"subspace", $"n", round($"avg_sq_error", 6), round($"max_sq_error", 6))
      .as[(Int, Long, Double, Double)].collect().toSeq
    // subspace 0: errors 0, 0, 0, 0.25 → avg 0.0625 max 0.25
    // subspace 1: errors 0, 0, 0, 1.0  → avg 0.25   max 1.0
    assert(stats == Seq((0, 4L, 0.0625, 0.25), (1, 4L, 0.25, 1.0)), stats.toString)
  }
}
