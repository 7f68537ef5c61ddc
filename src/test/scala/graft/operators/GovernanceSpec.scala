package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  // 3 classes: (us,a) x4 rows, (us,b) x2 rows, (eu,a) x1 row
  private def corpus = Seq(
    ("us", "a", "s1"), ("us", "a", "s1"), ("us", "a", "s2"), ("us", "a", "s3"),
    ("us", "b", "s1"), ("us", "b", "s1"),
    ("eu", "a", "s9")
  ).toDF("region", "segment", "diagnosis")

  test("kAnonymityViolations finds exactly the under-k classes") {
    val v = Governance.kAnonymityViolations(corpus, Seq("region", "segment"), k = 3)
      .orderBy("region", "segment").collect()
    assert(v.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("eu", "a", 1L), ("us", "b", 2L)))
  }

  test("kAnonymityStats reports the gate exactly") {
    val s = Governance.kAnonymityStats(corpus, Seq("region", "segment"), k = 3).collect()(0)
    assert(s.getAs[Long]("n_rows") === 7L)
    assert(s.getAs[Long]("n_classes") === 3L)
    assert(s.getAs[Long]("anonymity_k") === 1L)
    assert(s.getAs[Long]("violating_classes") === 2L)
    assert(s.getAs[Long]("exposed_rows") === 3L)
    assert(!s.getAs[Boolean]("pass"))
  }

  test("lDiversityViolations catches homogeneous classes; nulls carry no diversity") {
    // (us,a): 3 distinct; (us,b): 1 distinct (homogeneous); (eu,a): 1 distinct
    val v = Governance.lDiversityViolations(corpus, Seq("region", "segment"), "diagnosis", l = 2)
      .orderBy("region", "segment").collect()
    assert(v.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("eu", "a"), ("us", "b")))
    // null sensitive values do not count toward diversity
    val withNull = corpus.union(Seq(("us", "b", null.asInstanceOf[String])).toDF("region", "segment", "diagnosis"))
    val v2 = Governance.lDiversityViolations(withNull, Seq("region", "segment"), "diagnosis", l = 2)
      .where($"region" === "us" && $"segment" === "b").collect()
    assert(v2.length === 1 && v2(0).getAs[Long]("distinct_sensitive") === 1L)
  }

  test("suppressBelowK leaves a k-anonymous corpus, including NULL-keyed classes") {
    val withNullKey = corpus.union(Seq((null.asInstanceOf[String], "z", "s0")).toDF("region", "segment", "diagnosis"))
    val kept = Governance.suppressBelowK(withNullKey, Seq("region", "segment"), k = 3)
    assert(kept.count() === 4L) // only (us,a) survives; the NULL-keyed singleton is suppressed
    val audit = Governance.kAnonymityStats(kept, Seq("region", "segment"), k = 3).collect()(0)
    assert(audit.getAs[Boolean]("pass"))
    assert(audit.getAs[Long]("exposed_rows") === 0L)
  }

  test("tClosenessStats computes the exact integer TVD numerator per class") {
    // hand computation (N=7; global s1:4, s2:1, s3:1, s9:1):
    //   (us,a) n_g=4: |2·7−4·4|+|7−4|+|7−4|+|0−4| = 2+3+3+4 = 12
    //   (us,b) n_g=2: |2·7−4·2|+2+2+2            = 6+6     = 12
    //   (eu,a) n_g=1: |1·7−1·1|+4+1+1            = 6+6     = 12
    // gate t=1/2: violating ⇔ num > 7·n_g ⇔ only the singleton class
    val out = Governance.tClosenessStats(
      corpus, Seq("region", "segment"), "diagnosis", tNum = 1, tDen = 2)
      .orderBy("region", "segment").collect()
    assert(out.map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("class_size"), r.getAs[Long]("tvd_num"),
      r.getAs[Boolean]("violating"))).toSeq === Seq(
      ("eu", "a", 1L, 12L, true),
      ("us", "a", 4L, 12L, false),
      ("us", "b", 2L, 12L, false)))
  }

  test("tClosenessStats: classes mirroring the global distribution score zero") {
    val uniform = Seq(
      ("us", "x"), ("us", "y"), ("eu", "x"), ("eu", "y")
    ).toDF("region", "diagnosis")
    val out = Governance.tClosenessStats(uniform, Seq("region"), "diagnosis", 1, 10)
      .collect()
    assert(out.forall(_.getAs[Long]("tvd_num") === 0L))
    assert(out.forall(!_.getAs[Boolean]("violating")))
  }

  test("tClosenessStats: NULL sensitive values form their own category") {
    // (us): {s, null}; (eu): {s, s} — global {s:3, null:1}, N=4, n_g=2
    //   (us): |1·4−3·2| + |1·4−1·2| = 2+2 = 4
    //   (eu): |2·4−3·2| + (absent null: 1·2) = 2+2 = 4
    val withNull = Seq(
      ("us", "s"), ("us", null.asInstanceOf[String]),
      ("eu", "s"), ("eu", "s")
    ).toDF("region", "diagnosis")
    val out = Governance.tClosenessStats(withNull, Seq("region"), "diagnosis", 1, 2)
      .orderBy("region").collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("tvd_num"))).toSeq ===
      Seq(("eu", 4L), ("us", 4L)))
  }

  test("tClosenessOrderedStats computes the exact integer EMD numerator") {
    // (us): {1,3}, (eu): {2,2}; global {1:1, 2:2, 3:1}, N=4, m=3
    //   (us) n_g=2: diffs (2,−4,2) → cums (2,−2,0) → emd_num 4
    //   (eu) n_g=2: diffs (−2,4,−2) → cums (−2,2,0) → emd_num 4
    // denominator n_g·N·(m−1) = 16: t=1/5 ⇒ 20>16 violating,
    // t=1/4 ⇒ 16>16 not
    val ordered = Seq(
      ("us", 1L), ("us", 3L), ("eu", 2L), ("eu", 2L)
    ).toDF("region", "severity")
    val atFifth = Governance.tClosenessOrderedStats(
      ordered, Seq("region"), "severity", 1, 5)
      .orderBy("region").collect()
    assert(atFifth.map(r => (r.getString(0), r.getAs[Long]("class_size"),
      r.getAs[Long]("emd_num"), r.getAs[Boolean]("violating"))).toSeq ===
      Seq(("eu", 2L, 4L, true), ("us", 2L, 4L, true)))
    val atQuarter = Governance.tClosenessOrderedStats(
      ordered, Seq("region"), "severity", 1, 4).collect()
    assert(atQuarter.forall(!_.getAs[Boolean]("violating")))
  }

  test("tClosenessOrderedStats: mirrored classes score zero; NULLs are excluded") {
    val uniform = Seq(
      ("us", 1L), ("us", 2L), ("eu", 1L), ("eu", 2L)
    ).toDF("region", "severity")
    val out = Governance.tClosenessOrderedStats(uniform, Seq("region"), "severity", 1, 10)
      .collect()
    assert(out.forall(_.getAs[Long]("emd_num") === 0L))
    // a NULL severity row changes nothing — no position on an ordered axis
    val withNull = uniform.union(
      Seq(("us", null.asInstanceOf[java.lang.Long])).toDF("region", "severity"))
    val out2 = Governance.tClosenessOrderedStats(withNull, Seq("region"), "severity", 1, 10)
      .orderBy("region").collect().map(r => (r.getString(0), r.getAs[Long]("emd_num"))).toSeq
    assert(out2 === out.map(r => (r.getString(0), r.getAs[Long]("emd_num"))).toSeq.sorted)
  }

  test("tClosenessOrderedStats: high-cardinality sensitive domain fails actionably, not OOM") {
    // a near-continuous column would make the |classes|×|domain| grid
    // explode — the guard fires before any grid is built
    val wide = (1 to 50).map(i => ("us", i.toLong)).toDF("region", "severity")
    val e = intercept[IllegalArgumentException] {
      Governance.tClosenessOrderedStats(wide, Seq("region"), "severity", 1, 10,
        maxDomain = 10L)
    }
    assert(e.getMessage.contains("distinct values") &&
      e.getMessage.contains("Band or bucket"))
    // raising the cap deliberately admits the same domain
    assert(Governance.tClosenessOrderedStats(wide, Seq("region"), "severity", 1, 10,
      maxDomain = 50L).count() === 1L)
  }

  test("tCloseness plan: domain/total joins broadcast; no UDF; aggregate-sized shuffles only") {
    val plan = Governance.tClosenessStats(
      corpus, Seq("region", "segment"), "diagnosis", 1, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    // corpus-sized: the (class,value) cells agg; the global agg and the
    // quasi-key window are aggregate-sized; final groupBy reuses the
    // window's partitioning — no fourth hash exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 3)
  }

  test("audits lower to one hash aggregation — no extra shuffle, no UDF") {
    val plan = Governance.kAnonymityStats(corpus, Seq("region", "segment"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // one exchange for the class aggregation, one single-partition gather
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }
}
