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

  test("audits lower to one hash aggregation — no extra shuffle, no UDF") {
    val plan = Governance.kAnonymityStats(corpus, Seq("region", "segment"), k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // one exchange for the class aggregation, one single-partition gather
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }
}
