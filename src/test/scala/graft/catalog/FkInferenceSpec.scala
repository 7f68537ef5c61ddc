package graft.catalog

import graft.SparkSpec
import graft.core.FkEdge

/** Sketch-containment FK inference over the retail fixture: the seven
  * real FK edges must be recovered, reversed directions rejected by the
  * parent-uniqueness gate, and disjoint key spaces by containment. */
class FkInferenceSpec extends SparkSpec {

  private lazy val inferred: Seq[(FkEdge, Double)] = {
    graft.sources.Sources.register(spark, sfDir)
    FkInference.inferFks(spark, graft.sources.Sources.fixtureTables)
  }

  test("all seven declared FK edges are recovered with containment ~1") {
    val got = inferred.map(_._1).toSet
    for (e <- graft.sources.Sources.fixtureFks)
      assert(got.contains(e), s"missing $e; inferred=${got.mkString(", ")}")
    for ((e, c) <- inferred if graft.sources.Sources.fixtureFks.contains(e))
      assert(c >= 0.98, s"$e containment $c")
  }

  test("reversed edges are rejected by the parent-uniqueness gate") {
    val got = inferred.map(_._1).toSet
    // the many side of a real FK is not unique — the reversal must die
    assert(!got.contains(FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey")), got)
    assert(!got.contains(FkEdge("customer", "c_custkey", "orders", "o_custkey")), got)
  }

  test("disjoint key spaces are rejected by containment") {
    val got = inferred.map(_._1).toSet
    // nationkey (0..24) is not contained in regionkey (0..4)
    assert(!got.contains(FkEdge("nation", "n_nationkey", "region", "r_regionkey")), got)
  }

  test("one corpus pass per table: sketch build is a partial object aggregate") {
    val p = FkInference.columnSketches(spark, Seq("lineitem"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(p.contains("partial_theta_sketch_agg"), p.take(2000))
  }
}
