package graft.gen

import graft.SparkSpec
import graft.core.SchemaSlice
import graft.eval.ReferenceSchemas
import org.apache.spark.sql.execution.FormattedMode

/**
 * Physical-plan pins for the GENERATED shape families (rounds 16–17):
 * the shape scaladocs claim scale properties — "the groups frame
 * broadcasts", "EXCEPT is a hash anti join, never a collect", "two hash
 * joins, no cartesian" — and this spec holds the actual plans to them,
 * the PlanQualitySpec discipline applied to the NL-generated surface.
 * Plans come from the REAL generated SQL (the shape functions, not
 * hand-copied strings), executed against the reference-crawled fixture
 * schemas on an isolated session.
 */
class GenShapePlanSpec extends SparkSpec {

  private lazy val store = {
    val s = spark.newSession()
    ReferenceSchemas.registerStore(s)
    s
  }
  private lazy val school = {
    val s = spark.newSession()
    ReferenceSchemas.registerSchool(s)
    s
  }
  private lazy val travel = {
    val s = spark.newSession()
    ReferenceSchemas.registerTravel(s)
    s
  }

  private def sliceOf(s: org.apache.spark.sql.SparkSession, tables: Seq[String]) =
    SchemaSlice(scala.collection.immutable.ListMap(
      tables.map(t => t -> s.table(t).schema.fieldNames.toSeq): _*))

  private def planOf(s: org.apache.spark.sql.SparkSession, sql: String): String =
    s.sql(sql).queryExecution.explainString(FormattedMode)

  private def noAllPairs(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), "cartesian product:\n" + p.take(1200))
    assert(!p.contains("BroadcastNestedLoopJoin"), "BNLJ:\n" + p.take(1200))
  }

  test("vs-group-average: the |groups|-row average frame broadcasts, one corpus pass") {
    val slice = sliceOf(travel, ReferenceSchemas.travelTables)
    val c = Templates.vsGroupAvgCandidates(slice,
      "Which flights are more expensive than the average price for their agency?")
    assert(c.nonEmpty)
    val p = planOf(travel, c.head.sql)
    noAllPairs(p)
    assert(p.contains("BroadcastHashJoin"), "group frame must broadcast:\n" + p.take(1200))
    assert(p.contains("partial_avg"), "group averages must map-side combine:\n" + p.take(1200))
  }

  test("directional set difference: EXCEPT plans as hash aggregate + anti join, no collect") {
    val slice = sliceOf(travel, ReferenceSchemas.travelTables)
    val c = Templates.dirSetDiffCandidates(slice,
      "How many cities appear as destinations but never as origins?")
    assert(c.nonEmpty)
    val p = planOf(travel, c.head.sql)
    noAllPairs(p)
    assert(p.contains("LeftAnti") || p.contains("BroadcastHashJoin"),
      "EXCEPT must plan as an anti join:\n" + p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
  }

  test("two-hop FK aggregate: two hash joins on the chain, dims broadcast, never all-pairs") {
    val slice = sliceOf(store, ReferenceSchemas.storeTables)
    val c = Templates.twoHopAggCandidates(slice, ReferenceSchemas.storeFks,
      "What is the total quantity of items ordered by each customer?")
    assert(c.nonEmpty)
    val p = planOf(store, c.head.sql)
    noAllPairs(p)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_sum"), "the SUM must map-side combine:\n" + p.take(1200))
  }

  test("share argmax: ratio frame + tie-aware scalar subquery, partial aggregation throughout") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val c = Templates.shareArgmaxCandidates(slice, ReferenceSchemas.schoolFks,
      "Which course has the highest share of A grades?")
    assert(c.nonEmpty)
    val p = planOf(school, c.head.sql)
    noAllPairs(p)
    assert(p.contains("partial_"), "the CASE ratio must map-side combine:\n" + p.take(1200))
    assert(p.contains("Subquery"), "the argmax must be a scalar subquery, not a sort:\n" + p.take(1200))
  }

  test("correlated count vs own group: joined to the aggregate frame, no re-scan per row") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val c = Templates.countVsOwnGroupCandidates(slice,
      "How many enrollments scored above their course average?")
    assert(c.nonEmpty)
    val p = planOf(school, c.head.sql)
    noAllPairs(p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "must join the groups frame, not correlate per row:\n" + p.take(1200))
  }

  test("nested group-having: two chained hash aggregates, zero joins") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val c = Templates.nestedGroupHavingCandidates(slice, ReferenceSchemas.schoolFks,
      "For each year, how many courses had at least 20 enrollments?")
    assert(c.nonEmpty)
    val p = planOf(school, c.head.sql)
    assert(!p.contains("Join"), "no join belongs in this plan:\n" + p.take(1200))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1200))
  }
}
