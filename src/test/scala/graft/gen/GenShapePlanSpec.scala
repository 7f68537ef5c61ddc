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

  // ------------------- round-18 fifth-wave shape families (b65-b76)

  test("grouped top-k: the window partitions the GROUPS frame, aggregation map-side combines") {
    val slice = sliceOf(travel, ReferenceSchemas.travelTables)
    val c = Templates.groupTopkCandidates(slice, Nil,
      "For each agency, what are the top 2 destinations by number of flights?")
    assert(c.nonEmpty)
    val p = planOf(travel, c.head.sql)
    noAllPairs(p)
    assert(p.contains("partial_count"), "the group counts must map-side combine:\n" + p.take(1200))
    assert(p.contains("Window"), p.take(1200))
    // the window must be PARTITIONED (per group), never a global
    // single-partition sort over all rows — the exchange feeding it
    // hash-partitions on the group column
    assert(raw"hashpartitioning\(agency".r.findFirstIn(p).isDefined,
      "window must partition by the group:\n" + p.take(1600))
    // Spark's rank-limit pushdown prunes each partition to the top-k
    // BEFORE the final window — the property that keeps per-group
    // state bounded at corpus scale
    assert(p.contains("WindowGroupLimit"),
      "rank-limit pushdown must fire:\n" + p.take(1600))
  }

  test("superlative over anti-join: LeftAnti hash join + scalar subquery, cohort scanned once per side") {
    val slice = sliceOf(store, ReferenceSchemas.storeTables)
    val c = Templates.superlativeAntiJoinCandidates(slice, ReferenceSchemas.storeFks,
      "Who is the oldest customer that never placed an order?")
    assert(c.nonEmpty)
    val p = planOf(store, c.head.sql)
    noAllPairs(p)
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as a LeftAnti hash join:\n" + p.take(1200))
    assert(p.contains("Subquery"), "the superlative must be a scalar subquery:\n" + p.take(1200))
  }

  test("avg of group aggregates: two chained hash aggregates, no window, no join") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val c = Templates.avgOfGroupAggCandidates(slice, ReferenceSchemas.schoolFks,
      "What is the average of each course's maximum score?")
    assert(c.nonEmpty)
    val p = planOf(school, c.head.sql)
    assert(!p.contains("Join"), "no join belongs in this plan:\n" + p.take(1200))
    assert(!p.contains("Window"), "no window belongs in this plan:\n" + p.take(1200))
    assert(p.contains("partial_max"), "the inner MAX must map-side combine:\n" + p.take(1200))
  }

  test("cohort compare and diff: one filtered grouped pass, conditional aggregates combine map-side") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val doms: String => Map[String, Seq[String]] =
      t => if (t == "enrollments") Map("term" -> Seq("Fall", "Spring")) else Map.empty
    val cmp = Templates.namedCohortCompareCandidates(slice,
      "Which term has more enrollments, Fall or Spring?", doms)
    assert(cmp.nonEmpty)
    val p1 = planOf(school, cmp.head.sql)
    noAllPairs(p1)
    assert(p1.contains("partial_count"), p1.take(1200))
    assert(p1.contains("term IN (Fall,Spring)") || p1.contains("term#"),
      "the cohort filter must reach the scan:\n" + p1.take(1600))
    val diff = Templates.cohortAggDiffCandidates(slice,
      "What is the difference between the average scores of Fall and Spring enrollments?", doms)
    assert(diff.nonEmpty)
    val p2 = planOf(school, diff.head.sql)
    assert(!p2.contains("Join"), "one pass, no self-join:\n" + p2.take(1200))
    assert(p2.contains("partial_avg"), p2.take(1200))
  }

  test("joined value agg: the 1-row-filtered dimension broadcasts into the fact scan") {
    val slice = sliceOf(school, ReferenceSchemas.schoolTables)
    val doms: String => Map[String, Seq[String]] =
      t => if (t == "courses") Map("title" -> Seq("Algebra", "Biology")) else Map.empty
    val c = Templates.joinedValueAggCandidates(slice, ReferenceSchemas.schoolFks,
      "What is the average score in Biology?", doms)
    assert(c.nonEmpty)
    val p = planOf(school, c.head.sql)
    noAllPairs(p)
    assert(p.contains("BroadcastHashJoin"), "the filtered dim must broadcast:\n" + p.take(1200))
    assert(p.contains("partial_avg"), p.take(1200))
  }
}
