package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.exec.Executor
import graft.safety.Validator
import graft.sources.Sources

/**
 * Shared declared-query inventory (SURVEY.md §2.12): each SQL text is both
 * the Spark query (executed through the engine's validate → limit-inject →
 * execute path) and the DuckDB oracle. Single source of truth keeps the
 * column names identical on both sides.
 *
 * Determinism rules: every query carries a total ORDER BY when row
 * selection matters; float *aggregates* are ROUNDed (sum→2dp, avg→4dp)
 * because parallel summation order differs between engines; raw column
 * values pass through exactly. Timestamps that stand in for DATEs are cast.
 */
object Queries {
  // Queries here run verbatim in both Spark SQL and DuckDB.
  val sql: Seq[(String, String)] = Seq(
    // --- projections / filters (SURVEY §2.2) ---
    "d01_project_limit" ->
      "SELECT c_name, c_acctbal FROM customer ORDER BY c_custkey LIMIT 100",
    "d02_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment LIMIT 100",
    "d03_filter_and" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05 ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "d04_like" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%green%' ORDER BY p_partkey LIMIT 100",
    "d05_not_null" ->
      "SELECT o_orderkey FROM orders WHERE o_orderpriority IS NOT NULL ORDER BY o_orderkey LIMIT 100",
    "d06_date_filter" ->
      "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_odate FROM orders WHERE o_orderdate >= DATE '1995-01-01' ORDER BY o_orderkey LIMIT 100",
    "d20_case_when" ->
      "SELECT l_orderkey, l_linenumber, CASE WHEN l_discount >= 0.05 THEN 'hi' ELSE 'lo' END AS band FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "d24_between" ->
      "SELECT p_partkey, p_size FROM part WHERE p_size BETWEEN 10 AND 15 ORDER BY p_partkey LIMIT 100",
    "d25_in_list" ->
      "SELECT n_nationkey, n_name FROM nation WHERE n_name IN ('FRANCE', 'GERMANY', 'EGYPT') ORDER BY n_nationkey LIMIT 100",
    // --- joins (§2.3) ---
    "d07_join_fk" ->
      "SELECT c.c_name, o.o_totalprice FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey ORDER BY o.o_orderkey LIMIT 100",
    "d08_join_chain" ->
      "SELECT n.n_name, c.c_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'ASIA' ORDER BY c.c_custkey LIMIT 100",
    "d26_self_join" ->
      "SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey ORDER BY nk_a, nk_b LIMIT 100",
    // --- aggregations (§2.4) ---
    "d09_groupby_count" ->
      "SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 100",
    "d10_groupby_sum_avg" ->
      "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, ROUND(AVG(l_extendedprice), 4) AS avg_price FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus LIMIT 100",
    "d11_min_max" ->
      "SELECT MIN(p_retailprice) AS mn, MAX(p_retailprice) AS mx FROM part",
    "d12_count_distinct" ->
      "SELECT COUNT(DISTINCT c_mktsegment) AS d FROM customer",
    // --- windows (§2.5) ---
    "d13_window_avg" ->
      "SELECT c_custkey, c_mktsegment, c_acctbal, ROUND(AVG(c_acctbal) OVER (PARTITION BY c_mktsegment), 4) AS seg_avg FROM customer ORDER BY c_custkey LIMIT 100",
    // --- sorts / top-k (§2.6) ---
    "d15_topn" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5",
    // --- set ops / subqueries / CTEs (§2.7) ---
    "d16_union" ->
      "SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey AS k FROM supplier ORDER BY k LIMIT 100",
    "d17_scalar_subquery" ->
      "SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer) ORDER BY c_custkey LIMIT 100",
    "d18_in_subquery" ->
      "SELECT p_partkey, p_name FROM part WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45) ORDER BY p_partkey LIMIT 100",
    "d19_cte" ->
      "WITH big AS (SELECT o_custkey, SUM(o_totalprice) AS s FROM orders GROUP BY o_custkey) SELECT c.c_name, ROUND(b.s, 2) AS s FROM big b JOIN customer c ON c.c_custkey = b.o_custkey WHERE b.s > 300000 ORDER BY c.c_custkey LIMIT 100",
    "d27_exists" ->
      "SELECT s_suppkey, s_name FROM supplier s WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49) ORDER BY s_suppkey LIMIT 100",
    "d28_ilike" ->
      "SELECT p_partkey, p_name FROM part WHERE p_name ILIKE '%GREEN%' ORDER BY p_partkey LIMIT 100",
    "d29_left_join" ->
      "SELECT n.n_name, COUNT(c.c_custkey) AS cnt FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name ORDER BY n.n_name LIMIT 100",
    "d30_anti_join" ->
      "SELECT c_custkey FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY c_custkey LIMIT 100",
    "d31_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k LIMIT 100",
    "d32_except" ->
      "SELECT n_nationkey AS k FROM nation EXCEPT SELECT c_nationkey AS k FROM customer ORDER BY k LIMIT 100",
    "d33_date_arithmetic" ->
      "SELECT o_orderkey FROM orders WHERE o_orderdate >= DATE '1995-06-01' - INTERVAL 30 DAY AND o_orderdate < DATE '1995-06-01' ORDER BY o_orderkey LIMIT 100",
    "d34_having" ->
      "SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey HAVING COUNT(*) > 5 ORDER BY o_custkey LIMIT 100",
    // --- multi-level aggregation (ROLLUP/CUBE/GROUPING SETS): one
    // Expand+HashAggregate pass per level set, partial+final on the
    // shuffle — never N separate scans. Group columns are non-null in
    // the data, so COALESCE sentinels make the subtotal rows
    // total-orderable identically on both engines (no NULLS FIRST/LAST
    // divergence). ---
    "d35_rollup" ->
      "SELECT COALESCE(o_orderpriority, 'ALL') AS pri, COALESCE(o_orderstatus, 'ALL') AS status, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus) ORDER BY pri, status LIMIT 100",
    "d36_cube" ->
      "SELECT COALESCE(l_returnflag, 'ALL') AS rf, COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS qty FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY rf, ls LIMIT 100",
    "d37_grouping_sets" ->
      "SELECT COALESCE(o_orderstatus, 'ALL') AS status, COALESCE(o_orderpriority, 'ALL') AS pri, COUNT(*) AS cnt FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) ORDER BY status, pri LIMIT 100",
    // --- distribution windows, partitioned BY NATION (thousands of
    // bounded partitions at scale, never a global sort): NTILE /
    // PERCENT_RANK / CUME_DIST share one WindowExec over one shuffle ---
    "d38_ntile" ->
      "SELECT c_custkey, c_nationkey, NTILE(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS quartile, ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey), 4) AS pr, ROUND(CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey), 4) AS cd FROM customer ORDER BY c_custkey LIMIT 200",
    // navigation window functions per customer partition (total order via
    // the key tiebreak; LAST_VALUE needs the full-frame extension)
    "d39_first_last" ->
      "SELECT o_custkey, o_orderkey, FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_price, LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price FROM orders ORDER BY o_custkey, o_orderkey LIMIT 200",
    // --- TPC-H-shaped classics (round 14) — the canonical OLAP
    // shapes, run VERBATIM through the full safety path in both
    // engines (dates adapted to the fixture's 1995-2001 range;
    // o_orderpriority stands in for the fixture-absent
    // o_shippriority). Q1: one wide scan-aggregate; Q3: selective
    // 3-way join + grouped top-k by revenue; Q5: 6-table snowflake
    // with the nation-colocation conjunct ---
    "d40_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty, " +
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, " +
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, " +
        "ROUND(AVG(l_quantity), 4) AS avg_qty, ROUND(AVG(l_extendedprice), 4) AS avg_price, " +
        "ROUND(AVG(l_discount), 4) AS avg_disc, CAST(COUNT(*) AS BIGINT) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "d41_tpch_q3" ->
      ("SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_odate, o_orderpriority " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00' " +
        "AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00' " +
        "GROUP BY l_orderkey, o_orderdate, o_orderpriority " +
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "d42_tpch_q5" ->
      ("SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY n_name ORDER BY n_name LIMIT 100"),
    // LATERAL correlated subquery (per-nation top-2 customers) and
    // GROUP BY ALL — both verbatim in Spark 4 and DuckDB
    "d43_lateral" ->
      ("SELECT n_name, t.c_name FROM nation, " +
        "LATERAL (SELECT c_name FROM customer WHERE c_nationkey = n_nationkey " +
        "ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t " +
        "ORDER BY n_name, c_name LIMIT 100"),
    "d44_group_by_all" ->
      ("SELECT c_mktsegment, c_nationkey, COUNT(*) AS n FROM customer " +
        "GROUP BY ALL ORDER BY c_mktsegment, c_nationkey LIMIT 200"),
    // --- TPC-H-shaped classics, round 15: the five distinctive
    // planner shapes the inventory still lacked, VERBATIM through the
    // full safety path in both engines. Fixture adaptations (the same
    // convention as Q1/Q3/Q5): dates moved into the 1995-2001 range;
    // the fixture-absent l_commitdate/l_receiptdate lateness becomes a
    // shipdate lateness; the fixture-absent partsupp association is
    // read off lineitem's (partkey, suppkey) pairs; comment-LIKE
    // filters become priority/name LIKEs. Shapes — the thing being
    // tested — are untouched. ---
    // Q4: EXISTS semi-join under a date window. Decorrelates via
    // RewritePredicateSubquery to a LeftSemi hash join on l_orderkey
    // with the lateness conjunct as a residual; the 3-month window
    // prunes orders before the join.
    "d45_tpch_q4" ->
      ("SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count " +
        "FROM orders o " +
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' " +
        "AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00' " +
        "AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey " +
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    // Q13: the outer-join aggregate — LEFT OUTER with a non-key ON
    // predicate so customers keep their row when every order is
    // filtered out, then the count-of-counts distribution. Inner
    // COUNT(col) over the null-extended side is the semantics under
    // test; both COUNTs cast to BIGINT (round-13 HUGEINT rule).
    "d46_tpch_q13" ->
      ("SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (" +
        "SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count " +
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey " +
        "AND o.o_orderpriority NOT LIKE '4%' " +
        "GROUP BY c.c_custkey) t " +
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC LIMIT 100"),
    // Q16: NOT IN anti join under COUNT(DISTINCT) — null-aware anti
    // (single non-null key, broadcast supplier side) feeding a
    // two-phase distinct aggregate; part-supplier pairs read off
    // lineitem per the fixture adaptation above.
    "d47_tpch_q16" ->
      ("SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%' " +
        "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) " +
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7') " +
        "GROUP BY p_brand, p_type, p_size " +
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100"),
    // Q18: IN over a grouped-HAVING subquery — the aggregate-filtered
    // semi join. The subquery re-aggregates lineitem by orderkey
    // (map-side partials) and the >300 HAVING makes the semi side tiny
    // and broadcastable; big-customer join on top.
    "d48_tpch_q18" ->
      ("SELECT c.c_name, c.c_custkey, o.o_orderkey, " +
        "CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_odate, o.o_totalprice, " +
        "ROUND(SUM(l.l_quantity), 2) AS total_qty " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem " +
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) " +
        "GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o_orderdate, o.o_totalprice " +
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100"),
    // Q21: the EXISTS / NOT EXISTS self-join pair — the hardest
    // decorrelation in the suite (LeftSemi + LeftAnti against the same
    // lineitem scan, each with a non-equi suppkey residual).
    // "Late" = shipped after the cutoff (fixture lateness stand-in).
    "d49_tpch_q21" ->
      ("SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait " +
        "FROM supplier s JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l1.l_orderkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_9' " +
        "AND l1.l_shipdate > TIMESTAMP '1999-06-01 00:00:00' " +
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
        "AND l2.l_suppkey <> l1.l_suppkey) " +
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > TIMESTAMP '1999-06-01 00:00:00') " +
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"),
    // --- TPC-H round 15b: the CORRELATED-SCALAR decorrelation family
    // (DecorrelateInnerQuery), the last planner territory the d-series
    // lacked. Same fixture-adaptation convention; FP-boundary safety
    // measured before landing: Q17/Q20 compare EXACT sums of integral
    // doubles; Q11's threshold margin is 1.7e-4 relative (drift
    // ~1e-15); Q22's nearest balance sits 1.13 from the scalar avg;
    // Q15's max-revenue winner is unique with a 1-2% gap. ---
    // Q2: min-cost supplier — correlated scalar MIN whose subquery
    // repeats the outer's 3-dim snowflake (lineitem stands in for
    // partsupp's supplycost association)
    "d50_tpch_q2" ->
      ("SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type " +
        "FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE' " +
        "AND l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2 " +
        "JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey " +
        "JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey " +
        "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
        "WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE') " +
        "ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey LIMIT 100"),
    // Q11: important stock — HAVING-style filter against a scalar
    // subquery over the SAME CTE (aggregate reused twice)
    "d51_tpch_q11" ->
      ("WITH v AS (SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS val " +
        "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "WHERE n.n_name = 'NATION_9' GROUP BY l_partkey) " +
        "SELECT l_partkey, ROUND(val, 2) AS value FROM v " +
        "WHERE val > (SELECT SUM(val) * 0.001 FROM v) " +
        "ORDER BY value DESC, l_partkey LIMIT 100"),
    // Q15: top supplier — CTE view joined AND probed by a scalar MAX
    "d52_tpch_q15" ->
      ("WITH revenue AS (SELECT l_suppkey AS supplier_no, " +
        "SUM(l_extendedprice * (1 - l_discount)) AS total_revenue " +
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00' GROUP BY l_suppkey) " +
        "SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue " +
        "FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no " +
        "WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue) " +
        "ORDER BY s.s_suppkey"),
    // Q17: small-quantity-order revenue — the canonical correlated
    // scalar AVG per outer key (quantity sums are integral doubles,
    // so the AVG is bit-identical on both engines)
    "d53_tpch_q17" ->
      ("SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE p.p_brand = 'Brand#3' AND p.p_type = 'PROMO' " +
        "AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2 " +
        "WHERE l2.l_partkey = l.l_partkey)"),
    // Q20: excess-stock suppliers — IN over a GROUPED subquery whose
    // HAVING holds a correlated scalar agg (the deepest nesting in the
    // suite: correlation from HAVING into a sibling aggregate)
    "d54_tpch_q20" ->
      ("SELECT s_name, s_suppkey FROM supplier WHERE s_suppkey IN (" +
        "SELECT l1.l_suppkey FROM lineitem l1 JOIN part p ON p.p_partkey = l1.l_partkey " +
        "WHERE p.p_name LIKE 'red%' " +
        "AND l1.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l1.l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY l1.l_suppkey, l1.l_partkey " +
        "HAVING SUM(l1.l_quantity) > (SELECT 0.5 * SUM(l2.l_quantity) FROM lineitem l2 " +
        "WHERE l2.l_partkey = l1.l_partkey " +
        "AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l2.l_shipdate < TIMESTAMP '1997-01-01 00:00:00')) " +
        "ORDER BY s_suppkey LIMIT 100"),
    // Q22: global-sales opportunity — uncorrelated scalar AVG + NOT
    // EXISTS anti join + derived-column grouping ("no BIG order"
    // replaces "no order": this fixture's customers all have orders)
    "d55_tpch_q22" ->
      ("SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, " +
        "ROUND(SUM(c_acctbal), 2) AS totacctbal " +
        "FROM (SELECT CAST(c_custkey % 7 AS STRING) AS cntrycode, c_acctbal, c_custkey " +
        "FROM customer " +
        "WHERE CAST(c_custkey % 7 AS STRING) IN ('1','2','3','4','5') " +
        "AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.00 " +
        "AND CAST(c_custkey % 7 AS STRING) IN ('1','2','3','4','5'))) c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 400000) " +
        "GROUP BY cntrycode ORDER BY cntrycode"),
    // --- TPC-H round 15c: the remaining eight shapes — with these,
    // ALL 22 TPC-H queries run verbatim through the full safety path
    // (fixture adaptations as before: l_shipmode → l_linestatus,
    // ps_supplycost → 0.5·p_retailprice, colors present in this
    // fixture's part names, nations/regions/dates in range). ---
    // Q6: the pure scan-aggregate forecast (no join at all)
    "d56_tpch_q6" ->
      ("SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    // Q7: volume shipping — the two-nation OR pair (symmetric
    // disjunction over a double nation join) + year extraction
    "d57_tpch_q7" ->
      ("SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue FROM (" +
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
        "CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year, " +
        "l_extendedprice * (1 - l_discount) AS volume " +
        "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey " +
        "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey " +
        "WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6') " +
        "OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')) " +
        "AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping " +
        "GROUP BY supp_nation, cust_nation, l_year " +
        "ORDER BY supp_nation, cust_nation, l_year"),
    // Q8: national market share — conditional share of a ratio over
    // the 7-table snowflake (the widest join in the suite)
    "d58_tpch_q8" ->
      ("SELECT o_year, ROUND(SUM(CASE WHEN nation = 'NATION_9' THEN volume ELSE 0 END) " +
        "/ SUM(volume), 4) AS mkt_share FROM (" +
        "SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year, " +
        "l_extendedprice * (1 - l_discount) AS volume, n2.n_name AS nation " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN customer c ON c.c_custkey = o.o_custkey " +
        "JOIN nation n1 ON c.c_nationkey = n1.n_nationkey " +
        "JOIN region r ON n1.n_regionkey = r.r_regionkey " +
        "JOIN nation n2 ON s.s_nationkey = n2.n_nationkey " +
        "WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO' " +
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00') x " +
        "GROUP BY o_year ORDER BY o_year"),
    // Q9: product-type profit (cost = 0.5·p_retailprice·qty stands in
    // for the fixture-absent ps_supplycost), name-LIKE part filter
    "d59_tpch_q9" ->
      ("SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit FROM (" +
        "SELECT n.n_name AS nation, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year, " +
        "l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity AS amount " +
        "FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey " +
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "JOIN nation n ON s.s_nationkey = n.n_nationkey " +
        "WHERE p.p_name LIKE '%red%') profit " +
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC LIMIT 200"),
    // Q10: returned-item ranking — grouped top-20 by revenue
    "d60_tpch_q10" ->
      ("SELECT c.c_custkey, c.c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "c.c_acctbal, n.n_name " +
        "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey " +
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00' " +
        "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' AND l.l_returnflag = 'R' " +
        "GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name " +
        "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    // Q12: late shipments by line status (l_shipmode is fixture-absent)
    // — dual conditional counts under a date-arithmetic join residual
    "d61_tpch_q12" ->
      ("SELECT l_linestatus, " +
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count " +
        "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey " +
        "WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY " +
        "AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' " +
        "AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00' " +
        "GROUP BY l_linestatus ORDER BY l_linestatus"),
    // Q14: promo revenue share — the CASE-ratio single-join aggregate
    "d62_tpch_q14" ->
      ("SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' " +
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / " +
        "SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue " +
        "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey " +
        "WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00' " +
        "AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"),
    // Q19: discounted revenue — the OR-of-ANDs disjunctive predicate
    // spanning BOTH join sides (the planner must keep the equi-key
    // conjunct joinable and evaluate the disjunction as a residual,
    // never degrade to a cartesian)
    "d63_tpch_q19" ->
      ("SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey " +
        "WHERE (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11) " +
        "OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20) " +
        "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)"),
    // --- recursive CTE (Spark 4 / SQL:1999), round 15: the iterative
    // SQL surface — a recursive series seed joined back to the corpus,
    // verbatim on both engines. Safety posture scouted first
    // (ProbeRecursiveCte): the allow-list sees through the recursive
    // body, and runaway recursion fails loud at the engine's level
    // limit (RECURSION_LEVEL_LIMIT_EXCEEDED at 100) — pinned in
    // ValidatorSpec. ---
    "d64_recursive_cte" ->
      ("WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 24) " +
        "SELECT s.n, CAST(COUNT(c.c_custkey) AS BIGINT) AS cnt " +
        "FROM seq s LEFT JOIN customer c ON c.c_nationkey = s.n " +
        "GROUP BY s.n ORDER BY s.n"),
    // --- profiler queries (§2.1, §2.4 A6-A8/S5) ---
    "d21_profile_domain" ->
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus LIMIT 100",
    "d22_profile_stats" ->
      "SELECT ROUND(MIN(l_quantity), 2) AS mn, ROUND(MAX(l_quantity), 2) AS mx, ROUND(AVG(l_quantity), 4) AS av FROM lineitem WHERE l_quantity IS NOT NULL",
    "d23_profile_count" ->
      "SELECT COUNT(*) AS cnt FROM lineitem")

  val byName: Map[String, String] = sql.toMap

  /** DuckDB replica of TextAnalysis.langId: distinct-stopword-hit argmax,
    * ties to the first alphabetical language, zero hits → 'und'. Generated
    * from the same stopword lists (single source of truth). */
  private def langCaseSql: (String, String) = {
    val stop = graft.operators.TextAnalysis.stopwords
    val langs = stop.keys.toSeq.sorted
    val hitCols = langs.map { l =>
      val lst = stop(l).map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_intersect(t, $lst)) AS h_$l"
    }.mkString(", ")
    val mh = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
    val cases = langs.map(l => s"WHEN h_$l = mh THEN '$l'").mkString(" ")
    (hitCols, s"CASE WHEN mh <= 0 THEN 'und' $cases END")
  }

  /** Shared CTE chain: documents → distinct word-3-gram shingle lists →
    * inverted-index postings → candidate pairs with intersection counts
    * (DuckDB replica of WordShingles + Dedup.ngramJaccardPairs).
    * `docFilter` (e.g. " WHERE doc_id IN (…)") restricts the doc set. */
  /** DuckDB expression for the 48-bit integer held in `md5(doc_id)`'s
    * hex digits [from, from+12) — the x_dsir strpos-digit ladder,
    * mirroring Spark's `conv(substring(md5(...), from, 12), 16, 10)`.
    * All terms are exact BIGINT arithmetic (max 15·16¹¹ < 2⁴⁸). */
  private def md5KeySql(from: Int): String =
    (0 until 12).map { j =>
      val pos = from + j
      val pw = 1L << (4 * (11 - j)) // 16^(11-j)
      s"(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR))[$pos:$pos]) - 1) * $pw"
    }.mkString("(", " + ", ")")

  private def jaccardPairsCte(docFilter: String = ""): String =
    s"words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents$docFilter), " +
      // empty/whitespace-only text splits to [''] in DuckDB — map it to NO
      // spans (the Spark side's shingles() nulls there, coalesced to []),
      // so empty docs carry zero postings on both engines
      "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) = 1 AND w[1] = '' THEN CAST([] AS VARCHAR[]) " +
      "WHEN len(w) <= 3 THEN [array_to_string(w, ' ')] " +
      "ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS s FROM words), " +
      "postings AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh), " +
      "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS inter " +
      "FROM postings a JOIN postings b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4)"

  /** CTE chain replicating Pipelines.qualityFilter's gates: the scored
    * text-analysis projection (same arithmetic as x_text_analyze) ending
    * in `qkept` = doc_ids passing lang='en' / quality≥0.3 / token band. */
  private def qualityCtes: String = {
    val (hitCols, caseSql) = langCaseSql
    "base AS (SELECT doc_id, text, " +
      "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens, " +
      "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio_raw, " +
      "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio_raw, " +
      "list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents), " +
      "awl AS (SELECT *, CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_tokens END AS awl_raw FROM base), " +
      s"h AS (SELECT *, $hitCols FROM awl), " +
      "m AS (SELECT *, " + graft.operators.TextAnalysis.stopwords.keys.toSeq.sorted.map(l => s"h_$l").mkString("greatest(", ", ", ")") + " AS mh FROM h), " +
      "scored AS (SELECT doc_id, n_tokens, " +
      s"$caseSql AS lang_pred, " +
      "round(greatest(0.0, least(1.0, least(length(text) / 500.0, 1.0) * 0.4 " +
      "+ least(n_tokens / 100.0, 1.0) * 0.3 " +
      "+ CASE WHEN awl_raw >= 3 AND awl_raw <= 10 THEN 0.3 ELSE 0.1 END " +
      "- (punct_ratio_raw + digit_ratio_raw) * 0.5)), 4) AS quality FROM m), " +
      "qkept AS (SELECT doc_id FROM scored WHERE lang_pred = 'en' AND quality >= 0.3 " +
      "AND n_tokens BETWEEN 5 AND 100000)"
  }

  /** Exact word-3-gram Jaccard pairs ≥ threshold — the gold standard the
    * LSH dedup operators are graded against. */
  private def jaccardGoldSql(threshold: Double): String =
    s"WITH ${jaccardPairsCte()} " +
      "SELECT id_a, id_b, ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
      s"FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $threshold ORDER BY id_a, id_b LIMIT 100"

  /** Dialect-specific oracles for extension operators whose Spark side is
    * DataFrame code (names must match the Spark result's columns). */
  private val decontamOracle: String =
    "WITH words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')] " +
      "ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS s FROM words), " +
      "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 97 = 0), " +
      "contaminated AS (SELECT p.doc_id FROM (SELECT doc_id, unnest(s) AS shingle FROM sh) p " +
      "JOIN ev USING (shingle) GROUP BY p.doc_id HAVING COUNT(*) >= 5) " +
      "SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM contaminated) " +
      "ORDER BY doc_id LIMIT 2000"

  /** Frozen `now` for the relative-date contract (x_relative_date): one
    * day after the events fixture's last day (2024-01-30), so "last 10
    * days" selects a proper nonempty subset at every SF. */
  private[graft] val frozenNow: java.time.LocalDate = java.time.LocalDate.of(2024, 1, 31)

  /** x_fk_infer planted pairs: the 7 declared FK edges (must infer),
    * one reversal (parent side not unique) and one disjoint key space
    * (containment fails). Shared by the Spark query and the DuckDB
    * oracle generator so both sides always check the same pairs. */
  private[graft] val FkCheckedPairs: Seq[(String, String, String, String)] = Seq(
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("nation", "n_nationkey", "region", "r_regionkey"))

  /** Shared CTE for the CDC oracles — the DuckDB replica of
    * `ExtensionQueries.ordersChangelog`. */
  private val cdcChangelogCte =
    "SELECT o_orderkey % 997 AS k, CAST(o_orderkey AS BIGINT) AS ver, " +
      "CASE WHEN o_orderkey % 11 = 0 THEN 'D' ELSE 'U' END AS op, " +
      "CAST(o_totalprice AS DOUBLE) AS val FROM orders"

  val extensionOracles: Map[String, String] = Map(
    // --- document path (DuckDB replicas of the askDocs envelopes; the
    //     JSON fixture is a pure column rename of customer, so the
    //     oracle reads the parquet table directly) ---
    // the _id tiebreak mirrors DocSource.find's deterministic-window
    // rule (balance ties at the LIMIT boundary must not pick
    // engine-dependent rows)
    "x_docs_find" ->
      ("SELECT c_custkey AS _id, c_acctbal AS balance, c_mktsegment AS segment " +
        "FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "ORDER BY c_acctbal DESC, _id LIMIT 5"),
    "x_docs_agg" ->
      ("SELECT c_mktsegment AS _id, ROUND(avg(c_acctbal), 4) AS agg_value " +
        "FROM customer WHERE c_acctbal > 0 GROUP BY 1 ORDER BY 1"),
    // the nested struct column arrives as the envelope's JSON string —
    // replicated byte-for-byte by string concatenation
    "x_docs_nested" ->
      ("SELECT c_custkey AS _id, c_acctbal AS balance, " +
        "'{\"nation\":' || CAST(c_nationkey AS BIGINT) || '}' AS contact, " +
        "c_name AS name, c_mktsegment AS segment " +
        "FROM customer WHERE c_acctbal > 9990 ORDER BY c_custkey"),
    // expectations audit replica: the same five violation fractions as
    // conditional aggregates over one scan, one report row per check
    "x_audit" ->
      ("WITH t AS (SELECT COUNT(*) AS total, " +
        "SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS v_nn, " +
        "COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uq, " +
        "SUM(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0 OR o_totalprice > 300000) THEN 1 ELSE 0 END) AS v_ir, " +
        "SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS v_is, " +
        "SUM(CASE WHEN o_orderpriority IS NOT NULL AND NOT regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 ELSE 0 END) AS v_re " +
        "FROM orders) " +
        "SELECT * FROM (" +
        "SELECT 'in_range' AS \"check\", 'o_totalprice' AS col_name, ROUND(v_ir*1.0/total, 6) AS observed, 0.0 AS threshold, v_ir*1.0/total <= 0.0 AS pass FROM t " +
        "UNION ALL SELECT 'in_set', 'o_orderstatus', ROUND(v_is*1.0/total, 6), 0.0, v_is*1.0/total <= 0.0 FROM t " +
        "UNION ALL SELECT 'matches_regex', 'o_orderpriority', ROUND(v_re*1.0/total, 6), 0.0, v_re*1.0/total <= 0.0 FROM t " +
        "UNION ALL SELECT 'not_null', 'o_orderpriority', ROUND(v_nn*1.0/total, 6), 0.0, v_nn*1.0/total <= 0.0 FROM t " +
        "UNION ALL SELECT 'unique', 'o_orderkey', ROUND(v_uq*1.0/total, 6), 0.0, v_uq*1.0/total <= 0.0 FROM t" +
        ") x ORDER BY \"check\", col_name"),
    // compaction-plan replica: identical running-sum bin assignment
    "x_file_pruning" ->
      ("WITH f AS (SELECT CAST(FLOOR(l_partkey / 53.0) AS BIGINT) AS file_id, " +
        "MIN(CAST(l_partkey AS DOUBLE)) AS pk_min, " +
        "MAX(CAST(l_partkey AS DOUBLE)) AS pk_max FROM lineitem GROUP BY 1) " +
        "SELECT file_id, pk_min, pk_max FROM f " +
        "WHERE (pk_max IS NULL OR pk_max >= 500) AND (pk_min IS NULL OR pk_min <= 1200) " +
        "ORDER BY file_id"),
    "x_compaction_plan" ->
      ("WITH f AS (SELECT o_orderkey % 499 AS file_id, " +
        "CAST(SUM(o_orderkey % 1000) AS BIGINT) AS bytes FROM orders " +
        "GROUP BY 1), " +
        "c AS (SELECT file_id, bytes, SUM(bytes) OVER " +
        "(ORDER BY bytes DESC, file_id ROWS UNBOUNDED PRECEDING) AS cum " +
        "FROM f) " +
        "SELECT file_id, bytes, CAST(FLOOR((cum - bytes) / " +
        "CAST(100000 AS DOUBLE)) AS BIGINT) AS bin FROM c ORDER BY file_id"),
    // host-graph PageRank replica: the same edges via the shared URL
    // augmentation, 3 unrolled power iterations with dangling-mass
    // redistribution; every constant CAST to DOUBLE so the arithmetic
    // is the same IEEE ops as the Spark side (then ROUND 6)
    "x_pagerank" -> {
      val base =
        "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN text || ' see https://www.site' || (doc_id % 20) || " +
          "'.example.org/p/' || doc_id || ' and http://cdn' || (doc_id % 7) || '.example.net' ELSE text END AS text FROM documents), " +
          s"u AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlPattern}')) AS url FROM aug), " +
          "h AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM u), " +
          "e AS (SELECT DISTINCT s.host AS src, t.host AS dst FROM h s JOIN h t ON s.doc_id = t.doc_id " +
          "WHERE s.host LIKE 'www.site%' AND t.host LIKE 'cdn%'), " +
          "nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
          "c0 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nd), " +
          "od AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src), " +
          "p0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT nn FROM c0) AS pr FROM nd)"
      val iters = (1 to 3).map { i =>
        val p = s"p${i - 1}"
        s"w$i AS (SELECT e.dst AS node, SUM(p.pr / od.deg) AS w FROM e JOIN $p p ON p.node = e.src " +
          "JOIN od ON od.src = e.src GROUP BY e.dst), " +
          s"d$i AS (SELECT COALESCE(SUM(p.pr), CAST(0 AS DOUBLE)) AS dang FROM $p p " +
          "LEFT JOIN od ON od.src = p.node WHERE od.src IS NULL), " +
          s"p$i AS (SELECT nd.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn FROM c0) + " +
          s"CAST(0.85 AS DOUBLE) * (COALESCE(w$i.w, CAST(0 AS DOUBLE)) + (SELECT dang FROM d$i) / (SELECT nn FROM c0)) AS pr " +
          s"FROM nd LEFT JOIN w$i ON w$i.node = nd.node)"
      }.mkString(", ", ", ", " ")
      // ROUND at 4 decimals, not 6: double SUM accumulation order is
      // engine- and partitioning-dependent (~1e-15 relative drift), and
      // a coarser grid keeps that drift far from any rounding boundary
      base + iters + "SELECT node, ROUND(pr, 4) AS pr FROM p3 ORDER BY node"
    },
    // co-occurrence replica over the same (user, day) baskets
    "x_cooccurrence" ->
      ("WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type AS t FROM events), " +
        "nb AS (SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, d FROM b)), " +
        "pt AS (SELECT t, COUNT(*) AS n1 FROM b GROUP BY 1), " +
        "pr AS (SELECT b1.t AS type_a, b2.t AS type_b, COUNT(*) AS n_both FROM b b1 " +
        "JOIN b b2 ON b1.user_id = b2.user_id AND b1.d = b2.d AND b1.t < b2.t GROUP BY 1, 2) " +
        "SELECT pr.type_a, pr.type_b, pr.n_both, " +
        "round(pr.n_both / (SELECT CAST(n AS DOUBLE) FROM nb), 6) AS support, " +
        "round(CAST(pr.n_both AS DOUBLE) / pa.n1, 6) AS confidence, " +
        "round((CAST(pr.n_both AS DOUBLE) / pa.n1) / (pb.n1 / (SELECT CAST(n AS DOUBLE) FROM nb)), 6) AS lift " +
        "FROM pr JOIN pt pa ON pa.t = pr.type_a JOIN pt pb ON pb.t = pr.type_b " +
        "ORDER BY type_a, type_b"),
    // KS replica: per-value integer counts, cumulative fractions at
    // every distinct value, sup of the absolute gap
    "x_ks_drift" ->
      ("WITH u AS (SELECT value, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS sa, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS sb " +
        "FROM events WHERE event_type IN ('view', 'purchase')), " +
        "c AS (SELECT value, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(sb) AS BIGINT) AS cb FROM u GROUP BY value), " +
        "cum AS (SELECT value, SUM(ca) OVER (ORDER BY value) AS cca, SUM(cb) OVER (ORDER BY value) AS ccb FROM c), " +
        "n AS (SELECT CAST(SUM(sa) AS DOUBLE) AS na, CAST(SUM(sb) AS DOUBLE) AS nb FROM u) " +
        "SELECT ROUND(MAX(ABS(cca / na - ccb / nb)), 6) AS ks FROM cum, n"),
    // rank-sum replica: tied blocks take the average combined rank
    "x_mann_whitney" ->
      ("WITH u AS (SELECT value AS v, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS sa, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS sb " +
        "FROM events WHERE event_type IN ('view', 'purchase')), " +
        "c AS (SELECT v, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(sb) AS BIGINT) AS cb FROM u GROUP BY v), " +
        "cum AS (SELECT ca, CAST(COALESCE(SUM(ca + cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE) " +
        "+ CAST(ca + cb + 1 AS DOUBLE) / 2.0 AS avgrank FROM c), " +
        "n AS (SELECT CAST(SUM(sa) AS DOUBLE) AS na, CAST(SUM(sb) AS DOUBLE) AS nb FROM u), " +
        "ra AS (SELECT SUM(CAST(ca AS DOUBLE) * avgrank) AS ra FROM cum) " +
        "SELECT ROUND(ra - na * (na + 1) / 2.0, 2) AS u_a, " +
        "ROUND((ra - na * (na + 1) / 2.0) / (na * nb), 6) AS rho FROM ra, n"),
    // W1 replica: CDF gap at each distinct value × span to the next
    // (global LEAD; the last value spans nothing)
    "x_w1_drift" ->
      ("WITH u AS (SELECT CAST(value AS DOUBLE) AS v, CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS sa, " +
        "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS sb " +
        "FROM events WHERE event_type IN ('view', 'purchase')), " +
        "c AS (SELECT v, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(sb) AS BIGINT) AS cb FROM u GROUP BY v), " +
        "cum AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS cca, SUM(cb) OVER (ORDER BY v) AS ccb, " +
        "LEAD(v) OVER (ORDER BY v) AS nxt FROM c), " +
        "n AS (SELECT CAST(SUM(sa) AS DOUBLE) AS na, CAST(SUM(sb) AS DOUBLE) AS nb FROM u) " +
        "SELECT ROUND(SUM(ABS(cca / na - ccb / nb) * (COALESCE(nxt, v) - v)), 4) AS w1 FROM cum, n"),
    // PSI replica: identical fixed-width buckets, 1e-6 floor, ln fold
    "x_psi_drift" ->
      ("WITH r0 AS (SELECT event_type, LEAST(9, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bucket " +
        "FROM events WHERE date_part('day', ts) <= 15), " +
        "c0 AS (SELECT event_type, LEAST(9, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bucket " +
        "FROM events WHERE date_part('day', ts) >= 16), " +
        "r AS (SELECT event_type, bucket, COUNT(*) AS nr FROM r0 GROUP BY 1, 2), " +
        "c AS (SELECT event_type, bucket, COUNT(*) AS nc FROM c0 GROUP BY 1, 2), " +
        "tr AS (SELECT event_type, SUM(nr) AS t FROM r GROUP BY 1), " +
        "tc AS (SELECT event_type, SUM(nc) AS t FROM c GROUP BY 1), " +
        "f AS (SELECT COALESCE(r.event_type, c.event_type) AS event_type, " +
        "COALESCE(r.bucket, c.bucket) AS bucket, COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc " +
        "FROM r FULL OUTER JOIN c ON r.event_type = c.event_type AND r.bucket = c.bucket), " +
        "p AS (SELECT f.event_type, GREATEST(COALESCE(CAST(nr AS DOUBLE) / tr.t, 0.0), 0.000001) AS pr, " +
        "GREATEST(COALESCE(CAST(nc AS DOUBLE) / tc.t, 0.0), 0.000001) AS pc " +
        "FROM f LEFT JOIN tr USING (event_type) LEFT JOIN tc USING (event_type)) " +
        "SELECT event_type, round(SUM((pc - pr) * ln(pc / pr)), 6) AS psi, COUNT(*) AS n_cells, " +
        "CASE WHEN SUM((pc - pr) * ln(pc / pr)) < 0.1 THEN 'stable' " +
        "WHEN SUM((pc - pr) * ln(pc / pr)) < 0.25 THEN 'moderate' ELSE 'shifted' END AS verdict " +
        "FROM p GROUP BY event_type ORDER BY event_type"),
    // A/B replica: pure-integer hashed surface — counts plus micro-unit
    // rates/lift via exact half-up integer division. The z statistic is
    // a report column (division + sqrt has no 64-bit closed form) and
    // is NOT on the hashed surface; ExperimentsSpec pins it with a
    // tolerance. Integers hash identically under every engine version
    // (round-12 verdict #1 — the r11/r12 reds were the double z).
    "x_ab_test" ->
      ("WITH u AS (SELECT user_id, user_id % 2 AS v, " +
        "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np FROM events GROUP BY 1, 2), " +
        "c AS (SELECT v, CASE WHEN np >= 14 THEN 1 ELSE 0 END AS cv FROM u), " +
        "s AS (SELECT SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a, " +
        "SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b, " +
        "SUM(CASE WHEN v = 0 THEN cv ELSE 0 END) AS c_a, " +
        "SUM(CASE WHEN v = 1 THEN cv ELSE 0 END) AS c_b FROM c) " +
        "SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, " +
        "CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b, " +
        "CAST(CASE WHEN n_a > 0 THEN (2 * c_a * 1000000 + n_a) // (2 * n_a) ELSE 0 END AS BIGINT) AS rate_a_micro, " +
        "CAST(CASE WHEN n_b > 0 THEN (2 * c_b * 1000000 + n_b) // (2 * n_b) ELSE 0 END AS BIGINT) AS rate_b_micro, " +
        "CAST(CASE WHEN n_b > 0 THEN (2 * c_b * 1000000 + n_b) // (2 * n_b) ELSE 0 END " +
        "- CASE WHEN n_a > 0 THEN (2 * c_a * 1000000 + n_a) // (2 * n_a) ELSE 0 END AS BIGINT) AS lift_micro FROM s"),
    // JSON-props replica by an INDEPENDENT extraction method (regex,
    // not a JSON parser) — same typed aggregate must come out
    // unpivot/melt replica: DuckDB's UNPIVOT over the same projection
    "x_unpivot" ->
      ("SELECT c_custkey, name, ROUND(CAST(val AS DOUBLE), 2) AS val FROM " +
        "(UNPIVOT (SELECT c_custkey, c_acctbal AS bal, CAST(c_nationkey AS DOUBLE) AS nk FROM customer) " +
        "ON bal, nk INTO NAME name VALUE val) ORDER BY c_custkey, name LIMIT 1000"),
    // VARIANT replica: typed path extraction, missing path is NULL
    // pipe-syntax replica: classic SQL form of the same aggregate
    "x_pipe_syntax" ->
      ("SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
        "ROUND(SUM(l_extendedprice), 2) AS rev FROM lineitem " +
        "WHERE l_quantity > 45 GROUP BY l_returnflag " +
        "ORDER BY l_returnflag LIMIT 100"),
    "x_variant_props" ->
      ("SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k, " +
        "CAST(json_extract(props, '$.zz') AS BIGINT) AS k_missing " +
        "FROM events ORDER BY event_id LIMIT 1000"),
    "x_json_props" ->
      ("WITH p AS (SELECT event_type, CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT) AS k FROM events) " +
        "SELECT event_type, COUNT(k) AS n, COUNT(DISTINCT k) AS n_distinct, " +
        "round(AVG(k), 4) AS avg_k, MIN(k) AS min_k, MAX(k) AS max_k " +
        "FROM p GROUP BY event_type ORDER BY event_type"),
    // referential audit replica: planted-orphan counts + rate
    "x_fk_orphans" ->
      ("WITH p AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0), " +
        "c AS (SELECT l_orderkey FROM lineitem), " +
        "o AS (SELECT COUNT(*) AS n_orphans FROM c LEFT JOIN p ON c.l_orderkey = p.o_orderkey " +
        "WHERE c.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL) " +
        "SELECT (SELECT COUNT(*) FROM c) AS n_child, " +
        "(SELECT COUNT(*) FROM c WHERE l_orderkey IS NULL) AS n_null_fk, " +
        "o.n_orphans, " +
        "round(CAST(o.n_orphans AS DOUBLE) / (SELECT COUNT(*) FROM c), 6) AS orphan_rate, " +
        "CAST(o.n_orphans AS DOUBLE) / (SELECT COUNT(*) FROM c) <= 0.0 AS pass FROM o"),
    // k-anonymity replica: class sizes from a plain GROUP BY, gate
    // report as conditional aggregates over the class frame
    "x_k_anonymity" ->
      ("WITH c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size " +
        "FROM customer GROUP BY 1, 2) " +
        "SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows, COUNT(*) AS n_classes, " +
        "CAST(MIN(class_size) AS BIGINT) AS anonymity_k, " +
        "CAST(SUM(CASE WHEN class_size < 8 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes, " +
        "CAST(SUM(CASE WHEN class_size < 8 THEN class_size ELSE 0 END) AS BIGINT) AS exposed_rows, " +
        "ROUND(CAST(SUM(CASE WHEN class_size < 8 THEN class_size ELSE 0 END) AS DOUBLE) / SUM(class_size), 6) AS exposed_rate, " +
        "MIN(class_size) >= 8 AS pass FROM c"),
    // l-diversity replica: distinct banded balances per class, HAVING
    // below the diversity floor
    "x_l_diversity" ->
      ("WITH b AS (SELECT c_nationkey, c_mktsegment, " +
        "CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band FROM customer) " +
        "SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size, " +
        "COUNT(DISTINCT bal_band) AS distinct_sensitive " +
        "FROM b GROUP BY 1, 2 HAVING COUNT(DISTINCT bal_band) < 4 " +
        "ORDER BY c_nationkey, c_mktsegment"),
    // suppression replica: keep only classes >= k, re-audit — the gate
    // must pass with zero exposure by construction
    "x_k_suppress" ->
      ("WITH c AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size " +
        "FROM customer GROUP BY 1, 2), " +
        "k AS (SELECT * FROM c WHERE class_size >= 8) " +
        "SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows, COUNT(*) AS n_classes, " +
        "CAST(MIN(class_size) AS BIGINT) AS anonymity_k, " +
        "CAST(SUM(CASE WHEN class_size < 8 THEN 1 ELSE 0 END) AS BIGINT) AS violating_classes, " +
        "CAST(SUM(CASE WHEN class_size < 8 THEN class_size ELSE 0 END) AS BIGINT) AS exposed_rows, " +
        "ROUND(CAST(SUM(CASE WHEN class_size < 8 THEN class_size ELSE 0 END) AS DOUBLE) / SUM(class_size), 6) AS exposed_rate, " +
        "MIN(class_size) >= 8 AS pass FROM k"),
    // t-closeness replica: exact-integer TVD numerator per class —
    // Σ_v |c_gv·N − c_v·n_g| with the absent-value tail folded in as
    // n_g·(N − Σ_present c_v); gate by cross-multiplied integers
    // (t = 1/10), so the hashed surface is BIGINT/BOOLEAN only
    "x_t_closeness" ->
      ("WITH b AS (SELECT c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS v FROM customer), " +
        "cgv AS (SELECT c_nationkey, c_mktsegment, v, COUNT(*) AS c_gv FROM b GROUP BY 1, 2, 3), " +
        "cg AS (SELECT *, SUM(c_gv) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n_g FROM cgv), " +
        "g AS (SELECT v, COUNT(*) AS c_v FROM b GROUP BY 1), " +
        "tot AS (SELECT COUNT(*) AS n FROM b), " +
        "j AS (SELECT cg.*, g.c_v, t.n FROM cg JOIN g ON cg.v IS NOT DISTINCT FROM g.v CROSS JOIN tot t), " +
        "per AS (SELECT c_nationkey, c_mktsegment, MAX(n_g) AS n_g, MAX(n) AS n, " +
        "SUM(ABS(c_gv * n - c_v * n_g)) AS a, SUM(c_v) AS cpres FROM j GROUP BY 1, 2) " +
        "SELECT c_nationkey, c_mktsegment, CAST(n_g AS BIGINT) AS class_size, " +
        "CAST(a + n_g * (n - cpres) AS BIGINT) AS tvd_num, " +
        "(a + n_g * (n - cpres)) * 10 > 2 * n_g * n AS violating " +
        "FROM per ORDER BY c_nationkey, c_mktsegment"),
    // ordered t-closeness replica: per-class EMD numerator — running
    // sum of (c_gv·N − c_v·n_g) over the ordered domain grid (the
    // cumulative telescopes to 0 at v_m, so summing |cum| over the
    // whole domain equals the i<m definition); gate t = 1/20
    "x_t_closeness_emd" ->
      ("WITH b AS (SELECT c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS v FROM customer WHERE c_acctbal IS NOT NULL), " +
        "cgv AS (SELECT c_nationkey, c_mktsegment, v, COUNT(*) AS c_gv FROM b GROUP BY 1, 2, 3), " +
        "cls AS (SELECT c_nationkey, c_mktsegment, SUM(c_gv) AS n_g FROM cgv GROUP BY 1, 2), " +
        "g AS (SELECT v, COUNT(*) AS c_v FROM b GROUP BY 1), " +
        "tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT v) AS m FROM b), " +
        "grid AS (SELECT cls.*, g.v, g.c_v, t.n, t.m FROM cls CROSS JOIN g CROSS JOIN tot t), " +
        "d AS (SELECT grid.*, COALESCE(cgv.c_gv, 0) * grid.n - grid.c_v * grid.n_g AS diff " +
        "FROM grid LEFT JOIN cgv ON grid.c_nationkey = cgv.c_nationkey AND grid.c_mktsegment = cgv.c_mktsegment AND grid.v = cgv.v), " +
        "c AS (SELECT *, SUM(diff) OVER (PARTITION BY c_nationkey, c_mktsegment ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM d), " +
        "per AS (SELECT c_nationkey, c_mktsegment, MAX(n_g) AS n_g, MAX(n) AS n, MAX(m) AS m, SUM(ABS(cum)) AS emd_num FROM c GROUP BY 1, 2) " +
        "SELECT c_nationkey, c_mktsegment, CAST(n_g AS BIGINT) AS class_size, " +
        "CAST(emd_num AS BIGINT) AS emd_num, " +
        "emd_num * 20 > n_g * n * (m - 1) AS violating " +
        "FROM per ORDER BY c_nationkey, c_mktsegment"),
    // stream-stream interval join replica: the batch interval join —
    // inner-join emission makes the bounded streaming replay equal it
    "x_stream_join" ->
      ("SELECT v.user_id, v.event_id AS view_id, p.event_id AS buy_id, " +
        "CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS lag_us " +
        "FROM events v JOIN events p ON v.user_id = p.user_id " +
        "AND v.event_type = 'view' AND p.event_type = 'purchase' " +
        "AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE " +
        "ORDER BY view_id, buy_id"),
    // left-outer replica: unmatched views carry NULL buy_id/lag_us —
    // the streaming side emits exactly these rows when the sentinel
    // watermark closes their windows. Type filters live in the
    // subqueries (an ON-side filter would change LEFT JOIN semantics).
    "x_stream_join_outer" ->
      ("SELECT v.user_id, v.event_id AS view_id, p.event_id AS buy_id, " +
        "CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS lag_us " +
        "FROM (SELECT * FROM events WHERE event_type = 'view' AND user_id < 100) v " +
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 100) p " +
        "ON v.user_id = p.user_id " +
        "AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE " +
        "ORDER BY view_id, buy_id"),
    // timer-sessionizer replica: gaps-and-islands with the PROCESSOR's
    // exact semantics — epoch-millisecond gaps, split strictly > 30min
    "x_tws_sessions" ->
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value FROM events WHERE user_id < 300), " +
        "f AS (SELECT *, CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) > 1800000 " +
        "THEN 1 ELSE 0 END AS brk FROM e), " +
        "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid FROM f) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "ROUND(SUM(value), 2) AS session_value, " +
        "CAST(MIN(tms) AS BIGINT) AS start_ms, CAST(MAX(tms) AS BIGINT) AS end_ms " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms LIMIT 2000"),
    // batch-backfill sessionization: the SAME gaps-and-islands replica
    // as x_tws_sessions, verbatim — batch ≡ streaming ≡ oracle, the
    // kappa/lambda overlap agreement
    "x_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_ms(ts) AS tms, value FROM events WHERE user_id < 300), " +
        "f AS (SELECT *, CASE WHEN tms - LAG(tms) OVER (PARTITION BY user_id ORDER BY tms) > 1800000 " +
        "THEN 1 ELSE 0 END AS brk FROM e), " +
        "g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tms ROWS UNBOUNDED PRECEDING) AS sid FROM f) " +
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, " +
        "ROUND(SUM(value), 2) AS session_value, " +
        "CAST(MIN(tms) AS BIGINT) AS start_ms, CAST(MAX(tms) AS BIGINT) AS end_ms " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, start_ms LIMIT 2000"),
    // transformWithState totals replica: the single-batch update-mode
    // emission is exactly the final per-user state = the batch GROUP BY
    "x_tws_totals" ->
      ("SELECT user_id, CAST(COUNT(*) AS BIGINT) AS events, " +
        "ROUND(SUM(value), 2) AS total_value FROM events " +
        "GROUP BY user_id ORDER BY user_id"),
    // bootstrap replica: snapshot(first half) + stream(second half)
    // must equal the batch GROUP BY over the WHOLE log, restricted to
    // users the stream touched (update mode emits only on input rows)
    "x_tws_bootstrap" ->
      ("SELECT user_id, CAST(COUNT(*) AS BIGINT) AS events, " +
        "ROUND(SUM(value), 2) AS total_value FROM events " +
        "WHERE user_id IN (SELECT DISTINCT user_id FROM events " +
        "WHERE date_part('day', ts) >= 16) " +
        "GROUP BY user_id ORDER BY user_id"),
    // transformWithState top-k replica: single-batch update-mode
    // emission = batch per-user type ranks (count DESC, type ASC) plus
    // the 20-newest recency buffer by (epoch_ms, event_id) — min/max
    // over the buffer are order-independent, so no rounding needed
    "x_tws_topk" ->
      ("WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events " +
        "FROM events GROUP BY 1, 2), " +
        "r AS (SELECT user_id, event_type, n_events, " +
        "CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC, event_type) AS INT) AS rank FROM c), " +
        "rec AS (SELECT user_id, value, ROW_NUMBER() OVER " +
        "(PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn FROM events), " +
        "ra AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS recent_n, " +
        "MIN(value) AS recent_min, MAX(value) AS recent_max FROM rec WHERE rn <= 20 GROUP BY 1) " +
        "SELECT r.user_id, r.rank, r.event_type, r.n_events, " +
        "ra.recent_n, ra.recent_min, ra.recent_max " +
        "FROM r JOIN ra ON r.user_id = ra.user_id " +
        "WHERE r.rank <= 3 ORDER BY r.user_id, r.rank"),
    // triangle census by independent id-ordered enumeration (the
    // Spark side orients by degree — same exact count either way)
    // BFS min-depth replica: depth-capped recursive walk with
    // UNION-DISTINCT semantics (bounded (node, depth) state — a
    // UNION ALL walk would blow up exponentially on this cyclic
    // graph), MIN(depth) per node = the BFS level
    "x_graph_reach" ->
      ("WITH RECURSIVE raw AS (SELECT doc_id % 31 AS src, (doc_id * 7 + 3) % 31 AS dst FROM documents " +
        "UNION ALL SELECT doc_id % 31, (doc_id * 13 + 5) % 31 FROM documents " +
        "UNION ALL SELECT doc_id % 31, (doc_id * 3 + 11) % 31 FROM documents), " +
        "e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst), " +
        "r(node, depth) AS (SELECT CAST(0 AS BIGINT) AS node, 0 AS depth " +
        "UNION SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node WHERE r.depth < 10) " +
        "SELECT node, CAST(MIN(depth) AS INT) AS depth FROM r GROUP BY node ORDER BY node"),
    "x_triangles" ->
      ("WITH raw AS (SELECT doc_id % 31 AS x, (doc_id * 7 + 3) % 31 AS y FROM documents " +
        "UNION ALL SELECT doc_id % 31, (doc_id * 13 + 5) % 31 FROM documents " +
        "UNION ALL SELECT doc_id % 31, (doc_id * 3 + 11) % 31 FROM documents), " +
        "und AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b FROM raw WHERE x <> y), " +
        "nd AS (SELECT a AS node FROM und UNION SELECT b FROM und), " +
        "dg AS (SELECT node, COUNT(*) AS deg FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY 1), " +
        "tri AS (SELECT COUNT(*) AS n_triangles FROM und e1 JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b " +
        "JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b), " +
        "wg AS (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS w FROM dg) " +
        "SELECT (SELECT COUNT(*) FROM nd) AS n_nodes, (SELECT COUNT(*) FROM und) AS n_edges, " +
        "tri.n_triangles, round(CASE WHEN wg.w > 0 THEN 3.0 * tri.n_triangles / wg.w ELSE 0.0 END, 6) AS global_clustering " +
        "FROM tri CROSS JOIN wg"),
    "x_host_graph_degrees" ->
      ("WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN text || ' see https://www.site' || (doc_id % 20) || " +
        "'.example.org/p/' || doc_id || ' and http://cdn' || (doc_id % 7) || '.example.net' ELSE text END AS text FROM documents), " +
        s"u AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlPattern}')) AS url FROM aug), " +
        "h AS (SELECT doc_id, regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM u), " +
        "e AS (SELECT DISTINCT s.host AS src, t.host AS dst FROM h s JOIN h t ON s.doc_id = t.doc_id " +
        "WHERE s.host LIKE 'www.site%' AND t.host LIKE 'cdn%'), " +
        "nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
        "o AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY src), " +
        "i AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY dst) " +
        "SELECT nd.node, COALESCE(o.out_deg, 0) AS out_deg, COALESCE(i.in_deg, 0) AS in_deg " +
        "FROM nd LEFT JOIN o ON o.node = nd.node LEFT JOIN i ON i.node = nd.node ORDER BY nd.node"),
    // incremental-MV replica: the refreshed state must equal a direct
    // aggregate over the post-change table
    // join-view refresh-equals-rebuild replica: the direct join of the
    // FINAL states (all inserts folded, %3 provenance rows retracted)
    "x_mv_join_refresh" ->
      ("SELECT o.o_custkey, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_price, " +
        "c.c_mktsegment FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "WHERE o.o_orderkey % 3 <> 0 ORDER BY o_orderkey LIMIT 1000"),
    // join-view UPDATE replica (delete+insert pair applied as one
    // batch): direct join with every 11th order's corrected price
    "x_mv_join_update" ->
      ("SELECT o.o_custkey, o.o_orderkey, " +
        "ROUND(o.o_totalprice, 2) + CASE WHEN o.o_orderkey % 11 = 0 THEN 1.0 ELSE 0.0 END AS o_price, " +
        "c.c_mktsegment FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey " +
        "ORDER BY o_orderkey LIMIT 1000"),
    "x_mv_refresh" ->
      ("SELECT o_custkey % 101 AS g, COUNT(*) AS n, " +
        "COUNT(o_orderkey % 1000) AS cnt_v, " +
        "CAST(SUM(o_orderkey % 1000) AS BIGINT) AS sum_v, " +
        "CAST(MIN(o_orderkey % 1000) AS BIGINT) AS min_v, " +
        "CAST(MAX(o_orderkey % 1000) AS BIGINT) AS max_v " +
        "FROM orders WHERE o_orderkey % 13 = 0 OR o_orderkey % 17 <> 0 " +
        "GROUP BY 1 ORDER BY g"),
    // multi-measure incremental MV: one shared refresh pass maintains
    // per-measure cnt/sum/min/max; v2 carries NULLs so the non-null
    // count diverges from n (the column AVG serving divides by)
    "x_mv_multi" ->
      ("WITH o AS (SELECT o_custkey % 101 AS g, o_orderkey % 1000 AS v1, " +
        "CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey % 97 END AS v2 " +
        "FROM orders WHERE o_orderkey % 13 = 0 OR o_orderkey % 17 <> 0) " +
        "SELECT g, COUNT(*) AS n, " +
        "COUNT(v1) AS cnt_v1, CAST(SUM(v1) AS BIGINT) AS sum_v1, " +
        "CAST(MIN(v1) AS BIGINT) AS min_v1, CAST(MAX(v1) AS BIGINT) AS max_v1, " +
        "COUNT(v2) AS cnt_v2, CAST(SUM(v2) AS BIGINT) AS sum_v2, " +
        "CAST(MIN(v2) AS BIGINT) AS min_v2, CAST(MAX(v2) AS BIGINT) AS max_v2 " +
        "FROM o GROUP BY g ORDER BY g"),
    // MV SERVING with a HAVING clause, a key-only WHERE, and a
    // NULL-bearing measure: the oracle recomputes directly; the Spark
    // side answers through the MvRewrite path (MvRewriteSpec pins the
    // served plan is aggregate-free), so what is compared is that the
    // served numbers — including AVG = sum / NON-NULL count — equal the
    // direct aggregate
    "x_mv_serve_having" ->
      ("WITH b AS (SELECT o_custkey % 101 AS g, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 1000 END AS v " +
        "FROM orders) " +
        "SELECT g, COUNT(*) AS n, COUNT(v) AS cnt, CAST(SUM(v) AS BIGINT) AS s, " +
        "AVG(v) AS av FROM b WHERE g < 50 GROUP BY g " +
        "HAVING COUNT(*) > 2 ORDER BY g"),
    // roll-up serving: the MV is keyed (g, h) but the question groups by
    // g alone — served by re-aggregating the key-sized state (aggregate
    // navigation); the oracle recomputes directly from the base rows
    "x_mv_serve_rollup" ->
      ("WITH b AS (SELECT o_custkey % 101 AS g, o_custkey % 7 AS h, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 1000 END AS v " +
        "FROM orders) " +
        "SELECT g, COUNT(*) AS n, COUNT(v) AS cnt, CAST(SUM(v) AS BIGINT) AS s, " +
        "AVG(v) AS av FROM b WHERE g < 50 GROUP BY g ORDER BY g"),
    // CDC materialization replicas: last-writer-wins per key via the
    // window rank (versions are unique per key by construction, so the
    // rank-1 row is the same winner Spark's max(struct) picks)
    "x_cdc_apply" ->
      (s"WITH c AS ($cdcChangelogCte) " +
        "SELECT k, ver, op, val FROM (SELECT k, ver, op, val, " +
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS r FROM c) t " +
        "WHERE r = 1 AND op <> 'D' ORDER BY k"),
    // SCD2 replica: LEAD over all records (deletes close predecessors),
    // delete records emit no row of their own
    "x_scd2" ->
      (s"WITH c AS ($cdcChangelogCte), " +
        "h AS (SELECT k, ver, op, val, " +
        "LEAD(ver) OVER (PARTITION BY k ORDER BY ver) AS valid_to FROM c) " +
        "SELECT k, ver AS valid_from, valid_to, val, " +
        "valid_to IS NULL AS is_current " +
        "FROM h WHERE op <> 'D' ORDER BY k, valid_from LIMIT 2000"),
    // interval-containment time travel at ver 3000 (per key at most
    // one containing interval, so k is a total order)
    "x_scd2_asof" ->
      (s"WITH c AS ($cdcChangelogCte), " +
        "h AS (SELECT k, ver, op, val, " +
        "LEAD(ver) OVER (PARTITION BY k ORDER BY ver) AS valid_to FROM c) " +
        "SELECT k, ver AS valid_from, val FROM h " +
        "WHERE op <> 'D' AND ver <= 3000 " +
        "AND (valid_to IS NULL OR valid_to > 3000) ORDER BY k"),
    // incremental fold ≡ full-log rebuild: literally the same oracle
    "x_scd2_incremental" ->
      (s"WITH c AS ($cdcChangelogCte), " +
        "h AS (SELECT k, ver, op, val, " +
        "LEAD(ver) OVER (PARTITION BY k ORDER BY ver) AS valid_to FROM c) " +
        "SELECT k, ver AS valid_from, valid_to, val, " +
        "valid_to IS NULL AS is_current " +
        "FROM h WHERE op <> 'D' ORDER BY k, valid_from LIMIT 2000"),
    "x_cdc_asof" ->
      (s"WITH c AS ($cdcChangelogCte) " +
        "SELECT k, ver, op, val FROM (SELECT k, ver, op, val, " +
        "ROW_NUMBER() OVER (PARTITION BY k ORDER BY ver DESC) AS r FROM c " +
        "WHERE ver <= 3000) t " +
        "WHERE r = 1 AND op <> 'D' ORDER BY k"),
    "x_cdc_diff" ->
      (s"WITH c AS ($cdcChangelogCte), " +
        "b AS (SELECT k, val FROM (SELECT k, op, val, ROW_NUMBER() OVER " +
        "(PARTITION BY k ORDER BY ver DESC) AS r FROM c WHERE ver <= 3000) t " +
        "WHERE r = 1 AND op <> 'D'), " +
        "a AS (SELECT k, val FROM (SELECT k, op, val, ROW_NUMBER() OVER " +
        "(PARTITION BY k ORDER BY ver DESC) AS r FROM c) t " +
        "WHERE r = 1 AND op <> 'D') " +
        "SELECT k, net_op, val FROM (SELECT COALESCE(a.k, b.k) AS k, " +
        "CASE WHEN b.k IS NULL THEN 'I' WHEN a.k IS NULL THEN 'D' " +
        "WHEN a.val IS DISTINCT FROM b.val THEN 'U' END AS net_op, " +
        "COALESCE(a.val, b.val) AS val " +
        "FROM b FULL OUTER JOIN a ON a.k = b.k) x " +
        "WHERE net_op IS NOT NULL ORDER BY k"),
    // W2: k-bounded global rank. The Spark side is RankLimit.globalRankTopK
    // (TakeOrderedAndProject + positional rank — NO single-partition
    // WindowExec; see plans/RankLimit.scala); the ordering is total
    // (s_suppkey unique) so rank ≡ row position.
    "d14_window_rank" ->
      "SELECT * FROM (SELECT s_suppkey, s_name, RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk FROM supplier) t WHERE rnk <= 10 ORDER BY rnk, s_suppkey LIMIT 100",
    // entity-resolution replica: identical blocking (2-char normalized
    // prefix, 1000-row block cap), identical Jaro-Winkler (DuckDB's
    // jaro_winkler_similarity matches the classic definition with the
    // 0.7 boost threshold and empty->0 — verified pairwise), identical
    // best-match ranking; the right source is a deterministic
    // perturbation (all 'e's dropped) of the left
    "x_entity_match" ->
      ("WITH l AS (SELECT p_partkey AS l_id, lower(p_name) AS l_name, " +
        "substr(regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g'), 1, 2) AS bk FROM part), " +
        "r AS (SELECT p_partkey + 10000000 AS r_id, " +
        "regexp_replace(lower(p_name), 'e', '', 'g') AS r_name, " +
        "substr(regexp_replace(regexp_replace(lower(p_name), 'e', '', 'g'), '[^a-z0-9]', '', 'g'), 1, 2) AS bk FROM part), " +
        "lc AS (SELECT * FROM l WHERE bk IN (SELECT bk FROM l GROUP BY bk HAVING COUNT(*) <= 1000)), " +
        "rc AS (SELECT * FROM r WHERE bk IN (SELECT bk FROM r GROUP BY bk HAVING COUNT(*) <= 1000)), " +
        "p AS (SELECT l_id, r_id, jaro_winkler_similarity(l_name, r_name) AS sim " +
        "FROM lc JOIN rc USING (bk)), " +
        "ranked AS (SELECT l_id, r_id, sim, ROW_NUMBER() OVER " +
        "(PARTITION BY l_id ORDER BY sim DESC, r_id) AS rk FROM p WHERE sim >= 0.9) " +
        "SELECT l_id, r_id, ROUND(sim, 4) AS sim FROM ranked WHERE rk = 1 ORDER BY l_id"),
    // Morton z-value replica: the same fixed-width rank buckets (list
    // comprehension over the 255 exact cutpoints — integer ranges and a
    // power-of-two divide make every cut an exact double) and the same
    // bit interleave (bit b of column i at position 2b+i; bits never
    // overlap, so | is +)
    "x_zorder_value" -> {
      val zexpr = (0 until 8).map(b =>
        s"(((bp >> $b) & 1) * ${1L << (2 * b)}) + (((bs >> $b) & 1) * ${1L << (2 * b + 1)})")
        .mkString(" + ")
      "WITH mm AS (SELECT MIN(l_partkey) AS pmn, MAX(l_partkey) AS pmx, " +
        "MIN(l_suppkey) AS smn, MAX(l_suppkey) AS smx FROM lineitem), " +
        "b AS (SELECT l_orderkey, l_linenumber, " +
        "len(list_filter([pmn + i*(pmx-pmn)/256.0 for i in range(1,256)], x -> x <= CAST(l_partkey AS DOUBLE))) AS bp, " +
        "len(list_filter([smn + i*(smx-smn)/256.0 for i in range(1,256)], x -> x <= CAST(l_suppkey AS DOUBLE))) AS bs " +
        "FROM lineitem, mm) " +
        s"SELECT l_orderkey, l_linenumber, CAST($zexpr AS BIGINT) AS zval " +
        "FROM b ORDER BY zval DESC, l_orderkey, l_linenumber LIMIT 500"
    },
    "x_text_stats" ->
      ("SELECT doc_id, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens, " +
        "length(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]')) AS n_subtokens, " +
        "round(CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS digit_ratio " +
        "FROM documents ORDER BY doc_id LIMIT 100"),
    "x_dedup_exact" ->
      ("SELECT text, COUNT(*) AS dup_count, MIN(doc_id) AS keep_id FROM documents " +
        "GROUP BY text HAVING COUNT(*) > 1 ORDER BY keep_id LIMIT 100"),
    "x_dedup_stats" ->
      "SELECT COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_unique FROM documents",
    "x_ann_topk" ->
      ("SELECT vec_id, round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine " +
        "FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10"),
    "x_events_hourly" ->
      ("SELECT CAST(date_trunc('hour', ts) AS STRING) AS hour, event_type, COUNT(*) AS cnt, " +
        "ROUND(SUM(value), 2) AS sum_value FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 100"),
    // pivot replica: conditional aggregation with the same explicit
    // column-per-type layout the Spark pivot produces
    "x_pivot" ->
      ("SELECT user_id, " +
        Seq("click", "error", "purchase", "signup", "view").map(t =>
          s"ROUND(SUM(CASE WHEN event_type = '$t' THEN value END), 2) AS $t")
          .mkString(", ") +
        " FROM events GROUP BY user_id ORDER BY user_id LIMIT 200"),
    // hopping-window replica: each event lands in exactly the two
    // 6h-wide, 3h-sliding windows starting at floor3h(ts) and
    // floor3h(ts)-3h; day-aligned flooring ≡ Spark's epoch-aligned
    // origin since 24 % 3 = 0
    "x_sliding_window" ->
      ("WITH e AS (SELECT event_type, value, date_trunc('day', ts) + " +
        "INTERVAL 3 HOUR * CAST(floor(date_part('hour', ts) / 3) AS INT) AS w1 FROM events), " +
        "x AS (SELECT event_type, value, unnest([w1, w1 - INTERVAL 3 HOUR]) AS ws FROM e) " +
        "SELECT CAST(ws AS STRING) AS window_start, event_type, COUNT(*) AS cnt, " +
        "ROUND(SUM(value), 2) AS sum_value FROM x GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500"),
    // gap-fill replica: the same hour spine × type grid, zero-filled
    "x_gap_fill" ->
      ("WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS mn, date_trunc('hour', MAX(ts)) AS mx FROM events), " +
        "spine AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b), " +
        "types AS (SELECT DISTINCT event_type FROM events), " +
        "hourly AS (SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS c, SUM(value) AS sv " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT CAST(s.hour AS STRING) AS hour, t.event_type, COALESCE(h.c, 0) AS cnt, " +
        "ROUND(COALESCE(h.sv, 0), 2) AS sum_value " +
        "FROM spine s CROSS JOIN types t LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type " +
        "ORDER BY hour, t.event_type LIMIT 500"),
    // sketch accuracy contracts: the DuckDB side computes the EXACT
    // value and asserts the in-contract flags are all 1 — the estimate
    // itself is engine-specific (DataSketches), the contract is not
    "x_sketch_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, 1 AS est_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x_sketch_overlap" ->
      ("SELECT COUNT(*) AS n_both, 1 AS both_ok, 1 AS jaccard_ok FROM " +
        "(SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "INTERSECT SELECT user_id FROM events WHERE event_type = 'click') t"),
    "x_sketch_quantiles" ->
      ("SELECT event_type, COUNT(*) AS n, 1 AS p50_ok, 1 AS p95_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x_serve_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, 1 AS est_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x_serve_quantile" ->
      ("SELECT event_type, COUNT(*) AS n, 1 AS p95_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x_serve_overlap" ->
      ("SELECT COUNT(*) AS n_both, 1 AS both_ok, 1 AS jaccard_ok FROM " +
        "(SELECT user_id FROM events WHERE event_type = 'purchase' " +
        "INTERSECT SELECT user_id FROM events WHERE event_type = 'click') t"),
    "x_cms_counts" ->
      ("SELECT event_type, COUNT(*) AS n_events, 1 AS est_ok " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "x_fk_infer" -> FkCheckedPairs.map { case (ct, cc, pt, pc) =>
      s"SELECT '$ct.$cc' AS child, '$pt.$pc' AS parent, CAST(" +
        s"((SELECT COUNT(DISTINCT $cc) FROM $ct WHERE $cc IN (SELECT $pc FROM $pt)) " +
        s">= 0.95 * (SELECT COUNT(DISTINCT $cc) FROM $ct)) " +
        s"AND ((SELECT COUNT(DISTINCT $pc) FROM $pt) >= 0.95 * (SELECT COUNT(*) FROM $pt)) " +
        "AS INT) AS inferred"
    }.mkString("SELECT child, parent, inferred FROM (", " UNION ALL ",
      ") t ORDER BY child, parent"),
    // running aggregate + LAG per user; DuckDB's ns timestamps truncate
    // to the µs grid Spark's nanosAsLong conversion produces, so gaps
    // compare exact longs
    "x_running_total" ->
      ("WITH e AS (SELECT event_id, user_id, value, " +
        "epoch_us(date_trunc('microseconds', ts)) AS us FROM events) " +
        "SELECT event_id, user_id, " +
        "round(SUM(value) OVER (PARTITION BY user_id ORDER BY us, event_id), 2) AS running_value, " +
        "us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us " +
        "FROM e ORDER BY event_id LIMIT 1000"),
    // the gold side of the relative-date contract computes its cutoff
    // from the SAME frozen `now` the template layer is given
    "x_relative_date" ->
      (s"SELECT event_type, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value FROM events " +
        s"WHERE ts >= DATE '${frozenNow.minusDays(10)}' GROUP BY event_type ORDER BY event_type"),
    // session semantics: new session when the gap since the previous event
    // of the same user exceeds 30 minutes (matches session_window's
    // half-open-window merge; exact-boundary gaps are measure-zero in
    // the ns-precision data)
    "x_events_sessions" ->
      ("WITH marked AS (SELECT user_id, ts, value, CASE WHEN ts - LAG(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE OR LAG(ts) OVER " +
        "(PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s FROM events), " +
        "numbered AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
        "SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, " +
        "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS session_value " +
        "FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start LIMIT 100"),
    // char-distribution signals: DuckDB's entropy() aggregate is the same
    // log2 Shannon entropy the one-pass CharDistribution expression
    // computes (verified to 4 dp; text is single-code-unit ASCII so the
    // per-character split units agree)
    "x_entropy" ->
      ("SELECT doc_id, round(entropy(c), 4) AS char_entropy, " +
        "count(DISTINCT c) AS n_distinct_chars " +
        "FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents " +
        "WHERE length(text) > 0) " +
        "GROUP BY doc_id ORDER BY doc_id LIMIT 100"),
    // per-host URL stats over the x_url_extract augmentation
    "x_host_stats" ->
      ("WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN text || ' see https://www.site' || (doc_id % 20) || " +
        "'.example.org/p/' || doc_id || ' and http://cdn' || (doc_id % 7) || '.example.net' ELSE text END AS text FROM documents), " +
        s"u AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlPattern}')) AS url FROM aug) " +
        "SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host, COUNT(*) AS n_urls, " +
        "COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc FROM u " +
        "GROUP BY host ORDER BY host LIMIT 100"),
    // PCA covariance pass replica: same one-pass sums over cast-to-
    // double embeddings, sample covariance, upper triangle, ROUND 6
    "x_embed_cov" ->
      ("WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "p AS (SELECT emb, unnest(range(1, len(emb) + 1)) AS i FROM e), " +
        "q AS (SELECT emb, i, unnest(range(i, len(emb) + 1)) AS j FROM p), " +
        "g AS (SELECT CAST(i - 1 AS INT) AS i, CAST(j - 1 AS INT) AS j, COUNT(*) AS n, " +
        "SUM(emb[i]) AS sx, SUM(emb[j]) AS sy, SUM(emb[i] * emb[j]) AS sxy FROM q GROUP BY 1, 2) " +
        "SELECT i, j, ROUND((sxy - sx * sy / n) / (n - 1), 6) + 0.0 AS cov " +
        "FROM g ORDER BY i, j"),
    // int8 symmetric quantization: scale = max|x|/127, codes = round(x/scale)
    // clamped; qnorm is an exact integer, rmse the reconstruction error
    "x_embed_quantize" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "s AS (SELECT vec_id, emb, list_max(list_transform(emb, x -> abs(x))) / 127.0 AS scale FROM e), " +
        "q AS (SELECT vec_id, scale, emb, list_transform(emb, x -> CASE WHEN scale = 0 THEN 0 " +
        "ELSE greatest(-127, least(127, CAST(round(x / scale) AS INT))) END) AS qe FROM s) " +
        "SELECT vec_id, round(scale, 6) AS scale, " +
        "CAST(list_sum(list_transform(qe, x -> CAST(x * x AS BIGINT))) AS BIGINT) AS qnorm, " +
        "round(sqrt(list_sum(list_transform(list_zip(emb, qe), p -> " +
        "(p[1] - p[2] * scale) * (p[1] - p[2] * scale))) / len(emb)), 6) AS rmse " +
        "FROM q ORDER BY vec_id LIMIT 2000"),
    // quantized-cosine top-10: per-vector scales cancel, so cosine over the
    // INT codes is the quantized ranking on both engines
    "x_quantized_topk" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "q AS (SELECT vec_id, list_transform(emb, x -> CASE WHEN list_max(list_transform(emb, y -> abs(y))) = 0 THEN 0.0 " +
        "ELSE CAST(greatest(-127, least(127, CAST(round(x / (list_max(list_transform(emb, y -> abs(y))) / 127.0)) AS INT))) AS DOUBLE) END) AS qe FROM e) " +
        "SELECT a.vec_id, round(CAST(list_cosine_similarity(a.qe, " +
        "(SELECT qe FROM q WHERE vec_id = 0)) AS DOUBLE), 4) AS qcosine " +
        "FROM q a ORDER BY qcosine DESC, vec_id LIMIT 10"),
    // deterministic +-1 random projection: proj[j] = sum_i emb[i] *
    // sign(sin(i*12.9898 + j*78.233)), i and j 1-based on both engines
    "x_rand_proj" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id < 50), " +
        "u AS (SELECT vec_id, emb[CAST(i AS INT)] AS x, i FROM e CROSS JOIN range(1, 65) t(i)), " +
        "p AS (SELECT vec_id, CAST(j AS INT) AS dim, SUM(x * CASE WHEN sin(i * 12.9898 + j * 78.233) > 0 " +
        "THEN 1.0 ELSE -1.0 END) AS v FROM u CROSS JOIN range(1, 9) s(j) GROUP BY vec_id, j) " +
        "SELECT vec_id, dim, round(v, 4) AS value FROM p ORDER BY vec_id, dim LIMIT 500"),
    // PQ encode under probe codebooks: per-(vector, subspace) argmin over
    // the 16 fixed centroid slices, ties to the lower code
    "x_pq_encode" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "cb AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "d AS (SELECT e.vec_id, s.s AS subspace, cb.cid, " +
        "list_sum([ (e.emb[s.s*8 + i] - cb.cemb[s.s*8 + i])*(e.emb[s.s*8 + i] - cb.cemb[s.s*8 + i]) for i in range(1, 9) ]) AS dist " +
        "FROM e CROSS JOIN range(0, 8) s(s) CROSS JOIN cb WHERE e.vec_id < 100), " +
        "r AS (SELECT vec_id, subspace, cid, row_number() OVER (PARTITION BY vec_id, subspace ORDER BY dist, cid) AS rn FROM d) " +
        "SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(cid AS INT) AS code FROM r " +
        "WHERE rn = 1 ORDER BY vec_id, subspace LIMIT 1000"),
    // per-subspace quantization residual stats under probe codebooks:
    // min distance per (vector, subspace) aggregated
    "x_pq_errors" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "cb AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 16), " +
        "d AS (SELECT e.vec_id, s.s AS subspace, cb.cid, " +
        "list_sum([ (e.emb[s.s*8 + i] - cb.cemb[s.s*8 + i])*(e.emb[s.s*8 + i] - cb.cemb[s.s*8 + i]) for i in range(1, 9) ]) AS dist " +
        "FROM e CROSS JOIN range(0, 8) s(s) CROSS JOIN cb WHERE e.vec_id < 100), " +
        "mins AS (SELECT vec_id, subspace, MIN(dist) AS sq_error FROM d GROUP BY 1, 2) " +
        "SELECT CAST(subspace AS INT) AS subspace, COUNT(*) AS n, " +
        "round(AVG(sq_error), 6) AS avg_sq_error, round(MAX(sq_error), 6) AS max_sq_error " +
        "FROM mins GROUP BY 1 ORDER BY 1 LIMIT 100"),
    // PQ ADC recall contract: the gold is the exact brute-force ranking
    "x_pq_topk" ->
      ("SELECT vec_id, round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine " +
        "FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10"),
    // persisted-index IVF-PQ at full probe + wide candidates = the exact
    // brute-force ranking (same gold as x_pq_topk; the Spark side must
    // reach it reading only the persisted codes column until the re-rank)
    "x_pq_persisted" ->
      ("SELECT vec_id, round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine " +
        "FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10"),
    // clustered-fixture IVF recall: gold is the exact top-10 id SET over
    // the planted-cluster frame (unrounded ordering picks the set; the
    // output sorts by id so the hash certifies recall, not tie order)
    "x_ann_ivf_clustered" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
        "cl AS (SELECT e.vec_id, [c.cemb[i] + 0.05 * e.emb[i] for i in range(1, 65)] AS emb " +
        "FROM e JOIN c ON e.vec_id % 8 = c.cid), " +
        "q AS (SELECT emb FROM cl WHERE vec_id = 1) " +
        "SELECT vec_id FROM (SELECT cl.vec_id, " +
        "CAST(list_cosine_similarity(cl.emb, (SELECT emb FROM q)) AS DOUBLE) AS cos0 " +
        "FROM cl ORDER BY cos0 DESC, vec_id LIMIT 10) ORDER BY vec_id"),
    // incremental dedup recall contract: DuckDB computes ALL exact
    // cross-split pairs; the LSH path must find every one
    "x_dedup_incremental" ->
      (s"WITH ${jaccardPairsCte()
        .replace("WHERE a.doc_id < b.doc_id",
          "WHERE a.doc_id % 10 != 0 AND b.doc_id % 10 = 0")} " +
        "SELECT id_a, id_b, ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard " +
        "FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8 " +
        "ORDER BY id_a, id_b LIMIT 200"),
    // top-k per group: the oracle states the WINDOW semantics the
    // bounded-heap aggregate must reproduce (ord desc, ties to lower id)
    "x_group_topk" ->
      ("SELECT user_id, rank, event_id, round(value, 4) AS value FROM " +
        "(SELECT user_id, event_id, value, CAST(row_number() OVER " +
        "(PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS rank FROM events) t " +
        "WHERE rank <= 3 ORDER BY user_id, rank LIMIT 1000"),
    "x_asof_purchase" ->
      ("SELECT e.event_id, p.value AS last_purchase FROM events e ASOF LEFT JOIN " +
        "(SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
        "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id LIMIT 100"),
    // as-of with a tolerance horizon: matches older than 1h are nulled
    // (DuckDB: native ASOF, then the CASE applies the horizon)
    "x_asof_tolerance" ->
      ("SELECT e.event_id, CASE WHEN p.ts >= e.ts - INTERVAL 1 HOUR THEN p.value END AS last_purchase " +
        "FROM events e ASOF LEFT JOIN " +
        "(SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
        "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id LIMIT 100"),
    // frame sampling over the documents-derived media table: one row per
    // sampled frame; frame counts are pure SQL over the text column
    "x_frame_sample" ->
      ("WITH media AS (SELECT doc_id AS media_id, " +
        "CAST(CASE WHEN doc_id % 3 = 2 THEN greatest(1, (1000 + (length(text) * 7) % 4000) // 1000) ELSE 1 END AS INT) AS n_frames " +
        "FROM documents) " +
        "SELECT media_id, frame_index, CAST(frame_index AS BIGINT) * 1000 AS frame_ts_ms FROM " +
        "(SELECT media_id, CAST(unnest(range(n_frames)) AS INT) AS frame_index FROM media) " +
        "ORDER BY media_id, frame_index LIMIT 200"),
    // salted two-phase aggregation must produce EXACTLY the plain
    // GROUP BY answer (salting changes the shuffle, never the result).
    // avg is excluded from the declared output: dividing the sum breaks
    // the 2-decimal structure of the data, so the ~1-ulp accumulation
    // difference between the two-phase and sequential sums can straddle
    // a rounding boundary exactly (observed at sf0.1); sums of 2dp
    // decimals rounded at 2dp are boundary-safe. SkewSpec covers avg.
    "x_skew_agg" ->
      ("SELECT user_id, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value, " +
        "ROUND(MIN(value), 2) AS min_value, ROUND(MAX(value), 2) AS max_value " +
        "FROM events GROUP BY user_id ORDER BY user_id LIMIT 100"),
    // salted-join replica: the plain (unsalted) join — the salt must
    // be invisible in the result
    "x_skew_join" ->
      ("SELECT nk, COUNT(*) AS n, ROUND(SUM(q), 2) AS sum_q FROM " +
        "(SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_suppkey END AS k, " +
        "CAST(l_quantity AS DOUBLE) AS q FROM lineitem) p " +
        "JOIN (SELECT s_suppkey AS k, s_nationkey AS nk FROM supplier) b " +
        "USING (k) GROUP BY nk ORDER BY nk"),
    // range join: the Spark side is the binned equi-join operator
    // (operators/RangeJoin.scala — no BroadcastNestedLoopJoin on the main
    // path); DuckDB evaluates the plain inequality join
    "x_range_join" ->
      ("SELECT c.c_custkey, s.s_suppkey FROM customer c JOIN supplier s " +
        "ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal <= s.s_acctbal + 500 " +
        "ORDER BY c_custkey, s_suppkey LIMIT 100"),
    // exact n-gram Jaccard is portable: inter/|A∪B| of distinct 3-gram
    // word shingles, same slicing semantics as WordShingles
    "x_dedup_ngram" -> jaccardGoldSql(0.8),
    // RECALL CONTRACT: MinHash-LSH's verified pairs must equal ALL exact
    // Jaccard ≥ 0.7 pairs — DuckDB computes the gold set independently;
    // a pair the banded LSH misses hash-mismatches the round.
    "x_dedup_minhash" -> jaccardGoldSql(0.7),
    // RECALL CONTRACT: every ≥75-token document gets a planted copy with
    // one appended token; the SimHash banding + exact-popcount verify
    // must surface every planted (id, id+100000) pair. DuckDB enumerates
    // the expected pairs from the corpus alone.
    "x_dedup_simhash" ->
      ("SELECT doc_id AS id_a, doc_id + 100000 AS id_b FROM documents " +
        "WHERE CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END >= 75 " +
        "ORDER BY id_a LIMIT 500"),
    // RECALL CONTRACT: 25 planted perturbed copies (first component
    // +0.25, cosine ≈ 0.97 to their source; organic pairs max 0.51) —
    // banded sign-LSH + exact-cosine verify must find exactly the pairs
    // the DuckDB brute force finds.
    "x_cosine_neardup" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "p AS (SELECT vec_id + 100000 AS vec_id, list_concat([emb[1] + 0.25], emb[2:]) AS emb FROM e WHERE vec_id < 25), " +
        "c AS (SELECT * FROM e UNION ALL SELECT * FROM p) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, " +
        "round(CAST(list_cosine_similarity(a.emb, b.emb) AS DOUBLE), 4) AS cosine " +
        "FROM c a JOIN c b ON a.vec_id < b.vec_id " +
        "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.95 ORDER BY id_a, id_b LIMIT 100"),
    // RECALL CONTRACT: IVF(nlist=16, nprobe=6) must return the exact
    // brute-force top-10 (DuckDB computes it); cell pruning that drops a
    // true neighbor fails the round.
    "x_ann_ivf" ->
      ("SELECT vec_id, round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine " +
        "FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10"),
    "x_lang_id" -> {
      val (hitCols, caseSql) = langCaseSql
      "WITH toks AS (SELECT doc_id, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents), " +
        s"h AS (SELECT doc_id, $hitCols FROM toks), " +
        "m AS (SELECT *, " + graft.operators.TextAnalysis.stopwords.keys.toSeq.sorted.map(l => s"h_$l").mkString("greatest(", ", ", ")") + " AS mh FROM h) " +
        s"SELECT doc_id, $caseSql AS lang_pred FROM m ORDER BY doc_id LIMIT 100"
    },
    // full text-analysis projection (fingerprint excluded: the rolling
    // hash is not expressible in DuckDB SQL; it stays sbt-verified)
    "x_text_analyze" -> {
      val (hitCols, caseSql) = langCaseSql
      "WITH base AS (SELECT doc_id, text, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens, " +
        "length(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]')) AS n_subtokens, " +
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio_raw, " +
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digit_ratio_raw, " +
        "list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents), " +
        "awl AS (SELECT *, CASE WHEN n_tokens = 0 THEN 0.0 ELSE CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE) / n_tokens END AS awl_raw FROM base), " +
        s"h AS (SELECT *, $hitCols FROM awl), " +
        "m AS (SELECT *, " + graft.operators.TextAnalysis.stopwords.keys.toSeq.sorted.map(l => s"h_$l").mkString("greatest(", ", ", ")") + " AS mh FROM h) " +
        "SELECT doc_id, n_tokens, n_subtokens, round(punct_ratio_raw, 4) AS punct_ratio, " +
        "round(digit_ratio_raw, 4) AS digit_ratio, round(awl_raw, 4) AS avg_word_len, " +
        s"$caseSql AS lang_pred, " +
        "round(greatest(0.0, least(1.0, least(length(text) / 500.0, 1.0) * 0.4 " +
        "+ least(n_tokens / 100.0, 1.0) * 0.3 " +
        "+ CASE WHEN awl_raw >= 3 AND awl_raw <= 10 THEN 0.3 ELSE 0.1 END " +
        "- (punct_ratio_raw + digit_ratio_raw) * 0.5)), 4) AS quality " +
        "FROM m ORDER BY doc_id LIMIT 100"
    },
    // corpus quality filter: language allow-list + quality floor + token
    // band — the whole pipeline replicated in SQL from the same
    // arithmetic as x_text_analyze
    "x_quality_filter" ->
      (s"WITH $qualityCtes " +
        "SELECT doc_id FROM qkept ORDER BY doc_id LIMIT 500"),
    // full dedup pipeline: exact (keep min doc_id per text) then remove
    // the larger id of every exact-Jaccard >= 0.85 pair among survivors
    // (recall contract on the composed pipeline: the MinHash-LSH pass
    // must surface every such pair or a kept/removed id flips)
    "x_dedup_corpus" ->
      ("WITH kept AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text), " +
        "words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents WHERE doc_id IN (SELECT doc_id FROM kept)), " +
        "sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS s FROM words), " +
        "postings AS (SELECT doc_id, len(s) AS n_sh, unnest(s) AS shingle FROM sh), " +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS inter " +
        "FROM postings a JOIN postings b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2, 3, 4), " +
        "losers AS (SELECT DISTINCT id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.85) " +
        "SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT id_b FROM losers) ORDER BY doc_id LIMIT 1000"),
    // document chunking (32-token windows, 8 overlap → stride 24):
    // DuckDB list slices are INCLUSIVE of the upper bound, so
    // t[s : s+31] is the 32-element window matching Spark's slice(t, s, 32)
    "x_text_chunks" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, t, greatest(1, CAST(ceil(CAST(n - 8 AS DOUBLE) / 24) AS INT)) AS nc FROM toks WHERE n > 0), " +
        "e AS (SELECT doc_id, t, CAST(unnest(range(nc)) AS INT) AS chunk_index FROM c) " +
        "SELECT doc_id, chunk_index, " +
        "array_to_string(t[chunk_index * 24 + 1 : chunk_index * 24 + 32], ' ') AS chunk_text, " +
        "len(t[chunk_index * 24 + 1 : chunk_index * 24 + 32]) AS chunk_tokens " +
        "FROM e ORDER BY doc_id, chunk_index LIMIT 200"),
    // sharded sequence packing: per-shard running token sum // capacity
    "x_pack_sequences" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens, " +
        "CAST(doc_id % 8 AS INT) AS shard FROM documents), " +
        "c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t) " +
        "SELECT doc_id, n_tokens, shard, CAST(shard AS BIGINT) * 1000000 + CAST(floor((cum - n_tokens) / 256) AS BIGINT) AS pack_id " +
        "FROM c ORDER BY doc_id LIMIT 500"),
    // global concat-and-chunk replica: exclusive running token sum over
    // the doc_id order, integer div/mod spans — every column cast
    "x_pack_offsets" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t) " +
        "SELECT doc_id, n_tokens, o AS global_off, " +
        "CAST(o // 256 AS BIGINT) AS first_seq, " +
        "CAST((o + greatest(n_tokens, 1) - 1) // 256 AS BIGINT) AS last_seq, " +
        "CAST(o % 256 AS BIGINT) AS seq_off FROM c ORDER BY doc_id"),
    // packing scorecard replica: same ceil-div in exact integers
    "x_pack_stats" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t) " +
        "SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, " +
        "CAST((SUM(n_tokens) + 255) // 256 AS BIGINT) AS n_seqs, " +
        "CAST(((SUM(n_tokens) + 255) // 256) * 256 - SUM(n_tokens) AS BIGINT) AS pad_tokens, " +
        "CAST(SUM(CASE WHEN o // 256 <> (o + greatest(n_tokens, 1) - 1) // 256 THEN 1 ELSE 0 END) AS BIGINT) AS split_docs FROM c"),
    // transfer-integrity manifest replica: per-shard counts, id range,
    // two order-independent md5-derived XOR fingerprints, token totals
    // — every fingerprint from the one hash both engines compute
    // identically (md5 digit ladder, the x_dsir precedent)
    "x_shard_manifest" ->
      (s"WITH k AS (SELECT doc_id % 8 AS shard, doc_id, ${md5KeySql(1)} AS klo, ${md5KeySql(17)} AS khi, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS nt FROM documents) " +
        "SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_rows, " +
        "CAST(MIN(doc_id) AS BIGINT) AS min_id, CAST(MAX(doc_id) AS BIGINT) AS max_id, " +
        "CAST(bit_xor(CAST(klo AS BIGINT)) AS BIGINT) AS xor_lo, " +
        "CAST(bit_xor(CAST(khi AS BIGINT)) AS BIGINT) AS xor_hi, " +
        "CAST(SUM(nt) AS BIGINT) AS sum_tokens FROM k GROUP BY 1 ORDER BY 1"),
    // streamed-packing replica: ordered id-contiguous batches fold to
    // exactly the batch assignment, so the oracle IS the global
    // running sum (same SQL shape as x_pack_offsets)
    "x_pack_streamed" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t) " +
        "SELECT doc_id, n_tokens, o AS global_off, " +
        "CAST(o // 256 AS BIGINT) AS first_seq, " +
        "CAST((o + greatest(n_tokens, 1) - 1) // 256 AS BIGINT) AS last_seq, " +
        "CAST(o % 256 AS BIGINT) AS seq_off FROM c ORDER BY doc_id"),
    // materialized-sequence replica: same prefix sum, per-sequence
    // slices rebuilt with inclusive-end list slicing, ordered string_agg
    "x_pack_materialize" ->
      (raw"WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0) AS tk FROM documents), " +
        "t2 AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM t), " +
        "c AS (SELECT doc_id, tk, n, CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t2), " +
        "e AS (SELECT tk, n, o, CAST(unnest(range(o // 256, (o + n - 1) // 256 + 1)) AS BIGINT) AS seq_id FROM c WHERE n > 0), " +
        "p AS (SELECT seq_id, greatest(seq_id * 256 - o, 0) AS s, least(n, (seq_id + 1) * 256 - o) AS e2, o, tk FROM e), " +
        "p2 AS (SELECT seq_id, o + s AS gpos, tk[s + 1 : e2] AS piece FROM p) " +
        "SELECT seq_id, CAST(SUM(len(piece)) AS BIGINT) AS n_tokens, " +
        "string_agg(array_to_string(piece, ' '), ' ' ORDER BY gpos) AS seq_text " +
        "FROM p2 GROUP BY seq_id ORDER BY seq_id"),
    // token-budget prefix replica: running sum over (n_chars desc, id)
    "x_token_budget" ->
      ("WITH t AS (SELECT doc_id, n_chars, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, CAST(COALESCE(SUM(n) OVER (ORDER BY n_chars DESC, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS o FROM t) " +
        "SELECT doc_id, n_tokens, o AS global_off FROM c " +
        "WHERE o + n_tokens <= 20000 AND n_tokens > 0 ORDER BY doc_id"),
    // duplicate GROUPS: connected components over the exact-Jaccard≥0.8
    // pair graph, labeled by component-minimum id (DuckDB: recursive
    // min-reachability; Spark: distributed min-label propagation)
    "x_dedup_groups" ->
      (s"WITH RECURSIVE ${jaccardPairsCte()}, " +
        "gold AS (SELECT id_a, id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM gold UNION SELECT id_b, id_a FROM gold), " +
        "reach AS (SELECT src AS id, src AS peer FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src) " +
        "SELECT id, MIN(peer) AS group_id FROM reach GROUP BY id ORDER BY id LIMIT 1000"),
    // canonical-selection replica: the same recursive CC labels joined
    // to the shared quality CTEs, winner by (quality DESC, id ASC)
    "x_dedup_canonical" ->
      (s"WITH RECURSIVE ${jaccardPairsCte()}, " +
        "gold AS (SELECT id_a, id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM gold UNION SELECT id_b, id_a FROM gold), " +
        "reach AS (SELECT src AS id, src AS peer FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src), " +
        "labels AS (SELECT id, MIN(peer) AS group_id FROM reach GROUP BY id), " +
        s"$qualityCtes, " +
        "sel AS (SELECT l.group_id, l.id, sc.quality, " +
        "row_number() OVER (PARTITION BY l.group_id ORDER BY sc.quality DESC, l.id ASC) AS rn " +
        "FROM labels l JOIN scored sc ON sc.doc_id = l.id) " +
        "SELECT group_id, id AS keep_id, quality AS score FROM sel WHERE rn = 1 " +
        "ORDER BY group_id LIMIT 1000"),
    // benchmark decontamination: docs sharing >= 5 distinct 3-gram
    // shingles with the pseudo-benchmark (doc_id % 97 = 0) drop; the
    // Spark side broadcast-joins the benchmark shingle set
    "x_decontam" -> decontamOracle,
    // the Bloom-screened variant carries an EXACT-EQUALITY contract with
    // the direct operator (screen is superset-safe, verify is exact), so
    // the same oracle must hash-match both
    "x_bloom_decontam" -> decontamOracle,
    // PII redaction on deterministically-augmented text (every 7th doc
    // gains an e-mail, a phone and an IP) — counts + the redacted text
    // must match; DuckDB regexp_replace needs the 'g' flag to mirror
    // Spark's replace-all semantics
    "x_pii_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' || doc_id || " +
        "'@mail.example.com or call 555-867-5309 at 10.0.0.' || (doc_id % 256) ELSE text END AS text FROM documents), " +
        s"r1 AS (SELECT doc_id, text, regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1 FROM aug), " +
        s"r2 AS (SELECT *, regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2 FROM r1) " +
        s"SELECT doc_id, len(regexp_extract_all(text, '$email')) AS n_emails, " +
        s"len(regexp_extract_all(t1, '$phone')) AS n_phones, " +
        s"len(regexp_extract_all(t2, '$ip')) AS n_ips, " +
        s"regexp_replace(t2, '$ip', '<IP>', 'g') AS redacted " +
        "FROM r2 ORDER BY doc_id LIMIT 100"
    },
    // stratified deterministic sampling by token-length band: per-mille
    // id-hash buckets, exact integer arithmetic on both sides
    // normalized-dedup replica: identical augmentation and the same
    // lower/translate/regexp_replace/md5 normalization pipeline (the
    // accent table is interpolated from the ONE Scala constant)
    "x_normalized_dedup" ->
      (s"WITH aug AS (SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 100000, " +
        "upper(translate(text, 'aeio', '\u00e1\u00e9\u00ec\u00f6')) " +
        "FROM documents WHERE doc_id % 10 = 0), " +
        "n AS (SELECT doc_id, md5(trim(regexp_replace(translate(lower(text), " +
        s"'${graft.operators.TextAnalysis.AccentFrom}', '${graft.operators.TextAnalysis.AccentTo}'), " +
        "'\\s+', ' ', 'g'))) AS nfp FROM aug) " +
        "SELECT nfp, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc " +
        "FROM n GROUP BY nfp HAVING COUNT(*) > 1 ORDER BY first_doc"),
    "x_stratified_sample" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens FROM documents), " +
        "s AS (SELECT doc_id, CASE WHEN n_tokens < 50 THEN 'short' WHEN n_tokens < 200 THEN 'medium' ELSE 'long' END AS stratum FROM t) " +
        "SELECT doc_id, stratum FROM s WHERE (doc_id * 2654435761) % 1000 < " +
        "CASE stratum WHEN 'short' THEN 100 WHEN 'medium' THEN 500 ELSE 1000 END " +
        "ORDER BY doc_id LIMIT 2000"),
    // per-row weighted sampling: hash per-mille under floor(weight*1000),
    // weight = min(n_tokens/200, 1) — double arithmetic is identical on
    // both engines; FLOOR mirrors Spark's truncating cast
    "x_weighted_sample" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens FROM documents) " +
        "SELECT doc_id FROM t WHERE (doc_id * 2654435761) % 1000 < " +
        "CAST(FLOOR(LEAST(GREATEST(CAST(n_tokens AS DOUBLE) / 200.0, 0.0), 1.0) * 1000) AS BIGINT) " +
        "ORDER BY doc_id LIMIT 2000"),
    // length-bucketed batching: 32-token bands, row_number within band
    // ordered by (n_tokens, doc_id), batches of 8; `//` mirrors Spark's
    // floored integer division
    "x_len_batches" ->
      ("WITH t AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens FROM documents), " +
        "b AS (SELECT doc_id, n_tokens, CAST(n_tokens // 32 AS INT) AS bucket FROM t), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY n_tokens, doc_id) AS rn FROM b) " +
        "SELECT doc_id, n_tokens, bucket, CAST(bucket AS BIGINT) * 1000000000 + ((rn - 1) // 8) AS batch_id " +
        "FROM r ORDER BY doc_id LIMIT 500"),
    // text normalization over deterministically-dirtied text (every 5th
    // doc gains control chars + ragged whitespace); 'g' flag mirrors
    // Spark's replace-all
    "x_normalize" ->
      ("WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 " +
        "THEN '  ' || chr(9) || text || chr(7) || chr(11) || '  MIXED case  ' ELSE text END AS text FROM documents), " +
        "n AS (SELECT doc_id, length(text) AS len_raw, " +
        "lower(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'), '\\s+', ' ', 'g'))) AS normalized FROM aug) " +
        "SELECT doc_id, normalized, len_raw - length(normalized) AS n_chars_removed " +
        "FROM n ORDER BY doc_id LIMIT 100"),
    // Gopher-style repetition signals: repeated-token fraction and the
    // most-frequent-bigram share (blank docs pinned to 0 on both sides)
    "x_repetition" ->
      ("WITH words AS (SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents), " +
        "bg AS (SELECT doc_id, CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END AS b FROM words), " +
        "u AS (SELECT doc_id, unnest(b) AS g FROM bg), " +
        "c AS (SELECT doc_id, g, COUNT(*) AS n FROM u GROUP BY 1, 2), " +
        "m AS (SELECT doc_id, MAX(n) AS mx, SUM(n) AS tot FROM c GROUP BY 1) " +
        "SELECT words.doc_id, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n_tokens, " +
        "round(CASE WHEN length(trim(text)) = 0 OR len(w) <= 0 THEN 0.0 " +
        "ELSE 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) END, 4) AS dup_token_ratio, " +
        "round(CASE WHEN length(trim(text)) = 0 THEN 0.0 ELSE CAST(mx AS DOUBLE) / tot END, 4) AS top_bigram_frac " +
        "FROM words JOIN m ON words.doc_id = m.doc_id ORDER BY words.doc_id LIMIT 100"),
    // per-source statistics + temperature-scaled mixing weights
    // dataset-card replica: the shared quality CTEs provide n_tokens
    // and the 4dp quality; duplicate exposure via (source, md5) groups
    "x_corpus_report" ->
      (s"WITH $qualityCtes, " +
        "fpx AS (SELECT d.doc_id, d.source, d.lang, md5(d.text) AS fp, " +
        "sc.n_tokens, sc.quality FROM documents d JOIN scored sc USING (doc_id)), " +
        "dg AS (SELECT source, fp, COUNT(*) AS n FROM fpx GROUP BY 1, 2), " +
        "dd AS (SELECT source, CAST(SUM(n) AS BIGINT) AS dup_docs FROM dg WHERE n > 1 GROUP BY 1), " +
        "b AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, " +
        "ROUND(AVG(quality), 4) AS avg_quality, COUNT(DISTINCT lang) AS n_langs FROM fpx GROUP BY 1) " +
        "SELECT b.source, b.n_docs, b.sum_tokens, b.avg_quality, b.n_langs, " +
        "COALESCE(dd.dup_docs, 0) AS dup_docs, " +
        "ROUND(CAST(COALESCE(dd.dup_docs, 0) AS DOUBLE) / b.n_docs, 4) AS dup_rate " +
        "FROM b LEFT JOIN dd USING (source) ORDER BY source LIMIT 100"),
    "x_source_mix" ->
      ("WITH t AS (SELECT source, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "g AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_tokens, AVG(n) AS avg_raw FROM t GROUP BY source), " +
        "tot AS (SELECT SUM(pow(n_docs, 0.7)) AS total FROM g) " +
        "SELECT source, n_docs, sum_tokens, round(avg_raw, 4) AS avg_tokens, " +
        "round(pow(n_docs, 0.7) / total, 6) AS mix_weight FROM g, tot ORDER BY source LIMIT 100"),
    // token-budget mixing-plan replica: same temperature weights, same
    // half-up target rounding, same floor-to-per-mille rate
    "x_source_budget" ->
      ("WITH t AS (SELECT source, CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "g AS (SELECT source, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_tokens FROM t GROUP BY source), " +
        "tot AS (SELECT SUM(pow(n_docs, 0.7)) AS total FROM g) " +
        "SELECT source, n_docs, sum_tokens, " +
        "round(pow(n_docs, 0.7) / total, 6) AS mix_weight, " +
        "CAST(round(50000.0 * pow(n_docs, 0.7) / total, 0) AS BIGINT) AS target_tokens, " +
        "floor(least(1.0, 50000.0 * pow(n_docs, 0.7) / total / sum_tokens) * 1000) / 1000 AS rate " +
        "FROM g, tot ORDER BY source LIMIT 100"),
    // END-TO-END curation pipeline: quality gate -> exact dedup ->
    // near-dup removal (recall contract: the LSH pass must surface every
    // exact-Jaccard>=0.85 pair among survivors) -> benchmark
    // decontamination -> deterministic split; the whole chain replicated
    // as one CTE composition
    "x_curate" ->
      (s"WITH $qualityCtes, " +
        "kept AS (SELECT min(doc_id) AS doc_id FROM documents WHERE doc_id IN (SELECT doc_id FROM qkept) GROUP BY text), " +
        jaccardPairsCte(" WHERE doc_id IN (SELECT doc_id FROM kept)") + ", " +
        "losers AS (SELECT DISTINCT id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.85), " +
        "surv AS (SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT id_b FROM losers)), " +
        "ewords AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents WHERE doc_id % 97 = 0), " +
        "esh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS s FROM ewords), " +
        "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM esh), " +
        "cont AS (SELECT p.doc_id FROM (SELECT sh.doc_id, unnest(sh.s) AS shingle FROM sh " +
        "WHERE sh.doc_id IN (SELECT doc_id FROM surv)) p " +
        "JOIN ev USING (shingle) GROUP BY p.doc_id HAVING COUNT(*) >= 5), " +
        "clean AS (SELECT doc_id FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM cont)) " +
        "SELECT doc_id, CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT doc_id, (doc_id * 2654435761) % 1000 AS b FROM clean) ORDER BY doc_id LIMIT 2000"),
    // span-removal replica: same raw-token 3-gram spans, same
    // cross-document sharing rule, same covered-position cut and
    // ordered reassembly
    "x_span_remove" ->
      (raw"WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 2 = 0 THEN ' please accept all cookies to continue' ELSE '' END AS text FROM documents), " +
        raw"w AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), t -> len(t) > 0) AS w FROM aug), " +
        "sp AS (SELECT doc_id, unnest(range(0, greatest(len(w) - 2, 0))) AS pos, w FROM w), " +
        "sp2 AS (SELECT doc_id, pos, array_to_string(w[pos+1:pos+3], ' ') AS span FROM sp), " +
        "shared AS (SELECT span FROM sp2 GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2), " +
        "cov AS (SELECT DISTINCT s.doc_id, s.pos + d.d AS cp FROM sp2 s JOIN shared USING (span), (SELECT unnest([0, 1, 2]) AS d) d), " +
        "tok AS (SELECT doc_id, unnest(w) AS tok, unnest(range(0, len(w))) AS cp FROM w), " +
        "kept AS (SELECT t.doc_id, t.cp, t.tok FROM tok t ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.cp = c.cp), " +
        "r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY cp) AS clean_text, COUNT(*) AS n_kept FROM kept GROUP BY doc_id) " +
        "SELECT w.doc_id, COALESCE(r.clean_text, '') AS clean_text, " +
        "CAST(len(w.w) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed " +
        "FROM w LEFT JOIN r USING (doc_id) ORDER BY doc_id LIMIT 2000"),
    // curation-audit replica: the x_curate chain with CASE staging in
    // pipeline precedence instead of the final filter
    "x_curation_audit" ->
      (s"WITH $qualityCtes, " +
        "kept AS (SELECT min(doc_id) AS doc_id FROM documents WHERE doc_id IN (SELECT doc_id FROM qkept) GROUP BY text), " +
        jaccardPairsCte(" WHERE doc_id IN (SELECT doc_id FROM kept)") + ", " +
        "losers AS (SELECT DISTINCT id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.85), " +
        "surv AS (SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT id_b FROM losers)), " +
        "ewords AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents WHERE doc_id % 97 = 0), " +
        "esh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) <= 3 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] END) AS s FROM ewords), " +
        "ev AS (SELECT DISTINCT unnest(s) AS shingle FROM esh), " +
        "cont AS (SELECT p.doc_id FROM (SELECT sh.doc_id, unnest(sh.s) AS shingle FROM sh " +
        "WHERE sh.doc_id IN (SELECT doc_id FROM surv)) p " +
        "JOIN ev USING (shingle) GROUP BY p.doc_id HAVING COUNT(*) >= 5) " +
        "SELECT d.doc_id, CASE " +
        "WHEN s.lang_pred <> 'en' THEN 'lang' " +
        "WHEN s.quality < 0.3 THEN 'quality' " +
        "WHEN s.n_tokens NOT BETWEEN 5 AND 100000 THEN 'length' " +
        "WHEN d.doc_id NOT IN (SELECT doc_id FROM kept) THEN 'exact_dup' " +
        "WHEN d.doc_id IN (SELECT id_b FROM losers) THEN 'near_dup' " +
        "WHEN d.doc_id IN (SELECT doc_id FROM cont) THEN 'decontam' " +
        "WHEN (d.doc_id * 2654435761) % 1000 < 900 THEN 'kept:train' " +
        "WHEN (d.doc_id * 2654435761) % 1000 < 950 THEN 'kept:val' " +
        "ELSE 'kept:test' END AS stage " +
        "FROM documents d JOIN scored s USING (doc_id) ORDER BY d.doc_id LIMIT 2000"),
    // deterministic export shuffle: multiplicative-hash permutation key
    "x_det_shuffle" ->
      ("SELECT o_orderkey, o_custkey, " +
        "(o_orderkey * 2654435761 + 17) % 1000003 AS shuffle_key " +
        "FROM orders ORDER BY shuffle_key, o_orderkey LIMIT 200"),
    // deterministic train/val/test split: id-hash per-mille buckets
    "x_split" ->
      ("SELECT doc_id, CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT doc_id, (doc_id * 2654435761) % 1000 AS b FROM documents) " +
        "ORDER BY doc_id LIMIT 2000"),
    // split-leakage audit: exact-Jaccard ≥ 0.8 pairs whose members land
    // in different halves of the plain 80/20 hash split
    "x_split_audit" ->
      (s"WITH ${jaccardPairsCte()}, " +
        "gold AS (SELECT id_a, id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8), " +
        "sp AS (SELECT doc_id, CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train' ELSE 'test' END AS split FROM documents) " +
        "SELECT g.id_a, g.id_b, a.split AS split_a, b.split AS split_b FROM gold g " +
        "JOIN sp a ON a.doc_id = g.id_a JOIN sp b ON b.doc_id = g.id_b " +
        "WHERE a.split <> b.split ORDER BY g.id_a, g.id_b LIMIT 500"),
    // leakage-safe split: the x_dedup_groups recursive CC labels feed the
    // same hash rule, keyed by COALESCE(group_id, doc_id)
    "x_leakage_split" ->
      (s"WITH RECURSIVE ${jaccardPairsCte()}, " +
        "gold AS (SELECT id_a, id_b FROM pairs WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8), " +
        "edges AS (SELECT id_a AS src, id_b AS dst FROM gold UNION SELECT id_b, id_a FROM gold), " +
        "reach AS (SELECT src AS id, src AS peer FROM edges " +
        "UNION SELECT r.id, e.dst FROM reach r JOIN edges e ON r.peer = e.src), " +
        "grp AS (SELECT id, MIN(peer) AS group_id FROM reach GROUP BY id), " +
        "keyed AS (SELECT d.doc_id, COALESCE(g.group_id, d.doc_id) AS k FROM documents d LEFT JOIN grp g ON g.id = d.doc_id) " +
        "SELECT doc_id, CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val' ELSE 'test' END AS split " +
        "FROM (SELECT doc_id, (k * 2654435761) % 1000 AS b FROM keyed) " +
        "ORDER BY doc_id LIMIT 2000"),
    // BPE first-iteration pair counts: adjacent code-point pairs inside
    // whitespace-split lowercased words, every occurrence counted
    "x_bpe_pairs" ->
      ("WITH w AS (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word FROM documents), " +
        "p AS (SELECT unnest([word[i:i] || ' ' || word[i+1:i+1] for i in range(1, len(word))]) AS pair " +
        "FROM w WHERE len(word) >= 2) " +
        "SELECT str_split(pair, ' ')[1] AS pair_a, str_split(pair, ' ')[2] AS pair_b, " +
        "COUNT(*) AS cnt FROM p GROUP BY pair_a, pair_b " +
        "ORDER BY cnt DESC, pair_a, pair_b LIMIT 40"),
    // corpus symbol statistics under the empty vocabulary: every code
    // point of every whitespace-split lowercased word; n_docs counts the
    // whole corpus (symbol-less documents included — explode_outer)
    "x_bpe_vocab" ->
      ("WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word FROM documents), " +
        "c AS (SELECT doc_id, unnest([word[i:i] for i in range(1, len(word) + 1)]) AS sym " +
        "FROM w WHERE len(word) >= 1) " +
        "SELECT COUNT(*) AS total_symbols, COUNT(DISTINCT sym) AS distinct_symbols, " +
        "(SELECT COUNT(*) FROM documents) AS n_docs FROM c"),
    // corpus vocabulary: top-100 tokens by document frequency
    "x_vocab_top" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token FROM documents) " +
        "SELECT token, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS term_freq FROM toks " +
        "WHERE len(token) > 0 GROUP BY token ORDER BY doc_freq DESC, token LIMIT 100"),
    // vocabulary divergence replica: same union-vocab add-0.5 smoothing,
    // same p/q/m expression trees, ln fold, micro-unit BIGINT snap
    "x_vocab_divergence" ->
      (raw"WITH ta AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang = 'en'), " +
        raw"tb AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang = 'es'), " +
        "va AS (SELECT tok, COUNT(*) AS ca FROM ta GROUP BY tok), " +
        "vb AS (SELECT tok, COUNT(*) AS cb FROM tb GROUP BY tok), " +
        "j AS (SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM va FULL OUTER JOIN vb ON va.tok = vb.tok), " +
        "t AS (SELECT SUM(ca) AS ta2, SUM(cb) AS tb2, COUNT(*) AS v, " +
        "SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS vocab_a, " +
        "SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vocab_b, " +
        "SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS vocab_shared FROM j), " +
        "s AS (SELECT (CAST(ca AS DOUBLE) + 0.5) / (CAST(ta2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS p, " +
        "(CAST(cb AS DOUBLE) + 0.5) / (CAST(tb2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS q FROM j, t) " +
        // micro-unit BIGINTs floor-snapped AFTER the fold: a 1-ulp ln
        // difference across engines moves the pre-floor sum by ~1e-10
        // of a grid step — integers hash identically everywhere
        // explicit BIGINT casts: DuckDB SUM(int) returns HUGEINT, which
        // pandas renders as float64 (`31.0` vs Spark's int64 `31`) —
        // value-equal but representation-unequal, flipping a hash compare
        "SELECT CAST(t.vocab_a AS BIGINT) AS vocab_a, " +
        "CAST(t.vocab_b AS BIGINT) AS vocab_b, " +
        "CAST(t.vocab_shared AS BIGINT) AS vocab_shared, " +
        "CAST(FLOOR(SUM(0.5 * p * ln(p / ((p + q) / 2.0)) + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1000000.0 + 0.5) AS BIGINT) AS jsd_micro, " +
        "CAST(FLOOR(SUM(p * ln(p / q)) * 1000000.0 + 0.5) AS BIGINT) AS kl_ab_micro, " +
        "CAST(FLOOR(SUM(q * ln(q / p)) * 1000000.0 + 0.5) AS BIGINT) AS kl_ba_micro " +
        "FROM s, t GROUP BY 1, 2, 3"),
    // per-token divergence attribution: same smoothed log-ratio, total
    // order (|log_ratio| desc, token asc), top 20
    "x_divergent_tokens" ->
      (raw"WITH ta AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang = 'en'), " +
        raw"tb AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang = 'es'), " +
        "va AS (SELECT tok, COUNT(*) AS ca FROM ta GROUP BY tok), " +
        "vb AS (SELECT tok, COUNT(*) AS cb FROM tb GROUP BY tok), " +
        "j AS (SELECT COALESCE(va.tok, vb.tok) AS tok, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM va FULL OUTER JOIN vb ON va.tok = vb.tok), " +
        "t AS (SELECT SUM(ca) AS ta2, SUM(cb) AS tb2, COUNT(*) AS v FROM j) " +
        "SELECT tok AS token, ca AS cnt_a, cb AS cnt_b, " +
        "CAST(FLOOR(ln(((CAST(ca AS DOUBLE) + 0.5) / (CAST(ta2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE))) / " +
        "((CAST(cb AS DOUBLE) + 0.5) / (CAST(tb2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)))) * 1000000.0 + 0.5) AS BIGINT) AS log_ratio_micro " +
        "FROM j, t ORDER BY abs(log_ratio_micro) DESC, token LIMIT 20"),
    // OOV replica: same top-500 vocabulary (freq desc, token asc), same
    // coverage fold. Hashed surface is the two exact counts only —
    // the oov RATE is derivable (1 − covered/n_tokens) and stays a
    // report column in the operator (integer-surface rule, COVERAGE.md)
    "x_oov_rate" ->
      (raw"WITH toks AS (SELECT lang AS grp, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents), " +
        "c AS (SELECT grp, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2), " +
        "v AS (SELECT tok FROM (SELECT tok, SUM(c) AS tc FROM c GROUP BY tok ORDER BY tc DESC, tok LIMIT 500) t0) " +
        "SELECT c.grp AS lang, CAST(SUM(c.c) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN c.c ELSE 0 END) AS BIGINT) AS covered " +
        "FROM c LEFT JOIN v ON v.tok = c.tok GROUP BY 1 ORDER BY 1"),
    // served-drift replica: the routed answer must equal a batch
    // recomputation of the same divergence (reference = en side A,
    // streamed non-en = side B) — same smoothing, same micro snap
    "x_served_drift" ->
      (raw"WITH ta AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang = 'en'), " +
        raw"tb AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok FROM documents WHERE lang <> 'en'), " +
        "va AS (SELECT tok, COUNT(*) AS ca FROM ta GROUP BY tok), " +
        "vb AS (SELECT tok, COUNT(*) AS cb FROM tb GROUP BY tok), " +
        "j AS (SELECT COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb FROM va FULL OUTER JOIN vb ON va.tok = vb.tok), " +
        "t AS (SELECT SUM(ca) AS ta2, SUM(cb) AS tb2, COUNT(*) AS v, " +
        "SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS vocab_a, " +
        "SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS vocab_b, " +
        "SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS vocab_shared FROM j), " +
        "s AS (SELECT (CAST(ca AS DOUBLE) + 0.5) / (CAST(ta2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS p, " +
        "(CAST(cb AS DOUBLE) + 0.5) / (CAST(tb2 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS q FROM j, t) " +
        // explicit BIGINT casts: DuckDB SUM(int) returns HUGEINT, which
        // pandas renders as float64 (`31.0` vs Spark's int64 `31`) —
        // value-equal but representation-unequal, flipping a hash compare
        "SELECT CAST(t.vocab_a AS BIGINT) AS vocab_a, " +
        "CAST(t.vocab_b AS BIGINT) AS vocab_b, " +
        "CAST(t.vocab_shared AS BIGINT) AS vocab_shared, " +
        "CAST(FLOOR(SUM(0.5 * p * ln(p / ((p + q) / 2.0)) + 0.5 * q * ln(q / ((p + q) / 2.0))) * 1000000.0 + 0.5) AS BIGINT) AS jsd_micro, " +
        "CAST(FLOOR(SUM(p * ln(p / q)) * 1000000.0 + 0.5) AS BIGINT) AS kl_ab_micro, " +
        "CAST(FLOOR(SUM(q * ln(q / p)) * 1000000.0 + 0.5) AS BIGINT) AS kl_ba_micro " +
        "FROM s, t GROUP BY 1, 2, 3"),
    // per-stratum quantile cut: exact interpolated percentile threshold
    // (quantile_cont ≡ Spark percentile), boundary ties kept
    "x_quantile_cut" ->
      ("WITH thr AS (SELECT source, quantile_cont(n_chars, 0.7) AS t FROM documents GROUP BY source) " +
        "SELECT d.doc_id, d.source, d.n_chars FROM documents d JOIN thr ON thr.source = d.source " +
        "WHERE d.n_chars >= thr.t ORDER BY d.doc_id"),
    // DSIR replica: word unigrams+bigrams (WordShingles semantics:
    // short texts collapse to one whole-text shingle, blanks to none),
    // md5-digit bucket hash, add-one smoothing over the FULL 4096-
    // bucket space, same ln expression tree, ROUND 6
    "x_dsir" ->
      (raw"WITH w AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents), " +
        "ng AS (SELECT doc_id, lang, list_concat(" +
        "CASE WHEN len(w) = 1 AND w[1] = '' THEN CAST([] AS VARCHAR[]) ELSE w END, " +
        "CASE WHEN len(w) = 1 AND w[1] = '' THEN CAST([] AS VARCHAR[]) " +
        "WHEN len(w) <= 2 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END) AS ngrams FROM w), " +
        "fe AS (SELECT doc_id, lang, " +
        "(strpos('0123456789abcdef', md5(ngram)[1:1]) - 1) * 256 " +
        "+ (strpos('0123456789abcdef', md5(ngram)[2:2]) - 1) * 16 " +
        "+ (strpos('0123456789abcdef', md5(ngram)[3:3]) - 1) AS bucket " +
        "FROM (SELECT doc_id, lang, unnest(ngrams) AS ngram FROM ng)), " +
        "cr AS (SELECT bucket, COUNT(*) AS c_r FROM fe GROUP BY 1), " +
        "ct AS (SELECT bucket, COUNT(*) AS c_t FROM fe WHERE lang = 'en' GROUP BY 1), " +
        "f AS (SELECT COALESCE(cr.bucket, ct.bucket) AS bucket, COALESCE(c_r, 0) AS c_r, " +
        "COALESCE(c_t, 0) AS c_t FROM cr FULL OUTER JOIN ct ON cr.bucket = ct.bucket), " +
        "tot AS (SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t FROM f), " +
        "sc AS (SELECT bucket, ln((c_t + 1.0) / (t_t + 4096.0)) - ln((c_r + 1.0) / (t_r + 4096.0)) AS log_ratio " +
        "FROM f, tot) " +
        "SELECT fe.doc_id, COUNT(*) AS n_feats, " +
        "ROUND(SUM(sc.log_ratio), 6) + 0.0 AS dsir_logw, " +
        "ROUND(AVG(sc.log_ratio), 6) + 0.0 AS avg_logw, " +
        "ROUND(AVG(sc.log_ratio), 6) > 0 AS selected " +
        "FROM fe JOIN sc USING (bucket) GROUP BY fe.doc_id ORDER BY fe.doc_id"),
    // token-window chunking replica: same tokens, same chunk-count
    // formula (1 + ceil((n-64)/48) capped below at 1), same slices
    "x_chunk_tokens" ->
      (raw"WITH t AS (SELECT doc_id, CASE WHEN len(w) = 1 AND w[1] = '' THEN CAST([] AS VARCHAR[]) ELSE w END AS t " +
        raw"FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)), " +
        "n AS (SELECT doc_id, t, CASE WHEN len(t) <= 64 THEN 1 " +
        "ELSE CAST(CEIL((len(t) - 64) / 48.0) AS INT) + 1 END AS n_chunks FROM t), " +
        "c AS (SELECT doc_id, t, unnest(range(0, n_chunks)) AS chunk_idx FROM n) " +
        "SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, " +
        "CAST(chunk_idx * 48 AS BIGINT) AS start_token, " +
        "CAST(len(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT) AS n_chunk_tokens, " +
        "array_to_string(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text " +
        "FROM c ORDER BY doc_id, chunk_idx LIMIT 500"),
    // LR gradient-step replica: same feature formulas (the
    // x_text_analyze CTE arithmetic, features rounded 4 BEFORE the
    // sigmoid so both engines feed identical inputs), same margin,
    // grad = mean((sigma(z) - y) * x), ROUND 6
    "x_lr_step" ->
      (raw"WITH f AS (SELECT " +
        raw"CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) / 100.0 AS tok_norm, " +
        "ROUND(CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS punct, " +
        "ROUND(CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS digit, " +
        "CAST(lang = 'en' AS DOUBLE) AS y FROM documents), " +
        "e AS (SELECT tok_norm, punct, digit, " +
        "1.0 / (1.0 + exp(-(0.8 * tok_norm + -2.0 * punct + 1.5 * digit + -0.5))) - y AS err FROM f) " +
        "SELECT * FROM (" +
        "SELECT '__bias' AS feature, ROUND(AVG(err), 6) + 0.0 AS grad FROM e " +
        "UNION ALL SELECT 'tok_norm', ROUND(AVG(err * tok_norm), 6) + 0.0 FROM e " +
        "UNION ALL SELECT 'punct', ROUND(AVG(err * punct), 6) + 0.0 FROM e " +
        "UNION ALL SELECT 'digit', ROUND(AVG(err * digit), 6) + 0.0 FROM e" +
        ") ORDER BY feature"),
    // Gumbel top-k replica: same md5-digit 24-bit uniform, same
    // log-weight, same key expression, ROUND 6 after the order
    "x_gumbel_topk" ->
      (raw"WITH d AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
        raw"ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens FROM documents), " +
        "g AS (SELECT doc_id, n_tokens, ln(n_tokens + 1.0) - ln(-ln(((" +
        "(strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[1:1]) - 1) * 1048576.0 " +
        "+ (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[2:2]) - 1) * 65536.0 " +
        "+ (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[3:3]) - 1) * 4096.0 " +
        "+ (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[4:4]) - 1) * 256.0 " +
        "+ (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[5:5]) - 1) * 16.0 " +
        "+ (strpos('0123456789abcdef', md5(CAST(doc_id AS VARCHAR) || ':17')[6:6]) - 1) " +
        ") + 0.5) / 16777216.0)) AS key FROM d) " +
        "SELECT doc_id, n_tokens, ROUND(key, 6) + 0.0 AS gumbel_key " +
        "FROM g ORDER BY key DESC, doc_id LIMIT 50"),
    // grouped top-k replica: same ROW_NUMBER window, same tie-break
    "x_grouped_topk" ->
      ("SELECT lang, doc_id, n_chars FROM (SELECT lang, doc_id, n_chars, " +
        "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rk " +
        "FROM documents) t WHERE rk <= 2 ORDER BY lang, doc_id"),
    // Moore-Lewis replica: identical add-one-smoothed unigram LMs over
    // the union vocabulary, same ln expression tree, ROUND 6
    "x_moore_lewis" ->
      ("WITH rt AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token FROM documents), " +
        "rtk AS (SELECT * FROM rt WHERE len(token) > 0), " +
        "ttk AS (SELECT token FROM (SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token " +
        "FROM documents WHERE lang = 'en') WHERE len(token) > 0), " +
        "cr AS (SELECT token, COUNT(*) AS c_r FROM rtk GROUP BY 1), " +
        "ct AS (SELECT token, COUNT(*) AS c_t FROM ttk GROUP BY 1), " +
        "f AS (SELECT COALESCE(cr.token, ct.token) AS token, COALESCE(c_r, 0) AS c_r, " +
        "COALESCE(c_t, 0) AS c_t FROM cr FULL OUTER JOIN ct ON cr.token = ct.token), " +
        "tot AS (SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t, COUNT(*) AS v FROM f), " +
        "sc AS (SELECT token, ln((c_t + 1.0) / (t_t + 1.0 * v)) - ln((c_r + 1.0) / (t_r + 1.0 * v)) AS log_ratio " +
        "FROM f, tot) " +
        "SELECT r.doc_id, COUNT(*) AS n_tokens, ROUND(AVG(sc.log_ratio), 6) + 0.0 AS ce_diff, " +
        "ROUND(AVG(sc.log_ratio), 6) > 0 AS selected " +
        "FROM rtk r JOIN sc USING (token) GROUP BY r.doc_id ORDER BY r.doc_id"),
    // line-level corpus dedup replica: same deterministic multi-line
    // augmentation, per-line doc frequency, anti-join, ordered rebuild
    "x_line_dedup" ->
      ("WITH aug AS (SELECT doc_id, text " +
        "|| CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'cookie notice applies' ELSE '' END " +
        "|| CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter' ELSE '' END " +
        "|| CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'doc ' || doc_id || ' footer' ELSE '' END AS text " +
        "FROM documents), " +
        "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, " +
        "unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos FROM aug), " +
        "b AS (SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 50), " +
        "k AS (SELECT l.* FROM l ANTI JOIN b USING (line)), " +
        "r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text, " +
        "COUNT(*) AS n_kept FROM k GROUP BY doc_id), " +
        "n AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_lines FROM aug) " +
        "SELECT n.doc_id, COALESCE(r.clean_text, '') AS clean_text, " +
        "CAST(n.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed " +
        "FROM n LEFT JOIN r USING (doc_id) ORDER BY doc_id"),
    // per-document duplicated-span fraction (Lee et al. ExactSubstr
    // signal as an inverted n-gram index): spans shared with >= 1 other
    // document, counted per document — no pair generation on either side
    "x_span_dup" ->
      (s"WITH ${jaccardPairsCte()}, " +
        "shared AS (SELECT shingle FROM postings GROUP BY shingle HAVING COUNT(*) >= 2), " +
        "per AS (SELECT doc_id, COUNT(*) AS n_shared FROM postings JOIN shared USING (shingle) GROUP BY doc_id) " +
        "SELECT sh.doc_id, len(sh.s) AS n_spans, COALESCE(per.n_shared, 0) AS n_shared, " +
        "round(CASE WHEN len(sh.s) <= 0 THEN 0.0 ELSE CAST(COALESCE(per.n_shared, 0) AS DOUBLE) / len(sh.s) END, 4) AS dup_span_frac " +
        "FROM sh LEFT JOIN per USING (doc_id) ORDER BY doc_id LIMIT 200"),
    // BM25 top-10 for a fixed 3-term query: Lucene idf + Okapi tf
    // saturation, replicated term-for-term (both engines round the
    // summed score to 4dp BEFORE the final order, so ties break by
    // doc_id identically)
    "x_bm25" ->
      (raw"WITH d AS (SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN 0 " +
        raw"ELSE length(string_split_regex(trim(text), '\s+')) END AS dl FROM documents), " +
        "st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d), " +
        raw"tk AS (SELECT doc_id, dl, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM d), " +
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tk WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3), " +
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "sc AS (SELECT tf.doc_id, SUM(ln(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) * tf.tf * 2.2 / " +
        "(tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) AS s " +
        "FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st GROUP BY tf.doc_id) " +
        "SELECT doc_id, round(s, 4) AS score FROM sc ORDER BY score DESC, doc_id LIMIT 10"),
    // one k-means E+M update from the probe centroids: assignment is the
    // x_cluster_assign argmax, the M-step is a per-(cluster, dimension)
    // average in long form
    "x_kmeans_step" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
        "x AS (SELECT e.vec_id, c.cid, CAST(list_cosine_similarity(e.emb, c.cemb) AS DOUBLE) AS cos FROM e, c), " +
        "a AS (SELECT vec_id, cid AS cluster FROM (SELECT vec_id, cid, cos, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM x) WHERE rn = 1), " +
        "m AS (SELECT a.cluster, CAST(r.i AS INT) AS pos, round(avg(e.emb[r.i + 1]), 6) AS value, " +
        "COUNT(*) AS n_members FROM a JOIN e ON a.vec_id = e.vec_id CROSS JOIN range(0, 64) r(i) " +
        "GROUP BY a.cluster, r.i) " +
        "SELECT CAST(cluster AS BIGINT) AS cluster, pos, value, n_members FROM m ORDER BY cluster, pos LIMIT 1000"),
    // per-document top-3 TF-IDF keywords; DuckDB ln == Spark log
    // (natural); document frequency derives from the distinct
    // (doc, token) pairs on both sides
    "x_tfidf_top" ->
      ("WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token FROM documents), " +
        "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE len(token) > 0 GROUP BY 1, 2), " +
        "dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token), " +
        "n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents), " +
        "s AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df, tf.tf * ln(CAST(n_docs AS DOUBLE) / dfq.df) AS tfidf FROM tf JOIN dfq USING (token), n), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank FROM s) " +
        "SELECT doc_id, token, tf, df, round(tfidf, 4) AS tfidf, rank FROM r WHERE rank <= 3 " +
        "ORDER BY doc_id, rank LIMIT 300"),
    // corpus bigram LM counts + conditional probability P(w2|w1);
    // docs with < 2 tokens carry no bigram (mirrored filters)
    "x_bigram_lm" ->
      ("WITH words AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents), " +
        "ok AS (SELECT w FROM words WHERE len(w) >= 2), " +
        "bg AS (SELECT unnest(CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END) AS bigram FROM ok), " +
        "c AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram), " +
        "p AS (SELECT bigram, n, round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)), 6) AS cond_p FROM c) " +
        "SELECT bigram, n, cond_p FROM p ORDER BY n DESC, bigram LIMIT 100"),
    // URL extraction over deterministically-augmented text (every 4th
    // doc gains two links); one row per URL occurrence with its host
    "x_url_extract" ->
      ("WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN text || ' see https://www.site' || (doc_id % 20) || " +
        "'.example.org/p/' || doc_id || ' and http://cdn' || (doc_id % 7) || '.example.net' ELSE text END AS text FROM documents), " +
        s"u AS (SELECT doc_id, unnest(regexp_extract_all(text, '${graft.operators.TextAnalysis.UrlPattern}')) AS url FROM aug) " +
        "SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1) AS domain FROM u " +
        "ORDER BY doc_id, url LIMIT 300"),
    // exact per-group percentiles (PERCENTILE_CONT semantics: linear
    // interpolation at rank p*(n-1) on both engines)
    "x_percentiles" ->
      ("SELECT event_type, COUNT(*) AS n, round(quantile_cont(value, 0.5), 4) AS p50, " +
        "round(quantile_cont(value, 0.95), 4) AS p95 FROM events GROUP BY event_type " +
        "ORDER BY event_type LIMIT 100"),
    // boilerplate removal: 16-token segments occurring in > 2 distinct
    // docs drop; documents reassemble from surviving segments in order
    "x_boilerplate" ->
      ("WITH toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t, " +
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents), " +
        "c AS (SELECT doc_id, t, greatest(1, CAST(ceil(CAST(n AS DOUBLE) / 16) AS INT)) AS nc FROM toks WHERE n > 0), " +
        "e AS (SELECT doc_id, t, CAST(unnest(range(nc)) AS INT) AS chunk_index FROM c), " +
        "ch AS (SELECT doc_id, chunk_index, array_to_string(t[chunk_index * 16 + 1 : chunk_index * 16 + 16], ' ') AS chunk_text FROM e), " +
        "boiler AS (SELECT chunk_text FROM (SELECT DISTINCT doc_id, chunk_text FROM ch) GROUP BY chunk_text HAVING COUNT(*) > 2), " +
        "kept AS (SELECT * FROM ch WHERE chunk_text NOT IN (SELECT chunk_text FROM boiler)) " +
        "SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_index) AS clean_text, " +
        "COUNT(*) AS n_kept_chunks FROM kept GROUP BY doc_id ORDER BY doc_id LIMIT 200"),
    // token-length histogram (50-token buckets) — corpus reporting
    "x_len_hist" ->
      ("SELECT CAST(floor(CAST(n AS DOUBLE) / 50) * 50 AS BIGINT) AS bucket, COUNT(*) AS n_docs " +
        "FROM (SELECT CASE WHEN length(trim(text)) = 0 THEN 0 ELSE length(string_split_regex(trim(text), '\\s+')) END AS n FROM documents) " +
        "GROUP BY 1 ORDER BY 1 LIMIT 100"),
    // k-NN join: top-5 corpus neighbors for each of 4 query vectors in
    // one plan (per-query window rank; DuckDB replicates the cross join)
    "x_knn_join" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 4), " +
        "x AS (SELECT q.query_id, e.vec_id, CAST(list_cosine_similarity(e.emb, q.qemb) AS DOUBLE) AS cos FROM e, q), " +
        "r AS (SELECT query_id, vec_id, cos, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM x) " +
        "SELECT query_id, vec_id, round(cos, 4) AS cosine, rank FROM r WHERE rank <= 5 " +
        "ORDER BY query_id, rank LIMIT 100"),
    // retrieval-metrics replica: same shard top-10 window, same
    // threshold gold, same recall/MRR arithmetic, ROUND 6
    "x_retrieval_metrics" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, emb AS qemb FROM e WHERE vec_id < 20), " +
        "x AS (SELECT q.query_id, s.vec_id AS id, CAST(list_cosine_similarity(s.emb, q.qemb) AS DOUBLE) AS cos " +
        "FROM (SELECT * FROM e WHERE vec_id % 2 = 0) s, q), " +
        "p AS (SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id) AS rank FROM x), " +
        "pk AS (SELECT query_id, id, rank FROM p WHERE rank <= 10), " +
        "g AS (SELECT q.query_id, e.vec_id AS id FROM e, q " +
        "WHERE CAST(list_cosine_similarity(e.emb, q.qemb) AS DOUBLE) >= 0.97 AND e.vec_id <> q.query_id), " +
        "gc AS (SELECT query_id, COUNT(*) AS n_gold FROM g GROUP BY 1), " +
        "h AS (SELECT pk.query_id, COUNT(*) AS n_hit, MIN(rank) AS frst FROM pk JOIN g USING (query_id, id) GROUP BY 1) " +
        "SELECT gc.query_id, gc.n_gold, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, " +
        "ROUND(COALESCE(h.n_hit, 0) * 1.0 / gc.n_gold, 6) AS recall, " +
        "ROUND(CASE WHEN h.frst IS NULL THEN 0.0 ELSE 1.0 / h.frst END, 6) AS rr " +
        "FROM gc LEFT JOIN h USING (query_id) ORDER BY query_id"),
    // hard negatives replica: same cosine ranking with the label
    // mismatch applied before ranking
    "x_hard_negatives" ->
      ("WITH e AS (SELECT m.vec_id, CAST(m.embedding AS DOUBLE[]) AS emb, d.source " +
        "FROM embeddings m JOIN documents d ON d.doc_id = m.vec_id), " +
        "a AS (SELECT vec_id AS anchor_id, emb AS aemb, source AS albl FROM e WHERE vec_id < 4), " +
        "x AS (SELECT a.anchor_id, e.vec_id, e.source AS neg_label, " +
        "CAST(list_cosine_similarity(e.emb, a.aemb) AS DOUBLE) AS cos " +
        "FROM e, a WHERE e.source <> a.albl), " +
        "r AS (SELECT anchor_id, vec_id, neg_label, cos, " +
        "row_number() OVER (PARTITION BY anchor_id ORDER BY cos DESC, vec_id) AS rank FROM x) " +
        "SELECT anchor_id, vec_id, neg_label, round(cos, 4) AS cosine, rank FROM r " +
        "WHERE rank <= 5 ORDER BY anchor_id, rank LIMIT 100"),
    // IVF-pruned k-NN join: gold is the brute-force per-query top-5 over
    // the planted-cluster frame (cell pruning must lose nothing there)
    "x_knn_join_ivf" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
        "cl AS (SELECT e.vec_id, [c.cemb[i] + 0.05 * e.emb[i] for i in range(1, 65)] AS emb " +
        "FROM e JOIN c ON e.vec_id % 8 = c.cid), " +
        "q AS (SELECT vec_id AS query_id, emb AS qemb FROM cl WHERE vec_id IN (1, 2, 3)), " +
        "x AS (SELECT q.query_id, cl.vec_id, CAST(list_cosine_similarity(cl.emb, q.qemb) AS DOUBLE) AS cos FROM cl, q), " +
        "r AS (SELECT query_id, vec_id, cos, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM x) " +
        "SELECT query_id, vec_id, round(cos, 4) AS cosine, rank FROM r WHERE rank <= 5 " +
        "ORDER BY query_id, rank LIMIT 100"),
    // batch IVF-PQ k-NN join: same brute-force gold as x_knn_join_ivf —
    // IVF pruning is exact on the planted clusters and the candidate cut
    // is wide enough that the float re-rank reproduces the exact top-5
    "x_knn_join_ivfpq" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
        "cl AS (SELECT e.vec_id, [c.cemb[i] + 0.05 * e.emb[i] for i in range(1, 65)] AS emb " +
        "FROM e JOIN c ON e.vec_id % 8 = c.cid), " +
        "q AS (SELECT vec_id AS query_id, emb AS qemb FROM cl WHERE vec_id IN (1, 2, 3)), " +
        "x AS (SELECT q.query_id, cl.vec_id, CAST(list_cosine_similarity(cl.emb, q.qemb) AS DOUBLE) AS cos FROM cl, q), " +
        "r AS (SELECT query_id, vec_id, cos, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM x) " +
        "SELECT query_id, vec_id, round(cos, 4) AS cosine, rank FROM r WHERE rank <= 5 " +
        "ORDER BY query_id, rank LIMIT 100"),
    // nearest-centroid assignment (fixed probe centroids = vec_id < 8 so
    // the argmax is SQL-expressible); ties break to the lower centroid id
    "x_cluster_assign" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e WHERE vec_id < 8), " +
        "x AS (SELECT e.vec_id, c.cid, CAST(list_cosine_similarity(e.emb, c.cemb) AS DOUBLE) AS cos FROM e, c), " +
        "r AS (SELECT vec_id, cid, cos, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM x) " +
        "SELECT vec_id, cid AS cluster, round(cos, 4) AS cosine FROM r WHERE rn = 1 " +
        "ORDER BY vec_id LIMIT 2000"),
    // SemDeDup: the CLUSTER-SCOPED pair semantics replicated exactly —
    // assignment to the fixed probe centroids (ties to the lower cid on
    // both engines), then pairs within the same assigned cluster only;
    // planted copies (+0.25 on the first component, cosine ≈ 0.97)
    // provide the positives, organic pairs max out at 0.51
    "x_semdedup" ->
      ("WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "pl AS (SELECT vec_id + 100000 AS vec_id, list_concat([emb[1] + 0.25], emb[2:]) AS emb FROM e0 WHERE vec_id < 25), " +
        "e AS (SELECT * FROM e0 UNION ALL SELECT * FROM pl), " +
        "c AS (SELECT vec_id AS cid, emb AS cemb FROM e0 WHERE vec_id < 8), " +
        "x AS (SELECT e.vec_id, c.cid, CAST(list_cosine_similarity(e.emb, c.cemb) AS DOUBLE) AS cos FROM e, c), " +
        "r AS (SELECT vec_id, cid, cos, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn FROM x), " +
        "a AS (SELECT vec_id, cid AS cluster FROM r WHERE rn = 1), " +
        "pr AS (SELECT a1.vec_id AS id_a, a2.vec_id AS id_b, a1.cluster, " +
        "CAST(list_cosine_similarity(e1.emb, e2.emb) AS DOUBLE) AS cos " +
        "FROM a a1 JOIN a a2 ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id " +
        "JOIN e e1 ON e1.vec_id = a1.vec_id JOIN e e2 ON e2.vec_id = a2.vec_id) " +
        "SELECT id_a, id_b, cluster, round(cos, 4) AS cosine FROM pr WHERE cos >= 0.95 " +
        "ORDER BY id_a, id_b LIMIT 100"),
    // semantic-decontamination replica: same perturbed eval set, same
    // cosine, same >= 0.9 gate and (cos desc, eval_id) argmax; the
    // hashed cosine is a floor-snapped x1e4 BIGINT (oracle rule)
    "x_sem_decontam" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "ev AS (SELECT vec_id AS eval_id, list_concat([emb[1] + 0.1], emb[2:]) AS emb FROM e WHERE vec_id % 11 = 0), " +
        "x AS (SELECT e.vec_id, ev.eval_id, CAST(list_cosine_similarity(e.emb, ev.emb) AS DOUBLE) AS cos FROM e, ev), " +
        "f AS (SELECT vec_id, eval_id, cos, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, eval_id) AS rn " +
        "FROM x WHERE cos >= 0.9) " +
        "SELECT vec_id, eval_id, CAST(FLOOR(cos * 10000.0 + 0.5) AS BIGINT) AS cos_x1e4 " +
        "FROM f WHERE rn = 1 ORDER BY vec_id"),
    // contamination attribution: (training doc, eval doc) pairs sharing
    // >= 5 distinct 3-gram shingles (postings CTE comes distinct per doc)
    "x_decontam_report" ->
      (s"WITH ${jaccardPairsCte()}, " +
        "ev AS (SELECT DISTINCT doc_id AS eval_id, shingle FROM postings WHERE doc_id % 97 = 0) " +
        "SELECT p.doc_id, ev.eval_id, COUNT(*) AS n_shared " +
        "FROM postings p JOIN ev USING (shingle) GROUP BY 1, 2 HAVING COUNT(*) >= 5 " +
        "ORDER BY doc_id, eval_id LIMIT 500"),
    // per-doc perplexity under the corpus bigram LM (unsmoothed — every
    // doc bigram exists in the LM by construction; same bigram CTE as
    // x_bigram_lm, docs with < 2 tokens absent on both sides)
    "x_perplexity" ->
      ("WITH words AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w FROM documents), " +
        "ok AS (SELECT doc_id, w FROM words WHERE len(w) >= 2), " +
        "bg AS (SELECT doc_id, unnest(CASE WHEN len(w) <= 2 THEN [array_to_string(w, ' ')] " +
        "ELSE [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] END) AS bigram FROM ok), " +
        "c AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram), " +
        "p AS (SELECT bigram, CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY split_part(bigram, ' ', 1)) AS p FROM c), " +
        "d AS (SELECT doc_id, COUNT(*) AS n_bigrams, AVG(ln(p.p)) AS alp FROM bg JOIN p USING (bigram) GROUP BY doc_id) " +
        "SELECT doc_id, n_bigrams, round(alp, 4) AS avg_logp, round(exp(-alp), 4) AS perplexity " +
        "FROM d ORDER BY doc_id LIMIT 200"),
    // the media table derives deterministically from documents (see
    // Multimodal.fromDocuments), so payload-size/kind/frame-count are
    // pure SQL over the text column
    "x_multimodal_features" ->
      ("SELECT doc_id AS media_id, " +
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 3 = 2 THEN greatest(1, CAST((1000 + (length(text) * 7) % 4000) // 1000 AS INT)) ELSE 1 END AS frames_sampled " +
        "FROM documents ORDER BY media_id LIMIT 100"),
    // decoded-pixel statistics: the PNGs are constant-color with
    // dimensions/channels a pure function of doc_id (Multimodal
    // .syntheticPngBytes contract), so the oracle recomputes what the
    // engine must read back OUT of the decoded pixels
    "x_multimodal_decode" ->
      ("WITH ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 100) " +
        "SELECT doc_id AS media_id, " +
        "CAST(8 + doc_id % 32 AS INT) AS width, " +
        "CAST(8 + doc_id % 16 AS INT) AS height, " +
        "3 AS channels, " +
        "round(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_r, " +
        "round(CAST((doc_id * 7) % 256 AS DOUBLE), 4) AS mean_g, " +
        "round(CAST((doc_id * 13) % 256 AS DOUBLE), 4) AS mean_b " +
        "FROM ids ORDER BY media_id"),
    // ordered funnel: step i's reach = users with a step-i event
    // strictly after their earliest step-(i-1) completion time
    "x_funnel" ->
      ("WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t " +
        "WHERE e.event_type = 'click' GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t " +
        "WHERE e.event_type = 'purchase' GROUP BY 1), " +
        "c AS (SELECT 1 AS step, 'signup' AS step_name, (SELECT COUNT(*) FROM s1) AS n_users " +
        "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) " +
        "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)) " +
        "SELECT step, step_name, n_users, " +
        "round(CAST(n_users AS DOUBLE) / GREATEST((SELECT n_users FROM c WHERE step = 1), 1), 4) AS conv " +
        "FROM c ORDER BY step"),
    // retention cohorts: first-seen day x day offset, retained share
    "x_retention_cohort" ->
      ("WITH fs AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort FROM events GROUP BY 1), " +
        "cs AS (SELECT cohort, COUNT(*) AS n FROM fs GROUP BY 1), " +
        "act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), " +
        "r AS (SELECT fs.cohort, date_diff('day', fs.cohort, act.day) AS day_offset, COUNT(*) AS n_active " +
        "FROM act JOIN fs USING (user_id) GROUP BY 1, 2) " +
        "SELECT CAST(r.cohort AS STRING) AS cohort_day, CAST(day_offset AS INT) AS day_offset, n_active, " +
        "round(CAST(n_active AS DOUBLE) / cs.n, 4) AS retention " +
        "FROM r JOIN cs ON r.cohort = cs.cohort ORDER BY cohort_day, day_offset LIMIT 2000"),
    // funnel timing: hours between consecutive step completions
    // (unix-second truncation ≡ date_diff('second') boundary counting)
    "x_funnel_timing" ->
      ("WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'signup' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t " +
        "WHERE e.event_type = 'click' GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t " +
        "WHERE e.event_type = 'purchase' GROUP BY 1), " +
        "t1 AS (SELECT date_diff('second', s1.t, s2.t) / 3600.0 AS h FROM s1 JOIN s2 USING (user_id)), " +
        "t2 AS (SELECT date_diff('second', s2.t, s3.t) / 3600.0 AS h FROM s2 JOIN s3 USING (user_id)) " +
        "SELECT 'signup→click' AS transition, COUNT(*) AS n_users, " +
        "round(AVG(h), 4) AS avg_hours, round(quantile_cont(h, 0.5), 4) AS p50_hours FROM t1 " +
        "UNION ALL SELECT 'click→purchase', COUNT(*), round(AVG(h), 4), round(quantile_cont(h, 0.5), 4) FROM t2 " +
        "ORDER BY transition"),
    // per-user next-event transition counts and P(next | current)
    "x_event_transitions" ->
      ("WITH p AS (SELECT user_id, event_type AS from_type, " +
        "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type FROM events), " +
        "c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
        "t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1) " +
        "SELECT c.from_type, c.to_type, c.n, round(CAST(c.n AS DOUBLE) / t.tot, 6) AS p " +
        "FROM c JOIN t USING (from_type) ORDER BY from_type, to_type"),
    // rolling retention replica: exact day-pair user intersections
    // (the sketch side is exact below 4096 users/day per its contract)
    "x_retention_sketch" ->
      ("WITH act AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events), " +
        "a AS (SELECT day, COUNT(*) AS n FROM act GROUP BY 1), " +
        "pairs AS (SELECT a1.day AS day, date_diff('day', a1.day, a2.day) AS k, a1.n AS n_day " +
        "FROM a a1 JOIN a a2 ON date_diff('day', a1.day, a2.day) IN (1, 7)), " +
        "i AS (SELECT x.day, date_diff('day', x.day, y.day) AS k, COUNT(*) AS n_both " +
        "FROM act x JOIN act y ON x.user_id = y.user_id AND date_diff('day', x.day, y.day) IN (1, 7) " +
        "GROUP BY 1, 2) " +
        "SELECT CAST(p.day AS STRING) AS day, CAST(p.k AS INT) AS day_offset, p.n_day, " +
        "COALESCE(i.n_both, 0) AS n_retained, " +
        "round(CAST(COALESCE(i.n_both, 0) AS DOUBLE) / p.n_day, 4) AS retention " +
        "FROM pairs p LEFT JOIN i ON p.day = i.day AND p.k = i.k " +
        "ORDER BY day, day_offset LIMIT 500"),
    // trailing-7-day rolling stats over (type, day) totals; RANGE
    // interval frame ≡ Spark's day-ordinal range frame
    "x_rolling_stats" ->
      ("WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, SUM(value) AS day_total " +
        "FROM events GROUP BY 1, 2) " +
        "SELECT event_type, CAST(day AS STRING) AS day, round(day_total, 4) AS day_total, " +
        "round(SUM(day_total) OVER w, 4) AS rolling_sum, " +
        "round(AVG(day_total) OVER w, 4) AS rolling_avg, " +
        "round(MAX(day_total) OVER w, 4) AS rolling_max, " +
        "COUNT(*) OVER w AS n_days_in_window " +
        "FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day " +
        "RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) " +
        "ORDER BY event_type, day LIMIT 500"),
    // per-type z-score anomalies (sample stddev on both engines)
    "x_anomaly_zscore" ->
      ("WITH st AS (SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd FROM events GROUP BY 1) " +
        "SELECT e.event_id, e.event_type, e.value, round((e.value - st.mu) / st.sd, 4) AS zscore " +
        "FROM events e JOIN st USING (event_type) " +
        "WHERE st.sd > 0 AND ABS((e.value - st.mu) / st.sd) > 2.5 " +
        "ORDER BY event_id LIMIT 500"),
    // robust MAD outliers: medians and MAD replicated with
    // quantile_cont (Spark's exact percentile interpolates identically);
    // flag margin measured 0.0018 at sf0.1 — far above engine drift
    "x_anomaly_mad" ->
      ("WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1), " +
        "dev AS (SELECT e.event_id, e.event_type, e.value, ABS(e.value - m.med) AS adev, m.med " +
        "FROM events e JOIN med m USING (event_type)), " +
        "mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1) " +
        "SELECT d.event_id, d.event_type, d.value, " +
        "round((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z " +
        "FROM dev d JOIN mad m USING (event_type) " +
        "WHERE m.mad > 0 AND d.adev > 3.0 * 1.4826 * m.mad " +
        "ORDER BY event_id LIMIT 500"),
    // filtered vector search: cosine top-10 over embeddings whose
    // document row passes the metadata predicate (selection by rounded
    // cosine is boundary-safe — see the Spark-side comment)
    "x_ann_filtered" ->
      ("SELECT e.vec_id, round(CAST(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine " +
        "FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id " +
        "WHERE d.lang = 'en' AND d.source IN ('src0', 'src1', 'src2', 'src3', 'src4') " +
        "ORDER BY cosine DESC, e.vec_id LIMIT 10"),
    // hybrid retrieval: BM25 top-50 (same scoring CTEs as x_bm25) and
    // cosine top-50 (same rounding as x_ann_topk), fused by
    // 1/(60+rank); each list ranks by (rounded score DESC, doc_id)
    "x_hybrid_rrf" ->
      (raw"WITH d AS (SELECT doc_id, text, CASE WHEN length(trim(text)) = 0 THEN 0 " +
        raw"ELSE length(string_split_regex(trim(text), '\s+')) END AS dl FROM documents), " +
        "st AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d), " +
        raw"tk AS (SELECT doc_id, dl, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term FROM d), " +
        "tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM tk WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2, 3), " +
        "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
        "sc AS (SELECT tf.doc_id, SUM(ln(1 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) * tf.tf * 2.2 / " +
        "(tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))) AS s " +
        "FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN st GROUP BY tf.doc_id), " +
        "bm AS (SELECT doc_id, round(s, 4) AS score FROM sc ORDER BY score DESC, doc_id LIMIT 50), " +
        "bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bm), " +
        "ce AS (SELECT vec_id AS doc_id, round(CAST(list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS cosine FROM embeddings), " +
        "ct AS (SELECT doc_id, cosine FROM ce ORDER BY cosine DESC, doc_id LIMIT 50), " +
        "cr AS (SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank FROM ct), " +
        "u AS (SELECT * FROM bmr UNION ALL SELECT * FROM cr) " +
        "SELECT doc_id, round(SUM(1.0 / (60 + rank)), 6) AS rrf, COUNT(*) AS n_lists " +
        "FROM u GROUP BY doc_id ORDER BY rrf DESC, doc_id LIMIT 10"))
}

/** Extension-operator queries (north-star: dedup, similarity search,
  * text analysis, streaming-shaped aggregation) as DataFrame pipelines. */
object ExtensionQueries {
  import org.apache.spark.sql.functions._
  import graft.operators.{Dedup, Similarity, Sketches, TextAnalysis}

  private def docs(s: SparkSession, dir: String): DataFrame = {
    Sources.register(s, dir); s.table("documents")
  }
  private def embs(s: SparkSession, dir: String): DataFrame = {
    Sources.register(s, dir); s.table("embeddings")
  }

  /** The WithCleanup calling pattern for query lambdas: the operator's
    * internal candidate caches are PERSISTED (lineage-preserving) and
    * deliberately left alive when the lambda returns — the harness owns
    * their lifetime: Bench clears session caches between queries (its
    * documented steady-state methodology keeps a query's caches warm
    * between its own runs, cleared across queries) and Verify runs each
    * query once in a one-shot JVM. Library consumers outside such a
    * harness must NOT copy this pattern — they hold the cleanup handle
    * and release it after materializing (or use the handle-less
    * overloads, whose GC-managed localCheckpoint sharing cannot leak). */
  private def harnessManaged(built: (DataFrame, () => Unit)): DataFrame = built._1

  /** Bounded wait for the streaming rows: a query that does not finish
    * inside `ms` is STOPPED and the row fails loud — reading the memory
    * sink of a still-running query would surface as a confusing oracle
    * mismatch instead of a timeout (round-14 ADVICE). */
  /** Replay-scoped state partition count, derived from the collected
    * feed size (free — the feed is on the driver by construction).
    * Round-18 measurement, both directions: at fixture scale (≤150k
    * rows) per-partition state-store COMMIT dominates, and 1 partition
    * beats 4 by ~2× (ProbeR18Stream interleaved A/B: 2.5s vs 4.5s);
    * at the 10× force fixture the state/compute is 10× bigger and 1
    * partition serializes it (x_stream_join 3.5s@4 vs 8.7s@1 in
    * BENCH_force). Neither constant is right at both ends — derive
    * from rows, one partition per ~150k feed rows (production sizes
    * the same scoped conf to throughput). Cap raised 4 → 8 in r19:
    * the 1M-row force feed derives 7, which ProbeR19TwsParts measured
    * ~20% faster than 4 (9.7→7.4s / 6.4→5.3s interleaved) with a
    * bit-identical emitted row set — per-key row order is preserved
    * (single feed partition, each key in one state partition), so
    * even float folds are unchanged. Fixture-scale feeds (≤150k)
    * still derive 1. */
  private def replayPartitions(nRows: Int): String =
    math.min(8, nRows / 150000 + 1).toString

  private def awaitBounded(q: org.apache.spark.sql.streaming.StreamingQuery,
      ms: Long = 120000L): Unit = {
    val done = q.awaitTermination(ms)
    if (!done) {
      // best-effort stop: a throwing stop() must not mask the timeout
      try q.stop() catch { case _: Throwable => () }
      throw new IllegalStateException(
        s"streaming query '${q.name}' did not terminate within ${ms}ms")
    }
  }

  /** Deterministic changelog derived from orders for the CDC queries:
    * key = o_orderkey mod 997 (forces ~15 versions per key at sf0.01),
    * version = o_orderkey (unique — the determinism contract), op = D
    * for every 11th record, payload = the total price as double. Both
    * the Spark side and the DuckDB oracle derive the SAME changelog
    * from the same table, so the materialization semantics are what is
    * compared. */
  private def ordersChangelog(s: SparkSession, dir: String): DataFrame = {
    Sources.register(s, dir)
    s.table("orders").select(
      pmod(col("o_orderkey").cast("long"), lit(997L)).as("k"),
      col("o_orderkey").cast("long").as("ver"),
      when(col("o_orderkey") % 11 === 0, "D").otherwise("U").as("op"),
      col("o_totalprice").cast("double").as("val"))
  }

  /** JSON document collection derived deterministically from the shared
    * customer table (r15 verdict #1: the document/Mongo-equivalent path
    * was the one §2 surface never verified against the DuckDB oracle).
    * Written as real JSON files to a dir-keyed temp path and registered
    * through DocSource.register, so the row exercises the path-based
    * sampled-inference entry the reference treats as co-equal with SQL
    * (ref app/routes_ai.py:150-159, app/mongodb_adapter.py:97-148).
    * Returns an Engine with the collection attached for askDocs. */
  /** One fixture write per (JVM, sf dir): the three x_docs_* rows share
    * the same derived collection, and rewriting it per row was three
    * redundant customer scans + JSON overwrites per verify/bench run.
    * `computeIfAbsent` is the write-once gate: concurrent callers block
    * until the one write finishes (no register-while-writing window),
    * and a THROWN write records no mapping, so the next row retries
    * instead of silently registering a missing fixture (round-16
    * advice — the old add-before-write left a poisoned memo). The path
    * is PID-scoped: the memo can only serialize writers inside one JVM,
    * so concurrent verify/bench JVMs each get their own directory
    * rather than racing overwrite-mode writes on a shared one. */
  private val docsFixtureWritten =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def docsFixture(s: SparkSession, dir: String): Unit = {
    Sources.register(s, dir)
    val fixDir = s"/tmp/graft_docfix_${ProcessHandle.current().pid()}_" +
      s"${new java.io.File(dir).getName}/customers"
    docsFixtureWritten.computeIfAbsent(fixDir, _ => {
      s.table("customer").select(
        col("c_custkey").as("_id"),
        col("c_name").as("name"),
        col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"),
        struct(col("c_nationkey").as("nation")).as("contact"))
        .write.mode("overwrite").json(fixDir)
      java.lang.Boolean.TRUE
    })
    graft.sources.DocSource.register(s, fixDir, "customers")
  }
  private def docsEngine(s: SparkSession, dir: String): graft.api.Engine = {
    val tables = Sources.register(s, dir)
    docsFixture(s, dir)
    new graft.api.Engine(s, tables, Sources.fixtureFks,
      docCollections = Seq("customers"))
  }

  /** Rebuild a collected `_id`-first JSON envelope (nested values
    * already serialized to JSON strings, ref nl2mongo.py:194-226) as a
    * DataFrame for the verify dump — the hashed surface IS the envelope
    * the reference's client receives, byte for byte. */
  private def envelopeFrame(s: SparkSession, rows: Seq[Seq[Any]],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.createDataFrame(
      java.util.Arrays.asList(rows.map(r => org.apache.spark.sql.Row.fromSeq(r)): _*),
      schema)

  private def docField(name: String, dt: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.types.StructField(name, dt)

  val builders: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- document / Mongo-equivalent path (sources/DocSource.scala,
    //     api/Engine.askDocs, gen/Nl2Doc.scala) ---
    // NL → find spec (filter + projection + sort + limit) through the
    // full askDocs dispatch; generated query_dict:
    //   {"find": {"segment": "BUILDING"}, "projection": ["balance",
    //    "segment"], "sort": {"balance": -1}, "limit": 5}
    "x_docs_find" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val qr = docsEngine(s, dir)
        .askDocs("top 5 customers by balance where segment is BUILDING")
        .fold(e => throw new IllegalStateException(e.message), identity)
      envelopeFrame(s, qr.rows, StructType(Seq(
        docField("_id", LongType), docField("balance", DoubleType),
        docField("segment", StringType))))
    }),
    // NL → aggregate pipeline ($match → $group → $sort, auto-$limit
    // appended by DocSource.aggregate); avg rounded 4dp on both sides
    // per the float-surface convention
    "x_docs_agg" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val qr = docsEngine(s, dir)
        .askDocs("average balance per segment for customers where balance is greater than 0")
        .fold(e => throw new IllegalStateException(e.message), identity)
      envelopeFrame(s, qr.rows, StructType(Seq(
        docField("_id", StringType), docField("agg_value", DoubleType))))
        .select(col("_id"), round(col("agg_value"), 4).as("agg_value"))
    }),
    // projection-less find: the envelope serializes the nested struct
    // column to a JSON STRING ({"nation":N}) — byte-pinned against a
    // DuckDB string-concat replica (ref nl2mongo.py:194-226)
    "x_docs_nested" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      docsFixture(s, dir) // the direct-find row needs no Engine
      val df = graft.sources.DocSource.find(s.table("customers"),
        graft.sources.DocSource.FindSpec(
          filter = Seq(graft.sources.DocSource.Gt("balance", 9990)),
          sort = Seq(("_id", true))))
      val (_, rows) = graft.sources.DocSource.jsonEnvelope(df)
      envelopeFrame(s, rows, StructType(Seq(
        docField("_id", LongType), docField("balance", DoubleType),
        docField("contact", StringType), docField("name", StringType),
        docField("segment", StringType))))
    }),
    // --- data-quality expectations (operators/Expectations.scala) ---
    "x_audit" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Expectations.audit(s.table("orders"), Seq(
        graft.operators.Expectations.NotNull("o_orderpriority"),
        graft.operators.Expectations.Unique("o_orderkey"),
        graft.operators.Expectations.InRange("o_totalprice", 0, 300000),
        graft.operators.Expectations.InSet("o_orderstatus", Seq("F", "O", "P")),
        graft.operators.Expectations.MatchesRegex("o_orderpriority", "^[0-9]-")))
        .orderBy("check", "col_name")
    }),
    // --- compaction planning (operators/Layout.scala) ---
    // synthetic file stats from orders (499 "files" with skewed sizes);
    // the plan itself — size-desc greedy bin assignment — is compared
    // zone-map file pruning (Layout.pruneFiles): file_id simulates the
    // parquet file a row landed in, contiguous in l_partkey so the
    // spans are tight and the range predicate actually drops files;
    // the comparison pins the null-safe interval-overlap plan logic
    "x_file_pruning" -> ((s, dir) => {
      Sources.register(s, dir)
      val spans = s.table("lineitem")
        .groupBy(floor(col("l_partkey") / lit(53.0)).cast("long").as("file_id"))
        .agg(min(col("l_partkey").cast("double")).as("pk_min"),
          max(col("l_partkey").cast("double")).as("pk_max"))
      graft.operators.Layout.pruneFiles(spans, "file_id", "pk", 500.0, 1200.0)
        .orderBy("file_id")
    }),
    "x_compaction_plan" -> ((s, dir) => {
      Sources.register(s, dir)
      val files = s.table("orders").groupBy(
        pmod(col("o_orderkey").cast("long"), lit(499L)).as("file_id"))
        .agg(sum(pmod(col("o_orderkey").cast("long"), lit(1000L))).as("bytes"))
      graft.operators.Layout.compactionPlan(files, "file_id", "bytes",
        targetBytes = 100000L).orderBy("file_id")
    }),
    // --- link-graph analytics (operators/Graphs.scala) ---
    // Host graph from the deterministic URL augmentation shared with
    // x_url_extract: each augmented doc links its site host to its cdn
    // host. Both engines derive the SAME edges from the same text, so
    // the comparison pins the PageRank algebra, not the fixture.
    "x_pagerank" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" see https://www.site"), col("doc_id") % 20,
            lit(".example.org/p/"), col("doc_id"), lit(" and http://cdn"),
            col("doc_id") % 7, lit(".example.net")))
          .otherwise(col("text")).as("text"))
      val hosts = TextAnalysis.extractUrls(aug, "doc_id", "text")
        .select(col("doc_id"), col("domain"))
      val edges = hosts.where(col("domain").startsWith("www.site")).as("s")
        .join(hosts.where(col("domain").startsWith("cdn")).as("t"), Seq("doc_id"))
        .select(col("s.domain").as("src"), col("t.domain").as("dst"))
      graft.operators.Graphs.pageRank(edges, iterations = 3)
        .select(col("node"), round(col("pr"), 4).as("pr"))
        .orderBy("node")
    }),
    // market-basket co-occurrence over (user, day) baskets: self-join
    // on the basket key only (fan-out bounded by |types|² per basket)
    "x_cooccurrence" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.typeCooccurrence(
        s.table("events"), "user_id", "ts", "event_type")
        .orderBy("type_a", "type_b")
    }),
    // PSI drift between the two month halves: each snapshot reduces
    // to a (type, bucket) histogram in one pass; fixed-width integer
    // buckets are engine-deterministic (no quantile fitting)
    "x_psi_drift" -> ((s, dir) => {
      Sources.register(s, dir)
      val e = s.table("events")
      graft.operators.Drift.psi(
        e.where(dayofmonth(col("ts")) <= 15),
        e.where(dayofmonth(col("ts")) >= 16),
        "event_type", "value")
        .orderBy("event_type")
    }),
    // exact two-sample KS between view/purchase value distributions —
    // binning-free drift (distributed-prefix-sum cumulative counts;
    // all-integer arithmetic until the final divisions, so the rounded
    // statistic is engine-exact)
    "x_ks_drift" -> ((s, dir) => {
      Sources.register(s, dir)
      harnessManaged(graft.operators.EventAnalytics.ksStatisticWithCleanup(
        s.table("events"), "value", "event_type", "view", "purchase"))
        .select(round(col("ks"), 6).as("ks"))
    }),
    // Mann-Whitney U / rank-sum effect size between the same
    // distributions — integer/half-exact ranks, no rounding needed
    // beyond the 6dp convention
    "x_mann_whitney" -> ((s, dir) => {
      Sources.register(s, dir)
      harnessManaged(graft.operators.EventAnalytics.mannWhitneyUWithCleanup(
        s.table("events"), "value", "event_type", "view", "purchase"))
        .select(round(col("u_a"), 2).as("u_a"), round(col("rho"), 6).as("rho"))
    }),
    // Wasserstein-1 drift magnitude between the same distributions —
    // CDF gaps weighted by value spans (cross-partition lead seam
    // handled by the broadcast boundary frame)
    "x_w1_drift" -> ((s, dir) => {
      Sources.register(s, dir)
      harnessManaged(graft.operators.EventAnalytics.wasserstein1WithCleanup(
        s.table("events"), "value", "event_type", "view", "purchase"))
        .select(round(col("w1"), 4).as("w1"))
    }),
    // A/B conversion test: hash-bucket variant (user_id % 2), convert
    // at >= 14 purchases; hashed surface is the pure-integer columns
    // (zscore is a report column, spec-pinned with tolerance)
    "x_ab_test" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Experiments.abConversion(s.table("events"), "user_id",
        pmod(col("user_id"), lit(2)), col("event_type") === "purchase",
        minConversions = 14L).drop("zscore")
    }),
    // typed JSON processing of the props column: ONE from_json parse
    // into a struct (codegen-friendly — never get_json_object-per-field
    // re-parsing), then plain columnar aggregation
    // unpivot/melt (wide→long reshaping, the data-prep staple): the
    // typed DataFrame API (Dataset.unpivot), oracled against DuckDB's
    // UNPIVOT — the SQL syntaxes differ across engines, the semantics
    // must not
    "x_unpivot" -> ((s, dir) => {
      Sources.register(s, dir)
      s.table("customer")
        .select(col("c_custkey"), col("c_acctbal").as("bal"),
          col("c_nationkey").cast("double").as("nk"))
        .unpivot(Array(col("c_custkey")), Array(col("bal"), col("nk")),
          "name", "val")
        .select(col("c_custkey"), col("name"), round(col("val"), 2).as("val"))
        .orderBy("c_custkey", "name").limit(1000)
    }),
    // batch-backfill sessionization: EventAnalytics.sessionize over
    // the same user slice as the streaming row — the kappa/lambda
    // overlap must agree, so it hashes against x_tws_sessions' replica
    // SQL verbatim (batch ≡ streaming ≡ oracle)
    "x_sessionize" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.sessionize(
          s.table("events").where(col("user_id") < 300), "user_id", "ts", "value")
        .select(col("user_id"), col("n_events"),
          round(col("session_value"), 2).as("session_value"),
          col("start_ms"), col("end_ms"))
        .orderBy("user_id", "start_ms").limit(2000)
    }),
    // timer-closed sessionization end-to-end: the transformWithState
    // EventTimeSessionProcessor replayed over real events in one
    // AvailableNow run — a far-future sentinel advances the watermark
    // past every real session's close, and the trigger's trailing
    // no-data batch fires the timers (ProbeTwsSessions pinned that);
    // sessions must hash-match DuckDB's gaps-and-islands replica of
    // the PROCESSOR's semantics (split on gap STRICTLY > 30min, times
    // in epoch millis — Timestamp.getTime truncates micros, so the
    // oracle computes gaps on epoch_ms too). user_id < 300 bounds the
    // replay; LIMIT keeps the dump bounded
    "x_tws_sessions" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = s.table("events").where(col("user_id") < 300)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect()
      val sentinel = graft.streaming.Streams.Event(
        -1L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Streams.Event]
      in.addData((ev :+ sentinel).toSeq: _*)
      s.catalog.dropTempView("x_tws_sessions_sink")
      val prevProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      try {
        val q = graft.streaming.Streams.sessionizeTws(in.toDS(), gapMs = 30L * 60 * 1000)
          .writeStream.format("memory").queryName("x_tws_sessions_sink")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally {
        prevProv match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      s.table("x_tws_sessions_sink").where(col("user_id") >= 0)
        .select(col("user_id"), col("n_events"),
          round(col("session_value"), 2).as("session_value"),
          col("start_ms"), col("end_ms"))
        .orderBy("user_id", "start_ms").limit(2000)
    }),
    // Spark-4 VARIANT path: schema-LESS semi-structured ingestion —
    // parse_json lands the whole document as a typed binary VARIANT
    // (no StructType declared up front, unlike x_json_props' from_json)
    // and variant_get extracts typed fields by path at read time; a
    // missing path is NULL, pinned by the k_missing column. The oracle
    // replicates with DuckDB's json_extract + casts.
    "x_variant_props" -> ((s, dir) => {
      Sources.register(s, dir)
      s.table("events")
        .select(col("event_id"),
          expr("parse_json(props)").as("__v"))
        .select(col("event_id"),
          expr("variant_get(__v, '$.k', 'bigint')").as("k"),
          expr("variant_get(__v, '$.zz', 'bigint')").as("k_missing"))
        .orderBy("event_id").limit(1000)
    }),
    // Spark-4 SQL pipe syntax through the FULL safety path (parse →
    // denylist → allow-list → limit → execute): the pipe operators
    // parse to ordinary Project/Filter/Aggregate nodes, so the same
    // validated plan family serves both syntaxes. DuckDB has no pipe
    // syntax — the oracle is the classic equivalent of the same query.
    "x_pipe_syntax" -> ((s, dir) =>
      SparkEntry.engineFrame(s, dir,
        "FROM lineitem |> WHERE l_quantity > 45 " +
          "|> AGGREGATE COUNT(*) AS n, ROUND(SUM(l_extendedprice), 2) AS rev " +
          "GROUP BY l_returnflag " +
          "|> ORDER BY l_returnflag |> LIMIT 100")),
    "x_json_props" -> ((s, dir) => {
      Sources.register(s, dir)
      val parsed = s.table("events").select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      parsed.groupBy("event_type").agg(
        count(col("k")).as("n"),
        countDistinct(col("k")).as("n_distinct"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),
    // referential-integrity audit with PLANTED orphans: the parent
    // side drops orders with o_orderkey % 7 == 0, so their lineitems
    // dangle; both join sides project only key columns (LeftAnti)
    "x_fk_orphans" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Expectations.referentialAudit(
        s.table("lineitem"), Seq("l_orderkey"),
        s.table("orders").where(col("o_orderkey") % 7 =!= 0), Seq("o_orderkey"))
    }),
    // --- privacy governance (operators/Governance.scala) ---
    // k-anonymity release gate over (nation, segment) quasi-identifiers:
    // one |classes|-sized hash aggregation, one report row
    "x_k_anonymity" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Governance.kAnonymityStats(
        s.table("customer"), Seq("c_nationkey", "c_mktsegment"), k = 8)
    }),
    // l-diversity over the same classes with a banded balance as the
    // sensitive attribute (homogeneity-attack audit)
    "x_l_diversity" -> ((s, dir) => {
      Sources.register(s, dir)
      val c = s.table("customer").select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000.0).cast("long").as("bal_band"))
      graft.operators.Governance.lDiversityViolations(
        c, Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 4)
        .orderBy("c_nationkey", "c_mktsegment")
    }),
    // suppression remediation: the surviving corpus must audit clean
    // at the same k by construction (anti-join on the quasi key)
    "x_k_suppress" -> ((s, dir) => {
      Sources.register(s, dir)
      val kept = graft.operators.Governance.suppressBelowK(
        s.table("customer"), Seq("c_nationkey", "c_mktsegment"), k = 8)
      graft.operators.Governance.kAnonymityStats(
        kept, Seq("c_nationkey", "c_mktsegment"), k = 8)
    }),
    // t-closeness over the same classes: exact-integer TVD between
    // each class's banded-balance distribution and the global one
    // (skewness-attack audit; t = 1/10 compared cross-multiplied, so
    // no doubles reach the hashed surface)
    "x_t_closeness" -> ((s, dir) => {
      Sources.register(s, dir)
      val c = s.table("customer").select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000.0).cast("long").as("bal_band"))
      graft.operators.Governance.tClosenessStats(
        c, Seq("c_nationkey", "c_mktsegment"), "bal_band", tNum = 1, tDen = 10)
        .orderBy("c_nationkey", "c_mktsegment")
    }),
    // ordered t-closeness (EMD with unit adjacent-category distance)
    // over the same classes — the distance that catches mass sitting
    // FAR from the global distribution along the band axis
    "x_t_closeness_emd" -> ((s, dir) => {
      Sources.register(s, dir)
      val c = s.table("customer").select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000.0).cast("long").as("bal_band"))
      graft.operators.Governance.tClosenessOrderedStats(
        c, Seq("c_nationkey", "c_mktsegment"), "bal_band", tNum = 1, tDen = 20)
        .orderBy("c_nationkey", "c_mktsegment")
    }),
    // exact triangle census over a deterministic synthetic graph
    // derived from doc ids (the host graph is bipartite — no
    // triangles); the ORACLE counts triangles by independent
    // id-ordered enumeration while the operator uses degree-ordered
    // orientation — both must land on the same exact census
    "x_triangles" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val raw = d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 7 + 3) % 31).as("dst"))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 13 + 5) % 31).as("dst")))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 3 + 11) % 31).as("dst")))
      graft.operators.Graphs.triangleStats(raw)
    }),
    // multi-source BFS reachability (single source 0) over the same
    // derived 31-node directed graph as x_triangles — frontier
    // iteration with early exit, oracled against a depth-capped
    // recursive CTE with UNION-distinct semantics + MIN(depth)
    "x_graph_reach" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val raw = d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 7 + 3) % 31).as("dst"))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 13 + 5) % 31).as("dst")))
        .unionAll(d.select((col("doc_id") % 31).as("src"), ((col("doc_id") * 3 + 11) % 31).as("dst")))
        .where(col("src") =!= col("dst"))
      val sources = s.range(1).select(lit(0L).as("node"))
      graft.operators.Graphs.reachability(raw, sources, maxDepth = 10)
        .orderBy("node")
    }),
    "x_host_graph_degrees" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" see https://www.site"), col("doc_id") % 20,
            lit(".example.org/p/"), col("doc_id"), lit(" and http://cdn"),
            col("doc_id") % 7, lit(".example.net")))
          .otherwise(col("text")).as("text"))
      val hosts = TextAnalysis.extractUrls(aug, "doc_id", "text")
        .select(col("doc_id"), col("domain"))
      val edges = hosts.where(col("domain").startsWith("www.site")).as("s")
        .join(hosts.where(col("domain").startsWith("cdn")).as("t"), Seq("doc_id"))
        .select(col("s.domain").as("src"), col("t.domain").as("dst"))
      graft.operators.Graphs.degreeStats(edges).orderBy("node")
    }),
    // --- incremental materialized aggregate (operators/MaterializedAgg.scala) ---
    // Deterministic change partition of orders: rows with k%13=0 arrive
    // as the insert batch, rows with k%17=0 (among the base) leave as
    // the delete batch; the measure is integer-derived so incremental
    // summation is bit-exact on both engines. The ORACLE recomputes the
    // aggregate over the post-change table directly — what is compared
    // is the refresh algebra, not the fixture.
    // incremental JOIN-view maintenance: build the view from the old
    // states, fold inserts via the three delta joins, retract a delete
    // batch by provenance — the maintained view must hash-match the
    // direct join of the final states (refresh ≡ rebuild contract)
    "x_mv_join_refresh" -> ((s, dir) => {
      Sources.register(s, dir)
      val o = s.table("orders").select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_price"))
      val c = s.table("customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment"))
      val (aOld, aIns) = (o.where(col("o_orderkey") % 5 =!= 0),
        o.where(col("o_orderkey") % 5 === 0))
      val (bOld, bIns) = (c.where(col("o_custkey") % 7 =!= 0),
        c.where(col("o_custkey") % 7 === 0))
      val view = graft.operators.MaterializedJoin.build(aOld, bOld, Seq("o_custkey"))
      val grown = graft.operators.MaterializedJoin.refreshInserts(
        view, aOld, bOld, aIns, bIns, Seq("o_custkey"))
      // retract every order divisible by 3 (provenance = o_orderkey)
      val dels = o.where(col("o_orderkey") % 3 === 0).select("o_orderkey")
      graft.operators.MaterializedJoin.retract(grown, dels, Seq("o_orderkey"))
        .orderBy("o_orderkey").limit(1000)
    }),
    // join-view UPDATE path: the documented delete+insert convention
    // applied as ONE batch (applyUpdatesA) — stale rows retracted by
    // provenance, new images folded through the ΔA⋈B term; the
    // maintained view must hash-match the direct join over corrected
    // prices (update ≡ rebuild contract)
    "x_mv_join_update" -> ((s, dir) => {
      Sources.register(s, dir)
      val o = s.table("orders").select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_price"))
      val c = s.table("customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment"))
      val view = graft.operators.MaterializedJoin.build(o, c, Seq("o_custkey"))
      val upd = o.where(col("o_orderkey") % 11 === 0)
        .withColumn("o_price", col("o_price") + lit(1.0))
      graft.operators.MaterializedJoin.applyUpdatesA(view, c, upd,
        Seq("o_custkey"), Seq("o_orderkey"))
        .orderBy("o_orderkey").limit(1000)
    }),
    "x_mv_refresh" -> ((s, dir) => {
      Sources.register(s, dir)
      val o = s.table("orders").select(
        pmod(col("o_custkey").cast("long"), lit(101L)).as("g"),
        pmod(col("o_orderkey").cast("long"), lit(1000L)).as("v"),
        col("o_orderkey").cast("long").as("k"))
      val base = o.where(col("k") % 13 =!= 0)
      val mv0 = graft.operators.MaterializedAgg.build(
        base.select("g", "v"), Seq("g"), "v")
      graft.operators.MaterializedAgg.refresh(mv0,
        o.where(col("k") % 13 === 0).select("g", "v"),
        base.where(col("k") % 17 === 0).select("g", "v"),
        o.where(col("k") % 13 === 0 || col("k") % 17 =!= 0).select("g", "v"),
        Seq("g"), "v").orderBy("g")
    }),
    // multi-measure MV: one shared refresh pass maintains two measures'
    // cnt/sum/min/max under the same insert/delete classes; v2 carries
    // NULLs so cnt_v2 genuinely diverges from n
    "x_mv_multi" -> ((s, dir) => {
      Sources.register(s, dir)
      val o = s.table("orders").select(
        pmod(col("o_custkey").cast("long"), lit(101L)).as("g"),
        pmod(col("o_orderkey").cast("long"), lit(1000L)).as("v1"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast("long"))
          .otherwise(pmod(col("o_custkey").cast("long"), lit(97L))).as("v2"),
        col("o_orderkey").cast("long").as("k"))
      val base = o.where(col("k") % 13 =!= 0)
      val mv0 = graft.operators.MaterializedAgg.buildMulti(
        base.select("g", "v1", "v2"), Seq("g"), Seq("v1", "v2"))
      graft.operators.MaterializedAgg.refreshMulti(mv0,
        o.where(col("k") % 13 === 0).select("g", "v1", "v2"),
        base.where(col("k") % 17 === 0).select("g", "v1", "v2"),
        o.where(col("k") % 13 === 0 || col("k") % 17 =!= 0).select("g", "v1", "v2"),
        Seq("g"), Seq("v1", "v2")).orderBy("g")
    }),
    // MV SERVING through the Catalyst rewrite with a key-only WHERE, a
    // HAVING on served outputs, and a NULL-bearing measure — the AVG
    // column is the regression pin for the sum/NON-NULL-count serving
    // (dividing by the row count is silently wrong under NULLs). The
    // base is materialized (localCheckpoint) as a stand-in for the
    // stored table a lakehouse deployment serves against; MvRewriteSpec
    // pins that this exact shape optimizes to an aggregate-free plan.
    "x_mv_serve_having" -> ((s, dir) => {
      Sources.register(s, dir)
      val base = s.table("orders").select(
        pmod(col("o_custkey").cast("long"), lit(101L)).as("g"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(pmod(col("o_orderkey").cast("long"), lit(1000L))).as("v"))
        .localCheckpoint(true)
      base.createOrReplaceTempView("mv_serve_base")
      graft.plans.MvCatalog.register(s, "mv_serve_base", Seq("g"), "v",
        graft.operators.MaterializedAgg.build(base, Seq("g"), "v"),
        mvName = "mv_serve_state")
      s.sql("SELECT g, COUNT(*) AS n, COUNT(v) AS cnt, SUM(v) AS s, " +
        "AVG(v) AS av FROM mv_serve_base WHERE g < 50 GROUP BY g " +
        "HAVING COUNT(*) > 2 ORDER BY g")
    }),
    // roll-up SERVING: MV keyed (g, h), question groups by g alone with
    // a key-only WHERE — answered by re-aggregating the key-sized state
    // (MvRewriteSpec pins the plan never rescans the base)
    "x_mv_serve_rollup" -> ((s, dir) => {
      Sources.register(s, dir)
      val base = s.table("orders").select(
        pmod(col("o_custkey").cast("long"), lit(101L)).as("g"),
        pmod(col("o_custkey").cast("long"), lit(7L)).as("h"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(pmod(col("o_orderkey").cast("long"), lit(1000L))).as("v"))
        .localCheckpoint(true)
      base.createOrReplaceTempView("mv_serve_rollup_base")
      graft.plans.MvCatalog.register(s, "mv_serve_rollup_base", Seq("g", "h"), "v",
        graft.operators.MaterializedAgg.build(base, Seq("g", "h"), "v"),
        mvName = "mv_serve_rollup_state")
      s.sql("SELECT g, COUNT(*) AS n, COUNT(v) AS cnt, SUM(v) AS s, " +
        "AVG(v) AS av FROM mv_serve_rollup_base WHERE g < 50 GROUP BY g ORDER BY g")
    }),
    // --- CDC / changelog materialization (operators/Cdc.scala) ---
    "x_cdc_apply" -> ((s, dir) =>
      graft.operators.Cdc.applyChangelog(
        ordersChangelog(s, dir), Seq("k"), "ver", "op").orderBy("k")),
    // SCD type-2 history from the same changelog: each change becomes
    // a [valid_from, valid_to) interval, deletes close without a row,
    // is_current ⇔ open — LIMIT bounded by a total (k, valid_from)
    // order (ver is globally unique)
    "x_scd2" -> ((s, dir) =>
      graft.operators.Cdc.scd2History(
        ordersChangelog(s, dir), Seq("k"), "ver", "op")
        .select(col("k"), col("valid_from"), col("valid_to"),
          col("val"), col("is_current"))
        .orderBy("k", "valid_from").limit(2000)),
    // SCD2 point-in-time serving: one interval-containment filter on
    // the derived history — state as of version 3000
    "x_scd2_asof" -> ((s, dir) =>
      graft.operators.Cdc.scd2AsOf(
        graft.operators.Cdc.scd2History(
          ordersChangelog(s, dir), Seq("k"), "ver", "op"),
        lit(3000L))
        .select(col("k"), col("valid_from"), col("val"))
        .orderBy("k")),
    // incremental SCD2: history built from the ver<=3000 prefix, the
    // suffix folded in via scd2Apply — must hash-match the FULL-log
    // oracle (refresh ≡ rebuild; same SQL as x_scd2 by construction)
    "x_scd2_incremental" -> ((s, dir) => {
      val log = ordersChangelog(s, dir)
      val hist0 = graft.operators.Cdc.scd2History(
        log.where(col("ver") <= 3000L), Seq("k"), "ver", "op")
      graft.operators.Cdc.scd2Apply(hist0,
        log.where(col("ver") > 3000L), Seq("k"), "ver", "op")
        .select(col("k"), col("valid_from"), col("valid_to"),
          col("val"), col("is_current"))
        .orderBy("k", "valid_from").limit(2000)
    }),
    "x_cdc_asof" -> ((s, dir) =>
      graft.operators.Cdc.snapshotAsOf(
        ordersChangelog(s, dir), Seq("k"), "ver", "op", lit(3000L)).orderBy("k")),
    "x_cdc_diff" -> ((s, dir) =>
      graft.operators.Cdc.netChanges(
        ordersChangelog(s, dir), Seq("k"), "ver", "op",
        lit(3000L), lit(Long.MaxValue)).orderBy("k")),
    // --- W2 bounded global rank (no global WindowExec — RankLimit) ---
    "d14_window_rank" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.plans.RankLimit.globalRankTopK(
        s.table("supplier").select(col("s_suppkey"), col("s_name"), col("s_acctbal")),
        Seq(col("s_acctbal").desc, col("s_suppkey")), k = 10)
        .select(col("s_suppkey"), col("s_name"), col("rnk"))
        .orderBy("rnk", "s_suppkey").limit(100)
    }),
    // --- text analysis ---
    "x_text_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_subtokens"),
        round(TextAnalysis.digitRatio(col("text")), 4).as("digit_ratio"))
        .orderBy("doc_id").limit(100)),
    "x_text_analyze" -> ((s, dir) =>
      TextAnalysis.analyze(docs(s, dir), "doc_id", "text")
        .drop("fingerprint") // not DuckDB-expressible; FunctionsSpec covers it
        .orderBy("doc_id").limit(100)),
    "x_lang_id" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id").limit(100)),
    // --- dedup ---
    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exactDuplicateGroups(docs(s, dir), "doc_id", Seq("text"))
        .orderBy("keep_id").limit(100)),
    "x_dedup_stats" -> ((s, dir) =>
      docs(s, dir).agg(count(lit(1)).as("n_docs"), countDistinct(col("text")).as("n_unique"))),
    "x_dedup_minhash" -> ((s, dir) =>
      harnessManaged(Dedup.minhashNearDuplicatesWithCleanup(
        docs(s, dir), "doc_id", "text", threshold = 0.7))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b").limit(100)),
    // planted-recall contract: each ≥75-token doc gets a copy with one
    // appended token (a small edit on a long doc ⇒ Hamming ≤ 5 on the
    // 64-bit SimHash); the banded pipeline must find every planted pair
    "x_dedup_simhash" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
        .where(TextAnalysis.tokenCount(col("text")) >= 75)
      val planted = base.select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zqxwv")).as("text"))
      Dedup.simhashNearDuplicates(base.union(planted), "doc_id", "text", maxDistance = 5)
        .where(col("id_b") === col("id_a") + 100000)
        .select("id_a", "id_b").orderBy("id_a").limit(500)
    }),
    "x_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b").limit(100)),
    // full corpus pipelines (composed operators, DuckDB-mirrored)
    "x_dedup_corpus" -> ((s, dir) => {
      val (deduped, _) = graft.operators.Pipelines.dedupCorpus(
        docs(s, dir), "doc_id", "text", nearThreshold = 0.85)
      deduped.select(col("doc_id")).orderBy("doc_id").limit(1000)
    }),
    "x_quality_filter" -> ((s, dir) =>
      graft.operators.Pipelines.qualityFilter(docs(s, dir), "doc_id", "text",
        allowedLangs = Seq("en"), minQuality = 0.3, minTokens = 5, maxTokens = 100000)
        .select(col("doc_id")).orderBy("doc_id").limit(500)),
    "x_text_chunks" -> ((s, dir) =>
      graft.operators.Pipelines.chunkDocuments(docs(s, dir), "doc_id", "text",
        chunkTokens = 32, overlapTokens = 8)
        .orderBy("doc_id", "chunk_index").limit(200)),
    "x_pack_sequences" -> ((s, dir) =>
      graft.operators.Pipelines.packSequences(docs(s, dir), "doc_id", "text",
        capacityTokens = 256, shards = 8)
        .orderBy("doc_id").limit(500)),
    // GLOBAL concat-and-chunk packing (docs split across sequence
    // boundaries): distributed prefix sum over the doc_id order —
    // range exchange + per-partition windows + a cluster-sized totals
    // frame; all columns exact BIGINTs
    "x_pack_offsets" -> ((s, dir) =>
      graft.operators.Packing.packOffsets(docs(s, dir), "doc_id", "text",
        seqLen = 256).orderBy("doc_id")),
    // corpus packing scorecard: totals / ceil sequences / tail padding /
    // boundary-straddling docs
    "x_pack_stats" -> ((s, dir) =>
      graft.operators.Packing.packingStats(docs(s, dir), "doc_id", "text",
        seqLen = 256)),
    // token-budget curation: the maximal quality-ordered prefix
    // (n_chars desc, id tiebreak) fitting 20k tokens — curation by
    // TOKENS, not documents
    "x_token_budget" -> ((s, dir) =>
      graft.operators.Packing.selectByTokenBudget(docs(s, dir), "doc_id",
        "text", "n_chars", budgetTokens = 20000L).orderBy("doc_id")),
    // the write path: MATERIALIZED training sequences (ordered token
    // slices regrouped per sequence) — one seq_id-keyed exchange;
    // hashed surface is strings + BIGINTs only
    "x_pack_materialize" -> ((s, dir) =>
      graft.operators.Packing.materializeSequences(docs(s, dir), "doc_id",
        "text", seqLen = 256).orderBy("seq_id")),
    // transfer-integrity manifest: per-shard order-independent content
    // fingerprints the receiver of a 100 TB copy recomputes to verify
    // arrival — one partial-aggregated pass, |shards| rows shuffled
    "x_shard_manifest" -> ((s, dir) =>
      graft.operators.Layout.integrityManifest(docs(s, dir), "doc_id",
        pmod(col("doc_id"), lit(8L)), Some("text")).orderBy("shard")),
    // ingest-time packing SERVED end-to-end: three id-contiguous
    // micro-batches fold through the streaming maintainer (one long of
    // driver state), and the union must equal the terminal batch pack —
    // oracled against the same global running sum
    "x_pack_streamed" -> ((s, dir) => {
      val d = docs(s, dir)
      val m = new graft.streaming.Streams.PackingMaintainer(
        "doc_id", "text", seqLen = 256)
      val mx = d.agg(max("doc_id")).collect()(0).getLong(0)
      val batches = Seq(
        d.where(col("doc_id") <= mx / 3),
        d.where(col("doc_id") > mx / 3 && col("doc_id") <= 2 * mx / 3),
        d.where(col("doc_id") > 2 * mx / 3))
      batches.zipWithIndex.map { case (b, i) => m.onBatch(b, i.toLong) }
        .reduce(_ unionByName _).orderBy("doc_id")
    }),
    // duplicate groups over the exact-Jaccard pair graph (min-label CC)
    "x_dedup_groups" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.duplicateGroups(pairs)
        .orderBy("id").limit(1000)
    }),
    // canonical-member selection: per near-dup group, keep the member
    // maximizing quality (min-id tiebreak) — not the first-crawled copy
    "x_dedup_canonical" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      // score GROUP MEMBERS only (r18: the canonical join discards
      // non-members anyway, but the projection below the join evaluated
      // qualityScore for the whole corpus — semi-join first, score
      // after; duplicateGroups is eager, so the reuse is free):
      // identical result, corpus-sized expression work drops to
      // member-sized
      val groups = Dedup.duplicateGroups(pairs)
      val scored = d
        .join(groups.select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("q"))
      Dedup.canonicalPerGroup(groups, "id", "group_id",
        scored, "doc_id", "q")
        .orderBy("group_id").limit(1000)
    }),
    // benchmark decontamination: pseudo-benchmark = doc_id % 97 == 0
    "x_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 97 === 0)
      graft.operators.Decontamination.decontaminate(
        d, "doc_id", "text", evalSet, "text", n = 3, minOverlap = 5)
        .select(col("doc_id")).orderBy("doc_id").limit(2000)
    }),
    // contamination attribution: which eval doc leaked into which
    // training doc, with the shared-shingle count
    "x_decontam_report" -> ((s, dir) => {
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("text"))
      graft.operators.Decontamination.attributionReport(
        d, "doc_id", "text", evalSet, "eval_id", "text", n = 3, minOverlap = 5)
        .orderBy("doc_id", "eval_id").limit(500)
    }),
    // per-doc perplexity under the corpus's own bigram LM
    "x_perplexity" -> ((s, dir) =>
      TextAnalysis.bigramPerplexity(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(200)),
    // PII redaction over deterministically-augmented text
    "x_pii_redact" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@mail.example.com or call 555-867-5309 at 10.0.0."),
            col("doc_id") % 256))
          .otherwise(col("text")).as("text"))
      graft.operators.PiiRedaction.redactDocuments(aug, "doc_id", "text")
        .orderBy("doc_id").limit(100)
    }),
    // stratified deterministic sampling by token-length band
    // accent/case-insensitive normalized dedup: planted variant docs
    // (accent-translated + upper-cased copies) must land in the same
    // group as their originals via the CCNet normalization fingerprint
    "x_normalized_dedup" -> ((s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      val variants = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"),
          upper(translate(col("text"), "aeio", "\u00e1\u00e9\u00ec\u00f6")).as("text"))
      TextAnalysis.normalizedDuplicateGroups(base.unionAll(variants), "doc_id", "text")
        .where(col("n_docs") > 1).orderBy("first_doc")
    }),
    "x_stratified_sample" -> ((s, dir) => {
      val n = TextAnalysis.tokenCount(col("text"))
      val stratum = when(n < 50, "short").when(n < 200, "medium").otherwise("long")
      graft.operators.Sampling.stratifiedSample(docs(s, dir), "doc_id", stratum,
        Seq("short" -> 0.1, "medium" -> 0.5, "long" -> 1.0))
        .select(col("doc_id"), col("stratum")).orderBy("doc_id").limit(2000)
    }),
    // end-to-end curation pipeline (quality -> dedup -> decontam -> split)
    "x_curate" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Pipelines.curateCorpus(d, "doc_id", "text",
        d.where(col("doc_id") % 97 === 0), "text")
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
    }),
    // duplicated-span removal (ExactSubstr discipline): every token
    // covered by a cross-document 3-gram is cut, text rebuilt in order;
    // a known boilerplate clause is injected into even docs
    "x_span_remove" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 2 === 0,
          lit(" please accept all cookies to continue")).otherwise(lit("")))
        .as("text"))
      graft.operators.Dedup.removeDuplicatedSpans(aug, "doc_id", "text")
        .orderBy("doc_id").limit(2000)
    }),
    // per-document curation audit: the first stage that dropped each
    // doc (lang/quality/length/exact_dup/near_dup/decontam) or its
    // split when kept — one row per INPUT document
    "x_curation_audit" -> ((s, dir) => {
      val d = docs(s, dir)
      graft.operators.Pipelines.curationAudit(d, "doc_id", "text",
        d.where(col("doc_id") % 97 === 0), "text")
        .orderBy("doc_id").limit(2000)
    }),
    // deterministic train/val/test split
    "x_split" -> ((s, dir) =>
      graft.operators.Sampling.split(docs(s, dir), "doc_id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)),
    // deterministic training-export shuffle: the first 200 rows of the
    // hash-keyed pseudo-random permutation — pins that the permutation
    // is pure integer arithmetic any engine reproduces (vs rand())
    "x_det_shuffle" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Sampling.deterministicShuffle(
          s.table("orders").select("o_orderkey", "o_custkey"), "o_orderkey")
        .withColumn("shuffle_key",
          graft.operators.Sampling.shuffleKey(col("o_orderkey")))
        .limit(200)
    }),
    // split-leakage AUDIT: near-dup pairs straddling the PLAIN hash
    // split (the violation list leakageSafeSplit exists to empty —
    // running the audit on the naive split quantifies the leakage)
    "x_split_audit" -> ((s, dir) => {
      val d = docs(s, dir)
      val assigned = graft.operators.Sampling.split(d, "doc_id",
        Seq("train" -> 0.8, "test" -> 0.2))
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      graft.operators.Sampling.splitLeakageAudit(assigned, "doc_id", "split", pairs)
        .orderBy("id_a", "id_b").limit(500)
    }),
    // leakage-safe split: docs split by their duplicate-GROUP key (the
    // x_dedup_groups CC labels), so near-dup clusters never straddle
    // train/test — the oracle recomputes groups recursively and applies
    // the same hash rule to the group key
    "x_leakage_split" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val groups = Dedup.duplicateGroups(pairs)
      graft.operators.Sampling.leakageSafeSplit(d, "doc_id", groups,
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select(col("doc_id"), col("split")).orderBy("doc_id").limit(2000)
    }),
    // per-row weighted sampling: keep probability = min(n_tokens/200, 1)
    "x_weighted_sample" -> ((s, dir) => {
      val w = TextAnalysis.tokenCount(col("text")).cast("double") / lit(200.0)
      graft.operators.Sampling.weightedSample(docs(s, dir), "doc_id", w)
        .select(col("doc_id")).orderBy("doc_id").limit(2000)
    }),
    // length-bucketed inference batching (32-token bands, batches of 8)
    "x_len_batches" -> ((s, dir) =>
      graft.operators.Sampling.lengthBatches(docs(s, dir), "doc_id", "text",
        bucketWidth = 32, batchSize = 8)
        .orderBy("doc_id").limit(500)),
    // corpus vocabulary (top-100 tokens by document frequency)
    "x_vocab_top" -> ((s, dir) =>
      TextAnalysis.topTerms(docs(s, dir), "doc_id", "text", k = 100)),
    // corpus-pair vocabulary divergence (JSD + both KLs) between the
    // en and es slices — the pre-mixing "how different are these
    // sources" check; vocab-sized shuffles only
    "x_vocab_divergence" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.vocabDivergence(
        d.where(col("lang") === "en"), d.where(col("lang") === "es"), "text")
    }),
    // the tokens driving that divergence: top-20 by |smoothed log-ratio|
    "x_divergent_tokens" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.divergentTokens(
        d.where(col("lang") === "en"), d.where(col("lang") === "es"), "text", k = 20)
    }),
    // vocabulary coverage per language at a 500-token vocab — the
    // tokenizer-sizing report; (groups × vocab)-bounded shuffle. The
    // hashed surface is the exact counts; the oov_rate double is a
    // derivable report column and stays off the oracle
    "x_oov_rate" -> ((s, dir) =>
      TextAnalysis.oovRate(docs(s, dir), "text", "lang", vocabSize = 500)
        .drop("oov_rate")),
    // streaming vocab-drift SERVED through the NL routing layer: fold
    // the non-en slice as three micro-batches into a live
    // VocabDriftMaintainer, register it under 'crawl' with the en slice
    // as the fixed reference (one persisted histogram pass), and answer
    // "how different is the crawl…" from state — the full serving path
    // (Streams fold → SketchCatalog.route), oracled against a batch
    // recomputation of the same divergence
    "x_served_drift" -> ((s, dir) => {
      val d = docs(s, dir)
      val m = new graft.streaming.Streams.VocabDriftMaintainer("text")
      (0 until 3).foreach(i => m.onBatch(
        d.where(col("lang") =!= "en" && pmod(col("doc_id"), lit(3)) === i),
        i.toLong))
      val cat = new graft.catalog.SketchCatalog(s)
      cat.registerDrift("crawl", m, d.where(col("lang") === "en"), "text")
      val routed = cat.route("how different is the crawl from the reference corpus?")
        .getOrElse(sys.error("drift route did not fire"))
      // materialize the one-row answer THROUGH the persisted histogram,
      // then release the catalog's cache entry (round-13 advice: the
      // per-invocation catalog leaked its persisted refHist)
      val answer = routed.collect()
      val out = s.createDataFrame(java.util.Arrays.asList(answer: _*), routed.schema)
      cat.clear()
      out
    }),
    // per-stratum quantile curation cut: keep each source's top 30% by
    // n_chars — one |strata|-sized percentile pass, no corpus sort
    "x_quantile_cut" -> ((s, dir) =>
      graft.operators.Sampling.selectTopQuantilePerStratum(
        docs(s, dir), "source", "n_chars", keepFraction = 0.3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")),
    // BPE tokenizer training statistics: the first-iteration adjacent
    // char-pair counts (word-boundary-restricted), top 40
    "x_bpe_pairs" -> ((s, dir) =>
      graft.operators.Bpe.pairCounts(docs(s, dir), "text")
        .orderBy(col("cnt").desc, col("pair_a"), col("pair_b")).limit(40)),
    // corpus symbol statistics under the empty vocabulary (code points):
    // the measurement a tokenizer-selection loop runs per candidate
    "x_bpe_vocab" -> ((s, dir) =>
      graft.operators.Bpe.vocabStats(docs(s, dir), "doc_id", "text", Nil)),
    // text normalization (control-char strip + whitespace collapse + case)
    "x_normalize" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(lit("  \t"), col("text"), lit("\u0007\u000B  MIXED case  ")))
          .otherwise(col("text")).as("text"))
      aug.select(col("doc_id"),
        TextAnalysis.normalize(col("text"), lowercase = true).as("normalized"),
        (length(col("text")) - length(TextAnalysis.normalize(col("text"), lowercase = true)))
          .as("n_chars_removed"))
        .orderBy("doc_id").limit(100)
    }),
    // Gopher-style repetition signals
    "x_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(100)),
    // per-source stats + temperature-scaled mixing weights
    // per-source dataset card: volumes, mean quality, language spread,
    // exact-dup exposure — one enrichment projection + two aggregations
    "x_corpus_report" -> ((s, dir) =>
      graft.operators.Pipelines.corpusReport(docs(s, dir), "doc_id", "text",
        "lang", "source").orderBy("source").limit(100)),
    "x_source_mix" -> ((s, dir) =>
      graft.operators.Pipelines.sourceMix(docs(s, dir), "doc_id", "text", "source", alpha = 0.7)
        .orderBy("source").limit(100)),
    // token-budget mixing plan: per-source target allocation under a
    // 50k-token budget and the per-mille rate that realizes it
    "x_source_budget" -> ((s, dir) =>
      graft.operators.Pipelines.sourceBudgetPlan(docs(s, dir), "doc_id", "text",
          "source", budgetTokens = 50000L)
        .orderBy("source").limit(100)),
    // DSIR hashed-n-gram importance weights: target = the English
    // slice, raw = the whole corpus, 4096 md5-derived buckets
    "x_dsir" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.dsirWeightsWhere(d, col("lang") === "en", "doc_id", "text")
        .orderBy("doc_id")
    }),
    // token-window chunking (64-token chunks, 16-token overlap):
    // deterministic per-doc windows; LIMIT keeps the dump bounded
    "x_chunk_tokens" -> ((s, dir) =>
      graft.operators.Chunking.chunkByTokens(docs(s, dir), "doc_id", "text",
          size = 64, overlap = 16)
        .orderBy("doc_id", "chunk_idx").limit(500)),
    // logistic-regression gradient step (quality-classifier training):
    // fixed weights, text-stat features, label = lang='en'; the
    // x_kmeans_step precedent — pin one exactly-reproducible step
    "x_lr_step" -> ((s, dir) => {
      val d = docs(s, dir).select(
        (TextAnalysis.tokenCount(col("text")).cast("double") / 100.0).as("tok_norm"),
        round(TextAnalysis.punctRatio(col("text")), 4).as("punct"),
        round(TextAnalysis.digitRatio(col("text")), 4).as("digit"),
        (col("lang") === "en").cast("double").as("y"))
      graft.ml.LogReg.gradientFrame(d, Seq("tok_norm", "punct", "digit"), "y",
        Array(0.8, -2.0, 1.5, -0.5)).orderBy("feature")
    }),
    // Gumbel top-k importance resampling: 50 docs drawn without
    // replacement ∝ (n_tokens + 1), deterministic md5-derived noise
    "x_gumbel_topk" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.operators.Sampling.gumbelTopK(d, "doc_id",
          log(col("n_tokens") + 1.0), k = 50)
        .select(col("doc_id"), col("n_tokens"),
          (round(col("gumbel_key"), 6) + 0.0).as("gumbel_key"))
    }),
    // grouped top-k: the 2 longest documents per language — the
    // partitioned ROW_NUMBER family (RankLimit.groupedTopK;
    // WindowGroupLimit bounds per-group state at k, RankLimitSpec pins
    // the plan)
    "x_grouped_topk" -> ((s, dir) => {
      graft.plans.RankLimit.groupedTopK(docs(s, dir),
          Seq(col("lang")), Seq(col("n_chars").desc, col("doc_id")), k = 2)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "doc_id")
    }),
    // Moore-Lewis cross-entropy-difference selection: target LM = the
    // English slice, raw LM = the whole corpus; positive gap selects
    "x_moore_lewis" -> ((s, dir) => {
      val d = docs(s, dir)
      TextAnalysis.crossEntropyDiff(d, d.where(col("lang") === "en"), "doc_id", "text")
        .orderBy("doc_id")
    }),
    // line-level corpus dedup (RefinedWeb-style) over deterministically
    // injected shared lines (the fixture's texts are single-line): the
    // cookie / newsletter lines cross the 50-doc threshold and must
    // vanish from EVERY document; the per-doc footer stays
    "x_line_dedup" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"), concat(col("text"),
        when(col("doc_id") % 2 === 0, lit("\ncookie notice applies")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0, lit("\nsubscribe to our newsletter")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit("\ndoc "), col("doc_id").cast("string"), lit(" footer")))
          .otherwise(lit(""))).as("text"))
      TextAnalysis.removeBoilerplateLines(aug, "doc_id", "text", minDocs = 50)
        .orderBy("doc_id")
    }),
    // per-document duplicated-span statistics (inverted n-gram index)
    "x_span_dup" -> ((s, dir) =>
      Dedup.duplicatedSpanStats(docs(s, dir), "doc_id", "text", n = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id").limit(200)),
    // per-document top-3 TF-IDF keywords
    "x_tfidf_top" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(docs(s, dir), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "rank").limit(300)),
    // BM25 keyword retrieval: top-10 docs for a 3-term query (the sparse
    // complement of the ANN path; postings filtered to query terms
    // inside the scan, nothing corpus-sized shuffles)
    "x_bm25" -> ((s, dir) =>
      TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "window", "merge"), k = 10)),
    // one distributed k-means E+M update from the fixed probe centroids
    // (vec_id < 8) — long-form new centroids, SQL-replicable exactly
    "x_kmeans_step" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = e.where(col("vec_id") < 8)
      graft.operators.Similarity.kmeansStep(e, "vec_id", "emb", cents, "vec_id", "emb")
        .orderBy("cluster", "pos").limit(1000)
    }),
    // corpus bigram LM counts + conditional probability
    "x_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramModel(docs(s, dir), "text", k = 100)),
    // URL extraction over deterministically-augmented text
    "x_url_extract" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" see https://www.site"), col("doc_id") % 20,
            lit(".example.org/p/"), col("doc_id"), lit(" and http://cdn"),
            col("doc_id") % 7, lit(".example.net")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.extractUrls(aug, "doc_id", "text")
        .orderBy("doc_id", "url").limit(300)
    }),
    // exact per-group percentiles over events
    "x_percentiles" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.catalog.Profiler.exactPercentiles(
        s.table("events"), Seq("event_type"), "value", Seq(0.5, 0.95))
        .orderBy("event_type").limit(100)
    }),
    // boilerplate removal (CCNet-style high-frequency segment dropping)
    "x_boilerplate" -> ((s, dir) =>
      graft.operators.Pipelines.removeBoilerplate(docs(s, dir), "doc_id", "text",
        chunkTokens = 16, maxDocFreq = 2)
        .orderBy("doc_id").limit(200)),
    // token-length histogram (50-token buckets)
    "x_len_hist" -> ((s, dir) =>
      docs(s, dir)
        .select((floor(TextAnalysis.tokenCount(col("text")).cast("double") / 50) * 50)
          .cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket").limit(100)),
    // k-NN join over 4 probe queries
    "x_knn_join" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 4)
      Similarity.knnJoin(e, "vec_id", "emb", q, "vec_id", "emb", k = 5)
        .select(col("query_id"), col("id").as("vec_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank").limit(100)
    }),
    // retrieval metrics: recall@10 + MRR of an even-id index shard's
    // top-10 against the >= 0.97-cosine gold twins over ALL vectors —
    // recall drops below 1 exactly when a twin carries an odd id
    "x_retrieval_metrics" -> ((s, dir) => {
      import graft.functions.cosine_sim
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") < 20)
      val pred = Similarity.knnJoin(e.where(col("vec_id") % 2 === 0),
        "vec_id", "emb", q, "vec_id", "emb", k = 10)
      val gold = broadcast(q.select(col("vec_id").as("query_id"), col("emb").as("__q")))
        .crossJoin(e.select(col("vec_id").as("id"), col("emb").as("__e")))
        .where(cosine_sim(col("__e"), col("__q")) >= 0.97 &&
          col("id") =!= col("query_id"))
        .select(col("query_id"), col("id"))
      graft.operators.RetrievalMetrics
        .perQuery(pred, "query_id", "id", "rank", gold, "query_id", "id", k = 10)
        .orderBy("query_id")
    }),
    // contrastive hard negatives: top-5 most-similar DIFFERENT-source
    // vectors per anchor (label mismatch filters before scoring)
    "x_hard_negatives" -> ((s, dir) => {
      val lbl = docs(s, dir).select(col("doc_id").as("vec_id"), col("source"))
      val e = embs(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .join(lbl, "vec_id")
      val anchors = e.where(col("vec_id") < 4)
      Similarity.hardNegatives(e, "vec_id", "emb", "source",
        anchors, "vec_id", "emb", "source", k = 5)
        .select(col("anchor_id"), col("id").as("vec_id"), col("neg_label"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("anchor_id", "rank").limit(100)
    }),
    // IVF-pruned k-NN join on the planted-cluster frame (the big-query-
    // set scale path: queries equi-join their probed cells, never the
    // |q|×corpus broadcast fan-out) — with 2/8 cells probed the result
    // must still equal the brute-force per-query top-5
    "x_knn_join_ivf" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val centers = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      val clustered = e.join(broadcast(centers), pmod(col("vec_id"), lit(8)) === col("cid"))
        .select(col("vec_id"),
          zip_with(col("cemb"), col("emb"), (c, x) => c + lit(0.05) * x).as("emb"))
      val q = clustered.where(col("vec_id").isin(1, 2, 3))
      val idx = Similarity.ivfIndex(clustered, "vec_id", "emb", nlist = 8)
      Similarity.knnJoinIvf(idx, q, "vec_id", "emb", k = 5, nprobe = 2)
        .select(col("query_id"), col("id").as("vec_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank").limit(100)
    }),
    // batch k-NN join against the persisted-shape IVF-PQ index: each
    // query brings its own ADC table, meets STORED codes by a cell
    // equi-join, and only candidate rows touch float vectors in the
    // re-rank — the large-query-set serving shape over the codes frame.
    // On the planted-cluster fixture with 2/8 cells probed and a
    // generous candidate cut the result must equal brute force.
    "x_knn_join_ivfpq" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val centers = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      val clustered = e.join(broadcast(centers), pmod(col("vec_id"), lit(8)) === col("cid"))
        .select(col("vec_id"),
          zip_with(col("cemb"), col("emb"), (c, x) => c + lit(0.05) * x).as("emb"))
      val q = clustered.where(col("vec_id").isin(1, 2, 3))
      val model = graft.operators.ProductQuantization.fit(clustered, "vec_id", "emb", m = 16, k = 16)
      val idx = graft.operators.ProductQuantization.ivfPqIndex(clustered, "vec_id", "emb", model, nlist = 8)
      graft.operators.ProductQuantization
        .knnJoinIvfPq(idx, clustered, "vec_id", "emb", q, "vec_id", "emb",
          k = 5, nprobe = 2, candidates = 400)
        .select(col("query_id"), col("id").as("vec_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank").limit(100)
    }),
    // nearest-centroid assignment with fixed probe centroids (vec_id < 8)
    "x_cluster_assign" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cents = e.where(col("vec_id") < 8)
      Similarity.assignNearestCentroid(e, "vec_id", "emb", cents, "vec_id", "emb")
        .select(col("id").as("vec_id"), col("cluster"), round(col("cosine"), 4).as("cosine"))
        .orderBy("vec_id").limit(2000)
    }),
    // PCA covariance pass: one-shot distributed second-moment sums →
    // upper-triangle sample covariance of the embedding dimensions
    "x_embed_cov" -> ((s, dir) =>
      graft.operators.Pca.covarianceLong(embs(s, dir), "embedding")
        .orderBy("i", "j")),
    // SemDeDup: within-cluster semantic near-dup pairs over planted
    // perturbed copies (cosine ≈ 0.97); fixed probe centroids (vec_id<8)
    // keep the assignment — and therefore the cluster scoping — oracle-
    // expressible
    "x_semdedup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val planted = e.where(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.25)), slice(col("emb"), 2, 63)).as("emb"))
      val cents = e.where(col("vec_id") < 8)
      Similarity.semanticNearDupPairs(e.union(planted), "vec_id", "emb",
        cents, "vec_id", "emb", threshold = 0.95)
        .select(col("id_a"), col("id_b"), col("cluster"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b").limit(100)
    }),
    // semantic decontamination: eval set = every 11th vector PERTURBED
    // (+0.1 on the first component) — a rephrased-benchmark stand-in
    // (near, not identical; n-gram overlap would be zero). Contaminated
    // = each eval item's unperturbed origin (cos ≈ 0.99 ≫ the 0.51
    // organic ceiling); hashed surface integer per the oracle rule
    "x_sem_decontam" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      val ev = e.where(col("vec_id") % 11 === 0)
        .select(col("vec_id").as("eval_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.1)),
            slice(col("emb"), 2, 63)).as("emb"))
      graft.operators.Decontamination.semanticOverlaps(
        e, "vec_id", "emb", ev, "eval_id", "emb", threshold = 0.9)
        .select(col("vec_id"), col("eval_id"),
          floor(col("cosine") * lit(10000.0) + lit(0.5)).cast("long")
            .as("cos_x1e4"))
        .orderBy("vec_id")
    }),
    // --- similarity search ---
    "x_ann_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      val q = broadcast(e.where(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding")))
      e.crossJoin(q)
        .select(col("vec_id"),
          round(graft.functions.cosine_sim(col("embedding"), col("q_embedding")), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id")).limit(10)
    }),
    // IVF on the UNCLUSTERED fixture, UNTUNED seed (r5 verdict: the
    // tuned seed=103 certified the fixture, not the operator). On
    // structureless random vectors the true top-10's cells are random,
    // so exactness genuinely requires probing most cells — nprobe=12/16
    // here, measured across seeds with ProbeIvfCells (worst effective
    // cell rank at the default seed: 5 at sf0.01, 10 at sf0.1;
    // replicas=2 keeps boundary vectors findable from both adjacent
    // cells). That is the documented graceful-degradation contract:
    // pruning adapts to the data, and when there is no structure the
    // operator converges toward (but never past) a full scan instead of
    // silently dropping recall. REAL cell pruning — 2 of 8 cells at the
    // default seed — is certified by x_ann_ivf_clustered below, on the
    // planted-cluster corpus IVF exists for.
    "x_ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      val query = e.where(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      val idx = Similarity.ivfIndex(e, "vec_id", "embedding", nlist = 16,
        assignReplicas = 2)
      Similarity.ivfTopK(idx, query, k = 10, nprobe = 12)
        .select(col("id").as("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),
    // CLUSTERED-corpus IVF recall contract (the case IVF exists for —
    // r5 verdict asked for a recall row that certifies the operator, not
    // a tuned seed): the fixture regroups embeddings into 8 planted
    // clusters (center = the vector with vec_id = id % 8, noise = 0.05×
    // the row's own vector), and cell pruning at the DEFAULT seed with
    // nprobe=2 of nlist=8 must reproduce the exact brute-force top-10
    // as a SET (output is ids only: selection gaps are ≥5e-7 in cosine,
    // far above double noise, while rounded-cosine columns would tie at
    // 4 decimals and make row order oracle-fragile).
    "x_ann_ivf_clustered" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
      val centers = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("emb").as("cemb"))
      val clustered = e.join(broadcast(centers), pmod(col("vec_id"), lit(8)) === col("cid"))
        .select(col("vec_id"),
          zip_with(col("cemb"), col("emb"), (c, x) => c + lit(0.05) * x).as("emb"))
      val query = clustered.where(col("vec_id") === 1)
        .select("emb").collect()(0).getSeq[Double](0).toArray
      val idx = Similarity.ivfIndex(clustered, "vec_id", "emb", nlist = 8)
      Similarity.ivfTopK(idx, query, k = 10, nprobe = 2)
        .select(col("id").as("vec_id")).orderBy("vec_id")
    }),
    // encode-once/search-many contract: the PQ codes frame is WRITTEN to
    // parquet at build time and each query ranks by scanning that narrow
    // persisted index (id, cell, codes) — no query-time encode, floats
    // touched only in the candidate re-rank (full probe + 200 candidates
    // makes the result the exact brute-force top-10, same oracle shape
    // as x_pq_topk).
    "x_pq_persisted" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val model = graft.operators.ProductQuantization.fit(e, "vec_id", "emb", m = 16, k = 16)
      val index = graft.operators.ProductQuantization.ivfPqIndex(e, "vec_id", "emb", model, nlist = 8)
      // deterministic per-SF path: repeated executions (bench warmup +
      // runs, scaling probes) OVERWRITE one index instead of leaving a
      // fresh temp copy per run; keyed on the sanitized fixture dir NAME
      // (not hashCode — collisions would silently serve a stale index)
      val dir0 = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_pq_index_" + dir.replaceAll("[^A-Za-z0-9._-]", "_")).getAbsolutePath
      graft.operators.ProductQuantization.writeIndex(index, dir0)
      val persisted = graft.operators.ProductQuantization.readIndex(s, dir0)
      val q = e.where(col("vec_id") === 0).select("emb").collect()(0).getSeq[Double](0).toArray
      graft.operators.ProductQuantization
        .ivfPqTopK(persisted, e, "vec_id", "emb", q, k = 10, nprobe = 8, candidates = 200)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),
    // planted-recall contract: 25 perturbed copies at cosine ≈ 0.97; the
    // banded signature join + exact verify must find exactly what the
    // DuckDB brute force finds
    "x_cosine_neardup" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val planted = e.where(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.25)), slice(col("emb"), 2, 63)).as("emb"))
      harnessManaged(Similarity.cosineNearDupPairsWithCleanup(e.union(planted), "vec_id", "emb",
        threshold = 0.95, dim = 64, chunks = 8))
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b").limit(100)
    }),
    // --- as-of join over events (custom operator; DuckDB native ASOF oracle) ---
    "x_asof_purchase" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events")
      val purchases = events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      graft.operators.AsOfJoin.asOf(
        events.select("event_id", "user_id", "ts"), purchases,
        Seq("user_id"), "ts", "p_ts")
        .select(col("event_id"), col("p_value").as("last_purchase"))
        .orderBy("event_id").limit(100)
    }),
    // --- multimodal feature extraction (documents-derived media so the
    //     partition-wise decode pipeline is oracle-checkable) ---
    "x_multimodal_features" -> ((s, dir) => {
      val media = graft.operators.Multimodal.fromDocuments(docs(s, dir))
      graft.operators.Multimodal.extractFeatures(media, dim = 16).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("frames_sampled"))
        .orderBy("media_id").limit(100)
    }),
    // REAL javax.imageio decode (r16 verdict #6): synthetic-but-valid
    // PNGs whose pixel statistics are pure functions of doc_id, decoded
    // back to pixels on executors — the oracle recomputes the same
    // stats arithmetically, so a fake decode cannot pass
    "x_multimodal_decode" -> ((s, dir) => {
      val media = graft.operators.Multimodal.pngTable(
        docs(s, dir).orderBy("doc_id").limit(100))
      graft.operators.Multimodal.decodeStats(media).orderBy("media_id")
    }),
    "x_asof_tolerance" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events")
      val purchases = events.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      graft.operators.AsOfJoin.asOf(
        events.select("event_id", "user_id", "ts"), purchases,
        Seq("user_id"), "ts", "p_ts", toleranceMs = 60 * 60 * 1000L)
        .select(col("event_id"), col("p_value").as("last_purchase"))
        .orderBy("event_id").limit(100)
    }),
    "x_frame_sample" -> ((s, dir) => {
      val media = graft.operators.Multimodal.fromDocuments(docs(s, dir))
      graft.operators.Multimodal.sampleFrames(media, dim = 8, everyMs = 1000L).toDF()
        .select(col("media_id"), col("frame_index"), col("frame_ts_ms"))
        .orderBy("media_id", "frame_index").limit(200)
    }),
    "x_skew_agg" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.Skew.saltedAggregate(s.table("events"), "user_id", "value")
        .select(col("user_id"), col("cnt"), round(col("sum"), 2).as("sum_value"),
          round(col("min"), 2).as("min_value"), round(col("max"), 2).as("max_value"))
        .orderBy("user_id").limit(100)
    }),
    // salted join under a manufactured hot key (every 3rd lineitem
    // collapses onto supplier 1): the salt spreads the hot key across
    // partitions, the build side replicates saltFactor×; the oracle is
    // the PLAIN join — salting must be invisible in the result
    "x_skew_join" -> ((s, dir) => {
      Sources.register(s, dir)
      val probe = s.table("lineitem").select(
        when(col("l_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("l_suppkey").cast("long")).as("k"),
        col("l_quantity").cast("double").as("q"))
      val build = s.table("supplier").select(
        col("s_suppkey").cast("long").as("k"),
        col("s_nationkey").cast("long").as("nk"))
      graft.operators.Skew.saltedJoin(probe, build, "k", saltFactor = 8)
        .groupBy("nk")
        .agg(count(lit(1)).as("n"), round(sum(col("q")), 2).as("sum_q"))
        .orderBy("nk")
    }),
    // --- range join (binned point-in-interval; DuckDB inequality-join oracle) ---
    "x_range_join" -> ((s, dir) => {
      Sources.register(s, dir)
      val points = s.table("customer").select(col("c_custkey"), col("c_acctbal"))
      val intervals = s.table("supplier").select(col("s_suppkey"),
        col("s_acctbal").as("lo"), (col("s_acctbal") + 500.0).as("hi"))
      graft.operators.RangeJoin.pointInInterval(points, intervals, "c_acctbal", "lo", "hi")
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy("c_custkey", "s_suppkey").limit(100)
    }),
    // --- stream-stream interval join: two LIVE MemoryStreams joined
    // with watermarked state (Streams.intervalJoinStream), the whole
    // streaming query run to completion inside the row — oracled
    // end-to-end against DuckDB's batch interval join (inner-join
    // emission makes the bounded replay equal the batch answer)
    "x_stream_join" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // HARNESS-SCOPED collect: MemoryStream has no distributed feeder,
      // so the fixture feed materializes on the driver. The bound is
      // the view/purchase projection (~2/7 of events — ~170k rows /
      // ~5 MB at sf0.1); the operator under test
      // (Streams.intervalJoinStream) is collect-free. If the bench SF
      // ever grows past 1.0, cap this feed AND the DuckDB oracle's
      // event set with the same deterministic predicate.
      val ev = s.table("events")
        .where(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .as[(Long, Long, java.sql.Timestamp, String)].collect()
      val vs = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val ps = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      vs.addData(ev.filter(_._4 == "view").map(e => (e._1, e._2, e._3)).toSeq: _*)
      ps.addData(ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3)).toSeq: _*)
      val joined = graft.streaming.Streams.intervalJoinStream(
        vs.toDF().toDF("view_id", "user_id", "v_ts"),
        ps.toDF().toDF("buy_id", "user_id", "b_ts"),
        "user_id", "v_ts", "b_ts", horizon = "30 minutes")
      s.catalog.dropTempView("x_stream_join_sink")
      // the stream-stream join's cost at this size is state-store
      // CHECKPOINTING, not compute: each shuffle partition carries four
      // HDFS-backed stores (2 sides × keyToNumValues/keyWithIndexToValue),
      // each writing delta files per batch — scope the partition count to
      // the streaming query (it is captured at query START) and restore.
      // Round-18 measurement (ProbeR18Stream, interleaved): the SAME
      // replay at 4 partitions ≈ 4.5s vs 2.5s at 1 — per-partition store
      // commit is the whole gap, so every stream replay below scopes to
      // the feed-derived count (1 at fixture scale, up to 8 at force
      // scale; results are partition-invariant — production sizes this
      // to throughput via the same scoped conf)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      try {
        val q = joined.writeStream.format("memory").queryName("x_stream_join_sink")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table("x_stream_join_sink")
        .select(col("user_id"), col("view_id"), col("buy_id"),
          (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
        .orderBy("view_id", "buy_id")
    }),
    // stream-stream LEFT OUTER interval join run to completion (r15
    // verdict #2): same watermarked state shape as x_stream_join, but
    // the subtlest emission semantics in the engine — MATCHED rows emit
    // eagerly as both sides arrive; an UNMATCHED left row emits its
    // null-padded result only once BOTH watermarks pass the end of its
    // join window (v_ts + horizon), because until then a matching right
    // row could still arrive. A far-future sentinel on each stream
    // advances both watermarks past every real window, and AvailableNow's
    // trailing no-data batch performs the eviction that emits the nulls
    // (the same trailing-batch behavior ProbeTwsSessions pinned for
    // timers). Bounded replay (user_id < 100 on both sides + sentinel)
    // therefore equals DuckDB's batch LEFT JOIN at the same horizon.
    "x_stream_join_outer" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = s.table("events")
        .where(col("event_type").isin("view", "purchase") && col("user_id") < 100)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        .as[(Long, Long, java.sql.Timestamp, String)].collect()
      val far = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
      val vs = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val ps = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      // sentinels share user_id -1 so they pair with each other (and
      // are filtered below), never with a real row
      vs.addData(ev.filter(_._4 == "view").map(e => (e._1, e._2, e._3)).toSeq
        :+ ((-1L, -1L, far)): _*)
      ps.addData(ev.filter(_._4 == "purchase").map(e => (e._1, e._2, e._3)).toSeq
        :+ ((-2L, -1L, far)): _*)
      val joined = graft.streaming.Streams.intervalJoinStream(
        vs.toDF().toDF("view_id", "user_id", "v_ts"),
        ps.toDF().toDF("buy_id", "user_id", "b_ts"),
        "user_id", "v_ts", "b_ts", horizon = "30 minutes",
        joinType = "leftOuter")
      s.catalog.dropTempView("x_stream_join_outer_sink")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      // the null emission NEEDS the trailing no-data batch — sibling
      // wrappers (userActivity, nearDupStream) disable
      // noDataMicroBatches session-wide for their timeout semantics and
      // never restore, so a session that ran one earlier would silently
      // turn this row into the inner join (round-16 self-review). Pin
      // true for this query, restore after.
      val prevNoData = s.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
      try {
        val q = joined.writeStream.format("memory")
          .queryName("x_stream_join_outer_sink")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
        prevNoData match {
          case Some(p) => s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", p)
          case None => s.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
        }
      }
      s.table("x_stream_join_outer_sink").where(col("user_id") >= 0)
        .select(col("user_id"), col("view_id"), col("buy_id"),
          (unix_micros(col("b_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
        .orderBy("view_id", "buy_id")
    }),
    // transformWithState end-to-end: the Spark-4 typed-state processor
    // (RunningTotalProcessor) folds per-user totals inside a REAL
    // streaming query (RocksDB store — the API requires it — scoped to
    // the query and restored); single AvailableNow batch in update
    // mode emits exactly the final per-user state, oracled against the
    // batch GROUP BY
    "x_tws_totals" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = s.table("events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect()
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Streams.Event]
      in.addData(ev.toSeq: _*)
      s.catalog.dropTempView("x_tws_totals_sink")
      val prevProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      try {
        val q = graft.streaming.Streams.runningTotalsStream(in.toDS())
          .writeStream.format("memory").queryName("x_tws_totals_sink")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally {
        prevProv match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      s.table("x_tws_totals_sink")
        .select(col("user_id"), col("events"),
          round(col("total_value"), 2).as("total_value"))
        .orderBy("user_id")
    }),
    // transformWithState INITIAL-STATE bootstrap (r15 verdict #4): the
    // batch→streaming migration — a batch aggregate over the month's
    // first half seeds the state store via handleInitialState, the
    // second half replays as the stream, and the emitted totals must
    // equal the batch GROUP BY over the CONCATENATED log for every
    // user the stream touches (snapshot-only users sit in state and
    // emit nothing — the oracle's IN-subquery mirrors that)
    "x_tws_bootstrap" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val snapshot = s.table("events")
        .where(dayofmonth(col("ts")) <= 15)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("events"), sum(col("value")).as("total_value"))
        .as[(Long, Long, Double)]
      val ev = s.table("events")
        .where(dayofmonth(col("ts")) >= 16)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect()
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Streams.Event]
      in.addData(ev.toSeq: _*)
      s.catalog.dropTempView("x_tws_bootstrap_sink")
      val prevProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      try {
        val q = graft.streaming.Streams
          .runningTotalsBootstrapped(in.toDS(), snapshot)
          .writeStream.format("memory").queryName("x_tws_bootstrap_sink")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally {
        prevProv match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      s.table("x_tws_bootstrap_sink")
        .select(col("user_id"), col("events"),
          round(col("total_value"), 2).as("total_value"))
        .orderBy("user_id")
    }),
    // transformWithState with MapState + ListState: per-user top-3
    // event types (MapState lifetime counts) and the 20-newest recency
    // buffer (ListState, append-then-trim), run as a REAL streaming
    // query (RocksDB, scoped partitions) — single AvailableNow batch in
    // update mode emits the final per-user rank block, oracled against
    // the batch window-rank replica. Buffer stats are min/max: order-
    // independent, so the hashed surface carries no float-sum drift.
    "x_tws_topk" -> ((s, dir) => {
      Sources.register(s, dir)
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ev = s.table("events")
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[graft.streaming.Streams.Event].collect()
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.Streams.Event]
      in.addData(ev.toSeq: _*)
      s.catalog.dropTempView("x_tws_topk_sink")
      val prevProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      s.conf.set("spark.sql.shuffle.partitions", replayPartitions(ev.length))
      try {
        val q = graft.streaming.Streams.topKRecentStream(in.toDS(), k = 3, recentSize = 20)
          .writeStream.format("memory").queryName("x_tws_topk_sink")
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitBounded(q)
      } finally {
        prevProv match {
          case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
      s.table("x_tws_topk_sink")
        .select(col("user_id"), col("rank"), col("event_type"), col("n_events"),
          col("recent_n"), col("recent_min"), col("recent_max"))
        .orderBy("user_id", "rank")
    }),
    // --- sessionization (session_window; oracled via DuckDB gaps-and-islands) ---
    "x_events_sessions" -> ((s, dir) => {
      Sources.register(s, dir)
      s.table("events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start").limit(100)
    }),
    // --- character-distribution quality signals (one-pass codegen'd
    // expression; the oracle replicates it as explode-per-char + entropy()) ---
    // empty docs are excluded on BOTH sides: DuckDB's per-char unnest
    // yields no rows for '' (the doc would vanish from the oracle) while
    // CharDistribution emits a defined (0.0, 0) row — the filter keeps
    // the two result sets aligned rather than relying on the fixture
    // containing no empty text
    "x_entropy" -> ((s, dir) =>
      TextAnalysis.charDistribution(
        docs(s, dir).where(length(col("text")) > 0), "doc_id", "text")
        .orderBy("doc_id").limit(100)),
    // per-host URL stats (C4-style domain filtering feed) over the same
    // deterministic augmentation as x_url_extract
    "x_host_stats" -> ((s, dir) => {
      val aug = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(col("text"), lit(" see https://www.site"), col("doc_id") % 20,
            lit(".example.org/p/"), col("doc_id"), lit(" and http://cdn"),
            col("doc_id") % 7, lit(".example.net")))
          .otherwise(col("text")).as("text"))
      TextAnalysis.hostStats(aug, "doc_id", "text")
        .orderBy("host").limit(100)
    }),
    // --- embedding compression (int8 quantization + random projection) ---
    "x_embed_quantize" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      graft.operators.Quantization.quantizeInt8(e, "vec_id", "emb")
        .orderBy("vec_id").limit(2000)
    }),
    // quantized-cosine top-10 against vec 0: per-vector scales cancel in
    // cosine, so the ranking runs on integer codes (8x smaller index)
    "x_quantized_topk" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val q = e.where(col("vec_id") === 0).select("emb")
        .collect()(0).getSeq[Double](0).toArray
      graft.operators.Quantization.quantizedTopK(e, "vec_id", "emb", q, k = 10)
    }),
    // deterministic +-1 random projection (JL) of the first 50 vectors to
    // 8 dims; the trig-hash sign pattern keeps the matrix oracle-computable
    "x_rand_proj" -> ((s, dir) => {
      val e = embs(s, dir).where(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      graft.operators.Quantization.randomProject(e, "vec_id", "emb", outDim = 8)
        .orderBy("vec_id", "dim").limit(500)
    }),
    // Bloom-screened decontamination: must equal x_decontam exactly (the
    // Bloom count upper-bounds the true overlap, so the screen has no
    // false negatives and the exact verify runs on candidates only)
    "x_bloom_decontam" -> ((s, dir) => {
      val d = docs(s, dir)
      val evalSet = d.where(col("doc_id") % 97 === 0)
      graft.operators.Decontamination.decontaminateBloom(
        d, "doc_id", "text", evalSet, "text", n = 3, minOverlap = 5)
        .select(col("doc_id")).orderBy("doc_id").limit(2000)
    }),
    // product quantization encode (probe codebooks = slices of vectors
    // 0..15, so the argmin is SQL-replicable; ties break to lower code)
    "x_pq_encode" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val model = graft.operators.ProductQuantization.probeModel(e, "vec_id", "emb", m = 8, k = 16)
      graft.operators.ProductQuantization
        .encodeLong(e.where(col("vec_id") < 100), "vec_id", "emb", model)
        .orderBy("vec_id", "subspace").limit(1000)
    }),
    // codebook fit-quality / drift stats: per-subspace quantization
    // residuals (avg + max squared L2 to the nearest centroid) — the
    // metric an index operator watches per ingest batch; probe
    // codebooks keep the argmin oracle-expressible
    "x_pq_errors" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val model = graft.operators.ProductQuantization.probeModel(e, "vec_id", "emb", m = 8, k = 16)
      graft.operators.ProductQuantization
        .quantizationErrorStats(e.where(col("vec_id") < 100), "vec_id", "emb", model)
        .select(col("subspace"), col("n"),
          round(col("avg_sq_error"), 6).as("avg_sq_error"),
          round(col("max_sq_error"), 6).as("max_sq_error"))
        .orderBy("subspace").limit(100)
    }),
    // PQ ADC search RECALL CONTRACT: codes-only ranking (trained
    // codebooks, m=16 4-bit codes = 8 B/vector) + exact re-rank of 200
    // candidates must return the exact brute-force top-10 (DuckDB
    // computes the gold ranking; ProbePq0 measured the margin — 100
    // candidates already exact at sf0.01, 150 at sf0.1's 2000 vectors)
    "x_pq_topk" -> ((s, dir) => {
      val e = embs(s, dir).select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val model = graft.operators.ProductQuantization.fit(e, "vec_id", "emb", m = 16, k = 16)
      val q = e.where(col("vec_id") === 0).select("emb").collect()(0).getSeq[Double](0).toArray
      graft.operators.ProductQuantization.adcTopK(e, "vec_id", "emb", model, q, k = 10, candidates = 200)
    }),
    // incremental ingest dedup: incoming batch (doc_id % 10 = 0) screened
    // against the existing corpus; RECALL CONTRACT — every exact-Jaccard
    // >= 0.8 cross-split pair must surface with its exact jaccard
    "x_dedup_incremental" -> ((s, dir) => {
      val d = docs(s, dir)
      harnessManaged(Dedup.incrementalNearDuplicatesWithCleanup(
        d.where(col("doc_id") % 10 =!= 0), d.where(col("doc_id") % 10 === 0),
        "doc_id", "text", threshold = 0.8))
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b").limit(200)
    }),
    // top-3 events by value per user via the bounded-heap aggregate
    // (ObjectHashAggregate partial+final; NO WindowExec row sort)
    "x_group_topk" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.GroupTopK.topKPerGroup(
        s.table("events"), Seq("user_id"), "value", "event_id", k = 3)
        .select(col("user_id"), col("rank"), col("event_id"),
          round(col("value"), 4).as("value"))
        .orderBy("user_id", "rank").limit(1000)
    }),
    // --- mergeable sketch indexes (operators/Sketches.scala): per-day
    // sketches built in ONE corpus pass, every rollup answered by
    // merging kilobyte sketch rows — the 100 TB summary pattern. Each
    // query carries its accuracy contract through the oracle gate as an
    // exact-side value plus an in-contract flag (the estimate itself is
    // not DuckDB-reproducible; the flag is). ---
    "x_sketch_distinct" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events").withColumn("day", to_date(col("ts")))
      val idx = Sketches.hllIndex(events, Seq("event_type", "day"), "user_id")
      val est = Sketches.hllEstimate(idx, Seq("event_type"))
      val exact = events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"))
      exact.join(est, "event_type")
        .select(col("event_type"), col("n_users"),
          (abs(col("distinct_est") - col("n_users")) <= col("n_users") * 0.05)
            .cast("int").as("est_ok"))
        .orderBy("event_type")
    }),
    "x_sketch_overlap" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events")
      val cohorts = Sketches.thetaCohorts(
        events.where(col("event_type").isin("purchase", "click")),
        "event_type", "user_id")
      val ov = Sketches.thetaOverlap(cohorts, "event_type", "purchase", "click")
      val exact = events.where(col("event_type") === "purchase")
        .select("user_id").distinct()
        .join(events.where(col("event_type") === "click")
          .select("user_id").distinct(), "user_id")
        .agg(count(lit(1)).as("n_both"))
      exact.crossJoin(ov).select(col("n_both"),
        (abs(col("est_both") - col("n_both")) <= col("n_both") * 0.05)
          .cast("int").as("both_ok"),
        (col("jaccard") >= 0.0 && col("jaccard") <= 1.0)
          .cast("int").as("jaccard_ok"))
    }),
    // sketch-containment FK inference (catalog/FkInference.scala): the
    // DuckDB oracle decides each planted edge EXACTLY (containment via
    // IN-subquery distinct counts, key-ness via distinct/rows) and the
    // theta-sketch path must reach the same verdicts — seven real FK
    // edges inferred, a reversed edge and a disjoint key space rejected
    "x_fk_infer" -> ((s, dir) => {
      Sources.register(s, dir)
      val cand = graft.catalog.FkInference.candidateEdges(
        graft.catalog.FkInference.columnSketches(s, Sources.fixtureTables))
      import s.implicits._
      val exp = Queries.FkCheckedPairs.toDF(
        "child_table", "child_column", "parent_table", "parent_column")
      exp.join(cand,
          Seq("child_table", "child_column", "parent_table", "parent_column"), "left")
        .select(
          concat_ws(".", col("child_table"), col("child_column")).as("child"),
          concat_ws(".", col("parent_table"), col("parent_column")).as("parent"),
          (coalesce(col("containment"), lit(0.0)) >= 0.95 &&
            coalesce(col("parent_unique_ratio"), lit(0.0)) >= 0.95)
            .cast("int").as("inferred"))
        .orderBy("child", "parent")
    }),
    "x_cms_counts" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events").withColumn("day", to_date(col("ts")))
      val idx = Sketches.cmsIndex(events, Seq("day"), "event_type")
      val merged = Sketches.cmsMerge(idx, Seq.empty)
      val exact = events.groupBy("event_type").agg(count(lit(1)).as("n_events"))
      val total = events.count()
      Sketches.cmsCounts(merged, exact.select("event_type"), "event_type")
        .join(exact, "event_type")
        .select(col("event_type"), col("n_events"),
          // CMS error is ONE-SIDED: never an undercount, overcount
          // bounded by eps * N at the configured confidence
          (col("freq_est") >= col("n_events") &&
            col("freq_est") <= col("n_events") + lit(0.001 * total).cast("long") + lit(1))
            .cast("int").as("est_ok"))
        .orderBy("event_type")
    }),
    // sketch-SERVED queries (catalog/SketchCatalog.scala): same accuracy
    // contracts as the x_sketch_* build queries, but the estimate comes
    // through the ENGINE ROUTING path — an NL question with an
    // approximation marker answered from the registered, persisted index
    // (EngineSpec pins that the routed plan never rescans the corpus)
    "x_serve_distinct" -> ((s, dir) => {
      Sources.register(s, dir)
      s.sql("SELECT event_type, user_id, to_date(ts) AS day FROM events")
        .createOrReplaceTempView("events_keyed")
      val cat = new graft.catalog.SketchCatalog(s)
      cat.indexDistinct("events_keyed", "user_id", Seq("event_type", "day"))
      val served = cat.route("roughly how many distinct user_id per event_type")
        .getOrElse(sys.error("sketch route did not fire"))
      val exact = s.table("events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"))
      exact.join(served, "event_type")
        .select(col("event_type"), col("n_users"),
          (abs(col("distinct_est") - col("n_users")) <= col("n_users") * 0.05)
            .cast("int").as("est_ok"))
        .orderBy("event_type")
    }),
    "x_serve_overlap" -> ((s, dir) => {
      Sources.register(s, dir)
      val cat = new graft.catalog.SketchCatalog(s)
      cat.indexCohorts("events", "event_type", "user_id")
      val served = cat.route("roughly how many user_id did both purchase and click")
        .getOrElse(sys.error("cohort route did not fire"))
      val events = s.table("events")
      val exact = events.where(col("event_type") === "purchase")
        .select("user_id").distinct()
        .join(events.where(col("event_type") === "click")
          .select("user_id").distinct(), "user_id")
        .agg(count(lit(1)).as("n_both"))
      exact.crossJoin(served).select(col("n_both"),
        (abs(col("est_both") - col("n_both")) <= col("n_both") * 0.05)
          .cast("int").as("both_ok"),
        (col("jaccard") >= 0.0 && col("jaccard") <= 1.0)
          .cast("int").as("jaccard_ok"))
    }),
    "x_serve_quantile" -> ((s, dir) => {
      Sources.register(s, dir)
      s.sql("SELECT event_type, value, to_date(ts) AS day FROM events")
        .createOrReplaceTempView("events_keyed")
      val cat = new graft.catalog.SketchCatalog(s)
      cat.indexQuantiles("events_keyed", "value", Seq("event_type", "day"))
      val served = cat.route("roughly the 95th percentile of value per event_type")
        .getOrElse(sys.error("sketch route did not fire"))
      s.table("events").join(served.select("event_type", "q_0_95"), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(when(col("value") <= col("q_0_95"), 1).otherwise(0)) / count(lit(1))).as("__r95"))
        .select(col("event_type"), col("n"),
          (abs(col("__r95") - 0.95) <= 0.03).cast("int").as("p95_ok"))
        .orderBy("event_type")
    }),
    "x_sketch_quantiles" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events").withColumn("day", to_date(col("ts")))
      val idx = Sketches.kllIndex(events, Seq("event_type", "day"), "value")
      val q = Sketches.kllQuantiles(idx, Seq("event_type"), Seq(0.5, 0.95))
      events.join(q.select("event_type", "q_0_5", "q_0_95"), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          (sum(when(col("value") <= col("q_0_5"), 1).otherwise(0)) / count(lit(1))).as("__r50"),
          (sum(when(col("value") <= col("q_0_95"), 1).otherwise(0)) / count(lit(1))).as("__r95"))
        .select(col("event_type"), col("n"),
          (abs(col("__r50") - 0.5) <= 0.03).cast("int").as("p50_ok"),
          (abs(col("__r95") - 0.95) <= 0.03).cast("int").as("p95_ok"))
        .orderBy("event_type")
    }),
    // --- streaming-shaped (batch view of the events table) ---
    "x_events_hourly" -> ((s, dir) => {
      Sources.register(s, dir)
      s.table("events")
        .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("hour", "event_type").limit(100)
    }),
    // wide-format pivot (ref's result tables render long→wide client
    // side; here it's the engine op): the explicit value list lowers to
    // ONE grouped pass with 5 conditional aggregates — no distinct-scan
    // to discover columns, and unlike Dataset.pivot (which pre-aggregates
    // on (key, value) and shuffles AGAIN for pivotfirst) a single
    // shuffle whose partials combine map-side like any groupBy
    "x_pivot" -> ((s, dir) => {
      Sources.register(s, dir)
      val wide = Seq("click", "error", "purchase", "signup", "view").map(t =>
        round(sum(when(col("event_type") === t, col("value"))), 2).as(t))
      s.table("events")
        .groupBy(col("user_id"))
        .agg(wide.head, wide.tail: _*)
        .orderBy("user_id").limit(200)
    }),
    // hopping (sliding) time window — the batch face of the Structured
    // Streaming windowed aggregation (Streams.scala uses the same
    // window() expression under a watermark): window() expands each
    // event to its size/slide = 2 window assignments, then ONE grouped
    // pass with map-side partials; state at scale is |windows×types|,
    // bounded by the time range, never by corpus size
    "x_sliding_window" -> ((s, dir) => {
      Sources.register(s, dir)
      s.table("events")
        .groupBy(window(col("ts"), "6 hours", "3 hours"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").cast("string").as("window_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy("window_start", "event_type").limit(500)
    }),
    // time-series gap-fill (resample): the hour spine derives from ONE
    // min/max aggregate (map-side combinable), sequence+explode builds
    // |hours|×|types| grid rows — bounded by the time range, never by
    // corpus size — and the hourly counts LEFT-join onto the broadcast
    // grid, zero-filled. The corpus-sized work is exactly one grouped
    // pass; everything else is kilobytes.
    "x_gap_fill" -> ((s, dir) => {
      Sources.register(s, dir)
      val ev = s.table("events")
        .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"), col("value"))
      val spine = ev.agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
        .select(explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour"))
      val grid = spine.crossJoin(ev.select(col("event_type")).distinct())
      val hourly = ev.groupBy(col("hour"), col("event_type"))
        .agg(count(lit(1)).as("c"), sum(col("value")).as("sv"))
      // the aggregated hourly frame is |hours|×|types| rows — bounded by
      // the time range, so it broadcasts as the right side of the left
      // join (Spark cannot broadcast the preserved side)
      grid.join(broadcast(hourly), Seq("hour", "event_type"), "left")
        .select(col("hour").cast("string").as("hour"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("cnt"),
          round(coalesce(col("sv"), lit(0.0)), 2).as("sum_value"))
        .orderBy("hour", "event_type").limit(500)
    }),
    // per-user running total + gap-since-previous-event (the W1 surface
    // deepened with frame-running aggregates and LAG): the window
    // partitions BY USER — thousands of small partitions, never a
    // global sort; gaps compare exact microsecond longs on both engines
    // (DuckDB truncates its ns timestamps to the same µs grid)
    "x_running_total" -> ((s, dir) => {
      Sources.register(s, dir)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      s.table("events").select(col("event_id"), col("user_id"),
        round(sum(col("value")).over(w), 2).as("running_value"),
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
        .orderBy("event_id").limit(1000)
    }),
    // relative-date serving (SURVEY P10, ref query_intent.py:183-195):
    // the NL phrase "in the last 10 days" goes through the TEMPLATE
    // layer's extractFilters with a frozen `now`, renders as a concrete
    // DATE lower bound, and the filtered aggregate must match the
    // oracle computed from the same frozen date — certifying the NL→
    // filter path, not a hand-written WHERE
    "x_relative_date" -> ((s, dir) => {
      Sources.register(s, dir)
      val events = s.table("events")
      val conds = graft.gen.Templates.extractFilters(
        "events in the last 10 days", events.columns.toSeq, Queries.frozenNow)
      events.where(conds.mkString(" AND "))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("event_type")
    }),
    // multi-dimensional clustered layout: the Morton z-value that drives
    // Layout.zorderWrite, computed distributed over two clustering
    // --- cross-source entity resolution (operators/EntityResolution.scala) ---
    // The right source is the part table with every 'e' dropped from the
    // name and shifted ids — a deterministic stand-in for a second crawl
    // snapshot. Both engines run the SAME blocking, Jaro-Winkler scoring
    // and best-match ranking, so the comparison pins the whole linkage
    // pipeline, not the fixture.
    "x_entity_match" -> ((s, dir) => {
      Sources.register(s, dir)
      val left = s.table("part")
        .select(col("p_partkey").as("id"), lower(col("p_name")).as("name"))
      val right = s.table("part")
        .select((col("p_partkey") + 10000000L).as("id"),
          regexp_replace(lower(col("p_name")), "e", "").as("name"))
      graft.operators.EntityResolution.resolve(left, "id", "name",
          right, "id", "name", threshold = 0.9, topPerLeft = 1)
        .select(col("l_id"), col("r_id"), round(col("sim"), 4).as("sim"))
        .orderBy("l_id")
    }),
    // columns and oracled bit-for-bit. Fixed-width rank buckets here
    // (min/max from one tiny aggregate) instead of the write path's
    // percentile_approx cuts, because the oracle must reproduce the
    // bucket boundaries EXACTLY — integer column ranges make every cut
    // an exact double (/256.0 is a power-of-two divide), so both engines
    // compute identical ranks and identical interleaved z-values
    "x_zorder_value" -> ((s, dir) => {
      Sources.register(s, dir)
      val li = s.table("lineitem")
      val r = li.agg(min("l_partkey"), max("l_partkey"),
        min("l_suppkey"), max("l_suppkey")).head()
      def cuts(mn: Long, mx: Long): Array[Double] =
        (1 until 256).map(i => mn + i * (mx - mn) / 256.0).toArray
      val z = graft.operators.Layout.zorderValue(Seq(
        graft.operators.Layout.bucketOf(col("l_partkey"), cuts(r.getLong(0), r.getLong(1))),
        graft.operators.Layout.bucketOf(col("l_suppkey"), cuts(r.getLong(2), r.getLong(3)))))
      li.select(col("l_orderkey"), col("l_linenumber"), z.as("zval"))
        .orderBy(desc("zval"), col("l_orderkey"), col("l_linenumber")).limit(500)
    }),
    // metadata-FILTERED vector search: the predicate reaches the
    // documents scan (pushed filter) and prunes BEFORE scoring — only
    // filter-surviving vectors are ever scored (Similarity.filteredTopK;
    // boundary safety: rank-10/11 cosine gap is >=0.009 at both SFs,
    // far above the 4dp rounding grid, so full-precision selection and
    // the oracle's rounded selection pick the same set)
    "x_ann_filtered" -> ((s, dir) => {
      val e = embs(s, dir)
      val d = docs(s, dir)
      val query = e.where(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray
      Similarity.filteredTopK(e, "vec_id", "embedding", d, "doc_id",
          col("lang") === "en" &&
            col("source").isin("src0", "src1", "src2", "src3", "src4"),
          query, k = 10)
        .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    }),
    // ordered funnel signup → click → purchase: per-step reach is a
    // filtered scan + min-aggregate joined on the user key against the
    // previous step's reach frame (EventAnalytics.funnel)
    "x_funnel" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.funnel(s.table("events"),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
        .orderBy("step")
    }),
    // retention cohorts by first-seen day: user-keyed aggregates +
    // distinct user-days, shuffle rows bounded by |users|+|user-days|
    "x_retention_cohort" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.retentionCohorts(s.table("events"), "user_id", "ts")
        .orderBy("cohort_day", "day_offset").limit(2000)
    }),
    // time-to-convert per funnel transition (same reach frames as
    // x_funnel, joined pairwise on the user key; exact percentile)
    "x_funnel_timing" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.funnelTiming(s.table("events"),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
        .orderBy("transition")
    }),
    // Markov transition matrix over per-user event sequences: one
    // window pass partitioned BY USER, then |types|²-row aggregates
    "x_event_transitions" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.eventTransitions(s.table("events"),
        "user_id", "ts", "event_type", "event_id")
        .orderBy("from_type", "to_type")
    }),
    // sketch-based rolling retention: |days| theta sketches from ONE
    // corpus pass, then pure set algebra per (day, offset) cell —
    // exact below 4096 users/day (both fixture SFs), so the DuckDB
    // exact side must agree row-for-row
    "x_retention_sketch" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.rollingRetentionSketch(
        s.table("events"), "user_id", "ts", Seq(1, 7))
        .orderBy("day", "day_offset").limit(500)
    }),
    // per-key trailing-7-day rolling stats: one corpus-sized
    // pre-aggregation to (type, day), then a RANGE-frame window over
    // the tiny per-key day series (gap days age out)
    "x_rolling_stats" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.rollingDailyStats(
        s.table("events"), "event_type", "ts", "value", windowDays = 7)
        .orderBy("event_type", "day").limit(500)
    }),
    // per-type z-score anomalies: one stats pass, broadcast back onto
    // the scan — no user-keyed shuffle (threshold 2.5: nearest |z| is
    // 1.4e-4 away at sf0.1, far above engine drift)
    "x_anomaly_zscore" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.anomalyZscores(s.table("events"),
        "event_type", "value", Seq("event_id"), threshold = 2.5)
        .orderBy("event_id").limit(500)
    }),
    // robust median/MAD outliers (two broadcast stats passes, no
    // event-keyed shuffle — same plan family as the z-score op)
    "x_anomaly_mad" -> ((s, dir) => {
      Sources.register(s, dir)
      graft.operators.EventAnalytics.anomalyMad(s.table("events"),
        "event_type", "value", Seq("event_id"), threshold = 3.0)
        .orderBy("event_id").limit(500)
    }),
    // hybrid BM25 + cosine retrieval fused by reciprocal rank — every
    // list selected and ranked by its 4dp-rounded score with id
    // tiebreak on BOTH engines, so membership and ranks are exact
    "x_hybrid_rrf" -> ((s, dir) => {
      val e = embs(s, dir)
      val query = e.where(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).toArray.map(_.toDouble)
      graft.operators.HybridSearch.searchDocuments(
        docs(s, dir), "doc_id", "text", e, "vec_id", "embedding",
        Seq("spark", "window", "merge"), query, nPerList = 50, k = 10)
    }))
}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Run one declared query through the engine's full safety path:
    * register sources → parse → denylist → allow-list → limit check →
    * execute (LIMIT injected if absent). */
  private[graft] def engineFrame(spark: SparkSession, dir: String, sql: String): DataFrame = {
    val tables = Sources.register(spark, dir)
    Validator.validate(spark, sql, tables.toSet) match {
      case Right(v) => Executor.frame(spark, v, limit = Executor.DefaultLimit)
      case Left(err) => throw new IllegalArgumentException(s"${err.kind}: ${err.message}")
    }
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    engineFrame(spark, "/root/testdata/sf0.001", Queries.byName("d08_join_chain"))

  /** One entry per implemented operator from SURVEY.md §2 + the
    * north-star extension operators. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.sql.map { case (name, q) =>
      name -> ((s: SparkSession, dir: String) => engineFrame(s, dir, q))
    }.toMap ++ ExtensionQueries.builders

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (LSH/minhash/simhash internals) → driver does a rows-only check. */
  def oracleSql: Map[String, String] = Queries.byName ++ Queries.extensionOracles
}
