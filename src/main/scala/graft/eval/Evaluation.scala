package graft.eval

import graft.api.Engine
import graft.core.QueryResult

/**
 * Offline evaluation harness mirroring the reference's pilot methodology
 * (SURVEY.md §5/§6; Report 2 §8): execution success rate, set-based
 * result-set F1 vs gold SQL, unsafe-query block rate on an adversarial
 * corpus, and median end-to-end latency.
 *
 * F1 is computed driver-side over the (LIMIT-capped) result sets — both
 * sides are bounded by the engine's row cap, so this is never an
 * unbounded collect.
 */
object Evaluation {

  final case class EvalCase(question: String, goldSql: String, intent: String = "other")

  final case class CaseOutcome(
      question: String, executed: Boolean, f1: Double, latencyMs: Long,
      generatedSql: String, error: String, intent: String = "other")

  /** Per-intent slice of the report: case count, execution rate, mean F1
    * (the reference's failure log groups by planner path —
    * Project_Plan.txt:60-63 "log failures with reasons"). */
  final case class IntentStats(n: Int, execRate: Double, macroF1: Double)

  final case class Report(
      n: Int, execSuccessRate: Double, macroF1: Double,
      unsafeBlockedRate: Double, medianLatencyMs: Long,
      cases: Seq[CaseOutcome],
      byIntent: Map[String, IntentStats] = Map.empty)

  /** Set-based F1 between two results (column-name-order independent:
    * rows are normalized by sorting each result's columns by name). */
  def resultF1(a: QueryResult, b: QueryResult): Double = {
    def rowSet(r: QueryResult): Set[Seq[String]] = {
      val order = r.columns.zipWithIndex.sortBy(_._1).map(_._2)
      r.rows.map(row => order.map(i => String.valueOf(row(i)))).toSet
    }
    val (sa, sb) = (rowSet(a), rowSet(b))
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = (sa intersect sb).size.toDouble
    val p = inter / sa.size
    val rc = inter / sb.size
    if (p + rc == 0) 0.0 else 2 * p * rc / (p + rc)
  }

  /**
   * Distributed set-based F1 between two DataFrames (SURVEY.md §2.11's
   * in-engine variant): rows are normalized (columns sorted by name,
   * values stringified), hashed, deduplicated, and compared with a full
   * outer join on the hash — no driver materialization, works on results
   * of any size. Schemas must expose the same column-name set.
   */
  def distributedF1(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Double = {
    import org.apache.spark.sql.functions._
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"column sets differ: ${a.columns.sorted.mkString(",")} vs ${b.columns.sorted.mkString(",")}")
    def keys(df: org.apache.spark.sql.DataFrame) = {
      // \x01 separator prevents tuple aliasing; nulls map to a sentinel
      // (concat_ws silently DROPS nulls, which would alias ("a",null)/("a"))
      val ordered = df.columns.sorted.map(c => coalesce(col(c).cast("string"), lit("\u0001null")))
      df.select(sha2(concat_ws("", ordered: _*), 256).as("k")).distinct()
    }
    val ka = keys(a).withColumn("ina", lit(1))
    val kb = keys(b).withColumn("inb", lit(1))
    val joined = ka.join(kb, Seq("k"), "full_outer")
      .agg(
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1).otherwise(0)).as("inter"),
        sum(when(col("ina").isNotNull, 1).otherwise(0)).as("na"),
        sum(when(col("inb").isNotNull, 1).otherwise(0)).as("nb"))
      .collect()(0)
    val inter = joined.getLong(0).toDouble
    val na = joined.getLong(1).toDouble
    val nb = joined.getLong(2).toDouble
    if (na == 0 && nb == 0) 1.0
    else if (na == 0 || nb == 0) 0.0
    else {
      val p = inter / na; val r = inter / nb
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  /** Evaluate NL→SQL quality over a labeled corpus. */
  def run(engine: Engine, cases: Seq[EvalCase],
      ask: (Engine, String) => Either[graft.core.EngineError, QueryResult] =
        (e, q) => e.ask(q)): Report = {
    val outcomes = cases.map { c =>
      val t0 = System.nanoTime()
      val result = ask(engine, c.question)
      val latency = (System.nanoTime() - t0) / 1000000L
      result match {
        case Right(r) =>
          val f1 = engine.run(c.goldSql) match {
            case Right(gold) => resultF1(r, gold)
            case Left(err) => throw new IllegalArgumentException(
              s"gold SQL failed for '${c.question}': ${err.message}")
          }
          CaseOutcome(c.question, executed = true, f1, latency, r.sql, "", c.intent)
        case Left(err) =>
          CaseOutcome(c.question, executed = false, 0.0, latency, "", err.message, c.intent)
      }
    }
    val latencies = outcomes.map(_.latencyMs).sorted
    val byIntent = outcomes.groupBy(_.intent).map { case (intent, os) =>
      intent -> IntentStats(os.size,
        os.count(_.executed).toDouble / os.size,
        os.map(_.f1).sum / os.size)
    }
    Report(
      n = cases.size,
      execSuccessRate = outcomes.count(_.executed).toDouble / cases.size,
      macroF1 = if (outcomes.isEmpty) 0.0 else outcomes.map(_.f1).sum / outcomes.size,
      unsafeBlockedRate = Double.NaN, // filled by runSafetyProbes
      medianLatencyMs = if (latencies.isEmpty) 0 else latencies(latencies.size / 2),
      cases = outcomes,
      byIntent = byIntent)
  }

  /** Adversarial safety corpus (Report 2 §8 probes): all must be blocked. */
  val safetyProbes: Seq[String] = Seq(
    "DROP TABLE customer",
    "DELETE FROM orders WHERE 1=1",
    "UPDATE customer SET c_acctbal = 0",
    "INSERT INTO orders VALUES (1, 2, 'x')",
    "CREATE TABLE pwn (x INT)",
    "ALTER TABLE customer DROP COLUMN c_name",
    "TRUNCATE TABLE lineitem",
    "MERGE INTO customer USING orders ON 1=1 WHEN MATCHED THEN DELETE",
    "SELECT * FROM secret_table_not_allowed",
    // CTE-body and subquery-expression smuggling (the two traversal
    // bypass classes closed in rounds 5 and 9)
    "WITH g AS (SELECT * FROM secret_table_not_allowed) SELECT * FROM g",
    "SELECT * FROM customer WHERE c_custkey IN (SELECT k FROM secret_table_not_allowed)",
    "GRANT ALL ON customer TO PUBLIC")

  def runSafetyProbes(engine: Engine, probes: Seq[String] = safetyProbes): Double = {
    val blocked = probes.count(p => engine.run(p).isLeft)
    blocked.toDouble / probes.size
  }

  /** The 17-question pilot corpus over the retail (TPC-H-ish) fixture
    * (mirrors the reference's pilot shape; gold SQL is deterministic). */
  val pilotCorpus: Seq[EvalCase] = Seq(
    EvalCase("how many customers are there",
      "SELECT COUNT(*) AS agg_value FROM customer", "count"),
    EvalCase("count of orders per orderpriority",
      "SELECT o_orderpriority, COUNT(*) AS agg_value FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority LIMIT 100", "groupby_agg"),
    EvalCase("average customer account balance per market segment",
      "SELECT c_mktsegment, AVG(c_acctbal) AS agg_value FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment LIMIT 100", "groupby_agg"),
    EvalCase("list all unique market segments from customer",
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment LIMIT 100", "distinct"),
    EvalCase("how many orders are there",
      "SELECT COUNT(*) AS agg_value FROM orders", "count"),
    EvalCase("total quantity on lineitem per returnflag",
      "SELECT l_returnflag, SUM(l_quantity) AS agg_value FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag LIMIT 100", "groupby_agg"),
    EvalCase("how many parts are there",
      "SELECT COUNT(*) AS agg_value FROM part", "count"),
    EvalCase("count of suppliers per nationkey",
      "SELECT s_nationkey, COUNT(*) AS agg_value FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 100", "groupby_agg"),
    EvalCase("how many distinct mktsegment values",
      "SELECT COUNT(DISTINCT c_mktsegment) AS agg_value FROM customer", "count_distinct"),
    EvalCase("list unique orderstatus values from orders",
      "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus LIMIT 100", "distinct"),
    EvalCase("how many nation rows",
      "SELECT COUNT(*) AS agg_value FROM nation", "count"),
    EvalCase("average supplier account balance per nationkey",
      "SELECT s_nationkey, AVG(s_acctbal) AS agg_value FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey LIMIT 100", "groupby_agg"),
    EvalCase("maximum part retailprice",
      "SELECT MAX(p_retailprice) AS agg_value FROM part", "minmax"),
    EvalCase("minimum supplier acctbal",
      "SELECT MIN(s_acctbal) AS agg_value FROM supplier", "minmax"),
    EvalCase("top 5 orders by totalprice",
      "SELECT * FROM orders ORDER BY o_totalprice DESC LIMIT 5", "topn"),
    EvalCase("first 3 nation rows by name",
      "SELECT * FROM nation ORDER BY n_name ASC LIMIT 3", "topn"),
    EvalCase("show customer rows along with the average acctbal per mktsegment",
      "SELECT *, AVG(c_acctbal) OVER (PARTITION BY c_mktsegment) AS window_value FROM customer LIMIT 100", "window"),
    EvalCase("orders after 1995-06-01",
      "SELECT * FROM orders WHERE o_orderdate >= DATE '1995-06-01' ORDER BY o_orderkey LIMIT 100", "filter_date"),
    EvalCase("how many orders before 1995",
      "SELECT COUNT(*) AS agg_value FROM orders WHERE o_orderdate < DATE '1995-01-01'", "filter_date"),
    // round-4 shapes exercised on the retail schema too (prefixed
    // column names — p_size, o_orderstatus — not the school's bare ones)
    EvalCase("parts with size between 10 and 15",
      "SELECT * FROM part WHERE p_size BETWEEN 10 AND 15 ORDER BY p_partkey LIMIT 100", "filter_between"),
    EvalCase("orders where orderstatus is F or orderstatus is O",
      "SELECT * FROM orders WHERE o_orderstatus = 'F' OR o_orderstatus = 'O' ORDER BY o_orderkey LIMIT 100", "filter_or"))

  /**
   * School-schema corpus (SchoolFixture): the reference demo-script
   * questions (`Miscellaneous/Project_Plan.txt:56-63` — grade-letter +
   * score filters, top-5 courses by average score, count per grade
   * letter) plus join/filter variants. Deliberately HARDER than the
   * pilot corpus — compound filters, top-N over aggregates and FK joins
   * are outside the template surface today, so macro-F1 has headroom to
   * show movement between rounds.
   */
  val schoolCorpus: Seq[EvalCase] = Seq(
    EvalCase("how many students are there",
      "SELECT COUNT(*) AS agg_value FROM students", "count"),
    EvalCase("how many courses are there",
      "SELECT COUNT(*) AS agg_value FROM courses", "count"),
    EvalCase("count of scores per grade",
      "SELECT grade, COUNT(*) AS agg_value FROM scores GROUP BY grade ORDER BY grade LIMIT 100", "groupby_agg"),
    EvalCase("average score per course_id",
      "SELECT course_id, AVG(score) AS agg_value FROM scores GROUP BY course_id ORDER BY course_id LIMIT 100", "groupby_agg"),
    EvalCase("list unique grade values from scores",
      "SELECT DISTINCT grade FROM scores ORDER BY grade LIMIT 100", "distinct"),
    EvalCase("list unique dept values from courses",
      "SELECT DISTINCT dept FROM courses ORDER BY dept LIMIT 100", "distinct"),
    EvalCase("how many distinct grade values",
      "SELECT COUNT(DISTINCT grade) AS agg_value FROM scores", "count_distinct"),
    EvalCase("maximum score",
      "SELECT MAX(score) AS agg_value FROM scores", "minmax"),
    EvalCase("minimum student age",
      "SELECT MIN(age) AS agg_value FROM students", "minmax"),
    EvalCase("count of students per grade_level",
      "SELECT grade_level, COUNT(*) AS agg_value FROM students GROUP BY grade_level ORDER BY grade_level LIMIT 100", "groupby_agg"),
    EvalCase("top 5 scores rows by score_id",
      "SELECT * FROM scores ORDER BY score_id DESC LIMIT 5", "topn"),
    // --- demo-script hard cases (joins / compound filters / agg top-N) ---
    EvalCase("scores with a C grade and score greater than 75",
      "SELECT * FROM scores WHERE grade = 'C' AND score > 75 ORDER BY score_id LIMIT 100", "filter_and"),
    // gold upgraded in round 12 alongside the cross-FK top-N template:
    // "top 5 COURSES" ranks the course entities, and the demo script
    // (Project_Plan.txt:60-62) displays them by NAME — the course_id
    // grouping this gold carried before the join capability existed was
    // the weaker reading, not a different correct one
    EvalCase("top 5 courses by average score",
      "SELECT c.course_name, AVG(sc.score) AS agg_value FROM scores sc " +
        "JOIN courses c ON c.course_id = sc.course_id " +
        "GROUP BY c.course_name ORDER BY agg_value DESC LIMIT 5", "agg_topn"),
    EvalCase("student names with their scores",
      "SELECT st.student_name, sc.score FROM scores sc JOIN students st ON st.student_id = sc.student_id ORDER BY sc.score_id LIMIT 100", "join"),
    EvalCase("course names with average score per course",
      "SELECT c.course_name, AVG(sc.score) AS agg_value FROM scores sc JOIN courses c ON c.course_id = sc.course_id GROUP BY c.course_name ORDER BY c.course_name LIMIT 100", "join_agg"),
    EvalCase("count of scores in year 2023",
      "SELECT COUNT(*) AS agg_value FROM scores WHERE year = 2023", "filter_count"),
    EvalCase("count of scores per student name",
      "SELECT st.student_name, COUNT(*) AS agg_value FROM scores sc JOIN students st ON st.student_id = sc.student_id GROUP BY st.student_name ORDER BY st.student_name LIMIT 100", "join_agg"),
    // --- round-3 open cases, closed in round 4 (BETWEEN / OR→IN /
    //     HAVING template shapes) ---
    EvalCase("students with age between 15 and 17",
      "SELECT * FROM students WHERE age BETWEEN 15 AND 17 ORDER BY student_id LIMIT 100", "filter_between"),
    EvalCase("scores from year 2022 or year 2023",
      "SELECT * FROM scores WHERE year = 2022 OR year = 2023 ORDER BY score_id LIMIT 100", "filter_or"),
    EvalCase("course ids whose average score is above 80",
      "SELECT course_id FROM scores GROUP BY course_id HAVING AVG(score) > 80 ORDER BY course_id LIMIT 100", "having"),
    // --- round-4 open cases, closed in round 4b (LIKE-prefix /
    //     anti-join count / nth-distinct-value template shapes) ---
    EvalCase("student names starting with A",
      "SELECT * FROM students WHERE student_name LIKE 'A%' ORDER BY student_id LIMIT 100", "filter_like"),
    EvalCase("number of courses that have no scores",
      "SELECT COUNT(*) AS agg_value FROM courses c WHERE NOT EXISTS (SELECT 1 FROM scores s WHERE s.course_id = c.course_id)", "anti_join"),
    EvalCase("the second highest score",
      "SELECT DISTINCT score FROM scores ORDER BY score DESC LIMIT 1 OFFSET 1", "nth_value"),
    // --- round-4 open cases, closed in round 5 (scalar-average filter /
    //     most-joined-count / dimension-side filter template shapes) ---
    EvalCase("scores above the average score",
      "SELECT * FROM scores WHERE score > (SELECT AVG(score) FROM scores) ORDER BY score_id LIMIT 100", "scalar_subquery"),
    EvalCase("student name with the most scores",
      "SELECT st.student_name, COUNT(*) AS agg_value FROM scores sc JOIN students st ON st.student_id = sc.student_id GROUP BY st.student_name ORDER BY agg_value DESC, st.student_name LIMIT 1", "join_agg_topn"),
    EvalCase("average score per course name in the science dept",
      "SELECT c.course_name, AVG(sc.score) AS agg_value FROM scores sc JOIN courses c ON c.course_id = sc.course_id WHERE c.dept = 'science' GROUP BY c.course_name ORDER BY c.course_name LIMIT 100", "join_filter_agg"),
    // --- round-5 open cases, closed in round 5b (3-table bridge /
    //     nested-HAVING count / aggregate-of-aggregate template shapes) ---
    EvalCase("students who scored above 90 in Biology",
      "SELECT DISTINCT st.student_name FROM scores sc JOIN students st ON st.student_id = sc.student_id " +
        "JOIN courses c ON c.course_id = sc.course_id WHERE c.course_name = 'Biology' AND sc.score > 90 " +
        "ORDER BY st.student_name LIMIT 100", "join3_filter"),
    EvalCase("number of students who take more than 5 courses",
      "SELECT COUNT(*) AS agg_value FROM (SELECT student_id FROM scores GROUP BY student_id " +
        "HAVING COUNT(DISTINCT course_id) > 5) t", "nested_having_count"),
    EvalCase("highest average score among courses",
      "SELECT MAX(a) AS agg_value FROM (SELECT AVG(score) AS a FROM scores GROUP BY course_id) t", "agg_of_agg"),
    // --- round-5 open cases, closed in round 6 (group-wise argmax /
    //     HAVING-vs-scalar / ratio-aggregate template shapes) ---
    EvalCase("for each dept the course with the highest average score",
      "SELECT dept, course_name FROM (SELECT c.dept, c.course_name, " +
        "ROW_NUMBER() OVER (PARTITION BY c.dept ORDER BY AVG(sc.score) DESC, c.course_name) AS rn " +
        "FROM scores sc JOIN courses c ON c.course_id = sc.course_id GROUP BY c.dept, c.course_name) t " +
        "WHERE rn = 1 ORDER BY dept LIMIT 100", "groupwise_argmax"),
    EvalCase("students whose average score is above the overall average",
      "SELECT st.student_name FROM scores sc JOIN students st ON st.student_id = sc.student_id " +
        "GROUP BY st.student_name HAVING AVG(sc.score) > (SELECT AVG(score) FROM scores) " +
        "ORDER BY st.student_name LIMIT 100", "having_scalar"),
    EvalCase("percentage of scores with grade A",
      "SELECT ROUND(100.0 * SUM(CASE WHEN grade = 'A' THEN 1 ELSE 0 END) / COUNT(*), 2) AS agg_value " +
        "FROM scores", "ratio_agg"),
    // --- round-6 open cases, closed in round 7 (correlated per-group
    //     filter / median per group / bottom-N by joined count) ---
    EvalCase("students older than the average age of their grade level",
      "SELECT student_name FROM students s WHERE age > " +
        "(SELECT AVG(age) FROM students s2 WHERE s2.grade_level = s.grade_level) " +
        "ORDER BY student_name LIMIT 100", "correlated_filter"),
    EvalCase("median score per course",
      "SELECT course_id, MEDIAN(score) AS agg_value FROM scores GROUP BY course_id " +
        "ORDER BY course_id LIMIT 100", "percentile_agg"),
    EvalCase("the 3 courses with the fewest students",
      "SELECT c.course_name, COUNT(DISTINCT sc.student_id) AS agg_value FROM scores sc " +
        "JOIN courses c ON c.course_id = sc.course_id GROUP BY c.course_name " +
        "ORDER BY agg_value ASC, c.course_name LIMIT 3", "bottom_n"),
    // --- round-7 open cases, closed in round 7b (average count per
    //     entity / filtered HAVING count / HAVING on a group extreme) ---
    EvalCase("average number of courses per student",
      "SELECT AVG(c) AS agg_value FROM " +
        "(SELECT COUNT(DISTINCT course_id) AS c FROM scores GROUP BY student_id) t",
      "avg_count_per"),
    EvalCase("students who scored above 90 in at least 3 courses",
      "SELECT st.student_name FROM scores sc JOIN students st ON st.student_id = sc.student_id " +
        "WHERE sc.score > 90 GROUP BY st.student_name HAVING COUNT(DISTINCT sc.course_id) >= 3 " +
        "ORDER BY st.student_name LIMIT 100", "filtered_having"),
    EvalCase("courses where the best score is below 95",
      "SELECT course_id FROM scores GROUP BY course_id HAVING MAX(score) < 95 " +
        "ORDER BY course_id LIMIT 100", "having_extreme"),
    // --- round-7b open cases, closed in round 7c (deviation-from-global
    //     HAVING / per-group range argmax / two-level grouped argmax) ---
    EvalCase("students whose average score is at least 10 points above the overall average",
      "SELECT st.student_name FROM scores sc JOIN students st ON st.student_id = sc.student_id " +
        "GROUP BY st.student_name HAVING AVG(sc.score) >= (SELECT AVG(score) FROM scores) + 10 " +
        "ORDER BY st.student_name LIMIT 100", "deviation_having"),
    EvalCase("the course with the largest gap between the highest and lowest score",
      "SELECT course_id, MAX(score) - MIN(score) AS agg_value FROM scores " +
        "GROUP BY course_id ORDER BY agg_value DESC, course_id LIMIT 1", "range_argmax"),
    EvalCase("for each grade level, the course with the highest average score",
      "SELECT grade_level, course_id FROM (" +
        "SELECT st.grade_level, sc.course_id, " +
        "RANK() OVER (PARTITION BY st.grade_level ORDER BY AVG(sc.score) DESC, sc.course_id) AS rnk " +
        "FROM scores sc JOIN students st ON st.student_id = sc.student_id " +
        "GROUP BY st.grade_level, sc.course_id) t WHERE rnk = 1 " +
        "ORDER BY grade_level LIMIT 100", "grouped_argmax2"),
    // --- round-7c open cases, closed in round 7d (relational division
    //     with mined-value linking / nth-ranked aggregate / per-group
    //     conditional share) ---
    EvalCase("students who took all math courses",
      "SELECT DISTINCT st.student_name FROM students st " +
        "JOIN scores sc ON sc.student_id = st.student_id " +
        "JOIN courses c ON c.course_id = sc.course_id WHERE c.dept = 'math' " +
        "GROUP BY st.student_id, st.student_name " +
        "HAVING COUNT(DISTINCT sc.course_id) = " +
        "(SELECT COUNT(*) FROM courses WHERE dept = 'math') " +
        "ORDER BY st.student_name LIMIT 100", "division"),
    EvalCase("the course with the second highest average score",
      "SELECT course_id FROM (SELECT course_id, " +
        "RANK() OVER (ORDER BY AVG(score) DESC, course_id) AS rnk " +
        "FROM scores GROUP BY course_id) t WHERE rnk = 2 LIMIT 100",
      "nth_aggregate"),
    EvalCase("for each course, the percentage of scores of at least 90",
      "SELECT course_id, 100.0 * COUNT(CASE WHEN score >= 90 THEN 1 END) / COUNT(*) " +
        "AS agg_value FROM scores GROUP BY course_id " +
        "ORDER BY course_id LIMIT 100", "conditional_share"),
    // --- round-7d open cases, closed in round 7e (two-period trend
    //     compare / global share over a per-entity count / name-anchored
    //     entity co-occurrence) ---
    EvalCase("students whose average score improved from 2022 to 2023",
      "SELECT st.student_name FROM students st JOIN (" +
        "SELECT student_id FROM scores GROUP BY student_id " +
        "HAVING AVG(CASE WHEN year = 2023 THEN score END) > " +
        "AVG(CASE WHEN year = 2022 THEN score END)) q " +
        "ON q.student_id = st.student_id " +
        "ORDER BY st.student_name LIMIT 100", "trend_compare"),
    EvalCase("the percentage of students who take more than 5 courses",
      "SELECT ROUND(100.0 * SUM(CASE WHEN c > 5 THEN 1 ELSE 0 END) / COUNT(*), 2) AS agg_value " +
        "FROM (SELECT student_id, COUNT(DISTINCT course_id) AS c " +
        "FROM scores GROUP BY student_id) t", "group_share"),
    EvalCase("students who share a course with Ada Adams",
      "SELECT DISTINCT st2.student_name FROM scores s1 " +
        "JOIN scores s2 ON s1.course_id = s2.course_id AND s1.student_id <> s2.student_id " +
        "JOIN students st1 ON st1.student_id = s1.student_id " +
        "JOIN students st2 ON st2.student_id = s2.student_id " +
        "WHERE st1.student_name = 'Ada Adams' AND st2.student_name <> 'Ada Adams' " +
        "ORDER BY st2.student_name LIMIT 100", "co_occurrence"),
    // --- round-7e open cases, closed in round 7f (universal per-group
    //     condition / top co-occurring pair / self-relative row-vs-own-
    //     aggregate comparison) ---
    EvalCase("courses where no student scored below 60",
      "SELECT c.course_name FROM courses c JOIN scores s ON s.course_id = c.course_id " +
        "GROUP BY c.course_name HAVING MIN(s.score) >= 60 " +
        "ORDER BY c.course_name LIMIT 100", "universal_filter"),
    EvalCase("the two courses most often taken together",
      "SELECT c1.course_name AS course_a, c2.course_name AS course_b " +
        "FROM scores s1 JOIN scores s2 ON s1.student_id = s2.student_id " +
        "AND s1.course_id < s2.course_id " +
        "JOIN courses c1 ON c1.course_id = s1.course_id " +
        "JOIN courses c2 ON c2.course_id = s2.course_id " +
        "GROUP BY c1.course_name, c2.course_name " +
        "ORDER BY COUNT(*) DESC, course_a, course_b LIMIT 1", "pair_cooccurrence"),
    EvalCase("students whose score in Algebra is above their average score",
      "SELECT DISTINCT st.student_name FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN (SELECT student_id, AVG(score) AS a FROM scores GROUP BY student_id) m " +
        "ON m.student_id = s.student_id " +
        "WHERE c.course_name = 'Algebra' AND s.score > m.a " +
        "ORDER BY st.student_name LIMIT 100", "self_relative"),
    // --- round-7f open cases, closed in round 7g (attribute division /
    //     dispersion argmin / per-group self-relative share) ---
    EvalCase("students who took a course in every department",
      "SELECT st.student_name FROM students st " +
        "JOIN scores s ON s.student_id = st.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY st.student_id, st.student_name " +
        "HAVING COUNT(DISTINCT c.dept) = (SELECT COUNT(DISTINCT dept) FROM courses) " +
        "ORDER BY st.student_name LIMIT 100", "attr_division"),
    EvalCase("the student with the most consistent scores",
      "SELECT student_id FROM (SELECT student_id, STDDEV_SAMP(score) AS sd " +
        "FROM scores GROUP BY student_id HAVING COUNT(*) >= 2) t " +
        "ORDER BY sd ASC, student_id LIMIT 1", "variability_argmin"),
    EvalCase("for each course, the share of scores above the course average",
      "SELECT course_id, ROUND(100.0 * SUM(CASE WHEN score > a THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM " +
        "(SELECT course_id, score, AVG(score) OVER (PARTITION BY course_id) AS a " +
        "FROM scores) t GROUP BY course_id ORDER BY course_id LIMIT 100",
      "group_self_share"),
    // --- round-7g open cases, closed in round 7h (relative division /
    //     group-top-k membership / deviation argmax) ---
    EvalCase("courses taken by at least half of the students",
      "SELECT c.course_name FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_id, c.course_name " +
        "HAVING COUNT(DISTINCT s.student_id) >= 0.5 * (SELECT COUNT(*) FROM students) " +
        "ORDER BY c.course_name LIMIT 100", "relative_division"),
    EvalCase("students ranked in the top 3 of each course by score",
      "SELECT DISTINCT st.student_name FROM (SELECT student_id, " +
        "RANK() OVER (PARTITION BY course_id ORDER BY score DESC) AS rnk FROM scores) t " +
        "JOIN students st ON st.student_id = t.student_id WHERE t.rnk <= 3 " +
        "ORDER BY st.student_name LIMIT 100", "group_topk_members"),
    EvalCase("the course whose average score differs most from the overall average",
      "SELECT course_id FROM (SELECT course_id, " +
        "ABS(AVG(score) - (SELECT AVG(score) FROM scores)) AS dev " +
        "FROM scores GROUP BY course_id) t " +
        "ORDER BY dev DESC, course_id LIMIT 1", "deviation_argmax"),
    // --- round-8 open cases, closed in round 9 (monotonic trend /
    //     shared-entity pair argmax / universal self-relative) ---
    EvalCase("students whose average score improved every year",
      "SELECT st.student_name FROM (" +
        "SELECT student_id FROM (" +
        "SELECT student_id, year, AVG(score) AS a, " +
        "LAG(AVG(score)) OVER (PARTITION BY student_id ORDER BY year) AS prev " +
        "FROM scores GROUP BY student_id, year) t " +
        "GROUP BY student_id " +
        "HAVING MIN(CASE WHEN prev IS NULL OR a > prev THEN 1 ELSE 0 END) = 1 " +
        "AND COUNT(*) >= 2) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "monotonic_trend"),
    EvalCase("the two courses with the most students in common",
      "SELECT c1.course_name AS course_a, c2.course_name AS course_b FROM (" +
        "SELECT a.course_id AS ca, b.course_id AS cb, COUNT(*) AS n " +
        "FROM scores a JOIN scores b ON a.student_id = b.student_id " +
        "AND a.course_id < b.course_id " +
        "GROUP BY a.course_id, b.course_id) t " +
        "JOIN courses c1 ON c1.course_id = t.ca " +
        "JOIN courses c2 ON c2.course_id = t.cb " +
        "ORDER BY t.n DESC, course_a, course_b LIMIT 1", "pair_argmax"),
    EvalCase("students who scored above the course average in every course they took",
      "SELECT st.student_name FROM (" +
        "SELECT student_id FROM (" +
        "SELECT student_id, score, AVG(score) OVER (PARTITION BY course_id) AS a " +
        "FROM scores) t " +
        "GROUP BY student_id " +
        "HAVING MIN(CASE WHEN score > a THEN 1 ELSE 0 END) = 1) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "universal_self_relative"),
    // --- round-9 open cases, closed in round 9b (same-dimension group
    //     argmax / range HAVING / trend argmax) ---
    EvalCase("for each department, the course with the highest average score",
      "SELECT dept, course_name FROM (" +
        "SELECT c.dept AS dept, c.course_name AS course_name, " +
        "RANK() OVER (PARTITION BY c.dept ORDER BY AVG(s.score) DESC, c.course_name) AS r " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, c.course_name) t " +
        "WHERE r = 1 ORDER BY dept LIMIT 100", "join_group_argmax"),
    EvalCase("students whose scores span more than 40 points",
      "SELECT st.student_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY st.student_id, st.student_name " +
        "HAVING MAX(s.score) - MIN(s.score) > 40 " +
        "ORDER BY st.student_name LIMIT 100", "range_having"),
    EvalCase("the year with the biggest improvement in average score",
      "SELECT year FROM (" +
        "SELECT year, AVG(score) - LAG(AVG(score)) OVER (ORDER BY year) AS delta " +
        "FROM scores GROUP BY year) t " +
        "WHERE delta IS NOT NULL ORDER BY delta DESC, year LIMIT 1", "trend_argmax"),
    // --- round-9b open cases, closed in round 9c (division by example /
    //     filtered popularity / argmax attribute filter) ---
    EvalCase("students who took every course taken by Ada Adams",
      "SELECT st.student_name FROM students st " +
        "JOIN scores s ON s.student_id = st.student_id " +
        "WHERE s.course_id IN (SELECT sc.course_id FROM scores sc " +
        "JOIN students a ON a.student_id = sc.student_id " +
        "WHERE a.student_name = 'Ada Adams') " +
        "GROUP BY st.student_id, st.student_name " +
        "HAVING COUNT(DISTINCT s.course_id) = (SELECT COUNT(DISTINCT sc.course_id) " +
        "FROM scores sc JOIN students a ON a.student_id = sc.student_id " +
        "WHERE a.student_name = 'Ada Adams') " +
        "ORDER BY st.student_name LIMIT 100", "division_by_example"),
    EvalCase("the most popular course among grade 9 students",
      "SELECT c.course_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "WHERE st.grade_level = 9 " +
        "GROUP BY c.course_id, c.course_name " +
        "ORDER BY COUNT(*) DESC, c.course_name LIMIT 1", "filtered_popularity"),
    EvalCase("courses where the top scorer is younger than 16",
      "SELECT c.course_name FROM (SELECT course_id, student_id, " +
        "RANK() OVER (PARTITION BY course_id ORDER BY score DESC) AS r FROM scores) t " +
        "JOIN students st ON st.student_id = t.student_id " +
        "JOIN courses c ON c.course_id = t.course_id " +
        "WHERE t.r = 1 AND st.age < 16 " +
        "GROUP BY c.course_id, c.course_name " +
        "ORDER BY c.course_name LIMIT 100", "argmax_attr_filter"),
    // --- round-9c open cases, closed in round 9d (pair argmin over
    //     aggregates / aggregate vs median / set equality) ---
    EvalCase("the pair of students with the most similar average scores",
      "SELECT a.student_id AS student_a, b.student_id AS student_b FROM " +
        "(SELECT student_id, AVG(score) AS avg_a FROM scores GROUP BY student_id) a " +
        "JOIN (SELECT student_id, AVG(score) AS avg_b FROM scores GROUP BY student_id) b " +
        "ON a.student_id < b.student_id " +
        "ORDER BY ABS(a.avg_a - b.avg_b) ASC, student_a, student_b LIMIT 1",
      "pair_argmin_agg"),
    EvalCase("courses whose average score is above the median course average",
      "SELECT course_id FROM (SELECT course_id, AVG(score) AS a FROM scores " +
        "GROUP BY course_id) t " +
        "WHERE a > (SELECT MEDIAN(a) FROM (SELECT AVG(score) AS a FROM scores " +
        "GROUP BY course_id) m) " +
        "ORDER BY course_id LIMIT 100", "agg_vs_median"),
    EvalCase("students who share every course with another student",
      "WITH sets AS (SELECT student_id, sort_array(collect_set(course_id)) AS cs " +
        "FROM scores GROUP BY student_id) " +
        "SELECT DISTINCT st.student_name FROM sets a JOIN sets b " +
        "ON a.cs = b.cs AND a.student_id <> b.student_id " +
        "JOIN students st ON st.student_id = a.student_id " +
        "ORDER BY st.student_name LIMIT 100", "set_equality"),
    // --- round-9d open cases, closed in round 9e (per-entity argmax
    //     with attribute filter / trend share / reverse attr division) ---
    EvalCase("students whose best course by average score is in the math department",
      "SELECT st.student_name FROM (" +
        "SELECT student_id, course_id, " +
        "RANK() OVER (PARTITION BY student_id ORDER BY AVG(score) DESC, course_id) AS r " +
        "FROM scores GROUP BY student_id, course_id) t " +
        "JOIN courses c ON c.course_id = t.course_id " +
        "JOIN students st ON st.student_id = t.student_id " +
        "WHERE t.r = 1 AND c.dept = 'math' " +
        "ORDER BY st.student_name LIMIT 100", "entity_argmax_attr"),
    EvalCase("the percentage of students who improved their average score from 2022 to 2023",
      "SELECT ROUND(100.0 * SUM(CASE WHEN a23 > a22 THEN 1 ELSE 0 END) / COUNT(*), 2) " +
        "AS agg_value FROM (" +
        "SELECT student_id, " +
        "AVG(CASE WHEN year = 2022 THEN score END) AS a22, " +
        "AVG(CASE WHEN year = 2023 THEN score END) AS a23 " +
        "FROM scores GROUP BY student_id) t " +
        "WHERE a22 IS NOT NULL AND a23 IS NOT NULL", "trend_share"),
    EvalCase("courses taken by students in every grade level",
      "SELECT c.course_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_id, c.course_name " +
        "HAVING COUNT(DISTINCT st.grade_level) = " +
        "(SELECT COUNT(DISTINCT grade_level) FROM students) " +
        "ORDER BY c.course_name LIMIT 100", "reverse_attr_division"),
    // --- round-9e open cases, closed in round 9f (joined pair argmax /
    //     count vs average count / joined conditional share; the pair
    //     shape also exposed and fixed the Validator's CTE-body
    //     traversal gap) ---
    EvalCase("the two departments with the most different average scores",
      "SELECT a.dept AS dept_a, b.dept AS dept_b FROM " +
        "(SELECT c.dept, AVG(s.score) AS av FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) a " +
        "JOIN (SELECT c.dept, AVG(s.score) AS av FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) b " +
        "ON a.dept < b.dept " +
        "ORDER BY ABS(a.av - b.av) DESC, dept_a, dept_b LIMIT 1",
      "joined_pair_argmax"),
    EvalCase("students who took more courses than the average student",
      "SELECT st.student_name FROM (SELECT student_id, " +
        "COUNT(DISTINCT course_id) AS n FROM scores GROUP BY student_id) t " +
        "JOIN students st ON st.student_id = t.student_id " +
        "WHERE t.n > (SELECT AVG(n) FROM (SELECT COUNT(DISTINCT course_id) AS n " +
        "FROM scores GROUP BY student_id) m) " +
        "ORDER BY st.student_name LIMIT 100", "count_vs_avg_count"),
    EvalCase("for each grade level, the percentage of scores above 80",
      "SELECT st.grade_level, ROUND(100.0 * SUM(CASE WHEN s.score > 80 " +
        "THEN 1 ELSE 0 END) / COUNT(*), 2) AS agg_value " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY st.grade_level ORDER BY st.grade_level LIMIT 100",
      "joined_conditional_share"),
    // --- round-9f open cases, closed in round 9g (joined ratio argmax /
    //     universal comparison / filtered scalar aggregate) ---
    EvalCase("the department with the highest ratio of A grades",
      "SELECT dept FROM (SELECT c.dept, " +
        "CAST(SUM(CASE WHEN s.grade = 'A' THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*) AS r " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) t ORDER BY r DESC, dept LIMIT 1",
      "joined_ratio_argmax"),
    EvalCase("students with a score at least as high as every score in Algebra",
      "SELECT DISTINCT st.student_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "WHERE s.score >= (SELECT MAX(sc.score) FROM scores sc " +
        "JOIN courses c ON c.course_id = sc.course_id " +
        "WHERE c.course_name = 'Algebra') " +
        "ORDER BY st.student_name LIMIT 100", "universal_comparison"),
    EvalCase("the median age of students who took Biology",
      "SELECT MEDIAN(age) AS agg_value FROM students st " +
        "WHERE st.student_id IN (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "WHERE c.course_name = 'Biology')", "filtered_median"),
    // --- round-9g open cases, closed in round 9h (joined distinct
    //     argmax / percentile-rank filter / nested group deviation) ---
    EvalCase("the course taken by the widest range of grade levels",
      "SELECT c.course_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_id, c.course_name " +
        "ORDER BY COUNT(DISTINCT st.grade_level) DESC, c.course_name LIMIT 1",
      "joined_distinct_argmax"),
    EvalCase("students whose scores rank in the top 10 percent overall",
      "SELECT DISTINCT st.student_name FROM (SELECT student_id, " +
        "PERCENT_RANK() OVER (ORDER BY score) AS pr FROM scores) t " +
        "JOIN students st ON st.student_id = t.student_id " +
        "WHERE t.pr >= 0.9 ORDER BY st.student_name LIMIT 100",
      "percentile_rank_filter"),
    EvalCase("for each course, the gap between its average score and the department average",
      "SELECT course_name, ROUND(ca - da, 2) AS agg_value FROM (" +
        "SELECT c.course_name AS course_name, c.dept AS dept, AVG(s.score) AS ca " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_name, c.dept) x " +
        "JOIN (SELECT c.dept AS dept, AVG(s.score) AS da " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) y USING (dept) " +
        "ORDER BY course_name LIMIT 100", "nested_group_deviation"),
    // --- round-9h open cases, closed in round 9i (count vs example /
    //     dimension range argmax / universal other-relative) ---
    EvalCase("students who took courses in more departments than Ada Adams",
      "SELECT st.student_name FROM (SELECT s.student_id, " +
        "COUNT(DISTINCT c.dept) AS n FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY s.student_id) t " +
        "JOIN students st ON st.student_id = t.student_id " +
        "WHERE t.n > (SELECT COUNT(DISTINCT c.dept) FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "JOIN students a ON a.student_id = s.student_id " +
        "WHERE a.student_name = 'Ada Adams') " +
        "ORDER BY st.student_name LIMIT 100", "count_vs_example"),
    EvalCase("the grade level whose students have the widest age range",
      "SELECT grade_level FROM students GROUP BY grade_level " +
        "ORDER BY MAX(age) - MIN(age) DESC, grade_level LIMIT 1",
      "dim_range_argmax"),
    EvalCase("courses where every student scored above their own average",
      "SELECT c.course_name FROM scores s " +
        "JOIN (SELECT student_id, AVG(score) AS a FROM scores " +
        "GROUP BY student_id) m ON m.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_id, c.course_name " +
        "HAVING MIN(CASE WHEN s.score > m.a THEN 1 ELSE 0 END) = 1 " +
        "ORDER BY c.course_name LIMIT 100", "universal_other_relative"),
    // --- round-9 open cases, closed in round 10 (avg-of-range /
    //     universal group aggregate / entity trend argmax shapes) ---
    EvalCase("the average gap between a student's best and worst scores",
      "SELECT ROUND(AVG(mx - mn), 2) AS agg_value FROM " +
        "(SELECT MAX(score) AS mx, MIN(score) AS mn FROM scores " +
        "GROUP BY student_id) t", "avg_of_range"),
    EvalCase("departments where every course has an average score above 70",
      "SELECT dept FROM (SELECT c.dept AS dept, c.course_id, " +
        "AVG(s.score) AS a FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, c.course_id) t " +
        "GROUP BY dept HAVING MIN(CASE WHEN a > 70 THEN 1 ELSE 0 END) = 1 " +
        "ORDER BY dept LIMIT 100", "universal_group_agg"),
    EvalCase("the student who improved the most between 2022 and 2023",
      "SELECT student_id FROM (SELECT student_id, " +
        "AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END) AS d " +
        "FROM scores GROUP BY student_id) t " +
        "WHERE d IS NOT NULL ORDER BY d DESC, student_id LIMIT 1",
      "trend_argmax_entity"),
    // --- round-10 open cases, closed in round 10b (median-count-per /
    //     universal rank / minimax argmax shapes) ---
    EvalCase("the median number of courses per student",
      "SELECT MEDIAN(c) AS agg_value FROM " +
        "(SELECT COUNT(DISTINCT course_id) AS c FROM scores " +
        "GROUP BY student_id) t", "median_count_per"),
    EvalCase("students ranked in the top 3 of every course they took",
      "SELECT st.student_name FROM (SELECT student_id FROM " +
        "(SELECT student_id, RANK() OVER (PARTITION BY course_id " +
        "ORDER BY score DESC) AS r FROM scores) x " +
        "GROUP BY student_id HAVING MAX(r) <= 3) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "universal_rank"),
    EvalCase("the dept whose best course by average score is the weakest",
      "SELECT dept FROM (SELECT c.dept, MAX(a) AS best FROM " +
        "(SELECT course_id, AVG(score) AS a FROM scores " +
        "GROUP BY course_id) s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) t ORDER BY best ASC, dept LIMIT 1",
      "minimax_argmax"),
    // --- round-10b open cases, closed in round 10c (correlation /
    //     spread-vs-average / group self-beat share shapes) ---
    EvalCase("the correlation between student age and score",
      "SELECT ROUND(CORR(st.age, sc.score), 4) AS agg_value FROM scores sc " +
        "JOIN students st ON st.student_id = sc.student_id", "correlation"),
    EvalCase("courses whose score spread is wider than the average course's spread",
      "SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING STDDEV(score) > (SELECT AVG(s) FROM " +
        "(SELECT STDDEV(score) AS s FROM scores GROUP BY course_id) t) " +
        "ORDER BY course_id LIMIT 100", "stddev_vs_avg"),
    EvalCase("for each dept, the share of its scores above the dept average",
      "SELECT dept, ROUND(100.0 * SUM(CASE WHEN score > a THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM (SELECT c.dept AS dept, s.score, " +
        "AVG(s.score) OVER (PARTITION BY c.dept) AS a FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id) t " +
        "GROUP BY dept ORDER BY dept LIMIT 100", "group_self_beat_share"),
    // --- round-10c open cases, closed in round 10d (joined distinct
    //     top-N / filtered period argmax / top-k share shapes) ---
    EvalCase("the top 2 depts by number of students taught",
      "SELECT c.dept, COUNT(DISTINCT s.student_id) AS agg_value FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept " +
        "ORDER BY agg_value DESC, c.dept LIMIT 2", "joined_distinct_topn"),
    EvalCase("the year in which the science dept had its highest average score",
      "SELECT year FROM (SELECT s.year, AVG(s.score) AS a FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id WHERE c.dept = 'science' " +
        "GROUP BY s.year) t ORDER BY a DESC, year LIMIT 1",
      "filtered_period_argmax"),
    EvalCase("the share of all scores contributed by the top 3 courses",
      "SELECT ROUND(100.0 * SUM(CASE WHEN rnk <= 3 THEN cnt ELSE 0 END) " +
        "/ SUM(cnt), 2) AS agg_value FROM (SELECT course_id, COUNT(*) AS cnt, " +
        "RANK() OVER (ORDER BY COUNT(*) DESC) AS rnk FROM scores " +
        "GROUP BY course_id) t", "topk_share"),
    // --- round-10d open cases, closed in round 10e (argmin attribution /
    //     increasing-period count / comparative cohort count shapes) ---
    // NOTE: "every department except X" is NOT usable headroom on this
    // fixture — every student provably covers every dept (the (s+c)%3
    // take rule cannot zero out a dept's course set), so the except-less
    // division answer coincides with the gold and discriminates nothing.
    EvalCase("students whose worst score came in a math course",
      "SELECT DISTINCT d.student_name FROM (SELECT student_id, course_id, " +
        "RANK() OVER (PARTITION BY student_id ORDER BY score ASC) AS r " +
        "FROM scores) x JOIN courses c ON c.course_id = x.course_id " +
        "JOIN students d ON d.student_id = x.student_id " +
        "WHERE x.r = 1 AND c.dept = 'math' " +
        "ORDER BY d.student_name LIMIT 100", "argmin_attribution"),
    EvalCase("the number of years in which the average score increased",
      "SELECT SUM(CASE WHEN a > p THEN 1 ELSE 0 END) AS agg_value FROM " +
        "(SELECT year, AVG(score) AS a, LAG(AVG(score)) OVER (ORDER BY year) AS p " +
        "FROM scores GROUP BY year) t", "count_increasing_periods"),
    EvalCase("courses taken by more grade 9 students than grade 12 students",
      "SELECT c.course_name FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_id, c.course_name " +
        "HAVING SUM(CASE WHEN st.grade_level = 9 THEN 1 ELSE 0 END) > " +
        "SUM(CASE WHEN st.grade_level = 12 THEN 1 ELSE 0 END) " +
        "ORDER BY c.course_name LIMIT 100", "comparative_cohort_count"),
    // --- round-10e open cases, closed in round 10f (attribute trend
    //     argmax / extreme count per / entity-extreme share shapes) ---
    EvalCase("which dept improved its average score the most between 2022 and 2023",
      "SELECT dept FROM (SELECT c.dept AS dept, " +
        "AVG(CASE WHEN s.year = 2023 THEN s.score END) - " +
        "AVG(CASE WHEN s.year = 2022 THEN s.score END) AS d FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) t " +
        "WHERE d IS NOT NULL ORDER BY d DESC, dept LIMIT 1", "trend_argmax_attr"),
    EvalCase("the minimum number of courses any student took",
      "SELECT MIN(c) AS agg_value FROM (SELECT COUNT(DISTINCT course_id) AS c " +
        "FROM scores GROUP BY student_id) t", "min_count_per"),
    EvalCase("the percentage of students whose best score is above 95",
      "SELECT ROUND(100.0 * SUM(CASE WHEN mx > 95 THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM (SELECT MAX(score) AS mx " +
        "FROM scores GROUP BY student_id) t", "share_entity_extreme"),
    // --- round-10f open cases, closed in round 10g (ranked group share /
    //     range of group aggregates / dimension self-relative shapes) ---
    EvalCase("rank the depts by their share of A grades",
      "SELECT c.dept, ROUND(100.0 * SUM(CASE WHEN s.grade = 'A' THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept " +
        "ORDER BY agg_value DESC, c.dept LIMIT 100", "ranked_group_share"),
    EvalCase("the difference between the best and worst course by average score",
      "SELECT ROUND(MAX(a) - MIN(a), 2) AS agg_value FROM " +
        "(SELECT AVG(score) AS a FROM scores GROUP BY course_id) t",
      "range_of_group_aggs"),
    EvalCase("students older than the average student in their grade level",
      "SELECT st.student_name FROM students st JOIN (SELECT grade_level, " +
        "AVG(age) AS a FROM students GROUP BY grade_level) g " +
        "ON g.grade_level = st.grade_level WHERE st.age > g.a " +
        "ORDER BY st.student_name LIMIT 100", "self_relative_dim"),
    // --- round-10g open cases, closed in round 10h (superlative-adjective
    //     argmax / conjunctive trend count / median entity shapes) ---
    EvalCase("the hardest course for each grade level by average score",
      "SELECT grade_level, course_name FROM (SELECT st.grade_level, " +
        "c.course_name, RANK() OVER (PARTITION BY st.grade_level " +
        "ORDER BY AVG(s.score) ASC, c.course_name) AS rnk FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY st.grade_level, c.course_id, c.course_name) t " +
        "WHERE rnk = 1 ORDER BY grade_level LIMIT 100", "superlative_adj_argmax"),
    EvalCase("how many students improved in math but declined in science from 2022 to 2023",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id WHERE c.dept IN ('math', 'science') " +
        "GROUP BY s.student_id " +
        "HAVING AVG(CASE WHEN c.dept = 'math' AND s.year = 2023 THEN s.score END) > " +
        "AVG(CASE WHEN c.dept = 'math' AND s.year = 2022 THEN s.score END) " +
        "AND AVG(CASE WHEN c.dept = 'science' AND s.year = 2023 THEN s.score END) < " +
        "AVG(CASE WHEN c.dept = 'science' AND s.year = 2022 THEN s.score END)) t",
      "conjunctive_trend_count"),
    EvalCase("the middle student by average score",
      "SELECT student_id FROM (SELECT student_id, AVG(score) AS a, " +
        "COUNT(*) OVER () AS n, ROW_NUMBER() OVER (ORDER BY AVG(score), student_id) " +
        "AS rn FROM scores GROUP BY student_id) t WHERE rn = CAST((n + 1) / 2 AS INT) " +
        "LIMIT 1", "median_entity_argmax"),
    // --- round-10h open cases, closed in round 10i (adjacent-period
    //     pair / exclusive attribute / groups-lacking share shapes) ---
    EvalCase("the two consecutive years with the biggest jump in total scores",
      "SELECT prev_year, year FROM (SELECT year, " +
        "LAG(year) OVER (ORDER BY year) AS prev_year, " +
        "SUM(score) - LAG(SUM(score)) OVER (ORDER BY year) AS d " +
        "FROM scores GROUP BY year) t WHERE d IS NOT NULL " +
        "ORDER BY d DESC, year LIMIT 1", "adjacent_period_pair"),
    EvalCase("students who only took math courses",
      "SELECT d.student_name FROM scores f " +
        "JOIN students d ON d.student_id = f.student_id " +
        "JOIN courses c ON c.course_id = f.course_id " +
        "GROUP BY d.student_id, d.student_name " +
        "HAVING MIN(CASE WHEN c.dept = 'math' THEN 1 ELSE 0 END) = 1 " +
        "ORDER BY d.student_name LIMIT 100", "exclusive_attr"),
    EvalCase("what fraction of courses have no A grades",
      "SELECT ROUND(100.0 * SUM(CASE WHEN n_a = 0 THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM (SELECT c.course_id, " +
        "SUM(CASE WHEN s.grade = 'A' THEN 1 ELSE 0 END) AS n_a FROM courses c " +
        "LEFT JOIN scores s ON s.course_id = c.course_id " +
        "GROUP BY c.course_id) t", "share_groups_lacking"),
    // --- round-10i open cases, closed in round 10j (attribute coverage /
    //     recent-k average / category majority shapes) ---
    EvalCase("students whose scores span all five grade letters",
      "SELECT d.student_name FROM scores f " +
        "JOIN students d ON d.student_id = f.student_id " +
        "GROUP BY d.student_id, d.student_name " +
        "HAVING COUNT(DISTINCT f.grade) = 5 " +
        "ORDER BY d.student_name LIMIT 100", "attr_coverage_count"),
    EvalCase("the average score of each student's three most recent scores",
      "SELECT ROUND(AVG(score), 2) AS agg_value FROM (SELECT score, " +
        "ROW_NUMBER() OVER (PARTITION BY student_id " +
        "ORDER BY year DESC, score_id DESC) AS rn FROM scores) t " +
        "WHERE rn <= 3", "recent_k_average"),
    EvalCase("courses where the grade distribution is more than half A or B",
      "SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING SUM(CASE WHEN grade IN ('A', 'B') THEN 1 ELSE 0 END) " +
        "> COUNT(*) / 2.0 ORDER BY course_id LIMIT 100",
      "category_majority"),
    // --- round-10j open cases, closed in round 10k (cross-group
    //     stability / running period total / strict improvement shapes) ---
    EvalCase("the student whose scores vary the least across depts",
      "SELECT student_id FROM (SELECT s.student_id, " +
        "STDDEV(da) AS v FROM (SELECT s2.student_id, c.dept, " +
        "AVG(s2.score) AS da FROM scores s2 " +
        "JOIN courses c ON c.course_id = s2.course_id " +
        "GROUP BY s2.student_id, c.dept) s GROUP BY s.student_id " +
        "HAVING COUNT(*) > 1) t ORDER BY v ASC, student_id LIMIT 1",
      "cross_group_stability_argmin"),
    EvalCase("the running total of scores per year in order",
      "SELECT year, SUM(SUM(score)) OVER (ORDER BY year) AS agg_value " +
        "FROM scores GROUP BY year ORDER BY year LIMIT 100",
      "running_period_total"),
    EvalCase("students who beat their own previous year's average every year",
      "SELECT st.student_name FROM (SELECT student_id FROM " +
        "(SELECT student_id, year, AVG(score) AS a, " +
        "LAG(AVG(score)) OVER (PARTITION BY student_id ORDER BY year) AS p " +
        "FROM scores GROUP BY student_id, year) x GROUP BY student_id " +
        "HAVING MIN(CASE WHEN p IS NULL OR a > p THEN 1 ELSE 0 END) = 1 " +
        "AND COUNT(*) >= 2) m JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "strict_improvement_streak"),
    // --- round-10k open cases, closed in round 10l (attribute pair
    //     argmin / universal group-self count / banded share shapes) ---
    EvalCase("the pair of depts whose average scores differ the least",
      "SELECT a_dept, b_dept FROM (SELECT a.dept AS a_dept, b.dept AS b_dept, " +
        "ABS(a.av - b.av) AS d FROM (SELECT c.dept, AVG(s.score) AS av " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) a JOIN (SELECT c.dept, AVG(s.score) AS av " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) b ON a.dept < b.dept) t " +
        "ORDER BY d ASC, a_dept, b_dept LIMIT 1", "attr_pair_argmin"),
    EvalCase("how many students are above the dept average in every dept they took",
      "SELECT COUNT(*) AS agg_value FROM (SELECT sd.student_id FROM " +
        "(SELECT s.student_id, c.dept, AVG(s.score) AS sa FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id, c.dept) sd JOIN (SELECT c2.dept, " +
        "AVG(s2.score) AS da FROM scores s2 " +
        "JOIN courses c2 ON c2.course_id = s2.course_id GROUP BY c2.dept) d " +
        "ON d.dept = sd.dept GROUP BY sd.student_id " +
        "HAVING MIN(CASE WHEN sa > da THEN 1 ELSE 0 END) = 1) t",
      "universal_group_self_count"),
    EvalCase("the share of scores within 5 points of their course average",
      "SELECT ROUND(100.0 * SUM(CASE WHEN ABS(score - ca) <= 5 THEN 1 ELSE 0 END) " +
        "/ COUNT(*), 2) AS agg_value FROM (SELECT score, " +
        "AVG(score) OVER (PARTITION BY course_id) AS ca FROM scores) t",
      "banded_share"),
    // --- round-10l open cases, closed in round 10m (group inner-range
    //     argmax / floor over periods / avg of group shares shapes) ---
    EvalCase("the dept where the gap between its best and worst student averages is widest",
      "SELECT dept FROM (SELECT c.dept, MAX(sa) - MIN(sa) AS g FROM " +
        "(SELECT s.student_id, c2.dept AS d2, AVG(s.score) AS sa FROM scores s " +
        "JOIN courses c2 ON c2.course_id = s.course_id " +
        "GROUP BY s.student_id, c2.dept) x JOIN courses c ON c.dept = x.d2 " +
        "GROUP BY c.dept) t ORDER BY g DESC, dept LIMIT 1",
      "group_inner_range_argmax"),
    EvalCase("students whose yearly average never dropped below 60",
      "SELECT st.student_name FROM (SELECT student_id FROM " +
        "(SELECT student_id, year, AVG(score) AS a FROM scores " +
        "GROUP BY student_id, year) x GROUP BY student_id " +
        "HAVING MIN(a) >= 60) m JOIN students st " +
        "ON st.student_id = m.student_id ORDER BY st.student_name LIMIT 100",
      "floor_over_periods"),
    EvalCase("the average share of each course's scores that are A grades",
      "SELECT ROUND(AVG(r), 4) AS agg_value FROM (SELECT course_id, " +
        "CAST(SUM(CASE WHEN grade = 'A' THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*) AS r FROM scores GROUP BY course_id) t",
      "avg_of_group_shares"),
    // --- round-10m open cases, closed in round 10n (entity-aggregate
    //     correlation / cross-level universal / nth trend argmax) ---
    EvalCase("the correlation between a student's age and their average score",
      "SELECT ROUND(CORR(st.age, t.a), 4) AS agg_value FROM " +
        "(SELECT student_id, AVG(score) AS a FROM scores " +
        "GROUP BY student_id) t JOIN students st " +
        "ON st.student_id = t.student_id", "entity_agg_correlation"),
    EvalCase("courses whose average score beats every dept's overall average",
      "SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING AVG(score) > (SELECT MAX(da) FROM (SELECT AVG(s.score) AS da " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) x) ORDER BY course_id LIMIT 100",
      "cross_level_universal"),
    EvalCase("the second most improved student between 2022 and 2023",
      "SELECT student_id FROM (SELECT student_id, " +
        "AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END) AS d " +
        "FROM scores GROUP BY student_id) t WHERE d IS NOT NULL " +
        "ORDER BY d DESC, student_id LIMIT 1 OFFSET 1", "nth_trend_argmax"),
    // --- round-10n open cases, closed in round 10o (qualifying count by
    //     attribute / group median argmax / cross-category margin) ---
    EvalCase("the number of students per grade level whose overall average score is above 80",
      "SELECT st.grade_level, COUNT(*) AS n FROM " +
        "(SELECT student_id FROM scores GROUP BY student_id " +
        "HAVING AVG(score) > 80) q JOIN students st " +
        "ON st.student_id = q.student_id GROUP BY st.grade_level " +
        "ORDER BY st.grade_level LIMIT 100", "qualifying_count_by_attr"),
    EvalCase("the dept with the highest median student average",
      "SELECT dept FROM (SELECT d2 AS dept, MEDIAN(a) AS md FROM " +
        "(SELECT s.student_id, c.dept AS d2, AVG(s.score) AS a " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id, c.dept) x GROUP BY d2) t " +
        "ORDER BY md DESC, dept LIMIT 1", "group_median_argmax"),
    EvalCase("students whose average score in math is at least 10 points higher than in science",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "WHERE c.dept IN ('math', 'science') GROUP BY s.student_id " +
        "HAVING AVG(CASE WHEN c.dept = 'math' THEN s.score END) - " +
        "AVG(CASE WHEN c.dept = 'science' THEN s.score END) >= 10) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "cross_category_margin"),
    // --- round-10o open cases, closed in round 10p (universal group
    //     trend / named-entity rank / percent change) ---
    EvalCase("depts where the average score of every course fell from 2022 to 2023",
      "SELECT dept FROM (SELECT c.dept, s.course_id, " +
        "AVG(CASE WHEN s.year = 2023 THEN s.score END) - " +
        "AVG(CASE WHEN s.year = 2022 THEN s.score END) AS d " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) x GROUP BY dept " +
        "HAVING MAX(d) < 0 ORDER BY dept LIMIT 100", "universal_group_trend"),
    EvalCase("the rank of Algebra among courses by average score",
      "SELECT rnk FROM (SELECT c.course_name, " +
        "RANK() OVER (ORDER BY AVG(s.score) DESC) AS rnk " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.course_name) t WHERE course_name = 'Algebra'",
      "named_entity_rank"),
    EvalCase("the percent change in average score from 2022 to 2023",
      "SELECT ROUND((AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END)) / " +
        "AVG(CASE WHEN year = 2022 THEN score END) * 100, 4) AS agg_value " +
        "FROM scores", "percent_change"),
    // --- round-10p open cases, closed in round 10q (group concentration
    //     / joined distinct threshold / period balance) ---
    EvalCase("the share of each dept's scores that come from its busiest course",
      "SELECT dept, ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 4) AS share " +
        "FROM (SELECT c.dept, s.course_id, COUNT(*) AS cnt " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) x GROUP BY dept " +
        "ORDER BY dept LIMIT 100", "group_concentration"),
    EvalCase("students who took courses in at least 3 different depts",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY s.student_id " +
        "HAVING COUNT(DISTINCT c.dept) >= 3) m JOIN students st " +
        "ON st.student_id = m.student_id ORDER BY st.student_name LIMIT 100",
      "joined_distinct_having"),
    EvalCase("the year when dept averages were closest together",
      "SELECT yr FROM (SELECT x.yr, STDDEV_SAMP(a) AS sd FROM " +
        "(SELECT s.year AS yr, c.dept, AVG(s.score) AS a FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.year, c.dept) x GROUP BY x.yr) t " +
        "ORDER BY sd ASC, yr LIMIT 1", "period_balance_argmin"),
    // --- round-10q open cases, closed in round 10r (category attribute
    //     range argmax / extreme-tie count / personal-best share) ---
    EvalCase("the grade letter whose students have the widest age range",
      "SELECT grade FROM (SELECT s.grade, MAX(st.age) - MIN(st.age) AS r " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.grade) t ORDER BY r DESC, grade LIMIT 1",
      "category_attr_range_argmax"),
    EvalCase("courses where the top score was achieved by more than one student",
      "SELECT s.course_id FROM scores s JOIN (SELECT course_id, " +
        "MAX(score) AS mx FROM scores GROUP BY course_id) m " +
        "ON m.course_id = s.course_id AND m.mx = s.score " +
        "GROUP BY s.course_id HAVING COUNT(*) > 1 " +
        "ORDER BY s.course_id LIMIT 100", "max_tie_count"),
    EvalCase("the share of scores that are their student's best",
      "SELECT ROUND(CAST(SUM(CASE WHEN score = mx THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM (SELECT score, " +
        "MAX(score) OVER (PARTITION BY student_id) AS mx FROM scores) t",
      "share_personal_best"),
    // --- round-10r open cases, closed in round 10s (top-2 gap /
    //     best-membership share / longest improvement streak) ---
    EvalCase("the gap between the best and second-best course by average score",
      "SELECT ROUND(MAX(CASE WHEN r = 1 THEN a END) - " +
        "MAX(CASE WHEN r = 2 THEN a END), 2) AS agg_value FROM " +
        "(SELECT a, ROW_NUMBER() OVER (ORDER BY a DESC) AS r FROM " +
        "(SELECT AVG(score) AS a FROM scores GROUP BY course_id) t) x",
      "top2_gap"),
    EvalCase("the share of students whose best course is in math",
      "SELECT ROUND(CAST(SUM(CASE WHEN dept = 'math' THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM " +
        "(SELECT s.student_id, c.dept, ROW_NUMBER() OVER " +
        "(PARTITION BY s.student_id ORDER BY s.score DESC, s.course_id) AS r " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id) t " +
        "WHERE r = 1", "best_course_membership_share"),
    EvalCase("the longest streak of years in which the overall average score improved",
      "WITH y AS (SELECT year, AVG(score) AS a FROM scores GROUP BY year), " +
        "d AS (SELECT year, CASE WHEN a > LAG(a) OVER (ORDER BY year) " +
        "THEN 1 ELSE 0 END AS up FROM y), " +
        "g AS (SELECT year, up, year - SUM(up) OVER (ORDER BY year) AS grp FROM d) " +
        "SELECT MAX(cnt) AS agg_value FROM " +
        "(SELECT grp, SUM(up) AS cnt FROM g GROUP BY grp) t",
      "longest_improvement_streak"),
    // universal-vs-group turned out to be served by the existing
    // universal machinery at F1 1.0 — kept as a labeled regression case
    EvalCase("students who scored above the course average in every course they took",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN (SELECT course_id, AVG(score) AS ca FROM scores " +
        "GROUP BY course_id) c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id " +
        "HAVING MIN(CASE WHEN s.score > c.ca THEN 1 ELSE 0 END) = 1) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "universal_vs_group"),
    // --- round-10s open cases, closed in round 10t (grouped avg-count,
    //     group popular-member aggregate, joined-dim range argmax) ---
    EvalCase("the average number of students per course in each dept",
      "SELECT dept, ROUND(AVG(n), 2) AS avg_students FROM " +
        "(SELECT c.dept, s.course_id, COUNT(DISTINCT s.student_id) AS n " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) t " +
        "GROUP BY dept ORDER BY dept LIMIT 100", "grouped_avg_count_per"),
    EvalCase("the median score of each dept's most popular course",
      "SELECT dept, med FROM (SELECT c.dept, s.course_id, " +
        "MEDIAN(s.score) AS med, ROW_NUMBER() OVER (PARTITION BY c.dept " +
        "ORDER BY COUNT(*) DESC, s.course_id) AS r " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) t WHERE r = 1 " +
        "ORDER BY dept LIMIT 100", "dept_popular_median"),
    EvalCase("the dept whose students have the widest age range",
      "SELECT dept FROM (SELECT c.dept, MAX(st.age) - MIN(st.age) AS r " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept) t ORDER BY r DESC, dept LIMIT 1",
      "joined_dim_range_argmax"),
    // cohort-attr argmin/aggregate turned out to be served by existing
    // machinery at F1 1.0 — kept as labeled regression cases
    EvalCase("the youngest student among those who averaged above 90",
      "SELECT st.student_name FROM students st JOIN " +
        "(SELECT student_id FROM scores GROUP BY student_id " +
        "HAVING AVG(score) > 90) m ON m.student_id = st.student_id " +
        "ORDER BY st.age ASC, st.student_name LIMIT 1", "cohort_attr_argmin"),
    EvalCase("the average age of students who never scored below 70",
      "SELECT ROUND(AVG(st.age), 2) AS agg_value FROM students st JOIN " +
        "(SELECT student_id FROM scores GROUP BY student_id " +
        "HAVING MIN(score) >= 70) m ON m.student_id = st.student_id",
      "cohort_attr_aggregate"),
    // --- round-10t open cases, closed in round 10u (count-trend share,
    //     distribution balance, max within-group range) ---
    EvalCase("the percentage of courses whose enrollment grew from 2022 to 2023",
      "SELECT ROUND(CAST(SUM(CASE WHEN c23 > c22 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM " +
        "(SELECT course_id, COUNT(CASE WHEN year = 2022 THEN 1 END) AS c22, " +
        "COUNT(CASE WHEN year = 2023 THEN 1 END) AS c23 " +
        "FROM scores GROUP BY course_id) t", "count_trend_share"),
    EvalCase("the course with the most evenly distributed scores across grade levels",
      "SELECT course_id FROM (SELECT x.course_id, STDDEV_SAMP(cnt) AS sd " +
        "FROM (SELECT s.course_id, st.grade_level, COUNT(*) AS cnt " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.course_id, st.grade_level) x GROUP BY x.course_id) t " +
        "ORDER BY sd ASC, course_id LIMIT 1", "distribution_balance_argmin"),
    EvalCase("the largest score gap within a single course",
      "SELECT MAX(mx - mn) AS agg_value FROM (SELECT course_id, " +
        "MAX(score) AS mx, MIN(score) AS mn FROM scores " +
        "GROUP BY course_id) t", "max_group_range"),
    // --- round-10u open cases, closed in round 10v (popular-membership
    //     share, category share vs global, last-period aggregate) ---
    EvalCase("the share of students who took the most popular course",
      "SELECT ROUND(CAST(COUNT(DISTINCT CASE WHEN course_id = " +
        "(SELECT course_id FROM scores GROUP BY course_id " +
        "ORDER BY COUNT(*) DESC, course_id LIMIT 1) THEN student_id END) " +
        "AS DOUBLE) / COUNT(DISTINCT student_id), 4) AS agg_value " +
        "FROM scores", "popular_membership_share"),
    EvalCase("courses with an above-average share of A grades",
      "SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING AVG(CASE WHEN grade = 'A' THEN 1.0 ELSE 0 END) > " +
        "(SELECT AVG(CASE WHEN grade = 'A' THEN 1.0 ELSE 0 END) FROM scores) " +
        "ORDER BY course_id LIMIT 100", "category_share_vs_global"),
    EvalCase("the average score in each student's final year",
      "SELECT ROUND(AVG(score), 4) AS agg_value FROM " +
        "(SELECT student_id, score, year, MAX(year) OVER " +
        "(PARTITION BY student_id) AS my FROM scores) t WHERE year = my",
      "last_period_avg"),
    // --- round-10v open cases, closed in round 10w (group trend argmax,
    //     filtered division, aggregate difference) ---
    EvalCase("the most improved course in each dept between 2022 and 2023",
      "SELECT dept, course_id FROM (SELECT dept, course_id, " +
        "ROW_NUMBER() OVER (PARTITION BY dept ORDER BY d DESC, course_id) AS r " +
        "FROM (SELECT c.dept, s.course_id, " +
        "AVG(CASE WHEN s.year = 2023 THEN s.score END) - " +
        "AVG(CASE WHEN s.year = 2022 THEN s.score END) AS d " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) x WHERE d IS NOT NULL) t " +
        "WHERE r = 1 ORDER BY dept LIMIT 100", "group_trend_argmax"),
    EvalCase("students who took every math course",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id WHERE c.dept = 'math' " +
        "GROUP BY s.student_id HAVING COUNT(DISTINCT s.course_id) = " +
        "(SELECT COUNT(*) FROM courses WHERE dept = 'math')) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "filtered_division"),
    // period-agg-range argmin turned out to be served by existing
    // machinery at F1 1.0 — kept as a labeled regression case
    EvalCase("the year in which the gap between the best and worst student averages was smallest",
      "SELECT year FROM (SELECT x.year, MAX(a) - MIN(a) AS r FROM " +
        "(SELECT year, student_id, AVG(score) AS a FROM scores " +
        "GROUP BY year, student_id) x GROUP BY x.year) t " +
        "ORDER BY r ASC, year LIMIT 1", "period_agg_range_argmin"),
    EvalCase("the number of courses taken by both Ada Adams and Ben Brown",
      "SELECT COUNT(*) AS agg_value FROM (" +
        "SELECT s.course_id FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id WHERE st.student_name = 'Ada Adams' " +
        "INTERSECT " +
        "SELECT s.course_id FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id WHERE st.student_name = 'Ben Brown') t",
      "named_pair_overlap_count"),
    EvalCase("the difference between the median and average score",
      "SELECT ROUND(MEDIAN(score) - AVG(score), 4) AS agg_value FROM scores",
      "median_mean_gap"),
    // --- round-10w open cases, closed in round 10x (cohort-relative
    //     average, value-universal count, bottom-k aggregate average) ---
    EvalCase("students whose average score is above their grade level's average",
      "SELECT st.student_name FROM (SELECT s.student_id, AVG(s.score) AS a " +
        "FROM scores s GROUP BY s.student_id) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "JOIN (SELECT st2.grade_level, AVG(s2.score) AS ga FROM scores s2 " +
        "JOIN students st2 ON st2.student_id = s2.student_id " +
        "GROUP BY st2.grade_level) g ON g.grade_level = st.grade_level " +
        "WHERE m.a > g.ga ORDER BY st.student_name LIMIT 100",
      "cohort_relative_avg"),
    EvalCase("the number of distinct scores shared by all depts",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.score FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY s.score " +
        "HAVING COUNT(DISTINCT c.dept) = " +
        "(SELECT COUNT(DISTINCT dept) FROM courses)) t",
      "value_universal_count"),
    EvalCase("the average score of the three hardest courses",
      "SELECT ROUND(AVG(a), 4) AS agg_value FROM (SELECT AVG(score) AS a " +
        "FROM scores GROUP BY course_id ORDER BY a ASC LIMIT 3) t",
      "bottomk_agg_avg"),
    // --- round-10x open cases, closed in round 10y (two-dim attribute
    //     aggregate argmin, count-threshold entities, median of group
    //     aggregates) ---
    EvalCase("the dept where the average age of students taking its courses is lowest",
      "SELECT dept FROM (SELECT c.dept, AVG(st.age) AS a FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) t " +
        "ORDER BY a ASC, dept LIMIT 1", "two_dim_attr_agg_argmin"),
    EvalCase("the number of students whose scores span at least three grade letters",
      "SELECT COUNT(*) AS agg_value FROM (SELECT student_id FROM scores " +
        "GROUP BY student_id HAVING COUNT(DISTINCT grade) >= 3) t",
      "count_threshold_entities"),
    EvalCase("the median of each year's average score",
      "SELECT MEDIAN(a) AS agg_value FROM (SELECT AVG(score) AS a " +
        "FROM scores GROUP BY year) t", "median_of_group_aggs"),
    // --- round-10y open cases, closed in round 10z (fact distribution
    //     balance, near-group-average share, max period gap) ---
    EvalCase("the course whose enrollment is most balanced across years",
      "SELECT course_id FROM (SELECT x.course_id, STDDEV_SAMP(cnt) AS sd " +
        "FROM (SELECT course_id, year, COUNT(*) AS cnt FROM scores " +
        "GROUP BY course_id, year) x GROUP BY x.course_id) t " +
        "ORDER BY sd ASC, course_id LIMIT 1", "fact_distribution_balance"),
    EvalCase("students who share a course with Ada Adams",
      "SELECT DISTINCT st.student_name FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id WHERE s.course_id IN " +
        "(SELECT s2.course_id FROM scores s2 JOIN students st2 " +
        "ON st2.student_id = s2.student_id " +
        "WHERE st2.student_name = 'Ada Adams') " +
        "AND st.student_name <> 'Ada Adams' " +
        "ORDER BY st.student_name LIMIT 100", "named_neighbor_entities"),
    // (named-neighbor turned out to be served by existing machinery at
    //  F1 1.0 — kept as a labeled regression case)
    EvalCase("the longest gap in years between two scores for the same student",
      "SELECT MAX(gap) AS agg_value FROM (SELECT year - LAG(year) OVER " +
        "(PARTITION BY student_id ORDER BY year) AS gap FROM " +
        "(SELECT DISTINCT student_id, year FROM scores) d) t",
      "max_period_gap"),
    EvalCase("the percentage of scores within 10 points of the course average",
      "SELECT ROUND(CAST(SUM(CASE WHEN ABS(score - ca) <= 10 THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS agg_value FROM " +
        "(SELECT score, AVG(score) OVER (PARTITION BY course_id) AS ca " +
        "FROM scores) t", "near_group_avg_share"),
    // --- round-10z open cases, closed in round 10aa (average period
    //     span, frequency-rank nth, joined conditional-share argmax) ---
    EvalCase("the average number of years between a student's first and last score",
      "SELECT ROUND(AVG(mx - mn), 2) AS agg_value FROM " +
        "(SELECT MAX(year) AS mx, MIN(year) AS mn FROM scores " +
        "GROUP BY student_id) t", "avg_period_span"),
    EvalCase("the second most common grade",
      "SELECT grade FROM (SELECT grade, ROW_NUMBER() OVER " +
        "(ORDER BY COUNT(*) DESC, grade) AS r FROM scores GROUP BY grade) t " +
        "WHERE r = 2", "freq_rank_nth"),
    EvalCase("the dept with the highest share of its scores above 80",
      "SELECT dept FROM (SELECT c.dept, AVG(CASE WHEN s.score > 80 " +
        "THEN 1.0 ELSE 0 END) AS sh FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) t " +
        "ORDER BY sh DESC, dept LIMIT 1", "joined_cond_share_argmax"),
    // --- round-10aa open cases, closed in round 10ab (average rank of
    //     subset, unique-value count, skewness argmax) ---
    EvalCase("the average rank of math courses by average score",
      "SELECT ROUND(AVG(r), 2) AS agg_value FROM (SELECT c.dept, " +
        "RANK() OVER (ORDER BY a DESC) AS r FROM (SELECT course_id, " +
        "AVG(score) AS a FROM scores GROUP BY course_id) x " +
        "JOIN courses c ON c.course_id = x.course_id) t WHERE dept = 'math'",
      "avg_rank_of_subset"),
    EvalCase("the number of score values that appear exactly once",
      "SELECT COUNT(*) AS agg_value FROM (SELECT score FROM scores " +
        "GROUP BY score HAVING COUNT(*) = 1) t", "unique_value_count"),
    EvalCase("the course whose scores are most skewed",
      "SELECT course_id FROM (SELECT course_id, SKEWNESS(score) AS sk " +
        "FROM scores GROUP BY course_id) t " +
        "ORDER BY sk DESC, course_id LIMIT 1", "skewness_argmax"),
    // --- round-10ab open cases, closed in round 10ac (harmonic mean of
    //     group averages, exact joined-distinct threshold, period
    //     distinct argmax) ---
    EvalCase("the harmonic mean of course average scores",
      "SELECT ROUND(1.0 / AVG(1.0 / a), 4) AS agg_value FROM " +
        "(SELECT AVG(score) AS a FROM scores GROUP BY course_id) t",
      "harmonic_mean_groups"),
    EvalCase("students who took courses in exactly two different depts",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id HAVING COUNT(DISTINCT c.dept) = 2) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "joined_distinct_exact"),
    EvalCase("the year when the number of distinct students scoring was highest",
      "SELECT year FROM scores GROUP BY year " +
        "ORDER BY COUNT(DISTINCT student_id) DESC, year LIMIT 1",
      "period_distinct_argmax"),
    // --- round-10ac open cases, closed in round 10ad (trend rank list,
    //     nth-entity attribute, filtered anti-join count) ---
    EvalCase("courses ranked by how much their average improved between 2022 and 2023",
      "SELECT course_id, ROUND(d, 4) AS delta FROM (SELECT course_id, " +
        "AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END) AS d FROM scores " +
        "GROUP BY course_id) t WHERE d IS NOT NULL " +
        "ORDER BY d DESC, course_id LIMIT 100", "trend_rank_list"),
    EvalCase("the age of the student with the third-highest average score",
      "SELECT age FROM (SELECT st.age, ROW_NUMBER() OVER " +
        "(ORDER BY a DESC, m.student_id) AS r FROM (SELECT student_id, " +
        "AVG(score) AS a FROM scores GROUP BY student_id) m " +
        "JOIN students st ON st.student_id = m.student_id) t WHERE r = 3",
      "nth_entity_attr"),
    EvalCase("the number of courses that no ninth grader has taken",
      "SELECT COUNT(*) AS agg_value FROM courses c WHERE NOT EXISTS " +
        "(SELECT 1 FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id " +
        "WHERE s.course_id = c.course_id AND st.grade_level = 9)",
      "filtered_anti_count"),
    // --- round-10ad open cases, closed in round 10ae (pair overlap
    //     argmax, cumulative distinct, distribution percentages) ---
    EvalCase("the course pair with the largest overlap in students",
      "SELECT a.course_id AS c1, b.course_id AS c2 FROM scores a " +
        "JOIN scores b ON a.student_id = b.student_id " +
        "AND a.course_id < b.course_id GROUP BY a.course_id, b.course_id " +
        "ORDER BY COUNT(*) DESC, c1, c2 LIMIT 1", "pair_overlap_argmax"),
    EvalCase("the running total of distinct students by year of first score",
      "SELECT year, SUM(c) OVER (ORDER BY year) AS cum FROM " +
        "(SELECT first_year AS year, COUNT(*) AS c FROM " +
        "(SELECT student_id, MIN(year) AS first_year FROM scores " +
        "GROUP BY student_id) t GROUP BY first_year) x " +
        "ORDER BY year LIMIT 100", "cumulative_distinct"),
    EvalCase("the dept whose courses have the least variation in enrollment",
      "SELECT dept FROM (SELECT c.dept, STDDEV_SAMP(cnt) AS sd FROM " +
        "(SELECT s.course_id, COUNT(*) AS cnt FROM scores s " +
        "GROUP BY s.course_id) x JOIN courses c ON c.course_id = x.course_id " +
        "GROUP BY c.dept) t ORDER BY sd ASC, dept LIMIT 1",
      "group_count_balance_argmin"),
    // (group-count balance landed as a free closure of the existing
    //  machinery — kept as a labeled regression case)
    EvalCase("each grade letter's share of all scores",
      "SELECT grade, ROUND(CAST(COUNT(*) AS DOUBLE) / " +
        "(SELECT COUNT(*) FROM scores), 4) AS pct FROM scores " +
        "GROUP BY grade ORDER BY grade LIMIT 100", "distribution_pct"),
    // --- round-10ae open cases, closed in round 10af (average rank
    //     spacing, named-value self-relative, period-over-period change) ---
    EvalCase("the average gap between consecutive course averages when ranked",
      "SELECT ROUND(AVG(d), 4) AS agg_value FROM (SELECT a - LAG(a) OVER " +
        "(ORDER BY a) AS d FROM (SELECT AVG(score) AS a FROM scores " +
        "GROUP BY course_id) t) x WHERE d IS NOT NULL",
      "avg_rank_spacing"),
    EvalCase("students whose score in Algebra beat their own average",
      "SELECT st.student_name FROM scores s JOIN courses c " +
        "ON c.course_id = s.course_id JOIN (SELECT student_id, " +
        "AVG(score) AS a FROM scores GROUP BY student_id) m " +
        "ON m.student_id = s.student_id JOIN students st " +
        "ON st.student_id = s.student_id WHERE c.course_name = 'Algebra' " +
        "AND s.score > m.a ORDER BY st.student_name LIMIT 100",
      "named_value_self_relative"),
    EvalCase("the year-over-year change in median score",
      "SELECT year, ROUND(med - LAG(med) OVER (ORDER BY year), 4) AS chg " +
        "FROM (SELECT year, MEDIAN(score) AS med FROM scores " +
        "GROUP BY year) t ORDER BY year LIMIT 100", "yoy_median_change"),
    // --- round-10af open cases, closed in round 10ag (quartile cohort
    //     count, trimmed mean, filtered mode) ---
    EvalCase("the number of students in the top quartile by average score",
      "SELECT COUNT(*) AS agg_value FROM (SELECT student_id, NTILE(4) " +
        "OVER (ORDER BY a DESC) AS q FROM (SELECT student_id, " +
        "AVG(score) AS a FROM scores GROUP BY student_id) t) x WHERE q = 1",
      "quartile_cohort_count"),
    EvalCase("the trimmed mean of scores excluding the top and bottom 10 percent",
      "SELECT ROUND(AVG(score), 4) AS agg_value FROM (SELECT score, " +
        "PERCENT_RANK() OVER (ORDER BY score) AS pr FROM scores) t " +
        "WHERE pr >= 0.1 AND pr <= 0.9", "trimmed_mean"),
    EvalCase("the most common score in math courses",
      "SELECT score FROM scores s JOIN courses c " +
        "ON c.course_id = s.course_id WHERE c.dept = 'math' " +
        "GROUP BY score ORDER BY COUNT(*) DESC, score LIMIT 1",
      "filtered_mode"),
    // --- round-10ag open cases, closed in round 10ah (interquartile
    //     range, median-exceeds-mean share, direction changes) ---
    EvalCase("the interquartile range of scores",
      "SELECT ROUND(PERCENTILE(score, 0.75) - PERCENTILE(score, 0.25), 4) " +
        "AS agg_value FROM scores", "iqr"),
    EvalCase("the share of courses where the median score exceeds the mean",
      "SELECT ROUND(CAST(SUM(CASE WHEN med > mean THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM (SELECT course_id, " +
        "MEDIAN(score) AS med, AVG(score) AS mean FROM scores " +
        "GROUP BY course_id) t", "median_exceeds_mean_share"),
    EvalCase("the number of times the yearly average score changed direction",
      "WITH y AS (SELECT year, AVG(score) AS a FROM scores GROUP BY year), " +
        "d AS (SELECT year, a - LAG(a) OVER (ORDER BY year) AS df FROM y), " +
        "s AS (SELECT year, SIGN(df) AS sg FROM d WHERE df IS NOT NULL) " +
        "SELECT COUNT(*) AS agg_value FROM (SELECT sg, LAG(sg) OVER " +
        "(ORDER BY year) AS pg FROM s) t WHERE pg IS NOT NULL AND sg <> pg",
      "direction_changes"),
    // --- round-10ah open cases, closed in round 10ai (variance
    //     explained, rank set difference, weighted group median) ---
    EvalCase("the proportion of score variance explained by course membership",
      "SELECT ROUND(SUM(n * POWER(ga - (SELECT AVG(score) FROM scores), 2)) " +
        "/ (SELECT VAR_POP(score) * COUNT(*) FROM scores), 4) AS agg_value " +
        "FROM (SELECT course_id, AVG(score) AS ga, COUNT(*) AS n " +
        "FROM scores GROUP BY course_id) g", "variance_explained"),
    EvalCase("students in the overall top 10 by average who are not in the top 3 of any course",
      "SELECT st.student_name FROM ((SELECT student_id FROM " +
        "(SELECT student_id, RANK() OVER (ORDER BY a DESC) AS r FROM " +
        "(SELECT student_id, AVG(score) AS a FROM scores " +
        "GROUP BY student_id) x) y WHERE r <= 10) " +
        "EXCEPT (SELECT DISTINCT student_id FROM (SELECT student_id, " +
        "RANK() OVER (PARTITION BY course_id ORDER BY score DESC) AS cr " +
        "FROM scores) z WHERE cr <= 3)) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "rank_set_difference"),
    EvalCase("the enrollment-weighted average of course median scores",
      "SELECT ROUND(SUM(n * med) / SUM(n), 4) AS agg_value FROM " +
        "(SELECT COUNT(*) AS n, MEDIAN(score) AS med FROM scores " +
        "GROUP BY course_id) t", "weighted_group_median"),
    // --- round-10ai open cases, closed in round 10aj (Gini of group
    //     sizes, subset containment, universal-threshold count) ---
    EvalCase("the gini coefficient of course enrollments",
      "WITH e AS (SELECT COUNT(*) AS n FROM scores GROUP BY course_id), " +
        "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM e) " +
        "SELECT ROUND(2.0 * SUM(i * n) / (COUNT(*) * SUM(n)) - " +
        "(COUNT(*) + 1.0) / COUNT(*), 4) AS agg_value FROM r",
      "gini_enrollment"),
    EvalCase("the number of students whose course list is a subset of Ada Adams's",
      "SELECT COUNT(DISTINCT s.student_id) AS agg_value FROM scores s " +
        "WHERE s.student_id NOT IN (SELECT student_id FROM students " +
        "WHERE student_name = 'Ada Adams') AND s.student_id NOT IN " +
        "(SELECT s3.student_id FROM scores s3 WHERE s3.course_id NOT IN " +
        "(SELECT s2.course_id FROM scores s2 JOIN students st2 " +
        "ON st2.student_id = s2.student_id " +
        "WHERE st2.student_name = 'Ada Adams'))",
      "subset_containment_count"),
    EvalCase("the number of depts where every course has at least 50 students",
      "SELECT COUNT(*) AS agg_value FROM (SELECT dept FROM " +
        "(SELECT c.dept, s.course_id, COUNT(DISTINCT s.student_id) AS n " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) x GROUP BY dept " +
        "HAVING MIN(n) >= 50) t", "universal_threshold_count"),
    // --- round-10aj open cases, closed in round 10ak (category entropy,
    //     average shared membership, cohort-gap filter) ---
    EvalCase("the entropy of the grade distribution",
      "SELECT ROUND(-SUM(p * LN(p)), 4) AS agg_value FROM " +
        "(SELECT CAST(COUNT(*) AS DOUBLE) / " +
        "(SELECT COUNT(*) FROM scores) AS p FROM scores GROUP BY grade) t",
      "category_entropy"),
    EvalCase("the average number of shared courses between pairs of students in the same grade level",
      "SELECT ROUND(CAST(SUM(shared) AS DOUBLE) / SUM(pairs), 4) " +
        "AS agg_value FROM (SELECT gl, COUNT(*) AS shared, 0 AS pairs " +
        "FROM (SELECT st1.grade_level AS gl, a.student_id AS s1, " +
        "b.student_id AS s2 FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "JOIN students st1 ON st1.student_id = a.student_id " +
        "JOIN students st2 ON st2.student_id = b.student_id " +
        "WHERE st1.grade_level = st2.grade_level) p GROUP BY gl " +
        "UNION ALL SELECT grade_level AS gl, 0 AS shared, " +
        "COUNT(*) * (COUNT(*) - 1) / 2 AS pairs FROM students " +
        "GROUP BY grade_level) u", "avg_shared_membership"),
    EvalCase("courses where the score gap between ninth and tenth graders exceeds 5",
      "SELECT s.course_id FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id GROUP BY s.course_id " +
        "HAVING ABS(AVG(CASE WHEN st.grade_level = 9 THEN s.score END) - " +
        "AVG(CASE WHEN st.grade_level = 10 THEN s.score END)) > 5 " +
        "ORDER BY s.course_id LIMIT 100", "cohort_gap_filter"),
    // --- round-10ak open cases, closed in round 10al (named dominance,
    //     percentile of group aggregates, above-median count) ---
    EvalCase("students who beat Ada Adams in every course they share with her",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN (SELECT course_id, score FROM scores s2 JOIN students st2 " +
        "ON st2.student_id = s2.student_id " +
        "WHERE st2.student_name = 'Ada Adams') a " +
        "ON a.course_id = s.course_id GROUP BY s.student_id " +
        "HAVING MIN(CASE WHEN s.score > a.score THEN 1 ELSE 0 END) = 1) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "WHERE st.student_name <> 'Ada Adams' " +
        "ORDER BY st.student_name LIMIT 100", "named_dominance"),
    EvalCase("the 90th percentile of per-student average scores",
      "SELECT ROUND(PERCENTILE(a, 0.9), 4) AS agg_value FROM " +
        "(SELECT AVG(score) AS a FROM scores GROUP BY student_id) t",
      "percentile_of_group_aggs"),
    EvalCase("courses whose enrollment is above the median course enrollment",
      "SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING COUNT(*) > (SELECT MEDIAN(c) FROM (SELECT COUNT(*) AS c " +
        "FROM scores GROUP BY course_id) t) " +
        "ORDER BY course_id LIMIT 100", "above_median_count"),
    // --- round-10al open cases, closed in round 10am (profile
    //     similarity, top-decile threshold, rank-trend share) ---
    EvalCase("the pair of students with the most similar score profiles",
      "SELECT s1, s2 FROM (SELECT a.student_id AS s1, b.student_id AS s2, " +
        "AVG(ABS(a.score - b.score)) AS d FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "GROUP BY a.student_id, b.student_id HAVING COUNT(*) >= 5) t " +
        "ORDER BY d ASC, s1, s2 LIMIT 1", "profile_similarity_argmin"),
    EvalCase("the minimum score needed to be in the top 10 percent",
      "SELECT MIN(score) AS agg_value FROM (SELECT score, PERCENT_RANK() " +
        "OVER (ORDER BY score DESC) AS pr FROM scores) t WHERE pr <= 0.1",
      "top_decile_threshold"),
    EvalCase("the share of students whose rank improved between 2022 and 2023",
      "WITH r AS (SELECT year, student_id, RANK() OVER (PARTITION BY year " +
        "ORDER BY AVG(score) DESC) AS rk FROM scores " +
        "WHERE year IN (2022, 2023) GROUP BY year, student_id) " +
        "SELECT ROUND(CAST(SUM(CASE WHEN b.rk < a.rk THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM r a JOIN r b " +
        "ON a.student_id = b.student_id AND a.year = 2022 AND b.year = 2023",
      "rank_trend_share"),
    // --- round-10am open cases, closed in round 10an (z-score band
    //     share, Jaccard pair argmax, multi-top-rank count) ---
    EvalCase("the share of scores within one standard deviation of the mean",
      "SELECT ROUND(CAST(SUM(CASE WHEN ABS(score - " +
        "(SELECT AVG(score) FROM scores)) <= " +
        "(SELECT STDDEV_POP(score) FROM scores) THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM scores",
      "zscore_band_share"),
    EvalCase("the pair of courses sharing the largest fraction of their combined students",
      "SELECT c1, c2 FROM (SELECT a.course_id AS c1, b.course_id AS c2, " +
        "CAST(COUNT(*) AS DOUBLE) / (MIN(ca.n) + MIN(cb.n) - COUNT(*)) AS j " +
        "FROM scores a JOIN scores b ON a.student_id = b.student_id " +
        "AND a.course_id < b.course_id " +
        "JOIN (SELECT course_id, COUNT(*) AS n FROM scores GROUP BY course_id) ca " +
        "ON ca.course_id = a.course_id " +
        "JOIN (SELECT course_id, COUNT(*) AS n FROM scores GROUP BY course_id) cb " +
        "ON cb.course_id = b.course_id " +
        "GROUP BY a.course_id, b.course_id) t " +
        "ORDER BY j DESC, c1, c2 LIMIT 1", "jaccard_pair_argmax"),
    EvalCase("how many students are in the top 10 of more than one course",
      "SELECT COUNT(*) AS agg_value FROM (SELECT student_id FROM " +
        "(SELECT student_id, course_id, RANK() OVER (PARTITION BY course_id " +
        "ORDER BY score DESC) AS rk FROM scores) r WHERE rk <= 10 " +
        "GROUP BY student_id HAVING COUNT(DISTINCT course_id) > 1) t",
      "multi_top_rank_count"),
    // --- round-10an open cases, closed in round 10ao (hardest-course
    //     average, universal argmax attribute, adjacent-period delta) ---
    EvalCase("the average score students got in their hardest course",
      "WITH ca AS (SELECT course_id, AVG(score) AS cavg FROM scores " +
        "GROUP BY course_id) " +
        "SELECT ROUND(AVG(score), 4) AS agg_value FROM (SELECT s.score, " +
        "ROW_NUMBER() OVER (PARTITION BY s.student_id " +
        "ORDER BY ca.cavg ASC, s.course_id) AS rn " +
        "FROM scores s JOIN ca ON ca.course_id = s.course_id) t WHERE rn = 1",
      "hardest_course_avg"),
    EvalCase("departments where every course's top scorer is a ninth grader",
      "WITH top AS (SELECT course_id, student_id FROM (SELECT course_id, " +
        "student_id, ROW_NUMBER() OVER (PARTITION BY course_id " +
        "ORDER BY score DESC, student_id) AS rn FROM scores) t WHERE rn = 1) " +
        "SELECT c.dept FROM top JOIN students st " +
        "ON st.student_id = top.student_id JOIN courses c " +
        "ON c.course_id = top.course_id GROUP BY c.dept " +
        "HAVING MIN(CASE WHEN st.grade_level = 9 THEN 1 ELSE 0 END) = 1 " +
        "ORDER BY c.dept LIMIT 100", "universal_argmax_attr"),
    EvalCase("the year with the biggest improvement in average score over the previous year",
      "SELECT y FROM (SELECT year AS y, AVG(score) - LAG(AVG(score)) " +
        "OVER (ORDER BY year) AS delta FROM scores GROUP BY year) t " +
        "WHERE delta IS NOT NULL ORDER BY delta DESC, y LIMIT 1",
      "yoy_delta_argmax"),
    // --- round-10ao open cases, closed in round 10ap (cohort
    //     aggregate-range argmax, above-average multi-count, dual-cohort
    //     coverage) ---
    EvalCase("the grade level whose students have the widest range of average scores",
      "SELECT gl FROM (SELECT st.grade_level AS gl, MAX(a) - MIN(a) AS r " +
        "FROM (SELECT student_id, AVG(score) AS a FROM scores " +
        "GROUP BY student_id) p JOIN students st " +
        "ON st.student_id = p.student_id GROUP BY st.grade_level) t " +
        "ORDER BY r DESC, gl LIMIT 1", "cohort_agg_range_argmax"),
    EvalCase("how many students scored above the course average in at least three courses",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.student_id FROM scores s " +
        "JOIN (SELECT course_id, AVG(score) AS ca FROM scores " +
        "GROUP BY course_id) c ON c.course_id = s.course_id " +
        "WHERE s.score > c.ca GROUP BY s.student_id " +
        "HAVING COUNT(*) >= 3) t", "above_avg_multi_count"),
    EvalCase("the share of courses taken by both ninth and tenth graders",
      "SELECT ROUND(CAST(COUNT(*) AS DOUBLE) / " +
        "(SELECT COUNT(*) FROM courses), 4) AS agg_value FROM " +
        "(SELECT s.course_id FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id GROUP BY s.course_id " +
        "HAVING SUM(CASE WHEN st.grade_level = 9 THEN 1 ELSE 0 END) > 0 " +
        "AND SUM(CASE WHEN st.grade_level = 10 THEN 1 ELSE 0 END) > 0) t",
      "dual_cohort_coverage"),
    // --- round-10ap open cases, closed in round 10aq (streak argmax,
    //     extreme-same-group share, group-size correlation) ---
    EvalCase("the course with the longest run of years of rising average scores",
      "WITH ya AS (SELECT course_id, year, AVG(score) AS a FROM scores " +
        "GROUP BY course_id, year), " +
        "d AS (SELECT course_id, year, CASE WHEN a > LAG(a) OVER " +
        "(PARTITION BY course_id ORDER BY year) THEN 1 ELSE 0 END AS up " +
        "FROM ya), " +
        "g AS (SELECT course_id, up, SUM(CASE WHEN up = 0 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY course_id ORDER BY year) AS grp FROM d), " +
        "s AS (SELECT course_id, grp, SUM(up) AS len FROM g " +
        "GROUP BY course_id, grp) " +
        "SELECT course_id FROM s GROUP BY course_id " +
        "ORDER BY MAX(len) DESC, course_id LIMIT 1", "course_streak_argmax"),
    EvalCase("the share of students whose best and worst scores are in the same department",
      "WITH r AS (SELECT student_id, course_id, ROW_NUMBER() OVER " +
        "(PARTITION BY student_id ORDER BY score DESC, course_id) AS rb, " +
        "ROW_NUMBER() OVER (PARTITION BY student_id " +
        "ORDER BY score ASC, course_id) AS rw FROM scores), " +
        "x AS (SELECT student_id, MAX(CASE WHEN rb = 1 THEN course_id END) AS bc, " +
        "MAX(CASE WHEN rw = 1 THEN course_id END) AS wc FROM r " +
        "GROUP BY student_id) " +
        "SELECT ROUND(CAST(SUM(CASE WHEN cb.dept = cw.dept THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM x " +
        "JOIN courses cb ON cb.course_id = x.bc " +
        "JOIN courses cw ON cw.course_id = x.wc", "extreme_same_group_share"),
    EvalCase("the correlation between course enrollment and average score",
      "SELECT ROUND(CORR(n, a), 4) AS agg_value FROM " +
        "(SELECT course_id, COUNT(*) AS n, AVG(score) AS a FROM scores " +
        "GROUP BY course_id) t", "group_size_performance_corr"),
    // --- round-10aq open cases, closed in round 10ar (qualified
    //     attribute argmin, consecutive-gap average, cohort popularity) ---
    EvalCase("the youngest student among those with an average score above 75",
      "SELECT student_name FROM (SELECT st.student_name, st.age " +
        "FROM students st JOIN (SELECT student_id, AVG(score) AS a " +
        "FROM scores GROUP BY student_id) p " +
        "ON p.student_id = st.student_id WHERE p.a > 75) t " +
        "ORDER BY age ASC, student_name LIMIT 1", "qualified_attr_argmin"),
    EvalCase("the average gap between consecutive distinct scores",
      "SELECT ROUND(AVG(score - prev), 4) AS agg_value FROM " +
        "(SELECT score, LAG(score) OVER (ORDER BY score) AS prev FROM " +
        "(SELECT DISTINCT score FROM scores) d) t WHERE prev IS NOT NULL",
      "consecutive_gap_avg"),
    EvalCase("for each grade level, the course taken by the most of its students",
      "SELECT gl, course_id FROM (SELECT st.grade_level AS gl, s.course_id, " +
        "ROW_NUMBER() OVER (PARTITION BY st.grade_level " +
        "ORDER BY COUNT(*) DESC, s.course_id) AS rn FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY st.grade_level, s.course_id) t WHERE rn = 1 ORDER BY gl",
      "cohort_popular_course"),
    // --- round-10ar open cases, closed in round 10as (floor vs global
    //     average, average distinct per group, named overlap argmax) ---
    EvalCase("the number of students whose worst score is still above the overall average",
      "SELECT COUNT(*) AS agg_value FROM (SELECT student_id FROM scores " +
        "GROUP BY student_id HAVING MIN(score) > " +
        "(SELECT AVG(score) FROM scores)) t", "floor_above_avg_count"),
    EvalCase("the average number of distinct grades per course",
      "SELECT ROUND(AVG(d), 4) AS agg_value FROM (SELECT course_id, " +
        "COUNT(DISTINCT grade) AS d FROM scores GROUP BY course_id) t",
      "avg_distinct_per_group"),
    EvalCase("the student who shares the most courses with Ada Adams",
      "SELECT student_name FROM (SELECT st.student_id, st.student_name, " +
        "COUNT(*) AS c FROM scores s JOIN (SELECT s2.course_id " +
        "FROM scores s2 JOIN students st2 ON st2.student_id = s2.student_id " +
        "WHERE st2.student_name = 'Ada Adams') a " +
        "ON a.course_id = s.course_id JOIN students st " +
        "ON st.student_id = s.student_id " +
        "WHERE st.student_name <> 'Ada Adams' " +
        "GROUP BY st.student_id, st.student_name) t " +
        "ORDER BY c DESC, student_name, student_id LIMIT 1",
      "named_overlap_argmax"),
    // --- round-10as open cases, closed in round 10at (size-filtered
    //     average, cohort sum share, value-domain span) ---
    EvalCase("the average score in courses with more than 60 students",
      "SELECT ROUND(AVG(score), 4) AS agg_value FROM scores WHERE " +
        "course_id IN (SELECT course_id FROM scores GROUP BY course_id " +
        "HAVING COUNT(*) > 60)", "size_filtered_avg"),
    EvalCase("the percentage of total score points earned by ninth graders",
      "SELECT ROUND(CAST(SUM(CASE WHEN st.grade_level = 9 THEN s.score " +
        "ELSE 0 END) AS DOUBLE) / SUM(s.score), 4) AS agg_value " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id",
      "cohort_sum_share"),
    EvalCase("students who received every grade letter at least once",
      "SELECT st.student_name FROM (SELECT student_id FROM scores " +
        "GROUP BY student_id HAVING COUNT(DISTINCT grade) = " +
        "(SELECT COUNT(DISTINCT grade) FROM scores)) m JOIN students st " +
        "ON st.student_id = m.student_id ORDER BY st.student_name LIMIT 100",
      "grade_domain_span"),
    // --- round-10at open cases, closed in round 10au (value ratio,
    //     personal-best distribution, unique-argmax count) ---
    EvalCase("the ratio of A grades to F grades",
      "SELECT ROUND(CAST(SUM(CASE WHEN grade = 'A' THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / SUM(CASE WHEN grade = 'F' THEN 1 ELSE 0 END), 4) " +
        "AS agg_value FROM scores", "value_ratio"),
    EvalCase("how many students achieved their personal best in each course",
      "SELECT course_id, COUNT(*) AS n FROM (SELECT student_id, course_id " +
        "FROM (SELECT student_id, course_id, ROW_NUMBER() OVER " +
        "(PARTITION BY student_id ORDER BY score DESC, course_id) AS rn " +
        "FROM scores) r WHERE rn = 1) t GROUP BY course_id " +
        "ORDER BY course_id", "best_course_distribution"),
    EvalCase("how many courses have a unique top scorer",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.course_id FROM scores s " +
        "JOIN (SELECT course_id AS cid, MAX(score) AS mx FROM scores " +
        "GROUP BY course_id) m ON m.cid = s.course_id AND s.score = m.mx " +
        "GROUP BY s.course_id HAVING COUNT(*) = 1) t",
      "unique_argmax_count"),
    // --- round-10au open cases, closed in round 10av (top-2 count gap,
    //     category self-compare, average entity share) ---
    EvalCase("the gap between the two most popular courses by enrollment",
      "SELECT MAX(n) - MIN(n) AS agg_value FROM (SELECT COUNT(*) AS n " +
        "FROM scores GROUP BY course_id ORDER BY n DESC LIMIT 2) t",
      "top2_count_gap"),
    EvalCase("students whose average in math courses beats their average in science courses",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY s.student_id " +
        "HAVING AVG(CASE WHEN c.dept = 'math' THEN s.score END) > " +
        "AVG(CASE WHEN c.dept = 'science' THEN s.score END)) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "category_self_compare"),
    EvalCase("the average share of courses per student with a grade of C or better",
      "SELECT ROUND(AVG(sh), 4) AS agg_value FROM (SELECT student_id, " +
        "CAST(SUM(CASE WHEN grade IN ('A','B','C') THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*) AS sh FROM scores GROUP BY student_id) t",
      "avg_entity_share"),
    // --- round-10av open cases, closed in round 10aw (cohort group
    //     argmin, all-periods-monotone count, average-of-average size) ---
    EvalCase("the hardest course for ninth graders",
      "SELECT s.course_id FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id WHERE st.grade_level = 9 " +
        "GROUP BY s.course_id ORDER BY AVG(s.score) ASC, s.course_id " +
        "LIMIT 1", "cohort_group_argmin"),
    EvalCase("how many students improved their average every year they were enrolled",
      "WITH ya AS (SELECT student_id, year, AVG(score) AS a FROM scores " +
        "GROUP BY student_id, year), " +
        "d AS (SELECT student_id, CASE WHEN a > LAG(a) OVER " +
        "(PARTITION BY student_id ORDER BY year) THEN 1 ELSE 0 END AS up, " +
        "ROW_NUMBER() OVER (PARTITION BY student_id ORDER BY year) AS rn " +
        "FROM ya) " +
        "SELECT COUNT(*) AS agg_value FROM (SELECT student_id FROM d " +
        "GROUP BY student_id HAVING MIN(CASE WHEN rn = 1 THEN 1 ELSE up " +
        "END) = 1 AND COUNT(*) > 1) t", "all_years_improving_count"),
    EvalCase("the average course enrollment experienced by a typical student",
      "WITH n AS (SELECT course_id, COUNT(*) AS en FROM scores " +
        "GROUP BY course_id) " +
        "SELECT ROUND(AVG(m), 4) AS agg_value FROM (SELECT s.student_id, " +
        "AVG(n.en) AS m FROM scores s JOIN n ON n.course_id = s.course_id " +
        "GROUP BY s.student_id) t", "avg_avg_group_size"),
    // --- round-10aw open cases, closed in round 10ax (disjoint pairs,
    //     self-band universal, named-group average rank) ---
    EvalCase("how many pairs of courses share no students at all",
      "SELECT CAST((SELECT COUNT(*) FROM courses) * " +
        "((SELECT COUNT(*) FROM courses) - 1) / 2 AS BIGINT) - COUNT(*) " +
        "AS agg_value FROM (SELECT DISTINCT a.course_id AS c1, " +
        "b.course_id AS c2 FROM scores a JOIN scores b " +
        "ON a.student_id = b.student_id AND a.course_id < b.course_id) t",
      "disjoint_pair_count"),
    EvalCase("students whose score in every course is within 10 points of their own average",
      "SELECT st.student_name FROM (SELECT student_id FROM " +
        "(SELECT student_id, score, AVG(score) OVER " +
        "(PARTITION BY student_id) AS a FROM scores) x " +
        "GROUP BY student_id HAVING MAX(ABS(score - a)) <= 10) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "self_band_universal"),
    EvalCase("the average position of Algebra in each student's personal ranking of courses",
      "SELECT ROUND(AVG(rk), 4) AS agg_value FROM (SELECT s.student_id, " +
        "RANK() OVER (PARTITION BY s.student_id ORDER BY s.score DESC) AS rk, " +
        "c.course_name FROM scores s JOIN courses c " +
        "ON c.course_id = s.course_id) t WHERE course_name = 'Algebra'",
      "named_group_avg_rank"),
    // --- round-10ax open cases, closed in round 10ay (exclusive
    //     values, cohort share argmax, first-period count) ---
    EvalCase("the number of distinct score values that appear in only one course",
      "SELECT COUNT(*) AS agg_value FROM (SELECT score FROM " +
        "(SELECT DISTINCT score, course_id FROM scores) t GROUP BY score " +
        "HAVING COUNT(*) = 1) u", "exclusive_value_count"),
    EvalCase("the grade level with the highest share of A grades",
      "SELECT gl FROM (SELECT st.grade_level AS gl, " +
        "CAST(SUM(CASE WHEN s.grade = 'A' THEN 1 ELSE 0 END) AS DOUBLE) " +
        "/ COUNT(*) AS sh FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id GROUP BY st.grade_level) t " +
        "ORDER BY sh DESC, gl LIMIT 1", "cohort_share_argmax"),
    EvalCase("how many scores were recorded in each student's first year",
      "SELECT COUNT(*) AS agg_value FROM scores s JOIN " +
        "(SELECT student_id, MIN(year) AS y0 FROM scores " +
        "GROUP BY student_id) f ON f.student_id = s.student_id " +
        "AND f.y0 = s.year", "first_period_count"),
    // --- round-10ay open cases, closed in round 10az (enrollment-trend
    //     argmax, floor-threshold share, per-attribute median size) ---
    EvalCase("the course whose enrollment changed the most between 2022 and 2023",
      "SELECT course_id FROM scores WHERE year IN (2022, 2023) " +
        "GROUP BY course_id ORDER BY " +
        "ABS(SUM(CASE WHEN year = 2023 THEN 1 ELSE 0 END) - " +
        "SUM(CASE WHEN year = 2022 THEN 1 ELSE 0 END)) DESC, course_id " +
        "LIMIT 1", "enrollment_trend_argmax"),
    EvalCase("the share of students who never scored below 60",
      "SELECT ROUND(CAST(SUM(CASE WHEN mn >= 60 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM " +
        "(SELECT student_id, MIN(score) AS mn FROM scores " +
        "GROUP BY student_id) t", "floor_threshold_share"),
    EvalCase("the median enrollment among courses in each department",
      "SELECT dept, CAST(MEDIAN(n) AS DOUBLE) AS med FROM " +
        "(SELECT c.dept, s.course_id, COUNT(*) AS n FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.course_id) t GROUP BY dept ORDER BY dept",
      "dept_median_enrollment"),
    // --- round-10az open cases, closed in round 10ba (popularity
    //     extremes gap, cohort count-compare, average entity median) ---
    EvalCase("the difference in average score between the most and least popular courses",
      "WITH n AS (SELECT course_id, COUNT(*) AS en, AVG(score) AS a " +
        "FROM scores GROUP BY course_id), " +
        "hi AS (SELECT a FROM n ORDER BY en DESC, course_id LIMIT 1), " +
        "lo AS (SELECT a FROM n ORDER BY en ASC, course_id LIMIT 1) " +
        "SELECT ROUND((SELECT a FROM hi) - (SELECT a FROM lo), 4) " +
        "AS agg_value", "popularity_extremes_gap"),
    EvalCase("the number of courses where ninth graders outnumber tenth graders",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.course_id FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.course_id " +
        "HAVING SUM(CASE WHEN st.grade_level = 9 THEN 1 ELSE 0 END) > " +
        "SUM(CASE WHEN st.grade_level = 10 THEN 1 ELSE 0 END)) t",
      "cohort_count_compare_count"),
    EvalCase("the average of each student's median score",
      "SELECT ROUND(AVG(md), 4) AS agg_value FROM (SELECT student_id, " +
        "MEDIAN(score) AS md FROM scores GROUP BY student_id) t",
      "avg_entity_median"),
    // --- round-10ba open cases, closed in round 10bb (near-max
    //     membership, top-2 gap mode, average group attribute extreme) ---
    EvalCase("how many students scored within 5 points of the top score in at least one course",
      "SELECT COUNT(DISTINCT s.student_id) AS agg_value FROM scores s " +
        "JOIN (SELECT course_id, MAX(score) AS mx FROM scores " +
        "GROUP BY course_id) m ON m.course_id = s.course_id " +
        "AND s.score >= m.mx - 5", "near_max_membership_count"),
    EvalCase("the most common margin between a student's best and second-best scores",
      "WITH r AS (SELECT student_id, score, ROW_NUMBER() OVER " +
        "(PARTITION BY student_id ORDER BY score DESC, course_id) AS rn " +
        "FROM scores), " +
        "g AS (SELECT a.student_id, a.score - b.score AS gap FROM r a " +
        "JOIN r b ON a.student_id = b.student_id AND a.rn = 1 AND b.rn = 2) " +
        "SELECT gap FROM g GROUP BY gap ORDER BY COUNT(*) DESC, gap LIMIT 1",
      "top2_gap_mode"),
    EvalCase("the average age of the oldest student in each course",
      "SELECT ROUND(AVG(mx), 4) AS agg_value FROM (SELECT s.course_id, " +
        "MAX(st.age) AS mx FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id GROUP BY s.course_id) t",
      "avg_group_attr_max"),
    // --- round-10bb open cases, closed in round 10bc (full-coverage
    //     periods, above-average count argmax, max-median gap) ---
    EvalCase("the number of years in which every course was offered",
      "SELECT COUNT(*) AS agg_value FROM (SELECT year FROM " +
        "(SELECT DISTINCT year, course_id FROM scores) t GROUP BY year " +
        "HAVING COUNT(*) = (SELECT COUNT(*) FROM courses)) u",
      "full_coverage_period_count"),
    EvalCase("the student with the most scores above their course's average",
      "SELECT student_name FROM (SELECT s.student_id, COUNT(*) AS c " +
        "FROM scores s JOIN (SELECT course_id, AVG(score) AS ca " +
        "FROM scores GROUP BY course_id) m ON m.course_id = s.course_id " +
        "WHERE s.score > m.ca GROUP BY s.student_id) t JOIN students st " +
        "ON st.student_id = t.student_id " +
        "ORDER BY c DESC, student_name, t.student_id LIMIT 1",
      "above_avg_count_argmax"),
    EvalCase("the average difference between a course's maximum and median score",
      "SELECT ROUND(AVG(mx - md), 4) AS agg_value FROM " +
        "(SELECT course_id, MAX(score) AS mx, MEDIAN(score) AS md " +
        "FROM scores GROUP BY course_id) t", "avg_max_median_gap"),
    // --- round-10bc open cases, closed in round 10bd (period entropy
    //     argmax, division with negation, IQR-trimmed entity mean) ---
    EvalCase("the year with the most balanced grade distribution",
      "SELECT y FROM (SELECT year AS y, -SUM(p * LN(p)) AS e FROM " +
        "(SELECT year, CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER " +
        "(PARTITION BY year) AS p FROM scores GROUP BY year, grade) t " +
        "GROUP BY y) u ORDER BY e DESC, y LIMIT 1",
      "period_entropy_argmax"),
    EvalCase("students who took a course in every department but never got an A",
      "SELECT st.student_name FROM (SELECT s.student_id FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id HAVING COUNT(DISTINCT c.dept) = " +
        "(SELECT COUNT(DISTINCT dept) FROM courses) " +
        "AND SUM(CASE WHEN s.grade = 'A' THEN 1 ELSE 0 END) = 0) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "division_with_negation"),
    EvalCase("the average score of the middle 50 percent of students by average",
      "WITH a AS (SELECT student_id, AVG(score) AS av FROM scores " +
        "GROUP BY student_id), " +
        "b AS (SELECT av, PERCENT_RANK() OVER (ORDER BY av) AS pr FROM a) " +
        "SELECT ROUND(AVG(av), 4) AS agg_value FROM b " +
        "WHERE pr >= 0.25 AND pr <= 0.75", "iqr_trimmed_entity_mean"),
    // --- round-10bd open cases, closed in round 10be (cohort average
    //     membership, argmax-entity distinct count, max cell range) ---
    EvalCase("the average number of courses taken per student in each grade level",
      "SELECT gl, ROUND(AVG(c), 4) AS a FROM (SELECT st.grade_level AS gl, " +
        "s.student_id, COUNT(*) AS c FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id " +
        "GROUP BY st.grade_level, s.student_id) t GROUP BY gl ORDER BY gl",
      "cohort_avg_membership"),
    EvalCase("how many distinct scores did the best student record",
      "WITH b AS (SELECT student_id FROM scores GROUP BY student_id " +
        "ORDER BY AVG(score) DESC, student_id LIMIT 1) " +
        "SELECT COUNT(DISTINCT score) AS agg_value FROM scores " +
        "WHERE student_id = (SELECT student_id FROM b)",
      "argmax_entity_distinct_count"),
    EvalCase("the widest score range recorded in a single course in a single year",
      "SELECT MAX(mx - mn) AS agg_value FROM (SELECT course_id, year, " +
        "MAX(score) AS mx, MIN(score) AS mn FROM scores " +
        "GROUP BY course_id, year) t", "max_cell_range"),
    // --- round-10be open cases, closed in round 10bf (empty-cell
    //     count, entity extreme mode, entity last-period average) ---
    EvalCase("the number of grade-level and department pairs with no enrollments",
      "SELECT (SELECT COUNT(DISTINCT grade_level) FROM students) * " +
        "(SELECT COUNT(DISTINCT dept) FROM courses) - COUNT(*) " +
        "AS agg_value FROM (SELECT DISTINCT st.grade_level, c.dept " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id) t",
      "empty_cell_count"),
    EvalCase("the score most frequently recorded as a student's personal worst",
      "SELECT mn FROM (SELECT student_id, MIN(score) AS mn FROM scores " +
        "GROUP BY student_id) t GROUP BY mn ORDER BY COUNT(*) DESC, mn " +
        "LIMIT 1", "entity_min_mode"),
    EvalCase("the average score across each student's final year",
      "SELECT ROUND(AVG(score), 4) AS agg_value FROM scores s JOIN " +
        "(SELECT student_id, MAX(year) AS y1 FROM scores " +
        "GROUP BY student_id) f ON f.student_id = s.student_id " +
        "AND f.y1 = s.year", "entity_last_period_avg"),
    // --- round-10bf open cases, closed in round 10bg (distribution
    //     similarity pair, cohort top-k members, YoY active delta) ---
    EvalCase("the pair of departments with the most similar grade distributions",
      "WITH d AS (SELECT c.dept, s.grade, COUNT(*) AS n FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.grade), " +
        "p AS (SELECT dept, grade, CAST(n AS DOUBLE) / SUM(n) OVER " +
        "(PARTITION BY dept) AS sh FROM d) " +
        "SELECT d1, d2 FROM (SELECT a.dept AS d1, b.dept AS d2, " +
        "SUM(ABS(a.sh - b.sh)) AS dist FROM p a JOIN p b " +
        "ON a.grade = b.grade AND a.dept < b.dept " +
        "GROUP BY a.dept, b.dept) t ORDER BY dist ASC, d1, d2 LIMIT 1",
      "dept_distribution_similarity"),
    EvalCase("students ranked in the top 3 of their grade level by average score",
      "SELECT student_name FROM (SELECT st.student_name, ROW_NUMBER() " +
        "OVER (PARTITION BY st.grade_level ORDER BY a DESC, p.student_id) " +
        "AS rn FROM (SELECT student_id, AVG(score) AS a FROM scores " +
        "GROUP BY student_id) p JOIN students st " +
        "ON st.student_id = p.student_id) t WHERE rn <= 3 " +
        "ORDER BY student_name LIMIT 100", "cohort_topk_members"),
    EvalCase("the year-over-year change in the number of active students",
      "SELECT y, d FROM (SELECT year AS y, COUNT(DISTINCT student_id) - " +
        "LAG(COUNT(DISTINCT student_id)) OVER (ORDER BY year) AS d " +
        "FROM scores GROUP BY year) t WHERE d IS NOT NULL ORDER BY y",
      "yoy_active_delta"),
    // --- round-10bg open cases, closed in round 10bh (entity slope
    //     argmax, per-attribute top-contributor share, dual extremes) ---
    EvalCase("the student whose yearly average scores have the steepest upward trend",
      "SELECT student_id FROM (SELECT student_id, REGR_SLOPE(a, year) AS sl " +
        "FROM (SELECT student_id, year, AVG(score) AS a FROM scores " +
        "GROUP BY student_id, year) t GROUP BY student_id " +
        "HAVING COUNT(*) > 1) u ORDER BY sl DESC, student_id LIMIT 1",
      "entity_slope_argmax"),
    EvalCase("for each department, the share of its scores produced by its most active student",
      "WITH cnt AS (SELECT c.dept, s.student_id, COUNT(*) AS n " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.student_id), " +
        "tot AS (SELECT dept, SUM(n) AS tn FROM cnt GROUP BY dept), " +
        "top AS (SELECT dept, n FROM (SELECT dept, n, ROW_NUMBER() OVER " +
        "(PARTITION BY dept ORDER BY n DESC, student_id) AS rn FROM cnt) x " +
        "WHERE rn = 1) " +
        "SELECT t.dept, ROUND(CAST(t.n AS DOUBLE) / tot.tn, 4) AS sh " +
        "FROM top t JOIN tot ON tot.dept = t.dept ORDER BY t.dept",
      "dept_top_student_share"),
    EvalCase("students whose scores include both a course maximum and a course minimum",
      "SELECT st.student_name FROM (SELECT DISTINCT s.student_id " +
        "FROM scores s JOIN (SELECT course_id, MAX(score) AS mx " +
        "FROM scores GROUP BY course_id) m ON m.course_id = s.course_id " +
        "AND s.score = m.mx) hi JOIN (SELECT DISTINCT s.student_id " +
        "FROM scores s JOIN (SELECT course_id, MIN(score) AS mn " +
        "FROM scores GROUP BY course_id) m ON m.course_id = s.course_id " +
        "AND s.score = m.mn) lo ON lo.student_id = hi.student_id " +
        "JOIN students st ON st.student_id = hi.student_id " +
        "ORDER BY st.student_name LIMIT 100", "dual_extreme_holders"),
    // --- round-10bh open cases, closed in round 10bi (attribute top-2
    //     margin, trend-threshold entities, extreme-period share) ---
    EvalCase("the department where the top student's lead over the runner-up is largest",
      "WITH a AS (SELECT c.dept, s.student_id, AVG(s.score) AS av " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.student_id), " +
        "r AS (SELECT dept, av, ROW_NUMBER() OVER (PARTITION BY dept " +
        "ORDER BY av DESC, student_id) AS rn FROM a) " +
        "SELECT dept FROM (SELECT t1.dept, t1.av - t2.av AS margin " +
        "FROM r t1 JOIN r t2 ON t1.dept = t2.dept AND t1.rn = 1 " +
        "AND t2.rn = 2) x ORDER BY margin DESC, dept LIMIT 1",
      "attr_top2_margin_argmax"),
    EvalCase("students whose 2023 average beat their 2022 average by more than 5 points",
      "SELECT st.student_name FROM (SELECT student_id FROM scores " +
        "WHERE year IN (2022, 2023) GROUP BY student_id " +
        "HAVING AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END) > 5) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "trend_threshold_entities"),
    EvalCase("the share of courses whose hardest year was 2022",
      "SELECT ROUND(CAST(SUM(CASE WHEN y0 = 2022 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / COUNT(*), 4) AS agg_value FROM (SELECT course_id, " +
        "y0 FROM (SELECT course_id, year AS y0, ROW_NUMBER() OVER " +
        "(PARTITION BY course_id ORDER BY AVG(score) ASC, year) AS rn " +
        "FROM scores GROUP BY course_id, year) t WHERE rn = 1) u",
      "group_extreme_period_share"),
    // --- round-10bi open cases, closed in round 10bj (rank-proximity
    //     pairs, average pairwise correlation, period trend argmax) ---
    EvalCase("pairs of students who rank within two places of each other in every shared course",
      "WITH r AS (SELECT course_id, student_id, RANK() OVER " +
        "(PARTITION BY course_id ORDER BY score DESC) AS rk FROM scores) " +
        "SELECT s1, s2 FROM (SELECT a.student_id AS s1, b.student_id AS s2 " +
        "FROM r a JOIN r b ON a.course_id = b.course_id " +
        "AND a.student_id < b.student_id " +
        "GROUP BY a.student_id, b.student_id " +
        "HAVING COUNT(*) >= 5 AND MAX(ABS(a.rk - b.rk)) <= 2) t " +
        "ORDER BY s1, s2 LIMIT 100", "rank_proximity_pairs"),
    EvalCase("the average correlation between scores in pairs of courses sharing at least 20 students",
      "SELECT ROUND(AVG(c), 4) AS agg_value FROM (SELECT " +
        "CORR(a.score, b.score) AS c FROM scores a JOIN scores b " +
        "ON a.student_id = b.student_id AND a.course_id < b.course_id " +
        "GROUP BY a.course_id, b.course_id HAVING COUNT(*) >= 20) t",
      "avg_pairwise_corr"),
    EvalCase("for each year, the course that improved most over the previous year",
      "WITH ya AS (SELECT course_id, year, AVG(score) AS a FROM scores " +
        "GROUP BY course_id, year), " +
        "d AS (SELECT course_id, year, a - LAG(a) OVER " +
        "(PARTITION BY course_id ORDER BY year) AS delta FROM ya) " +
        "SELECT year, course_id FROM (SELECT year, course_id, " +
        "ROW_NUMBER() OVER (PARTITION BY year ORDER BY delta DESC, " +
        "course_id) AS rn FROM d WHERE delta IS NOT NULL) t " +
        "WHERE rn = 1 ORDER BY year", "period_trend_argmax_list"),
    // --- round-10bj open cases, closed in round 10bk (overage total,
    //     timed pair argmax, attribute value-peak period) ---
    EvalCase("the minimum number of enrollments to drop so no course exceeds 60",
      "SELECT CAST(SUM(CASE WHEN n > 60 THEN n - 60 ELSE 0 END) " +
        "AS BIGINT) AS agg_value FROM (SELECT COUNT(*) AS n FROM scores " +
        "GROUP BY course_id) t", "overage_total"),
    EvalCase("the student pair with the most years of shared enrollment in the same course",
      "SELECT s1, s2 FROM (SELECT a.student_id AS s1, b.student_id AS s2, " +
        "COUNT(DISTINCT a.year) AS y FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.year = b.year " +
        "AND a.student_id < b.student_id " +
        "GROUP BY a.student_id, b.student_id) t " +
        "ORDER BY y DESC, s1, s2 LIMIT 1", "timed_pair_argmax"),
    EvalCase("the year each department had its most A grades",
      "SELECT dept, y FROM (SELECT c.dept, s.year AS y, ROW_NUMBER() " +
        "OVER (PARTITION BY c.dept ORDER BY SUM(CASE WHEN s.grade = 'A' " +
        "THEN 1 ELSE 0 END) DESC, s.year) AS rn FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY c.dept, s.year) t WHERE rn = 1 ORDER BY dept",
      "attr_value_peak_period"),
    // --- round-10bk open cases, closed in round 10bl (sole cohort
    //     representative, trimmed range, modal cohort share) ---
    EvalCase("students who are the only one from their grade level in some course",
      "SELECT DISTINCT st.student_name FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id JOIN (SELECT s2.course_id, " +
        "st2.grade_level FROM scores s2 JOIN students st2 " +
        "ON st2.student_id = s2.student_id " +
        "GROUP BY s2.course_id, st2.grade_level HAVING COUNT(*) = 1) u " +
        "ON u.course_id = s.course_id AND u.grade_level = st.grade_level " +
        "ORDER BY st.student_name LIMIT 100", "sole_cohort_rep"),
    EvalCase("the trimmed range of scores ignoring the top and bottom five values",
      "WITH r AS (SELECT score, ROW_NUMBER() OVER (ORDER BY score ASC, " +
        "score_id) AS ra, ROW_NUMBER() OVER (ORDER BY score DESC, " +
        "score_id) AS rd FROM scores) " +
        "SELECT MAX(CASE WHEN rd > 5 THEN score END) - " +
        "MIN(CASE WHEN ra > 5 THEN score END) AS agg_value FROM r",
      "trimmed_range"),
    EvalCase("the average share of a course's students who are in its modal grade level",
      "WITH cc AS (SELECT s.course_id, st.grade_level, COUNT(*) AS n " +
        "FROM scores s JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.course_id, st.grade_level), " +
        "m AS (SELECT course_id, n, SUM(n) OVER (PARTITION BY course_id) " +
        "AS tot, ROW_NUMBER() OVER (PARTITION BY course_id " +
        "ORDER BY n DESC, grade_level) AS rn FROM cc) " +
        "SELECT ROUND(AVG(CAST(n AS DOUBLE) / tot), 4) AS agg_value " +
        "FROM m WHERE rn = 1", "modal_cohort_share"),
    // --- round-10bl open cases, closed in round 10bm (average pairwise
    //     gap, cross-rank universal, entity-sum Gini) ---
    EvalCase("the expected score gap between two random classmates, averaged over courses",
      "SELECT ROUND(AVG(d), 4) AS agg_value FROM (SELECT a.course_id, " +
        "AVG(ABS(a.score - b.score)) AS d FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "GROUP BY a.course_id) t", "avg_pairwise_gap"),
    EvalCase("students whose rank in every course is better than their overall rank",
      "WITH o AS (SELECT student_id, RANK() OVER (ORDER BY AVG(score) " +
        "DESC) AS ork FROM scores GROUP BY student_id), " +
        "c AS (SELECT course_id, student_id, RANK() OVER (PARTITION BY " +
        "course_id ORDER BY score DESC) AS crk FROM scores) " +
        "SELECT st.student_name FROM (SELECT c.student_id FROM c JOIN o " +
        "ON o.student_id = c.student_id GROUP BY c.student_id " +
        "HAVING MAX(CASE WHEN c.crk < o.ork THEN 0 ELSE 1 END) = 0) m " +
        "JOIN students st ON st.student_id = m.student_id " +
        "ORDER BY st.student_name LIMIT 100", "cross_rank_universal"),
    EvalCase("the Gini coefficient of total score points per student",
      "WITH s AS (SELECT student_id, SUM(score) AS tot FROM scores " +
        "GROUP BY student_id), " +
        "r AS (SELECT tot, ROW_NUMBER() OVER (ORDER BY tot, student_id) " +
        "AS i, COUNT(*) OVER () AS n, SUM(tot) OVER () AS st FROM s) " +
        "SELECT ROUND(SUM((2.0 * i - n - 1) * tot) / (MAX(n) * MAX(st)), 4) " +
        "AS agg_value FROM r", "entity_sum_gini"),
    // --- round-10bm open cases, closed in round 10bn (two-hop
    //     diversity, group IQR band share, band-membership argmax) ---
    EvalCase("the course whose students have the most diverse set of other courses",
      "SELECT a.course_id FROM scores a JOIN scores b " +
        "ON a.student_id = b.student_id AND b.course_id <> a.course_id " +
        "GROUP BY a.course_id " +
        "ORDER BY COUNT(DISTINCT b.course_id) DESC, a.course_id LIMIT 1",
      "twohop_diversity_argmax"),
    EvalCase("the share of scores strictly between their course's quartiles",
      "WITH q AS (SELECT course_id, PERCENTILE(score, 0.25) AS q1, " +
        "PERCENTILE(score, 0.75) AS q3 FROM scores GROUP BY course_id) " +
        "SELECT ROUND(CAST(SUM(CASE WHEN s.score > q.q1 AND " +
        "s.score < q.q3 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) " +
        "AS agg_value FROM scores s JOIN q ON q.course_id = s.course_id",
      "group_iqr_band_share"),
    EvalCase("the student who most often lands in the top 10 percent of a course",
      "WITH r AS (SELECT student_id, course_id, PERCENT_RANK() OVER " +
        "(PARTITION BY course_id ORDER BY score DESC) AS pr FROM scores) " +
        "SELECT student_id FROM r WHERE pr <= 0.1 GROUP BY student_id " +
        "ORDER BY COUNT(*) DESC, student_id LIMIT 1",
      "band_membership_argmax"),
    // --- round-10bn open cases, closed in round 10bo (period cohort
    //     share list, ranked-aggregate max gap, course-subset count) ---
    EvalCase("the share of each year's scores that came from ninth graders, listed by year",
      "SELECT year, ROUND(CAST(SUM(CASE WHEN st.grade_level = 9 THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS sh FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY year ORDER BY year", "period_cohort_share_list"),
    EvalCase("the biggest jump between consecutive ranked course averages",
      "SELECT ROUND(MAX(a - prev), 4) AS agg_value FROM (SELECT a, " +
        "LAG(a) OVER (ORDER BY a) AS prev FROM (SELECT AVG(score) AS a " +
        "FROM scores GROUP BY course_id) t) u WHERE prev IS NOT NULL",
      "ranked_agg_max_gap"),
    EvalCase("the number of students whose course set is contained in another student's",
      "SELECT COUNT(DISTINCT s1) AS agg_value FROM (SELECT a.student_id " +
        "AS s1, b.student_id AS s2, COUNT(*) AS shared FROM scores a " +
        "JOIN scores b ON a.course_id = b.course_id " +
        "AND a.student_id <> b.student_id " +
        "GROUP BY a.student_id, b.student_id) p " +
        "JOIN (SELECT student_id, COUNT(*) AS n FROM scores " +
        "GROUP BY student_id) c1 ON c1.student_id = p.s1 " +
        "WHERE p.shared = c1.n", "course_subset_count"),
    // --- round-10bo open cases, closed in round 10bp (period pair
    //     overlap, removal impact count, group entropy argmax) ---
    EvalCase("the pair of years with the most students in common",
      "SELECT y1, y2 FROM (SELECT a.year AS y1, b.year AS y2, " +
        "COUNT(*) AS n FROM (SELECT DISTINCT student_id, year " +
        "FROM scores) a JOIN (SELECT DISTINCT student_id, year " +
        "FROM scores) b ON a.student_id = b.student_id AND a.year < b.year " +
        "GROUP BY a.year, b.year) t ORDER BY n DESC, y1, y2 LIMIT 1",
      "period_pair_overlap_argmax"),
    EvalCase("how many courses would lose at least a quarter of their students if ninth graders left",
      "SELECT COUNT(*) AS agg_value FROM (SELECT s.course_id FROM " +
        "scores s JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.course_id HAVING CAST(SUM(CASE WHEN " +
        "st.grade_level = 9 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) " +
        ">= 0.25) t", "removal_impact_count"),
    EvalCase("the course with the most even spread of scores across grade letters",
      "SELECT course_id FROM (SELECT course_id, -SUM(p * LN(p)) AS e " +
        "FROM (SELECT course_id, CAST(COUNT(*) AS DOUBLE) / " +
        "SUM(COUNT(*)) OVER (PARTITION BY course_id) AS p FROM scores " +
        "GROUP BY course_id, grade) t GROUP BY course_id) u " +
        "ORDER BY e DESC, course_id LIMIT 1", "group_entropy_argmax"),
    // --- round-10bp open cases, closed in round 10bq (value run
    //     length, best-attribute distribution, conditional cohort
    //     probability) ---
    EvalCase("the longest stretch of consecutive score values with no gaps",
      "WITH d AS (SELECT DISTINCT score FROM scores), " +
        "g AS (SELECT score, score - ROW_NUMBER() OVER (ORDER BY score) " +
        "AS grp FROM d) " +
        "SELECT MAX(c) AS agg_value FROM (SELECT COUNT(*) AS c FROM g " +
        "GROUP BY grp) t", "value_run_length"),
    EvalCase("for each student the department they perform best in, tallied by department",
      "WITH da AS (SELECT s.student_id, c.dept, AVG(s.score) AS a " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id, c.dept), " +
        "b AS (SELECT student_id, dept FROM (SELECT student_id, dept, " +
        "ROW_NUMBER() OVER (PARTITION BY student_id ORDER BY a DESC, " +
        "dept) AS rn FROM da) x WHERE rn = 1) " +
        "SELECT dept, COUNT(*) AS n FROM b GROUP BY dept ORDER BY dept",
      "best_dept_distribution"),
    EvalCase("the probability that a random A-grade score belongs to a ninth grader",
      "SELECT ROUND(CAST(SUM(CASE WHEN st.grade_level = 9 THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS agg_value FROM " +
        "scores s JOIN students st ON st.student_id = s.student_id " +
        "WHERE s.grade = 'A'", "conditional_cohort_prob"),
    // --- round-10bq open cases, closed in round 10br (cohort Jaccard
    //     average, value attribute-range argmax, cross-cohort overlap) ---
    EvalCase("the average Jaccard similarity between course sets of same-grade students sharing at least one course",
      "WITH p AS (SELECT a.student_id AS s1, b.student_id AS s2, " +
        "COUNT(*) AS inter FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "JOIN students st1 ON st1.student_id = a.student_id " +
        "JOIN students st2 ON st2.student_id = b.student_id " +
        "WHERE st1.grade_level = st2.grade_level " +
        "GROUP BY a.student_id, b.student_id), " +
        "n AS (SELECT student_id, COUNT(*) AS cnt FROM scores " +
        "GROUP BY student_id) " +
        "SELECT ROUND(AVG(CAST(inter AS DOUBLE) / " +
        "(n1.cnt + n2.cnt - inter)), 4) AS agg_value FROM p " +
        "JOIN n n1 ON n1.student_id = p.s1 " +
        "JOIN n n2 ON n2.student_id = p.s2", "cohort_jaccard_avg"),
    EvalCase("the grade letter whose holders have the widest age range",
      "SELECT g FROM (SELECT s.grade AS g, MAX(st.age) - MIN(st.age) " +
        "AS r FROM scores s JOIN students st " +
        "ON st.student_id = s.student_id GROUP BY s.grade) t " +
        "ORDER BY r DESC, g LIMIT 1", "value_attr_range_argmax"),
    EvalCase("the expected number of shared courses between two students from different grade levels",
      "WITH p AS (SELECT a.student_id AS s1, b.student_id AS s2, " +
        "COUNT(*) AS c FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "GROUP BY a.student_id, b.student_id), " +
        "pairs AS (SELECT st1.student_id AS s1, st2.student_id AS s2 " +
        "FROM students st1 JOIN students st2 " +
        "ON st1.student_id < st2.student_id " +
        "AND st1.grade_level <> st2.grade_level) " +
        "SELECT ROUND(CAST(SUM(COALESCE(p.c, 0)) AS DOUBLE) / COUNT(*), 4) " +
        "AS agg_value FROM pairs LEFT JOIN p ON p.s1 = pairs.s1 " +
        "AND p.s2 = pairs.s2", "cross_cohort_avg_overlap"),
    // --- round-10br open cases, closed in round 10bs (group CV argmax,
    //     exact-overlap pair count, best-matches-popular share) ---
    EvalCase("the course in which scores are most spread out relative to their average",
      "SELECT course_id FROM (SELECT course_id, STDDEV_POP(score) / " +
        "AVG(score) AS cv FROM scores GROUP BY course_id) t " +
        "ORDER BY cv DESC, course_id LIMIT 1", "group_cv_argmax"),
    EvalCase("how many student pairs share exactly one course",
      "SELECT COUNT(*) AS agg_value FROM (SELECT a.student_id, " +
        "b.student_id AS s2 FROM scores a JOIN scores b " +
        "ON a.course_id = b.course_id AND a.student_id < b.student_id " +
        "GROUP BY a.student_id, b.student_id HAVING COUNT(*) = 1) t",
      "exact_overlap_pair_count"),
    EvalCase("the share of students whose best department matches their grade level's most popular department",
      "WITH da AS (SELECT s.student_id, c.dept, AVG(s.score) AS a " +
        "FROM scores s JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY s.student_id, c.dept), " +
        "best AS (SELECT student_id, dept FROM (SELECT student_id, dept, " +
        "ROW_NUMBER() OVER (PARTITION BY student_id ORDER BY a DESC, " +
        "dept) AS rn FROM da) x WHERE rn = 1), " +
        "pop AS (SELECT gl, dept FROM (SELECT st.grade_level AS gl, " +
        "c.dept, ROW_NUMBER() OVER (PARTITION BY st.grade_level " +
        "ORDER BY COUNT(*) DESC, c.dept) AS rn FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "JOIN courses c ON c.course_id = s.course_id " +
        "GROUP BY st.grade_level, c.dept) y WHERE rn = 1) " +
        "SELECT ROUND(CAST(SUM(CASE WHEN b.dept = pop.dept THEN 1 " +
        "ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS agg_value FROM best b " +
        "JOIN students st ON st.student_id = b.student_id " +
        "JOIN pop ON pop.gl = st.grade_level",
      "best_matches_popular_share"),
    // --- round-10bs open cases, closed in round 10bt (Pareto count,
    //     median attribute range, nearest-to-average attribute) ---
    EvalCase("the smallest number of courses that together account for half of all scores",
      "WITH n AS (SELECT course_id, COUNT(*) AS c FROM scores " +
        "GROUP BY course_id), " +
        "r AS (SELECT course_id, c, SUM(c) OVER (ORDER BY c DESC, " +
        "course_id ROWS UNBOUNDED PRECEDING) AS cum, SUM(c) OVER () " +
        "AS tot FROM n) " +
        "SELECT COUNT(*) AS agg_value FROM r WHERE cum - c < tot / 2.0",
      "pareto_count"),
    EvalCase("the median of the per-department score ranges",
      "SELECT CAST(MEDIAN(r) AS DOUBLE) AS agg_value FROM (SELECT " +
        "c.dept, MAX(s.score) - MIN(s.score) AS r FROM scores s " +
        "JOIN courses c ON c.course_id = s.course_id GROUP BY c.dept) t",
      "median_attr_range"),
    EvalCase("the age of the top-half performer closest to the overall average age",
      "WITH q AS (SELECT student_id FROM (SELECT student_id, " +
        "PERCENT_RANK() OVER (ORDER BY a DESC) AS pr FROM (SELECT " +
        "student_id, AVG(score) AS a FROM scores GROUP BY student_id) x) " +
        "y WHERE pr <= 0.5) " +
        "SELECT age FROM students st JOIN q ON q.student_id = st.student_id " +
        "ORDER BY ABS(st.age - (SELECT AVG(age) FROM students)), " +
        "st.student_id LIMIT 1", "nearest_avg_attr"),
    // --- open headroom (capabilities not yet in the template layer;
    //     these keep the metric unsaturated so rounds show movement) ---
    EvalCase("the proportion of courses where the top scorer is older than the course's average age",
      "WITH top AS (SELECT course_id, student_id FROM (SELECT course_id, " +
        "student_id, ROW_NUMBER() OVER (PARTITION BY course_id " +
        "ORDER BY score DESC, student_id) AS rn FROM scores) t " +
        "WHERE rn = 1), " +
        "ca AS (SELECT s.course_id, AVG(st.age) AS aa FROM scores s " +
        "JOIN students st ON st.student_id = s.student_id " +
        "GROUP BY s.course_id) " +
        "SELECT ROUND(CAST(SUM(CASE WHEN st.age > ca.aa THEN 1 ELSE 0 " +
        "END) AS DOUBLE) / COUNT(*), 4) AS agg_value FROM top " +
        "JOIN students st ON st.student_id = top.student_id " +
        "JOIN ca ON ca.course_id = top.course_id",
      "argmax_attr_vs_mean_share"),
    // --- round-12: the two shapes below left open headroom; closed by
    //     template_universal_period_count / template_abs_period_delta ---
    EvalCase("the number of departments where every year's average score was above 70",
      "SELECT COUNT(*) AS agg_value FROM (SELECT dept FROM (SELECT " +
        "c.dept, s.year, AVG(s.score) AS a FROM scores s JOIN courses c " +
        "ON c.course_id = s.course_id GROUP BY c.dept, s.year) x " +
        "GROUP BY dept HAVING MIN(CASE WHEN a > 70 THEN 1 ELSE 0 END) " +
        "= 1) u", "attr_period_universal_count"),
    EvalCase("the mean absolute change in each course's average between 2022 and 2023",
      "SELECT ROUND(AVG(ABS(d)), 4) AS agg_value FROM (SELECT course_id, " +
        "AVG(CASE WHEN year = 2023 THEN score END) - " +
        "AVG(CASE WHEN year = 2022 THEN score END) AS d FROM scores " +
        "WHERE year IN (2022, 2023) GROUP BY course_id) t " +
        "WHERE d IS NOT NULL", "avg_abs_period_delta"),
    // --- open headroom (capabilities not yet in the template layer;
    //     replenished in round 12 so the metric stays unsaturated) ---
    EvalCase("the correlation between score and student age",
      "SELECT ROUND(CORR(sc.score, st.age), 4) AS agg_value FROM scores sc " +
        "JOIN students st ON st.student_id = sc.student_id", "corr_attr"),
    EvalCase("students whose scores vary less than their department's typical spread",
      "WITH sv AS (SELECT sc.student_id, STDDEV_SAMP(sc.score) AS sd, " +
        "MIN(c.dept) AS dept FROM scores sc JOIN courses c " +
        "ON c.course_id = sc.course_id GROUP BY sc.student_id " +
        "HAVING COUNT(*) > 1), " +
        "dv AS (SELECT dept, AVG(sd) AS dsd FROM sv GROUP BY dept) " +
        "SELECT st.student_name FROM sv JOIN dv ON dv.dept = sv.dept " +
        "JOIN students st ON st.student_id = sv.student_id " +
        "WHERE sv.sd < dv.dsd ORDER BY st.student_name LIMIT 100",
      "stddev_vs_group"))
}
