package graft.eval

import graft.api.Engine
import org.apache.spark.sql.SparkSession

/**
 * EXTERNALLY-SOURCED evaluation set — questions this repo's builder did
 * NOT write, addressing the one-hand-writes-everything critique of the
 * self-authored eval ladder (the same hands authoring question, gold
 * and template measure template recall, not generalization).
 *
 * Every case carries provenance into the reference repository; the
 * classes are ordered by how external they really are, and results are
 * reported PER CLASS so the honest signal is not averaged away:
 *
 *  - `verbatim`: the reference team's published example questions,
 *    word for word (`README.md:170`, `Deliverables/Report 1/…docx` §5,
 *    `frontend/src/pages/Chat.jsx:82-87`), run against the schemas
 *    those questions were written for ([[ReferenceSchemas]], rebuilt
 *    from the reference's own crawled `metadata.json`).
 *  - `template-instantiated`: the reference's OWN training-question
 *    templates (`app/models/trainer.py:275-303` — question AND gold
 *    SQL pattern are theirs) instantiated over those schemas.
 *  - `phrase-derived`: questions composed from the reference's
 *    documented user-phrasing inventory (`app/ai/query_intent.py:62-64`
 *    keyword lists, `app/ai/nl2sql.py:54-62` aggregation phrases,
 *    `nl2sql.py:75` "fcity not fromCity" hints); gold authored here.
 *    Least external — labeled as such.
 *
 * Gold answers are compared with the set-based Result-F1 the reference
 * defines for its own pilot ("Result F1 versus gold — set based
 * comparison", Report 2 §7-8); exec-success matches its "ran without
 * error". Questions whose reference gold is undefined on the fixture
 * (generic Chat.jsx prompts naming absent tables; LIMIT-10 of an
 * unordered join) are `execOnly`: the always-answer contract (V13) is
 * asserted, result overlap is not scored.
 *
 * NUMBERS ARE EXPECTED TO BE LOWER than the saturated self-authored
 * ladder — that is the point of the measurement, not a defect; see
 * COVERAGE.md "External evaluation".
 */
object ExternalEval {

  final case class ExternalCase(
      id: String, clazz: String, fixture: String, provenance: String,
      question: String, goldSql: Option[String], note: String = "")

  val cases: Seq[ExternalCase] = Seq(
    // ------------------------------------------------------- verbatim
    ExternalCase("v1", "verbatim", "school", "reference README.md:170",
      "List students who received a C but have a numeric score above 75.",
      Some("SELECT s.id, s.name, e.course_id, e.term, e.year, e.grade_letter, " +
        "e.numeric_score FROM enrollments e JOIN students s ON s.id = e.student_id " +
        "WHERE e.grade_letter = 'C' AND e.numeric_score > 75 ORDER BY s.id"),
      note = "gold = the reference's own SQL (README.md:172-178) with its " +
        "join key renamed to the crawled PK (metadata.json students.id)"),
    ExternalCase("v2", "verbatim", "school",
      "reference Deliverables/Report 1 Project_Proposal §5",
      "List students who took course X in Fall 2015 with a grade of C but a score < 75.",
      Some("SELECT s.id, s.name, e.course_id, e.term, e.year, e.grade_letter, " +
        "e.numeric_score FROM enrollments e " +
        "JOIN students s ON s.id = e.student_id " +
        "JOIN courses c ON c.id = e.course_id " +
        "WHERE c.title = 'X' AND e.term = 'Fall' AND e.year = 2015 " +
        "AND e.grade_letter = 'C' AND e.numeric_score < 75 ORDER BY s.id"),
      note = "gold = the reference's own SQL (Report 1 §5) on the crawled " +
        "column names (grade_letter/numeric_score per metadata.json); the " +
        "fixture carries a course literally titled 'X'"),
    ExternalCase("v3", "verbatim", "store", "reference frontend/src/pages/Chat.jsx:84",
      "Count how many items are in each category",
      Some("SELECT category, COUNT(*) AS n FROM items GROUP BY category")),
    ExternalCase("v4", "verbatim", "store", "reference frontend/src/pages/Chat.jsx:82",
      "Show me all projects", None,
      note = "no projects table exists — pins the always-answer fallback"),
    ExternalCase("v5", "verbatim", "store", "reference frontend/src/pages/Chat.jsx:83",
      "Find documents where status is active", None,
      note = "no documents/status in this schema — always-answer fallback"),
    ExternalCase("v6", "verbatim", "store", "reference frontend/src/pages/Chat.jsx:85",
      "What are the top 10 most recent entries?", None,
      note = "'entries' names no table; recency column unspecified"),
    ExternalCase("v7", "verbatim", "store", "reference frontend/src/pages/Chat.jsx:87",
      "Find items matching a specific name or keyword", None,
      note = "items carries no name column; placeholder phrasing"),
    // -------------------------------------------- template-instantiated
    ExternalCase("t1", "template-instantiated", "school",
      "reference app/models/trainer.py:287-289",
      "How many records are in students?",
      Some("SELECT COUNT(*) AS c FROM students")),
    ExternalCase("t2", "template-instantiated", "school",
      "reference app/models/trainer.py:287-289",
      "How many records are in enrollments?",
      Some("SELECT COUNT(*) AS c FROM enrollments")),
    ExternalCase("t3", "template-instantiated", "store",
      "reference app/models/trainer.py:287-289",
      "How many records are in orders?",
      Some("SELECT COUNT(*) AS c FROM orders")),
    ExternalCase("t4", "template-instantiated", "school",
      "reference app/models/trainer.py:282-285",
      "Show me courses",
      Some("SELECT id, title, year FROM courses LIMIT 10"),
      note = "their template selects the first 5 columns LIMIT 10; courses " +
        "has 3 columns and 8 rows, so the gold is deterministic"),
    ExternalCase("t5", "template-instantiated", "school",
      "reference app/models/trainer.py:292-299",
      "Join enrollments with courses", None,
      note = "their gold is LIMIT 10 of an unordered join — result overlap " +
        "is undefined, so exec-success only"),
    // --------------------------------------------------- phrase-derived
    ExternalCase("p1", "phrase-derived", "store",
      "phrases: app/ai/nl2sql.py:56 'sum/total' + query_intent.py 'per'",
      "What is the total quantity per category?",
      Some("SELECT category, SUM(quantity) AS s FROM sales GROUP BY category")),
    ExternalCase("p2", "phrase-derived", "store",
      "phrases: app/ai/nl2sql.py:54 'average' + query_intent.py 'per'",
      "What is the average price per category?",
      Some("SELECT category, AVG(price) AS a FROM sales GROUP BY category"),
      note = "sales and items both carry category+price; gold reads sales " +
        "(the table the reference's store pilot queried)"),
    ExternalCase("p3", "phrase-derived", "store",
      "phrases: app/ai/nl2sql.py:55 'how many' + query_intent.py 'per'",
      "How many orders per customer?",
      Some("SELECT customer_id, COUNT(*) AS c FROM orders GROUP BY customer_id")),
    ExternalCase("p4", "phrase-derived", "store",
      "phrases: query_intent.py:237 'distinct/unique'",
      "List the distinct payment methods",
      Some("SELECT DISTINCT paymentmethod FROM customer")),
    ExternalCase("p5", "phrase-derived", "school",
      "phrases: query_intent.py:249 null/anti ('no', 'without')",
      "List students who have no enrollments",
      Some("SELECT s.id, s.name FROM students s WHERE s.id NOT IN " +
        "(SELECT student_id FROM enrollments)")),
    ExternalCase("p6", "phrase-derived", "travel",
      "phrases: app/ai/nl2sql.py:75 'fcity not fromCity' (from/to city questions)",
      "Show flights from Paris to Rome",
      Some("SELECT travelcode, usercode, fcity, tcity, flighttype, fprice, " +
        "time, distance, agency, fdate FROM flights " +
        "WHERE fcity = 'Paris' AND tcity = 'Rome'")),
    ExternalCase("p7", "phrase-derived", "travel",
      "phrases: app/ai/nl2sql.py:54 'average' + query_intent.py 'per'",
      "What is the average hotel price per place?",
      Some("SELECT place, AVG(hprice) AS a FROM hotels GROUP BY place")),
    ExternalCase("p8", "phrase-derived", "travel",
      "phrases: query_intent.py:225 ranking ('top N by')",
      "Top 5 users by total flight price",
      Some("SELECT usercode, SUM(fprice) AS s FROM flights GROUP BY usercode " +
        "ORDER BY s DESC LIMIT 5")),
    // ------------------------------------------------------ paraphrase
    // Robustness probes for the shapes the verbatim questions demanded:
    // REWORDINGS of the reference's published pilot questions (content
    // theirs, wording here — the class exists to show the general
    // mechanisms aren't overfit to the two published sentences)
    ExternalCase("r1", "paraphrase", "school",
      "paraphrase of reference README.md:170 (content theirs, wording varied)",
      "Show students that got a C with a numeric score over 75",
      Some("SELECT s.id, s.name, e.course_id, e.term, e.year, e.grade_letter, " +
        "e.numeric_score FROM enrollments e JOIN students s ON s.id = e.student_id " +
        "WHERE e.grade_letter = 'C' AND e.numeric_score > 75 ORDER BY s.id")),
    ExternalCase("r2", "paraphrase", "school",
      "paraphrase of reference README.md:170 (different letter and bound)",
      "List students who received a B but have a numeric score above 85.",
      Some("SELECT s.id, s.name, e.course_id, e.term, e.year, e.grade_letter, " +
        "e.numeric_score FROM enrollments e JOIN students s ON s.id = e.student_id " +
        "WHERE e.grade_letter = 'B' AND e.numeric_score > 85 ORDER BY s.id")),
    ExternalCase("r3", "paraphrase", "school",
      "paraphrase of reference Report 1 §5 (dimension literal + comparator)",
      "Which students scored below 60 in Biology?",
      Some("SELECT s.id, s.name, e.course_id, e.term, e.year, e.grade_letter, " +
        "e.numeric_score FROM enrollments e " +
        "JOIN students s ON s.id = e.student_id " +
        "JOIN courses c ON c.id = e.course_id " +
        "WHERE c.title = 'Biology' AND e.numeric_score < 60 ORDER BY s.id")),
    ExternalCase("r4", "paraphrase", "school",
      "paraphrase of the anti-join phrasing (p5) with a trailing modifier",
      "students who have no enrollments at all",
      Some("SELECT s.id, s.name FROM students s WHERE s.id NOT IN " +
        "(SELECT student_id FROM enrollments)")))

  final case class ClassStats(n: Int, execRate: Double, macroF1: Double,
      alignedF1: Double)

  final case class ExternalReport(
      n: Int, execSuccessRate: Double,
      scoredN: Int, scoredMacroF1: Double, scoredAlignedF1: Double,
      execOnlyN: Int, execOnlyAnswered: Int,
      byClass: Map[String, ClassStats],
      cases: Seq[Evaluation.CaseOutcome],
      alignedByCase: Map[String, Double] = Map.empty)

  /** Alias-insensitive set F1: [[Evaluation.resultF1]] orders columns
    * by NAME, so a value-identical result under a different output
    * alias (`agg_value` vs the gold's `s`) scores 0 — correct for the
    * self-ladder (aliases are part of its contract), wrong for an
    * external set where the reference's own metric is "set based
    * comparison" of RESULTS (Report 2 §8). Here each row's cells are
    * sorted as strings before set comparison: column naming and order
    * stop mattering, row content still must match. Both numbers are
    * reported; this one is the Spider-style execution-match analogue. */
  def alignedResultF1(a: graft.core.QueryResult, b: graft.core.QueryResult): Double = {
    def rowSet(r: graft.core.QueryResult): Set[Seq[String]] =
      r.rows.map(row => row.map(String.valueOf(_)).sorted).toSet
    val (sa, sb) = (rowSet(a), rowSet(b))
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = (sa intersect sb).size.toDouble
    val p = inter / sa.size
    val rc = inter / sb.size
    if (p + rc == 0) 0.0 else 2 * p * rc / (p + rc)
  }

  private def engineFor(spark: SparkSession, fixture: String): Engine = fixture match {
    case "school" =>
      new Engine(spark, ReferenceSchemas.registerSchool(spark), ReferenceSchemas.schoolFks)
    case "store" =>
      new Engine(spark, ReferenceSchemas.registerStore(spark), ReferenceSchemas.storeFks)
    case "travel" =>
      new Engine(spark, ReferenceSchemas.registerTravel(spark), ReferenceSchemas.travelFks)
    case other => sys.error(s"unknown fixture $other")
  }

  /** Run the full external set. Each fixture gets its own ISOLATED
    * session (`newSession()` — separate temp-view catalog on the shared
    * context): the reference's crawled table names (`orders`,
    * `customer`) collide with the TPC-H fixture views, and registering
    * them on the caller's session would clobber every later query
    * against the memoized fixture registry. */
  def run(spark: SparkSession): ExternalReport = {
    val engines = cases.map(_.fixture).distinct
      .map(f => f -> engineFor(spark.newSession(), f)).toMap
    val outcomes = cases.map { c =>
      val engine = engines(c.fixture)
      val t0 = System.nanoTime()
      val res = engine.ask(c.question)
      val ms = (System.nanoTime() - t0) / 1000000L
      res match {
        case Right(r) =>
          val (f1, aligned) = c.goldSql match {
            case Some(g) => engine.run(g) match {
              case Right(gold) =>
                (Evaluation.resultF1(r, gold), alignedResultF1(r, gold))
              case Left(err) => sys.error(s"gold failed for ${c.id}: ${err.message}")
            }
            case None => (Double.NaN, Double.NaN) // exec-only
          }
          (c.id, aligned,
            Evaluation.CaseOutcome(c.question, executed = true, f1, ms, r.sql, "", c.clazz))
        case Left(err) =>
          val miss = if (c.goldSql.isDefined) 0.0 else Double.NaN
          (c.id, miss,
            Evaluation.CaseOutcome(c.question, executed = false, miss, ms, "",
              err.message, c.clazz))
      }
    }
    val alignedByCase = outcomes.map { case (id, al, _) => id -> al }.toMap
    val outs = outcomes.map(_._3)
    val aligned = outcomes.map(_._2)
    val scored = outs.filterNot(_.f1.isNaN)
    val scoredAligned = aligned.filterNot(_.isNaN)
    val execOnly = outs.filter(_.f1.isNaN)
    def stats(osA: Seq[(Evaluation.CaseOutcome, Double)]) = {
      val os = osA.map(_._1)
      val s = os.filterNot(_.f1.isNaN)
      val sa = osA.map(_._2).filterNot(_.isNaN)
      ClassStats(
        os.size,
        if (os.isEmpty) 0.0 else os.count(_.executed).toDouble / os.size,
        if (s.isEmpty) Double.NaN else s.map(_.f1).sum / s.size,
        if (sa.isEmpty) Double.NaN else sa.sum / sa.size)
    }
    ExternalReport(
      n = outs.size,
      execSuccessRate = outs.count(_.executed).toDouble / outs.size,
      scoredN = scored.size,
      scoredMacroF1 = if (scored.isEmpty) 0.0 else scored.map(_.f1).sum / scored.size,
      scoredAlignedF1 =
        if (scoredAligned.isEmpty) 0.0 else scoredAligned.sum / scoredAligned.size,
      execOnlyN = execOnly.size,
      execOnlyAnswered = execOnly.count(_.executed),
      byClass = outs.zip(aligned).groupBy(_._1.intent)
        .map { case (k, os) => k -> stats(os) },
      cases = outs,
      alignedByCase = alignedByCase)
  }

  /** One-line-per-case JSON for the committed artifact. */
  def toJson(r: ExternalReport): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def f1s(v: Double) = if (v.isNaN) "null" else f"$v%.3f"
    val caseLines = cases.zip(r.cases).map { case (c, o) =>
      s"""    {"id":"${c.id}","class":"${c.clazz}","fixture":"${c.fixture}",""" +
        s""""provenance":"${esc(c.provenance)}","question":"${esc(c.question)}",""" +
        s""""gold":${c.goldSql.map(g => "\"" + esc(g) + "\"").getOrElse("null")},""" +
        s""""executed":${o.executed},"f1":${f1s(o.f1)},""" +
        s""""aligned_f1":${f1s(r.alignedByCase.getOrElse(c.id, Double.NaN))},""" +
        s""""generated_sql":"${esc(o.generatedSql)}","error":"${esc(o.error)}"}"""
    }
    val classLines = r.byClass.toSeq.sortBy(_._1).map { case (k, s) =>
      s""""$k":{"n":${s.n},"exec_rate":${f1s(s.execRate)},""" +
        s""""macro_f1":${f1s(s.macroF1)},"aligned_f1":${f1s(s.alignedF1)}}"""
    }
    s"""{
  "n": ${r.n},
  "exec_success_rate": ${f1s(r.execSuccessRate)},
  "scored_n": ${r.scoredN},
  "scored_macro_f1": ${f1s(r.scoredMacroF1)},
  "scored_aligned_f1": ${f1s(r.scoredAlignedF1)},
  "exec_only_n": ${r.execOnlyN},
  "exec_only_answered": ${r.execOnlyAnswered},
  "by_class": {${classLines.mkString(", ")}},
  "cases": [
${caseLines.mkString(",\n")}
  ]
}
"""
  }
}
