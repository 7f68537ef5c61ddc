package graft.safety

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.catalyst.plans.logical._
import graft.core.{EngineError, ParseError, SqlSafetyError}

/**
 * SQL safety validation — the reference's "planner" layer (V1–V8 in
 * SURVEY.md §2.8), re-implemented over Catalyst logical plans instead of
 * sqlglot ASTs (ref: `app/ai/nl2sql.py:87-316`).
 *
 * Pipeline: extract SQL text → parse (`sqlParser.parsePlan`) →
 * statement-kind denylist → table allow-list → LIMIT-present check →
 * structure checks. LIMIT *injection* happens at the execution layer
 * (`Executor`) via `df.limit(n)` when `needsLimit` — semantically
 * identical to the reference's AST rewrite (nl2sql.py:299-306) without
 * re-rendering SQL.
 */
object Validator {

  /** Tokens that mark a line as "still SQL" during extraction
    * (ref token list: nl2sql.py:104-127). */
  private val sqlTokens = Seq(
    "select", "from", "where", "join", "on", "group", "order", "by", "having",
    "limit", "offset", "union", "with", "case", "when", "then", "else", "end",
    "and", "or", "not", "in", "exists", "between", "like", "ilike", "is",
    "null", "distinct", "as", "asc", "desc", "inner", "left", "right", "full",
    "outer", "cross", "count", "sum", "avg", "min", "max", "over", "partition")

  /**
   * Extract a SQL statement from raw LLM output: strip markdown fences,
   * start at the first SELECT/WITH, keep lines while they look like SQL,
   * stop at prose or `;` (ref: nl2sql.py:87-138).
   */
  def extractSql(raw: String): Option[String] = {
    val noFences = raw.linesIterator.filterNot(_.trim.startsWith("```")).mkString("\n")
    val lines = noFences.linesIterator.toVector
    val start = lines.indexWhere { l =>
      val t = l.trim.toLowerCase
      t.startsWith("select") || t.startsWith("with")
    }
    if (start < 0) return None
    val sb = new StringBuilder
    var done = false
    for (line <- lines.drop(start) if !done) {
      val t = line.trim
      val lower = t.toLowerCase
      val words = lower.split("[^a-z_*]+").filter(_.nonEmpty)
      val looksSql = sb.isEmpty || t.isEmpty ||
        words.isEmpty || words.exists(sqlTokens.contains) ||
        t.startsWith("(") || t.startsWith(")")
      if (!looksSql) done = true
      else {
        val cut = t.indexOf(';')
        if (cut >= 0) { sb.append(t.substring(0, cut)).append(' '); done = true }
        else sb.append(t).append(' ')
      }
    }
    val sql = sb.toString.trim
    if (sql.isEmpty) None else Some(sql)
  }

  /** Parse SQL into an (unresolved) logical plan; parse failure is a
    * safety error, as in the reference (nl2sql.py:280-286). */
  def parse(spark: SparkSession, sql: String): Either[EngineError, LogicalPlan] =
    try Right(spark.sessionState.sqlParser.parsePlan(sql))
    catch {
      case e: ParseException => Left(ParseError(s"SQL parse failed: ${e.getMessage.take(500)}"))
      case e: Exception => Left(ParseError(s"SQL parse failed: ${e.getMessage}"))
    }

  /**
   * Statement-kind denylist (V3, ref nl2sql.py:176,285-290): reject any
   * DDL/DML — only pure query plans are admitted. In Catalyst terms: the
   * root must not be a `Command` (covers CREATE/DROP/ALTER/TRUNCATE/…)
   * and no node anywhere may be an INSERT/UPDATE/DELETE/MERGE.
   */
  def ensureSelectOnly(plan: LogicalPlan): Either[EngineError, Unit] = {
    def deny(reason: String) = Left(SqlSafetyError(s"Only read-only SELECT statements are allowed: $reason"))
    plan match {
      case _: Command => deny("DDL/utility command")
      case _ =>
        // defense-in-depth: expand CTE bodies and subquery plans too
        // (Spark's parser does not currently admit DML there, but the
        // denylist must not depend on that staying true)
        val bad = withCteDefs(plan).flatMap(_.collectWithSubqueries {
          case _: InsertIntoStatement => "INSERT"
          // NOT an InsertIntoStatement and NOT a Command: the
          // round-14 adversarial wave found `INSERT OVERWRITE
          // DIRECTORY '/path' SELECT …` parses to this plain
          // UnaryNode and walked straight through — a filesystem
          // write/exfiltration as a "select"
          case _: InsertIntoDir => "INSERT OVERWRITE DIRECTORY"
          // dynamic SQL is statically UN-VETTABLE: the payload string
          // (`EXECUTE IMMEDIATE 'DROP TABLE …'` — or a SELECT over a
          // forbidden table) is opaque to the denylist and allow-list
          // both, so the construct is denied outright (same round-14
          // wave; Spark 4 feature, also not a Command)
          case _: org.apache.spark.sql.catalyst.analysis.UnresolvedExecuteImmediate =>
            "EXECUTE IMMEDIATE"
          // IDENTIFIER('sup' || 'plier') parses to a deferred-name node
          // whose relation name is INVISIBLE to referencedTables — the
          // round-15 wave read a forbidden table straight through the
          // allow-list with it. Dynamic names are the same class as
          // dynamic SQL: statically un-vettable, denied outright
          // (write the literal name instead).
          case _: org.apache.spark.sql.catalyst.analysis.PlanWithUnresolvedIdentifier =>
            "IDENTIFIER() dynamic name"
          case _: UpdateTable => "UPDATE"
          case _: DeleteFromTable => "DELETE"
          case _: MergeIntoTable => "MERGE"
          case c: Command => c.nodeName
        }).headOption
        bad match {
          case Some(kind) => deny(kind)
          case None => Right(())
        }
    }
  }

  /** The plan plus every CTE DEFINITION body, recursively. A parsed
    * `UnresolvedWith` is a UnaryNode whose only child is the main query
    * — its `cteRelations` hang OUTSIDE `children`, so neither `collect`
    * nor `collectWithSubqueries` ever enters a WITH body. Before round 9
    * that made everything inside a CTE invisible to every check below:
    * `WITH g AS (SELECT * FROM forbidden) SELECT * FROM g` walked
    * straight through the table allow-list (the same bypass class the
    * round-5 subquery-expression fix closed), and an aggregate defined
    * in a CTE failed the aggregation requirement. Every traversal-based
    * check now expands through this helper. */
  private def withCteDefs(plan: LogicalPlan): Seq[LogicalPlan] = {
    val defs = plan.collectWithSubqueries {
      case w: UnresolvedWith => w.cteRelations.map(_._2: LogicalPlan)
    }.flatten
    plan +: defs.flatMap(withCteDefs)
  }

  /** All base relations referenced by the plan, minus CTE-defined names
    * (sqlglot's find_all(exp.Table) analogue — ref nl2sql.py:292-313). */
  def referencedTables(plan: LogicalPlan): Set[String] = {
    // collectWithSubqueries descends into plans held by subquery
    // EXPRESSIONS (ScalarSubquery / InSubquery / Exists) — plain
    // `collect` visits plan children only, which made
    // `WHERE x IN (SELECT y FROM forbidden_table)` invisible to the
    // allow-list (a validation bypass); withCteDefs additionally
    // expands WITH bodies (the same bypass through a CTE)
    val plans = withCteDefs(plan)
    val cteNames = plans.flatMap(_.collectWithSubqueries {
      case w: UnresolvedWith => w.cteRelations.map(_._1.toLowerCase)
    }.flatten).toSet
    // the FULL dotted name, not the last part: the allow-list gates
    // single-part registered views, and matching on `.last` let a
    // QUALIFIED reference (`other_catalog.schema.customer`,
    // `global_temp.customer`) pass as "customer" while resolving to a
    // DIFFERENT relation than the one the allow-list vetted
    // (round-14 adversarial wave)
    plans.flatMap(_.collectWithSubqueries {
      case r: UnresolvedRelation =>
        r.multipartIdentifier.map(_.toLowerCase).mkString(".")
    }).toSet -- cteNames
  }

  /** Expression-level escape hatches (round-15 adversarial wave). Two
    * classes, both denied outright:
    *
    * 1. `reflect` / `java_method` invoke ARBITRARY static Java methods
    *    from inside a "read-only SELECT" — the probe exfiltrated
    *    `System.getenv` through the full validation chain. No analytic
    *    query needs JVM reflection; denied by name at parse time (and
    *    the analysis-time guard denies the resolved
    *    `CallMethodViaReflection` expression as the second layer).
    * 2. `IDENTIFIER(expr)` as a column/function name — the same
    *    dynamic-name evasion as the relation form: `IDENTIFIER('refl'
    *    || 'ect')(...)` would dodge a name denylist, so the deferred-
    *    identifier EXPRESSION node is denied wherever it appears.
    */
  private val deniedFunctions = Set("reflect", "java_method", "try_reflect")

  def ensureNoEscapeHatches(plan: LogicalPlan): Either[EngineError, Unit] = {
    val bad = allExpressions(plan).flatMap(_.collectFirst {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if deniedFunctions.contains(f.nameParts.last.toLowerCase) =>
        s"function ${f.nameParts.mkString(".")}"
      case _: org.apache.spark.sql.catalyst.analysis.ExpressionWithUnresolvedIdentifier =>
        "IDENTIFIER() dynamic name"
      // parameter markers (`:name` / `?`) can never bind on this path —
      // the engine passes no args — so before round 16 they VALIDATED
      // and then died at runtime with UNBOUND_SQL_PARAMETER. Denied
      // statically instead: a marker is a hole for whatever a future
      // args-passing caller would substitute, the same statically-
      // un-vettable class as EXECUTE IMMEDIATE (r15 verdict #7 wave).
      case _: org.apache.spark.sql.catalyst.analysis.Parameter =>
        "parameter marker (:name / ?)"
    }).headOption
    bad match {
      case Some(kind) =>
        Left(SqlSafetyError(s"Statically un-vettable construct: $kind is not allowed"))
      case None => Right(())
    }
  }

  /** Table-valued functions sit OUTSIDE the table allow-list (an
    * `UnresolvedTableValuedFunction` is not an `UnresolvedRelation`, so
    * `referencedTables` never sees it). Today every TVF Spark 4 ships
    * in FROM position is a pure generator over its literal arguments —
    * but vetting must not depend on that staying true (the r14/r15
    * holes were all "new node types the denylist didn't know"), so the
    * check is an ALLOW-list of known generators: anything else — e.g. a
    * future file-reading TVF — is denied by default (r15 verdict #7). */
  private val allowedTvfs = Set(
    "range", "explode", "explode_outer", "posexplode", "posexplode_outer",
    "inline", "inline_outer", "stack", "json_tuple", "variant_explode",
    "variant_explode_outer")

  def ensureTvfsAllowed(plan: LogicalPlan): Either[EngineError, Unit] = {
    val bad = withCteDefs(plan).flatMap(_.collectWithSubqueries {
      // name is multipart; a qualified spelling (`builtin.range`) must
      // not dodge the allow-list, so the FULL dotted name is matched
      // (single-part "range" allows, anything qualified denies — the
      // engine's own surface only ever emits single-part generators)
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
        if !allowedTvfs.contains(f.name.map(_.toLowerCase).mkString(".")) =>
        f.name.mkString(".")
    }).headOption
    bad match {
      case Some(name) =>
        Left(SqlSafetyError(s"Table-valued function not allowed: $name"))
      case None => Right(())
    }
  }

  /** Table allow-list (V4, ref nl2sql.py:292-313). */
  def ensureTablesAllowed(plan: LogicalPlan, allowed: Set[String]): Either[EngineError, Unit] = {
    val allowedLower = allowed.map(_.toLowerCase)
    val refs = referencedTables(plan)
    val illegal = refs -- allowedLower
    if (illegal.nonEmpty)
      Left(SqlSafetyError(s"Tables not allowed: ${illegal.toSeq.sorted.mkString(", ")}"))
    else Right(())
  }

  /** Does the plan already cap result cardinality at the top? Unwraps one
    * subquery/CTE level like the reference (nl2sql.py:299-306). */
  def hasTopLevelLimit(plan: LogicalPlan): Boolean = {
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, child) => unwrap(child)
      case w: UnresolvedWith => unwrap(w.child)
      case other => other
    }
    unwrap(plan) match {
      case _: GlobalLimit | _: LocalLimit => true
      case _ => false
    }
  }

  private def hasNode(plan: LogicalPlan)(pf: PartialFunction[LogicalPlan, Boolean]): Boolean =
    withCteDefs(plan)
      .exists(_.collectWithSubqueries(pf).headOption.getOrElse(false))

  /** Every expression in every node of the plan — INCLUDING nodes inside
    * subquery expressions (parsed plans keep aggregates as
    * UnresolvedFunction inside Project until analysis; an AVG inside a
    * scalar subquery must satisfy the aggregation requirement) and
    * inside CTE definition bodies (an AVG in a WITH clause, ditto). */
  private def allExpressions(plan: LogicalPlan) =
    withCteDefs(plan)
      .flatMap(_.collectWithSubqueries { case n => n.expressions }.flatten)

  /** Any subquery expression (scalar / IN / EXISTS) anywhere in the plan
    * — a legitimate multi-table linkage for the structure check. */
  def hasSubquery(plan: LogicalPlan): Boolean =
    allExpressions(plan).exists(_.find {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => true
      case _ => false
    }.isDefined)

  private val aggFunctionNames = Set(
    "count", "sum", "avg", "mean", "min", "max", "count_distinct",
    "approx_count_distinct", "stddev", "variance", "first", "last", "collect_list")

  def hasAggregate(plan: LogicalPlan): Boolean =
    hasNode(plan) { case _: Aggregate => true } ||
      allExpressions(plan).exists(_.find {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
          aggFunctionNames.contains(f.nameParts.last.toLowerCase)
        case _ => false
      }.isDefined)

  def hasWindow(plan: LogicalPlan): Boolean =
    allExpressions(plan).exists(_.find {
      case _: org.apache.spark.sql.catalyst.expressions.WindowExpression => true
      case _: org.apache.spark.sql.catalyst.expressions.UnresolvedWindowExpression => true
      case _ => false
    }.isDefined)

  def hasJoin(plan: LogicalPlan): Boolean = hasNode(plan) { case _: Join => true }

  def hasDistinct(plan: LogicalPlan): Boolean =
    hasNode(plan) {
      case _: Distinct => true
      case _: Deduplicate => true
      case a: Aggregate if a.aggregateExpressions == a.groupingExpressions => true
    }

  /**
   * Aggregation-requirement check (V7, ref nl2sql.py:178-219): if the
   * question demands aggregation/grouping, the plan must contain an
   * Aggregate or Window. Keyword detection lives in `link.Intent`.
   */
  def validateAggregationRequirement(plan: LogicalPlan, needsAggregation: Boolean): Either[EngineError, Unit] =
    if (needsAggregation && !hasAggregate(plan) && !hasWindow(plan))
      Left(SqlSafetyError("Question requires aggregation but SQL has no aggregate/window"))
    else Right(())

  /**
   * Structure checks (V8, ref nl2sql.py:222-278): multi-table queries must
   * join; "unique/distinct" questions must deduplicate.
   */
  def validateStructure(plan: LogicalPlan, wantsDistinct: Boolean): Either[EngineError, Unit] = {
    val tables = referencedTables(plan)
    // a subquery predicate (IN / EXISTS / scalar) IS the linkage between
    // tables — now that referencedTables sees through subqueries, the
    // anti-join and semi-join shapes must not demand a literal JOIN
    if (tables.size > 1 && !hasJoin(plan) && !hasSetOp(plan) && !hasSubquery(plan))
      Left(SqlSafetyError(s"Query references ${tables.size} tables but has no JOIN"))
    else if (wantsDistinct && !hasDistinct(plan) && !hasAggregate(plan))
      Left(SqlSafetyError("Question asks for unique values but SQL has no DISTINCT"))
    else Right(())
  }

  def hasSetOp(plan: LogicalPlan): Boolean =
    hasNode(plan) { case _: Union | _: Intersect | _: Except => true }

  /** Validation outcome: the parsed plan plus whether a LIMIT must be
    * injected at execution. */
  final case class Validated(sql: String, plan: LogicalPlan, needsLimit: Boolean)

  /** Full validation chain over raw SQL (the `/ai/run` safety path —
    * ref main.py:298-331). */
  def validate(
      spark: SparkSession,
      sql: String,
      allowedTables: Set[String],
      needsAggregation: Boolean = false,
      wantsDistinct: Boolean = false): Either[EngineError, Validated] =
    for {
      plan <- parse(spark, sql)
      _ <- ensureSelectOnly(plan)
      _ <- ensureNoEscapeHatches(plan)
      _ <- ensureTvfsAllowed(plan)
      _ <- ensureTablesAllowed(plan, allowedTables)
      _ <- validateAggregationRequirement(plan, needsAggregation)
      _ <- validateStructure(plan, wantsDistinct)
    } yield Validated(sql, plan, needsLimit = !hasTopLevelLimit(plan))
}
