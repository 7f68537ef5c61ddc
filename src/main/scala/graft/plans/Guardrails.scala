package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedExecuteImmediate
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, CompoundBody, InsertIntoDir, LogicalPlan}

/**
 * Session-level read-only guardrail (defense in depth under
 * `safety/Validator` — V3's statement denylist enforced a second time at
 * ANALYSIS, inside Catalyst, where it cannot be bypassed by calling
 * `spark.sql` directly instead of going through the engine).
 *
 * Registered by [[GraftExtensions]] as an analyzer check rule; inert
 * unless the session sets `spark.graft.readOnly=true`, so view
 * registration and test setup (which execute CreateViewCommand etc.)
 * are unaffected by default.
 */
class ReadOnlyGuard(session: SparkSession) extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = {
    val readOnly =
      try session.conf.get("spark.graft.readOnly", "false") == "true"
      catch { case _: Exception => false }
    if (readOnly) {
      // the DEEP variant: reflection hiding inside a scalar-subquery
      // expression is invisible to a children-only walk (round-16
      // self-review — the Executor path had the deep scan, this rule
      // still had the shallow one)
      ReadOnlyGuard.firstOffenseDeep(plan).foreach { what =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            s"read-only session (spark.graft.readOnly=true): $what is not allowed"))
      }
    }
  }
}

object ReadOnlyGuard {
  /** The write/escape-hatch scan, on the RESOLVED plan. Shared between
    * the analyzer rule above and [[graft.exec.Executor]], which runs it
    * directly on every analyzed plan it executes — so the resolved-
    * expression layer engages on the engine's own path even when a
    * caller built the session without `GraftExtensions` (the round-15
    * `try_reflect` bypass: the parse-time NAME denylist missed an alias,
    * and nothing on the default path ever consulted this layer). */
  def firstOffense(plan: LogicalPlan): Option[String] =
    plan.collectFirst {
      // InsertIntoDir is a filesystem write that is NOT a Command
      // (the Validator denylist and this guard both carry the case —
      // round-14 adversarial wave)
      case c: Command => c.nodeName
      case d: InsertIntoDir => d.nodeName
      // ANALYSIS-EXECUTING constructs (round-17 fuzz finding): EXECUTE
      // IMMEDIATE substitutes — and for command payloads EXECUTES — its
      // inner statement during the analyzer's resolution batches, and a
      // SQL-scripting CompoundBody runs its whole body at analysis; by
      // the time an analyzer CHECK rule (or any post-analysis scan)
      // sees the plan, the payload already ran and only an opaque
      // CommandResult/LocalRelation remains. They are flaggable ONLY on
      // the PARSED plan, which is why [[ReadOnlyParserGuard]] denies
      // them at parse time; matched here too so pre-analysis scans name
      // them.
      case e: UnresolvedExecuteImmediate => e.nodeName
      case b: CompoundBody => b.nodeName
      // reflect()/java_method()/try_reflect() invoke arbitrary static
      // Java methods — an exfiltration/execution escape hatch inside a
      // "SELECT" (round-15 adversarial wave). Matching the RESOLVED
      // CallMethodViaReflection expression catches every registry alias
      // at once, including ones a future Spark adds — the name-based
      // parse-time denylist can only ever chase that list.
      // (Expression.exists recurses through children, so try_reflect's
      // TryEval(CallMethodViaReflection(…)) wrapping is matched too.)
      case p if p.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.CallMethodViaReflection => true
        case _ => false
      }) => "reflect/java_method (JVM reflection)"
    }

  /** Same scan, expanded through subquery expressions: `collectFirst`
    * above walks plan children only, so a reflection call hiding inside
    * a scalar subquery would be invisible to it. The Executor uses this
    * exhaustive form. */
  def firstOffenseDeep(plan: LogicalPlan): Option[String] = {
    val subplans = plan.collectWithSubqueries { case p => p }
    subplans.iterator.flatMap(p => firstOffense(p)).nextOption()
  }
}

/**
 * PARSE-TIME read-only guard (round-17 fuzz finding — a REAL hole in
 * the session-level contract): `EXECUTE IMMEDIATE '<command>'` and SQL
 * scripting (`BEGIN …; END`) run their payload DURING ANALYSIS — the
 * fuzz probe watched `executePlan(…).analyzed` change
 * `spark.sql.shuffle.partitions` and attempt an ADD JAR — so the
 * analyzer CHECK rule ([[ReadOnlyGuard]]) fires only after the damage
 * is done. The only layer that sees these constructs before anything
 * executes is the PARSER, so a read-only session denies them right
 * there, as a class (the Validator's parse-time denial rationale:
 * statically un-vettable means deny, not vet).
 *
 * Inert unless `spark.graft.readOnly=true`, like the check rule; every
 * other parse shape (including plain Commands, which analysis does NOT
 * execute) flows through untouched and stays the check rule's job.
 */
class ReadOnlyParserGuard(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  private def readOnly: Boolean =
    try session.conf.get("spark.graft.readOnly", "false") == "true"
    catch { case _: Exception => false }

  /** Deep scan, not a top-level match (round-18 entry-point wave): the
    * analysis-executing node can sit BELOW the root — `BEGIN EXECUTE
    * IMMEDIATE '…'; END` parses to a CompoundBody whose child
    * SingleStatement carries the UnresolvedExecuteImmediate, and nested
    * scripting nests CompoundBody under CompoundBody. Today every such
    * carrier is itself a guarded root (ProbeParserEntries: CTE bodies,
    * subqueries, EXISTS and scalar positions all REJECT these
    * productions at the grammar), so the traversal is defense in depth
    * against a future grammar production re-rooting them.
    * collectWithSubqueries, not collectFirst: plain collect walks plan
    * children only, and the seam this guard exists for is exactly a
    * construct hiding inside a subquery EXPRESSION (the firstOffenseDeep
    * lesson above). */
  private def analysisExecuting(plan: LogicalPlan): Option[String] =
    plan.collectWithSubqueries {
      case p: UnresolvedExecuteImmediate => p.nodeName
      case p: CompoundBody => p.nodeName
    }.headOption

  private def deny(sqlText: String, nodeName: String): Nothing =
    throw new org.apache.spark.sql.catalyst.parser.ParseException(
      Option(sqlText),
      org.apache.spark.sql.catalyst.trees.Origin(),
      "_LEGACY_ERROR_TEMP_0035",
      Map("message" ->
        (s"read-only session (spark.graft.readOnly=true): $nodeName " +
          "executes its payload during analysis and is denied at parse time")))

  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = delegate.parsePlan(sqlText)
    if (readOnly) analysisExecuting(plan).foreach(deny(sqlText, _))
    plan
  }

  /** parseQuery rejects these productions grammatically (they are not
    * query-shaped), but it is a public entry other components call —
    * guard it identically so a grammar change cannot reopen the seam. */
  override def parseQuery(sqlText: String): LogicalPlan = {
    val plan = delegate.parseQuery(sqlText)
    if (readOnly) analysisExecuting(plan).foreach(deny(sqlText, _))
    plan
  }
  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) = delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
}
