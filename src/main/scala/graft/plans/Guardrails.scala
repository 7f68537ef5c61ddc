package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoDir, LogicalPlan}

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
