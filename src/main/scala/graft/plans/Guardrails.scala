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
      // InsertIntoDir is a filesystem write that is NOT a Command
      // (the Validator denylist and this guard both carry the case —
      // round-14 adversarial wave)
      val offending = plan.collectFirst {
        case c: Command => c.nodeName
        case d: InsertIntoDir => d.nodeName
        // reflect()/java_method() invoke arbitrary static Java methods
        // — an exfiltration/execution escape hatch inside a "SELECT"
        // (round-15 adversarial wave). The Validator denies the
        // UNRESOLVED function by name; this is the second layer on the
        // RESOLVED expression, unbypassable via spark.sql directly.
        case p if p.expressions.exists(_.exists {
          case _: org.apache.spark.sql.catalyst.expressions.CallMethodViaReflection => true
          case _ => false
        }) => "reflect/java_method (JVM reflection)"
      }
      offending.foreach { what =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3100",
          messageParameters = Map("message" ->
            s"read-only session (spark.graft.readOnly=true): $what is not allowed"))
      }
    }
  }
}
