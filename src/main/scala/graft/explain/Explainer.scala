package graft.explain

import org.apache.spark.sql.catalyst.plans.logical._
import graft.safety.Validator

/**
 * Rule-based English explanation of a query (N12 in SURVEY.md §2.9; ref
 * `app/models/inference.py:337-369`) — derived from the Catalyst plan
 * rather than SQL substring scanning, which is robust to formatting.
 */
object Explainer {

  def explain(plan: LogicalPlan): String = {
    val tables = Validator.referencedTables(plan).toSeq.sorted
    val parts = collection.mutable.ListBuffer.empty[String]
    parts += (tables match {
      case Nil => "This query computes a constant result"
      case t :: Nil => s"This query reads from the $t table"
      case ts => s"This query combines data from ${ts.mkString(", ")}"
    })
    if (Validator.hasJoin(plan)) parts += "joining related rows"
    val hasFilter = plan.collectFirst { case _: Filter => true }.getOrElse(false)
    if (hasFilter) parts += "filtering rows by the given conditions"
    if (Validator.hasAggregate(plan)) parts += "aggregating values"
    val hasSort = plan.collectFirst { case _: Sort => true }.getOrElse(false)
    if (hasSort) parts += "sorting the results"
    if (Validator.hasDistinct(plan)) parts += "removing duplicates"
    val limit = plan.collectFirst {
      case GlobalLimit(lit: org.apache.spark.sql.catalyst.expressions.Literal, _) =>
        lit.value.toString
    }
    limit.foreach(n => parts += s"returning at most $n rows")
    parts.head + (if (parts.size > 1) ", " + parts.tail.mkString(", ") else "") + "."
  }
}
