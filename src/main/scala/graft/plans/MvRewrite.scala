package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/**
 * Automatic materialized-aggregate rewrite: a Catalyst optimizer rule
 * (registered through [[GraftExtensions]]) that serves whole-table
 * grouped aggregates from a registered [[graft.operators.MaterializedAgg]]
 * state instead of re-scanning the corpus — the query-serving half of
 * incremental view maintenance. The reference recomputes every
 * aggregate per request against the live snapshot (`app/routes_ai.py:91`
 * via `app/db.py:5`); at 100 TB the same `GROUP BY` question should hit
 * the key-sized state the pipeline already maintains.
 *
 * Match contract (STRICT — anything else is left untouched, so wrong
 * answers are impossible by construction):
 *  - the aggregate's child is the registered base table itself, or a
 *    pure column-pruning Project over it (no Filter, no expressions —
 *    a WHERE clause changes the group contents and must not be served
 *    from whole-table state);
 *  - grouping expressions are exactly the MV's key attributes;
 *  - every output is a group key or a non-DISTINCT, unfiltered
 *    COUNT(*) / SUM(measure) / MIN(measure) / MAX(measure) /
 *    AVG(measure) — AVG is derived as sum/count, the others map to
 *    state columns directly.
 *
 * The rewrite preserves the original output names AND expression ids,
 * so parent operators are oblivious. Staleness is the caller's
 * contract: register the state frame kept current by
 * `MaterializedAgg.refresh` / `Streams.AggMaintainer` (re-register
 * after a refresh to advance the served snapshot — the same snapshot
 * discipline as the sketch-serving catalog).
 */
object MvCatalog {

  final case class Registered(
      baseName: String, basePlan: LogicalPlan,
      keys: Seq[String], measure: String, mvName: String)

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Seq[Registered]]()

  /** Register `state` (a [[graft.operators.MaterializedAgg.build]]/
    * `refresh` output for `baseTable` grouped by `keys` over `measure`)
    * as the serving source for matching aggregates. The state is
    * MATERIALIZED here (`localCheckpoint`) — the registered snapshot
    * must be precomputed rows, or serving would silently re-run the
    * aggregation through a lazy view; in a lakehouse deployment this is
    * the already-persisted state table. The base is remembered by its
    * optimized plan so `sameResult` sees through view/alias wrappers. */
  def register(spark: SparkSession, baseTable: String, keys: Seq[String],
      measure: String, state: DataFrame,
      mvName: String = "graft_mv_state"): Unit = {
    val cols = state.columns.map(_.toLowerCase).toSet
    val needed = keys.map(_.toLowerCase) ++ Seq("n", "sum_v", "min_v", "max_v")
    require(needed.forall(cols.contains),
      s"state must carry ${needed.mkString(", ")}; has ${state.columns.mkString(", ")}")
    state.localCheckpoint(true).createOrReplaceTempView(mvName)
    val entry = Registered(baseTable,
      spark.table(baseTable).queryExecution.optimizedPlan,
      keys, measure, mvName)
    reg.merge(spark, Seq(entry),
      (old, add) => old.filterNot(_.mvName == mvName) ++ add)
  }

  def clear(spark: SparkSession): Unit = { reg.remove(spark); () }

  def registered(spark: SparkSession): Seq[Registered] =
    reg.getOrDefault(spark, Seq.empty)
}

class MvRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val regs = MvCatalog.registered(session)
    if (regs.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        // a malformed external replacement of the MV view must break the
        // REWRITE, never the query — fall through to the plain aggregate
        regs.view.flatMap { r =>
          try rewrite(groupExprs, aggExprs, child, r)
          catch { case scala.util.control.NonFatal(_) => None }
        }.headOption.getOrElse(agg)
    }
  }

  /** The aggregate child, unwrapped of a pure column-pruning Project. */
  private def unwrap(child: LogicalPlan): Option[LogicalPlan] = child match {
    case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      Some(inner)
    case other => Some(other)
  }

  private def rewrite(groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan, r: MvCatalog.Registered): Option[LogicalPlan] = {
    val inner = unwrap(child).getOrElse(return None)
    if (!inner.sameResult(r.basePlan)) return None
    // grouping must be exactly the MV keys (attributes, no expressions)
    val groupAttrs = groupExprs.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.map(_.name.toLowerCase).toSet != r.keys.map(_.toLowerCase).toSet)
      return None

    // strip alias/view wrappers: EliminateView ran in the optimizer's
    // early batch, so a View injected NOW would reach the planner
    val mvPlan = EliminateSubqueryAliases(
      session.table(r.mvName).queryExecution.analyzed).transformUp {
      case v: View => v.child
    }
    def mvAttr(name: String): Attribute =
      mvPlan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalStateException(
          s"registered MV '${r.mvName}' is missing column '$name'"))
    def isMeasure(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.equalsIgnoreCase(r.measure)
      case _ => false
    }
    def serveAgg(fn: AggregateFunction): Option[Expression] = fn match {
      case c: Count if c.children.forall(_.isInstanceOf[Literal]) =>
        Some(mvAttr("n"))
      case s: Sum if isMeasure(s.child) => Some(mvAttr("sum_v"))
      case mn: Min if isMeasure(mn.child) => Some(mvAttr("min_v"))
      case mx: Max if isMeasure(mx.child) => Some(mvAttr("max_v"))
      case av: Average if isMeasure(av.child) =>
        Some(Divide(Cast(mvAttr("sum_v"), DoubleType), Cast(mvAttr("n"), DoubleType)))
      case _ => None
    }
    val served: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name)
        if groupAttrs.exists(_.exprId == a.exprId) =>
        Alias(mvAttr(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
        if !ae.isDistinct && ae.filter.isEmpty =>
        serveAgg(ae.aggregateFunction) match {
          case Some(e) if e.dataType == al.dataType =>
            Alias(e, name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    Some(Project(served, mvPlan))
  }
}
