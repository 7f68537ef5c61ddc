package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/**
 * Bounded global rank (W2 surface, ref `app/ai/query_intent.py:221-230`):
 * `RANK() OVER (ORDER BY ...)` filtered by `rnk <= k`.
 *
 * A naive plan moves the WHOLE table into a single partition
 * (`WindowExec` with empty partitionSpec — the scale-killer the round-1
 * verdict flagged). Two fixes live here:
 *
 *  - [[RankLimit.globalRankTopK]] — the operator form: top-k rows via
 *    `TakeOrderedAndProject` (distributed heap merge, no shuffle of the
 *    full table), then rank = row position over the ≤ k surviving rows.
 *    No `WindowExec` appears in the plan at all.
 *  - [[BoundedRankPrefilter]] — the engine form: a Catalyst optimizer
 *    rule (registered through [[GraftExtensions]]) that bounds the
 *    window's *input* with orderBy+limit when a k-bounded global
 *    rank/row_number filter sits above it, so SQL arriving through the
 *    NL path (validated text → `spark.sql`) executes the window over
 *    ≤ k rows instead of the full table.
 *
 * Both forms assume a TOTAL ordering (the engine's templates always
 * append a unique tiebreaker, matching the reference's deterministic
 * top-k surface); with boundary ties on a partial ordering the tied
 * rows beyond position k are dropped, like LIMIT itself.
 */
object RankLimit {

  /**
   * Exact `rank() OVER (ORDER BY order) <= k` under a total ordering,
   * with no global window: TakeOrderedAndProject keeps the top k rows
   * (per-partition heaps, driver merge of k·partitions rows), then the
   * single surviving partition is locally sorted and positions assigned.
   * `monotonically_increasing_id` on partition 0 yields 0..n-1 in row
   * order, so rank = id + 1.
   */
  def globalRankTopK(df: DataFrame, order: Seq[Column], k: Int, rankCol: String = "rnk"): DataFrame = {
    require(k > 0, "k must be positive")
    df.orderBy(order: _*).limit(k)
      .coalesce(1)
      .sortWithinPartitions(order: _*)
      .withColumn(rankCol, (monotonically_increasing_id() + 1).cast("int"))
  }

  /**
   * Exact per-group top-k: `row_number() OVER (PARTITION BY groups
   * ORDER BY order) <= k`, the grouped sibling of [[globalRankTopK]]
   * (ref `app/ai/nl2sql.py:197` — a window satisfies the reference's
   * aggregation contract; the NL surface's grouped top-k shape emits
   * this form). Callers must pass a total `order` (a unique tie-break
   * last) for deterministic output.
   *
   * Scale shape: one shuffle on the group keys, and Spark's
   * WindowGroupLimit pushdown inserts per-partition top-k pruning BOTH
   * before the shuffle (partial) and after (final), so per-group state
   * is bounded by k regardless of group skew — the property
   * RankLimitSpec pins on the physical plan.
   */
  def groupedTopK(df: DataFrame, groups: Seq[Column], order: Seq[Column],
      k: Int, rankCol: String = "rnk"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).where(col(rankCol) <= k)
  }
}

/**
 * Optimizer rule: `Filter(rank_attr <= k, Window(rank-like, partition=[],
 * order))` → same plan with `Limit(k, Sort(order))` injected BELOW the
 * window. The window's input shrinks from the full table to the top-k
 * rows (planned as TakeOrderedAndProject), so the single-partition
 * window touches ≤ k rows. Applies to RANK and ROW_NUMBER (DENSE_RANK
 * is excluded: its rank-k boundary admits unboundedly many rows).
 */
class BoundedRankPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxBound = 100000 // don't pre-sort more than this many rows

  private def isRankLike(e: Expression): Boolean = e match {
    case _: Rank | _: RowNumber => true
    case _ => false
  }

  /** Extract the upper bound on `attr` from the filter's conjuncts. */
  private def bound(cond: Expression, rankId: ExprId): Option[Int] =
    splitConjunctivePredicates(cond).collectFirst {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.exprId == rankId => k
      case LessThan(a: Attribute, Literal(k: Int, _)) if a.exprId == rankId => k - 1
      case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute) if a.exprId == rankId => k
      case GreaterThan(Literal(k: Int, _), a: Attribute) if a.exprId == rankId => k - 1
      case EqualTo(a: Attribute, Literal(k: Int, _)) if a.exprId == rankId => k
    }.filter(k => k > 0 && k <= MaxBound)

  private def alreadyBounded(p: LogicalPlan): Boolean = p match {
    case GlobalLimit(_, _) => true
    case LocalLimit(_, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window)
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 && !alreadyBounded(w.child) =>
      val rewritten = for {
        a <- Some(w.windowExpressions.head).collect {
          case al @ Alias(WindowExpression(fn, _), _) if isRankLike(fn) => al
        }
        k <- bound(cond, a.exprId)
      } yield f.copy(child = w.withNewChildren(
        Seq(Limit(Literal(k), Sort(w.orderSpec, global = true, w.child)))))
      rewritten.getOrElse(f)
  }
}

/**
 * Session extensions entry point: enable with
 * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
 * Injects the bounded-rank optimizer rule and the read-only session
 * guard on BOTH its layers (each inert until
 * `spark.graft.readOnly=true`): the analyzer check rule
 * ([[ReadOnlyGuard]]) for everything analysis leaves intact, and the
 * parser guard ([[ReadOnlyParserGuard]]) for the two constructs that
 * EXECUTE during analysis (EXECUTE IMMEDIATE, SQL scripting) — for
 * those, any post-parse check fires after the payload already ran
 * (round-17 fuzz finding).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new BoundedRankPrefilter)
    ext.injectOptimizerRule(_ => new NanosTimestampPushdown)
    ext.injectOptimizerRule(session => new MvRewrite(session))
    ext.injectCheckRule(session => new ReadOnlyGuard(session))
    ext.injectParser((session, delegate) => new ReadOnlyParserGuard(session, delegate))
  }
}
