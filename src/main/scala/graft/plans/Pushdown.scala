package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/**
 * Parquet TIMESTAMP(NANOS) columns enter the engine as raw longs
 * (`spark.sql.legacy.parquet.nanosAsLong`) and the source registry
 * rebuilds a usable timestamp as
 * `timestamp_micros(cast(raw / 1000 as bigint))`
 * (`graft.sources.Sources.table`). That derivation BLOCKS predicate
 * pushdown: a time-range filter compares against the derived
 * expression, so the parquet scan reads every row group
 * (`PushedFilters: [IsNotNull(ts)]` only) — at 100 TB of time-ordered
 * events that is the difference between pruning to the queried window
 * and a full scan.
 *
 * This rule restores the pruning: for each comparison of the derived
 * timestamp against a literal it conjoins an IMPLIED predicate on the
 * raw nanos column — a superset bound (with slack covering the
 * double-division rounding in the derivation), safe because the
 * original exact predicate stays in place; the added conjunct is a bare
 * `long-column op literal`, exactly what FileSourceStrategy can hand
 * the parquet reader for row-group min/max pruning.
 *
 * Fixpoint-safe: an implied conjunct already present (semantically) is
 * never added twice.
 */
class NanosTimestampPushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** Nanos slack absorbing the double-division rounding of
    * `cast(raw / 1000.0 as bigint)` (≤ 1 µs at epoch magnitudes). */
  private val Slack = 1000L

  /** Matches `timestamp_micros(rawNanos div 1000)` (the registry's
    * exact integral-division derivation) and the legacy
    * `timestamp_micros(cast(rawNanos / 1000 as bigint))` double-division
    * spelling, yielding the raw long column. */
  private object DerivedMicros {
    private def longAttr(e: Expression): Option[Attribute] = e match {
      case a: Attribute if a.dataType == LongType => Some(a)
      case c: Cast if c.dataType == DoubleType || c.dataType == LongType =>
        c.child match {
          case a: Attribute if a.dataType == LongType => Some(a)
          case _ => None
        }
      case _ => None
    }
    private def isThousand(e: Expression): Boolean = e match {
      case Literal(1000L, LongType) => true
      case Literal(1000, _) => true
      case Literal(1000.0, DoubleType) => true
      case c: Cast => isThousand(c.child)
      case _ => false
    }
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) if isThousand(d.right) =>
        longAttr(d.left)
      case MicrosToTimestamp(c: Cast) if c.dataType == LongType =>
        c.child match {
          case d: Divide if isThousand(d.right) => longAttr(d.left)
          case d: IntegralDivide if isThousand(d.right) => longAttr(d.left)
          case _ => None
        }
      case _ => None
    }
  }

  /** `m*1000 - Slack` as a nanos lower bound, or None when the micros
    * literal is so large the conversion would overflow a Long (e.g. the
    * `ts >= TIMESTAMP '9999-12-31'`-beyond-2262 sentinel range). On
    * overflow no conjunct is emitted — the exact original predicate
    * remains, so skipping is always conservative. */
  private def loBound(m: Long): Option[Long] =
    try Some(Math.subtractExact(Math.multiplyExact(m, 1000L), Slack))
    catch { case _: ArithmeticException => None }

  /** `(m+1)*1000 + Slack` as a nanos upper bound; None on overflow. */
  private def hiBound(m: Long): Option[Long] =
    try Some(Math.addExact(Math.multiplyExact(Math.addExact(m, 1L), 1000L), Slack))
    catch { case _: ArithmeticException => None }

  /** The implied raw-nanos bounds for one conjunct (empty when the
    * shape doesn't apply). Truncation toward zero equals floor for the
    * positive epoch values these columns hold; every bound is widened
    * by [[Slack]], and the exact original predicate remains, so the
    * added conjuncts can only prune row groups that cannot match.
    * Bounds whose micros→nanos conversion would overflow (timestamps
    * past ~2262) are dropped rather than allowed to wrap negative.
    *
    * Bounds return as SEPARATE conjuncts, never a nested And: the rule
    * runs inside the operator-optimization fixed point, where a nested
    * And would re-split on the next pass and fail the already-present
    * check — growing the condition every iteration until the batch's
    * limit. Flat conjuncts are individually `semanticEquals`-stable. */
  private def implied(cmp: Expression): Seq[Expression] = cmp match {
    case GreaterThanOrEqual(DerivedMicros(a), Literal(m: Long, TimestampType)) =>
      loBound(m).map(b => GreaterThanOrEqual(a, Literal(b))).toSeq
    case GreaterThan(DerivedMicros(a), Literal(m: Long, TimestampType)) =>
      loBound(m).map(b => GreaterThan(a, Literal(b))).toSeq
    case LessThan(DerivedMicros(a), Literal(m: Long, TimestampType)) =>
      hiBound(m).map(b => LessThan(a, Literal(b))).toSeq
    case LessThanOrEqual(DerivedMicros(a), Literal(m: Long, TimestampType)) =>
      hiBound(m).map(b => LessThanOrEqual(a, Literal(b))).toSeq
    case EqualTo(DerivedMicros(a), Literal(m: Long, TimestampType)) =>
      loBound(m).map(b => GreaterThanOrEqual(a, Literal(b))).toSeq ++
        hiBound(m).map(b => LessThanOrEqual(a, Literal(b))).toSeq
    case EqualTo(Literal(m: Long, TimestampType), DerivedMicros(a)) =>
      loBound(m).map(b => GreaterThanOrEqual(a, Literal(b))).toSeq ++
        hiBound(m).map(b => LessThanOrEqual(a, Literal(b))).toSeq
    // literal-on-the-left spellings flip the operator
    case GreaterThanOrEqual(Literal(m: Long, TimestampType), DerivedMicros(a)) =>
      hiBound(m).map(b => LessThanOrEqual(a, Literal(b))).toSeq
    case GreaterThan(Literal(m: Long, TimestampType), DerivedMicros(a)) =>
      hiBound(m).map(b => LessThan(a, Literal(b))).toSeq
    case LessThanOrEqual(Literal(m: Long, TimestampType), DerivedMicros(a)) =>
      loBound(m).map(b => GreaterThanOrEqual(a, Literal(b))).toSeq
    case LessThan(Literal(m: Long, TimestampType), DerivedMicros(a)) =>
      loBound(m).map(b => GreaterThan(a, Literal(b))).toSeq
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(implied).distinct
        .filterNot(n => conjuncts.exists(_.semanticEquals(n)))
      if (additions.isEmpty) f
      else f.copy(condition = (conjuncts ++ additions).reduce(And))
  }
}
