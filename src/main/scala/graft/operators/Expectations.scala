package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Declarative data-quality expectations, audited in ONE corpus pass —
 * the ingestion gate of a large-scale training-data pipeline (every
 * batch is checked before it may join the corpus). The check vocabulary
 * and "constraints compile to one aggregation plan" design re-express
 * the public Deequ model (Schelter et al., "Automating Large-Scale Data
 * Quality Verification", VLDB 2018); the reference's closest surface is
 * its per-column profiling pass (`app/schema/crawler.py:244-246`),
 * which measures but cannot assert.
 *
 * Scale design: every expectation lowers to conditional aggregates over
 * the same scan, so N expectations cost ONE pass with map-side partials
 * — never N scans. The result is one row per expectation (driver-side
 * assembly of a single collected row — bounded by the expectation list,
 * not the data).
 */
object Expectations {

  sealed trait Expectation {
    /** Column under check ("*" for table-level checks). */
    def column: String
    /** Violation-fraction threshold the observation must not exceed. */
    def threshold: Double
    def name: String
  }

  /** Null fraction of `column` must be ≤ `threshold`. */
  final case class NotNull(column: String, threshold: Double = 0.0)
      extends Expectation { val name = "not_null" }

  /** Duplicate fraction among non-null values must be ≤ `threshold`. */
  final case class Unique(column: String, threshold: Double = 0.0)
      extends Expectation { val name = "unique" }

  /** Fraction of non-null values outside [lo, hi] must be ≤ `threshold`. */
  final case class InRange(column: String, lo: Double, hi: Double,
      threshold: Double = 0.0) extends Expectation { val name = "in_range" }

  /** Fraction of non-null values outside `values` must be ≤ `threshold`. */
  final case class InSet(column: String, values: Seq[String],
      threshold: Double = 0.0) extends Expectation { val name = "in_set" }

  /** Fraction of non-null values NOT matching `pattern` must be ≤ `threshold`. */
  final case class MatchesRegex(column: String, pattern: String,
      threshold: Double = 0.0) extends Expectation { val name = "matches_regex" }

  private val reportSchema = StructType(Seq(
    StructField("check", StringType, nullable = false),
    StructField("col_name", StringType, nullable = false),
    StructField("observed", DoubleType, nullable = false),
    StructField("threshold", DoubleType, nullable = false),
    StructField("pass", BooleanType, nullable = false)))

  /**
   * Audit `df` against `expectations`: returns one row per expectation
   * — (check, col_name, observed violation fraction rounded to 6dp,
   * threshold, pass). An empty frame passes every fraction check
   * (0/0 → 0.0 violations).
   */
  def audit(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "at least one expectation")
    val spark = df.sparkSession
    val aggs = count(lit(1)).as("_total") +: expectations.zipWithIndex.map {
      case (e, i) =>
        val c = col(e.column)
        val viol = e match {
          case _: NotNull => sum(when(c.isNull, 1L).otherwise(0L))
          case _: Unique => count(c) - countDistinct(c)
          case InRange(_, lo, hi, _) =>
            sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
          case InSet(_, vs, _) =>
            sum(when(c.isNotNull && !c.cast("string").isin(vs: _*), 1L).otherwise(0L))
          case MatchesRegex(_, p, _) =>
            sum(when(c.isNotNull && !c.cast("string").rlike(p), 1L).otherwise(0L))
        }
        coalesce(viol, lit(0L)).as(s"_v$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getLong(0)
    val out = expectations.zipWithIndex.map { case (e, i) =>
      val viol = row.getLong(i + 1)
      val frac = if (total == 0) 0.0
        else BigDecimal(viol.toDouble / total)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Row(e.name, e.column, frac, e.threshold, frac <= e.threshold)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), reportSchema)
  }

  /** True iff every expectation passes — the pipeline gate form. */
  def holds(df: DataFrame, expectations: Seq[Expectation]): Boolean =
    audit(df, expectations).where(!col("pass")).isEmpty

  /**
   * Referential-integrity audit: child rows whose FK has no matching
   * parent key. Output one row: (n_child, n_orphans, orphan_rate 6 dp,
   * pass) against `threshold` (allowed orphan fraction, default 0).
   *
   * Scale: a LeftAnti join on the key — both sides project ONLY the
   * key columns before the join (the parent side additionally
   * dedupes, so the shuffle carries distinct parent keys, not parent
   * rows); AQE broadcasts the parent key set when it fits, falls back
   * to a key-partitioned shuffle when it doesn't. Null FKs are not
   * orphans (SQL FK semantics: a null reference is absent, not
   * dangling) and are reported separately as n_null_fk.
   */
  def referentialAudit(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String],
      threshold: Double = 0.0): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size)
    val ck = child.select(childKeys.map(col): _*)
    val pk = parent.select(parentKeys.zip(childKeys)
      .map { case (p, c) => col(p).as(c) }: _*).distinct()
    val nonNull = ck.where(childKeys.map(col(_).isNotNull).reduce(_ && _))
    val orphans = nonNull.join(pk, childKeys, "left_anti")
    val totals = ck.agg(count(lit(1)).as("n_child"),
      sum(when(childKeys.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L))
        .as("n_null_fk"))
    totals.crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(col("n_child"), coalesce(col("n_null_fk"), lit(0L)).as("n_null_fk"),
        col("n_orphans"),
        round(when(col("n_child") > 0,
          col("n_orphans").cast("double") / col("n_child")).otherwise(0.0), 6)
          .as("orphan_rate"))
      .withColumn("pass", col("orphan_rate") <= threshold)
  }
}
