package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/**
 * Schemaless document source — the reference's MongoDB branch re-expressed
 * on Spark (S7/V11/V12/A9/O4/N3 in SURVEY.md §2; ref
 * `app/mongodb_adapter.py`, `app/ai/nl2mongo.py`).
 *
 * Schema is inferred by sampling JSON documents (Spark's JSON reader does
 * the per-field type-union/widening the adapter implements by hand over
 * 50–100 sampled docs). Collections register as temp views. Query
 * execution supports the adapter's two shapes:
 *
 *  - `find(filter, projection, sort, limit)` — filter/project/sort/limit
 *    (ref nl2mongo.py:178-193)
 *  - `aggregate(pipeline)` — $match/$group/$project/$sort/$limit stages
 *    with an auto-appended $limit when absent (ref nl2mongo.py:64-67,168-176)
 *
 * The result envelope puts `_id` first and serializes nested struct/array
 * values as JSON strings (ref nl2mongo.py:194-226).
 */
object DocSource {

  /** Sample-inferred schema + temp view registration. `samplingRatio`
    * mirrors the adapter's bounded sampling: Spark still scans files for
    * inference, but only parses the sampled fraction at schema time. */
  def register(spark: SparkSession, path: String, collection: String,
      samplingRatio: Double = 1.0): DataFrame = {
    val df = spark.read
      .option("samplingRatio", samplingRatio)
      .option("primitivesAsString", "false")
      .json(path)
    df.createOrReplaceTempView(collection)
    df
  }

  // ------------------------------------------------------------- find

  /** Mongo-style comparison operators on (possibly dotted) field paths. */
  sealed trait Pred { def toColumn: Column }
  final case class Eq(path: String, v: Any) extends Pred { def toColumn: Column = col(path) === lit(v) }
  final case class Ne(path: String, v: Any) extends Pred { def toColumn: Column = col(path) =!= lit(v) }
  final case class Gt(path: String, v: Any) extends Pred { def toColumn: Column = col(path) > lit(v) }
  final case class Gte(path: String, v: Any) extends Pred { def toColumn: Column = col(path) >= lit(v) }
  final case class Lt(path: String, v: Any) extends Pred { def toColumn: Column = col(path) < lit(v) }
  final case class Lte(path: String, v: Any) extends Pred { def toColumn: Column = col(path) <= lit(v) }
  final case class In(path: String, vs: Seq[Any]) extends Pred { def toColumn: Column = col(path).isin(vs: _*) }
  final case class ExistsP(path: String) extends Pred { def toColumn: Column = col(path).isNotNull }
  /** `$exists: false` — the field is absent/null (Spark's inferred
    * schema represents absent document fields as null). */
  final case class MissingP(path: String) extends Pred { def toColumn: Column = col(path).isNull }
  /** `$regex`-style substring containment on a string field. */
  final case class Contains(path: String, s: String) extends Pred {
    def toColumn: Column = col(path).contains(s)
  }

  final case class FindSpec(
      filter: Seq[Pred] = Nil,
      projection: Seq[String] = Nil,
      sort: Seq[(String, Boolean)] = Nil, // (path, ascending)
      limit: Int = DefaultLimit)

  val DefaultLimit = 100 // auto-cap parity (ref nl2mongo.py:64-67)

  def find(df: DataFrame, spec: FindSpec): DataFrame = {
    var out = df
    if (spec.filter.nonEmpty)
      out = out.where(spec.filter.map(_.toColumn).reduce(_ && _))
    if (spec.projection.nonEmpty) {
      val cols = if (df.columns.contains("_id") && !spec.projection.contains("_id"))
        "_id" +: spec.projection else spec.projection
      out = out.select(cols.map(col): _*)
    }
    if (spec.sort.nonEmpty) {
      val keys = spec.sort.map { case (p, asc) => if (asc) col(p).asc else col(p).desc }
      // deterministic LIMIT window: a sort key with ties at the cut
      // boundary would otherwise return an engine-dependent subset
      // (the same total-order discipline as the SQL-side templates) —
      // `_id` is appended as the tiebreaker when present and not
      // already a sort key
      val tiebreak =
        if (out.columns.contains("_id") && !spec.sort.exists(_._1 == "_id"))
          Seq(col("_id").asc) else Nil
      out = out.orderBy(keys ++ tiebreak: _*)
    }
    out.limit(spec.limit)
  }

  // -------------------------------------------------------- aggregate

  sealed trait Stage
  final case class MatchStage(preds: Seq[Pred]) extends Stage
  /** `$group`: groupPath may be null (whole-collection group, `_id: null`). */
  final case class GroupStage(groupPath: Option[String], accs: Seq[(String, String, String)]) extends Stage
  // accs: (outputName, op in {sum,avg,min,max,count}, path or "*")
  final case class ProjectStage(paths: Seq[String]) extends Stage
  final case class SortStage(keys: Seq[(String, Boolean)]) extends Stage
  final case class LimitStage(n: Int) extends Stage
  /** `$unwind`: one output document per element of a TOP-LEVEL array
    * field; documents whose array is null/empty are dropped (Mongo's
    * default, matching Spark's `explode`). Dotted paths into the
    * unwound elements then address struct members the usual way. */
  final case class UnwindStage(path: String) extends Stage

  def aggregate(df: DataFrame, pipeline: Seq[Stage]): DataFrame = {
    // auto-append $limit when the pipeline lacks one (ref nl2mongo.py:168-176)
    val staged = if (pipeline.exists(_.isInstanceOf[LimitStage])) pipeline
      else pipeline :+ LimitStage(DefaultLimit)
    staged.foldLeft(df) {
      case (d, MatchStage(ps)) => if (ps.isEmpty) d else d.where(ps.map(_.toColumn).reduce(_ && _))
      case (d, GroupStage(gp, accs)) =>
        val aggs = accs.map {
          case (name, "count", _) => count(lit(1)).as(name)
          case (name, "sum", p) => sum(col(p)).as(name)
          case (name, "avg", p) => avg(col(p)).as(name)
          case (name, "min", p) => min(col(p)).as(name)
          case (name, "max", p) => max(col(p)).as(name)
          case (name, op, _) => throw new IllegalArgumentException(s"unsupported $$group op $op for $name")
        }
        gp match {
          case Some(p) => d.groupBy(col(p).as("_id")).agg(aggs.head, aggs.tail: _*)
          case None => d.groupBy(lit(null).cast("string").as("_id")).agg(aggs.head, aggs.tail: _*)
        }
      case (d, ProjectStage(paths)) => d.select(paths.map(col): _*)
      case (d, UnwindStage(p)) =>
        require(!p.contains('.'),
          s"$$unwind supports top-level array fields, got '$p'")
        d.withColumn(p, explode(col(p)))
      case (d, SortStage(keys)) =>
        d.orderBy(keys.map { case (p, asc) => if (asc) col(p).asc else col(p).desc }: _*)
      case (d, LimitStage(n)) => d.limit(n)
    }
  }

  // ---------------------------------------------------------- explain

  /** Pipeline explain capture (ref nl2mongo.py:229-297 `$explain`). */
  def explain(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)

  // ----------------------------------------------------------- sink

  /** Result envelope: `_id` first, nested struct/array → JSON strings
    * (ref nl2mongo.py:194-226). Column-level `to_json` happens BEFORE
    * collect, so the driver only ever sees scalar rows. */
  def jsonEnvelope(df: DataFrame): (Seq[String], Seq[Seq[Any]]) = {
    val ordered = if (df.columns.contains("_id"))
      "_id" +: df.columns.filterNot(_ == "_id").toSeq else df.columns.toSeq
    val flattened = df.select(ordered.map { c =>
      df.schema(c).dataType match {
        case _: StructType | _: ArrayType => to_json(col(c)).as(c)
        case _ => col(c)
      }
    }: _*)
    (ordered, flattened.collect().toSeq.map(_.toSeq.map(graft.exec.Executor.jsonSafe)))
  }
}
