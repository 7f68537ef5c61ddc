package graft.core

/**
 * Core data model of the engine.
 *
 * Mirrors the reference's schema/result abstractions (see
 * `/root/reference/NLP_SQLizer/backend/app/schema/crawler.py:18-139` for
 * TableInfo/ColumnInfo/SchemaMetadata and
 * `NLP_SQLizer/backend/app/ai/nl2sql.py:344-360` for the result shape),
 * re-expressed as plain Scala case classes. These are small driver-side
 * values — the distributed data lives in DataFrames.
 */
final case class ColumnInfo(
    name: String,
    dataType: String,
    nullable: Boolean,
    isPrimaryKey: Boolean = false,
    isForeignKey: Boolean = false,
    distinctCount: Option[Long] = None,
    min: Option[Double] = None,
    max: Option[Double] = None,
    avg: Option[Double] = None,
    /** Categorical domain, captured iff distinctCount <= domainCap (ref: 100). */
    uniqueValues: Option[Seq[String]] = None)

/** FK edge in the schema graph (ref: crawler.py:28-38 FKRelationship). */
final case class FkEdge(
    fromTable: String,
    fromColumn: String,
    toTable: String,
    toColumn: String)

final case class TableInfo(
    name: String,
    columns: Seq[ColumnInfo],
    primaryKey: Seq[String] = Nil,
    foreignKeyColumns: Seq[String] = Nil,
    rowCount: Option[Long] = None,
    sampleRows: Seq[Map[String, String]] = Nil)

final case class SchemaMetadata(
    tables: Map[String, TableInfo],
    relationships: Seq[FkEdge],
    synonyms: Map[String, Seq[String]] = Map.empty) {
  /** Lightweight `{table -> [col names]}` map (ref: nl2sql.py:14-21). */
  def lightweight: Map[String, Seq[String]] =
    tables.map { case (t, ti) => t -> ti.columns.map(_.name) }
}

/** Pruned schema context: top-k tables, top-m columns (ref: nl2sql.py:23-46). */
final case class SchemaSlice(tables: Map[String, Seq[String]])

/** Error taxonomy matching the reference's always-answer envelope
  * (ref: routes_ai.py:111-147). */
sealed trait EngineError { def kind: String; def message: String }
final case class ParseError(message: String) extends EngineError { val kind = "parse_error" }
final case class SqlSafetyError(message: String) extends EngineError { val kind = "unsafe_sql" }
final case class PlanTooLargeError(message: String) extends EngineError { val kind = "plan_too_large" }
final case class ExecutionError(message: String) extends EngineError { val kind = "execution_error" }
final case class TimeoutError(message: String) extends EngineError { val kind = "timeout" }

/** `{sql, columns, rows, rowcount, explain}` (ref: main.py:298-331,
  * nl2sql.py:325-360). Rows are JSON-safe driver-side values; only ever
  * materialized under a LIMIT cap.
  *
  * `lineage` upgrades the reference's prose `explanation`
  * (routes_ai.py:210-220) to column provenance: each output column with
  * the sorted `table.column` base columns feeding it (plan-derived, see
  * `explain/Lineage.scala`); empty when the answer did not come from a
  * SQL plan (sketch serving, document pipelines). */
final case class QueryResult(
    sql: String,
    columns: Seq[String],
    rows: Seq[Seq[Any]],
    rowcount: Int,
    explain: String,
    explanation: String = "",
    lineage: Seq[(String, Seq[String])] = Nil)
