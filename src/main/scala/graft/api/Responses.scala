package graft.api

import graft.core.{EngineError, QueryResult}

/**
 * JSON response envelopes matching the reference's HTTP payload shapes
 * (V13; ref `app/routes_ai.py:210-220,254-306`): success carries
 * `{ok, sql, columns, rows, rowcount, explain, explanation, lineage}`
 * — lineage extends the reference's prose `explanation` with
 * per-column `table.column` provenance (`{column: [sources…]}`);
 * failure is the always-answer error envelope
 * `{ok: false, error, message, sql: null, columns: [], rows: [], rowcount: 0}`.
 */
object Responses {

  private[graft] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Quoted JSON string literal. */
  private[graft] def jsonString(s: String): String = "\"" + esc(s) + "\""

  private[graft] def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => jsonDouble(n.toDouble)
    case n: Double => jsonDouble(n)
    case other => "\"" + esc(String.valueOf(other)) + "\""
  }

  private def jsonDouble(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  def success(r: QueryResult): String = {
    val cols = r.columns.map(c => "\"" + esc(c) + "\"").mkString("[", ", ", "]")
    val rows = r.rows.map(_.map(jsonValue).mkString("[", ", ", "]")).mkString("[", ", ", "]")
    val lineage = r.lineage.map { case (c, srcs) =>
      jsonString(c) + ": " + srcs.map(jsonString).mkString("[", ", ", "]")
    }.mkString("{", ", ", "}")
    s"""{"ok": true, "sql": "${esc(r.sql)}", "columns": $cols, "rows": $rows, """ +
      s""""rowcount": ${r.rowcount}, "explain": "${esc(r.explain)}", """ +
      s""""explanation": "${esc(r.explanation)}", "lineage": $lineage}"""
  }

  def failure(e: EngineError): String =
    s"""{"ok": false, "error": "${esc(e.kind)}", "message": "${esc(e.message)}", """ +
      """"sql": null, "columns": [], "rows": [], "rowcount": 0}"""

  def render(result: Either[EngineError, QueryResult]): String =
    result.fold(failure, success)
}
