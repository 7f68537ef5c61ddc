package graft.gen

import graft.core.{FkEdge, SchemaSlice}
import graft.link.Intent
import graft.link.Intent.Analysis

/**
 * Deterministic SQL candidate generation (N10/J2 in SURVEY.md §2.9; ref
 * `app/models/inference.py:215-246`, `app/models/trainer.py:275-303`) —
 * the offline-testable generation path the reference falls back to when no
 * LLM is configured.
 */
object Templates {

  final case class Candidate(sql: String, confidence: Double, method: String)

  val DefaultLimit = 100

  /** Per-table template: first 5 columns, LIMIT 100 (conf 0.5). */
  def tableCandidates(slice: SchemaSlice): Seq[Candidate] =
    slice.tables.toSeq.sortBy(_._1).map { case (t, cols) =>
      val proj = if (cols.isEmpty) "*" else cols.take(5).mkString(", ")
      Candidate(s"SELECT $proj FROM $t LIMIT $DefaultLimit", 0.5, "template")
    }

  /** FK-join template from the first edge connecting two sliced tables
    * (conf 0.6). */
  def joinCandidates(slice: SchemaSlice, fks: Seq[FkEdge]): Seq[Candidate] = {
    val tables = slice.tables.keySet
    fks.filter(e => tables.contains(e.fromTable) && tables.contains(e.toTable))
      .take(1)
      .map { e =>
        val fromCols = slice.tables(e.fromTable).take(3).map(c => s"f.$c")
        val toCols = slice.tables(e.toTable).take(3).map(c => s"t.$c")
        val proj = (fromCols ++ toCols).mkString(", ")
        Candidate(
          s"SELECT $proj FROM ${e.fromTable} f JOIN ${e.toTable} t ON f.${e.fromColumn} = t.${e.toColumn} LIMIT $DefaultLimit",
          0.6, "template_join")
      }
  }

  /** Intent-shaped candidates: aggregation / group-by / distinct patterns
    * derived from the analysis (mirrors the prompt patterns the reference
    * injects — ref query_intent.py:324-379). */
  def intentCandidates(slice: SchemaSlice, analysis: Analysis): Seq[Candidate] =
    slice.tables.headOption.toSeq.flatMap { case (t, cols) =>
      val numericish = cols.drop(1).headOption.getOrElse(cols.headOption.getOrElse("*"))
      val groupCol = cols.headOption.getOrElse("*")
      // Intent-shaped candidates outrank the generic join template (0.6 +
      // join bonus): an aggregation question answered by a raw FK join is
      // a worse answer than the matching aggregate, so confidence 0.85 (beats 0.6 + table + join bonuses).
      analysis.intent match {
        case Intent.Aggregation =>
          val f = analysis.aggFunction.getOrElse("COUNT")
          val expr = if (f == "COUNT") "COUNT(*)" else s"$f($numericish)"
          Seq(Candidate(s"SELECT $expr AS agg_value FROM $t", 0.85, "template_agg"))
        case Intent.GroupedAggregation | Intent.WindowFunction =>
          val f = analysis.aggFunction.getOrElse("COUNT")
          val expr = if (f == "COUNT") "COUNT(*)" else s"$f($numericish)"
          Seq(Candidate(
            s"SELECT $groupCol, $expr AS agg_value FROM $t GROUP BY $groupCol ORDER BY $groupCol LIMIT $DefaultLimit",
            0.85, "template_group"))
        case Intent.DistinctIntent =>
          Seq(Candidate(
            s"SELECT DISTINCT $groupCol FROM $t ORDER BY $groupCol LIMIT $DefaultLimit",
            0.85, "template_distinct"))
        case _ => Nil
      }
    }

  /** Full deterministic candidate set, ordered by confidence desc. */
  def candidates(slice: SchemaSlice, fks: Seq[FkEdge], analysis: Analysis): Seq[Candidate] =
    (intentCandidates(slice, analysis) ++ joinCandidates(slice, fks) ++ tableCandidates(slice))
      .sortBy(-_.confidence)
}
