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

  private val perPhraseRe =
    raw"(?:\bper\b|\bfor each\b|\bgrouped by\b|\bby\b)\s+([a-z0-9_ ]+)$$".r

  /** Intent-shaped candidates: aggregation / group-by / distinct patterns
    * derived from the analysis (mirrors the prompt patterns the reference
    * injects — ref query_intent.py:324-379). Group and aggregate columns
    * are chosen by fuzzy score against the question's grouping phrase
    * ("per X") and the rest of the question respectively — not by
    * position in the slice. */
  def intentCandidates(slice: SchemaSlice, analysis: Analysis,
      question: String = ""): Seq[Candidate] =
    slice.tables.headOption.toSeq.flatMap { case (t, cols) =>
      val q = question.toLowerCase
      // strip intent/filler words and the table's own name so column
      // scoring sees only the content words ("average customer account
      // balance" -> "account balance")
      val fillers = Set("average", "avg", "mean", "total", "sum", "count",
        "min", "minimum", "max", "maximum", "how", "many", "number", "of",
        "the", "list", "all", "unique", "distinct", "values", "value",
        "rows", "are", "there", "on", "from", "show", "me", "per", "each",
        "for", "by", "top", "bottom", "first", "last", "highest", "lowest",
        "sorted", "order", "ordered", "sort", "newest", "oldest", "latest",
        "earliest", "best", "worst") ++
        // the table's own name is filler ("how many customers") — UNLESS
        // the token is also a column of the table ("maximum score" on
        // scores(score, ...) must keep "score" as column signal)
        Seq(t, if (t.endsWith("s")) t.dropRight(1) else t + "s")
          .filterNot(tok => cols.exists(_.equalsIgnoreCase(tok))) ++
        (0 to 100).map(_.toString)
      def strip(s: String): String =
        s.split("[^a-z0-9_]+").filterNot(fillers).mkString(" ")
      val perPhrase = perPhraseRe.findFirstMatchIn(q).map(m => strip(m.group(1))).getOrElse(strip(q))
      val prePhrase = perPhraseRe.findFirstMatchIn(q).map(m => strip(q.take(m.start))).getOrElse(strip(q))
      def best(candidates: Seq[String], phrase: String, default: String): String =
        if (candidates.isEmpty || phrase.trim.isEmpty) default
        else candidates.maxBy(c => graft.link.Fuzzy.nameScore(c, phrase))
      val groupCol = best(cols, perPhrase, cols.headOption.getOrElse("*"))
      val numericish = best(cols.filterNot(_ == groupCol), prePhrase,
        cols.drop(1).headOption.getOrElse(cols.headOption.getOrElse("*")))
      // Intent-shaped candidates outrank the generic join template (0.6 +
      // join bonus): an aggregation question answered by a raw FK join is
      // a worse answer than the matching aggregate, so confidence 0.85 (beats 0.6 + table + join bonuses).
      val countDistinct = analysis.aggFunction.contains("COUNT") &&
        analysis.allIntents.contains(Intent.DistinctIntent)
      // Explicit "top/first/last N" is a sort+limit question even when an
      // agg keyword also fired ("top" doubles as a MAX keyword in the
      // reference's lists): rank rows, don't collapse to one aggregate.
      val topN = analysis.limitN.isDefined &&
        (analysis.allIntents.contains(Intent.Sorted) || analysis.allIntents.contains(Intent.Limited))
      if (topN) {
        val sortCol = best(cols, prePhrase, cols.headOption.getOrElse("*"))
        val dir = if (analysis.sortDescending) "DESC" else "ASC"
        Seq(Candidate(
          s"SELECT * FROM $t ORDER BY $sortCol $dir LIMIT ${analysis.limitN.get}",
          0.85, "template_topn"))
      } else analysis.intent match {
        case Intent.Aggregation if countDistinct =>
          val target = best(cols, perPhrase, groupCol)
          Seq(Candidate(s"SELECT COUNT(DISTINCT $target) AS agg_value FROM $t",
            0.85, "template_count_distinct"))
        case Intent.Aggregation =>
          val f = analysis.aggFunction.getOrElse("COUNT")
          // ungrouped: the aggregate target is the best match over ALL
          // columns (groupCol is meaningless here and must not be excluded)
          val aggCol = best(cols, prePhrase, numericish)
          val expr = if (f == "COUNT") "COUNT(*)" else s"$f($aggCol)"
          Seq(Candidate(s"SELECT $expr AS agg_value FROM $t", 0.85, "template_agg"))
        case Intent.WindowFunction =>
          // W1: individual rows alongside the partition aggregate
          // (ref query_intent.py:331 "AVG(col) OVER (PARTITION BY grp)")
          val f = analysis.aggFunction.getOrElse("AVG")
          Seq(Candidate(
            s"SELECT *, $f($numericish) OVER (PARTITION BY $groupCol) AS window_value " +
              s"FROM $t LIMIT $DefaultLimit",
            0.85, "template_window"))
        case Intent.GroupedAggregation =>
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
  def candidates(slice: SchemaSlice, fks: Seq[FkEdge], analysis: Analysis,
      question: String = ""): Seq[Candidate] =
    (intentCandidates(slice, analysis, question) ++ joinCandidates(slice, fks) ++ tableCandidates(slice))
      .sortBy(-_.confidence)
}
