package graft.link

/**
 * Deterministic query-intent classifier (N4/N18 in SURVEY.md §2.9; ref
 * `app/ai/query_intent.py:13-321`). 18 intents, keyword/regex detectors,
 * priority ordering for the primary intent, confidence
 * `min(0.95, 0.7 + 0.05·|intents|)`.
 *
 * Pure driver-side Scala — property-testable, no Spark dependency.
 */
object Intent {

  sealed abstract class QueryIntent(val name: String)
  case object SimpleSelect extends QueryIntent("simple_select")
  case object Filtered extends QueryIntent("filtered")
  case object Aggregation extends QueryIntent("aggregation")
  case object GroupedAggregation extends QueryIntent("grouped_aggregation")
  case object WindowFunction extends QueryIntent("window_function")
  case object JoinIntent extends QueryIntent("join")
  case object Sorted extends QueryIntent("sorted")
  case object Limited extends QueryIntent("limited")
  case object ComplexFilter extends QueryIntent("complex_filter")
  case object DateTime extends QueryIntent("date_time")
  case object TextSearch extends QueryIntent("text_search")
  case object Comparison extends QueryIntent("comparison")
  case object Ranking extends QueryIntent("ranking")
  case object DistinctIntent extends QueryIntent("distinct")
  case object NullHandling extends QueryIntent("null_handling")
  case object Conditional extends QueryIntent("conditional")
  case object UnionIntent extends QueryIntent("union")
  case object Subquery extends QueryIntent("subquery")

  final case class Analysis(
      intent: QueryIntent,
      allIntents: Seq[QueryIntent],
      confidence: Double,
      requiredClauses: Seq[String],
      requiredFunctions: Seq[String],
      hints: Seq[String],
      limitN: Option[Int],
      aggFunction: Option[String],
      sortDescending: Boolean)

  private val aggKeywords: Seq[(String, Seq[String])] = Seq(
    "AVG" -> Seq("average", "avg", "mean"),
    // note: the reference also lists "quantity" under count
    // (query_intent.py:66); dropped here because it is a common COLUMN
    // name ("total quantity" must resolve to SUM, not COUNT)
    "COUNT" -> Seq("count", "how many", "number of", "total number"),
    "SUM" -> Seq("sum", "total"),
    "MAX" -> Seq("max", "maximum", "highest", "largest", "most", "top"),
    "MIN" -> Seq("min", "minimum", "lowest", "smallest", "least", "bottom"))

  private val groupKeywords = Seq(
    "grouped by", "group by", "per ", "for each", "each ", "every ",
    "by company", "by category", "by month", "by year", "by department",
    "by type", "by status")

  private val windowKeywords = Seq(
    "along with", "with their", "with the average", "with the total",
    "compared to", "compared with", "same as the average", "alongside",
    "including the", "plus the average")

  private val filterKeywords = Seq(
    "where", "with", "that have", "that are", "which", "whose",
    "greater than", "less than", "equal to", "not equal", "above", "below",
    "over", "under", "between", "in range")

  private val complexFilterIndicators = Seq(
    "and", "or", "both", "either", "neither", "not only", "but also",
    "as well as", "in addition to")

  private val sortKeywords = Seq(
    "sorted by", "ordered by", "order by", "sort by", "ascending",
    "descending", "asc", "desc", "newest", "oldest", "latest", "earliest",
    "first", "last", "top", "bottom", "highest", "lowest")

  private val descKeywords = Seq("descending", "desc", "newest", "latest", "highest", "top")

  private val limitKeywords = Seq("first", "last", "top", "bottom", "limit", "only")

  private val dateKeywords = Seq(
    "today", "yesterday", "tomorrow", "this week", "this month", "this year",
    "last week", "last month", "last year", "next week", "next month",
    "recent", "recently", "latest", "oldest", "date", "time", "when",
    "since", "until", "after", "before")

  private val textSearchKeywords = Seq(
    "containing", "contains", "like", "matching", "starts with", "ends with",
    "includes", "including", "search", "find", "look for")

  private val comparisonKeywords = Seq(
    "compare", "comparison", "versus", "vs", "difference", "different",
    "same", "similar", "greater than", "less than")

  private val rankingKeywords = Seq(
    "rank", "ranking", "ranked", "position", "nth", "first place",
    "second place", "top performer", "best", "worst")

  private val distinctKeywords = Seq(
    "unique", "distinct", "no duplicates", "only show unique", "list all unique")

  private val nullKeywords = Seq(
    "null", "empty", "missing", "not set", "no value", "blank", "has no", "without")

  private val subqueryIndicators = Seq(
    "that have", "which have", "whose", "where there exists",
    "that are in", "that are not in", "in the list of")

  private val conditionalKeywords = Seq(
    "if ", "case", "categorize", "classify", "label", "depending on", "band")

  private val limitNumRe = raw"\b(?:top|first|last|bottom)\s+(\d+)".r
  private val isoDateRe = raw"\d{4}-\d{2}-\d{2}|\d{2}/\d{2}/\d{4}".r

  /** Keyword containment. The reference uses raw substring containment
    * (`kw in question_lower`), which mis-fires on compound words —
    * "total" inside "totalprice" must not read as SUM — so single-word
    * keywords match on word boundaries; multi-word phrases keep
    * substring semantics. */
  private def anyIn(q: String, kws: Seq[String]): Boolean = kws.exists { kw =>
    if (kw.contains(" ") || kw.endsWith(" ")) q.contains(kw)
    else raw"\b${java.util.regex.Pattern.quote(kw)}\b".r.findFirstIn(q).isDefined
  }

  /** Priority ordering for the primary intent (ref query_intent.py:291-303). */
  private val priority: Seq[QueryIntent] = Seq(
    WindowFunction, GroupedAggregation, Aggregation, JoinIntent, Ranking,
    ComplexFilter, Filtered, Sorted, Limited)

  def analyze(question: String, schemaTables: Seq[String] = Nil): Analysis = {
    val q = question.toLowerCase
    val intents = collection.mutable.ListBuffer.empty[QueryIntent]
    val clauses = collection.mutable.ListBuffer.empty[String]
    val functions = collection.mutable.ListBuffer.empty[String]
    val hints = collection.mutable.ListBuffer.empty[String]

    val agg = aggKeywords.collectFirst { case (f, kws) if anyIn(q, kws) => f }
    agg.foreach { f =>
      functions += f
      intents += Aggregation
    }

    val needsGroup = anyIn(q, groupKeywords)
    if (needsGroup) {
      intents += GroupedAggregation
      clauses += "GROUP BY"
      hints += (if (agg.isDefined) "Use GROUP BY with the aggregation function"
                else "Grouping without explicit aggregation - consider COUNT(*)")
    }

    if (anyIn(q, windowKeywords) && agg.isDefined) {
      intents += WindowFunction
      functions += "OVER (PARTITION BY ...)"
      hints += "Use window functions to show rows alongside aggregates"
    }

    val mentionedTables = schemaTables.count(t => q.contains(t.toLowerCase))
    if (mentionedTables >= 2 || anyIn(q, Seq("and their", "with their", "together"))) {
      intents += JoinIntent
      clauses += "JOIN"
      hints += "Multiple tables mentioned - use JOIN to combine data"
    }

    val hasFilters = anyIn(q, filterKeywords) ||
      Seq("greater", "less", "equal", "not").exists(w => raw"\b$w\b".r.findFirstIn(q).isDefined)
    if (hasFilters) {
      intents += Filtered
      clauses += "WHERE"
      hints += "Use WHERE for the filtering conditions"
    }

    if (hasFilters && complexFilterIndicators.count(q.contains) >= 2) {
      intents += ComplexFilter
      hints += "Multiple filter conditions - combine with AND/OR"
    }

    val needsSort = anyIn(q, sortKeywords)
    val desc = anyIn(q, descKeywords)
    if (needsSort) {
      intents += Sorted
      clauses += "ORDER BY"
      hints += (if (desc) "Use ORDER BY ... DESC" else "Use ORDER BY for sorting")
    }

    val limitN = limitNumRe.findFirstMatchIn(q).map(_.group(1).toInt)
    if (anyIn(q, limitKeywords) || limitN.isDefined) {
      intents += Limited
      hints += "Use LIMIT to cap the result"
      limitN.foreach(n => hints += s"Limit to $n rows")
    }

    if (anyIn(q, dateKeywords) || isoDateRe.findFirstIn(q).isDefined) {
      intents += DateTime
      clauses += "WHERE"
      hints += "Use date comparisons/functions in WHERE"
    }

    if (anyIn(q, textSearchKeywords)) {
      intents += TextSearch
      functions += "LIKE or ILIKE"
      hints += "Use LIKE/ILIKE with % wildcards"
    }

    if (anyIn(q, comparisonKeywords)) {
      intents += Comparison
      hints += "Comparison query - may need subqueries or self-joins"
    }

    if (anyIn(q, rankingKeywords)) {
      intents += Ranking
      functions += "ROW_NUMBER() or RANK()"
      hints += "Use ROW_NUMBER()/RANK() window functions"
    }

    if (anyIn(q, distinctKeywords)) {
      intents += DistinctIntent
      functions += "DISTINCT"
      hints += "Use DISTINCT to remove duplicates"
    }

    if (anyIn(q, nullKeywords)) {
      intents += NullHandling
      clauses += "WHERE"
      hints += "Check NULLs with IS NULL / IS NOT NULL"
    }

    if (anyIn(q, conditionalKeywords)) {
      intents += Conditional
      hints += "Use CASE WHEN ... THEN ... ELSE ... END"
    }

    // UNION: "or" connecting two known table names (ref query_intent.py:257-272)
    if (q.contains("or") && schemaTables.size >= 2) {
      val mentioned = schemaTables.filter(t => q.contains(t.toLowerCase))
      val unionPair = mentioned.combinations(2).exists { pair =>
        val (a, b) = (pair.head.toLowerCase, pair(1).toLowerCase)
        raw"\b${java.util.regex.Pattern.quote(a)}\b.*\bor\b.*\b${java.util.regex.Pattern.quote(b)}\b".r
          .findFirstIn(q).isDefined ||
          raw"\b${java.util.regex.Pattern.quote(b)}\b.*\bor\b.*\b${java.util.regex.Pattern.quote(a)}\b".r
            .findFirstIn(q).isDefined
      }
      if (unionPair) {
        intents += UnionIntent
        functions += "UNION"
        hints += "Multiple tables with OR - may need UNION"
      }
    }

    if (anyIn(q, subqueryIndicators) && hasFilters) {
      intents += Subquery
      hints += "Complex condition - may need a subquery in WHERE"
    }

    val all = intents.distinct.toSeq
    val (primary, confidence) =
      if (all.isEmpty) (SimpleSelect, 0.8)
      else (priority.find(all.contains).getOrElse(all.head),
        math.min(0.95, 0.7 + all.size * 0.05))

    Analysis(primary, all, confidence, clauses.distinct.toSeq,
      functions.distinct.toSeq, hints.toSeq, limitN, agg, desc)
  }

  /** Does the question demand aggregation? (shared by validator check V7 —
    * ref nl2sql.py:50-63). An explicit "top/first/last N" question is a
    * ranking over rows, not an aggregate — "top" merely overlaps MAX's
    * keyword list — so it only demands aggregation when grouping fired too. */
  def needsAggregation(question: String): Boolean = {
    val a = analyze(question)
    val explicitTopN = a.limitN.isDefined &&
      (a.allIntents.contains(Sorted) || a.allIntents.contains(Limited))
    // an ORDINAL superlative ("the second highest score") asks for a row
    // value at a rank, not an aggregate — MAX's keyword list merely
    // overlaps "highest"
    val ordinalSuperlative =
      raw"(?i)\b(?:second|third|fourth|fifth|\d+(?:st|nd|rd|th))[-\s]+(?:highest|largest|biggest|greatest|lowest|smallest)\b"
        .r.findFirstIn(question).isDefined
    if (ordinalSuperlative) false
    else if (explicitTopN) a.allIntents.contains(GroupedAggregation)
    else a.aggFunction.isDefined || a.allIntents.contains(GroupedAggregation)
  }

  def wantsDistinct(question: String): Boolean =
    analyze(question).allIntents.contains(DistinctIntent)
}
