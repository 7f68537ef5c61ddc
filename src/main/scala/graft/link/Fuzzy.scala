package graft.link

import graft.core.SchemaSlice

/**
 * Fuzzy schema linking (N1–N3 in SURVEY.md §2.9; ref
 * `app/ai/nl2sql.py:23-46`).
 *
 * `partialRatio` reproduces the RapidFuzz partial-ratio contract: the best
 * normalized Indel similarity (×100) of the shorter string against all
 * same-length substrings of the longer one. Indel similarity of (a, b) is
 * `2·LCS(a,b) / (|a|+|b|)`. Schema names are tiny, so the O(m·n·w)
 * sliding-window LCS here is driver-side trivial; the `fuzzy_ratio`
 * Catalyst expression in `graft.functions` serves the distributed case.
 */
object Fuzzy {

  /** Length of the longest common subsequence. */
  private def lcs(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < b.length) {
        cur(j + 1) =
          if (a.charAt(i) == b.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
      i += 1
    }
    prev(b.length)
  }

  /** Normalized Indel similarity ×100 (rounded to nearest int). */
  def ratio(a: String, b: String): Int = {
    if (a.isEmpty && b.isEmpty) return 100
    if (a.isEmpty || b.isEmpty) return 0
    math.round(200.0 * lcs(a, b) / (a.length + b.length)).toInt
  }

  /** Best `ratio` of the shorter string over every same-length window of
    * the longer string (case-insensitive). */
  def partialRatio(s1: String, s2: String): Int = {
    val (a, b) =
      if (s1.length <= s2.length) (s1.toLowerCase, s2.toLowerCase)
      else (s2.toLowerCase, s1.toLowerCase)
    if (a.isEmpty) return if (b.isEmpty) 100 else 0
    var best = 0
    var start = 0
    val w = a.length
    while (start <= b.length - w && best < 100) {
      best = math.max(best, ratio(a, b.substring(start, start + w)))
      start += 1
    }
    if (b.length < w) best = ratio(a, b) // degenerate: never happens after swap
    best
  }

  val TopTables = 4 // ref nl2sql.py:31
  val TopColumns = 8 // ref nl2sql.py:40

  /**
   * Name score vs the question. Two quality refinements over the raw
   * partial-ratio (which the reference uses as-is and which misfires on
   * real schemas):
   *  - very short names are damped (a 2-char column like `ts` scores 100
   *    against ANY question containing those letters adjacently);
   *  - an exact question-word match (incl. singular/plural) gets a bonus,
   *    so "parts" prefers table `part` over an accidental substring hit.
   */
  /** Words too generic to count as an exact-name hit ("values" must not
    * pull in a column literally named `value`). */
  private val genericWords = Set(
    "value", "values", "id", "ids", "name", "names", "type", "types",
    "date", "dates", "time", "times", "row", "rows", "data", "key", "keys")

  /** True when the phrase carries WORD-level evidence for the name: the
    * full name or a >=4-char underscore segment appears as a whole word
    * (singular/plural tolerated, generic words excluded). Substring
    * windows alone ("age" inside "percentage") do NOT count — callers
    * gating expensive readings (e.g. a join) on a column mention should
    * require this, not a bare partial-ratio band. */
  def wordHit(name: String, question: String): Boolean = {
    val words = question.toLowerCase.split("[^a-z0-9_]+").toSet
    val n = name.toLowerCase
    def hit(p: String) = words.contains(p) || words.contains(p + "s") ||
      (p.endsWith("s") && words.contains(p.dropRight(1)))
    (n.length >= 4 && !genericWords(n) && hit(n)) ||
      n.split('_').toSeq.filter(_.length >= 4).filterNot(genericWords).exists(hit)
  }

  def nameScore(name: String, question: String): Int = {
    val base = partialRatio(name, question)
    val damped = if (name.length >= 3) base else base * name.length / 3
    val words = question.toLowerCase.split("[^a-z0-9_]+").toSet
    val n = name.toLowerCase
    // exact match of the full name OR any >=4-char underscore segment
    // (column prefixes like c_/o_ must not block "mktsegment" hits),
    // tolerating singular/plural, excluding generic words
    def hit(p: String) = words.contains(p) || words.contains(p + "s") ||
      (p.endsWith("s") && words.contains(p.dropRight(1)))
    // A FULL-name word match outranks a segment match: "maximum score"
    // must pick column `score` (140) over `score_id` (whose `score`
    // segment also hits, 125) instead of tying and falling to schema
    // order.
    if (n.length >= 4 && !genericWords(n) && hit(n)) math.min(140, damped + 40)
    else {
      val parts = n.split('_').toSeq.filter(_.length >= 4).filterNot(genericWords)
      if (parts.exists(hit)) math.min(125, damped + 25) else damped
    }
  }

  /** Score a table for a question: max of the table-name score and any
    * column-name score (ref nl2sql.py:23-33). */
  def tableScore(question: String, table: String, columns: Seq[String]): Int = {
    val t = nameScore(table, question)
    val c = if (columns.isEmpty) 0 else columns.map(nameScore(_, question)).max
    math.max(t, c)
  }

  /**
   * Prune a schema to the top-4 tables and top-8 columns per table, always
   * appending `id` / `{table}_id` when present (ref nl2sql.py:23-46).
   */
  def selectRelevant(question: String, schema: Map[String, Seq[String]]): SchemaSlice = {
    val qWords = question.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSet
    val tables = schema.toSeq
      .map { case (t, cols) => (t, cols, tableScore(question, t, cols)) }
      // Tied link scores break by (1) EXACT question-word presence of the
      // table name — "records in customers?" must pick `customers`, not
      // its singular sibling `customer`, which the plural-tolerant
      // nameScore ties at 140 — then (2) the fuzzy table-name score
      // ("count how many items per category" names `items`), then (3)
      // table WIDTH: when only shared COLUMNS matched ("average price
      // per category" over items(id, category, price) AND
      // sales(invoiceno, …, category, quantity, price, invoicedate,
      // mall)), the measure the question aggregates lives in the
      // transactional fact table, and fact tables are wide while
      // lookup/dimension tables are narrow. Alphabetical order used to
      // answer such questions from the dimension.
      .sortBy { case (t, cols, score) =>
        (-score, if (qWords.contains(t.toLowerCase)) 0 else 1,
          -nameScore(t, question), -cols.length, t) }
      .take(TopTables)
    val sliced = tables.map { case (t, cols, _) =>
      val ranked = cols
        .map(c => (c, nameScore(c, question)))
        .sortBy { case (c, s) => (-s, cols.indexOf(c)) }
        .take(TopColumns)
        .map(_._1)
      val ids = cols.filter(c => c == "id" || c == s"${t}_id").filterNot(ranked.contains)
      t -> (ranked ++ ids)
    }
    // ListMap preserves the relevance ranking: template generators decay
    // confidence by slice position (intentCandidates' tableRank), so a
    // plain Map's hash order silently re-ranked tied candidates.
    SchemaSlice(scala.collection.immutable.ListMap(sliced: _*))
  }
}
