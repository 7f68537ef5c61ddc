package graft.gen

import graft.link.Fuzzy
import graft.sources.DocSource._

/**
 * Deterministic NL→document-query builder (N3/V11 composition; ref
 * `app/ai/nl2mongo.py:64-116` — the reference prompts an LLM for a
 * `{"collection": …, "find"/"pipeline": …}` JSON; here the same two
 * output shapes are produced deterministically from the question, the
 * way `Templates` mirrors the SQL prompt patterns).
 *
 * Collection linking reuses the N1–N3 fuzzy scores: a collection scores
 * as max(name score, best field score) — exactly the reference's
 * `select_slice` ranking (nl2mongo.py:40-49).
 *
 * The builder emits:
 *  - an AGGREGATE pipeline (`$match` → `$group` → `$sort`) when the
 *    question asks for count/avg/sum/min/max, optionally grouped by a
 *    "per <field>" phrase;
 *  - a FIND spec (filter/projection/sort/limit) otherwise, with
 *    "top N by <field>" driving sort+limit.
 *
 * Both run through [[graft.sources.DocSource]]'s executors, which are
 * read-only by construction (no statement surface at all), and the
 * result rides the `_id`-first JSON envelope.
 */
object Nl2Doc {

  /** One generated document query; `render` echoes the same JSON shape
    * the reference's LLM is asked for (its `query_dict`). */
  final case class DocQuery(collection: String, spec: Either[FindSpec, Seq[Stage]]) {
    def render: String = spec match {
      case Left(f) =>
        val filter = f.filter.map(renderPred).mkString("{", ", ", "}")
        val proj = f.projection.map("\"" + _ + "\"").mkString("[", ", ", "]")
        val sort = f.sort.map { case (p, asc) => s""""$p": ${if (asc) 1 else -1}""" }
          .mkString("{", ", ", "}")
        s"""{"collection": "$collection", "find": $filter, "projection": $proj, "sort": $sort, "limit": ${f.limit}}"""
      case Right(stages) =>
        val rendered = stages.map {
          case MatchStage(ps) => s"""{"$$match": ${ps.map(renderPred).mkString("{", ", ", "}")}}"""
          case GroupStage(gp, accs) =>
            val id = gp.map("\"$" + _ + "\"").getOrElse("null")
            val accsS = accs.map {
              case (n, "count", _) => s""""$n": {"$$count": {}}"""
              case (n, op, p) => s""""$n": {"$$$op": "$$$p"}"""
            }.mkString(", ")
            s"""{"$$group": {"_id": $id, $accsS}}"""
          case SortStage(keys) =>
            s"""{"$$sort": ${keys.map { case (p, asc) => s""""$p": ${if (asc) 1 else -1}""" }.mkString("{", ", ", "}")}}"""
          case LimitStage(n) => s"""{"$$limit": $n}"""
          case ProjectStage(ps) =>
            s"""{"$$project": ${ps.map(p => s""""$p": 1""").mkString("{", ", ", "}")}}"""
        }.mkString("[", ", ", "]")
        s"""{"collection": "$collection", "pipeline": $rendered}"""
    }
  }

  private def renderPred(p: Pred): String = p match {
    case Eq(path, v) => s""""$path": ${lit(v)}"""
    case Ne(path, v) => s""""$path": {"$$ne": ${lit(v)}}"""
    case Gt(path, v) => s""""$path": {"$$gt": ${lit(v)}}"""
    case Gte(path, v) => s""""$path": {"$$gte": ${lit(v)}}"""
    case Lt(path, v) => s""""$path": {"$$lt": ${lit(v)}}"""
    case Lte(path, v) => s""""$path": {"$$lte": ${lit(v)}}"""
    case In(path, vs) => s""""$path": {"$$in": ${vs.map(lit).mkString("[", ", ", "]")}}"""
    case ExistsP(path) => s""""$path": {"$$exists": true}"""
    case MissingP(path) => s""""$path": {"$$exists": false}"""
    case Contains(path, s) => s""""$path": {"$$regex": ${lit(s)}}"""
  }

  private def lit(v: Any): String = v match {
    case s: String => "\"" + s.replace("\"", "\\\"") + "\""
    case other => String.valueOf(other)
  }

  /** Best collection for the question by the reference's slice ranking:
    * max(collection-name score, best field score), requiring a real
    * signal (≥ the full-word bar on some name) so gibberish links
    * nothing. Ties break to the lexicographically first name. */
  def linkCollection(question: String,
      collections: Map[String, Seq[String]]): Option[String] =
    collections.toSeq
      .map { case (c, fields) => (c, Fuzzy.tableScore(question, c, fields)) }
      .sortBy { case (c, s) => (-s, c) }
      .headOption.filter(_._2 >= 100).map(_._1)

  /** Unique full-word field link (dotted paths match on their leaf
    * segment too: "age" → "user.age"). */
  private def strongField(word: String, fields: Seq[String]): Option[String] = {
    if (word.isEmpty) return None
    def score(f: String): Int =
      math.max(Fuzzy.nameScore(f, word),
        Fuzzy.nameScore(f.split('.').last, word))
    val scored = fields.map(f => f -> score(f)).sortBy { case (f, s) => (-s, f) }
    scored.headOption.filter { case (_, s) =>
      s >= 100 && scored.drop(1).headOption.forall(_._2 < s)
    }.map(_._1)
  }

  private val cmpRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+(?:is\s+)?(greater|more|higher|larger|bigger|less|fewer|lower|smaller)\s+than\s+(\d+(?:\.\d+)?)\b".r
  private val aboveRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+(?:is\s+)?(above|over|below|under)\s+(\d+(?:\.\d+)?)\b".r
  private val atRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+(?:is\s+)?at\s+(least|most)\s+(\d+(?:\.\d+)?)\b".r
  private val eqRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+(?:is|equals)\s+([A-Za-z0-9][\w+-]*)\b".r
  private val fromValRe =
    raw"(?i)\b(?:from|in)\s+([a-z0-9][\w+-]*)\s+([a-z_][a-z0-9_.]*)\b".r
  private val perRe =
    raw"(?i)\b(?:per|for each|grouped by)\s+([a-z_][a-z0-9_.]*)\b".r
  private val topRe =
    raw"(?i)\btop\s+(\d+)\b".r
  private val byFieldRe =
    raw"(?i)\b(?:by|sorted by|ordered by)\s+([a-z_][a-z0-9_.]*)\b".r
  private val countRe =
    raw"(?i)\b(?:how many|number of|count)\b".r
  // "missing email" / "without an email" / "have no email" → $exists: false
  private val missingRe =
    raw"(?i)\b(?:missing|without(?:\s+an?)?|(?:have|has|with)\s+no)\s+([a-z_][a-z0-9_.]*)\b".r
  // "have an email" / "has a city" → $exists: true ("with" stays out:
  // "people with score above 5" names a comparison, not existence)
  private val existsRe =
    raw"(?i)\b(?:have|has)\s+an?\s+([a-z_][a-z0-9_.]*)\b".r
  // "email containing gmail" / "name contains ann" → substring match
  private val containsRe =
    raw"""(?i)\b([a-z_][a-z0-9_.]*)\s+(?:containing|contains)\s+"?([\w@.+-]+)"?""".r
  private val aggRe =
    raw"(?i)\b(average|avg|mean|total|sum|maximum|max|highest|minimum|min|lowest)\s+(?:of\s+)?([a-z_][a-z0-9_.]*)\b".r

  private def numeric(s: String): Any =
    if (s.contains('.')) s.toDouble else s.toLong

  /** Filter predicates from the question, against strongly-linked
    * fields only (the same no-fabrication bar as the SQL templates). */
  private[gen] def extractPreds(question: String, fields: Seq[String]): Seq[Pred] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Pred]
    for (m <- cmpRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)) {
      val gt = Set("greater", "more", "higher", "larger", "bigger")(m.group(2).toLowerCase)
      out.getOrElseUpdate(f, if (gt) Gt(f, numeric(m.group(3))) else Lt(f, numeric(m.group(3))))
    }
    for (m <- atRe.findAllMatchIn(question); f <- strongField(m.group(1), fields))
      out.getOrElseUpdate(f,
        if (m.group(2).equalsIgnoreCase("least")) Gte(f, numeric(m.group(3)))
        else Lte(f, numeric(m.group(3))))
    for (m <- aboveRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)) {
      val gt = Set("above", "over")(m.group(2).toLowerCase)
      out.getOrElseUpdate(f, if (gt) Gt(f, numeric(m.group(3))) else Lt(f, numeric(m.group(3))))
    }
    // operator/connective words after "is" are never literal values —
    // "score is between 5 and 10" / "city is not lima" must not
    // fabricate Eq(score, "between") / Eq(city, "not")
    val nonValues = Set("not", "between", "in", "at", "least", "most",
      "above", "below", "over", "under", "greater", "less", "more",
      "fewer", "higher", "lower", "larger", "smaller", "bigger", "equal",
      "the", "a", "an")
    for (m <- eqRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)
         if strongField(m.group(2), fields).isEmpty &&
           !nonValues(m.group(2).toLowerCase))
      out.getOrElseUpdate(f,
        if (m.group(2).matches(raw"\d+(\.\d+)?")) Eq(f, numeric(m.group(2)))
        else Eq(f, m.group(2)))
    // value-first: "people from lima city" / "docs in the quito city"
    for (m <- fromValRe.findAllMatchIn(question); f <- strongField(m.group(2), fields)
         if strongField(m.group(1), fields).isEmpty)
      out.getOrElseUpdate(f, Eq(f, m.group(1)))
    // null checks and text containment (ref nl2mongo's LLM serves these
    // through $exists/$regex; DocSource.MissingP/Contains execute them)
    for (m <- missingRe.findAllMatchIn(question); f <- strongField(m.group(1), fields))
      out.getOrElseUpdate(f, MissingP(f))
    for (m <- existsRe.findAllMatchIn(question); f <- strongField(m.group(1), fields))
      out.getOrElseUpdate(f, ExistsP(f))
    for (m <- containsRe.findAllMatchIn(question); f <- strongField(m.group(1), fields))
      out.getOrElseUpdate(f, Contains(f, m.group(2)))
    out.values.toSeq
  }

  /** Build the document query for a linked collection. */
  def build(question: String, collection: String, fields: Seq[String]): DocQuery = {
    val preds = extractPreds(question, fields)
    val groupPath = perRe.findFirstMatchIn(question)
      .flatMap(m => strongField(m.group(1), fields))
    val acc: Option[(String, String, String)] =
      if (countRe.findFirstIn(question).isDefined) Some(("agg_value", "count", "*"))
      else aggRe.findAllMatchIn(question).toSeq.iterator.flatMap { m =>
        val op = m.group(1).toLowerCase match {
          case "average" | "avg" | "mean" => "avg"
          case "total" | "sum" => "sum"
          case "maximum" | "max" | "highest" => "max"
          case _ => "min"
        }
        strongField(m.group(2), fields).map(f => ("agg_value", op, f))
      }.to(LazyList).headOption
    acc match {
      case Some(a) =>
        val matchStage = if (preds.isEmpty) Nil else Seq(MatchStage(preds))
        val sortStage = if (groupPath.isDefined) Seq(SortStage(Seq(("_id", true)))) else Nil
        DocQuery(collection,
          Right(matchStage ++ Seq(GroupStage(groupPath, Seq(a))) ++ sortStage))
      case None =>
        val limit = topRe.findFirstMatchIn(question).map(_.group(1).toInt)
          .getOrElse(DefaultLimit)
        val sortField = byFieldRe.findAllMatchIn(question).toSeq.iterator
          .flatMap(m => strongField(m.group(1), fields)).to(LazyList).headOption
        // "top N by f" reads as descending; a bare "sorted by f" ascending
        val sort = sortField.map(f =>
          (f, topRe.findFirstIn(question).isEmpty)).toSeq
        // project the fields the question names, if any (plus _id via find)
        val words = question.toLowerCase.split("[^a-z0-9_.]+").toSet
        val proj = fields.filter(f => words.contains(f.toLowerCase) ||
          words.contains(f.split('.').last.toLowerCase))
        DocQuery(collection, Left(FindSpec(preds, proj, sort, limit)))
    }
  }
}
