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
        val filter = renderFilter(f.filter)
        val proj = f.projection.map("\"" + _ + "\"").mkString("[", ", ", "]")
        val sort = f.sort.map { case (p, asc) => s""""$p": ${if (asc) 1 else -1}""" }
          .mkString("{", ", ", "}")
        s"""{"collection": "$collection", "find": $filter, "projection": $proj, "sort": $sort, "limit": ${f.limit}}"""
      case Right(stages) =>
        val rendered = stages.map {
          case MatchStage(ps) => s"""{"$$match": ${renderFilter(ps)}}"""
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
          case UnwindStage(p) => s"""{"$$unwind": "$$$p"}"""
        }.mkString("[", ", ", "]")
        s"""{"collection": "$collection", "pipeline": $rendered}"""
    }
  }

  private def predPath(p: Pred): String = p match {
    case Eq(path, _) => path
    case Ne(path, _) => path
    case Gt(path, _) => path
    case Gte(path, _) => path
    case Lt(path, _) => path
    case Lte(path, _) => path
    case In(path, _) => path
    case ExistsP(path) => path
    case MissingP(path) => path
    case Contains(path, _) => path
  }

  /** The operator fragment (the {...} body) of a non-Eq predicate. */
  private def predOps(p: Pred): String = p match {
    case Ne(_, v) => s""""$$ne": ${lit(v)}"""
    case Gt(_, v) => s""""$$gt": ${lit(v)}"""
    case Gte(_, v) => s""""$$gte": ${lit(v)}"""
    case Lt(_, v) => s""""$$lt": ${lit(v)}"""
    case Lte(_, v) => s""""$$lte": ${lit(v)}"""
    case In(_, vs) => s""""$$in": ${vs.map(lit).mkString("[", ", ", "]")}"""
    case ExistsP(_) => s""""$$exists": true"""
    case MissingP(_) => s""""$$exists": false"""
    case Contains(_, s) => s""""$$regex": ${lit(s)}"""
    // only reached when another predicate shares the path — the bare
    // literal form would collide, the explicit $eq merges cleanly
    case Eq(_, v) => s""""$$eq": ${lit(v)}"""
  }

  /** Predicates as one JSON object. Predicates sharing a path (a closed
    * range: $gte + $lte) merge into ONE operator object — duplicate
    * keys would be invalid JSON, and a last-key-wins consumer would
    * silently drop the lower bound. */
  private def renderFilter(ps: Seq[Pred]): String = {
    val byPath = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Pred]]
    ps.foreach(p => byPath.updateWith(predPath(p))(v => Some(v.getOrElse(Vector.empty) :+ p)))
    byPath.map {
      case (path, Vector(Eq(_, v))) => s""""$path": ${lit(v)}"""
      case (path, preds) => s""""$path": ${preds.map(predOps).mkString("{", ", ", "}")}"""
    }.mkString("{", ", ", "}")
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
  // "score between 5 and 10" → a closed range ($gte + $lte on one path)
  private val betweenRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+(?:is\s+)?between\s+(\d+(?:\.\d+)?)\s+and\s+(\d+(?:\.\d+)?)\b".r
  // "city is not lima" → $ne (eqRe's nonValues guard keeps it from
  // fabricating Eq(city, "not"); this regex serves the intent). The
  // lookahead declines "is not v1 or v2" — Ne(f, v1) alone would
  // silently include v2 rows, and there is no $nin Pred to serve it —
  // so the builder answers unfiltered rather than wrong.
  private val notEqRe =
    raw"(?i)\b([a-z_][a-z0-9_.]*)\s+is\s+not\s+([A-Za-z0-9][\w+-]*)\b(?!\s+or\b)".r
  // "city is lima or quito (or cusco)" → $in list
  private val inListRe =
    (raw"(?i)\b([a-z_][a-z0-9_.]*)\s+is\s+(?:either\s+)?([A-Za-z0-9][\w+-]*)" +
      raw"\s+or\s+([A-Za-z0-9][\w+-]*)(?:\s+or\s+([A-Za-z0-9][\w+-]*))?\b").r
  // "age is 25 or older" / "score is 90 or higher" → an inclusive bound
  // (the bare Eq would wrongly pin the boundary value only, and the $in
  // guard rightly refuses the comparative word as a literal)
  private val orCmpRe =
    (raw"(?i)\b([a-z_][a-z0-9_.]*)\s+is\s+(\d+(?:\.\d+)?)\s+or\s+" +
      raw"(older|higher|more|greater|larger|bigger|above|over|" +
      raw"younger|lower|less|fewer|smaller|below|under)\b").r
  // "bottom 5 by score" / "lowest 3 users by age" → ascending sort+limit
  private val bottomRe =
    raw"(?i)\b(?:bottom|lowest)\s+(\d+)\b".r
  private val aggRe =
    raw"(?i)\b(average|avg|mean|total|sum|maximum|max|highest|minimum|min|lowest)\s+(?:of\s+)?([a-z_][a-z0-9_.]*)\b".r

  // "the most common tag" / "the most frequent city" → group-count
  // argmax; array fields go through $unwind first (one document per
  // element), scalar fields group directly
  private val mostCommonRe =
    raw"(?i)\bthe\s+most\s+(?:common|frequent)\s+([a-z_][a-z0-9_.]*)\b".r

  // "how many distinct cities" → two chained $group stages (the Mongo
  // distinct-count idiom: group on the field, then count the groups)
  private val distinctCountRe =
    raw"(?i)\bhow\s+many\s+(?:distinct|different|unique)\s+([a-z_][a-z0-9_.]*)\b".r

  private def numeric(s: String): Any =
    if (s.contains('.')) s.toDouble else s.toLong

  /** Filter predicates from the question, against strongly-linked
    * fields only (the same no-fabrication bar as the SQL templates). */
  private[gen] def extractPreds(question: String, fields: Seq[String]): Seq[Pred] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Pred]
    // closed range first: both bounds land on one path under distinct
    // keys, and the remaining single-bound regexes cannot match the
    // "between A and B" phrasing
    for (m <- betweenRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)) {
      out.getOrElseUpdate(f + " lo", Gte(f, numeric(m.group(2))))
      out.getOrElseUpdate(f + " hi", Lte(f, numeric(m.group(3))))
    }
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
      "older", "younger", "newer", "earlier", "later", "better", "worse",
      "the", "a", "an")
    // the inclusive-bound, negation, and disjunction forms claim the
    // field BEFORE the equality regex can read their first value word
    // as an Eq literal
    for (m <- orCmpRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)) {
      val gte = Set("older", "higher", "more", "greater", "larger", "bigger",
        "above", "over")(m.group(3).toLowerCase)
      out.getOrElseUpdate(f,
        if (gte) Gte(f, numeric(m.group(2))) else Lte(f, numeric(m.group(2))))
    }
    for (m <- notEqRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)
         if !nonValues(m.group(2).toLowerCase))
      out.getOrElseUpdate(f,
        if (m.group(2).matches(raw"\d+(\.\d+)?")) Ne(f, numeric(m.group(2)))
        else Ne(f, m.group(2)))
    for (m <- inListRe.findAllMatchIn(question); f <- strongField(m.group(1), fields)) {
      val vs = Seq(m.group(2), m.group(3)) ++ Option(m.group(4)).toSeq
      if (vs.forall(v => !nonValues(v.toLowerCase)))
        out.getOrElseUpdate(f, In(f, vs.map(v =>
          if (v.matches(raw"\d+(\.\d+)?")) numeric(v) else v)))
    }
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

  // "top 3 cities by average age" — grouped aggregate ranked by the
  // aggregate itself (the doc-side analogue of the SQL agg-top-N
  // template); "bottom" flips the direction
  private val aggTopRe =
    (raw"(?i)\b(top|bottom)\s+(\d+)\s+([a-z_][a-z0-9_.]*)\s+by\s+" +
      raw"(average|avg|mean|total|sum|maximum|max|highest|minimum|min|lowest)\s+" +
      raw"(?:of\s+)?([a-z_][a-z0-9_.]*)\b").r

  // "cities with average age above 30" — a post-$group $match (the
  // HAVING analogue; ref nl2mongo.py:64-116 serves it as
  // [$group, $match] through the LLM)
  private val groupHavingRe =
    (raw"(?i)\b([a-z_][a-z0-9_.]*)\s+with\s+(?:an?\s+)?(average|avg|mean|total|sum)\s+" +
      raw"([a-z_][a-z0-9_.]*)\s+(above|over|below|under)\s+(\d+(?:\.\d+)?)\b").r

  /** Build the document query for a linked collection. */
  def build(question: String, collection: String, fields: Seq[String]): DocQuery =
    build(question, collection, fields, Set.empty)

  /** Variant carrying the collection's top-level ARRAY fields: the
    * most-common shape $unwinds an array field before grouping (the
    * reference's tag-counting pipeline shape, ref
    * app/ai/nl2mongo.py:64-116); a scalar field groups directly. The
    * set gates fabrication — $unwind is only ever emitted for a field
    * the inferred schema proves is an array. */
  def build(question: String, collection: String, fields: Seq[String],
      arrayFields: Set[String]): DocQuery = {
    // most-common FIRST among the pipeline shapes that name a field
    // word ("the most common tag among users" must not read "tag" as a
    // projection or an aggregate target)
    for (m <- mostCommonRe.findFirstMatchIn(question)) {
      val w = m.group(1)
      val cands = (Seq(w, w + "s", w + "es") ++
        (if (w.endsWith("s")) Seq(w.dropRight(1)) else Nil)).distinct
      for (f <- cands.flatMap(strongField(_, fields)).headOption) {
        val unwind: Seq[Stage] =
          if (arrayFields.contains(f)) Seq(UnwindStage(f)) else Nil
        return DocQuery(collection, Right(unwind ++ Seq(
          GroupStage(Some(f), Seq(("agg_value", "count", "*"))),
          SortStage(Seq(("agg_value", false), ("_id", true))),
          LimitStage(1))))
      }
    }
    // distinct-count BEFORE the generic count path ("how many" alone
    // would read as a row count, silently ignoring the distinct word)
    for (m <- distinctCountRe.findFirstMatchIn(question)) {
      val w = m.group(1)
      val cands = (Seq(w, w + "s", w + "es") ++
        (if (w.endsWith("ies")) Seq(w.dropRight(3) + "y") else Nil) ++
        (if (w.endsWith("s")) Seq(w.dropRight(1)) else Nil)).distinct
      for (f <- cands.flatMap(strongField(_, fields)).headOption)
        return DocQuery(collection, Right(Seq(
          GroupStage(Some(f), Seq(("agg_value", "count", "*"))),
          GroupStage(None, Seq(("agg_value", "count", "*"))))))
    }
    // post-group filter FIRST: its measure phrase ("average age above
    // 30") would otherwise be read as a row-level range pred — the
    // wrong stage order (filter-then-group instead of group-then-
    // filter) with silently different semantics
    for (m <- groupHavingRe.findFirstMatchIn(question)) {
      def sing(w: String): Seq[String] =
        Seq(w) ++ (if (w.endsWith("ies")) Seq(w.dropRight(3) + "y") else Nil) ++
          (if (w.endsWith("es")) Seq(w.dropRight(2)) else Nil) ++
          (if (w.endsWith("s")) Seq(w.dropRight(1)) else Nil)
      val resolved = for {
        groupF <- sing(m.group(1)).flatMap(strongField(_, fields)).headOption
        aggF <- strongField(m.group(3), fields)
        if aggF != groupF
      } yield {
        val op = m.group(2).toLowerCase match {
          case "total" | "sum" => "sum"
          case _ => "avg"
        }
        val bound = numeric(m.group(5))
        val pred: Pred =
          if (Set("above", "over")(m.group(4).toLowerCase)) Gt("agg_value", bound)
          else Lt("agg_value", bound)
        DocQuery(collection, Right(Seq(
          GroupStage(Some(groupF), Seq(("agg_value", op, aggF))),
          MatchStage(Seq(pred)),
          SortStage(Seq(("_id", true))))))
      }
      resolved.foreach(q => return q)
    }
    val preds = extractPreds(question, fields)
    // the group noun is naturally plural ("top 3 cities"); the field is
    // singular — link the word, then its naive singulars
    def singulars(w: String): Seq[String] =
      Seq(w) ++ (if (w.endsWith("ies")) Seq(w.dropRight(3) + "y") else Nil) ++
        (if (w.endsWith("es")) Seq(w.dropRight(2)) else Nil) ++
        (if (w.endsWith("s")) Seq(w.dropRight(1)) else Nil)
    val aggTop = for {
      m <- aggTopRe.findFirstMatchIn(question)
      groupF <- singulars(m.group(3)).flatMap(strongField(_, fields)).headOption
      aggF <- strongField(m.group(5), fields)
    } yield (m.group(1).equalsIgnoreCase("top"), m.group(2).toInt, groupF,
      m.group(4).toLowerCase, aggF)
    val groupPath = aggTop.map(_._3).orElse(perRe.findFirstMatchIn(question)
      .flatMap(m => strongField(m.group(1), fields)))
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
        // agg-top-N ranks groups BY THE AGGREGATE (desc for "top") and
        // cuts at N; a plain grouped aggregate sorts by key for
        // deterministic output
        val tail = aggTop match {
          case Some((desc, n, _, _, _)) =>
            Seq(SortStage(Seq(("agg_value", !desc), ("_id", true))), LimitStage(n))
          case None if groupPath.isDefined => Seq(SortStage(Seq(("_id", true))))
          case None => Nil
        }
        DocQuery(collection,
          Right(matchStage ++ Seq(GroupStage(groupPath, Seq(a))) ++ tail))
      case None =>
        val bottom = bottomRe.findFirstMatchIn(question)
        val limit = topRe.findFirstMatchIn(question).map(_.group(1).toInt)
          .orElse(bottom.map(_.group(1).toInt))
          .getOrElse(DefaultLimit)
        val sortField = byFieldRe.findAllMatchIn(question).toSeq.iterator
          .flatMap(m => strongField(m.group(1), fields)).to(LazyList).headOption
        // "top N by f" reads as descending, "bottom N by f" ascending;
        // a bare "sorted by f" ascending
        val sort = sortField.map(f =>
          (f, bottom.isDefined || topRe.findFirstIn(question).isEmpty)).toSeq
        // project the fields the question names, if any (plus _id via find)
        val words = question.toLowerCase.split("[^a-z0-9_.]+").toSet
        val proj = fields.filter(f => words.contains(f.toLowerCase) ||
          words.contains(f.split('.').last.toLowerCase))
        DocQuery(collection, Left(FindSpec(preds, proj, sort, limit)))
    }
  }
}
