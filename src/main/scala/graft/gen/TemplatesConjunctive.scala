package graft.gen

import graft.core.{FkEdge, SchemaSlice}

/**
 * Conjunctive-constraints lister — the first template shape demanded by
 * the EXTERNAL evaluation set rather than the self-authored ladder
 * (`eval/ExternalEval.scala`): the reference team's own published pilot
 * questions are multi-constraint conversational listings —
 *
 *   "List students who received a C but have a numeric score above 75."
 *     (reference README.md:170)
 *   "List students who took course X in Fall 2015 with a grade of C but
 *    a score < 75."  (reference Deliverables/Report 1 §5)
 *
 * — i.e. an ENTITY plus an arbitrary conjunction of constraints, each
 * grounded a different way: comparator + number → a fuzzy-linked
 * numeric column; a capitalized literal → a value-domain lookup across
 * the schema (the reference grounds literals through sampled unique
 * values the same way, `app/schema/crawler.py:146-169` +
 * `app/ai/nl2sql.py:30-46`); a bare year → a year-named column. This is
 * deliberately NOT a per-question regex: it detects constraints
 * generically and only fires when the whole conjunction resolves.
 *
 * Projection follows the reference's own published convention (both its
 * worked examples project this way): the entity's key and name plus
 * every fact-table column EXCEPT the join key to the entity (redundant
 * with the entity key); tables joined only to ground a literal (e.g.
 * courses for title = 'X') contribute a filter, not columns.
 *
 * Guardrails against hijacking simpler questions: requires a
 * dimension-entity word, a fact table FK-linked to it, and at least TWO
 * resolved constraints; confidence 0.89 sits below every exact-shape
 * ladder template (0.9+), so those still win their own questions.
 */
private[gen] trait TemplatesConjunctive { this: Templates.type =>

  private[gen] val conjNumRe =
    (raw"(?i)\b([a-z][a-z_ ]*?)\s*(above|over|below|under|more than|greater than|" +
      raw"less than|at least|at most|>=|<=|>|<)\s*(\d+(?:\.\d+)?)\b").r

  private[gen] def conjOp(word: String): String = word.toLowerCase match {
    case "above" | "over" | "more than" | "greater than" | ">" => ">"
    case "below" | "under" | "less than" | "<" => "<"
    case "at least" | ">=" => ">="
    case "at most" | "<=" => "<="
    case other => other
  }

  /** One resolved constraint: SQL condition over `table`. */
  private[gen] final case class ConjConstraint(table: String, sql: String)

  /** "How many ORDERS per CUSTOMER?" — counting FACT rows grouped by
    * the FK to a named dimension. The second external-demanded shape
    * (`ExternalEval` p3, phrased from the reference's own keyword
    * inventory `app/ai/nl2sql.py:55` "how many" + `query_intent.py`
    * "per"): fuzzy table selection alone ranks the DIMENSION table
    * first (its name appears verbatim), producing a vacuous
    * one-row-per-entity count; the counted noun naming a FACT table
    * with an FK to the per-noun's table is the disambiguating signal.
    * Anchored at question end so multi-word ladder phrasings ("per
    * student name") keep their join-grouped handling; grouping is by
    * the FK column itself (`customer_id`), the grain the question
    * names. Emits the same SQL as the local grouped template when the
    * per-noun resolves to a key column (ladder `count of suppliers per
    * nationkey` is byte-identical), so the shapes cannot disagree. */
  private[gen] val countPerFkRe =
    raw"(?i)\b(?:how many|count of|number of)\s+([a-z0-9_]+)\s+(?:per|for each|by)\s+([a-z0-9_]+)\s*[?.]?\s*$$".r

  def countPerFkCandidates(slice: SchemaSlice, fks: Seq[FkEdge],
      question: String): Seq[Candidate] =
    countPerFkRe.findFirstMatchIn(question).toSeq.flatMap { m =>
      val dimWord = m.group(2)
      def score(t: String, w: String) = graft.link.Fuzzy.nameScore(t, w)
      val pairs = for {
        f <- slice.tables.keySet.toSeq.sorted if score(f, m.group(1)) >= 100
        e <- fks.filter(e => e.fromTable == f &&
          slice.tables.contains(e.toTable) && score(e.toTable, dimWord) >= 100)
      } yield (f, e)
      pairs.sortBy { case (_, e) =>
        (if (e.toTable.equalsIgnoreCase(dimWord)) 0 else 1, -score(e.toTable, dimWord))
      }.headOption.toSeq.map { case (f, e) =>
        Candidate(
          s"SELECT ${e.fromColumn}, COUNT(*) AS agg_value FROM $f " +
            s"GROUP BY ${e.fromColumn} ORDER BY ${e.fromColumn} LIMIT $DefaultLimit",
          0.88, "template_count_per_fk")
      }
    }

  /** Anti-join LISTING: "students who have no enrollments" — the row
    * form of the existing anti-join COUNT shape (which stays at 0.9 and
    * wins "number of X that have no Y" questions). The relative pronoun
    * is REQUIRED so aggregate phrasings ("fraction of courses have no A
    * grades") never match. Third external-demanded shape
    * (`ExternalEval` p5; the reference's null/anti keyword class,
    * `app/ai/query_intent.py:249`). */
  private[gen] val antiJoinListRe =
    (raw"(?i)\b([a-z_][a-z0-9_]*)\s+(?:that|which|who)\s+" +
      raw"(?:have|has)\s+no\s+([a-z_][a-z0-9_]*)\b").r

  def antiJoinListCandidates(slice: SchemaSlice, fks: Seq[FkEdge],
      question: String): Seq[Candidate] =
    antiJoinListRe.findFirstMatchIn(question).toSeq.flatMap { m =>
      def table(word: String): Option[String] = {
        val scored = slice.tables.keySet.toSeq
          .map(t => t -> graft.link.Fuzzy.nameScore(t, word))
          .filter(_._2 >= 100).sortBy { case (t, s) => (-s, t) }
        scored.headOption.filter { case (_, s) =>
          scored.drop(1).headOption.forall(_._2 < s)
        }.map(_._1)
      }
      for {
        dim <- table(m.group(1)).toSeq
        fact <- table(m.group(2)).toSeq
        if dim != fact
        e <- fks.find(e => e.fromTable == fact && e.toTable == dim).toSeq
      } yield {
        val sel = (Seq(s"d.${e.toColumn}") ++
          nameishColumn(slice.tables(dim)).map(nc => s"d.$nc")).mkString(", ")
        Candidate(
          s"SELECT $sel FROM $dim d WHERE NOT EXISTS " +
            s"(SELECT 1 FROM $fact f WHERE f.${e.fromColumn} = d.${e.toColumn}) " +
            s"ORDER BY d.${e.toColumn}",
          0.88, "template_anti_join_list")
      }
    }

  /** Bare "Show me COURSES" — the reference's own training-question
    * template (`app/models/trainer.py:282-285`: question "Show me
    * {table}", gold = first-5-columns preview). Matches ONLY a
    * command verb plus a single table word, so any richer question
    * falls through to the shapes that parse it; without this, the
    * generic FK-join candidate (0.6) outranks the table preview (0.5)
    * and a bare table request answers with a join. */
  private[gen] val showTableRe =
    raw"(?i)^\s*(?:show me|show|list)\s+(?:all\s+)?([a-z0-9_]+)\s*[?.!]?\s*$$".r

  def showTableCandidates(slice: SchemaSlice, question: String): Seq[Candidate] =
    showTableRe.findFirstMatchIn(question).toSeq.flatMap { m =>
      uniqueTable(slice, m.group(1)).toSeq.map { t =>
        val colSeq = slice.tables(t).take(5)
        val cols = colSeq.mkString(", ")
        // deterministic LIMIT window (same discipline as tableCandidates)
        val order = (Seq(keyishColumn(t, slice.tables(t))) ++ colSeq)
          .distinct.mkString(", ")
        Candidate(s"SELECT $cols FROM $t ORDER BY $order LIMIT $DefaultLimit",
          0.88, "template_show_table")
      }
    }

  /** "Show flights FROM Paris TO Rome" — route questions over tables
    * whose endpoint columns follow the from-/to- abbreviation
    * convention the reference documents for its own travel schema
    * ("fcity" not "fromCity", "tcity" not "toCity" —
    * `app/ai/nl2sql.py:75`). Both endpoint literals must sit in the
    * VALUE DOMAIN of a from-ish and a to-ish column of the same table
    * (initial 'f'/'t' or src/origin/depart vs dst/dest/arriv naming),
    * so the shape never fabricates a route filter over unrelated
    * capitalized words. */
  private[gen] val fromToRe =
    raw"\bfrom\s+([A-Z][\w-]*)\s+to\s+([A-Z][\w-]*)".r

  def fromToCandidates(slice: SchemaSlice, fks: Seq[FkEdge], question: String,
      values: String => Map[String, Seq[String]] = _ => Map.empty): Seq[Candidate] =
    fromToRe.findFirstMatchIn(question).toSeq.flatMap { m =>
      val (v1, v2) = (m.group(1), m.group(2))
      def fromish(c: String) = c.toLowerCase.startsWith("f") ||
        Seq("src", "origin", "depart").exists(c.toLowerCase.contains)
      def toish(c: String) = c.toLowerCase.startsWith("t") ||
        Seq("dst", "dest", "arriv").exists(c.toLowerCase.contains)
      slice.tables.keySet.toSeq.sorted.flatMap { t =>
        val dom = values(t)
        for {
          cf <- slice.tables(t).find(c => fromish(c) && dom.get(c).exists(_.contains(v1)))
          ct <- slice.tables(t).find(c => c != cf && toish(c) &&
            dom.get(c).exists(_.contains(v2)))
        } yield Candidate(
          // SELECT * — the slice may have pruned columns, and a route
          // listing answers with the full record
          s"SELECT * FROM $t WHERE $cf = ${sqlLit(v1)} AND $ct = ${sqlLit(v2)}",
          0.88, "template_from_to")
      }.take(1)
    }

  /** Single-sided route filter: "flights FROM Paris" / "how many flights
    * from Paris" — the from-endpoint literal must sit in the value
    * domain of a from-ish column (same evidence bar as [[fromToCandidates]],
    * one endpoint). Count questions get the COUNT shape; others list. */
  private[gen] val fromOnlyRe = raw"\bfrom\s+([A-Z][\w-]*)\b(?!\s+to\b)".r

  def fromOnlyCandidates(slice: SchemaSlice, question: String,
      values: String => Map[String, Seq[String]] = _ => Map.empty): Seq[Candidate] = {
    // a destination ANYWHERE after the origin ("from Paris To Rome",
    // "from Paris arriving to Rome") makes this a two-endpoint route
    // question — answering it with the origin filter alone would be a
    // confident wrong answer, so this shape stays silent and the
    // fromTo template (or nothing) owns it. The destination literal is
    // capitalized (same evidence bar as fromToRe); 'to'/'To' both count
    // (the adjacent-only lookahead missed a capitalized 'To').
    if (raw"\b[Tt]o\s+[A-Z]".r.findFirstIn(question).isDefined) return Seq.empty
    // lowercase destination ("how many flights from Paris going to
    // rome"): also stay silent when a 'to <word>' word resolves — case-
    // insensitively — in a to-ish column's value domain, mirroring the
    // fromTo evidence bar; an origin-only COUNT for a two-endpoint
    // route question would be a confident wrong answer (ADVICE r12 #5)
    // 'to'/'To' both count (same note as the capitalized guard above)
    val lowerDests = raw"\b[Tt]o\s+([a-z][\w-]*)".r
      .findAllMatchIn(question).map(_.group(1)).toSeq
    def toishCol(c: String) = c.toLowerCase.startsWith("t") ||
      Seq("dst", "dest", "arriv").exists(c.toLowerCase.contains)
    if (lowerDests.nonEmpty && slice.tables.keySet.toSeq.sorted.exists { t =>
        val dom = values(t)
        slice.tables(t).exists(c => toishCol(c) && dom.get(c).exists(vs =>
          lowerDests.exists(d => vs.exists(_.equalsIgnoreCase(d)))))
      }) return Seq.empty
    fromOnlyRe.findFirstMatchIn(question).toSeq.flatMap { m =>
      val v = m.group(1)
      def fromish(c: String) = c.toLowerCase.startsWith("f") ||
        Seq("src", "origin", "depart").exists(c.toLowerCase.contains)
      val isCount = raw"(?i)\b(how many|count|number of)\b".r.findFirstIn(question).isDefined
      slice.tables.keySet.toSeq.sorted.flatMap { t =>
        val dom = values(t)
        slice.tables(t).find(c => fromish(c) && dom.get(c).exists(_.contains(v))).map { cf =>
          if (isCount)
            Candidate(s"SELECT COUNT(*) AS agg_value FROM $t WHERE $cf = ${sqlLit(v)}",
              0.88, "template_from_only")
          else
            Candidate(s"SELECT * FROM $t WHERE $cf = ${sqlLit(v)}",
              0.87, "template_from_only")
        }
      }.take(1)
    }
  }

  def conjunctiveConstraintsCandidates(slice: SchemaSlice, fks: Seq[FkEdge],
      question: String,
      values: String => Map[String, Seq[String]] = _ => Map.empty): Seq[Candidate] = {
    val words = question.split("[^A-Za-z0-9_+'-]+").filter(_.nonEmpty).toSeq
    // ---- entity: first word naming a table that some fact FK-targets
    val entityOpt = words.iterator.map(w => uniqueTable(slice, w))
      .collectFirst { case Some(t) if fks.exists(e =>
        e.toTable == t && slice.tables.contains(e.fromTable)) => t }
    val entity = entityOpt.getOrElse(return Seq.empty)
    val facts = fks.filter(e => e.toTable == entity && slice.tables.contains(e.fromTable))
      .map(_.fromTable).distinct

    def resolve(fact: String): Option[(Seq[ConjConstraint], Seq[FkEdge])] = {
      val factCols = slice.tables.getOrElse(fact, Seq.empty)
      val entityCols = slice.tables.getOrElse(entity, Seq.empty)
      val dims = fks.filter(e => e.fromTable == fact && e.toTable != entity &&
        slice.tables.contains(e.toTable))
      var joins = Seq.empty[FkEdge]
      val out = Seq.newBuilder[ConjConstraint]
      var n = 0

      // numeric comparator constraints, fact columns preferred
      var numericCols = Set.empty[String]
      conjNumRe.findAllMatchIn(question).foreach { m =>
        val colWords = m.group(1).trim.split("\\s+").filterNot(w =>
          Set("a", "an", "the", "with", "but", "have", "has", "had", "of",
            "and", "or", "who", "that", "in", "is", "are", "was", "were")
            .contains(w.toLowerCase))
        val phrase2 = colWords.takeRight(2).mkString(" ")
        val phrase1 = colWords.takeRight(1).mkString
        // verb-form tolerance: "scored below 60" must reach the noun
        // column ("score") — try the raw phrase, then light de-inflection
        val hit = Seq(phrase2, phrase1).filter(_.nonEmpty)
          .flatMap(p => Seq(p, p.stripSuffix("ed"), p.stripSuffix("d")))
          .distinct.iterator
          .map { p =>
            strongColumn(p, factCols).map((fact, _))
              .orElse(strongColumn(p, entityCols).map((entity, _)))
          }.collectFirst { case Some(tc) => tc }
        hit.foreach { case (t, c) =>
          out += ConjConstraint(t, s"$c ${conjOp(m.group(2))} ${m.group(3)}")
          numericCols += c
          n += 1
        }
      }

      // capitalized literals grounded in value domains (bigrams first);
      // skip the leading command word and words that name schema elements
      val allCols = slice.tables.values.flatten.toSet
      // single letters ('a grade of C') always partial-match some table
      // name, so the schema-name exclusion only applies to real words
      def namesSchema(w: String) = w.length >= 2 &&
        (uniqueTable(slice, w).isDefined || allCols.exists(_.equalsIgnoreCase(w)))
      val capTokens = words.zipWithIndex.drop(1).collect {
        case (w, i) if w.headOption.exists(_.isUpper) && !namesSchema(w) => (w, i)
      }
      val searchTables = fact +: (entity +: dims.map(_.toTable))
      def domainHit(v: String): Option[(String, String)] =
        searchTables.iterator.flatMap { t =>
          values(t).collectFirst { case (c, vs) if vs.contains(v) => (t, c) }
        }.nextOption()
      var consumed = Set.empty[Int]
      // bigrams of adjacent capitalized tokens ("World History")
      capTokens.sliding(2).foreach {
        case Seq((w1, i1), (w2, i2)) if i2 == i1 + 1 && !consumed(i1) && !consumed(i2) =>
          domainHit(s"$w1 $w2").foreach { case (t, c) =>
            out += ConjConstraint(t, s"$c = ${sqlLit(s"$w1 $w2")}")
            consumed ++= Set(i1, i2); n += 1
            if (t != fact && t != entity)
              joins ++= dims.filter(_.toTable == t).take(1)
          }
        case _ =>
      }
      capTokens.foreach { case (w, i) =>
        if (!consumed(i)) domainHit(w).foreach { case (t, c) =>
          out += ConjConstraint(t, s"$c = ${sqlLit(w)}")
          consumed += i; n += 1
          if (t != fact && t != entity)
            joins ++= dims.filter(_.toTable == t).take(1)
        }
      }

      // a bare year binds to a year-named column, fact preferred; skip
      // numbers already used by a comparator constraint
      val comparatorNums = conjNumRe.findAllMatchIn(question).map(_.group(3)).toSet
      raw"\b(19|20)\d{2}\b".r.findAllIn(question).toSeq.distinct
        .filterNot(comparatorNums).foreach { y =>
          val yearCol = factCols.find(_.toLowerCase.contains("year"))
            .map((fact, _))
            .orElse(entityCols.find(_.toLowerCase.contains("year")).map((entity, _)))
          yearCol.foreach { case (t, c) =>
            if (!numericCols.contains(c)) { out += ConjConstraint(t, s"$c = $y"); n += 1 }
          }
        }

      val cs = out.result()
      if (n >= 2 && cs.exists(_.table == fact)) Some((cs, joins.distinct)) else None
    }

    // pick the fact where the conjunction resolves with the most pieces
    val resolved = facts.flatMap(f => resolve(f).map(f -> _))
      .sortBy { case (_, (cs, _)) => -cs.size }.headOption
    resolved.toSeq.flatMap { case (fact, (cs, dimJoins)) =>
      val eEdge = fks.find(e => e.toTable == entity && e.fromTable == fact)
        .getOrElse(return Seq.empty)
      val ePk = eEdge.toColumn
      val eName = nameishColumn(slice.tables(entity))
      val factCols = slice.tables(fact).filterNot(_ == eEdge.fromColumn)
      val entitySel = (Seq(s"e.$ePk") ++ eName.map(nc => s"e.$nc")).mkString(", ")
      val entityColSet = (Seq(ePk) ++ eName.toSeq).map(_.toLowerCase).toSet
      val factSel = factCols.map(c =>
        if (entityColSet.contains(c.toLowerCase)) s"f.$c AS ${fact}_$c" else s"f.$c")
        .mkString(", ")
      val dimSql = dimJoins.zipWithIndex.map { case (e, i) =>
        s"JOIN ${e.toTable} d$i ON d$i.${e.toColumn} = f.${e.fromColumn}"
      }.mkString(" ")
      val alias: String => String = t =>
        if (t == fact) "f" else if (t == entity) "e"
        else s"d${dimJoins.indexWhere(_.toTable == t)}"
      val where = cs.map(c => s"${alias(c.table)}.${c.sql}").mkString(" AND ")
      Seq(Candidate(
        s"SELECT $entitySel, $factSel FROM $fact f " +
          s"JOIN $entity e ON e.$ePk = f.${eEdge.fromColumn}" +
          (if (dimSql.isEmpty) "" else s" $dimSql") +
          s" WHERE $where ORDER BY e.$ePk",
        0.89, "template_conjunctive_constraints"))
    }
  }
}
