package graft.gen

/**
 * Candidate ranking (N11 in SURVEY.md §2.9; ref
 * `app/models/inference.py:283-313`): base confidence + 0.1 per referenced
 * relevant table + 0.1 if the SQL joins; capped at 1.0; sorted descending.
 */
object Ranker {

  def score(c: Templates.Candidate, relevantTables: Set[String]): Double = {
    val lower = c.sql.toLowerCase
    // word-boundary match: `region` inside `n_regionkey` is not a table
    // mention (the reference's substring check has that flaw)
    val tableBonus = relevantTables.count { t =>
      raw"\b${java.util.regex.Pattern.quote(t.toLowerCase)}\b".r.findFirstIn(lower).isDefined
    } * 0.1
    val joinBonus = if (lower.contains(" join ")) 0.1 else 0.0
    math.min(1.0, c.confidence + tableBonus + joinBonus)
  }

  def rank(cs: Seq[Templates.Candidate], relevantTables: Set[String]): Seq[(Templates.Candidate, Double)] =
    // base confidence breaks ranked-score ties: the 1.0 cap would
    // otherwise erase template specificity (a 0.92 conjunctive template
    // and a 0.9 general one both cap at 1.0 with full bonuses, and the
    // general one could win on the SQL-text tiebreak — serving a
    // silently weaker reading of the question)
    cs.map(c => c -> score(c, relevantTables))
      .sortBy { case (c, s) => (-s, -c.confidence, c.sql) }
}
