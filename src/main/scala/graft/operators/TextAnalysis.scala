package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.doc_fingerprint

/**
 * Text-analysis operators for training-data pipelines (north-star
 * extension): token counting, quality scoring, language identification,
 * document fingerprinting. All are built-in-function compositions or a
 * single custom expression — fully codegen-compatible, no UDFs, so the
 * whole pipeline stays in one whole-stage-codegen span per scan.
 */
object TextAnalysis {

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: word pieces + punctuation as separate
    * tokens (`\w+` runs and single non-space symbols). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / total)
  }

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, "[0-9]", ""))).cast("double") / total)
  }

  /** Mean word length over whitespace tokens. */
  def avgWordLen(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit(0.0))
      .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / toks)
  }

  // Small deterministic stopword lists per language (public common-word
  // lists; enough for an n-gram/stopword-hit language heuristic).
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on", "are", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por", "un", "una", "con", "para"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "est", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "im", "ein", "auf"),
    "it" -> Seq("il", "la", "di", "che", "e", "in", "un", "una", "per", "con", "del", "sono", "le", "si"),
    "pt" -> Seq("o", "a", "de", "que", "e", "em", "do", "da", "um", "uma", "com", "para", "os", "as"))

  /** Count of distinct stopword hits for one language. */
  private def hits(tokens: Column, lang: String): Column =
    size(array_intersect(tokens, array(stopwords(lang).map(lit): _*)))

  /**
   * Heuristic language ID: argmax of distinct stopword hits; ties break
   * alphabetically; zero hits → "und" (undetermined). Deterministic.
   */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val langs = stopwords.keys.toSeq.sorted
    // One struct per language: (hits, priority, lang). array_max compares
    // fields left-to-right, so the winner has max hits; ties pick the max
    // priority = FIRST alphabetical language. Each language's hit count is
    // evaluated once (6 array_intersects total per row).
    val scored = langs.zipWithIndex.map { case (l, i) =>
      struct(hits(toks, l).as("hits"), lit(langs.size - 1 - i).as("pri"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /**
   * Composite quality score in [0, 1]: length band + word-shape band −
   * punctuation/digit noise. Deterministic arithmetic (expressible in
   * ANSI SQL for oracle checks).
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4
    val toks = tokenCount(text).cast("double")
    val wordScore = least(toks / 100.0, lit(1.0)) * 0.3
    val awl = avgWordLen(text)
    val shapeScore = when(awl >= 3 && awl <= 10, lit(0.3)).otherwise(lit(0.1))
    val noise = (punctRatio(text) + digitRatio(text)) * 0.5
    round(greatest(lit(0.0), least(lit(1.0), lenScore + wordScore + shapeScore - noise)), 4)
  }

  /** Full per-document analysis projection over a documents table. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      bpeishTokenCount(col(textCol)).as("n_subtokens"),
      round(punctRatio(col(textCol)), 4).as("punct_ratio"),
      round(digitRatio(col(textCol)), 4).as("digit_ratio"),
      round(avgWordLen(col(textCol)), 4).as("avg_word_len"),
      langId(col(textCol)).as("lang_pred"),
      qualityScore(col(textCol)).as("quality"),
      doc_fingerprint(col(textCol)).as("fingerprint"))
}
