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

  /** Single-pass counts struct (len, n_tokens, n_nonspace, n_punct,
    * n_digit) — see [[graft.functions.TextCounts]]; the ratio columns
    * below are arithmetic over its fields, value-identical to the
    * original regex compositions (TextFunctionsSpec asserts equality). */
  private def counts(text: Column): Column = graft.functions.text_counts(text)

  /** Whitespace token count (0 for blank text). */
  def tokenCount(text: Column): Column = counts(text).getField("n_tokens")

  /** BPE-ish subword token count: word pieces + punctuation as separate
    * tokens (`\w+` runs and single non-space symbols). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val c = counts(text)
    val total = c.getField("len")
    when(total === 0, lit(0.0)).otherwise(
      c.getField("n_punct").cast("double") / total)
  }

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column = {
    val c = counts(text)
    val total = c.getField("len")
    when(total === 0, lit(0.0)).otherwise(
      c.getField("n_digit").cast("double") / total)
  }

  /** Mean word length over whitespace tokens. */
  def avgWordLen(text: Column): Column = {
    val c = counts(text)
    val toks = c.getField("n_tokens")
    when(toks === 0, lit(0.0))
      .otherwise(c.getField("n_nonspace").cast("double") / toks)
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

  /**
   * Heuristic language ID: argmax of distinct stopword hits; ties break
   * alphabetically; zero hits → "und" (undetermined). Deterministic.
   * One custom expression (tokenize once, per-language stopword
   * bitmasks — [[graft.functions.LangIdHeuristic]]) instead of six
   * `array_intersect`s + a struct `array_max`, whose interpreted
   * set-building dominated the text-pipeline profile.
   */
  def langId(text: Column): Column =
    graft.functions.lang_id(text, stopwords.toSeq.sortBy(_._1))

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

  /**
   * Corpus vocabulary: top-`k` lowercase tokens by DOCUMENT frequency
   * (distinct documents containing the token) with total occurrence
   * counts — the corpus-statistics pass feeding tokenizer training and
   * stop-list mining. One explode + one partial-aggregated groupBy; the
   * top-k is a TakeOrderedAndProject, never a full sort.
   */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 100): DataFrame =
    df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token")
      .agg(countDistinct(col(idCol)).as("doc_freq"), count(lit(1)).as("term_freq"))
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(k)

  /**
   * Text normalization for curation: strip ASCII control characters
   * (except \t \n \r, which count as whitespace), collapse whitespace
   * runs to single spaces, trim, optionally lowercase — the
   * canonicalization pass run before hashing/dedup so formatting
   * variants collapse. Pure regexp_replace composition (codegen'd,
   * narrow, dialect-portable).
   */
  def normalize(text: Column, lowercase: Boolean = false): Column = {
    val stripped = regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
    if (lowercase) lower(collapsed) else collapsed
  }

  /**
   * Gopher-style repetition signals (Rae et al., "Scaling Language
   * Models: ... Gopher", 2021, §A1.1 repetition filters): fraction of
   * repeated tokens and the share of the most frequent word bigram —
   * high values flag boilerplate/spam for removal. Narrow projection;
   * the per-document top-bigram count is a single-pass custom expression
   * (no per-n-gram shuffle, no interpreted HOF).
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val bigrams = Dedup.shingles(col(textCol), 2)
    val nToks = size(toks)
    val blank = length(trim(col(textCol))) === 0
    df.select(
      col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      round(when(blank || nToks <= 0, lit(0.0))
        .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / nToks), 4)
        .as("dup_token_ratio"),
      round(when(blank || bigrams.isNull, lit(0.0))
        .otherwise(graft.functions.array_top_count(bigrams).cast("double") / size(bigrams)), 4)
        .as("top_bigram_frac"))
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
