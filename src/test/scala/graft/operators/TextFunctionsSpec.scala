package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Value-identity of the single-pass TextCounts / LangIdHeuristic
 * expressions against the original built-in regex compositions they
 * replaced (the oracle SQL was written against those semantics, so any
 * divergence here would surface as a hash mismatch in the driver's
 * correctness gate).
 */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-4 compositions, verbatim. */
  private object Legacy {
    def tokenCount(text: Column): Column =
      when(length(trim(text)) === 0, lit(0))
        .otherwise(size(split(trim(text), "\\s+")))
    def punctRatio(text: Column): Column = {
      val total = length(text)
      when(total === 0, lit(0.0)).otherwise(
        (total - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") / total)
    }
    def digitRatio(text: Column): Column = {
      val total = length(text)
      when(total === 0, lit(0.0)).otherwise(
        (total - length(regexp_replace(text, "[0-9]", ""))).cast("double") / total)
    }
    def avgWordLen(text: Column): Column = {
      val toks = tokenCount(text)
      when(toks === 0, lit(0.0))
        .otherwise(length(regexp_replace(trim(text), "\\s+", "")).cast("double") / toks)
    }
    def langId(text: Column): Column = {
      val toks = Dedup.tokens(text)
      val langs = TextAnalysis.stopwords.keys.toSeq.sorted
      def hits(l: String): Column =
        size(array_intersect(toks, array(TextAnalysis.stopwords(l).map(lit): _*)))
      val scored = langs.zipWithIndex.map { case (l, i) =>
        struct(hits(l).as("hits"), lit(langs.size - 1 - i).as("pri"), lit(l).as("lang"))
      }
      val best = array_max(array(scored: _*))
      when(best.getField("hits") <= 0, lit("und")).otherwise(best.getField("lang"))
    }
  }

  private val edgeCases = Seq(
    "", " ", "  ", "\t", "a", "a b", "a  b", " a b ", "\ta", "a\t", "\ta\t",
    "a\tb", "a\nb\n", "the quick brown fox", "the the the", "el la de que y",
    "le la les de des", "der die das und", "1234 56.7", "!!! ??? ...",
    "mixed 123 text, with punct! and\tthe tabs", "   spaces   everywhere   ",
    "verticaltab", "e\n", "\n\n", "a.b,c;d", "über café naïve",
    "the el le der il o", "para para para con con y")

  private def edgeDf = edgeCases.toDF("text")
  private def fixtureDf = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("documents")
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame, newCol: Column, oldCol: Column, what: String): Unit = {
    val diff = df.select(col("text"), newCol.as("n"), oldCol.as("o"))
      .where(not(col("n") <=> col("o")))
    val bad = diff.limit(5).collect()
    assert(bad.isEmpty, s"$what diverges: ${bad.mkString("; ")}")
  }

  test("TextCounts-derived columns match the legacy regex compositions") {
    for (df <- Seq(edgeDf, fixtureDf)) {
      assertSame(df, TextAnalysis.tokenCount(col("text")), Legacy.tokenCount(col("text")), "tokenCount")
      assertSame(df, TextAnalysis.punctRatio(col("text")), Legacy.punctRatio(col("text")), "punctRatio")
      assertSame(df, TextAnalysis.digitRatio(col("text")), Legacy.digitRatio(col("text")), "digitRatio")
      assertSame(df, TextAnalysis.avgWordLen(col("text")), Legacy.avgWordLen(col("text")), "avgWordLen")
      assertSame(df, TextAnalysis.qualityScore(col("text")), legacyQuality(col("text")), "qualityScore")
    }
  }

  private def legacyQuality(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0)) * 0.4
    val toks = Legacy.tokenCount(text).cast("double")
    val wordScore = least(toks / 100.0, lit(1.0)) * 0.3
    val awl = Legacy.avgWordLen(text)
    val shapeScore = when(awl >= 3 && awl <= 10, lit(0.3)).otherwise(lit(0.1))
    val noise = (Legacy.punctRatio(text) + Legacy.digitRatio(text)) * 0.5
    round(greatest(lit(0.0), least(lit(1.0), lenScore + wordScore + shapeScore - noise)), 4)
  }

  test("LangIdHeuristic matches the legacy array_intersect argmax") {
    for (df <- Seq(edgeDf, fixtureDf))
      assertSame(df, TextAnalysis.langId(col("text")), Legacy.langId(col("text")), "langId")
  }

  test("null text propagates null") {
    val df = Seq[Option[String]](None, Some("a")).toDF("text")
    val r = df.select(TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.langId(col("text")).as("l")).collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(!r(1).isNullAt(0))
  }
}
