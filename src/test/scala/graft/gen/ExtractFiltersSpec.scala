package graft.gen

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Literal-filter extraction: positive shapes, rejection of look-alike
  * phrases, and property-based never-crash/always-well-formed checks. */
class ExtractFiltersSpec extends AnyFunSuite {

  private val cols = Seq("score_id", "student_id", "course_id", "score", "grade", "year", "age")

  test("numeric comparisons in both spellings") {
    assert(Templates.extractFilters("score greater than 75", cols) == Seq("score > 75"))
    assert(Templates.extractFilters("score is less than 30.5", cols) == Seq("score < 30.5"))
    assert(Templates.extractFilters("age at least 18", cols) == Seq("age >= 18"))
    assert(Templates.extractFilters("age at most 21", cols) == Seq("age <= 21"))
    assert(Templates.extractFilters("score above 80", cols) == Seq("score > 80"))
    assert(Templates.extractFilters("score is below 40", cols) == Seq("score < 40"))
  }

  test("categorical equality preserves value case and quotes") {
    assert(Templates.extractFilters("scores with a C grade", cols) == Seq("grade = 'C'"))
    assert(Templates.extractFilters("grade is B", cols) == Seq("grade = 'B'"))
    assert(Templates.extractFilters("grade equals A+", cols) == Seq("grade = 'A+'"))
  }

  test("numeric equality binds to exactly-matching columns") {
    assert(Templates.extractFilters("count of scores in year 2023", cols) == Seq("year = 2023"))
  }

  test("date comparisons bind to the date-ish column, year shorthand expands") {
    val dcols = Seq("o_orderkey", "o_orderdate", "o_totalprice")
    assert(Templates.extractFilters("orders after 1995-06-01", dcols)
      == Seq("o_orderdate >= DATE '1995-06-01'"))
    assert(Templates.extractFilters("orders before 1995", dcols)
      == Seq("o_orderdate < DATE '1995-01-01'"))
    assert(Templates.extractFilters("orders since 1996", dcols)
      == Seq("o_orderdate >= DATE '1996-01-01'"))
    // no date-ish column -> nothing extracted
    assert(Templates.extractFilters("orders after 1995", Seq("a", "b")).isEmpty)
  }

  test("relative dates render as frozen-now DATE literals") {
    val dcols = Seq("event_id", "ts", "event_type", "value")
    val now = java.time.LocalDate.of(2024, 1, 31) // a Wednesday
    def fs(q: String) = Templates.extractFilters(q, dcols, now)
    // rolling spans: a lower bound from now minus the span
    assert(fs("events in the last 10 days") == Seq("ts >= DATE '2024-01-21'"))
    assert(fs("events from the past 2 weeks") == Seq("ts >= DATE '2024-01-17'"))
    assert(fs("events in the last 1 month") == Seq("ts >= DATE '2023-12-31'"))
    // calendar units: half-open ranges
    assert(fs("events from last month")
      == Seq("ts >= DATE '2023-12-01'", "ts < DATE '2024-01-01'"))
    assert(fs("events from last week") // Mon 2024-01-22 .. Mon 2024-01-29
      == Seq("ts >= DATE '2024-01-22'", "ts < DATE '2024-01-29'"))
    assert(fs("events from yesterday")
      == Seq("ts >= DATE '2024-01-30'", "ts < DATE '2024-01-31'"))
    assert(fs("events from today")
      == Seq("ts >= DATE '2024-01-31'", "ts < DATE '2024-02-01'"))
    // open-ended "this" units
    assert(fs("events this month") == Seq("ts >= DATE '2024-01-01'"))
    assert(fs("events this year") == Seq("ts >= DATE '2024-01-01'"))
    // the span's number must not leak into numeric extractors, and a
    // frame with no date-ish column yields nothing
    assert(fs("events in the last 30 days") == Seq("ts >= DATE '2024-01-01'"))
    assert(Templates.extractFilters("events in the last 30 days", Seq("a", "b"), now).isEmpty)
  }

  test("compound question yields AND-able conditions in order") {
    val fs = Templates.extractFilters("scores with a C grade and score greater than 75", cols)
    assert(fs == Seq("score > 75", "grade = 'C'") || fs == Seq("grade = 'C'", "score > 75"), fs)
  }

  test("BETWEEN extracts as a single range condition") {
    assert(Templates.extractFilters("students with age between 15 and 17", cols)
      == Seq("age BETWEEN 15 AND 17"))
    assert(Templates.extractFilters("score is between 40.5 and 60", cols)
      == Seq("score BETWEEN 40.5 AND 60"))
  }

  test("consumed spans never re-match in looser rules (no fabricated filters)") {
    // "and 15" inside an extracted BETWEEN must not become a numeric
    // equality via the fuzzy 'and' ⊂ 'brand' column match (regression:
    // the fabricated p_brand = 15 made the candidate fail ANSI casting
    // and fall through to a wrong-table template)
    val pcols = Seq("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")
    assert(Templates.extractFilters("parts with size between 10 and 15", pcols)
      == Seq("p_size BETWEEN 10 AND 15"))
  }

  test("repeated equalities on one column fold into IN (disjunctive reading)") {
    assert(Templates.extractFilters("scores from year 2022 or year 2023", cols)
      == Seq("year IN (2022, 2023)"))
    assert(Templates.extractFilters("grade is B or grade is C", cols)
      == Seq("grade IN ('B', 'C')"))
    // a single value still renders as plain equality
    assert(Templates.extractFilters("scores in year 2023", cols) == Seq("year = 2023"))
  }

  test("look-alike phrases extract nothing") {
    // possessive noun, not a value
    assert(Templates.extractFilters("student names with their scores", cols).isEmpty)
    // comparative word after 'is' is not an equality literal
    assert(Templates.extractFilters("course ids whose average score is above 80", cols)
      .forall(_.startsWith("score")))
    // a word matching no column
    assert(Templates.extractFilters("items with a Z banana", cols).isEmpty)
    // ambiguous word (ties across several *_id columns) is not extracted
    assert(Templates.extractFilters("id 5", cols).isEmpty)
  }

  test("property: extraction never throws and only emits well-formed conditions on real columns") {
    val word = Gen.oneOf(cols ++ Seq("with", "a", "C", "greater", "than", "75", "is",
      "above", "and", "or", "the", "their", "scores", "equals", "at", "least", "2023",
      "don't", "%", "('", "о", "", "NULL'; DROP--"))
    val question = Gen.listOfN(8, word).map(_.mkString(" "))
    val lit = raw"('([^']|'')*'|\d+(\.\d+)?|DATE '\d{4}-\d{2}-\d{2}')"
    val condRe = (raw"[a-z0-9_]+ ((=|>|<|>=|<=) $lit" +
      raw"|BETWEEN \d+(\.\d+)? AND \d+(\.\d+)?" +
      raw"|IN \($lit(, $lit)*\))").r
    val prop = Prop.forAll(question) { q =>
      val fs = Templates.extractFilters(q, cols)
      fs.forall(f => condRe.pattern.matcher(f).matches() &&
        cols.contains(f.takeWhile(_ != ' ')))
    }
    val result = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }
}
