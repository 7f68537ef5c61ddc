package graft.gen

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

import graft.SparkSpec
import graft.core.{FkEdge, SchemaSlice}
import graft.link.Intent
import graft.safety.Validator

/**
 * Whole-candidate-layer fuzz: the template generator sits directly
 * behind user input, so for ANY question — word salad, half-matching
 * phrases, hostile punctuation — it must (a) never throw, (b) emit only
 * SQL that PARSES, (c) reference only sliced tables (the validator's
 * allow-list must never see a fabricated relation from our own
 * generator), and (d) keep confidences in (0, 1]. Shapes' individual
 * semantics are pinned in TemplatesSpec/EvaluationSpec; this spec pins
 * the envelope.
 */
class TemplatesFuzzSpec extends SparkSpec {

  private val slice = SchemaSlice(scala.collection.immutable.ListMap(
    "scores" -> Seq("score_id", "student_id", "course_id", "score", "grade", "year"),
    "courses" -> Seq("course_id", "course_name", "dept"),
    "students" -> Seq("student_id", "student_name", "grade_level", "age")))
  private val fks = Seq(
    FkEdge("scores", "student_id", "students", "student_id"),
    FkEdge("scores", "course_id", "courses", "course_id"))
  private val domains: String => Map[String, Seq[String]] = {
    case "courses" => Map("dept" -> Seq("arts", "history", "math", "science"),
      "course_name" -> Seq("Algebra", "Biology"))
    case _ => Map.empty
  }

  // vocabulary mixing schema words, shape keywords, names, numbers, noise
  private val word: Gen[String] = Gen.oneOf(
    "students", "courses", "scores", "score", "grade", "age", "year", "dept",
    "whose", "where", "who", "that", "no", "not", "all", "every", "each",
    "average", "total", "sum", "count", "highest", "lowest", "second", "third",
    "top", "bottom", "most", "least", "percentage", "share", "fraction",
    "above", "below", "between", "at", "least", "most", "than", "more", "less",
    "improved", "dropped", "from", "to", "with", "in", "of", "by", "per",
    "share", "together", "their", "own", "is", "are", "took", "take",
    "Algebra", "Ada", "Adams", "math", "general", "points", "overall",
    "5", "10", "90", "2022", "2023", "50.5", "--", ";", "'", "%", "(", ")")
  private val question: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("candidates never throw, always parse, never fabricate relations") {
    val sliced = slice.tables.keySet.map(_.toLowerCase)
    val prop = Prop.forAll(question) { q =>
      val cands = Templates.candidates(slice, fks,
        Intent.analyze(q, slice.tables.keys.toSeq), q, domains)
      cands.forall { c =>
        c.confidence > 0.0 && c.confidence <= 1.0 && {
          Validator.parse(spark, c.sql) match {
            case Right(plan) => Validator.referencedTables(plan).subsetOf(sliced)
            case Left(e) => throw new AssertionError(
              s"generated SQL does not parse for '$q' [${c.method}]: ${c.sql} -- $e")
          }
        }
      }
    }
    val r = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  test("adversarial near-miss phrasings emit parseable, slice-bound SQL") {
    // hand-picked inputs that historically tripped regex templates
    val hard = Seq(
      "students whose average score improved from 9999 to 0000",
      "the percentage of students who take more than 999999999999 courses",
      "students who share a course with X'; DROP TABLE students;--",
      "courses where no student scored below -1",
      "the two courses most often -- taken together",
      "students whose score in O'Brien-Smith is above their average score",
      "students whose score in Algebra is above their average score score score",
      "top 0 courses by average score",
      "students who took all 'math' courses",
      "the course with the 2nd highest average score of scores of scores")
    for (q <- hard) {
      val cands = Templates.candidates(slice, fks,
        Intent.analyze(q, slice.tables.keys.toSeq), q, domains)
      for (c <- cands) {
        Validator.parse(spark, c.sql) match {
          case Right(plan) =>
            assert(Validator.referencedTables(plan)
              .subsetOf(slice.tables.keySet.map(_.toLowerCase)), s"$q -> ${c.sql}")
          case Left(e) => fail(s"'$q' [${c.method}] emitted unparseable SQL: ${c.sql} -- $e")
        }
      }
    }
  }
}
