package graft.gen

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Document-path envelope fuzz (the [[TemplatesFuzzSpec]] analogue for
 * Nl2Doc): for ANY question the builder must never throw, its rendered
 * JSON must parse, and every predicate/projection/sort path must name a
 * real field — the executor would fail on a fabricated path, and the
 * rendered query is served verbatim as the result's query text.
 */
class Nl2DocFuzzSpec extends AnyFunSuite {

  private val fields = Seq("_id", "name", "age", "email", "city", "user.score")

  private val word: Gen[String] = Gen.oneOf(
    "users", "name", "age", "email", "city", "score",
    "top", "bottom", "lowest", "missing", "without", "have", "has", "no",
    "containing", "contains", "between", "and", "or", "not", "is", "at",
    "least", "most", "above", "below", "over", "under", "older", "younger",
    "greater", "less", "than", "average", "total", "count", "how", "many",
    "per", "by", "sorted", "from", "in", "with", "the", "a", "an",
    "gmail", "lima", "quito", "30", "5.5", "2023", "\"", "'", ";", "$", "{")
  private val question: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Minimal structural JSON check (no parser dependency): balanced
    * braces/brackets outside strings, no dangling quote. */
  private def wellFormed(json: String): Boolean = {
    var depth = 0
    var inStr = false
    var esc = false
    var ok = true
    json.foreach { ch =>
      if (inStr) {
        if (esc) esc = false
        else if (ch == '\\') esc = true
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1; if (depth < 0) ok = false
        case _ =>
      }
    }
    ok && depth == 0 && !inStr
  }

  test("build never throws; render is well-formed; no fabricated paths") {
    val known = fields.toSet
    val prop = Prop.forAll(question) { q =>
      val dq = Nl2Doc.build(q, "users", fields)
      val paths = dq.spec match {
        case Left(f) =>
          f.filter.map(predPath) ++ f.projection ++ f.sort.map(_._1)
        case Right(stages) => stages.flatMap {
          case graft.sources.DocSource.MatchStage(ps) => ps.map(predPath)
          case graft.sources.DocSource.GroupStage(gp, accs) =>
            gp.toSeq ++ accs.collect { case (_, op, p) if op != "count" => p }
          case graft.sources.DocSource.SortStage(keys) =>
            keys.map(_._1).filterNot(Set("_id", "agg_value"))
          case graft.sources.DocSource.ProjectStage(ps) => ps
          case _ => Nil
        }
      }
      wellFormed(dq.render) && paths.forall(known.contains)
    }
    val r = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  private def predPath(p: graft.sources.DocSource.Pred): String = {
    import graft.sources.DocSource._
    p match {
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
  }
}
