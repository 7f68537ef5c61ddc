package graft.gen

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DocSource._

/** NL→document-query builder shapes (ref nl2mongo.py:64-116): the two
  * output forms, linking bars, and the rendered query-JSON echo. */
class Nl2DocSpec extends AnyFunSuite {

  private val fields = Seq("_id", "city", "score", "user.name", "user.age")

  test("collection linking requires a real fuzzy signal") {
    val colls = Map("people" -> fields, "orders" -> Seq("_id", "total"))
    assert(Nl2Doc.linkCollection("people with score above 5", colls).contains("people"))
    assert(Nl2Doc.linkCollection("orders with total above 5", colls).contains("orders"))
    assert(Nl2Doc.linkCollection("zzz qqq gibberish", colls).isEmpty)
  }

  test("find shape: comparison + value-first equality + top-N sort") {
    val q = Nl2Doc.build("top 2 people from lima city by score", "people", fields)
    val spec = q.spec.swap.getOrElse(fail("expected find"))
    assert(spec.filter == Seq(Eq("city", "lima")))
    assert(spec.sort == Seq(("score", false))) // top-N reads descending
    assert(spec.limit == 2)
    assert(q.render.contains("\"find\""), q.render)
  }

  test("nested dotted fields link by leaf segment") {
    val q = Nl2Doc.build("people with age greater than 30", "people", fields)
    val spec = q.spec.swap.getOrElse(fail("expected find"))
    assert(spec.filter == Seq(Gt("user.age", 30L)))
  }

  test("aggregate shape: count per group renders as a $group pipeline") {
    val q = Nl2Doc.build("how many people per city", "people", fields)
    val stages = q.spec.getOrElse(fail("expected pipeline"))
    assert(stages.collect { case GroupStage(gp, accs) => (gp, accs) } ==
      Seq((Some("city"), Seq(("agg_value", "count", "*")))))
    assert(q.render.contains("\"$group\""), q.render)
  }

  test("aggregate shape: avg of a field with a match stage") {
    val q = Nl2Doc.build("average score of people with age above 30", "people", fields)
    val stages = q.spec.getOrElse(fail("expected pipeline"))
    assert(stages.collect { case MatchStage(ps) => ps } == Seq(Seq(Gt("user.age", 30L))))
    assert(stages.collect { case GroupStage(gp, accs) => (gp, accs) } ==
      Seq((None, Seq(("agg_value", "avg", "score")))))
  }

  test("no fabricated predicates: unlinked words extract nothing") {
    assert(Nl2Doc.extractPreds("people who wander more than 5 miles", fields).isEmpty)
  }

  test("operator words after 'is' never become equality values") {
    // "is between"/"is not" must not fabricate Eq(score, "between") /
    // Eq(city, "not") — a numeric field compared to a string evaluates
    // null and silently returns an empty result
    assert(Nl2Doc.extractPreds("people whose score is between 5 and 10", fields)
      .forall { case Eq(_, v) => v != "between"; case _ => true })
    assert(Nl2Doc.extractPreds("people whose city is not lima", fields)
      .forall { case Eq(_, v) => v != "not"; case _ => true })
  }
}
