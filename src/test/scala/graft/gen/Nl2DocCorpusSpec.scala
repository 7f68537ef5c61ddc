package graft.gen

import graft.SparkSpec
import graft.sources.DocSource
import graft.sources.DocSource._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Doc-side eval corpus (the NL→document analogue of the SQL
 * schoolCorpus): the reference's Mongo question shapes
 * (ref app/ai/nl2mongo.py:64-116 serves them through the LLM path) run
 * END-TO-END here — question → Nl2Doc.build → DocSource execution —
 * and every result is compared against a directly-constructed gold
 * frame. Covers the round-7 additions: range filters ("over 30"), null
 * checks ("missing email" → $exists: false), existence ("have an
 * email"), and text containment ("email containing gmail" → $regex).
 */
class Nl2DocCorpusSpec extends SparkSpec {
  import spark.implicits._

  // deterministic users collection: every 3rd user has no email;
  // gmail/corp addresses alternate among the rest
  private lazy val users: DataFrame = (1 to 60).map { i =>
    val email =
      if (i % 3 == 0) null
      else if (i % 2 == 0) s"user$i@gmail.example" else s"user$i@corp.example"
    (i.toLong, s"User$i", 20 + (i * 7) % 30, email, if (i % 5 == 0) "lima" else "quito")
  }.toDF("_id", "name", "age", "email", "city")

  private val fields = Seq("_id", "name", "age", "email", "city")

  private def run(question: String): DataFrame = {
    val q = Nl2Doc.build(question, "users", fields)
    q.spec match {
      case Left(find) => DocSource.find(users, find)
      case Right(stages) => DocSource.aggregate(users, stages)
    }
  }

  /** Compare the selected _id sets: find-shaped queries project the
    * fields the question names (by design), so gold frames match on the
    * row identity the filter selects, not the projection. */
  private def sameRows(got: DataFrame, want: DataFrame): Unit = {
    val g = got.select("_id").collect().map(_.getLong(0)).sorted.toSeq
    val w = want.select("_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(g == w, s"got=$g\nwant=$w")
  }

  test("range filter: users with age over 30") {
    sameRows(run("users with age over 30"), users.where($"age" > 30).limit(100))
    assert(run("users with age over 30").count() > 0)
  }

  test("range filter: users with age at least 45") {
    sameRows(run("users with age at least 45"), users.where($"age" >= 45).limit(100))
  }

  test("null check: users with missing email serves $exists: false") {
    val q = Nl2Doc.build("users with missing email", "users", fields)
    assert(q.render.contains("\"$exists\": false"), q.render)
    sameRows(run("users with missing email"), users.where($"email".isNull).limit(100))
    assert(run("users with missing email").count() == 20)
  }

  test("null check phrasings: 'without an email' and 'have no email' agree") {
    sameRows(run("users without an email"), users.where($"email".isNull).limit(100))
    sameRows(run("users who have no email"), users.where($"email".isNull).limit(100))
  }

  test("existence: users who have an email") {
    val q = Nl2Doc.build("users who have an email", "users", fields)
    assert(q.render.contains("\"$exists\": true"), q.render)
    sameRows(run("users who have an email"), users.where($"email".isNotNull).limit(100))
    assert(run("users who have an email").count() == 40)
  }

  test("text contains: email containing gmail serves $regex") {
    val q = Nl2Doc.build("users with email containing gmail", "users", fields)
    assert(q.render.contains("\"$regex\""), q.render)
    sameRows(run("users with email containing gmail"),
      users.where($"email".contains("gmail")).limit(100))
    assert(run("users with email containing gmail").count() > 0)
  }

  test("combined: count of users from lima city with age over 30") {
    val got = run("how many users from lima city with age over 30")
      .select("agg_value").collect().map(_.getLong(0)).toSeq
    val want = users.where($"city" === "lima" && $"age" > 30).count()
    assert(got == Seq(want) && want > 0, s"got=$got want=$want")
  }

  test("no fabrication: contains/missing never fire on unlinked words") {
    assert(Nl2Doc.extractPreds("users missing the point entirely", fields).isEmpty)
    assert(Nl2Doc.extractPreds("users discussing containing walls", fields).isEmpty)
  }

  test("closed range: age between 25 and 40 serves $gte + $lte on one path") {
    val q = Nl2Doc.build("users with age between 25 and 40", "users", fields)
    // both bounds merge into ONE operator object — duplicate "age" keys
    // would be invalid JSON and a last-key-wins consumer would drop the
    // lower bound
    assert(q.render.contains("\"age\": {\"$gte\": 25, \"$lte\": 40}"), q.render)
    sameRows(run("users with age between 25 and 40"),
      users.where($"age".between(25, 40)).limit(100))
    // no Eq(age, "between") fabrication
    assert(!q.render.contains("\"age\": \"between\""), q.render)
  }

  test("inclusive bound: age is 30 or older serves $gte, never Eq or a bogus $in") {
    val q = Nl2Doc.build("users whose age is 30 or older", "users", fields)
    assert(q.render.contains("\"age\": {\"$gte\": 30}"), q.render)
    sameRows(run("users whose age is 30 or older"),
      users.where($"age" >= 30).limit(100))
    val lower = Nl2Doc.build("users whose age is 30 or younger", "users", fields)
    assert(lower.render.contains("\"age\": {\"$lte\": 30}"), lower.render)
  }

  test("negated disjunction declines rather than serving half the negation") {
    // Ne(city, 'lima') alone would wrongly include quito rows; with no
    // $nin predicate the builder must answer unfiltered, not wrong
    assert(Nl2Doc.extractPreds("users whose city is not lima or quito", fields).isEmpty)
  }

  test("negation: city is not lima serves $ne, never Eq(city, 'not')") {
    val q = Nl2Doc.build("users whose city is not lima", "users", fields)
    assert(q.render.contains("\"$ne\": \"lima\""), q.render)
    sameRows(run("users whose city is not lima"),
      users.where($"city" =!= "lima").limit(100))
  }

  test("disjunction: city is lima or quito serves $in with both values") {
    val q = Nl2Doc.build("users whose city is lima or quito", "users", fields)
    assert(q.render.contains("\"$in\": [\"lima\", \"quito\"]"), q.render)
    sameRows(run("users whose city is lima or quito"),
      users.where($"city".isin("lima", "quito")).limit(100))
    assert(run("users whose city is lima or quito").count() == 60)
  }

  test("agg-top-N: top 1 cities by average age ranks groups by the aggregate") {
    val q = Nl2Doc.build("top 1 cities by average age", "users", fields)
    assert(q.render.contains("\"$group\""), q.render)
    assert(q.render.contains("\"agg_value\": -1"), q.render)
    assert(q.render.contains("\"$limit\": 1"), q.render)
    val got = run("top 1 cities by average age").collect()
    val want = users.groupBy($"city").agg(avg($"age").as("a"))
      .orderBy($"a".desc, $"city").limit(1).collect()
    assert(got.length == 1 && got(0).getString(0) == want(0).getString(0),
      s"got=${got.toSeq} want=${want.toSeq}")
    // "bottom" flips the direction
    val lowest = Nl2Doc.build("bottom 1 cities by average age", "users", fields)
    assert(lowest.render.contains("\"agg_value\": 1"), lowest.render)
    val gotLow = run("bottom 1 cities by average age").collect()
    val wantLow = users.groupBy($"city").agg(avg($"age").as("a"))
      .orderBy($"a".asc, $"city").limit(1).collect()
    assert(gotLow(0).getString(0) == wantLow(0).getString(0))
  }

  // --- round-10 additions: the reference's multi-stage pipeline shapes
  //     (ref app/ai/nl2mongo.py:64-116 serves $match→$group pipelines and
  //     nested dotted paths through its LLM; the deterministic builder
  //     must produce the same stages) ---

  test("$group after $match: average age per city for users with age over 30") {
    val q = Nl2Doc.build("average age per city for users with age over 30", "users", fields)
    // the filter stage precedes the group stage in the rendered pipeline
    val r = q.render
    assert(r.indexOf("\"$match\"") >= 0 && r.indexOf("\"$group\"") > r.indexOf("\"$match\""), r)
    val got = run("average age per city for users with age over 30")
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val want = users.where($"age" > 30).groupBy($"city").agg(avg($"age"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(got.keySet == want.keySet && got.forall { case (k, v) =>
      math.abs(v - want(k)) < 1e-9 }, s"got=$got want=$want")
  }

  test("sort-on-aggregate with $match: top 1 cities by total age among users with age over 30") {
    val q = Nl2Doc.build(
      "top 1 cities by total age among users with age over 30", "users", fields)
    val r = q.render
    assert(r.indexOf("\"$match\"") >= 0 && r.contains("\"$sort\"") &&
      r.contains("\"agg_value\": -1") && r.contains("\"$limit\": 1"), r)
    val got = run("top 1 cities by total age among users with age over 30").collect()
    val want = users.where($"age" > 30).groupBy($"city").agg(sum($"age").as("a"))
      .orderBy($"a".desc, $"city").limit(1).collect()
    assert(got.length == 1 && got(0).getString(0) == want(0).getString(0),
      s"got=${got.toSeq} want=${want.toSeq}")
  }

  // nested collection: dotted leaf paths (the reference's Mongo adapter
  // addresses array/struct members the same way, app/mongodb_adapter.py)
  private lazy val people: DataFrame = (1 to 40).map { i =>
    (i.toLong, s"P$i", 18 + (i * 11) % 40,
      (if (i % 4 == 0) "lima" else "quito", 10000 + i % 3))
  }.toDF("_id", "name", "age", "addr")
    .withColumn("address", struct($"addr._1".as("city"), $"addr._2".as("zip")))
    .drop("addr")
  private val peopleFields = Seq("_id", "name", "age", "address.city", "address.zip")

  private def runPeople(question: String): DataFrame = {
    val q = Nl2Doc.build(question, "people", peopleFields)
    q.spec match {
      case Left(find) => DocSource.find(people, find)
      case Right(stages) => DocSource.aggregate(people, stages)
    }
  }

  test("nested-field filter: city links to the dotted address.city path") {
    val q = Nl2Doc.build("people whose city is lima", "people", peopleFields)
    assert(q.render.contains("\"address.city\""), q.render)
    val got = runPeople("people whose city is lima")
      .select("_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = people.where($"address.city" === "lima")
      .select("_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && got.nonEmpty, s"got=$got want=$want")
  }

  test("nested group key: count of people per zip groups on address.zip") {
    val q = Nl2Doc.build("count of people per zip", "people", peopleFields)
    assert(q.render.contains("\"_id\": \"$address.zip\""), q.render)
    val got = runPeople("count of people per zip")
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    val want = people.groupBy($"address.zip").count()
      .collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(got == want, s"got=$got want=$want")
  }

  test("nested no-fabrication: an unlinked word never lands on a nested path") {
    assert(Nl2Doc.extractPreds("people whose street is elm", peopleFields).isEmpty)
  }

  test("post-group $match (HAVING analogue): cities with average age above 30") {
    val q = Nl2Doc.build("cities with average age above 30", "users", fields)
    val r = q.render
    // the $match FOLLOWS the $group — filter-then-group would be a
    // silently different query
    assert(r.indexOf("\"$group\"") >= 0 && r.indexOf("\"$match\"") > r.indexOf("\"$group\""), r)
    assert(r.contains("\"agg_value\": {\"$gt\": 30}"), r)
    val got = run("cities with average age above 30")
      .select("_id").collect().map(_.getString(0)).sorted.toSeq
    val want = users.groupBy($"city").agg(avg($"age").as("a"))
      .where($"a" > 30).select("city").collect().map(_.getString(0)).sorted.toSeq
    assert(got == want && got.nonEmpty, s"got=$got want=$want")
    // "below" flips the comparison; "total" reads as sum
    val b = Nl2Doc.build("cities with total age below 500", "users", fields)
    assert(b.render.contains("\"$sum\"") && b.render.contains("\"$lt\": 500"), b.render)
  }

  test("bottom-N: bottom 5 users by age sorts ascending with the limit") {
    val q = Nl2Doc.build("bottom 5 users by age", "users", fields)
    assert(q.render.contains("\"age\": 1") && q.render.contains("\"limit\": 5"), q.render)
    val got = run("bottom 5 users by age").select("_id").collect().map(_.getLong(0)).toSet
    val want = users.orderBy($"age".asc, $"_id".asc).limit(5)
      .select("_id").collect().map(_.getLong(0)).toSet
    // ties at the cut can differ; the age MULTISET must match
    val gotAges = users.where($"_id".isin(got.toSeq: _*)).select("age")
      .collect().map(_.getInt(0)).sorted.toSeq
    val wantAges = users.where($"_id".isin(want.toSeq: _*)).select("age")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(gotAges == wantAges, s"got=$gotAges want=$wantAges")
  }

  // tagged variant of the fixture: a top-level array field for the
  // $unwind shapes (tag i%4 and tag i%3 per user — "t0" dominates)
  private lazy val tagged: DataFrame = (1 to 60).map { i =>
    (i.toLong, 20 + (i * 7) % 30, if (i % 5 == 0) "lima" else "quito",
      Seq(s"t${i % 4}", s"u${i % 3}"))
  }.toDF("_id", "age", "city", "tags")
  private val taggedFields = Seq("_id", "age", "city", "tags")

  test("most common over an ARRAY field serves $unwind -> $group -> sort/limit") {
    val q = Nl2Doc.build("the most common tag among users", "users",
      taggedFields, arrayFields = Set("tags"))
    assert(q.render.contains("$unwind"), q.render)
    val got = DocSource.aggregate(tagged, q.spec.toOption.get)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // exploded tag counts: t0/t1/t2/t3 = 15 each, u0..u2 = 20 each ->
    // winner is u0 (20) with the _id tiebreak
    assert(got == Seq(("u0", 20L)), got.toString)
  }

  test("most common over a SCALAR field groups directly, no $unwind") {
    val q = Nl2Doc.build("the most common city", "users",
      taggedFields, arrayFields = Set("tags"))
    assert(!q.render.contains("$unwind"), q.render)
    val got = DocSource.aggregate(tagged, q.spec.toOption.get)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("quito", 48L)), got.toString)
  }

  test("distinct count chains two $group stages and counts the groups") {
    val q = Nl2Doc.build("how many distinct cities among users", "users", fields)
    assert(q.render.count(_ == '$') >= 2 && q.render.contains("$group"), q.render)
    val got = DocSource.aggregate(users, q.spec.toOption.get)
      .select("agg_value").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L), got.toString) // lima + quito
    // plain "how many users" still serves the row count, not a distinct
    val plain = Nl2Doc.build("how many users", "users", fields)
    val n = DocSource.aggregate(users, plain.spec.toOption.get)
      .select("agg_value").collect()(0).getLong(0)
    assert(n == 60L)
  }

  test("most common never fabricates: an unlinked word falls through") {
    val q = Nl2Doc.build("the most common flavor among users", "users",
      taggedFields, arrayFields = Set("tags"))
    assert(!q.render.contains("$unwind") && !q.render.contains("flavor"), q.render)
  }
}
