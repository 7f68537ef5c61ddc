package graft.operators

import graft.SparkSpec
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 10.0, "F"),
    (2L, Some("b"), 20.0, "O"),
    (3L, None, 120.0, "F"),     // null name, out-of-range value
    (3L, Some("d"), 30.0, "X")) // duplicate id, out-of-set status
    .toDF("id", "name", "value", "status")

  test("each check measures its exact violation fraction in one pass") {
    val report = audit(df, Seq(
      NotNull("name"),
      Unique("id"),
      InRange("value", 0, 100),
      InSet("status", Seq("F", "O", "P")),
      MatchesRegex("name", "^[a-z]$")))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4)))
    assert(report.toSeq == Seq(
      ("not_null", 0.25, false),
      ("unique", 0.25, false),
      ("in_range", 0.25, false),
      ("in_set", 0.25, false),
      ("matches_regex", 0.0, true))) // nulls are NotNull's business
  }

  test("thresholds turn measured violations into pass/fail gates") {
    assert(!holds(df, Seq(NotNull("name"))))
    assert(holds(df, Seq(NotNull("name", threshold = 0.3),
      Unique("id", threshold = 0.25), InRange("value", 0, 100, threshold = 0.5))))
  }

  test("empty frame passes fraction checks (0/0 violations)") {
    val empty = df.where("id < 0")
    assert(holds(empty, Seq(NotNull("name"), Unique("id"), InRange("value", 0, 1))))
  }

  test("fixture audit agrees with directly-computed SQL fractions") {
    graft.sources.Sources.register(spark, sfDir)
    val orders = spark.table("orders")
    val report = audit(orders, Seq(
      Unique("o_orderkey"),
      InSet("o_orderstatus", Seq("F", "O", "P")),
      MatchesRegex("o_orderpriority", "^[0-9]-")))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4)))
    assert(report.toSeq == Seq(
      ("unique", 0.0, true), ("in_set", 0.0, true), ("matches_regex", 0.0, true)))
    // a deliberately-tight range must measure the true violation fraction
    val cut = orders.selectExpr("percentile(o_totalprice, 0.5)").head().getDouble(0)
    val expected = orders.where(s"o_totalprice > $cut").count().toDouble / orders.count()
    val observed = audit(orders, Seq(InRange("o_totalprice", 0, cut)))
      .head().getDouble(2)
    assert(math.abs(observed - expected) < 1e-6, s"$observed vs $expected")
  }

  test("referentialAudit: planted orphans counted exactly; null FKs reported, not orphaned") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(Some(10L), Some(10L), Some(30L), None).toDF("fk")
    val r = referentialAudit(child, Seq("fk"), parent, Seq("pk"), threshold = 0.0)
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)) ==
      (4L, 1L, 1L, 0.25, false))
    // intact references pass at threshold 0
    val ok = referentialAudit(Seq(10L, 20L).toDF("fk"), Seq("fk"), parent, Seq("pk"))
      .collect()(0)
    assert(ok.getLong(2) == 0L && ok.getBoolean(4))
  }

  test("referentialAudit dedupes the parent key projection (composite keys)") {
    val parent = Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("k1", "k2")
    val child = Seq((1L, "a"), (2L, "b"), (2L, "a")).toDF("fk1", "fk2")
    val r = referentialAudit(child, Seq("fk1", "fk2"), parent, Seq("k1", "k2"))
      .collect()(0)
    assert(r.getLong(2) == 1L) // only (2, 'a') dangles
  }
}
