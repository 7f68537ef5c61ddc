package graft.explain

import graft.SparkSpec
import graft.sources.Sources

/** Column-level lineage from the analyzed plan (explain/Lineage.scala). */
class LineageSpec extends SparkSpec {

  private def lin(sql: String): Map[String, Seq[String]] = {
    Sources.register(spark, sfDir)
    Lineage.of(spark, sql).map(c => c.column -> c.sources).toMap
  }

  test("projection with alias and arithmetic maps to the base columns") {
    val m = lin("SELECT o_orderkey AS k, o_totalprice * 2 AS doubled FROM orders")
    assert(m("k") == Seq("orders.o_orderkey"))
    assert(m("doubled") == Seq("orders.o_totalprice"))
  }

  test("join output columns map to their own side") {
    val m = lin("SELECT c.c_name, o.o_totalprice FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey")
    assert(m("c_name") == Seq("customer.c_name"))
    assert(m("o_totalprice") == Seq("orders.o_totalprice"))
  }

  test("aggregate: measure unions every column inside the aggregate expression") {
    val m = lin("SELECT l_returnflag, SUM(l_extendedprice * (1 - l_discount)) AS revenue " +
      "FROM lineitem GROUP BY l_returnflag")
    assert(m("l_returnflag") == Seq("lineitem.l_returnflag"))
    assert(m("revenue") == Seq("lineitem.l_discount", "lineitem.l_extendedprice"))
  }

  test("CASE WHEN includes condition and both branches") {
    val m = lin("SELECT CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE o_custkey END AS v FROM orders")
    assert(m("v") == Seq("orders.o_custkey", "orders.o_orderstatus", "orders.o_totalprice"))
  }

  test("CTE columns resolve through the definition to base columns") {
    val m = lin("WITH t AS (SELECT o_custkey AS k, o_totalprice AS p FROM orders) " +
      "SELECT k, SUM(p) AS total FROM t GROUP BY k")
    assert(m("k") == Seq("orders.o_custkey"))
    assert(m("total") == Seq("orders.o_totalprice"))
  }

  test("UNION ALL merges lineage positionally across branches") {
    val m = lin("SELECT c_name AS nm FROM customer UNION ALL SELECT s_name FROM supplier")
    assert(m("nm") == Seq("customer.c_name", "supplier.s_name"))
  }

  test("scalar subquery output derives from the inner plan's columns") {
    val m = lin("SELECT o_orderkey, (SELECT MAX(c_acctbal) FROM customer) AS max_bal FROM orders")
    assert(m("o_orderkey") == Seq("orders.o_orderkey"))
    assert(m("max_bal") == Seq("customer.c_acctbal"))
  }

  test("window function derives from its argument, partition and order columns") {
    val m = lin("SELECT o_orderkey, RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS rnk FROM orders")
    assert(m("rnk") == Seq("orders.o_custkey", "orders.o_totalprice"))
  }

  test("explode/Generate: generated column derives from the generator input") {
    val m = lin("SELECT doc_id, tok FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)")
    assert(m("doc_id") == Seq("documents.doc_id"))
    assert(m("tok") == Seq("documents.text"))
  }

  test("ROLLUP (Expand) keeps key and measure lineage") {
    val m = lin("SELECT o_orderstatus, o_orderpriority, SUM(o_totalprice) AS s " +
      "FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)")
    assert(m("o_orderstatus") == Seq("orders.o_orderstatus"))
    assert(m("s") == Seq("orders.o_totalprice"))
  }

  test("nothing executes: lineage of a huge cross join is instant metadata") {
    val t0 = System.nanoTime()
    val m = lin("SELECT l.l_orderkey FROM lineitem l CROSS JOIN orders o")
    assert(m("l_orderkey") == Seq("lineitem.l_orderkey"))
    assert((System.nanoTime() - t0) / 1e9 < 10.0)
  }

  test("lineage resolves every declared d-series query to base columns") {
    Sources.register(spark, sfDir)
    graft.Queries.byName.foreach { case (name, sql) =>
      val cols = Lineage.of(spark, sql)
      assert(cols.nonEmpty, s"$name produced no output columns")
      // COUNT(*) is the one legitimately source-free output (it counts
      // row existence, no column feeds the value)
      if (name != "d23_profile_count")
        assert(cols.exists(_.sources.nonEmpty),
          s"$name: no output column traces to any base column")
    }
  }

  test("Engine.lineage runs the safety chain first") {
    val eng = graft.api.Engine.forFixtures(spark, sfDir)
    val ok = eng.lineage("SELECT c_name FROM customer")
    assert(ok.isRight && ok.toOption.get.head.sources == Seq("customer.c_name"))
    assert(eng.lineage("DROP TABLE customer").isLeft)
    assert(eng.lineage("SELECT * FROM not_a_table").isLeft)
  }
}
