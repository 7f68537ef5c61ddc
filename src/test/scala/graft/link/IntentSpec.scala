package graft.link

import org.scalatest.funsuite.AnyFunSuite

class IntentSpec extends AnyFunSuite {
  import Intent._

  test("plain lookup is simple_select") {
    val a = analyze("show me customers")
    assert(a.intent == SimpleSelect)
    assert(a.confidence == 0.8)
  }

  test("count question detects COUNT aggregation") {
    val a = analyze("how many orders are there")
    assert(a.allIntents.contains(Aggregation))
    assert(a.aggFunction.contains("COUNT"))
  }

  test("grouped aggregation wins priority over plain aggregation") {
    val a = analyze("average account balance per market segment")
    assert(a.intent == GroupedAggregation)
    assert(a.aggFunction.contains("AVG"))
    assert(a.requiredClauses.contains("GROUP BY"))
  }

  test("window intent fires on rows-plus-aggregate phrasing") {
    val a = analyze("show each customer along with the average balance of their segment")
    assert(a.intent == WindowFunction)
  }

  test("top-N extracts the limit number") {
    val a = analyze("top 5 orders by total price")
    assert(a.allIntents.contains(Limited))
    assert(a.limitN.contains(5))
    assert(a.sortDescending)
  }

  test("multiple table mentions imply join") {
    val a = analyze("customers and orders with totals", Seq("customer", "orders", "part"))
    // "customers" contains "customer"; "orders" matches
    assert(a.allIntents.contains(JoinIntent))
  }

  test("distinct keywords fire distinct intent") {
    assert(wantsDistinct("list all unique market segments"))
    assert(!wantsDistinct("list all market segments"))
  }

  test("null keywords fire null handling") {
    val a = analyze("orders without a priority set")
    assert(a.allIntents.contains(NullHandling))
  }

  test("confidence formula is min(0.95, 0.7 + 0.05*n)") {
    val a = analyze("top 5 highest totals per customer compared to the average")
    assert(a.confidence == math.min(0.95, 0.7 + a.allIntents.size * 0.05))
  }

  test("needsAggregation shared detector") {
    assert(Intent.needsAggregation("how many parts"))
    assert(Intent.needsAggregation("sales per region"))
    assert(!Intent.needsAggregation("show me the parts list"))
  }
}
