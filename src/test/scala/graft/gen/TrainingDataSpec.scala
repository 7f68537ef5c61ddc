package graft.gen

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{ColumnInfo, FkEdge, SchemaMetadata, TableInfo}

class TrainingDataSpec extends AnyFunSuite {

  val meta = SchemaMetadata(
    tables = Map(
      "orders" -> TableInfo("orders", Seq("o_orderkey", "o_custkey", "o_totalprice")
        .map(c => ColumnInfo(c, "BIGINT", nullable = true))),
      "customer" -> TableInfo("customer", Seq("c_custkey", "c_name")
        .map(c => ColumnInfo(c, "BIGINT", nullable = true)))),
    relationships = Seq(FkEdge("orders", "o_custkey", "customer", "c_custkey")))

  test("deterministic pairs: per-table select/count + fk join, capped") {
    val pairs = TrainingData.syntheticPairs(meta)
    assert(pairs.size <= TrainingData.Cap)
    assert(pairs.exists(_._2.startsWith("SELECT COUNT(*)")))
    assert(pairs.exists(_._2.contains("JOIN customer")))
    assert(pairs.forall(_._2.contains("LIMIT") || pairs.forall(_._2.startsWith("SELECT"))))
    assert(pairs == TrainingData.syntheticPairs(meta)) // deterministic
  }

  test("llm path parses Q:/SQL: blocks, falls back when offline") {
    val offline = TrainingData.generate(meta, NoOpLlmClient)
    assert(offline == TrainingData.syntheticPairs(meta))
    val canned = new LlmClient {
      def chatComplete(s: String, u: String, m: Int) =
        Right("Q: how many orders\nSQL: SELECT COUNT(*) FROM orders\nQ: list customers\nSQL: SELECT * FROM customer LIMIT 10")
    }
    val pairs = TrainingData.generate(meta, canned)
    assert(pairs == Seq(
      "how many orders" -> "SELECT COUNT(*) FROM orders",
      "list customers" -> "SELECT * FROM customer LIMIT 10"))
  }
}
