package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite {
  val schema = Map(
    "students" -> Seq("id", "name", "age"),
    "courses" -> Seq("id", "title"))

  test("fingerprint is 16 lowercase hex chars and stable") {
    val id = Fingerprint.schemaId(schema)
    assert(id.matches("[0-9a-f]{16}"))
    assert(id == Fingerprint.schemaId(schema))
  }

  test("table map order does not change the id") {
    val reordered = Map(
      "courses" -> Seq("id", "title"),
      "students" -> Seq("id", "name", "age"))
    assert(Fingerprint.schemaId(schema) == Fingerprint.schemaId(reordered))
  }

  test("any rename changes the id") {
    val renamed = Map(
      "students" -> Seq("id", "name", "years"),
      "courses" -> Seq("id", "title"))
    assert(Fingerprint.schemaId(schema) != Fingerprint.schemaId(renamed))
  }
}

class SynonymsSpec extends AnyFunSuite {
  test("underscore names get space variants") {
    assert(Synonyms.forName("order_date").contains("order date"))
  }
  test("plural/singular variants") {
    assert(Synonyms.forName("orders").contains("order"))
    assert(Synonyms.forName("customer").contains("customers"))
  }
  test("fk-style *_id maps to base entity") {
    val syn = Synonyms.forName("customer_id")
    assert(syn.contains("customer") && syn.contains("customers"))
  }
  test("mine covers tables and columns") {
    val m = Synonyms.mine(Map("orders" -> Seq("customer_id")))
    assert(m.contains("orders") && m.contains("customer_id"))
  }
}
