package graft.link

import org.scalatest.funsuite.AnyFunSuite

class FuzzySpec extends AnyFunSuite {

  test("identical strings score 100") {
    assert(Fuzzy.partialRatio("customer", "customer") == 100)
  }

  test("exact substring scores 100 (sliding window)") {
    assert(Fuzzy.partialRatio("order", "show me all orders please") == 100)
    assert(Fuzzy.partialRatio("cust", "customer") == 100)
  }

  test("case-insensitive") {
    assert(Fuzzy.partialRatio("Customer", "CUSTOMER") == 100)
  }

  test("disjoint alphabets score low") {
    assert(Fuzzy.partialRatio("xyz", "abbabba") < 40)
  }

  test("ratio is 2*LCS/(m+n)*100") {
    // LCS("abcd","abed") = 3 -> 2*3/8*100 = 75
    assert(Fuzzy.ratio("abcd", "abed") == 75)
  }

  test("bounds and symmetry hold for arbitrary strings") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val r = Fuzzy.partialRatio(a, b)
      assert(r >= 0 && r <= 100, s"range: '$a' '$b' -> $r")
      assert(r == Fuzzy.partialRatio(b, a), s"symmetry: '$a' '$b'")
    }
  }

  val schema = Map(
    "customer" -> Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "c_nationkey"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey", "l_quantity", "l_discount"),
    "part" -> Seq("p_partkey", "p_name", "p_retailprice"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_acctbal"),
    "nation" -> Seq("n_nationkey", "n_name"))

  test("selectRelevant keeps at most 4 tables and 8 columns each") {
    val slice = Fuzzy.selectRelevant("total price of orders per customer", schema)
    assert(slice.tables.size <= 4)
    assert(slice.tables.values.forall(_.size <= 9)) // 8 + possible id column
    assert(slice.tables.contains("orders"))
    assert(slice.tables.contains("customer"))
  }

  test("selectRelevant appends id columns when present") {
    val s = Map("users" -> Seq("name", "age", "email", "city", "zip", "phone", "job", "bio", "id"))
    val slice = Fuzzy.selectRelevant("what city do people live in", s)
    assert(slice.tables("users").contains("id"))
  }
}
