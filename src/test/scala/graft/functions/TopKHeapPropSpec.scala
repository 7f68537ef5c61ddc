package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

/** Property test for the bounded worst-first heap backing TopKByValue:
  * against a reference sort over ANY input mix (duplicates, ±0.0, NaN,
  * infinities), offer-all + sortedBestFirst must equal take-k of the
  * totally-ordered sort; merge must be split-insensitive; serialization
  * must round-trip. */
class TopKHeapPropSpec extends AnyFunSuite {

  private val ordGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0, 1.5, 1.5))

  private val pairsGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(ordGen, Gen.chooseNum(-100L, 100L)))

  /** Reference: Spark's total order (NaN greatest), ord desc then id asc. */
  private def refTopK(pairs: List[(Double, Long)], k: Int): List[(Double, Long)] =
    pairs.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }.take(k)

  private def key(p: (Double, Long)): (Long, Long) =
    (java.lang.Double.doubleToLongBits(p._1), p._2) // NaN-stable comparison

  private def run(label: String, prop: Prop): Unit = {
    val result = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, s"$label: ${result.status}")
  }

  test("heap top-k equals reference sort for arbitrary inputs (incl. NaN/inf/dupes)") {
    run("topk", Prop.forAll(pairsGen, Gen.chooseNum(1, 8)) { (pairs, k) =>
      val h = new TopKHeap(k)
      pairs.foreach { case (o, i) => h.offer(o, i) }
      h.sortedBestFirst.toList.map(key) == refTopK(pairs, k).map(key)
    })
  }

  test("merge of split heaps equals the single heap over the union") {
    run("merge", Prop.forAll(pairsGen, pairsGen, Gen.chooseNum(1, 6)) { (a, b, k) =>
      val ha = new TopKHeap(k); a.foreach { case (o, i) => ha.offer(o, i) }
      val hb = new TopKHeap(k); b.foreach { case (o, i) => hb.offer(o, i) }
      ha.absorb(hb)
      val whole = new TopKHeap(k); (a ++ b).foreach { case (o, i) => whole.offer(o, i) }
      ha.sortedBestFirst.toList.map(key) == whole.sortedBestFirst.toList.map(key)
    })
  }

  test("serialization round-trips the heap state") {
    run("serde", Prop.forAll(pairsGen, Gen.chooseNum(1, 6)) { (pairs, k) =>
      val h = new TopKHeap(k)
      pairs.foreach { case (o, i) => h.offer(o, i) }
      val back = TopKHeap.fromBytes(k, h.toBytes)
      back.sortedBestFirst.toList.map(key) == h.sortedBestFirst.toList.map(key)
    })
  }
}
