package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the porcelain -z dirty parser behind the bench's clean-commit
  * stamp (round-13 advice: the old suffix match let a dirty tree stamp
  * a clean bench). Pure string parsing — no Spark session. */
class BenchDirtySpec extends AnyFunSuite {
  private val NUL = "\u0000"
  private val arts = Set("bench_out.json", "bench_summary.json")
  private def dirty(recs: String*): Boolean =
    Bench.porcelainDirty(recs.map(_ + NUL).mkString, arts)

  test("artifact-only churn is clean, any other file is dirty") {
    assert(!dirty(" M bench_out.json"))
    assert(!dirty(" M bench_out.json", "M  bench_summary.json"))
    assert(dirty(" M bench_out.json", " M src/main/scala/graft/Bench.scala"))
    assert(dirty("?? newfile.scala"))
    assert(!dirty()) // clean tree: empty porcelain output
  }

  test("suffix traps from the round-13 advice read dirty") {
    // a dirty file whose path merely ENDS in an artifact name
    assert(dirty(" M fixtures/bench_out.json"))
    assert(dirty(" M r13_bench_out.json"))
    // a filename with a space before an artifact name
    assert(dirty(" M weird bench_out.json"))
  }

  test("the first record keeps its meaning even when space-prefixed") {
    // " M x" must parse as status " M" + path "x", not path "M x"
    assert(dirty(" M x"))
    assert(!dirty(" M bench_summary.json"))
  }

  test("renames and copies are always dirty, old-path segment consumed") {
    // porcelain -z rename: `R  <new>\0<old>` — the old path has no prefix
    assert(dirty("R  renamed.scala", "original.scala"))
    // a rename INTO an artifact name is still dirty (it is not churn)
    assert(dirty("R  bench_out.json", "src/Thing.scala"))
    // the old-path segment is consumed by its rename, not parsed as a
    // record: rename + artifact churn is dirty because of the RENAME
    assert(dirty("R  a.scala", "b.scala", " M bench_out.json"))
    // and the artifact churn alone stays clean (control)
    assert(!dirty(" M bench_out.json"))
  }

  test("malformed records read dirty (conservative)") {
    assert(dirty("M"))
    assert(dirty("XYnospace"))
  }
}
