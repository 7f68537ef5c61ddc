package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the porcelain -z dirty parser behind the bench's clean-commit
  * stamp (round-13 advice: the old suffix match let a dirty tree stamp
  * a clean bench). Pure string parsing — no Spark session. */
class BenchDirtySpec extends AnyFunSuite {
  private val NUL = "\u0000"
  private val arts = Set("bench_out.json", "bench_summary.json")
  private def dirty(recs: String*): Boolean =
    Bench.porcelainDirty(recs.map(_ + NUL).mkString, (_, p) => arts(p))

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

  /** r15 verdict #8: the driver's own round-record overwrites
    * (CORRECTNESS_rN, VERDICT.md, LEAKCHECK.json, …) stamped every
    * driver bench dirty since r12 — they are data about runs, not code,
    * and are now excluded. Root-level copies ONLY: the same name under
    * a directory is a real change. */
  test("round-record artifacts are not code: excluded at root, dirty in subdirs") {
    assert(Bench.isRecordArtifact("CORRECTNESS_r16.json"))
    assert(Bench.isRecordArtifact("BENCH_r07.json"))
    assert(Bench.isRecordArtifact("VERDICT.md"))
    assert(Bench.isRecordArtifact("ADVICE.md"))
    assert(Bench.isRecordArtifact("LEAKCHECK.json"))
    assert(Bench.isRecordArtifact("plan_audit.json"))
    // not records: code, build config, fixtures, survey docs
    assert(!Bench.isRecordArtifact("build.sbt"))
    assert(!Bench.isRecordArtifact("SURVEY.md"))
    assert(!Bench.isRecordArtifact("src/main/scala/graft/Bench.scala"))
    // directory components never match (a planted copy is a change)
    assert(!Bench.isRecordArtifact("fixtures/VERDICT.md"))
    assert(!Bench.isRecordArtifact("x/CORRECTNESS_r16.json"))
    // name shapes that merely resemble a record stay dirty
    assert(!Bench.isRecordArtifact("CORRECTNESS_rX.json"))
    assert(!Bench.isRecordArtifact("myBENCH_r07.json"))
    // and through the porcelain parser end-to-end
    // end-to-end with the main()'s composed predicate: bench-own files
    // exempt at ANY status, record files exempt only when UNTRACKED —
    // a modified copy of a COMMITTED record is a hand edit to exactly
    // the files the judge reads and must break the clean stamp
    // (round-16 advice)
    def dirtyFull(recs: String*): Boolean = Bench.porcelainDirty(
      recs.map(_ + NUL).mkString,
      (st, p) => arts(p) || (st == "??" && Bench.isRecordArtifact(p)))
    assert(!dirtyFull("?? CORRECTNESS_r16.json", "?? VERDICT.md", " M bench_out.json"))
    assert(dirtyFull("?? CORRECTNESS_r16.json", " M build.sbt"))
    // tracked-record modification (or staged edit) reads DIRTY
    assert(dirtyFull(" M VERDICT.md"))
    assert(dirtyFull("M  BENCH_r07.json"))
    assert(dirtyFull("A  EXTERNAL_EVAL.json"))
    // the bench's own outputs stay exempt even when tracked-modified
    assert(!dirtyFull(" M bench_out.json", " M bench_summary.json"))
  }
}
