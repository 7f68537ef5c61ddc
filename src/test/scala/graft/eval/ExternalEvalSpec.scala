package graft.eval

import graft.SparkSpec

/**
 * Structural honesty checks for the externally-sourced eval set. These
 * deliberately do NOT gate on the quality numbers: the set exists to
 * measure generalization to questions the builder didn't write, and a
 * spec that failed when F1 dropped would pressure exactly the
 * template-tuning the set is meant to escape. What IS pinned:
 * provenance discipline, runnable gold, and the reference's
 * always-answer contract (V13 — every question gets an answer
 * envelope, however far from gold).
 */
class ExternalEvalSpec extends SparkSpec {

  test("every case carries provenance, a unique id, and a class label") {
    val cs = ExternalEval.cases
    assert(cs.nonEmpty)
    assert(cs.map(_.id).distinct.size == cs.size)
    assert(cs.forall(_.provenance.nonEmpty))
    assert(cs.map(_.clazz).toSet ==
      Set("verbatim", "template-instantiated", "phrase-derived", "paraphrase",
        "benchmark-derived", "shape-transfer"))
    // verbatim+template cases dominate: the builder-worded classes stay
    // a minority of the set
    assert(cs.count(_.clazz == "phrase-derived") * 2 <= cs.size)
  }

  test("all gold SQL executes on its fixture and every question is answered (always-answer)") {
    val report = ExternalEval.run(spark) // sys.errors if any gold fails
    assert(report.n == ExternalEval.cases.size)
    // the reference-grounded classes answer with a RESULT envelope on
    // every question; the round-16 benchmark-derived class measures
    // Spider-hard shapes and is ALLOWED to answer with the error
    // envelope when every candidate fails the aggregation gate (the
    // known case: b16's distinct-attribute-of-above-average-rows —
    // still an answer under V13, recorded as exec=false in the
    // artifact, a capability gap the class exists to expose)
    val nonBench = report.cases.filter(_.intent != "benchmark-derived")
    assert(nonBench.forall(_.executed),
      nonBench.filterNot(_.executed).map(_.question).mkString("; "))
    assert(report.execSuccessRate >= 0.95,
      report.cases.filterNot(_.executed).map(_.question).mkString("; "))
    assert(report.execOnlyAnswered == report.execOnlyN)
    // the positional primary can only relax the strict name-ordered
    // secondary (the name-sorted pairing is one of the permutations)
    assert(report.scoredMacroF1 >= report.scoredStrictF1 - 1e-9)
    // every class reports stats
    assert(report.byClass.keySet ==
      Set("verbatim", "template-instantiated", "phrase-derived", "paraphrase",
        "benchmark-derived", "shape-transfer"))
  }

  test("fixture invariants the published questions depend on hold") {
    import org.apache.spark.sql.functions._
    // isolated session: the reference schema names collide with the
    // TPC-H fixture views on the shared test session
    val s = spark.newSession()
    ReferenceSchemas.registerSchool(s)
    // Report 1 §5: course X / Fall 2015 / grade C / score < 75 is non-empty
    val v2 = s.table("enrollments").as("e")
      .join(s.table("courses").as("c"), col("e.course_id") === col("c.id"))
      .where(col("c.title") === "X" && col("e.term") === "Fall" &&
        col("e.year") === 2015 && col("e.grade_letter") === "C" &&
        col("e.numeric_score") < 75)
    assert(v2.count() > 0, "Report-1 pilot question must have a non-empty answer")
    // README:170: grade C with score above 75 is non-empty
    val v1 = s.table("enrollments")
      .where(col("grade_letter") === "C" && col("numeric_score") > 75)
    assert(v1.count() > 0)
    // one student with no enrollments exists (anti-join question)
    val lonely = s.table("students").join(s.table("enrollments"),
      col("id") === col("student_id"), "left_anti")
    assert(lonely.count() == 1)
  }
}
