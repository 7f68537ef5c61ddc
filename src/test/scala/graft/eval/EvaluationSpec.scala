package graft.eval

import graft.SparkSpec
import graft.api.Engine
import graft.core.QueryResult

class EvaluationSpec extends SparkSpec {

  lazy val engine: Engine = Engine.forFixtures(spark, sfDir)

  test("resultF1: identical sets 1.0, disjoint 0.0, column order irrelevant") {
    def qr(cols: Seq[String], rows: Seq[Seq[Any]]) =
      QueryResult("", cols, rows, rows.size, "")
    val a = qr(Seq("x", "y"), Seq(Seq(1, "a"), Seq(2, "b")))
    val same = qr(Seq("y", "x"), Seq(Seq("a", 1), Seq("b", 2)))
    val half = qr(Seq("x", "y"), Seq(Seq(1, "a"), Seq(9, "z")))
    val disjoint = qr(Seq("x", "y"), Seq(Seq(7, "q")))
    assert(Evaluation.resultF1(a, a) == 1.0)
    assert(Evaluation.resultF1(a, same) == 1.0)
    assert(Evaluation.resultF1(a, disjoint) == 0.0)
    assert(Evaluation.resultF1(a, half) == 0.5)
  }

  test("pilot corpus meets the reference targets offline (exec >= 80%, unsafe = 0)") {
    val report = Evaluation.run(engine, Evaluation.pilotCorpus)
    info(f"exec=${report.execSuccessRate}%.2f macroF1=${report.macroF1}%.2f medianMs=${report.medianLatencyMs}")
    report.cases.foreach(c => info(f"  f1=${c.f1}%.2f ${c.question} -> ${c.generatedSql.take(70)}"))
    // reference targets: >=80% execution success (Report 2 §2), 0 unsafe
    assert(report.execSuccessRate >= 0.8)
    // template-only path (no LLM) currently scores 1.00; the reference's
    // pilot WITH an LLM was 0.72 — keep a regression floor at 0.9
    assert(report.macroF1 >= 0.9)
    assert(report.cases.forall(_.latencyMs < 30000))
  }

  test("all 10 safety probes are blocked (10/10 like the reference pilot)") {
    assert(Evaluation.runSafetyProbes(engine) == 1.0)
  }
}
