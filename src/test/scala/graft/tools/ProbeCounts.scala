package graft.tools
object ProbeCounts {
  def main(args: Array[String]): Unit = {
    println("PROBE pilot=" + graft.eval.Evaluation.pilotCorpus.size +
      " school=" + graft.eval.Evaluation.schoolCorpus.size +
      " intents=" + graft.eval.Evaluation.schoolCorpus.map(_.intent).distinct.size)
  }
}
