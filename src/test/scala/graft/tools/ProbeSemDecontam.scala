package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Force-scale probe for semantic decontamination
  * (`Decontamination.semanticOverlaps`): 1M synthetic 64-d corpus
  * embeddings × a 1k-item broadcast eval set, with 200 planted
  * rephrased twins. Asserts the two scale contracts the operator
  * claims: (1) recall — exactly the planted twins are flagged, organic
  * cosines never cross the gate; (2) the shuffle is CONTAMINATION-sized
  * (only rows past the in-scan threshold filter reach the argmax
  * aggregate), not corpus-sized — the cross-product itself streams
  * through the broadcast nested-loop stage without materializing.
  * Run: `sbt -batch "Test/runMain graft.tools.ProbeSemDecontam"`. */
object ProbeSemDecontam {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })

    val dim = 64
    val nCorpus = 1000000L
    val nEval = 1000L   // benchmark-sized; broadcasts at ~0.5 MB
    val planted = 200L  // every 5000th corpus doc has an eval twin

    // deterministic pseudo-random vectors: component = xxhash64(id, d)
    // mapped to uniform [-1, 1] — genuinely hash-random (a sine lattice
    // tried first had enough structure to push organic cosines past
    // 0.95 on six hundred thousand pairs), so organic cosines
    // concentrate near 0 with σ ≈ 1/√dim ≈ 0.125: the extreme over the
    // 10⁹ cross pairs stays ≈ 6σ ≈ 0.75, far under the 0.95 gate
    def vec(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod(xxhash64(id, d), lit(2000001L)).cast("double") - 1000000.0) / 1000000.0)
    val corpus = spark.range(nCorpus).select(col("id"), vec(col("id")).as("emb"))
    // eval set: 200 twins (the every-5000th corpus vector, perturbed
    // on one component — cosine vs its origin ≈ 1 − ε ≫ any organic
    // pair) + 800 pure-noise benchmark items from a disjoint id space
    // that must match NOTHING
    val twins = spark.range(planted)
      .select((col("id") * 5000).as("src"))
      .select((col("src") + 10000000L).as("eval_id"),
        concat(array(element_at(vec(col("src")), 1) + lit(0.05)),
          slice(vec(col("src")), 2, dim - 1)).as("emb"))
    val noise = spark.range(nEval - planted)
      .select((col("id") + 20000000L).as("eval_id"),
        vec(col("id") + 20000000L).as("emb"))
    val evalSet = twins.unionByName(noise)

    val w0 = shuffleWrite
    val t0 = System.nanoTime()
    val hits = graft.operators.Decontamination.semanticOverlaps(
      corpus, "id", "emb", evalSet, "eval_id", "emb", threshold = 0.95)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // listener events are async
    val mb = (shuffleWrite - w0) / 1e6
    println(f"PROBE sem_decontam_1m_x_1k => wall=$secs%.1fs shuffle_write=$mb%.2fMB hits=${hits.length}")
    assert(hits.length == planted,
      s"expected exactly the $planted planted twins, got ${hits.length}")
    assert(hits.forall(r => r.getLong(0) % 5000 == 0 &&
      r.getLong(1) == r.getLong(0) + 10000000L),
      "every hit must be a planted origin matched to ITS twin")
    assert(hits.forall(_.getDouble(2) > 0.99))
    // contamination-sized shuffle: 200 surviving rows, not 1M — anything
    // near corpus scale means the threshold filter left the scan stage
    assert(mb < 10, f"shuffle must be contamination-sized, got $mb%.2fMB")
    spark.stop()
  }
}
