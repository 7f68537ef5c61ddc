package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 decomposition + A/B of the ngram-pairs kernel
  * (`Dedup.ngramJaccardPairs`) — the force bench's dominant family
  * (x_dedup_ngram/groups/canonical, x_leakage_split, x_split_audit =
  * 27% of the 10× total). Measures, in ONE session (interleaved):
  *   1. stage volumes: postings rows, capped lists, Σk² (old pair-gen
  *      rows) vs Σk(k−1)/2 (combination rows) — the explosion factor;
  *   2. stage timings (min-of-3): postings agg, old double-explode
  *      pair-gen, combination pair-gen (posexplode + suffix slice);
  *   3. end-to-end old vs new kernel, asserting SET-IDENTICAL output
  *      before timing (the ProbeR18CurateAB discipline).
  * Usage: Test/runMain graft.tools.ProbeR19Ngram <sfDir>
  */
object ProbeR19Ngram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    val docs = spark.table("documents")
    docs.count()

    val n = 3
    val threshold = 0.8
    val maxPostings = 500

    def time(label: String)(f: => Long): Unit = {
      var best = Double.MaxValue; var rows = 0L
      (1 to 3).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROBE $label%-40s min3=$best%7.2fs rows=$rows")
    }

    import graft.operators.Dedup
    val sh = docs.select(col("doc_id").as("id"),
        array_distinct(Dedup.shingles(col("text"), n)).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    val postings = sh.select(col("id"), col("n_sh"), explode(col("sh")).as("__shingle"))
      .select(col("id"), col("n_sh"), xxhash64(col("__shingle")).as("shingle"))

    // ---- volumes ----
    val listSizes = postings.groupBy("shingle").agg(count(lit(1)).as("k"))
      .where(col("k").between(2, maxPostings))
      .agg(count(lit(1)).as("lists"), sum(col("k") * col("k")).as("k2"),
        sum(col("k") * (col("k") - 1) / 2).as("comb"), max("k").as("kmax"))
      .collect()(0)
    println(s"PROBE volumes: lists=${listSizes.get(0)} sumK2=${listSizes.get(1)} " +
      s"sumComb=${listSizes.get(2)} kmax=${listSizes.get(3)}")

    // ---- stage timings ----
    time("postings (shingle+hash explode)")(postings.count())

    def listsOld = postings.groupBy("shingle")
      .agg(collect_list(struct(col("id"), col("n_sh"))).as("ps"))
      .where(size(col("ps")).between(2, maxPostings))
    def listsSorted = postings.groupBy("shingle")
      .agg(sort_array(collect_list(struct(col("id"), col("n_sh")))).as("ps"))
      .where(size(col("ps")).between(2, maxPostings))

    def pairsOld: DataFrame = listsOld
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .where(col("a.id") < col("b.id") &&
        col("a.n_sh") >= col("b.n_sh") * threshold &&
        col("b.n_sh") >= col("a.n_sh") * threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

    def pairsNew: DataFrame = listsSorted
      .select(posexplode(col("ps")).as(Seq("__i", "a")), col("ps"))
      .select(col("a"),
        explode(slice(col("ps"), col("__i") + 2, size(col("ps")) - col("__i") - 1)).as("b"))
      .where(col("a.n_sh") >= col("b.n_sh") * threshold &&
        col("b.n_sh") >= col("a.n_sh") * threshold)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

    // ---- GROUPED kernel prototype: identical texts collapse to one
    // group BEFORE the quadratic stage (guide §8: decide with light
    // proxies, expand once). Cap semantics preserved exactly: a
    // shingle's member count is Σ group sizes, the same number the
    // ungrouped list's length carried. ----
    def pairsGrouped: DataFrame = {
      val groups = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("g"),
          collect_list(col("doc_id")).as("members"))
        .localCheckpoint(eager = false)
      val gsh = groups.select(col("gid"), col("g"),
          array_distinct(Dedup.shingles(col("text"), n)).as("sh"))
        .withColumn("n_sh", size(col("sh")))
      val gpost = gsh.select(col("gid"), col("g"), col("n_sh"),
          explode(col("sh")).as("__shingle"))
        .select(col("gid"), col("g"), col("n_sh"),
          xxhash64(col("__shingle")).as("shingle"))
      val glists = gpost.groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("gid"), col("n_sh"), col("g")))).as("ps"),
          sum(col("g")).as("n_members"))
        .where(col("n_members").between(2, maxPostings))
      // combinations INCLUDING self (slice from i+1): (i,i) stands for
      // within-group pairs, kept only when the group has ≥2 members
      val gpairs = glists
        .select(posexplode(col("ps")).as(Seq("__i", "a")), col("ps"))
        .select(col("a"),
          explode(slice(col("ps"), col("__i") + 1, size(col("ps")) - col("__i"))).as("b"))
        .where((col("a.gid") =!= col("b.gid") || col("a.g") >= 2) &&
          col("a.n_sh") >= col("b.n_sh") * threshold &&
          col("b.n_sh") >= col("a.n_sh") * threshold)
        .groupBy(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
          col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .where(col("jaccard") >= threshold)
      gpairs
        .join(groups.select(col("gid").as("gid_a"), col("members").as("ms_a")), "gid_a")
        .join(groups.select(col("gid").as("gid_b"), col("members").as("ms_b")), "gid_b")
        .select(col("gid_a"), col("gid_b"), col("jaccard"),
          explode(col("ms_a")).as("ia"), col("ms_b"))
        .select(col("gid_a"), col("gid_b"), col("jaccard"), col("ia"),
          explode(col("ms_b")).as("ib"))
        .where(col("gid_a") =!= col("gid_b") || col("ia") < col("ib"))
        .select(when(col("ia") < col("ib"), col("ia")).otherwise(col("ib")).as("id_a"),
          when(col("ia") < col("ib"), col("ib")).otherwise(col("ia")).as("id_b"),
          col("jaccard"))
    }

    // ---- equivalence before timing ----
    val oldOut = pairsOld
    for ((label, cand) <- Seq("new" -> pairsNew, "grouped" -> pairsGrouped)) {
      val dOld = oldOut.exceptAll(cand).count()
      val dNew = cand.exceptAll(oldOut).count()
      println(s"PROBE equivalence old-vs-$label: old-minus=$dOld cand-minus=$dNew " +
        (if (dOld == 0 && dNew == 0) "IDENTICAL" else "*** MISMATCH ***"))
    }

    // ---- interleaved A/B, 3 rounds each ----
    (1 to 3).foreach { r =>
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val nOld = pairsOld.count()
      val sOld = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val nNew = pairsNew.count()
      val sNew = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val nGrp = pairsGrouped.count()
      val sGrp = (System.nanoTime() - t0) / 1e9
      println(f"PROBE ab round$r: old=$sOld%6.2fs ($nOld) comb=$sNew%6.2fs ($nNew) grouped=$sGrp%6.2fs ($nGrp)")
    }

    spark.stop()
  }
}
