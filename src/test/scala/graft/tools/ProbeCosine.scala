package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compares verify-stage layouts for cosineNearDupPairs at sf0.1:
  * current (candIds semi-join + shared member frame) vs direct pair→
  * corpus joins, and stage-by-stage timings for the current shape. */
object ProbeCosine {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)

    def fixture: DataFrame = {
      val e = spark.table("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val planted = e.where(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.25)), slice(col("emb"), 2, 63)).as("emb"))
      e.union(planted)
    }

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (t, n)
      }
      println(f"PROBE $label => min=${ts.map(_._1).min}%.3f rows=${ts.head._2} " +
        ts.map(t => f"${t._1}%.3f").mkString(","))
    }

    // current operator end-to-end
    time("current") {
      graft.operators.Similarity.cosineNearDupPairs(fixture, "vec_id", "emb",
        threshold = 0.95, dim = 64, chunks = 8).count()
    }

    // stage timings of the current shape
    import graft.functions.{cosine_sim, sign_bits_lsh}
    def pairsOf(df: DataFrame): DataFrame = {
      val bits = 8
      val sig = df.select(col("vec_id").as("id"),
        sign_bits_lsh(col("emb"), 64, 64, 42L).as("sig"))
      val bandStructs = (0 until 8).map { i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("sig"), i * bits).bitwiseAND(lit((1L << bits) - 1)).as("value"))
      }
      sig.select(col("id"), explode(array(bandStructs: _*)).as("c"))
        .select(col("id"), col("c.band"), col("c.value"))
        .groupBy("band", "value")
        .agg(collect_list(col("id")).as("ids"), count(lit(1)).as("n"))
        .where(col("n") > 1 && col("n") <= 10000)
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .where(col("id_a") < col("id_b"))
        .distinct()
    }
    time("stage:pairs-only") { pairsOf(fixture).count() }

    // direct variant: pairs checkpointed once, then two joins straight
    // to the corpus narrow projection (no candIds, no member frame)
    time("variant:direct-join") {
      val df = fixture
      val pairs = pairsOf(df).localCheckpoint(false)
      val emb = df.select(col("vec_id").as("id"), col("emb"))
      pairs
        .join(emb.withColumnRenamed("id", "id_a").withColumnRenamed("emb", "__ea"), "id_a")
        .join(emb.withColumnRenamed("id", "id_b").withColumnRenamed("emb", "__eb"), "id_b")
        .select(col("id_a"), col("id_b"), cosine_sim(col("__ea"), col("__eb")).as("cosine"))
        .where(col("cosine") >= 0.95)
        .count()
    }

    spark.stop()
  }
}

/** Variant lab: stage-reduced semi shape and hamming-prescreen shape. */
object ProbeCosine2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.Sources.register(spark, sfDir)
    import graft.functions.{cosine_sim, sign_bits_lsh, hamming64}

    def fixture: DataFrame = {
      val e = spark.table("embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val planted = e.where(col("vec_id") < 25)
        .select((col("vec_id") + 100000).as("vec_id"),
          concat(array(element_at(col("emb"), 1) + lit(0.25)), slice(col("emb"), 2, 63)).as("emb"))
      e.union(planted)
    }

    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (t, n)
      }
      println(f"PROBE $label => min=${ts.map(_._1).min}%.3f rows=${ts.head._2} " +
        ts.map(t => f"${t._1}%.3f").mkString(","))
    }

    // (a) stage-reduced semi shape: no candIds distinct, pair distinct
    // deferred to the (tiny) post-verify result
    time("variant:fewer-stages") {
      val df = fixture
      val bits = 8
      val sig = df.select(col("vec_id").as("id"), sign_bits_lsh(col("emb"), 64, 64, 42L).as("sig"))
      val bandStructs = (0 until 8).map { i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("sig"), i * bits).bitwiseAND(lit((1L << bits) - 1)).as("value"))
      }
      val pairs = sig.select(col("id"), explode(array(bandStructs: _*)).as("c"))
        .select(col("id"), col("c.band"), col("c.value"))
        .groupBy("band", "value")
        .agg(collect_list(col("id")).as("ids"), count(lit(1)).as("n"))
        .where(col("n") > 1 && col("n") <= 10000)
        .select(explode(col("ids")).as("id_a"), col("ids"))
        .select(col("id_a"), explode(col("ids")).as("id_b"))
        .where(col("id_a") < col("id_b"))
        .localCheckpoint(false)
      val candIds = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
      val emb = df.join(candIds, df("vec_id") === candIds("id"), "left_semi")
        .select(col("vec_id").as("id"), col("emb"))
        .localCheckpoint(false)
      pairs
        .join(emb.withColumnRenamed("id", "id_a").withColumnRenamed("emb", "__ea"), "id_a")
        .join(emb.withColumnRenamed("id", "id_b").withColumnRenamed("emb", "__eb"), "id_b")
        .select(col("id_a"), col("id_b"), cosine_sim(col("__ea"), col("__eb")).as("cosine"))
        .where(col("cosine") >= 0.95)
        .dropDuplicates("id_a", "id_b")
        .count()
    }

    // (b) hamming-prescreened: buckets carry (id, sig); pairs filter on
    // full-signature hamming before the vector verify
    for (cut <- Seq(16, 19, 24)) {
      time(s"variant:ham-prescreen-$cut") {
        val df = fixture
        val bits = 8
        val sig = df.select(col("vec_id").as("id"), sign_bits_lsh(col("emb"), 64, 64, 42L).as("sig"))
        val bandStructs = (0 until 8).map { i =>
          struct(lit(i).as("band"),
            shiftrightunsigned(col("sig"), i * bits).bitwiseAND(lit((1L << bits) - 1)).as("value"))
        }
        val pairs = sig.select(struct(col("id"), col("sig")).as("m"), explode(array(bandStructs: _*)).as("c"))
          .select(col("m"), col("c.band"), col("c.value"))
          .groupBy("band", "value")
          .agg(collect_list(col("m")).as("ms"), count(lit(1)).as("n"))
          .where(col("n") > 1 && col("n") <= 10000)
          .select(explode(col("ms")).as("a"), col("ms"))
          .select(col("a"), explode(col("ms")).as("b"))
          .where(col("a.id") < col("b.id") && hamming64(col("a.sig"), col("b.sig")) <= cut)
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .localCheckpoint(false)
        val candIds = pairs.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        val emb = df.join(candIds, df("vec_id") === candIds("id"), "left_semi")
          .select(col("vec_id").as("id"), col("emb"))
          .localCheckpoint(false)
        pairs
          .join(emb.withColumnRenamed("id", "id_a").withColumnRenamed("emb", "__ea"), "id_a")
          .join(emb.withColumnRenamed("id", "id_b").withColumnRenamed("emb", "__eb"), "id_b")
          .select(col("id_a"), col("id_b"), cosine_sim(col("__ea"), col("__eb")).as("cosine"))
          .where(col("cosine") >= 0.95)
          .dropDuplicates("id_a", "id_b")
          .count()
      }
    }
    spark.stop()
  }
}
