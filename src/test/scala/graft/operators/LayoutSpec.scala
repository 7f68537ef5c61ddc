package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def lineitem = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag")
  }

  test("zorderValue: hand-computed Morton interleave of two bucket columns") {
    // buckets (3, 5) = (0b011, 0b101), n=2: bit b of col i -> 2b + i
    // col0 bits 0,1 -> positions 0,2 ; col1 bits 0,2 -> positions 1,5
    // expect 0b100111 = 39
    val row = spark.range(1)
      .select(Layout.zorderValue(Seq(lit(3), lit(5))).as("z")).head()
    assert(row.getLong(0) == 39L, row.getLong(0))
    // z is monotone-ish locality, not order: equal buckets -> equal z
    val same = spark.range(1)
      .select(Layout.zorderValue(Seq(lit(3), lit(5))).as("z"),
        Layout.zorderValue(Seq(lit(3), lit(5))).as("z2")).head()
    assert(same.getLong(0) == same.getLong(1))
  }

  test("bucketOf: quantile ranks cover the full 0..255 range and are monotone") {
    val cuts = Layout.quantileCuts(lineitem, Seq("l_partkey"))("l_partkey")
    assert(cuts.length == 255 && cuts.sameElements(cuts.sorted))
    val ranks = lineitem
      .select(Layout.bucketOf(col("l_partkey"), cuts).as("b"),
        col("l_partkey")).distinct().collect()
    assert(ranks.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 255))
    // sf0.001 has fewer distinct partkeys than buckets — ranks should
    // still spread over most of what the column's cardinality allows
    val span = ranks.map(_.getInt(0)).distinct.length
    val distinctVals = ranks.map(_.getLong(1)).distinct.length
    assert(span >= math.min(256, distinctVals) * 3 / 4,
      s"quantile buckets collapse: $span ranks for $distinctVals values")
    // monotone: sort by value -> bucket sequence is non-decreasing
    val sorted = ranks.sortBy(_.getLong(1)).map(_.getInt(0))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  test("bucketOf: native binary-search rank ≡ the HOF count it replaced (dups, bounds, NaN)") {
    // cutpoints with duplicates (quantile cuts of skewed columns repeat)
    val cuts = Array(1.0, 2.0, 2.0, 2.0, 5.0, 7.5, 7.5, 100.0)
    val hof = (v: org.apache.spark.sql.Column) =>
      size(filter(array(cuts.map(lit): _*), x => x <= v.cast("double")))
    val vals = Seq(0.0, 1.0, 1.5, 2.0, 4.9, 5.0, 7.5, 99.0, 100.0, 101.0,
      Double.NaN, -1e18, 1e18)
    val rows = vals.toDF("v")
      .select(Layout.bucketOf(col("v"), cuts).as("native"), hof(col("v")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), s"$r"))
    // plan stays UDF- and HOF-free: the rank is a single codegen'd expression
    val plan = vals.toDF("v").select(Layout.bucketOf(col("v"), cuts))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("ArrayFilter"), plan)
  }

  test("zorderWrite: rows preserved exactly; both clustered columns get tight per-file spans") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(lineitem, Seq("l_partkey", "l_suppkey"), dir, numFiles = 16)
    val back = spark.read.parquet(dir)
    // exact row multiset preserved (count + keyed checksum)
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), expr("bit_xor(xxhash64(l_orderkey, l_partkey, " +
        "l_suppkey, l_quantity, l_returnflag))")).head()
    assert(sig(back) == sig(lineitem))

    // pruning power: avg normalized span per file is tight on BOTH
    // z-ordered columns; a single-column sort layout leaves the other
    // column's span near 1 (each file covers its whole range)
    def avgSpan(d: String, c: String): Double = {
      val range = spark.read.parquet(d)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      val (lo, hi) = (range.getDouble(0), range.getDouble(1))
      Layout.fileSpans(spark, d, Seq(c))
        .select(avg((col(s"${c}_max") - col(s"${c}_min")) / (hi - lo))).head().getDouble(0)
    }
    val spanPart = avgSpan(dir, "l_partkey")
    val spanSupp = avgSpan(dir, "l_suppkey")
    info(f"z-order spans: l_partkey=$spanPart%.3f l_suppkey=$spanSupp%.3f")
    assert(spanPart < 0.5 && spanSupp < 0.5, s"$spanPart / $spanSupp")

    val sortedDir = java.nio.file.Files.createTempDirectory("singlesort").toString
    lineitem.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sortedDir)
    val sortedSupp = avgSpan(sortedDir, "l_suppkey")
    info(f"single-sort l_suppkey span=$sortedSupp%.3f")
    assert(sortedSupp > 0.8, s"single-column sort should NOT tighten l_suppkey: $sortedSupp")
    assert(spanSupp < sortedSupp / 2)
  }

  test("clustered layout prunes: point-range filters on either column touch a file subset") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_prune").toString
    Layout.zorderWrite(lineitem, Seq("l_partkey", "l_suppkey"), dir, numFiles = 16)
    val total = spark.read.parquet(dir).select(input_file_name()).distinct().count()
    def filesMatching(cond: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).where(cond).select(input_file_name()).distinct().count()
    val maxPart = lineitem.agg(max("l_partkey")).head().getLong(0)
    val fPart = filesMatching(col("l_partkey") <= maxPart / 10)
    val fSupp = filesMatching(col("l_suppkey") <= lit(1))
    info(s"files: total=$total partkey-filter=$fPart suppkey-filter=$fSupp")
    assert(total >= 12)
    assert(fPart < total / 2, s"$fPart of $total")
    assert(fSupp < total / 2, s"$fSupp of $total")
  }

  test("pruneFiles: null-safe interval overlap keeps unknown spans, drops proven-disjoint") {
    import spark.implicits._
    val spans = Seq(
      ("f0", Some(0.0), Some(9.0)),     // below range -> drop
      ("f1", Some(5.0), Some(15.0)),    // straddles lo -> keep
      ("f2", Some(10.0), Some(20.0)),   // inside -> keep
      ("f3", Some(18.0), Some(40.0)),   // straddles hi -> keep
      ("f4", Some(25.0), Some(99.0)),   // above range -> drop
      ("f5", None, None))               // unknown span -> MUST keep
      .toDF("file", "c_min", "c_max")
    val kept = Layout.pruneFiles(spans, "file", "c", 10.0, 20.0)
      .select("file").as[String].collect().sorted
    assert(kept.sameElements(Array("f1", "f2", "f3", "f5")), kept.mkString(","))
  }

  test("prunedRead: content ≡ full-scan filter; plan touches a strict file subset; empty range keeps schema") {
    val dir = java.nio.file.Files.createTempDirectory("prune_read").toString
    Layout.zorderWrite(lineitem, Seq("l_partkey", "l_suppkey"), dir, numFiles = 16)
    val spans = Layout.fileSpans(spark, dir, Seq("l_partkey"))
    val total = spans.count()
    val maxPart = lineitem.agg(max("l_partkey")).head().getLong(0)
    val (lo, hi) = (1.0, maxPart / 10.0)
    // the plan itself reads fewer files than exist
    val planned = Layout.pruneFiles(spans, "file", "l_partkey", lo, hi).count()
    info(s"pruned plan: $planned of $total files")
    assert(planned < total, s"$planned of $total")
    // content equality against the unpruned filtered scan
    def sig(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)), expr("bit_xor(xxhash64(l_orderkey, l_partkey, " +
        "l_suppkey, l_quantity, l_returnflag))")).head()
    val pruned = Layout.prunedRead(spark, dir, spans, "file", "l_partkey", lo, hi)
    val full = spark.read.parquet(dir)
      .where(col("l_partkey") >= lo && col("l_partkey") <= hi)
    assert(sig(pruned) == sig(full))
    // a range no span overlaps: zero rows, schema preserved
    val none = Layout.prunedRead(spark, dir, spans, "file", "l_partkey",
      maxPart + 1e6, maxPart + 2e6)
    assert(none.count() == 0L)
    assert(none.columns.contains("l_suppkey"))
  }

  test("compactionPlan: bins close within one file of the target, big files stand apart, deterministic") {
    import spark.implicits._
    val files = Seq(("a", 70L), ("b", 60L), ("c", 50L), ("d", 40L),
      ("e", 30L), ("f", 250L), ("g", 10L)).toDF("file", "bytes")
    val byFile = Layout.compactionPlan(files, "file", "bytes", 100L)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    // size-desc order: f(250) cum_before 0 -> bin 0; a(70) before 250 -> bin 2;
    // b(60) before 320 -> 3; c(50) before 380 -> 3; d(40) before 430 -> 4;
    // e(30) before 470 -> 4; g(10) before 500 -> 5
    assert(byFile == Map("f" -> 0L, "a" -> 2L, "b" -> 3L, "c" -> 3L,
      "d" -> 4L, "e" -> 4L, "g" -> 5L), byFile.toString)
    // the oversized file shares no bin; every other bin stays under
    // target + largest member
    val bins = Layout.compactionPlan(files, "file", "bytes", 100L)
      .groupBy("bin").agg(sum("bytes").as("b"), count("*").as("n"))
      .as[(Long, Long, Long)].collect()
    assert(bins.find(_._1 == 0L).get._3 == 1L)
    bins.filter(_._1 != 0L).foreach { case (_, b, _) => assert(b <= 170L, b.toString) }
  }

  private def md5Key(id: Long, from: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(from - 1, from - 1 + 12), 16)
  }

  test("integrityManifest: exact fields against hand-computed md5 keys") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (9L, ""), (10L, "x"))
      .toDF("doc_id", "text")
    val m = graft.operators.Layout
      .integrityManifest(docs, "doc_id", pmod($"doc_id", lit(8L)), Some("text"))
      .orderBy("shard").collect()
    // shards: 1 -> {1, 9}, 2 -> {2, 10}
    assert(m.map(_.getAs[Long]("shard")).toSeq == Seq(1L, 2L))
    val s1 = m(0)
    assert(s1.getAs[Long]("n_rows") == 2L && s1.getAs[Long]("min_id") == 1L &&
      s1.getAs[Long]("max_id") == 9L && s1.getAs[Long]("sum_tokens") == 3L)
    assert(s1.getAs[Long]("xor_lo") == (md5Key(1L, 1) ^ md5Key(9L, 1)))
    assert(s1.getAs[Long]("xor_hi") == (md5Key(1L, 17) ^ md5Key(9L, 17)))
    val s2 = m(1)
    assert(s2.getAs[Long]("n_rows") == 2L && s2.getAs[Long]("sum_tokens") == 3L)
    assert(s2.getAs[Long]("xor_lo") == (md5Key(2L, 1) ^ md5Key(10L, 1)))
  }

  test("integrityManifest is row-order and partitioning independent") {
    val docs = (1L to 100L).map(i => (i, s"w$i w${i * 7}")).toDF("doc_id", "text")
    val a = graft.operators.Layout
      .integrityManifest(docs.repartition(7), "doc_id", pmod($"doc_id", lit(4L)), Some("text"))
      .orderBy("shard").collect().map(_.toSeq).toSeq
    val b = graft.operators.Layout
      .integrityManifest(docs.orderBy($"doc_id".desc).coalesce(1), "doc_id",
        pmod($"doc_id", lit(4L)), Some("text"))
      .orderBy("shard").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("manifestDiff: verified transfer is empty; loss, corruption, missing shard flagged") {
    val docs = (1L to 40L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def mf(d: org.apache.spark.sql.DataFrame) = graft.operators.Layout
      .integrityManifest(d, "doc_id", pmod($"doc_id", lit(4L)), Some("text"))
    assert(graft.operators.Layout.manifestDiff(mf(docs), mf(docs)).count() == 0L)
    // one lost row: only its shard flagged, via n_rows
    val lost = graft.operators.Layout
      .manifestDiff(mf(docs), mf(docs.where($"doc_id" =!= 6L))).collect()
    assert(lost.map(_.getAs[Long]("shard")).toSeq == Seq(2L))
    assert(lost(0).getAs[Long]("n_rows_a") == 10L && lost(0).getAs[Long]("n_rows_b") == 9L)
    // one corrupted id (same count): caught by the xor fingerprints
    val corrupt = docs.withColumn("doc_id",
      when($"doc_id" === 6L, 46L).otherwise($"doc_id"))
    val cd = graft.operators.Layout.manifestDiff(mf(docs), mf(corrupt)).collect()
    assert(cd.map(_.getAs[Long]("shard")).toSeq == Seq(2L))
    assert(cd(0).getAs[Long]("n_rows_a") == cd(0).getAs[Long]("n_rows_b"))
    // a receiver missing a whole shard
    val missing = graft.operators.Layout
      .manifestDiff(mf(docs), mf(docs.where(pmod($"doc_id", lit(4L)) =!= 3L))).collect()
    assert(missing.map(_.getAs[Long]("shard")).toSeq == Seq(3L))
    assert(!missing(0).getAs[Boolean]("present_b"))
  }

  test("footerRowCounts: cardinality from footers matches the data and the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("footer_counts").toString
    val docs = (1L to 123L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val counts = graft.operators.Layout.footerRowCounts(spark, dir).collect()
    assert(counts.length == 3)
    assert(counts.map(_.getAs[Long]("n_rows")).sum == 123L)
    assert(counts.forall(_.getAs[String]("file").endsWith(".parquet")))
    // agrees with the content-level manifest's total
    val manifestTotal = graft.operators.Layout
      .integrityManifest(spark.read.parquet(dir), "doc_id", lit(0L))
      .collect().map(_.getAs[Long]("n_rows")).sum
    assert(manifestTotal == 123L)
    // partitioned layout: files live in subdirectories -> recursive list
    val pdir = java.nio.file.Files.createTempDirectory("footer_part").toString
    docs.withColumn("part", pmod($"doc_id", lit(2L)))
      .write.partitionBy("part").mode("overwrite").parquet(pdir)
    val pcounts = graft.operators.Layout.footerRowCounts(spark, pdir).collect()
    assert(pcounts.map(_.getAs[Long]("n_rows")).sum == 123L)
  }
}
