package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 curation additions: Bloom-screened decontamination,
  * char-distribution quality signals, per-host URL stats. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = {
    graft.sources.Sources.register(spark, sfDir)
    spark.table("documents")
  }

  test("bloom decontamination equals the exact operator (screen has no false negatives)") {
    val evalSet = docs.where($"doc_id" % 97 === 0)
    val exact = Decontamination.decontaminate(docs, "doc_id", "text", evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Decontamination.decontaminateBloom(docs, "doc_id", "text", evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == exact)
    // and something was actually dropped (the eval docs contaminate themselves)
    assert(exact.size < docs.count())
  }

  test("bloom decontamination with aggressive fpp still exact (verify pass bounds it)") {
    val evalSet = docs.where($"doc_id" % 97 === 0)
    val exact = Decontamination.decontaminate(docs, "doc_id", "text", evalSet, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Decontamination.decontaminateBloom(docs, "doc_id", "text", evalSet, "text",
        fpp = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == exact)
  }

  test("semantic decontamination flags rephrased-twin embeddings, not organic neighbors; clean corpus drops exactly them") {
    // corpus of near-orthogonal-ish vectors + an eval set built as
    // PERTURBED copies of every 5th vector (a rephrased benchmark:
    // no shingle overlap, near-identical embedding)
    val dim = 32
    val corpus = (0L until 40L).map { i =>
      val rnd = new scala.util.Random(i)
      (i, Array.fill(dim)(rnd.nextGaussian()))
    }.toDF("id", "emb")
    val evalSet = corpus.where($"id" % 5 === 0)
      .select(($"id" + 1000).as("eid"),
        concat(array(element_at($"emb", 1) + lit(0.05)), slice($"emb", 2, dim - 1))
          .as("eemb"))
    val hits = Decontamination.semanticOverlaps(
      corpus, "id", "emb", evalSet, "eid", "eemb", threshold = 0.95)
      .orderBy("id").collect()
    // exactly the perturbation origins are contaminated, each matched
    // to ITS eval twin at cosine ~1
    assert(hits.map(_.getLong(0)).toSeq == (0L until 40L by 5).toSeq,
      hits.mkString(","))
    assert(hits.forall(r => r.getLong(1) == r.getLong(0) + 1000), hits.mkString(","))
    assert(hits.forall(_.getDouble(2) > 0.99))
    val clean = Decontamination.semanticDecontaminate(
      corpus, "id", "emb", evalSet, "eid", "eemb", threshold = 0.95)
    assert(clean.count() == 32)
    assert(clean.where($"id" % 5 === 0).count() == 0)
    // plan shape: the eval side broadcasts into a nested-loop join and
    // the threshold filter runs BEFORE the argmax aggregate, so only
    // contaminated rows reach the shuffle
    val plan = Decontamination.semanticOverlaps(
      corpus, "id", "emb", evalSet, "eid", "eemb", threshold = 0.95)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("char distribution: entropy matches a hand computation, handles edge cases") {
    val df = Seq(
      (1L, "aaaa"),        // zero entropy
      (2L, "abab"),        // 1 bit/char
      (3L, ""),            // empty → (0.0, 0)
      (4L, "abcd")         // 2 bits/char
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charDistribution(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(1) == 0.0 && out(0).getInt(2) == 1)
    assert(out(1).getDouble(1) == 1.0 && out(1).getInt(2) == 2)
    assert(out(2).getDouble(1) == 0.0 && out(2).getInt(2) == 0)
    assert(out(3).getDouble(1) == 2.0 && out(3).getInt(2) == 4)
  }

  test("char distribution counts code points (surrogate pair = one char)") {
    val df = Seq((1L, "😀😀")).toDF("doc_id", "text") // 😀😀
    val out = TextAnalysis.charDistribution(df, "doc_id", "text").collect()(0)
    assert(out.getDouble(1) == 0.0) // one distinct code point, twice
    assert(out.getInt(2) == 1)
  }

  test("char distribution survives codegen in a filter context") {
    val filtered = TextAnalysis.charDistribution(docs, "doc_id", "text")
      .where($"char_entropy" > 3.0)
    assert(filtered.count() > 0)
    // the "*(n)" prefix marks operators inside a whole-stage-codegen stage
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter"), plan)
  }

  test("self-ref codegen compiles over a NON-NULLABLE input (ev.isNull is a literal there)") {
    // regression: with nullable=false, nullSafeCodeGen replaces ev.isNull
    // with the literal `false`; emitting `false = true;` was a janino
    // compile error that silently dropped the whole stage to interpreted
    // mode. Generate the projection directly — this throws on any
    // compile failure instead of falling back.
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.CharDistribution(
      BoundReference(0, StringType, nullable = false))
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val out = proj(InternalRow(UTF8String.fromString("aabb")))
    val st = out.getStruct(0, 2)
    assert(math.abs(st.getDouble(0) - 1.0) < 1e-12 && st.getInt(1) == 2)
  }

  test("incremental dedup: cross-split pairs only, agrees with the full-corpus pair set") {
    val existing = docs.where($"doc_id" % 10 =!= 0)
    val incoming = docs.where($"doc_id" % 10 === 0)
    val inc = Dedup.incrementalNearDuplicates(existing, incoming, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair crosses the split
    assert(inc.forall { case (a, b) => a % 10 != 0 && b % 10 == 0 })
    // and equals the cross-split slice of the full-corpus exact pairs
    val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        Seq((a, b), (b, a)) // full pairs are id_a < id_b; orient both ways
      }.filter { case (a, b) => a % 10 != 0 && b % 10 == 0 }.toSet
    assert(inc == full, s"inc=$inc full=$full")
  }

  test("incremental dedup finds a planted near-duplicate of an existing doc") {
    val existing = docs.where($"doc_id" < 400)
    val planted = docs.where($"doc_id" === 7)
      .select(($"doc_id" + 100000).as("doc_id"), concat($"text", lit(" zz")).as("text"))
    val out = Dedup.incrementalNearDuplicates(existing, planted, "doc_id", "text", 0.7)
      .collect()
    assert(out.exists(r => r.getLong(0) == 7L && r.getLong(1) == 100007L))
  }

  test("host stats aggregates the url explode by host") {
    val df = Seq(
      (1L, "see https://a.example.com/x and https://a.example.com/y"),
      (2L, "see https://a.example.com/z plus https://b.example.org"),
      (3L, "no links here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.hostStats(df, "doc_id", "text")
      .orderBy("host").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a.example.com" &&
      out(0).getLong(1) == 3 && out(0).getLong(2) == 2 && out(0).getLong(3) == 1)
    assert(out(1).getString(0) == "b.example.org" && out(1).getLong(1) == 1)
  }
}
