package graft.ml

import graft.SparkSpec
import graft.api.Engine
import graft.catalog.Profiler

class EmbeddingsSpec extends SparkSpec {

  lazy val engine: Engine = Engine.forFixtures(spark, sfDir)
  lazy val meta = Profiler.crawl(spark, Seq("customer", "orders", "nation"), engine.fks)

  test("element texts follow the reference phrasing with key prefixes") {
    val kv = Embeddings.elementTexts(meta).toMap
    assert(kv("table:customer") == "table customer")
    assert(kv.keys.exists(_.startsWith("column:customer.c_acctbal")))
    assert(kv("column:customer.c_nationkey").contains("foreign key"))
    assert(kv.keys.exists(_.startsWith("fk:orders.o_custkey")))
  }

  test("training produces deterministic-width embeddings for every element") {
    val (model, _) = Embeddings.train(spark, "testid", meta)
    assert(model.embeddings.nonEmpty)
    val widths = model.embeddings.values.map(_.length).toSet
    assert(widths.size == 1 && widths.head > 0) // exact-vocab width, uniform
  }

  test("retrieval ranks question-relevant elements and routes key prefixes") {
    val (model, enc) = Embeddings.train(spark, "testid", meta)
    val r = Embeddings.retrieve(spark, model, enc, "customer account balance")
    assert(r.tables.contains("customer"))
    assert(!r.usedFallback)
    val r2 = Embeddings.retrieve(spark, model, enc, "qqq zzz xxx")
    assert(r2.usedFallback && r2.tables.nonEmpty) // all-tables fallback
  }

  test("keyword fallback caps at 5 tables / 10 columns") {
    val schema = (1 to 8).map(i => s"t$i" -> (1 to 20).map(j => s"c$j")).toMap
    val q = "t1 t2 t3 t4 t5 t6 c1 c2 c3"
    val r = Embeddings.keywordFallback(schema, q)
    assert(r.tables.size <= 5 + 10) // tables + tables-of-columns, bounded
    assert(r.columns.size <= 10)
  }

  test("model store round-trips model + encoder") {
    val dir = java.nio.file.Files.createTempDirectory("graft-models").toString
    val (model, enc) = Embeddings.train(spark, "abcd1234abcd1234", meta)
    ModelStore.save(spark, dir, model, enc)
    assert(ModelStore.exists(dir, "abcd1234abcd1234"))
    assert(ModelStore.list(dir) == Seq("abcd1234abcd1234"))
    val (loaded, loadedEnc) = ModelStore.load(spark, dir, "abcd1234abcd1234")
    assert(loaded.schema == model.schema)
    assert(loaded.embeddings.keySet == model.embeddings.keySet)
    assert(loaded.embeddings("table:customer").toSeq == model.embeddings("table:customer").toSeq)
    // loaded encoder encodes identically
    val a = Embeddings.encode(spark, enc, Seq("customer balance")).head.toSeq
    val b = Embeddings.encode(spark, loadedEnc, Seq("customer balance")).head.toSeq
    assert(a == b)
    assert(ModelStore.delete(dir, "abcd1234abcd1234"))
    assert(!ModelStore.exists(dir, "abcd1234abcd1234"))
  }

  test("engine train persists and askWithModel answers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-models2").toString
    val p = new TrainingProgress(Seq("crawl", "embed", "save"))
    val id = engine.train(dir, progress = Some(p))
    assert(id.matches("[0-9a-f]{16}"))
    assert(p.isDone && p.overall == 100.0)
    // second train skips (model exists)
    assert(engine.train(dir) == id)
    val r = engine.askWithModel(dir, "how many customers are there")
    assert(r.isRight)
  }

  test("training progress tracker is staged and thread-safe-ish") {
    val p = new TrainingProgress(Seq("a", "b"))
    p.update("a", 50)
    assert(p.overall == 25.0)
    p.fail("boom")
    assert(p.snapshot._2.contains("boom"))
    assert(!p.isDone)
  }
}
