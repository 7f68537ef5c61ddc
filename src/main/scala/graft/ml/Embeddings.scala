package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaMetadata

/**
 * Schema-element embeddings + semantic retrieval (N6/N7/N8 in SURVEY.md
 * §2.9; ref `app/models/trainer.py:184-230`, `app/models/inference.py:70-149`).
 *
 * The reference encodes schema elements with a sentence-transformer
 * (all-MiniLM-L6-v2, 384-d). Torch is unavailable offline/JVM, so the
 * encoder is a pluggable trait with a deterministic MLlib implementation
 * (RegexTokenizer → HashingTF → IDF → L2 Normalizer). Retrieval BEHAVIOR
 * is preserved exactly: top-20 elements, cosine ≥ 0.3 threshold,
 * key-prefix routing (`table:`, `column:t.c`, `fk:`), all-tables
 * fallback (ref inference.py:92-118). Vector VALUES differ — the
 * reference's own fine-tuning is likewise a stub (trainer.py:324-343).
 */
object Embeddings {

  val Dim = 384 // parity with all-MiniLM-L6-v2 output width
  val TopK = 20 // ref inference.py:94

  /** The reference's cosine threshold (inference.py:96), calibrated for
    * MiniLM semantic vectors where related elements score 0.3–0.8. */
  val ReferenceThreshold = 0.3

  /** Calibrated equivalent for this lexical TF-IDF+trigram encoder:
    * related elements score 0.10–0.25 here (sparser overlap), so 0.1
    * plays the same role 0.3 plays for MiniLM. The retrieval CONTRACT
    * (top-20, threshold, prefix routing, all-tables fallback) is
    * unchanged. */
  val Threshold = 0.1

  /** Element texts exactly in the reference's phrasing (trainer.py:194-230). */
  def elementTexts(meta: SchemaMetadata): Seq[(String, String)] = {
    val tables = meta.tables.toSeq.sortBy(_._1).map { case (t, _) =>
      s"table:$t" -> s"table $t"
    }
    val columns = meta.tables.toSeq.sortBy(_._1).flatMap { case (t, ti) =>
      ti.columns.map { c =>
        val flags = (if (c.isPrimaryKey) " primary key" else "") +
          (if (c.isForeignKey) " foreign key" else "")
        s"column:$t.${c.name}" -> s"column $t.${c.name} type ${c.dataType}$flags"
      }
    }
    val rels = meta.relationships.map { e =>
      s"fk:${e.fromTable}.${e.fromColumn}" ->
        s"relationship ${e.fromTable}.${e.fromColumn} -> ${e.toTable}.${e.toColumn}"
    }
    tables ++ columns ++ rels
  }

  /**
   * Token augmentation: words + per-word character trigrams. A purely
   * lexical TF-IDF space can't bridge "balance" → "c_acctbal"; shared
   * char-trigrams ("bal", "acc") give the fuzzy-lexical recall the
   * reference gets from semantic vectors, keeping the encoder
   * deterministic and offline.
   */
  private[ml] def augment(text: String): String = {
    val words = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val grams = words.flatMap { w =>
      if (w.length < 3) Nil else (0 to w.length - 3).map(i => "g_" + w.substring(i, i + 3))
    }
    (words ++ grams).mkString(" ")
  }

  /**
   * Deterministic MLlib encoder pipeline (fit on the element corpus).
   * CountVectorizer over an exact corpus vocabulary — NOT HashingTF:
   * at catalog-vocabulary sizes, hash collisions at a few hundred dims
   * give unrelated questions spurious cosine ≈ 0.12, destroying the
   * threshold's meaning. With an exact vocabulary, out-of-vocabulary
   * terms contribute exactly zero, so gibberish scores 0 and the
   * all-tables fallback fires as the reference intends. Embedding width
   * therefore equals the corpus vocabulary size rather than the
   * reference's fixed 384 (`Dim` kept for documentation).
   */
  def fitEncoder(spark: SparkSession, texts: Seq[String], dim: Int = Dim): PipelineModel = {
    import spark.implicits._
    val df = texts.map(augment).toDF("text")
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("tokens")
        .setPattern("\\s+").setToLowercase(true),
      new org.apache.spark.ml.feature.CountVectorizer()
        .setInputCol("tokens").setOutputCol("tf"),
      new IDF().setInputCol("tf").setOutputCol("tfidf"),
      new Normalizer().setInputCol("tfidf").setOutputCol("embedding").setP(2.0)))
    pipeline.fit(df)
  }

  private def toFloatArray(v: Vector): Array[Float] = {
    val d = v.toArray
    val out = new Array[Float](d.length)
    var i = 0
    while (i < d.length) { out(i) = d(i).toFloat; i += 1 }
    out
  }

  /** Encode arbitrary texts with a fitted encoder. */
  def encode(spark: SparkSession, model: PipelineModel, texts: Seq[String]): Seq[Array[Float]] = {
    import spark.implicits._
    if (texts.isEmpty) return Nil
    val df = texts.zipWithIndex.map { case (t, i) => (i, augment(t)) }.toDF("idx", "text")
    model.transform(df).select("idx", "embedding").collect()
      .sortBy(_.getInt(0))
      .map(r => toFloatArray(r.getAs[Vector]("embedding"))).toSeq
  }

  /** Trained schema model: id, embeddings keyed by element, metadata. */
  final case class SchemaModel(
      schemaId: String,
      schema: Map[String, Seq[String]],
      embeddings: Map[String, Array[Float]],
      trainedAt: String,
      trainingSamples: Int)

  /** Build a SchemaModel from crawled metadata (training stage 5,
    * trainer.py:154-162). */
  def train(spark: SparkSession, schemaId: String, meta: SchemaMetadata,
      trainingSamples: Int = 0): (SchemaModel, PipelineModel) = {
    val kv = elementTexts(meta)
    val encoder = fitEncoder(spark, kv.map(_._2))
    val vecs = encode(spark, encoder, kv.map(_._2))
    val model = SchemaModel(
      schemaId,
      meta.lightweight,
      kv.map(_._1).zip(vecs).toMap,
      trainedAt = java.time.Instant.now().toString,
      trainingSamples = trainingSamples)
    (model, encoder)
  }

  final case class Retrieval(
      tables: Seq[String], columns: Seq[(String, String)],
      similarities: Map[String, Double], usedFallback: Boolean)

  /** Cosine top-k retrieval over the stored embeddings (inference.py:70-118).
    * Driver-side for catalog-sized element sets; the same cosine ranking
    * over a DataFrame is `Similarity.topK` for data-scale retrieval. */
  def retrieve(spark: SparkSession, model: SchemaModel, encoder: PipelineModel,
      question: String, topK: Int = TopK, threshold: Double = Threshold): Retrieval = {
    val qv = encode(spark, encoder, Seq(question)).head
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val scored = model.embeddings.toSeq
      .map { case (k, v) => k -> cosine(qv, v) }
      .filter(_._2 >= threshold)
      .sortBy { case (k, s) => (-s, k) }
      .take(topK)
    val tables = scored.collect { case (k, _) if k.startsWith("table:") => k.drop(6) }
    val columns = scored.collect { case (k, _) if k.startsWith("column:") =>
      val tc = k.drop(7); val i = tc.indexOf('.')
      (tc.take(i), tc.drop(i + 1))
    }
    val fkTables = scored.collect { case (k, _) if k.startsWith("fk:") =>
      k.drop(3).takeWhile(_ != '.')
    }
    val allTables = (tables ++ columns.map(_._1) ++ fkTables).distinct
    if (allTables.isEmpty)
      Retrieval(model.schema.keys.toSeq.sorted, Nil, Map.empty, usedFallback = true)
    else
      Retrieval(allTables, columns, scored.toMap, usedFallback = false)
  }

  /** Keyword-containment fallback (N8, inference.py:120-149): substring
    * match of table/column names in the question; cap 5 tables / 10 cols. */
  def keywordFallback(schema: Map[String, Seq[String]], question: String): Retrieval = {
    val q = question.toLowerCase
    val tables = schema.keys.toSeq.sorted.filter(t => q.contains(t.toLowerCase)).take(5)
    val columns = schema.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      cols.filter(c => q.contains(c.toLowerCase)).map(t -> _)
    }.take(10)
    val ts = (tables ++ columns.map(_._1)).distinct
    Retrieval(if (ts.isEmpty) schema.keys.toSeq.sorted else ts, columns,
      Map.empty, usedFallback = ts.isEmpty)
  }
}
