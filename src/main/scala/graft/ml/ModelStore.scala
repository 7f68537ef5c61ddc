package graft.ml

import java.nio.file.{Files, Paths}

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import graft.ml.Embeddings.SchemaModel

/**
 * Model persistence (S10 in SURVEY.md §2.1; ref `app/models/trainer.py:48-97`
 * — metadata.json / model_info.json / embeddings.npz / encoder dir).
 * Spark shape: JSON sidecars + an `(key string, vec array<float>)` parquet
 * for embeddings + the MLlib `PipelineModel` writer for the encoder.
 */
object ModelStore {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def save(spark: SparkSession, dir: String, model: SchemaModel, encoder: PipelineModel): Unit = {
    import spark.implicits._
    val base = Paths.get(dir, model.schemaId)
    Files.createDirectories(base)

    val metaJson = model.schema.toSeq.sortBy(_._1).map { case (t, cols) =>
      s""""${esc(t)}": [${cols.map(c => "\"" + esc(c) + "\"").mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    Files.writeString(base.resolve("metadata.json"), metaJson)

    val info =
      s"""{"schema_id": "${model.schemaId}", "trained_at": "${model.trainedAt}",
         | "training_samples": ${model.trainingSamples},
         | "embedding_dim": ${model.embeddings.headOption.map(_._2.length).getOrElse(0)},
         | "n_elements": ${model.embeddings.size}}""".stripMargin
    Files.writeString(base.resolve("model_info.json"), info)

    model.embeddings.toSeq.map { case (k, v) => (k, v.toSeq) }
      .toDF("key", "vec")
      .repartition(1)
      .write.mode("overwrite").parquet(base.resolve("embeddings.parquet").toString)

    encoder.write.overwrite().save(base.resolve("encoder").toString)
  }

  def load(spark: SparkSession, dir: String, schemaId: String): (SchemaModel, PipelineModel) = {
    import spark.implicits._
    val base = Paths.get(dir, schemaId)

    val metaJson = Files.readString(base.resolve("metadata.json"))
    // minimal parser for the flat {"t": ["c", ...]} shape we write
    val tableRe = "\"([^\"]+)\"\\s*:\\s*\\[([^\\]]*)\\]".r
    val colRe = "\"([^\"]+)\"".r
    val schema = tableRe.findAllMatchIn(metaJson).map { m =>
      m.group(1) -> colRe.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
    }.toMap

    val infoJson = Files.readString(base.resolve("model_info.json"))
    val trainedAt = "\"trained_at\"\\s*:\\s*\"([^\"]+)\"".r
      .findFirstMatchIn(infoJson).map(_.group(1)).getOrElse("")
    val samples = "\"training_samples\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(infoJson).map(_.group(1).toInt).getOrElse(0)

    val embeddings = spark.read.parquet(base.resolve("embeddings.parquet").toString)
      .as[(String, Seq[Float])].collect().map { case (k, v) => k -> v.toArray }.toMap

    val encoder = PipelineModel.load(base.resolve("encoder").toString)
    (SchemaModel(schemaId, schema, embeddings, trainedAt, samples), encoder)
  }

  def exists(dir: String, schemaId: String): Boolean =
    Files.exists(Paths.get(dir, schemaId, "model_info.json"))

  def list(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().filter(f => exists(dir, f.getName)).map(_.getName).toSeq.sorted
  }

  def delete(dir: String, schemaId: String): Boolean = {
    val base = Paths.get(dir, schemaId)
    if (!Files.exists(base)) return false
    import scala.jdk.CollectionConverters._
    Files.walk(base).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    true
  }
}

/**
 * Thread-safe staged training progress (N16; ref `app/models/progress.py`):
 * per-stage percentages, overall = mean, terminal error state.
 */
final class TrainingProgress(stages: Seq[String]) {
  private val lock = new Object
  private var pct = stages.map(_ -> 0.0).toMap
  private var err: Option[String] = None

  def update(stage: String, p: Double): Unit = lock.synchronized {
    require(pct.contains(stage), s"unknown stage $stage")
    pct = pct.updated(stage, math.max(0.0, math.min(100.0, p)))
  }
  def fail(message: String): Unit = lock.synchronized { err = Some(message) }
  def overall: Double = lock.synchronized { if (pct.isEmpty) 0 else pct.values.sum / pct.size }
  def snapshot: (Map[String, Double], Option[String]) = lock.synchronized { (pct, err) }
  def isDone: Boolean = lock.synchronized { err.isEmpty && pct.values.forall(_ >= 100.0) }
}
