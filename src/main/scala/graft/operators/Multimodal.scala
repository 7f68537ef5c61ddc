package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for training-data pipelines (north-star extension):
 * image/audio/video carried as opaque `binary` columns with typed
 * metadata, decode/feature-extract/resize/frame-sample as per-partition
 * operators.
 *
 * The actual byte decoding is STUBBED (`StubDecoder`) — image/audio codecs
 * are not available in this container — behind the `MediaDecoder` trait;
 * a production deployment plugs a real decoder (JavaCV/TwelveMonkeys/...)
 * into the SAME partition-wise plumbing. Everything Spark-side is real:
 * schema, encoders, partition-wise batch execution, early byte-dropping.
 *
 * Scale design (100 TB of media):
 *  - `mapPartitions` with one decoder instance per partition (setup cost
 *    amortized over the batch, the same shape as mapInPandas batches).
 *  - Feature extraction projects bytes → small feature vectors as early
 *    as possible; the wide `bytes` column never crosses a shuffle.
 *  - Metadata filters (kind/size/duration) are plain columns, so
 *    partition pruning + predicate pushdown apply before any decode.
 */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float], frames_sampled: Int)

  /** Pluggable decoder. Implementations must be Serializable (shipped to
    * executors) and cheap to construct per partition. */
  trait MediaDecoder extends Serializable {
    /** bytes → fixed-width feature vector (e.g. pooled pixels / mel bins). */
    def features(kind: String, bytes: Array[Byte], meta: MediaMeta, dim: Int): Array[Float]
    /** number of frames a sampler would pull from this media. */
    def frameCount(kind: String, meta: MediaMeta, everyMs: Long): Int
  }

  /**
   * STUB decoder — deterministic fake: features are derived from a
   * rolling hash of the bytes, NOT a real decode. Marks exactly the
   * boundary where a real codec plugs in.
   */
  final class StubDecoder extends MediaDecoder {
    override def features(kind: String, bytes: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = graft.functions.HashUtil.mix64(bytes.length.toLong ^ kind.hashCode.toLong)
      var i = 0
      while (i < bytes.length) { h = graft.functions.HashUtil.mix64(h ^ (bytes(i) & 0xffL)); i += 1 }
      i = 0
      while (i < dim) {
        h = graft.functions.HashUtil.mix64(h)
        out(i) = (h.toDouble / Long.MaxValue.toDouble).toFloat
        i += 1
      }
      out
    }
    override def frameCount(kind: String, meta: MediaMeta, everyMs: Long): Int =
      if (kind == "video" && everyMs > 0) math.max(1, (meta.durationMs / everyMs).toInt) else 1
  }

  /**
   * Decode + feature-extract, partition-wise. One decoder per partition;
   * bytes are dropped from the output (never shuffled onward).
   */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      frameEveryMs: Long = 1000L,
      decoder: MediaDecoder = new StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val d = decoder // per-partition instance
      rows.map { r =>
        MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong,
          d.features(r.kind, r.bytes, r.meta, dim),
          d.frameCount(r.kind, r.meta, frameEveryMs))
      }
    }
  }

  final case class FrameRow(
      media_id: Long, frame_index: Int, frame_ts_ms: Long, features: Array[Float])

  /**
   * Frame sampling: one output row per sampled frame (every `everyMs` of
   * media time), features per frame from the decoder. Partition-wise like
   * `extractFeatures`; output row count is Σ frames, bounded by metadata
   * duration — computable from the metadata BEFORE any decode, so
   * admission control can reject oversized jobs up front.
   */
  def sampleFrames(media: Dataset[MediaRow], dim: Int = 64,
      everyMs: Long = 1000L,
      decoder: MediaDecoder = new StubDecoder): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val d = decoder
      rows.flatMap { r =>
        val n = d.frameCount(r.kind, r.meta, everyMs)
        (0 until n).iterator.map { i =>
          // stub: frame features derive from (bytes, frame index); a real
          // decoder would decode the frame at ts = i * everyMs
          val f = d.features(r.kind, r.bytes :+ i.toByte, r.meta, dim)
          FrameRow(r.media_id, i, i * everyMs, f)
        }
      }
    }
  }

  /**
   * Resize: pure metadata transform for the stub (target dimensions are
   * recorded; a real decoder re-encodes bytes). Keeps the byte column
   * untouched so the plan stays narrow until a decode is actually needed.
   */
  def resize(media: Dataset[MediaRow], maxWidth: Int, maxHeight: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.meta.width <= maxWidth && r.meta.height <= maxHeight) r
      else {
        val scale = math.min(maxWidth.toDouble / r.meta.width, maxHeight.toDouble / r.meta.height)
        r.copy(meta = r.meta.copy(
          width = math.max(1, (r.meta.width * scale).toInt),
          height = math.max(1, (r.meta.height * scale).toInt)))
      }
    }
  }

  /** Metadata-only filtering — no decode, pure columnar predicates that
    * push down to the scan. */
  def filterDecodable(df: DataFrame, maxBytes: Long = 50L * 1024 * 1024): DataFrame =
    df.where(col("kind").isin("image", "audio", "video") &&
      length(col("bytes")) <= maxBytes &&
      col("meta.durationMs") >= 0)

  /**
   * Deterministic media table DERIVED from the `documents` fixture: the
   * text bytes stand in for the media payload, so every metadata field
   * (and therefore the feature-extraction outputs that depend only on
   * payload size / kind / duration) is a pure function of columns DuckDB
   * can see — which makes the multimodal pipeline oracle-checkable
   * end-to-end while the byte plumbing (binary column, typed metadata,
   * partition-wise decode) stays real.
   *
   *  - media_id = doc_id, kind = doc_id mod 3 → image/audio/video
   *  - bytes = UTF-8 text payload (n_bytes = octet_length(text))
   *  - durationMs = 1000 + (char_length(text) * 7) mod 4000
   */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    val kinds = Array("image", "audio", "video")
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)].map { case (id, text) =>
      val t = if (text == null) "" else text
      val kind = kinds(((id % 3 + 3) % 3).toInt)
      MediaRow(id, kind, t.getBytes(java.nio.charset.StandardCharsets.UTF_8), MediaMeta(
        format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
        width = 64 + (t.length % 64), height = 64,
        sampleRate = 16000, durationMs = 1000L + (t.length.toLong * 7) % 4000))
    }
  }

  /** Deterministic synthetic media table (for tests/demos — the fixture
    * set has no media table). */
  def synthetic(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(n).as[Long].map { i =>
      var h = graft.functions.HashUtil.mix64(seed ^ i)
      val kind = kinds((h & 0x7fffffff).toInt % 3)
      h = graft.functions.HashUtil.mix64(h)
      val len = 64 + (h & 0xff).toInt
      val bytes = new Array[Byte](len)
      var j = 0
      var b = h
      while (j < len) { b = graft.functions.HashUtil.mix64(b); bytes(j) = b.toByte; j += 1 }
      MediaRow(i, kind, bytes, MediaMeta(
        format = if (kind == "image") "png" else if (kind == "audio") "wav" else "mp4",
        width = 64 + (b & 0x3f).toInt, height = 64,
        sampleRate = 16000, durationMs = 1000L + (b & 0xfff)))
    }
  }
}
