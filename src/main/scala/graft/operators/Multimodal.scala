package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata — the multimodal column
  * pattern (image/audio/video as `binary` with a metadata struct). */
final case class MediaRecord(
    doc_id: Long,
    media: Array[Byte],
    format: String,
    width: Int,
    height: Int)

final case class MediaFeatures(
    doc_id: Long,
    payload_len: Int,
    thumb_w: Int,
    thumb_h: Int,
    features: Array[Float])

/**
 * Multimodal column plumbing: opaque `binary` payloads with typed metadata,
 * decoded/featurized in batched partition passes.
 *
 * The Spark-side shape is real and load-bearing: typed `Dataset[MediaRecord]`
 * with case-class encoders, `mapPartitions` so a real decoder would amortize
 * model/codec initialization per partition and process in batches (the same
 * contract as `mapInPandas` batch iteration), and partition sizing left to
 * the scan. The DECODE ITSELF IS A STUB — this container has no image/audio
 * codecs — replaced by a deterministic transform of the bytes, clearly
 * marked below; swapping `stubDecode` for a JNI/codec call changes no
 * plumbing.
 */
object Multimodal {

  /** Wrap documents as fake media payloads: bytes = UTF-8 of the text,
    * metadata derived arithmetically from the payload (SQL-mirrorable). */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      lit("fake/raw").as("format"),
      (length(col("text")) % 640 + 16).cast("int").as("width"),
      (length(col("text")) % 480 + 16).cast("int").as("height"))
      .as[MediaRecord]
  }

  /**
   * Batched decode + feature extraction.
   *
   * STUB: a real implementation decodes `media` with an image/audio codec
   * and runs a feature model per batch. Here the "features" are a
   * deterministic fold of the payload bytes so results are verifiable.
   */
  def decodeAndFeaturize(
      ds: Dataset[MediaRecord],
      batchSize: Int = 64,
      featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition init happens here (codec/model load in a real impl)
      it.grouped(batchSize).flatMap { batch =>
        batch.map(m => stubDecode(m, featureDim))
      }
    }
  }

  /** Thumbnail rule: cap the long edge at 256, preserving aspect by integer
    * arithmetic (mirrorable in SQL). */
  private def thumb(w: Int, h: Int): (Int, Int) = {
    val long = math.max(w, h)
    if (long <= 256) (w, h)
    else (w * 256 / long, h * 256 / long)
  }

  // STUB decode: deterministic byte-fold "features"; a real decoder goes here.
  private def stubDecode(m: MediaRecord, featureDim: Int): MediaFeatures = {
    val acc = new Array[Long](featureDim)
    var i = 0
    while (i < m.media.length) {
      acc(i % featureDim) += (m.media(i) & 0xff)
      i += 1
    }
    val feats = acc.map(v => (v % 1000L).toFloat / 1000.0f)
    val (tw, th) = thumb(m.width, m.height)
    MediaFeatures(m.doc_id, m.media.length, tw, th, feats)
  }

  /** Frame sampling: split a payload into fixed-size "frames" and keep every
    * `stride`-th — the video-frame-sampling access pattern over binary
    * columns, as a pure column expression. */
  def frameSample(
      media: DataFrame,
      frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    media.select(col("doc_id"),
        posexplode(split(col("media").cast("string"),
          s"(?<=\\G.{$frameBytes})")).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0 && length(col("frame")) > 0)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"))
}
