package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed by batched per-partition transforms — the
  * Scala analogue of a Pandas-UDF/`mapInPandas` stage (grouped record
  * batches through a typed function, Arrow-batch-shaped).
  *
  * The DECODE STEP IS A STUB: real image/audio/video codecs are not
  * available in this environment, so `decodeStub` fakes a decode
  * deterministically (fixed-size byte "frames"). Everything around it
  * — schema, Encoders, batch iteration, partition parallelism, feature
  * shape — is the real plumbing a production decode would drop into.
  */
object Multimodal {

  val FrameBytes = 256
  val BatchSize = 32

  case class MediaRow(media_id: Long, media_type: String,
      payload: Array[Byte])
  case class DecodedMedia(media_id: Long, media_type: String,
      n_bytes: Long, n_frames: Long, features: Array[Double],
      feature_norm: Double)

  /** Derive a media table from `documents`: payload = UTF-8 bytes,
    * media_type cycled by id. Stands in for a real (id, type, bytes)
    * object-store scan. */
  def deriveMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** STUB decode — a real implementation would dispatch on mediaType
    * to an image/audio/video codec. Deterministic fake: fixed-size
    * byte chunks as "frames". */
  def decodeStub(payload: Array[Byte], mediaType: String): Array[Array[Byte]] =
    if (payload == null || payload.isEmpty) Array.empty
    else payload.grouped(FrameBytes).toArray

  /** Per-frame scalar feature: mean unsigned byte value (stands in for
    * a real embedding/feature extractor). */
  def frameFeature(frame: Array[Byte]): Double =
    if (frame.isEmpty) 0.0
    else frame.map(b => (b & 0xFF).toDouble).sum / frame.length

  /** Frame sampling: every `every`-th frame starting at 0 — the
    * video-keyframe subsampling step (a real pipeline samples before
    * the expensive per-frame model). */
  def sampleFrames(frames: Array[Array[Byte]], every: Int): Array[Array[Byte]] = {
    require(every > 0, s"sampling stride must be positive, got $every")
    frames.zipWithIndex.collect { case (f, i) if i % every == 0 => f }
  }

  /** STUB resize — a real implementation rescales pixel data; the
    * deterministic fake truncates or zero-pads to the target byte
    * size, preserving the plumbing contract (fixed-size output per
    * frame, pure per-frame map). */
  def resizeStub(frame: Array[Byte], targetBytes: Int): Array[Byte] =
    java.util.Arrays.copyOf(frame, targetBytes)

  /** Batched decode + feature extraction. One task per partition, rows
    * processed in BatchSize groups (the mapInPandas batch shape); all
    * state is per-batch, so executors stream arbitrarily large
    * partitions at constant memory. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val frames = decodeStub(m.payload, m.media_type)
          val feats = frames.map(frameFeature)
          DecodedMedia(m.media_id, m.media_type,
            if (m.payload == null) 0L else m.payload.length.toLong,
            frames.length.toLong, feats,
            math.sqrt(feats.map(f => f * f).sum))
        }
      }
    }
  }
}
