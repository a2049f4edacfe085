package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payload columns with typed metadata, plus decode / feature-extract
  * / frame-sample stages.
  *
  * The Spark-side plumbing (schema, batching via mapPartitions,
  * partition sizing) is real and tested; the actual media decode is
  * STUBBED (no codec libraries in this environment) behind
  * `realDecode` — swap it for an actual decoder (e.g. javacv/ffmpeg
  * bindings) in production. `fakeDecode` is a deterministic
  * byte-level stand-in so the pipeline is end-to-end testable.
  *
  * Scale notes: payloads stay distributed; mapPartitions amortizes
  * per-partition decoder init (the expensive part with real codecs);
  * metadata-only queries never touch payload bytes thanks to parquet
  * column pruning.
  */
object Multimodal {

  /** Decoded-media feature row. */
  case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      histogram: Array[Float])

  /** STUB for the real media decoder — intentionally unimplemented
    * in this environment (no image/audio libs in the container). */
  def realDecode(payload: Array[Byte]): MediaFeatures = ???

  /** Deterministic fake decode: byte histogram over 16 buckets plus
    * fake dimensions derived from content bytes. Same shape/batching
    * as a real decoder would produce. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaFeatures = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      hist((payload(i) & 0xFF) >> 4) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1)
    var j = 0
    while (j < 16) { hist(j) /= n.toFloat; j += 1 }
    MediaFeatures(docId, payload.length,
      width = 16 + ((payload.headOption.getOrElse(0: Byte) & 0xFF) % 64),
      height = 16 + ((payload.lastOption.getOrElse(0: Byte) & 0xFF) % 64),
      histogram = hist)
  }

  /** Attach an opaque binary payload column (here synthesized from
    * text — in production this is the raw media bytes column). */
  def attachPayload(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(srcCol), "UTF-8").as("payload"))

  /** Batch decode via mapPartitions: one decoder per partition (the
    * pattern that matters with real codecs — init cost amortized,
    * bytes never collected to the driver). */
  def decodeFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("doc_id").as[Long], col("payload").as[Array[Byte]])
      .mapPartitions { it =>
        // real pipeline: init codec context here, once per partition
        it.map { case (id, bytes) => fakeDecode(id, bytes) }
      }
  }

  /** Frame sampling: split the payload into fixed-size "frames" and
    * keep every `stride`-th — the video-frame-subsampling shape,
    * expressed as pure Catalyst array ops (row-local, codegen'd). */
  def sampleFrames(payloads: DataFrame, frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = floor(length(col("payload")) / lit(frameBytes)).cast("int")
    payloads
      .withColumn("frame_idx", explode(
        filter(sequence(lit(0), nFrames - 1),
          i => i % lit(stride) === lit(0))))
      .withColumn("frame_bytes",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"))
  }
}
