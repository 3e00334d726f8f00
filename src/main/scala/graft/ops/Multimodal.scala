package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * layout a 100 TB multimodal training set uses (parquet binary + metadata
  * struct, partitioned by modality/date). The *decode* step is a STUB
  * (this container has no image/audio codecs): `fakeDecode` derives
  * deterministic pseudo-features from the bytes so the distributed
  * plumbing — schema, batching, partition-parallel extraction, feature
  * schema — is real and testable; swapping in a real codec changes only
  * the closure body (in PySpark it would be `mapInPandas` with an Arrow
  * batch of the same shape).
  */
object Multimodal {

  /** Feature row produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      sha256: String,
      width: Int,       // stub: derived from content hash
      height: Int,      // stub
      n_frames: Int,    // stub; 1 for images
      feature: Array[Float]) // stub embedding

  /** STUB decoder: in production this calls the codec (e.g. JPEG decode →
    * resize → CNN features). Deterministic fake: features from the sha256
    * bytes. Marked loudly so no one mistakes it for a real decoder. */
  def fakeDecode(mediaId: Long, modality: String, bytes: Array[Byte]): MediaFeatures = {
    val dig = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    val hex = dig.map("%02x".format(_)).mkString
    def b(i: Int): Int = dig(i % dig.length) & 0xff
    MediaFeatures(
      media_id = mediaId,
      modality = modality,
      n_bytes = bytes.length.toLong,
      sha256 = hex,
      width = 16 + b(0) * 4,
      height = 16 + b(1) * 4,
      n_frames = if (modality == "video") 1 + b(2) % 64 else 1,
      feature = (0 until 8).map(i => (b(i) / 255.0f) - 0.5f).toArray)
  }

  /** Partition-parallel feature extraction over a binary column. The
    * iterator-in/iterator-out shape is the batch contract (`mapInPandas`
    * analog): one decoder init per partition, streaming through rows
    * without materializing the partition. */
  def extractFeatures(media: DataFrame, idCol: String = "media_id",
                      modalityCol: String = "modality",
                      binCol: String = "content"): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val slim = media.select(col(idCol).cast("long"), col(modalityCol), col(binCol))
    slim.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never per-row)
      rows.map { r => fakeDecode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)) }
    }
  }

  /** Deterministic frame sampling plan for video-like assets: every
    * `stride`-th frame index up to `maxFrames`. Pure column expression. */
  def frameSamplePlan(features: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    features.select(col("media_id"), col("n_frames"),
      filter(
        sequence(lit(0), col("n_frames") - 1),
        i => i % stride === 0 && i < stride * maxFrames).as("sampled_frames"))

  /** Build a synthetic media table from the documents corpus (UTF-8 bytes
    * as payload) — test scaffolding for the binary pipeline. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      encode(col("text"), "UTF-8").cast("binary").as("content"))
}
