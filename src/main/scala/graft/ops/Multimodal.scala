package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * layout a 100 TB multimodal training set uses (parquet binary + metadata
  * struct, partitioned by modality/date). The IMAGE decode path is REAL:
  * `javax.imageio` (in-JDK, offline, headless-safe) decodes PNG/JPEG/GIF/
  * BMP bytes to true dimensions, channel statistics, and a down-sampled
  * luminance grid. Bytes that are not a decodable image (and the audio/
  * video modalities, for which the JDK ships no codec) fall back to
  * `byteFeatures` — a loudly-labeled deterministic STUB deriving
  * pseudo-features from the sha256 of the bytes, so the distributed
  * plumbing (schema, batching, partition-parallel extraction) stays
  * exercised end-to-end either way; `decoded` records which path a row
  * took. Swapping in an audio/video codec changes only the closure body
  * (in PySpark this would be `mapInPandas` over an Arrow batch of the
  * same shape).
  */
object Multimodal {

  /** Feature row produced by the decoder. `decoded` = a real codec ran;
    * false = the byte-derived stub fallback (audio/video, or bytes that
    * no installed image reader accepts). */
  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      sha256: String,
      width: Int,       // real pixels when decoded; else sha256-derived stub
      height: Int,
      n_frames: Int,    // 1 for images; stub for video
      decoded: Boolean,
      feature: Array[Float]) // image: [meanR, meanG, meanB] ++ 4×4 luminance grid

  private val GRID = 4

  /** REAL image decode via the JDK's ImageIO — no external dependency,
    * works offline/headless. Returns None when no reader accepts the
    * bytes (wrong modality, truncated file, exotic color space a stock
    * reader rejects). Features: per-channel means over the full pixel
    * raster (stride-sampled above ~512×512 so a 100-MP scan costs the
    * same as a thumbnail — deterministic, no RNG) and a GRID×GRID mean-
    * luminance map (ITU-R BT.601 weights), the classic cheap perceptual
    * signature (downstream of it: aHash/dHash near-dup, brightness
    * filters, letterbox detection). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return None
        val stride = math.max(1, math.max(w, h) / 512)
        val sumC = new Array[Double](3)
        val lum = new Array[Double](GRID * GRID)
        val cnt = new Array[Long](GRID * GRID)
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sumC(0) += r; sumC(1) += g; sumC(2) += b
            // gx/gy in [0, GRID): multiply-then-divide keeps cell edges
            // exact for any w,h (x * GRID / w is monotone, hits GRID-1 max)
            val cell = (y.toLong * GRID / h).toInt * GRID + (x.toLong * GRID / w).toInt
            lum(cell) += 0.299 * r + 0.587 * g + 0.114 * b
            cnt(cell) += 1
            n += 1
            x += stride
          }
          y += stride
        }
        val feat = new Array[Float](3 + GRID * GRID)
        var i = 0
        while (i < 3) { feat(i) = (sumC(i) / n / 255.0).toFloat; i += 1 }
        i = 0
        while (i < GRID * GRID) {
          feat(3 + i) = if (cnt(i) == 0) 0f else (lum(i) / cnt(i) / 255.0).toFloat
          i += 1
        }
        Some((w, h, feat))
      }
    } catch { case _: Exception => None } // e.g. CMYK JPEG on a stock reader

  /** STUB fallback: deterministic pseudo-features from the sha256 of the
    * bytes. This is NOT a decoder — it exists so the audio/video
    * modalities (no in-JDK codec) and undecodable image bytes still flow
    * through the full distributed pipeline with a stable, testable
    * schema. Marked loudly so no one mistakes it for analysis. */
  def byteFeatures(mediaId: Long, modality: String, bytes: Array[Byte]): MediaFeatures = {
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
      decoded = false,
      feature = (0 until 8).map(i => (b(i) / 255.0f) - 0.5f).toArray)
  }

  /** Decode one asset: real ImageIO path for images, stub fallback
    * otherwise (and for image bytes no reader accepts). */
  def decode(mediaId: Long, modality: String, bytes: Array[Byte]): MediaFeatures =
    if (modality == "image")
      decodeImage(bytes) match {
        case Some((w, h, feat)) =>
          val dig = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
          MediaFeatures(mediaId, modality, bytes.length.toLong,
            dig.map("%02x".format(_)).mkString, w, h, n_frames = 1,
            decoded = true, feature = feat)
        case None => byteFeatures(mediaId, modality, bytes)
      }
    else byteFeatures(mediaId, modality, bytes)

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
      // expensive; never per-row) — ImageIO reader instances are cheap
      // enough to create per call, but a native codec's context is not
      rows.map { r => decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)) }
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
    * as payload) — test scaffolding for the binary pipeline. Text bytes
    * are not a decodable image, so "image" rows exercise the fallback;
    * real PNG/JPEG bytes exercise [[decodeImage]] (MultimodalSpec). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("modality"),
      encode(col("text"), "UTF-8").cast("binary").as("content"))
}
