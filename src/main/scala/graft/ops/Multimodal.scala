package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media assets are opaque `binary` columns with typed metadata — the
  * layout a 100 TB multimodal training set uses (parquet binary + metadata
  * struct, partitioned by modality/date). The IMAGE and AUDIO decode
  * paths are REAL and in-JDK (offline, headless-safe): `javax.imageio`
  * decodes PNG/JPEG/GIF/BMP bytes to true dimensions, channel
  * statistics, and a down-sampled luminance grid;
  * `javax.sound.sampled` parses WAV/AIFF/AU PCM to sample rate,
  * channel count, frame count, RMS/zero-crossing features. VIDEO
  * container metadata (AVI/MP4 header walks) is always real, and two
  * codec-free frame formats get REAL pixel features — MJPEG (each
  * frame chunk is a plain JPEG the stock reader decodes) and
  * uncompressed BI_RGB DIB (raw BGR bytes, no decoder needed at all).
  * Everything else — undecodable bytes and compressed video codecs
  * the JDK ships no decoder for (H.264/VP9/...) — falls back to
  * `byteFeatures`, a loudly-labeled deterministic STUB deriving
  * pseudo-features from the sha256 of the bytes, so the distributed
  * plumbing (schema, batching, partition-parallel extraction) stays
  * exercised end-to-end either way; `decoded` records which path a
  * row took. That codec boundary is the pluggable [[VideoFrameDecoder]]
  * seam: a deployment with a native codec implements the one-method
  * trait and passes it to [[extractFeatures]] — schema, batch shape,
  * and the fallback are untouched (in PySpark this would be
  * `mapInPandas` over an Arrow batch of the same shape).
  */
object Multimodal {

  /** THE pluggable video-codec seam. The in-JDK codec surface is
    * exhausted (MJPEG frame chunks the stock JPEG reader decodes;
    * uncompressed BI_RGB DIB chunks needing no decoder at all) —
    * every other codec (H.264/VP9/AV1/...) needs a native decoder this
    * container doesn't ship. A deployment that has one implements this
    * ONE method and passes it to [[decode]]/[[extractFeatures]]; the
    * operator's schema, batching, and `decoded=false` fallback are
    * untouched. Contract: return the image-grade feature vector
    * (channel means + luminance grid, the [[decodeImage]] shape)
    * averaged over sampled frames, or None when no frame decodes —
    * None falls through to container-only triage features exactly as
    * the JDK path does today. Must be Serializable: it ships inside
    * the `mapPartitions` closure, and implementations should hold
    * codec CONTEXTS lazily/per-JVM, never serialize them. */
  trait VideoFrameDecoder extends Serializable {
    def frameFeatures(fourcc: String, bytes: Array[Byte]): Option[Array[Float]]
  }

  /** The in-JDK implementation of the seam: MJPEG via the stock JPEG
    * reader, raw BI_RGB DIB via plain byte math, None for every codec
    * fourcc the JDK cannot decode. */
  object JdkVideoDecoder extends VideoFrameDecoder {
    def frameFeatures(fourcc: String, bytes: Array[Byte]): Option[Array[Float]] =
      if (fourcc.equalsIgnoreCase("MJPG")) mjpegFrameFeatures(bytes)
      else dibFrameFeatures(bytes)
  }

  /** Feature row produced by the decoder. `decoded` = the emitted
    * metadata/features were genuinely parsed from the bytes (ImageIO
    * pixels, sampled-audio PCM, or an AVI/MP4 container-header walk —
    * for video the width/height/n_frames/duration are real but PIXEL
    * features are not, the JDK ships no codec); false = the sha-derived
    * stub fallback for bytes nothing could parse. */
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
        Some((w, h, rasterFeatures(w, h, img.getRGB)))
      }
    } catch { case _: Exception => None } // e.g. CMYK JPEG on a stock reader

  /** The image-feature loop over any packed-RGB pixel accessor —
    * shared by [[decodeImage]] (ImageIO raster) and the raw-DIB video
    * frame path, so both produce the IDENTICAL feature contract:
    * 3 channel means + GRID² luminance cells, stride-sampled above
    * ~512×512 (deterministic, no RNG). */
  private def rasterFeatures(w: Int, h: Int,
                             pixAt: (Int, Int) => Int): Array[Float] = {
    val stride = math.max(1, math.max(w, h) / 512)
    val sumC = new Array[Double](3)
    val lum = new Array[Double](GRID * GRID)
    val cnt = new Array[Long](GRID * GRID)
    var n = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = pixAt(x, y)
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
    feat
  }

  /** REAL audio decode via the JDK's javax.sound.sampled — WAV/AIFF/AU
    * container parsing plus PCM sample access, no external dependency,
    * no audio hardware touched (pure parsing, headless-safe). Returns
    * None when no reader accepts the bytes or the encoding is not
    * integer PCM. Features: [rms, zero-crossing rate, mean |sample|] —
    * the cheap speech/music/silence discriminators a corpus filter
    * runs before any model. Samples fold in frame order over channel 0
    * (deterministic); 16-bit little/big-endian and 8-bit PCM covered. */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val ok = (fmt.getEncoding == PCM_SIGNED || fmt.getEncoding == PCM_UNSIGNED) &&
          (fmt.getSampleSizeInBits == 16 || fmt.getSampleSizeInBits == 8)
        if (!ok) return None
        val frameBytes = fmt.getFrameSize
        val raw = in.readAllBytes()
        val nFrames = if (frameBytes > 0) raw.length / frameBytes else 0
        if (nFrames == 0) return None
        var sumSq = 0.0; var sumAbs = 0.0; var zc = 0L
        var prev = 0.0; var first = true
        var f = 0
        while (f < nFrames) {
          val off = f * frameBytes // channel 0 leads each frame
          val s: Double =
            if (fmt.getSampleSizeInBits == 16) {
              val (b0, b1) = (raw(off) & 0xff, raw(off + 1) & 0xff)
              val v = if (fmt.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
              // unsigned stores silence at the 0x8000 midpoint — decode
              // by center-shift, NOT two's complement, or a silent clip
              // reads as maximally loud
              if (fmt.getEncoding == PCM_UNSIGNED) (v - 0x8000) / 32768.0
              else (if (v >= 0x8000) v - 0x10000 else v) / 32768.0
            } else { // 8-bit: unsigned center-128 by convention
              val v = raw(off) & 0xff
              if (fmt.getEncoding == PCM_UNSIGNED) (v - 128) / 128.0
              else (if (v >= 0x80) v - 0x100 else v) / 128.0
            }
          sumSq += s * s; sumAbs += math.abs(s)
          if (!first && (s > 0) != (prev > 0)) zc += 1
          prev = s; first = false
          f += 1
        }
        val feat = Array(
          math.sqrt(sumSq / nFrames).toFloat,       // RMS level
          (zc.toDouble / nFrames).toFloat,          // zero-crossing rate
          (sumAbs / nFrames).toFloat)               // mean |amplitude|
        Some((fmt.getSampleRate.toInt, fmt.getChannels, nFrames, feat))
      } finally in.close()
    } catch { case _: Exception => None }

  /** STUB fallback: deterministic pseudo-features from the sha256 of the
    * bytes. This is NOT a decoder — it exists so the video modality (no
    * in-JDK codec) and undecodable image/audio bytes still flow through
    * the full distributed pipeline with a stable, testable schema.
    * Marked loudly so no one mistakes it for analysis. */
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

  /** Container magic-byte sniffs — the cheap gate before handing bytes
    * to a codec: at corpus scale most undecodable payloads (mislabeled
    * rows, truncated uploads) fail HERE in a few comparisons instead of
    * paying a full reader-probe + exception per row (measured: the
    * probe-everything path cost q_multimodal 2.1× at sf0.1). Contract:
    * a sniff FALSE POSITIVE falls back safely through the decoder's
    * try/catch; a format OUTSIDE the sniffed set takes the stub
    * fallback even if some exotic reader could have decoded it — the
    * list below covers every container the stock JDK readers accept
    * (PNG/JPEG/GIF/BMP/TIFF; WBMP is headerless and excluded by
    * design), and extending decode support means extending this list
    * in the same commit. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte) ||            // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||           // JPEG
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) || // GIF
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||             // BMP
      (b(0) == 'I'.toByte && b(1) == 'I'.toByte &&
        b(2) == 0x2A.toByte && b(3) == 0.toByte) ||             // TIFF LE
      (b(0) == 'M'.toByte && b(1) == 'M'.toByte &&
        b(2) == 0.toByte && b(3) == 0x2A.toByte))               // TIFF BE

  private def looksLikeAudio(b: Array[Byte]): Boolean =
    (b.length >= 12 &&
      b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
      b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
      b(10) == 'V'.toByte && b(11) == 'E'.toByte) ||            // RIFF/WAVE
    (b.length >= 12 &&
      b(0) == 'F'.toByte && b(1) == 'O'.toByte && b(2) == 'R'.toByte &&
      b(3) == 'M'.toByte && b(8) == 'A'.toByte && b(9) == 'I'.toByte &&
      b(10) == 'F'.toByte) ||                                   // FORM/AIFF|AIFC
    (b.length >= 4 &&
      b(0) == '.'.toByte && b(1) == 's'.toByte && b(2) == 'n'.toByte &&
      b(3) == 'd'.toByte)                                       // AU

  /** REAL video container metadata, parsed from the bytes themselves —
    * no codec needed (the JDK ships none), because dimensions, frame
    * count, duration and codec id live in the CONTAINER headers, which
    * are plain length-prefixed byte structures:
    *
    *  - RIFF/AVI: chunk walk to `LIST hdrl` → `avih` (µs-per-frame,
    *    total frames, width, height) and `LIST strl` → `strh` with
    *    fccType `vids` for the codec fourcc;
    *  - MP4 / ISO BMFF: box walk (`size`+`type`, 64-bit largesize
    *    honored) to `moov/mvhd` (timescale+duration → µs) and the
    *    `vide`-handler `trak` (tkhd 16.16 width/height, stbl/stsz
    *    sample count, stsd first-entry fourcc).
    *
    * So only the PIXEL features remain stubbed for video; the metadata
    * a curation pipeline filters on (resolution, duration, codec,
    * frame count) is real. Returns None for anything that does not
    * parse as one of the two containers — the caller falls back to the
    * loud stub, same as undecodable image/audio bytes. */
  def parseVideoContainer(bytes: Array[Byte]): Option[VideoMeta] =
    try {
      if (bytes.length >= 12 && fourccAt(bytes, 0) == "RIFF" &&
        fourccAt(bytes, 8) == "AVI ") parseAvi(bytes)
      else if (bytes.length >= 12 && fourccAt(bytes, 4) == "ftyp") parseMp4(bytes)
      else None
    } catch { case _: Exception => None } // truncated/corrupt header

  /** Container-level video metadata (no pixels decoded). */
  final case class VideoMeta(width: Int, height: Int, nFrames: Int,
                             durationUs: Long, fourcc: String)

  private def fourccAt(b: Array[Byte], off: Int): String =
    if (off + 4 > b.length) ""
    else new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64be(b: Array[Byte], off: Int): Long =
    (u32be(b, off) << 32) | u32be(b, off + 4)

  /** RIFF chunk walk: `[fourcc][size u32 LE][data]`, data padded to an
    * even boundary; `LIST` chunks carry a list-type fourcc then
    * sub-chunks. One linear pass collects avih + the `vids` strh. */
  private def parseAvi(b: Array[Byte]): Option[VideoMeta] = {
    var avih: Option[Int] = None          // payload offset
    var vidsFourcc: Option[String] = None
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourccAt(b, off)
        val size = u32le(b, off + 4).toInt
        val payload = off + 8
        if (size < 0 || payload + size > to) return // truncated: stop cleanly
        if (id == "LIST" && size >= 4) {
          // list type fourcc, then sub-chunks
          walk(payload + 4, payload + size)
        } else if (id == "avih") avih = Some(payload)
        else if (id == "strh" && size >= 8 && fourccAt(b, payload) == "vids")
          vidsFourcc = Some(fourccAt(b, payload + 4))
        off = payload + size + (size & 1) // even padding
      }
    }
    // the RIFF size field counts everything after offset 8, so the
    // container ends at 8 + size — clamp there so trailing junk
    // appended to a valid AVI can never be walked as chunks
    walk(12, math.min(b.length.toLong, 8L + u32le(b, 4)).toInt)
    avih.collect { case a if a + 40 <= b.length =>
      val usPerFrame = u32le(b, a)
      val nFrames = u32le(b, a + 16).toInt
      VideoMeta(
        width = u32le(b, a + 32).toInt, height = u32le(b, a + 36).toInt,
        nFrames = nFrames, durationUs = usPerFrame * nFrames,
        fourcc = vidsFourcc.getOrElse("????"))
    }
  }

  /** (offset, size) of every video frame chunk inside the AVI's `LIST
    * movi`: ids `##dc` (compressed) / `##db` (uncompressed) where `##`
    * is the two-digit stream number — the dc/db suffix is video by the
    * RIFF/AVI chunk-id convention (audio is `##wb`), so no strl
    * cross-reference is needed to separate the streams. Same clamped
    * walk as [[parseAvi]] (RIFF size bound, even padding, truncation
    * stops cleanly). */
  private def aviFrameChunks(b: Array[Byte]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    def isDigit(c: Char) = c >= '0' && c <= '9'
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val id = fourccAt(b, off)
        val size = u32le(b, off + 4).toInt
        val payload = off + 8
        if (size < 0 || payload + size > to) return
        if (id == "LIST" && size >= 4) walk(payload + 4, payload + size)
        else if (id.length == 4 && isDigit(id(0)) && isDigit(id(1)) &&
          id(2) == 'd' && (id(3) == 'c' || id(3) == 'b') && size > 0)
          out += ((payload, size))
        off = payload + size + (size & 1)
      }
    }
    walk(12, math.min(b.length.toLong, 8L + u32le(b, 4)).toInt)
    out.result()
  }

  /** REAL pixel features for MJPEG-in-AVI — the one video codec the
    * stock JDK can decode, because each `00dc` frame chunk is a plain
    * JPEG ([[decodeImage]]'s reader handles it; no new dependency).
    * Samples the FIRST, MIDDLE and LAST frames (the standard cheap
    * triage set: catches fade-ins, mid-content, end cards) and returns
    * the image-feature vector (3 channel means + GRID² luminance)
    * AVERAGED over the frames that decoded — deterministic, order-
    * fixed. None when no frame chunk decodes (not MJPEG after all,
    * corrupt frames, headerless payloads). */
  private def mjpegFrameFeatures(b: Array[Byte]): Option[Array[Float]] = {
    val chunks = aviFrameChunks(b)
    if (chunks.isEmpty) return None
    val picks = Vector(0, chunks.size / 2, chunks.size - 1).distinct
    val feats = picks.flatMap { i =>
      val (off, size) = chunks(i)
      decodeImage(java.util.Arrays.copyOfRange(b, off, off + size))
        .map(_._3)
    }
    meanFeatures(feats)
  }

  /** Element-wise mean of equal-length feature vectors (the
    * first/middle/last frame fold); None when none decoded. */
  private def meanFeatures(feats: Seq[Array[Float]]): Option[Array[Float]] =
    if (feats.isEmpty) None
    else {
      val acc = new Array[Float](feats.head.length)
      feats.foreach { f =>
        var i = 0; while (i < acc.length) { acc(i) += f(i); i += 1 }
      }
      var i = 0
      while (i < acc.length) { acc(i) /= feats.size; i += 1 }
      Some(acc)
    }

  /** The vids stream's `strf` BITMAPINFOHEADER: (biWidth, biHeight
    * SIGNED — positive = bottom-up rows, negative = top-down,
    * biBitCount, biCompression). By the RIFF strl contract the strf
    * immediately concerns the preceding strh, so the walk arms on a
    * `vids` strh and captures the next strf. */
  private def aviVidsBitmapInfo(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    var armed = false
    var out: Option[(Int, Int, Int, Long)] = None
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to && out.isEmpty) {
        val id = fourccAt(b, off)
        val size = u32le(b, off + 4).toInt
        val payload = off + 8
        if (size < 0 || payload + size > to) return
        if (id == "LIST" && size >= 4) walk(payload + 4, payload + size)
        else if (id == "strh" && size >= 8)
          armed = fourccAt(b, payload) == "vids"
        else if (id == "strf" && armed && size >= 20) {
          out = Some((u32le(b, payload + 4).toInt,
            u32le(b, payload + 8).toInt,
            ((b(payload + 14) & 0xff) | ((b(payload + 15) & 0xff) << 8)),
            u32le(b, payload + 16)))
          armed = false
        }
        off = payload + size + (size & 1)
      }
    }
    walk(12, math.min(b.length.toLong, 8L + u32le(b, 4)).toInt)
    out
  }

  /** REAL pixel features for UNCOMPRESSED (BI_RGB) AVI — the last
    * codec-free video format: each `00db` chunk is a raw device-
    * independent bitmap (BGR/BGRX rows, 4-byte-aligned, bottom-up
    * unless biHeight < 0), so feature extraction is pure byte
    * arithmetic with no decoder at all. Gated on the strf saying
    * biCompression == 0 (BI_RGB) at 24 or 32 bpp AND each sampled
    * chunk having exactly the computed frame size — a malformed or
    * mislabeled stream degrades to the container-only path, never a
    * throw. Same first/middle/last sampling and [[rasterFeatures]]
    * contract as MJPEG. */
  private def dibFrameFeatures(b: Array[Byte]): Option[Array[Float]] =
    aviVidsBitmapInfo(b) match {
      case Some((w, hSigned, bpp, comp))
          if comp == 0L && (bpp == 24 || bpp == 32) && w > 0 && hSigned != 0 =>
        val h = math.abs(hSigned)
        val bottomUp = hSigned > 0
        val bytesPP = bpp / 8
        val rowBytes = ((w * bytesPP + 3) / 4) * 4
        val frameBytes = rowBytes.toLong * h
        val chunks = aviFrameChunks(b).filter(_._2.toLong == frameBytes)
        if (chunks.isEmpty) None
        else {
          val picks = Vector(0, chunks.size / 2, chunks.size - 1).distinct
          meanFeatures(picks.map { i =>
            val off = chunks(i)._1
            rasterFeatures(w, h, (x, y) => {
              val row = if (bottomUp) h - 1 - y else y
              val p = off + row * rowBytes + x * bytesPP
              ((b(p + 2) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)
            })
          })
        }
      case _ => None
    }

  /** ISO BMFF box walk. Boxes are `[size u32 BE][type 4cc]`; size 1 →
    * 64-bit largesize follows; size 0 → box runs to the end. Containers
    * (moov/trak/mdia/minf/stbl) nest plain box sequences, so one
    * recursive walker covers the whole tree. */
  private def parseMp4(b: Array[Byte]): Option[VideoMeta] = {
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var durationUs = 0L
    // per-trak candidates; committed when the trak's handler is `vide`
    var w = 0; var h = 0; var frames = 0; var fcc = "????"
    var tW = 0; var tH = 0; var tFrames = 0; var tFcc = "????"; var tVide = false
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off + 8 <= to) {
        val size32 = u32be(b, off)
        val typ = fourccAt(b, off + 4)
        val (payload, end) =
          if (size32 == 1 && off + 16 <= to) (off + 16L, off + u64be(b, off + 8))
          else if (size32 == 0) (off + 8L, to.toLong)
          else (off + 8L, off + size32)
        if (end > to || end <= off) return // corrupt: stop cleanly
        val p = payload.toInt
        typ match {
          case t if containers(t) =>
            if (t == "trak") { tW = 0; tH = 0; tFrames = 0; tFcc = "????"; tVide = false }
            walk(p, end.toInt)
            if (t == "trak" && tVide) { w = tW; h = tH; frames = tFrames; fcc = tFcc }
          case "mvhd" if p < end =>
            val v = b(p) & 0xff
            val (ts, dur) =
              if (v == 1) (u32be(b, p + 20), u64be(b, p + 24))
              else (u32be(b, p + 12), u32be(b, p + 16))
            if (ts > 0) durationUs = dur * 1000000L / ts
          case "tkhd" if p < end =>
            val v = b(p) & 0xff
            val base = if (v == 1) p + 88 else p + 76 // 16.16 fixed width/height
            if (base + 8 <= end) {
              tW = (u32be(b, base) >> 16).toInt
              tH = (u32be(b, base + 4) >> 16).toInt
            }
          case "hdlr" if p + 12 <= end =>
            if (fourccAt(b, p + 8) == "vide") tVide = true
          case "stsz" if p + 12 <= end =>
            tFrames = u32be(b, p + 8).toInt // sample_count
          case "stsd" if p + 20 <= end =>
            tFcc = fourccAt(b, p + 12) // first sample entry's format
          case _ => ()
        }
        off = end.toInt
      }
    }
    walk(0, b.length)
    if (w > 0 && h > 0) Some(VideoMeta(w, h, frames, durationUs, fcc)) else None
  }

  /** Decode one asset: real ImageIO path for images, real sampled-audio
    * path for audio, real CONTAINER-HEADER parse for AVI/MP4 video
    * (metadata only — pixel features stay stubbed, the JDK ships no
    * codec), stub fallback otherwise (undecodable bytes fall through on
    * every modality — most at the magic-byte sniff, the rest in the
    * decoder's own try/catch). Audio maps (sampleRate, channels) into
    * the width/height metadata slots and its frame count into
    * n_frames. */
  def decode(mediaId: Long, modality: String, bytes: Array[Byte],
             videoDecoder: VideoFrameDecoder = JdkVideoDecoder): MediaFeatures = {
    def sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    modality match {
      case "image" if !looksLikeImage(bytes) => byteFeatures(mediaId, modality, bytes)
      case "audio" if !looksLikeAudio(bytes) => byteFeatures(mediaId, modality, bytes)
      case "image" => decodeImage(bytes) match {
        case Some((w, h, feat)) =>
          MediaFeatures(mediaId, modality, bytes.length.toLong, sha,
            w, h, n_frames = 1, decoded = true, feature = feat)
        case None => byteFeatures(mediaId, modality, bytes)
      }
      case "audio" => decodeAudio(bytes) match {
        case Some((rate, channels, nFrames, feat)) =>
          MediaFeatures(mediaId, modality, bytes.length.toLong, sha,
            width = rate, height = channels, n_frames = nFrames,
            decoded = true, feature = feat)
        case None => byteFeatures(mediaId, modality, bytes)
      }
      case "video" => parseVideoContainer(bytes) match {
        case Some(m) =>
          // every emitted value is parsed or arithmetic over parsed
          // values — duration (s), fps, mean bytes/frame: the triage
          // features a curation filter runs before any pixel work.
          // MJPEG-in-AVI and uncompressed (BI_RGB) AVI additionally
          // get REAL pixel features (plain-JPEG frame chunks the stock
          // reader decodes; raw-DIB chunks needing no decoder at all):
          // the 3 triage floats are followed by the image-grade
          // channel-mean + luminance-grid vector averaged over the
          // first/middle/last frames — feature.length distinguishes
          // the two shapes (3 = container-only, 3+19 = pixels real).
          val durS = m.durationUs / 1e6
          val triage = Array(durS.toFloat,
            (if (durS > 0) m.nFrames / durS else 0.0).toFloat,
            (bytes.length.toDouble / math.max(m.nFrames, 1)).toFloat)
          val pixels = videoDecoder.frameFeatures(m.fourcc, bytes)
          MediaFeatures(mediaId, modality, bytes.length.toLong, sha,
            width = m.width, height = m.height, n_frames = m.nFrames,
            decoded = true,
            feature = pixels.fold(triage)(triage ++ _))
        case None => byteFeatures(mediaId, modality, bytes)
      }
      case _ => byteFeatures(mediaId, modality, bytes)
    }
  }

  /** Partition-parallel feature extraction over a binary column. The
    * iterator-in/iterator-out shape is the batch contract (`mapInPandas`
    * analog): one decoder init per partition, streaming through rows
    * without materializing the partition. */
  def extractFeatures(media: DataFrame, idCol: String = "media_id",
                      modalityCol: String = "modality",
                      binCol: String = "content",
                      videoDecoder: VideoFrameDecoder = JdkVideoDecoder)
      : Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    val slim = media.select(col(idCol).cast("long"), col(modalityCol), col(binCol))
    slim.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts are
      // expensive; never per-row) — ImageIO reader instances are cheap
      // enough to create per call, but a native codec's context is not
      rows.map { r =>
        decode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2),
          videoDecoder)
      }
    }
  }

  /** One resized asset row: `resized` = a real decode+scale+re-encode
    * ran (content holds the new PNG bytes and width/height the new
    * dims); false = the bytes passed through untouched — either they
    * already fit `maxDim` (width/height real, from the decode) or they
    * were not a decodable image (width/height 0). */
  final case class ResizedMedia(
      media_id: Long,
      modality: String,
      content: Array[Byte],
      width: Int,
      height: Int,
      resized: Boolean)

  /** REAL in-JDK image resize: ImageIO decode → Graphics2D bilinear
    * scale to fit `maxDim` on the long side (aspect preserved) → PNG
    * re-encode. Pure raster work, headless-safe, deterministic for a
    * JDK. Returns the (bytes, w, h, resized) result, None when no
    * reader accepts the bytes. Images already within bounds pass
    * through byte-identical (no decode-reencode generation loss). */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int, Boolean)] =
    try {
      require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else if (w <= maxDim && h <= maxDim) Some((bytes, w, h, false))
        else {
          val scale = maxDim.toDouble / math.max(w, h)
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val out = new java.awt.image.BufferedImage(
            nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, nw, nh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some((bos.toByteArray, nw, nh, true))
        }
      }
    } catch { case _: Exception => None }

  /** Partition-parallel thumbnail pass over a binary column — the
    * resize stage of a multimodal ingest (decode/feature/resize/
    * frame-sample quartet). Image rows that sniff as a container go
    * through [[resizeImage]]; everything else (other modalities,
    * undecodable bytes) passes through untouched with `resized =
    * false` so the pipeline stays total. Same iterator-in/iterator-out
    * batch shape as [[extractFeatures]]; at corpus scale the output is
    * strictly smaller than the input (that is the point), so the
    * write side never amplifies. */
  def resizeImages(media: DataFrame, maxDim: Int,
                   idCol: String = "media_id",
                   modalityCol: String = "modality",
                   binCol: String = "content"): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    val slim = media.select(col(idCol).cast("long"), col(modalityCol), col(binCol))
    slim.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val mod = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val res =
          if (mod == "image" && looksLikeImage(bytes)) resizeImage(bytes, maxDim)
          else None
        res match {
          case Some((bs, w, h, rs)) => ResizedMedia(id, mod, bs, w, h, rs)
          case None => ResizedMedia(id, mod, bytes, 0, 0, resized = false)
        }
      }
    }
  }

  /** One resampled asset row ([[ResizedMedia]]'s audio counterpart):
    * `resampled` = a real decimation ran (`content` holds the new WAV
    * bytes, `sample_rate`/`n_frames` the new values); false =
    * passthrough (not decodable PCM audio, or factor 1). */
  final case class ResampledMedia(
      media_id: Long,
      modality: String,
      content: Array[Byte],
      sample_rate: Int,
      n_frames: Int,
      resampled: Boolean)

  /** REAL in-JDK audio downsample by integer DECIMATION: parse the PCM
    * container via javax.sound.sampled, keep every `factor`-th frame
    * (all channels; frame-aligned so channels never de-interleave),
    * re-encode WAV at rate/factor — the JDK writes the container, no
    * manual header. Deterministic, headless-safe. Returns None when
    * the bytes are not integer PCM the parser accepts. Plain
    * decimation aliases frequencies above the new Nyquist — the honest
    * cheap path for speech-corpus rate normalization where the band of
    * interest is well under it; a polyphase low-pass belongs to a real
    * DSP dependency, not hand-rolled here. */
  def decimateAudio(bytes: Array[Byte], factor: Int): Option[(Array[Byte], Int, Int)] =
    try {
      require(factor >= 1, s"factor must be >= 1, got $factor")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val ok = (fmt.getEncoding == PCM_SIGNED || fmt.getEncoding == PCM_UNSIGNED) &&
          fmt.getFrameSize > 0
        if (!ok) return None
        val raw = in.readAllBytes()
        val fb = fmt.getFrameSize
        val nFrames = raw.length / fb
        if (nFrames == 0) return None
        if (factor == 1)
          return Some((bytes, fmt.getSampleRate.toInt, nFrames)) // passthrough
        val kept = (nFrames + factor - 1) / factor
        val out = new Array[Byte](kept * fb)
        var i = 0
        while (i < kept) {
          System.arraycopy(raw, i * factor * fb, out, i * fb, fb)
          i += 1
        }
        val newFmt = new javax.sound.sampled.AudioFormat(
          fmt.getEncoding, fmt.getSampleRate / factor, fmt.getSampleSizeInBits,
          fmt.getChannels, fb, fmt.getFrameRate / factor, fmt.isBigEndian)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(out), newFmt, kept.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Some((bos.toByteArray, (fmt.getSampleRate / factor).toInt, kept))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Partition-parallel rate-normalization pass — [[resizeImages]]'s
    * audio twin: sniffed audio rows decimate, everything else passes
    * through untouched, keeping the pass total over mixed corpora. */
  def resampleAudio(media: DataFrame, factor: Int,
                    idCol: String = "media_id",
                    modalityCol: String = "modality",
                    binCol: String = "content"): Dataset[ResampledMedia] = {
    implicit val enc = Encoders.product[ResampledMedia]
    val slim = media.select(col(idCol).cast("long"), col(modalityCol), col(binCol))
    slim.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val mod = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val res =
          if (mod == "audio" && looksLikeAudio(bytes)) decimateAudio(bytes, factor)
          else None
        res match {
          case Some((bs, rate, n)) =>
            ResampledMedia(id, mod, bs, rate, n, resampled = factor > 1)
          case None => ResampledMedia(id, mod, bytes, 0, 0, resampled = false)
        }
      }
    }
  }

  /** One PCM sample (channel 0) decoded to [-1, 1) — the same
    * center-shift rules as [[decodeAudio]] (unsigned stores silence at
    * the encoding midpoint). */
  private def pcmAt(raw: Array[Byte], off: Int, bits: Int,
                    bigEndian: Boolean, unsigned: Boolean): Double =
    if (bits == 16) {
      val (b0, b1) = (raw(off) & 0xff, raw(off + 1) & 0xff)
      val v = if (bigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
      if (unsigned) (v - 0x8000) / 32768.0
      else (if (v >= 0x8000) v - 0x10000 else v) / 32768.0
    } else {
      val v = raw(off) & 0xff
      if (unsigned) (v - 128) / 128.0
      else (if (v >= 0x80) v - 0x100 else v) / 128.0
    }

  /** Iterative radix-2 Cooley–Tukey FFT, in place (re/im length must be
    * a power of two). ~30 lines beats shipping a DSP dependency the
    * container doesn't have; O(n log n), allocation-free. */
  private def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var s = 0
      while (s < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(s + k); val ui = im(s + k)
          val xr = re(s + k + half); val xi = im(s + k + half)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(s + k) = ur + vr; im(s + k) = ui + vi
          re(s + k + half) = ur - vr; im(s + k + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        s += len
      }
      len <<= 1
    }
  }

  /** REAL spectral features over the first `nFft` channel-0 samples:
    * Hann window → in-JDK FFT → power spectrum (DC excluded). Features,
    * all in Hz except the last: spectral centroid, 85% rolloff,
    * bandwidth (power-weighted std around the centroid), and spectral
    * flatness (geometric/arithmetic power mean ∈ (0,1]: ~1 noise-like,
    * →0 tonal) — the classic cheap timbre signature (speech/music
    * screens, bandwidth filters for upsampled junk audio). Deterministic:
    * fixed window, fixed length, no RNG.
    */
  def audioSpectral(bytes: Array[Byte], nFft: Int = 4096): Option[Array[Float]] = {
    require(nFft >= 64 && (nFft & (nFft - 1)) == 0, "nFft must be a power of two >= 64")
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        import javax.sound.sampled.AudioFormat.Encoding._
        val bits = fmt.getSampleSizeInBits
        val ok = (fmt.getEncoding == PCM_SIGNED || fmt.getEncoding == PCM_UNSIGNED) &&
          (bits == 16 || bits == 8)
        if (!ok) return None
        val frameBytes = fmt.getFrameSize
        if (frameBytes <= 0) return None
        val raw = in.readNBytes(frameBytes * nFft)
        val n0 = raw.length / frameBytes
        if (n0 < 64) return None
        val unsigned = fmt.getEncoding == PCM_UNSIGNED
        val re = new Array[Double](nFft)
        val im = new Array[Double](nFft) // zero-padded past n0
        var f = 0
        while (f < n0) {
          val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * f / (n0 - 1)))
          re(f) = pcmAt(raw, f * frameBytes, bits, fmt.isBigEndian, unsigned) * w
          f += 1
        }
        fftInPlace(re, im)
        val rate = fmt.getSampleRate.toDouble
        val half = nFft >> 1
        var pSum = 0.0; var fpSum = 0.0
        var logSum = 0.0
        val p = new Array[Double](half)
        var k = 1 // skip DC
        while (k < half) {
          val pk = re(k) * re(k) + im(k) * im(k)
          p(k) = pk
          pSum += pk; fpSum += pk * (k * rate / nFft)
          logSum += math.log(pk + 1e-20)
          k += 1
        }
        if (pSum <= 0.0) return None
        val centroid = fpSum / pSum
        var acc = 0.0; var kr = 1
        while (kr < half && acc < 0.85 * pSum) { acc += p(kr); kr += 1 }
        val rolloff = (kr - 1) * rate / nFft
        var varSum = 0.0
        k = 1
        while (k < half) {
          val d = k * rate / nFft - centroid
          varSum += p(k) * d * d
          k += 1
        }
        val bandwidth = math.sqrt(varSum / pSum)
        val flatness = math.exp(logSum / (half - 1)) / (pSum / (half - 1))
        Some(Array(centroid.toFloat, rolloff.toFloat,
          bandwidth.toFloat, flatness.toFloat))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Spectral row: Hz-valued features when `analyzed`; zeros otherwise
    * (non-audio or undecodable rows pass through so the stage is total
    * over mixed corpora — the resampleAudio convention). */
  final case class SpectralMedia(
      media_id: Long, modality: String, centroid_hz: Float,
      rolloff_hz: Float, bandwidth_hz: Float, flatness: Float,
      analyzed: Boolean)

  /** Distributed spectral analysis over a binary media table — map-only
    * (mapPartitions for the binary decode, the documented exception),
    * one row in → one row out, no shuffle: at 100 TB this is scan-bound
    * and embarrassingly parallel. */
  def spectralAudioFeatures(media: DataFrame, nFft: Int = 4096,
                            idCol: String = "media_id",
                            modalityCol: String = "modality",
                            binCol: String = "content"): Dataset[SpectralMedia] = {
    implicit val enc = Encoders.product[SpectralMedia]
    val slim = media.select(col(idCol).cast("long"), col(modalityCol), col(binCol))
    slim.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val mod = r.getString(1)
        val bytes = r.getAs[Array[Byte]](2)
        val res =
          if (mod == "audio" && looksLikeAudio(bytes)) audioSpectral(bytes, nFft)
          else None
        res match {
          case Some(a) => SpectralMedia(id, mod, a(0), a(1), a(2), a(3), analyzed = true)
          case None    => SpectralMedia(id, mod, 0f, 0f, 0f, 0f, analyzed = false)
        }
      }
    }
  }

  /** Deterministic frame sampling plan for video-like assets: every
    * `stride`-th frame index up to `maxFrames`. Pure column expression.
    * The sequence generates ONLY the sampled indices (stepped, capped)
    * — building the full 0..n_frames-1 array and filtering would
    * materialize a multi-hundred-MB array per row once n_frames is a
    * real decoded frame count (an hour at 44.1 kHz is 1.6e8 frames)
    * instead of the old stub's ≤ 64. */
  def frameSamplePlan(features: DataFrame, stride: Int, maxFrames: Int): DataFrame =
    features.select(col("media_id"), col("n_frames"),
      sequence(lit(0L),
        least(col("n_frames").cast("long") - 1,
          lit(stride.toLong * (maxFrames - 1))),
        lit(stride.toLong)).as("sampled_frames"))

  // ---------------------------------------------------------------------
  // Perceptual image hashing (dHash) and hash-banded image near-dup
  // ---------------------------------------------------------------------

  private val DH_COLS = 9 // dHash grid: 9 columns x 8 rows -> 8x8 = 64 bits
  private val DH_ROWS = 8

  /** 64-bit difference hash (dHash — the classic cheap perceptual image
    * signature; Krawetz's "kind of like that" construction): mean
    * luminance (ITU-R BT.601, the [[decodeImage]] weights) over a 9×8
    * grid, bit (r·8+c) set iff cell (r, c+1) is STRICTLY brighter than
    * cell (r, c). Horizontal gradients survive re-encoding, scaling and
    * brightness shifts, so equal/near hashes flag visually-duplicate
    * images across format variants — the image twin of a text SimHash.
    * Stride-sampled above ~512×512 like [[decodeImage]] (deterministic,
    * no RNG). None when ImageIO accepts no reader for the bytes. */
  def dhash64(bytes: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return None
        val stride = math.max(1, math.max(w, h) / 512)
        val lum = new Array[Double](DH_COLS * DH_ROWS)
        val cnt = new Array[Long](DH_COLS * DH_ROWS)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            // multiply-then-divide cell edges, the rasterFeatures contract
            val cell = (y.toLong * DH_ROWS / h).toInt * DH_COLS +
              (x.toLong * DH_COLS / w).toInt
            lum(cell) += 0.299 * r + 0.587 * g + 0.114 * b
            cnt(cell) += 1
            x += stride
          }
          y += stride
        }
        var hash = 0L
        var r = 0
        while (r < DH_ROWS) {
          var c = 0
          while (c < DH_COLS - 1) {
            val a = if (cnt(r * DH_COLS + c) == 0) 0.0
              else lum(r * DH_COLS + c) / cnt(r * DH_COLS + c)
            val b = if (cnt(r * DH_COLS + c + 1) == 0) 0.0
              else lum(r * DH_COLS + c + 1) / cnt(r * DH_COLS + c + 1)
            if (b > a) hash |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        Some(hash)
      }
    } catch { case _: Exception => None }

  /** Per-image dHash table: `(id, dhash)`, decodable images only — a
    * map-only pass (one decode per row, no shuffle), the signature step
    * every image-dedup pipeline runs first. */
  def imageDhash(media: DataFrame, idCol: String = "media_id",
                 binCol: String = "content"): DataFrame = {
    implicit val enc = Encoders.product[(Long, Long)]
    media.select(col(idCol).cast("long"), col(binCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          dhash64(r.getAs[Array[Byte]](1)).map(h => (r.getLong(0), h))
        }
      }.toDF(idCol, "dhash")
  }

  /** Visually-near-duplicate image pairs: dHash Hamming distance ≤
    * `maxHamming`, found by 4×16-bit BAND BUCKETING — two hashes within
    * Hamming 3 differ in ≤ 3 of the 4 bands, so by pigeonhole they
    * SHARE at least one band and meet in its bucket: the candidate
    * volume is Σ_bucket |bucket|² per band, never all-pairs (the
    * [[graft.ops.Dedup]] simhash banding, applied to pixels). Exact,
    * not approximate, for maxHamming ≤ 3 (enforced). Map-only hash →
    * one band-keyed exchange → popcount verify.
    *
    * @return (id_a, id_b, hamming), id_a < id_b, one row per pair
    */
  def imageNearDup(media: DataFrame, maxHamming: Int,
                   idCol: String = "media_id",
                   binCol: String = "content"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding is exact only for maxHamming <= 3, got $maxHamming")
    val sig = imageDhash(media, idCol, binCol)
      .select(col(idCol).as("id"), col("dhash"))
    val banded = sig.select(col("id"), col("dhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), 16 * b).bitwiseAND(lit(0xffffL))
          .as("bv"))): _*)).as("bb"))
      .select(col("id"), col("dhash"), col("bb.band"), col("bb.bv"))
    val a = banded.select(col("band"), col("bv"),
      col("id").as("id_a"), col("dhash").as("h_a"))
    val b = banded.select(col("band"), col("bv"),
      col("id").as("id_b"), col("dhash").as("h_b"))
    a.join(b, Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
      .distinct() // a pair may collide in several bands
      .withColumn("hamming",
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** The 4×16-bit band rows of a dHash column: (band, bv, id, dhash) —
    * shared by [[imageNearDup]] and [[dhashStoreAppend]] so the batch
    * and incremental paths bucket identically. */
  private def dhashBands(sig: DataFrame): DataFrame =
    sig.select(col("id"), col("dhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), 16 * b).bitwiseAND(lit(0xffffL))
          .as("bv"))): _*)).as("bb"))
      .select(col("id"), col("dhash"), col("bb.band"), col("bb.bv"))

  /** INCREMENTAL image near-dup — [[graft.ops.Dedup.simhashStoreAppend]]
    * for the dHash family: each batch hashes only ITS images, emits
    * exactly the NEW pairs (within-batch plus batch-vs-earlier-store at
    * the exact pigeonhole bound), and appends its `(id, dhash, tag)`
    * signature rows. The union of emissions over batches equals the
    * one-shot [[imageNearDup]] over everything ingested; each unordered
    * pair surfaces exactly once, in its LATER image's batch.
    *
    * Same two replay guards as the simhash store: the append no-ops on
    * the batch marker, and the cross probe reads only tags STRICTLY
    * BEFORE this batch's — a replayed batch recomputes the identical
    * emission even after later batches landed. Caller contract: tags
    * unique per batch, lexicographically ordered by arrival.
    *
    * Per-batch cost is batch×(batch + store-probe): the corpus side is
    * a 17-byte/image parquet read band-joined on the batch's own band
    * keys — the images themselves are NEVER re-decoded. The returned
    * emission is persisted (the count barrier materialized it); the
    * caller owns the unpersist. */
  def dhashStoreAppend(media: DataFrame, path: String, batchTag: String,
                       maxHamming: Int = 3, idCol: String = "media_id",
                       binCol: String = "content"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding is exact only for maxHamming <= 3, got $maxHamming")
    val spark = media.sparkSession
    val sigs = imageDhash(media, idCol, binCol)
      .select(col(idCol).as("id"), col("dhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = dhashBands(sigs)
    val within = bb.select(col("band"), col("bv"), col("id").as("id_a"),
        col("dhash").as("h_a"))
      .join(bb.select(col("band"), col("bv"), col("id").as("id_b"),
        col("dhash").as("h_b")).hint("shuffle_hash"), Seq("band", "bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("h_a"), col("h_b"))
    val crossOpt =
      if (!Stores.exists(spark, path, "_SUCCESS")) None
      else Some {
        val bs = dhashBands(spark.read.parquet(path)
          .filter(col("tag") < lit(batchTag)) // earlier batches only
          .select(col("id"), col("dhash")))
          .select(col("band"), col("bv"), col("id").as("sid"),
            col("dhash").as("ssh"))
        bb.select(col("band"), col("bv"), col("id").as("bid"),
            col("dhash").as("bsh"))
          .join(bs.hint("shuffle_hash"), Seq("band", "bv"))
          .select(least(col("bid"), col("sid")).as("id_a"),
            greatest(col("bid"), col("sid")).as("id_b"),
            col("bsh").as("h_a"), col("ssh").as("h_b"))
      }
    val pairs = (within +: crossOpt.toSeq).reduce(_ unionAll _)
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count() // force BEFORE the append: the emission reads the pre-batch store
    if (!Stores.exists(spark, path, "_SUCCESS"))
      sigs.select(col("id"), col("dhash"), lit(batchTag).as("tag"))
        .limit(0).write.mode("overwrite").parquet(path)
    Stores.appendCommit(spark, path, batchTag) { staging =>
      sigs.select(col("id"), col("dhash"), lit(batchTag).as("tag"))
        .write.mode("overwrite").parquet(staging)
    }
    sigs.unpersist()
    pairs
  }

  /** Minimal 24-bit BI_RGB BMP encoder (bottom-up rows, 4-byte row
    * padding — the format [[decodeImage]]'s stock ImageIO reader
    * round-trips losslessly): test scaffolding and synthetic-corpus
    * generation for the REAL decode path, with `rgbAt(x, y)` supplying
    * packed 0xRRGGBB pixels. */
  def encodeBmp(w: Int, h: Int, rgbAt: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "encodeBmp needs positive dimensions")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54)   // file size, reserved, data offset
    buf.putInt(40).putInt(w).putInt(h)               // BITMAPINFOHEADER, +h = bottom-up
    buf.putShort(1).putShort(24)                     // planes, bpp
    buf.putInt(0).putInt(dataSize)                   // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette
    var y = h - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < w) {
        val p = rgbAt(x, y)
        buf.put((p & 0xff).toByte)          // B
        buf.put(((p >> 8) & 0xff).toByte)   // G
        buf.put(((p >> 16) & 0xff).toByte)  // R
        x += 1
      }
      var i = 0
      while (i < pad) { buf.put(0.toByte); i += 1 }
      y -= 1
    }
    buf.array()
  }

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
