package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** The REAL image-decode path: javax.imageio bytes → true dimensions,
  * channel means, luminance grid — plus the fallback contract for
  * undecodable bytes and codec-less modalities. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos); bos.toByteArray
  }
  private def jpeg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos); bos.toByteArray
  }
  /** left half solid `leftRgb`, right half solid `rightRgb` */
  private def halves(w: Int, h: Int, leftRgb: Int, rightRgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) leftRgb else rightRgb)
    img
  }

  test("decodeImage: true dimensions, channel means, luminance grid on a synthetic PNG") {
    // 64×48, left half pure red, right half pure blue
    val bytes = png(halves(64, 48, 0xff0000, 0x0000ff))
    val Some((w, h, feat)) = Multimodal.decodeImage(bytes)
    assert(w === 64 && h === 48)
    assert(feat.length === 3 + 16)
    val Array(mr, mg, mb) = feat.take(3)
    assert(math.abs(mr - 0.5) < 0.02, s"meanR $mr")   // red covers half
    assert(math.abs(mg - 0.0) < 0.01, s"meanG $mg")
    assert(math.abs(mb - 0.5) < 0.02, s"meanB $mb")
    // 4×4 luminance grid, row-major: columns 0-1 are the red half
    // (BT.601 luma 0.299), columns 2-3 the blue half (0.114)
    val grid = feat.drop(3)
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val expect = if (gx < 2) 0.299 else 0.114
      assert(math.abs(grid(gy * 4 + gx) - expect) < 0.01,
        s"cell ($gy,$gx) = ${grid(gy * 4 + gx)}, want $expect")
    }
  }

  test("decodeImage: JPEG decodes to true dimensions; garbage bytes return None") {
    val Some((w, h, _)) = Multimodal.decodeImage(jpeg(halves(30, 20, 0x808080, 0x808080)))
    assert(w === 30 && h === 20)
    assert(Multimodal.decodeImage("not an image at all".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("decodeImage: large image stride-samples deterministically") {
    // 1200×900 forces stride > 1; two decodes must be bit-identical and
    // the uniform color must survive sampling exactly
    val bytes = png(halves(1200, 900, 0x336699, 0x336699))
    val Some((w1, h1, f1)) = Multimodal.decodeImage(bytes)
    val Some((w2, h2, f2)) = Multimodal.decodeImage(bytes)
    assert(w1 === 1200 && h1 === 900)
    assert((w1, h1) === (w2, h2) && f1.toSeq === f2.toSeq, "deterministic")
    assert(math.abs(f1(0) - 0x33 / 255.0) < 0.01)
    assert(math.abs(f1(1) - 0x66 / 255.0) < 0.01)
    assert(math.abs(f1(2) - 0x99 / 255.0) < 0.01)
  }

  test("extractFeatures routes real images through the decoder, everything else through the stub") {
    val realPng = png(halves(40, 25, 0x00ff00, 0x00ff00))
    val media = Seq(
      (1L, "image", realPng),                          // real decode
      (2L, "image", "plain text".getBytes("UTF-8")),   // undecodable → stub
      (3L, "audio", realPng.clone)                     // codec-less modality → stub
    ).toDF("media_id", "modality", "content")
    val rows = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(rows(1L).decoded && rows(1L).width === 40 && rows(1L).height === 25
      && rows(1L).n_frames === 1 && rows(1L).feature.length === 19)
    assert(!rows(2L).decoded && rows(2L).feature.length === 8)
    // the stub's sha256-derived dimensions, pinned (the q_multimodal oracle
    // hardcodes this derivation)
    val dig = java.security.MessageDigest.getInstance("SHA-256")
      .digest("plain text".getBytes("UTF-8"))
    assert(rows(2L).width === 16 + (dig(0) & 0xff) * 4)
    assert(rows(2L).height === 16 + (dig(1) & 0xff) * 4)
    assert(!rows(3L).decoded, "PNG bytes are not decodable audio — fallback path")
    assert(rows(3L).n_bytes === realPng.length.toLong)
  }

  private def wav(rate: Float, bits: Int, seconds: Double,
                  sample: Int => Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = (rate * seconds).toInt
    val fmt = new AudioFormat(rate, bits, 1, true, false) // mono PCM LE
    val raw = new Array[Byte](n * (bits / 8))
    for (i <- 0 until n) {
      val v = sample(i)
      if (bits == 16) {
        val s = math.max(-32768, math.min(32767, math.rint(v * 32767))).toInt
        raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      } else raw(i) = math.max(-128, math.min(127, math.rint(v * 127))).toInt.toByte
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeAudio: sine WAV yields true rate/frames, RMS ~ a/sqrt(2), ZCR ~ 2f/rate") {
    val rate = 8000f; val freq = 440.0; val amp = 0.5
    val bytes = wav(rate, 16, 1.0,
      i => amp * math.sin(2 * math.Pi * freq * i / rate))
    val Some((r, ch, frames, feat)) = graft.ops.Multimodal.decodeAudio(bytes)
    assert(r === 8000 && ch === 1 && frames === 8000)
    val Array(rms, zcr, meanAbs) = feat
    assert(math.abs(rms - amp / math.sqrt(2)) < 0.01, s"rms $rms")
    assert(math.abs(zcr - 2 * freq / rate) < 0.005, s"zcr $zcr")
    assert(math.abs(meanAbs - amp * 2 / math.Pi) < 0.01, s"meanAbs $meanAbs")
    // silence: zero everything
    val Some((_, _, _, silent)) = graft.ops.Multimodal.decodeAudio(
      wav(rate, 16, 0.25, _ => 0.0))
    assert(silent(0) === 0f && silent(1) === 0f && silent(2) === 0f)
    // garbage is not audio
    assert(graft.ops.Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures: audio rows with real WAV bytes decode; rate/channels land in metadata") {
    val bytes = wav(16000f, 16, 0.5, i => 0.25 * math.sin(2 * math.Pi * 100 * i / 16000f))
    val media = Seq(
      (1L, "audio", bytes),
      (2L, "audio", "text payload".getBytes("UTF-8")), // fallback
      (3L, "video", bytes.clone)                        // codec-less → stub
    ).toDF("media_id", "modality", "content")
    val rows = Multimodal.extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(rows(1L).decoded && rows(1L).width === 16000 && rows(1L).height === 1
      && rows(1L).n_frames === 8000 && rows(1L).feature.length === 3)
    assert(!rows(2L).decoded && rows(2L).feature.length === 8)
    assert(!rows(3L).decoded, "video stays on the labeled stub")
  }

  test("decimateAudio: rate and frames divide by the factor; sine survives; round-trips the decoder") {
    val rate = 8000f; val freq = 440.0; val amp = 0.5
    val bytes = wav(rate, 16, 1.0,
      i => amp * math.sin(2 * math.Pi * freq * i / rate))
    val (out, newRate, frames) = graft.ops.Multimodal.decimateAudio(bytes, 2)
      .getOrElse(fail("WAV did not decimate"))
    assert(newRate === 4000 && frames === 4000)
    // the output is itself a decodable WAV with the expected signal:
    // same RMS (sine stays a sine under 2:1 decimation at 440 Hz),
    // doubled normalized frequency => doubled zero-crossing rate
    val Some((r2, _, f2, feat)) = graft.ops.Multimodal.decodeAudio(out)
    assert(r2 === 4000 && f2 === 4000)
    assert(math.abs(feat(0) - amp / math.sqrt(2)) < 0.02, s"rms ${feat(0)}")
    assert(math.abs(feat(1) - 2 * freq / 4000) < 0.01, s"zcr ${feat(1)}")
    // factor 1: byte-identical passthrough
    val (same, r1, f1) = graft.ops.Multimodal.decimateAudio(bytes, 1).get
    assert((same eq bytes) && r1 === 8000 && f1 === 8000)
    assert(graft.ops.Multimodal.decimateAudio("junk".getBytes, 2).isEmpty)
  }

  test("resampleAudio: audio rows decimate, other rows pass through untouched") {
    val bytes = wav(8000f, 16, 0.5, i => 0.4 * math.sin(2 * math.Pi * 200 * i / 8000))
    val rows = Seq(
      (1L, "audio", bytes),
      (2L, "image", Array[Byte](9, 9)),
      (3L, "audio", "not audio".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val out = graft.ops.Multimodal.resampleAudio(rows, factor = 2).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).resampled && out(1L).sample_rate === 4000 &&
      out(1L).n_frames === 2000)
    assert(!out(2L).resampled && out(2L).content.toSeq === Seq[Byte](9, 9))
    assert(!out(3L).resampled && out(3L).sample_rate === 0)
  }

  test("decoded image features feed the ANN index (binary → decode → top-k)") {
    // four distinguishable images: ANN over REAL decoded features must
    // rank the near-identical pair together
    val imgs = Seq(
      10L -> png(halves(32, 32, 0xff0000, 0x0000ff)),
      11L -> png(halves(32, 32, 0xfe0101, 0x0101fe)), // near-dup of 10
      12L -> png(halves(32, 32, 0x00ff00, 0x00ff00)),
      13L -> png(halves(32, 32, 0xffffff, 0x000000)))
    val media = imgs.toDF("media_id", "content").withColumn("modality", lit("image"))
    val feats = Multimodal.extractFeatures(media).toDF()
    assert(feats.filter(col("decoded")).count() === 4)
    val vecs = feats.select(col("media_id").as("vec_id"), col("feature").as("embedding"))
    val top1 = graft.ops.Ann.bruteTopK(vecs, vecs.filter(col("vec_id") === 10L), 2)
      .filter(col("rank") === 1) // bruteTopK already excludes the query itself
      .select("n_id").as[Long].head()
    assert(top1 === 11L, "nearest neighbor of 10 must be its near-dup 11")
  }
  // ---- synthetic video containers (real header layouts, no codec data)

  /** Minimal but structurally-true AVI: RIFF('AVI ') with LIST(hdrl)
    * holding avih (µs/frame, totalFrames, w, h) and LIST(strl)→strh
    * (fccType 'vids', handler fourcc). */
  private def aviBytes(w: Int, h: Int, nFrames: Int, usPerFrame: Int,
                       fourcc: String): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    val avih = { // 56-byte main header payload
      val a = new Array[Byte](56)
      def put(off: Int, v: Long): Unit =
        (0 until 4).foreach(i => a(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      put(0, usPerFrame); put(16, nFrames); put(32, w); put(36, h); a
    }
    val strh = { // fccType + handler + zero padding
      val a = new Array[Byte](56)
      "vids".getBytes("US-ASCII").copyToArray(a, 0)
      fourcc.getBytes("US-ASCII").copyToArray(a, 4); a
    }
    // sizes: hdrl list payload = 'hdrl' + avih chunk + strl list chunk
    val strlPayload = 4 + 8 + strh.length           // 'strl' + strh hdr+data
    val hdrlPayload = 4 + 8 + avih.length + 8 + strlPayload
    val riffPayload = 4 + 8 + hdrlPayload           // 'AVI ' + LIST hdr+data
    cc("RIFF"); u32(riffPayload); cc("AVI ")
    cc("LIST"); u32(hdrlPayload); cc("hdrl")
    cc("avih"); u32(avih.length); bb.write(avih)
    cc("LIST"); u32(strlPayload); cc("strl")
    cc("strh"); u32(strh.length); bb.write(strh)
    bb.toByteArray
  }

  /** Structurally-true MJPEG AVI built byte-by-byte: the [[aviBytes]]
    * header section (avih + vids strh, fourcc MJPG) followed by a
    * `LIST movi` whose `00dc` chunks hold REAL JPEG bytes, each padded
    * to the RIFF even boundary. The RIFF size covers both lists. */
  private def aviMjpegBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                            usPerFrame: Int): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    val avih = {
      val a = new Array[Byte](56)
      def put(off: Int, v: Long): Unit =
        (0 until 4).foreach(i => a(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      put(0, usPerFrame); put(16, frames.size); put(32, w); put(36, h); a
    }
    val strh = {
      val a = new Array[Byte](56)
      "vids".getBytes("US-ASCII").copyToArray(a, 0)
      "MJPG".getBytes("US-ASCII").copyToArray(a, 4); a
    }
    val strlPayload = 4 + 8 + strh.length
    val hdrlPayload = 4 + 8 + avih.length + 8 + strlPayload
    val moviPayload = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffPayload = 4 + 8 + hdrlPayload + 8 + moviPayload
    cc("RIFF"); u32(riffPayload); cc("AVI ")
    cc("LIST"); u32(hdrlPayload); cc("hdrl")
    cc("avih"); u32(avih.length); bb.write(avih)
    cc("LIST"); u32(strlPayload); cc("strl")
    cc("strh"); u32(strh.length); bb.write(strh)
    cc("LIST"); u32(moviPayload); cc("movi")
    frames.foreach { f =>
      cc("00dc"); u32(f.length); bb.write(f)
      if ((f.length & 1) == 1) bb.write(0) // even padding
    }
    bb.toByteArray
  }

  /** Structurally-true UNCOMPRESSED AVI: header section with a vids
    * strh (fourcc "DIB ") plus a strf BITMAPINFOHEADER declaring
    * BI_RGB at `bpp`, then a `LIST movi` of `00db` chunks holding the
    * given raw frame bytes (caller supplies 4-byte-aligned BGR rows,
    * bottom-up unless topDown). */
  private def aviDibBytes(frames: Seq[Array[Byte]], w: Int, h: Int,
                          usPerFrame: Int, bpp: Int,
                          topDown: Boolean = false): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bb.write(((v >> (8 * i)) & 0xff).toInt))
    val avih = {
      val a = new Array[Byte](56)
      def put(off: Int, v: Long): Unit =
        (0 until 4).foreach(i => a(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      put(0, usPerFrame); put(16, frames.size); put(32, w); put(36, h); a
    }
    val strh = {
      val a = new Array[Byte](56)
      "vids".getBytes("US-ASCII").copyToArray(a, 0)
      "DIB ".getBytes("US-ASCII").copyToArray(a, 4); a
    }
    val strf = { // 40-byte BITMAPINFOHEADER, biCompression = 0 (BI_RGB)
      val a = new Array[Byte](40)
      def put(off: Int, v: Long): Unit =
        (0 until 4).foreach(i => a(off + i) = ((v >> (8 * i)) & 0xff).toByte)
      put(0, 40); put(4, w); put(8, if (topDown) -h else h)
      a(12) = 1; a(14) = bpp.toByte; put(16, 0); a
    }
    val strlPayload = 4 + 8 + strh.length + 8 + strf.length
    val hdrlPayload = 4 + 8 + avih.length + 8 + strlPayload
    val moviPayload = 4 + frames.map(f => 8 + f.length + (f.length & 1)).sum
    val riffPayload = 4 + 8 + hdrlPayload + 8 + moviPayload
    cc("RIFF"); u32(riffPayload); cc("AVI ")
    cc("LIST"); u32(hdrlPayload); cc("hdrl")
    cc("avih"); u32(avih.length); bb.write(avih)
    cc("LIST"); u32(strlPayload); cc("strl")
    cc("strh"); u32(strh.length); bb.write(strh)
    cc("strf"); u32(strf.length); bb.write(strf)
    cc("LIST"); u32(moviPayload); cc("movi")
    frames.foreach { f =>
      cc("00db"); u32(f.length); bb.write(f)
      if ((f.length & 1) == 1) bb.write(0)
    }
    bb.toByteArray
  }

  /** One raw DIB frame: solid `rgb` except rows in [topFrom, topTo) of
    * IMAGE space painted `topRgb`; bottom-up storage unless topDown.
    * Rows are 4-byte aligned as the format requires. */
  private def dibFrame(w: Int, h: Int, bpp: Int, rgb: Int,
                       topRgb: Int = -1, topRows: Int = 0,
                       topDown: Boolean = false): Array[Byte] = {
    val bytesPP = bpp / 8
    val rowBytes = ((w * bytesPP + 3) / 4) * 4
    val a = new Array[Byte](rowBytes * h)
    for (imgY <- 0 until h; x <- 0 until w) {
      val c = if (imgY < topRows && topRgb >= 0) topRgb else rgb
      val storedRow = if (topDown) imgY else h - 1 - imgY
      val p = storedRow * rowBytes + x * bytesPP
      a(p) = (c & 0xff).toByte              // B
      a(p + 1) = ((c >> 8) & 0xff).toByte   // G
      a(p + 2) = ((c >> 16) & 0xff).toByte  // R
    }
    a
  }

  test("uncompressed DIB-in-AVI: raw 00db chunks decode to REAL pixel features") {
    // frame 1 solid red, frame 2 solid blue — averaged means near
    // (0.5, 0, 0.5) prove both frames' raw BGR bytes were read
    val avi = aviDibBytes(
      Seq(dibFrame(30, 20, 24, 0xff0000), dibFrame(30, 20, 24, 0x0000ff)),
      30, 20, 40000, bpp = 24)
    val f = Multimodal.decode(20L, "video", avi)
    assert(f.decoded && f.width === 30 && f.n_frames === 2)
    assert(f.feature.length === 3 + 3 + 16,
      s"pixel features expected, got length ${f.feature.length}")
    val Array(mr, mg, mb) = f.feature.slice(3, 6)
    assert(math.abs(mr - 0.5) < 0.02, s"meanR $mr")
    assert(math.abs(mg - 0.0) < 0.02, s"meanG $mg")
    assert(math.abs(mb - 0.5) < 0.02, s"meanB $mb")

    // 32 bpp (BGRX) works too; w=30 at 24bpp above also exercised the
    // 4-byte row padding (90 -> 92)
    val f32 = Multimodal.decode(21L, "video",
      aviDibBytes(Seq(dibFrame(16, 16, 32, 0x00ff00)), 16, 16, 40000, 32))
    assert(f32.decoded && f32.feature.length === 3 + 3 + 16)
    assert(math.abs(f32.feature(4) - 1.0) < 0.02, "green via BGRX")
  }

  test("uncompressed DIB-in-AVI: bottom-up vs top-down row order lands upright") {
    // image-space top quarter red over blue; luminance(red)=0.299 >
    // luminance(blue)=0.114, so the grid's FIRST row of cells must be
    // the bright one in BOTH storage orders — a flipped read would
    // swap them
    def gridOf(topDown: Boolean) = {
      val f = Multimodal.decode(22L, "video", aviDibBytes(
        Seq(dibFrame(16, 16, 24, 0x0000ff, topRgb = 0xff0000, topRows = 4,
          topDown = topDown)),
        16, 16, 40000, 24, topDown = topDown))
      assert(f.feature.length === 3 + 3 + 16)
      f.feature.drop(6)
    }
    Seq(false, true).foreach { td =>
      val g = gridOf(td)
      assert(math.abs(g(0) - 0.299) < 0.01,
        s"topDown=$td top cell ${g(0)} should be red luminance")
      assert(math.abs(g(15) - 0.114) < 0.01,
        s"topDown=$td bottom cell ${g(15)} should be blue luminance")
    }
  }

  test("uncompressed DIB-in-AVI: size-mismatched or non-BI_RGB streams degrade to container features") {
    // chunk size != rowBytes*h -> no pixel attempt
    val short = aviDibBytes(Seq(new Array[Byte](100)), 16, 16, 40000, 24)
    val f = Multimodal.decode(23L, "video", short)
    assert(f.decoded && f.feature.length === 3)
    // biCompression != 0 (patch strf) -> gate closed even with good sizes
    val good = aviDibBytes(Seq(dibFrame(16, 16, 24, 0xff0000)), 16, 16, 40000, 24)
    val idx = {
      // locate the strf payload: 'strf' fourcc then size then 40 bytes
      val s = good.indexOfSlice("strf".getBytes("US-ASCII"))
      s + 8
    }
    val patched = good.clone()
    patched(idx + 16) = 3 // BI_BITFIELDS
    val f2 = Multimodal.decode(24L, "video", patched)
    assert(f2.decoded && f2.feature.length === 3,
      "non-BI_RGB must not be read as raw BGR")
  }

  /** Minimal but structurally-true MP4: ftyp + moov(mvhd v0, trak(tkhd,
    * mdia(hdlr 'vide', minf(stbl(stsd avc1, stsz n))))). */
  private def mp4Bytes(w: Int, h: Int, nFrames: Int, timescale: Int,
                       duration: Int, fourcc: String): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", new Array[Byte](12) ++ u32(timescale) ++
      u32(duration) ++ new Array[Byte](80))
    val tkhd = box("tkhd", new Array[Byte](76) ++
      u32(w.toLong << 16) ++ u32(h.toLong << 16))
    val hdlr = box("hdlr", new Array[Byte](8) ++
      "vide".getBytes("US-ASCII") ++ new Array[Byte](12))
    val stsd = box("stsd", new Array[Byte](8) ++ u32(86) ++
      fourcc.getBytes("US-ASCII") ++ new Array[Byte](78))
    val stsz = box("stsz", new Array[Byte](4) ++ u32(0) ++ u32(nFrames))
    val stbl = box("stbl", stsd ++ stsz)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    ftyp ++ moov
  }

  test("resizeImage: downscale fits maxDim with aspect kept; small images pass through byte-identical") {
    val img = new BufferedImage(100, 60, BufferedImage.TYPE_INT_RGB)
    (0 until 100).foreach(x => (0 until 60).foreach(y =>
      img.setRGB(x, y, if (x < 50) 0xff0000 else 0x0000ff)))
    val bytes = png(img)
    val (out, w, h, resized) = Multimodal.resizeImage(bytes, 50)
      .getOrElse(fail("PNG did not resize"))
    assert(resized && w === 50 && h === 30, s"got ${w}x$h")
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back.getWidth === 50 && back.getHeight === 30)
    // content survives the scale: left half red-dominant, right blue-dominant
    val l = back.getRGB(10, 15); val r = back.getRGB(40, 15)
    assert(((l >> 16) & 0xff) > (l & 0xff), "left stays red-dominant")
    assert((r & 0xff) > ((r >> 16) & 0xff), "right stays blue-dominant")
    // within-bounds: byte-identical passthrough, no generation loss
    val (same, w2, h2, rs2) = Multimodal.resizeImage(bytes, 512).get
    assert(!rs2 && w2 === 100 && h2 === 60 && (same eq bytes))
    assert(Multimodal.resizeImage("junk".getBytes, 50).isEmpty)
  }

  test("resizeImages: image rows shrink, other rows pass through untouched") {
    val big = new BufferedImage(80, 40, BufferedImage.TYPE_INT_RGB)
    val rows = Seq(
      (1L, "image", png(big)),
      (2L, "audio", Array[Byte](1, 2, 3)),
      (3L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val out = Multimodal.resizeImages(rows, maxDim = 20).collect()
      .map(m => m.media_id -> m).toMap
    assert(out(1L).resized && out(1L).width === 20 && out(1L).height === 10)
    assert(!out(2L).resized && out(2L).content.toSeq === Seq[Byte](1, 2, 3))
    assert(!out(3L).resized && out(3L).width === 0,
      "undecodable image bytes pass through with zeroed dims")
  }

  test("parseVideoContainer: AVI header walk yields true w/h/frames/duration/fourcc") {
    val m = Multimodal.parseVideoContainer(
      aviBytes(w = 1280, h = 720, nFrames = 300, usPerFrame = 33333,
        fourcc = "mjpg")).getOrElse(fail("AVI did not parse"))
    assert(m.width === 1280 && m.height === 720 && m.nFrames === 300)
    assert(m.durationUs === 33333L * 300 && m.fourcc === "mjpg")
  }

  test("parseVideoContainer: MP4 picks the vide trak when an audio trak precedes it") {
    def u32(v: Long): Array[Byte] =
      Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload
    def trak(handler: String, w: Int, h: Int, n: Int, fourcc: String) = {
      val tkhd = box("tkhd", new Array[Byte](76) ++
        u32(w.toLong << 16) ++ u32(h.toLong << 16))
      val hdlr = box("hdlr", new Array[Byte](8) ++
        handler.getBytes("US-ASCII") ++ new Array[Byte](12))
      val stsd = box("stsd", new Array[Byte](8) ++ u32(86) ++
        fourcc.getBytes("US-ASCII") ++ new Array[Byte](78))
      val stsz = box("stsz", new Array[Byte](4) ++ u32(0) ++ u32(n))
      box("trak", tkhd ++ box("mdia", hdlr ++ box("minf", box("stbl", stsd ++ stsz))))
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(0) ++
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", new Array[Byte](12) ++ u32(600) ++ u32(1200) ++
      new Array[Byte](80))
    // audio trak FIRST (soun, 0x0 "dims", 900 samples), video second
    val moov = box("moov", mvhd ++
      trak("soun", 0, 0, 900, "mp4a") ++ trak("vide", 640, 360, 48, "avc1"))
    val m = Multimodal.parseVideoContainer(ftyp ++ moov)
      .getOrElse(fail("multi-trak MP4 did not parse"))
    assert(m.width === 640 && m.height === 360 && m.nFrames === 48,
      s"must take the vide trak's values, got $m")
    assert(m.fourcc === "avc1" && m.durationUs === 2000000L)
  }

  test("parseVideoContainer: MP4 box walk yields true w/h/frames/duration/fourcc") {
    val m = Multimodal.parseVideoContainer(
      mp4Bytes(w = 1920, h = 1080, nFrames = 240, timescale = 600,
        duration = 6000, fourcc = "avc1")).getOrElse(fail("MP4 did not parse"))
    assert(m.width === 1920 && m.height === 1080 && m.nFrames === 240)
    assert(m.durationUs === 10000000L && m.fourcc === "avc1")
  }

  test("parseVideoContainer: every truncation and byte-flip parses or returns None, never throws") {
    val avi = aviBytes(640, 480, 100, 40000, "mjpg")
    val mp4 = mp4Bytes(320, 240, 60, 30, 60, "avc1")
    val rnd = new scala.util.Random(7)
    Seq(avi, mp4).foreach { full =>
      (0 to full.length).foreach { n =>
        Multimodal.parseVideoContainer(full.take(n)) // must not throw
      }
      (0 until 200).foreach { _ =>
        val mut = full.clone()
        mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
        Multimodal.parseVideoContainer(mut) // must not throw
      }
    }
    (0 until 100).foreach { _ =>
      val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      assert(Multimodal.parseVideoContainer(junk).isEmpty ||
        junk.length >= 12) // tiny buffers can never parse
    }
  }

  test("video rows with real container bytes decode metadata; text bytes still stub") {
    val rows = Seq(
      (1L, "video", aviBytes(640, 480, 100, 40000, "mjpg")),
      (2L, "video", mp4Bytes(320, 240, 60, 30, 60, "avc1")),
      (3L, "video", "not a container at all".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val out = Multimodal.extractFeatures(rows).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).decoded && out(1L).width === 640 && out(1L).n_frames === 100)
    assert(out(2L).decoded && out(2L).width === 320 && out(2L).n_frames === 60)
    // fps feature: 60 frames over 2 s (timescale 30, duration 60)
    assert(math.abs(out(2L).feature(1) - 30f) < 1e-3)
    assert(!out(3L).decoded, "unparseable bytes must keep the loud stub path")
    // truncated container: must not throw, must stub
    val trunc = aviBytes(640, 480, 100, 40000, "mjpg").take(20)
    assert(Multimodal.parseVideoContainer(trunc).isEmpty)
  }

  test("MJPEG-in-AVI: movi frame chunks decode to REAL pixel features") {
    // frame 1 solid red, frame 2 solid blue — the averaged channel
    // means prove BOTH sampled frames were actually decoded (a single
    // frame, or the sha stub, could not land near (0.5, 0, 0.5))
    val solid = (rgb: Int) => {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      (0 until 32).foreach(y => (0 until 32).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val avi = aviMjpegBytes(
      Seq(jpeg(solid(0xff0000)), jpeg(solid(0x0000ff))), 32, 32, 40000)
    val f = Multimodal.decode(7L, "video", avi)
    assert(f.decoded && f.width === 32 && f.n_frames === 2)
    assert(f.feature.length === 3 + 3 + 16,
      s"triage + image features expected, got length ${f.feature.length}")
    val Array(mr, mg, mb) = f.feature.slice(3, 6)
    assert(math.abs(mr - 0.5) < 0.05, s"meanR $mr (avg of red+blue frames)")
    assert(math.abs(mg - 0.0) < 0.05, s"meanG $mg")
    assert(math.abs(mb - 0.5) < 0.05, s"meanB $mb")
    // luminance grid: flat frames → near-uniform cells
    val grid = f.feature.drop(6)
    assert(grid.length === 16 && (grid.max - grid.min) < 0.02)

    // odd-length frames exercise the RIFF even-padding walk
    val oddJpeg = jpeg(solid(0x00ff00))
    val oddFrames = Seq(oddJpeg ++ Array[Byte](), oddJpeg) // lengths as produced
    val f2 = Multimodal.decode(8L, "video",
      aviMjpegBytes(oddFrames, 32, 32, 40000))
    assert(f2.decoded && f2.feature.length === 3 + 3 + 16)
    assert(math.abs(f2.feature(4) - 1.0) < 0.05, "green frames decode")

    // MJPG fourcc but corrupt frame payloads: triage features only,
    // never a throw — the pixel path degrades to the container path
    val bad = aviMjpegBytes(Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5)),
      32, 32, 40000)
    val f3 = Multimodal.decode(9L, "video", bad)
    assert(f3.decoded && f3.feature.length === 3,
      "undecodable frames must keep the container-only feature shape")

    // non-MJPG codec with a movi list: no pixel attempt, length 3
    val xvid = aviBytes(640, 480, 100, 40000, "xvid")
    val f4 = Multimodal.decode(10L, "video", xvid)
    assert(f4.decoded && f4.feature.length === 3)
  }

  test("MJPEG-in-AVI: first/middle/last sampling picks distinct frames") {
    // 5 frames: red, red, green, blue, blue → sampled (0, 2, 4) =
    // red+green+blue → means ≈ (1/3, 1/3, 1/3); if sampling collapsed
    // to one frame the means would sit at a pure primary instead
    val solid = (rgb: Int) => {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x => img.setRGB(x, y, rgb)))
      img
    }
    val frames = Seq(0xff0000, 0xff0000, 0x00ff00, 0x0000ff, 0x0000ff)
      .map(c => jpeg(solid(c)))
    val f = Multimodal.decode(11L, "video", aviMjpegBytes(frames, 16, 16, 40000))
    assert(f.feature.length === 3 + 3 + 16)
    val Array(mr, mg, mb) = f.feature.slice(3, 6)
    Seq(mr, mg, mb).foreach(m =>
      assert(math.abs(m - 1.0 / 3) < 0.06, s"sampled means $mr $mg $mb"))
  }

  test("dhash64: gradients map to bits; constant image hashes to zero") {
    // strictly increasing left-to-right luminance: every comparison
    // fires -> all 64 bits set
    val ramp = Multimodal.encodeBmp(9, 8, (x, _) => {
      val v = x * 28; (v << 16) | (v << 8) | v
    })
    assert(Multimodal.dhash64(ramp) === Some(-1L), "64 one-bits == -1L")
    // constant image: no strict increase anywhere -> 0
    val flat = Multimodal.encodeBmp(9, 8, (_, _) => 0x808080)
    assert(Multimodal.dhash64(flat) === Some(0L))
    // right-to-left ramp: reversed gradients -> also 0 (strictness)
    val down = Multimodal.encodeBmp(9, 8, (x, _) => {
      val v = (8 - x) * 28; (v << 16) | (v << 8) | v
    })
    assert(Multimodal.dhash64(down) === Some(0L))
    assert(Multimodal.dhash64("not an image".getBytes) === None)
  }

  test("dhash64: invariant under re-encode and under 4x upscale") {
    // a deterministic per-pixel pattern, BMP vs PNG vs 4x nearest-ish
    // scale (each 9x8 cell becomes a uniform 4x4 block -> identical
    // cell means -> identical hash)
    def pix(x: Int, y: Int): Int = {
      val r = (x * 31 + y * 17) % 256
      val g = (x * 13 + y * 41) % 256
      val b = (x * 7 + y * 29) % 256
      (r << 16) | (g << 8) | b
    }
    val bmp = Multimodal.encodeBmp(9, 8, pix)
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) img.setRGB(x, y, pix(x, y))
    val asPng = png(img)
    val big = Multimodal.encodeBmp(36, 32, (x, y) => pix(x / 4, y / 4))
    val h = Multimodal.dhash64(bmp)
    assert(h.isDefined && h === Multimodal.dhash64(asPng),
      "same pixels, different container -> same hash")
    assert(h === Multimodal.dhash64(big),
      "4x upscale preserves cell means -> same hash")
  }

  test("imageNearDup: banding finds exactly the Hamming<=k pairs, never all-pairs semantics") {
    def pix(seed: Int)(x: Int, y: Int): Int = {
      val r = (seed * 37 + x * 11 + y * 7) % 256
      val g = (seed * 53 + x * 13 + y * 3) % 256
      val b = (seed * 29 + x * 5 + y * 17) % 256
      (r << 16) | (g << 8) | b
    }
    // 1,2: identical; 3: one-pixel tweak of 1 (<=2 bits); 4: unrelated
    val rows = Seq(
      1L -> Multimodal.encodeBmp(9, 8, pix(5)),
      2L -> Multimodal.encodeBmp(9, 8, pix(5)),
      3L -> Multimodal.encodeBmp(9, 8, (x, y) =>
        if (x == 4 && y == 4) pix(5)(x, y) ^ 0xe0e0e0 else pix(5)(x, y)),
      4L -> Multimodal.encodeBmp(9, 8, pix(23)),
      5L -> "junk, not an image".getBytes("UTF-8")
    ).toDF("media_id", "content")
    val sig = Multimodal.imageDhash(rows)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.keySet === Set(1L, 2L, 3L, 4L), "undecodable rows drop out")
    assert(sig(1L) === sig(2L))
    val got = Multimodal.imageNearDup(rows, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // oracle: brute-force over the collected signatures
    val ids = sig.keys.toSeq.sorted
    val want = (for {
      i <- ids; j <- ids if i < j
      hd = java.lang.Long.bitCount(sig(i) ^ sig(j)) if hd <= 3
    } yield (i, j, hd.toLong)).toSet
    assert(got === want, s"got $got want $want")
    assert(got.contains((1L, 2L, 0L)), "identical images pair at distance 0")
    val ex = intercept[IllegalArgumentException] {
      Multimodal.imageNearDup(rows, maxHamming = 4)
    }
    assert(ex.getMessage.contains("maxHamming"))
  }

  test("audioSpectral: pure sine centers the spectrum at its frequency") {
    val rate = 16000f
    val bytes = wav(rate, 16, 0.5, i => 0.5 * math.sin(2 * math.Pi * 440 * i / rate))
    val Some(a) = Multimodal.audioSpectral(bytes): @unchecked
    val (centroid, rolloff, bandwidth, flatness) = (a(0), a(1), a(2), a(3))
    assert(math.abs(centroid - 440f) < 25f, s"centroid $centroid !~ 440")
    assert(math.abs(rolloff - 440f) < 40f, s"rolloff $rolloff !~ 440")
    assert(bandwidth < 120f, s"tone bandwidth $bandwidth should be narrow")
    assert(flatness < 0.05f, s"tonal flatness $flatness should be ~0")
  }

  test("audioSpectral: two equal tones center between them; noise is flat and wide") {
    val rate = 16000f
    val two = wav(rate, 16, 0.5, i =>
      0.3 * math.sin(2 * math.Pi * 440 * i / rate)
        + 0.3 * math.sin(2 * math.Pi * 3000 * i / rate))
    val Some(t) = Multimodal.audioSpectral(two): @unchecked
    assert(math.abs(t(0) - (440f + 3000f) / 2) < 150f, s"two-tone centroid ${t(0)}")
    // deterministic LCG "white" noise: flat spectrum -> centroid ~ Nyquist/2,
    // flatness near 1, bandwidth wide
    var seed = 12345L
    val noise = wav(rate, 16, 0.5, _ => {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 20) & 0xffff).toDouble / 65536.0 - 0.5
    })
    val Some(w) = Multimodal.audioSpectral(noise): @unchecked
    assert(math.abs(w(0) - 4000f) < 600f, s"white centroid ${w(0)} !~ 4000")
    assert(w(3) > 0.5f, s"white flatness ${w(3)} should be ~1")
    assert(w(2) > t(2), "noise bandwidth exceeds the two-tone bandwidth")
  }

  test("spectralAudioFeatures: map-only stage is total over mixed corpora") {
    val rate = 16000f
    val tone = wav(rate, 16, 0.5, i => 0.5 * math.sin(2 * math.Pi * 1000 * i / rate))
    val rows = Seq(
      (1L, "audio", tone),
      (2L, "audio", "not really audio bytes".getBytes("UTF-8")),
      (3L, "image", tone) // wrong modality: passes through unanalyzed
    ).toDF("media_id", "modality", "content")
    val out = Multimodal.spectralAudioFeatures(rows)
      .collect().map(s => s.media_id -> s).toMap
    assert(out(1L).analyzed && math.abs(out(1L).centroid_hz - 1000f) < 40f)
    assert(!out(2L).analyzed && out(2L).centroid_hz === 0f)
    assert(!out(3L).analyzed)
    // no exchange in the plan: one map-partitions pass
    val plan = Multimodal.spectralAudioFeatures(rows)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"spectral stage must not shuffle:\n$plan")
  }

  test("VideoFrameDecoder seam: a plugged codec supplies pixel features for a fourcc the JDK cannot decode") {
    // a fake H.264 "decoder": returns a fixed 19-float vector for avc1,
    // None otherwise — stands in for a native codec behind the seam
    object FakeAvc extends Multimodal.VideoFrameDecoder {
      def frameFeatures(fourcc: String,
                        bytes: Array[Byte]): Option[Array[Float]] =
        if (fourcc.equalsIgnoreCase("avc1") || fourcc.equalsIgnoreCase("H264"))
          Some(Array.tabulate(19)(i => i.toFloat))
        else None
    }
    val rows = Seq(
      (1L, "video", aviBytes(640, 480, 100, 40000, "H264")),
      (2L, "video", aviBytes(640, 480, 100, 40000, "vp09")),
      (3L, "video", "not a container at all".getBytes("UTF-8")))
      .toDF("media_id", "modality", "content")
    val out = Multimodal.extractFeatures(rows, videoDecoder = FakeAvc)
      .collect().map(f => f.media_id -> f).toMap
    // plugged codec: container triage (3 floats) + the codec's 19
    assert(out(1L).decoded && out(1L).feature.length === 3 + 19)
    assert(out(1L).feature.drop(3).toSeq === (0 until 19).map(_.toFloat))
    // fourcc the plugged codec declines: container-only triage, same
    // as the default JdkVideoDecoder's fallback — never an error
    assert(out(2L).decoded && out(2L).feature.length === 3)
    assert(!out(3L).decoded, "unparseable bytes keep the loud stub path")
    // and the DEFAULT decoder on the same avc1 bytes: metadata decodes,
    // pixels stay container-only — the boundary the seam documents
    val dflt = Multimodal.extractFeatures(rows)
      .collect().map(f => f.media_id -> f).toMap
    assert(dflt(1L).decoded && dflt(1L).feature.length === 3)
  }
}
