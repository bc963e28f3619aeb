package graft

import org.scalatest.funsuite.AnyFunSuite

/** The decode stage's REAL path: PNG/BMP/PPM header dimensions parsed
  * from actual file bytes (no codec libs), with the md5 stub only for
  * unknown magic — plus the corpus assumption the DuckDB mirror rests
  * on (no image-magic payloads in the text fixtures).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def be32(v: Int) =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def le32(v: Int) =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int) = Array(v.toByte, (v >>> 8).toByte)

  /** Minimal real PNG prefix: 8-byte signature + IHDR chunk. */
  private def png(w: Int, h: Int, colorType: Int): Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
      Array(8.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      be32(0) // CRC placeholder — the parser reads only through the header

  /** Minimal BMP: 14-byte file header + BITMAPINFOHEADER. */
  private def bmp(w: Int, h: Int, bpp: Int): Array[Byte] =
    "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(bpp) ++ le32(0)

  test("parseImageHeader: PNG IHDR dims + channel map from color type") {
    assert(ops.Multimodal.parseImageHeader(png(640, 360, 6)) ===
      Some((640, 360, 4, "png")))     // RGBA
    assert(ops.Multimodal.parseImageHeader(png(1, 1, 0)) ===
      Some((1, 1, 1, "png")))         // grayscale
    assert(ops.Multimodal.parseImageHeader(png(320, 200, 2)) ===
      Some((320, 200, 3, "png")))     // RGB
    assert(ops.Multimodal.parseImageHeader(png(16, 16, 3)) ===
      Some((16, 16, 1, "png")))       // palette
    // truncated (signature only) and bad color type → stub path
    assert(ops.Multimodal.parseImageHeader(png(640, 360, 6).take(20)).isEmpty)
    assert(ops.Multimodal.parseImageHeader(png(640, 360, 9)).isEmpty)
  }

  test("parseImageHeader: BMP dims (incl. top-down negative height) and bpp") {
    assert(ops.Multimodal.parseImageHeader(bmp(800, 600, 24)) ===
      Some((800, 600, 3, "bmp")))
    assert(ops.Multimodal.parseImageHeader(bmp(800, -600, 32)) ===
      Some((800, 600, 4, "bmp")))     // top-down rows, abs height
    assert(ops.Multimodal.parseImageHeader(bmp(64, 64, 8)) ===
      Some((64, 64, 1, "bmp")))
    // "BM" text with a bogus DIB size must NOT parse as an image
    assert(ops.Multimodal.parseImageHeader(
      "BMW dealers reported record sales this quarter in every region".getBytes).isEmpty)
  }

  /** Minimal GIF: signature + logical screen descriptor. */
  private def gif(w: Int, h: Int, v87: Boolean = false): Array[Byte] =
    (if (v87) "GIF87a" else "GIF89a").getBytes ++ le16(w) ++ le16(h) ++
      Array(0.toByte, 0.toByte, 0.toByte)

  /** Minimal JPEG prefix: SOI + APP0(JFIF) + SOF0 frame header. */
  private def jpeg(w: Int, h: Int, ncomp: Int): Array[Byte] = {
    val app0 = Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte) ++
      "JFIF".getBytes ++ Array.fill(10)(0.toByte)
    val sofLen = 8 + 3 * ncomp
    val sof = Array(0xFF, 0xC0, sofLen >> 8, sofLen & 0xFF, 8,
      h >> 8, h & 0xFF, w >> 8, w & 0xFF, ncomp).map(_.toByte) ++
      Array.fill(3 * ncomp)(0.toByte)
    Array(0xFF, 0xD8).map(_.toByte) ++ app0 ++ sof
  }

  test("parseImageHeader: GIF logical screen descriptor (87a + 89a)") {
    assert(ops.Multimodal.parseImageHeader(gif(1024, 768)) ===
      Some((1024, 768, 3, "gif")))
    assert(ops.Multimodal.parseImageHeader(gif(2, 2, v87 = true)) ===
      Some((2, 2, 3, "gif")))
    // text starting "GIF8..." without the version byte → stub path
    assert(ops.Multimodal.parseImageHeader("GIF8 is not a file".getBytes).isEmpty)
  }

  test("parseImageHeader: JPEG SOF marker walk (baseline + progressive + grayscale)") {
    assert(ops.Multimodal.parseImageHeader(jpeg(1920, 1080, 3)) ===
      Some((1920, 1080, 3, "jpeg")))
    assert(ops.Multimodal.parseImageHeader(jpeg(64, 48, 1)) ===
      Some((64, 48, 1, "jpeg")))
    // progressive: same walk, SOF2 instead of SOF0
    val prog = jpeg(300, 200, 3)
    prog(2 + 18 + 1) = 0xC2.toByte // flip the SOF marker byte
    assert(ops.Multimodal.parseImageHeader(prog) === Some((300, 200, 3, "jpeg")))
    // SOS before any SOF (corrupt stream) → stub path, no crash
    val sos = Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0, 0).map(_.toByte)
    assert(ops.Multimodal.parseImageHeader(sos).isEmpty)
    // truncated mid-segment → stub path, no crash
    assert(ops.Multimodal.parseImageHeader(jpeg(1920, 1080, 3).take(12)).isEmpty)
  }

  test("parseImageHeader: netpbm P6/P5 with comments; P3 ascii") {
    assert(ops.Multimodal.parseImageHeader("P6\n# tiny test\n123 45\n255\n".getBytes) ===
      Some((123, 45, 3, "ppm")))
    assert(ops.Multimodal.parseImageHeader("P5 7 9 255 ".getBytes) ===
      Some((7, 9, 1, "ppm")))
    assert(ops.Multimodal.parseImageHeader("P3\n2 2\n255\n".getBytes) ===
      Some((2, 2, 3, "ppm")))
    // "P3 " inside prose does not have digit tokens next → rejected
    assert(ops.Multimodal.parseImageHeader("P3 players won the match".getBytes).isEmpty)
  }

  test("decodeCore end-to-end: real bytes → real dims, unknown magic → labeled stub") {
    import spark.implicits._
    val payloads = Seq(
      1L -> png(640, 360, 6),
      2L -> bmp(800, 600, 24),
      3L -> "P6\n640 480\n255\n".getBytes,
      4L -> "just some text payload".getBytes)
    val rows = ops.Multimodal.decodeCore(payloads.toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows(1L).copy(content_md5 = "") ===
      ops.Multimodal.MediaMeta(1L, png(640, 360, 6).length.toLong, "", 640, 360, 4, "png"))
    assert((rows(2L).width, rows(2L).height, rows(2L).channels, rows(2L).decoder) ===
      ((800, 600, 3, "bmp")))
    assert((rows(3L).width, rows(3L).height, rows(3L).channels, rows(3L).decoder) ===
      ((640, 480, 3, "ppm")))
    val stub = rows(4L)
    assert(stub.decoder === "stub-md5")
    // stub dims stay inside their documented ranges (oracle mirror's domain)
    assert(stub.width >= 320 && stub.width <= 575)
    assert(stub.height >= 240 && stub.height <= 495)
    assert(stub.channels >= 1 && stub.channels <= 3)
  }

  test("fixture corpus has no image- or audio-magic payloads (the mirrors' constant-decoder premise)") {
    import spark.implicits._
    val d = SparkTestSession.sf0001
    val n = Tables.documents(spark, d)
      .select($"text".cast("binary").as("payload"))
      .as[Array[Byte]]
      .filter((p: Array[Byte]) => ops.Multimodal.parseImageHeader(p).nonEmpty ||
        ops.Multimodal.parseAudioHeader(p).nonEmpty ||
        ops.Multimodal.parseVideoHeader(p).nonEmpty)
      .count()
    assert(n === 0L, "a fixture document parses as media — a q_mm_* DuckDB mirror would diverge")
  }

  /** Full 24-bpp bottom-up BMP with real pixel data; `pix(x, y)` gives
    * (r, g, b) in DISPLAY coordinates (y = 0 is the top row).
    */
  private def bmpPixels(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    val header = "BM".getBytes ++ le32(out.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0)
    header.copyToArray(out)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val off = 54 + (h - 1 - y) * stride + x * 3 // bottom-up rows, BGR
      out(off) = b.toByte; out(off + 1) = g.toByte; out(off + 2) = r.toByte
    }
    out
  }

  /** Binary netpbm P6 of the same display-coordinate pixel function. */
  private def ppmPixels(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val head = s"P6\n$w $h\n255\n".getBytes
    val body = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val off = (y * w + x) * 3
      body(off) = r.toByte; body(off + 1) = g.toByte; body(off + 2) = b.toByte
    }
    head ++ body
  }

  private def hamming(a: String, b: String): Int =
    (java.lang.Long.parseUnsignedLong(a, 16) ^ java.lang.Long.parseUnsignedLong(b, 16))
      .toBinaryString.count(_ == '1')

  test("aHash: format-independent, noise-tolerant, and discriminating on planted images") {
    import spark.implicits._
    val gradient = (x: Int, y: Int) => (x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256)
    // the same scene with mild sensor noise (deterministic, ±6 levels)
    val noisy = (x: Int, y: Int) => {
      val (r, g, b) = gradient(x, y)
      val n = (x * 31 + y * 17) % 13 - 6
      (math.min(255, math.max(0, r + n)), math.min(255, math.max(0, g + n)),
        math.min(255, math.max(0, b + n)))
    }
    val inverted = (x: Int, y: Int) => {
      val (r, g, b) = gradient(x, y); (255 - r, 255 - g, 255 - b)
    }
    val hashes = ops.Multimodal.phashCore(Seq(
      1L -> bmpPixels(64, 48, gradient),
      2L -> ppmPixels(64, 48, gradient),   // same scene, other codec-free format
      3L -> bmpPixels(64, 48, noisy),      // near-duplicate
      4L -> bmpPixels(64, 48, inverted),   // opposite scene
      5L -> "prose, not pixels".getBytes). // stub path
      toDS()).collect().toMap
    // real decode fired (not the md5 stub): BMP and P6 of the SAME image
    // hash IDENTICALLY — pixel-space hashing sees through the container
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != "prose hash" && hashes(5L).length == 16)
    assert(hamming(hashes(1L), hashes(3L)) <= ops.Multimodal.PhashMaxHamming,
      s"noisy copy too far: ${hamming(hashes(1L), hashes(3L))} bits")
    assert(hamming(hashes(1L), hashes(4L)) > 20,
      s"inverted scene too close: ${hamming(hashes(1L), hashes(4L))} bits")
    // r14: PNG rasters now reach aHash through the inflate+unfilter
    // path — the SAME scene written by the JDK's own PNG encoder (real
    // adaptive filters, not the fixtures' filter-0) must hash
    // identically to its BMP twin: pixel-space identity across a THIRD
    // container and an encoder this repo did not write
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 48; x <- 0 until 64) {
      val (r, g, b) = gradient(x, y)
      img.setRGB(x, y, (0xFF << 24) | (r << 16) | (g << 8) | b)
    }
    val png = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", png))
    val pngHash = ops.Multimodal.phashCore(Seq(6L -> png.toByteArray).toDS())
      .collect().head._2
    assert(pngHash == hashes(1L),
      s"JDK-encoded PNG of the same scene hashed $pngHash != BMP ${hashes(1L)}")
  }

  test("dedupPhash end-to-end on planted images: near-dup pair accepted, distinct pair not") {
    import spark.implicits._
    val gradient = (x: Int, y: Int) => (x * 4 % 256, y * 4 % 256, (x + y) * 2 % 256)
    val noisy = (x: Int, y: Int) => {
      val (r, g, b) = gradient(x, y)
      val n = (x * 31 + y * 17) % 13 - 6
      (math.min(255, math.max(0, r + n)), math.min(255, math.max(0, g + n)),
        math.min(255, math.max(0, b + n)))
    }
    val blocks = (x: Int, y: Int) =>
      if ((x / 8 + y / 8) % 2 == 0) (255, 255, 255) else (0, 0, 0)
    val out = ops.Multimodal.dedupPhashCore(Seq(
      10L -> bmpPixels(64, 48, gradient),
      11L -> bmpPixels(64, 48, noisy),
      12L -> bmpPixels(64, 48, blocks)).toDS())
      .select($"doc_a", $"doc_b", $"is_dup").as[(Long, Long, Boolean)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // the planted near-identical pair is surfaced by banding AND accepted
    assert(out.get((10L, 11L)) === Some(true),
      s"planted near-dup pair missing or rejected: $out")
    // the unrelated image is never accepted against either
    assert(out.getOrElse((10L, 12L), false) == false)
    assert(out.getOrElse((11L, 12L), false) == false)
  }

  /** Minimal ISO-BMFF file: ftyp + moov(mvhd v0 + trak(tkhd v0)). */
  private def mp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(232) // big-endian by default
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(216).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes).putInt(0) // version 0 + flags
      .putInt(0).putInt(0).putInt(timescale).putInt(duration)
    bb.position(bb.position() + 80) // rate..next_track_id, zeros
    bb.putInt(100).put("trak".getBytes)
    bb.putInt(92).put("tkhd".getBytes).putInt(0)
    bb.position(bb.position() + 72) // ids/matrix, zeros; dims at +84
    bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
    bb.array()
  }

  /** Minimal RIFF-AVI file: LIST hdrl containing one avih chunk. */
  private def avi(uspf: Int, frames: Int, w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(88)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(80).put("AVI ".getBytes)
    bb.put("LIST".getBytes).putInt(68).put("hdrl".getBytes)
    bb.put("avih".getBytes).putInt(56)
    bb.putInt(uspf).putInt(0).putInt(0).putInt(0).putInt(frames).putInt(0)
      .putInt(0).putInt(0).putInt(w).putInt(h)
    bb.array()
  }

  test("parseVideoHeader: MP4 box walk and AVI LIST walk; prose and headerless files rejected") {
    // 5 s at timescale 1000, 720p track
    assert(ops.Multimodal.parseVideoHeader(mp4(1000, 5000, 1280, 720)) ===
      Some((1280, 720, 5000L, "mp4")))
    // 90kHz timescale (the MPEG clock): 450000 ticks = 5000 ms
    assert(ops.Multimodal.parseVideoHeader(mp4(90000, 450000, 640, 360)) ===
      Some((640, 360, 5000L, "mp4")))
    // 250 frames at 40000 µs/frame = 10000 ms
    assert(ops.Multimodal.parseVideoHeader(avi(40000, 250, 640, 480)) ===
      Some((640, 480, 10000L, "avi")))
    // ftyp alone (no moov/mvhd) is not decodable
    assert(ops.Multimodal.parseVideoHeader(
      mp4(1000, 5000, 1280, 720).take(16)).isEmpty)
    assert(ops.Multimodal.parseVideoHeader("RIFF through the text".getBytes).isEmpty)
    assert(ops.Multimodal.parseVideoHeader(Array[Byte]()).isEmpty)
  }

  test("videoCore end-to-end: real MP4/AVI bytes → real facts, unknown magic → labeled stub") {
    import spark.implicits._
    val payloads = Seq(
      1L -> mp4(1000, 5000, 1280, 720),
      2L -> avi(40000, 250, 640, 480),
      3L -> "just some text payload".getBytes)
    val rows = ops.Multimodal.videoCore(payloads.toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows(1L).copy(content_md5 = "") === ops.Multimodal.VideoMeta(
      1L, 232L, "", 1280, 720, 5000L, "mp4"))
    assert(rows(2L).copy(content_md5 = "") === ops.Multimodal.VideoMeta(
      2L, 88L, "", 640, 480, 10000L, "avi"))
    val stub = rows(3L)
    assert(stub.decoder === "stub-md5")
    assert(stub.width >= 320 && stub.width <= 575)
    assert(stub.height >= 240 && stub.height <= 495)
    assert(stub.duration_ms === 40L * ((stub.n_bytes + 99) / 100))
  }

  /** Canonical 44-byte WAV header + payload (PCM fmt chunk then data). */
  private def wav(ch: Int, rate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1.toShort)
      .putShort(ch.toShort).putInt(rate).putInt(rate * ch * bits / 8)
      .putShort((ch * bits / 8).toShort).putShort(bits.toShort)
    bb.put("data".getBytes).putInt(dataBytes)
    bb.array()
  }

  /** 24-byte big-endian Sun AU header + payload. */
  private def au(enc: Int, rate: Int, ch: Int, dataBytes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 + dataBytes)
    bb.put(".snd".getBytes).putInt(24).putInt(dataBytes).putInt(enc)
      .putInt(rate).putInt(ch)
    bb.array()
  }

  test("parseAudioHeader: WAV chunk walk and AU big-endian header; prose rejected") {
    // 16 data bytes, mono 16-bit @8kHz → 8 frames, 1 ms
    assert(ops.Multimodal.parseAudioHeader(wav(1, 8000, 16, 16)) ===
      Some((1, 8000, 16, 8L, "wav")))
    // stereo 8-bit: frames = bytes / 2
    assert(ops.Multimodal.parseAudioHeader(wav(2, 44100, 8, 10)) ===
      Some((2, 44100, 8, 5L, "wav")))
    // data chunk size clamped to bytes actually present (truncated file)
    assert(ops.Multimodal.parseAudioHeader(wav(1, 8000, 16, 16).dropRight(4)) ===
      Some((1, 8000, 16, 6L, "wav")))
    // AU: 16-bit PCM stereo → 4-byte frames
    assert(ops.Multimodal.parseAudioHeader(au(3, 8000, 2, 16)) ===
      Some((2, 8000, 16, 4L, "au")))
    // µ-law is 8-bit
    assert(ops.Multimodal.parseAudioHeader(au(1, 8000, 1, 5)) ===
      Some((1, 8000, 8, 5L, "au")))
    assert(ops.Multimodal.parseAudioHeader("RIFF through the text".getBytes).isEmpty)
    assert(ops.Multimodal.parseAudioHeader(".snd is not audio here".getBytes).isEmpty)
    assert(ops.Multimodal.parseAudioHeader(Array[Byte]()).isEmpty)
  }

  test("audioCore end-to-end: real WAV/AU bytes → real facts, unknown magic → labeled stub") {
    import spark.implicits._
    val payloads = Seq(
      1L -> wav(2, 48000, 16, 96000 * 4), // 2 s stereo 16-bit @48k
      2L -> au(1, 8000, 1, 4000),         // 0.5 s µ-law mono
      3L -> "just some text payload".getBytes)
    val rows = ops.Multimodal.audioCore(payloads.toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(rows(1L).copy(content_md5 = "") === ops.Multimodal.AudioMeta(
      1L, (44 + 96000 * 4).toLong, "", 2, 48000, 16, 96000L, 2000L, "wav"))
    assert(rows(2L).copy(content_md5 = "") === ops.Multimodal.AudioMeta(
      2L, 4024L, "", 1, 8000, 8, 4000L, 500L, "au"))
    val stub = rows(3L)
    assert(stub.decoder === "stub-md5")
    assert(stub.sample_rate_hz % 8000 === 0 &&
      stub.sample_rate_hz >= 8000 && stub.sample_rate_hz <= 48000)
    assert(stub.n_channels >= 1 && stub.n_channels <= 2)
    assert(stub.bits_per_sample === 8 || stub.bits_per_sample === 16)
    assert(stub.n_frames === stub.n_bytes)
    assert(stub.duration_ms === stub.n_frames * 1000L / stub.sample_rate_hz)
  }

  test("real-media fixture tier: every asset decodes through the REAL branch with generator params") {
    import spark.implicits._
    val d = SparkTestSession.sf0001
    // images: whole result equals the generator-parameter table, no stub rows
    val img = ops.Multimodal.decodeMedia(spark, d)
      .as[(Long, Long, Int, Int, Int, String)].collect().toSeq
    assert(img == ops.Multimodal.mediaImageExpected,
      s"image decode drifted from the catalog: $img")
    assert(img.forall(_._6 != "stub-md5"), "an image asset fell through to the stub")
    val aud = ops.Multimodal.audioMedia(spark, d)
      .as[(Long, Long, Int, Int, Int, Long, Long, String)].collect().toSeq
    assert(aud == ops.Multimodal.mediaAudioExpected,
      s"audio decode drifted from the catalog: $aud")
    assert(aud.forall(_._8 != "stub-md5"), "an audio asset fell through to the stub")
    val vid = ops.Multimodal.videoMedia(spark, d)
      .as[(Long, Long, Int, Int, Long, String)].collect().toSeq
    assert(vid == ops.Multimodal.mediaVideoExpected,
      s"video decode drifted from the catalog: $vid")
    assert(vid.forall(_._6 != "stub-md5"), "a video asset fell through to the stub")
    // r14: the pixel-math leg — every codec-free raster (BMP incl.
    // core-header, all four netpbm forms, 8-bit PNG) resizes through
    // the pure-JVM decode; r15: entropy-coded GIF/JPEG rasters resize
    // through the ImageIO branch (decoder '*-imageio'); only the
    // zero-image GIF and header-only JPEG containers stay no-raster
    val rsz = ops.Multimodal.resizeMedia(spark, d)
      .as[(Long, Int, Int, Int, Int, Long, Long, String)].collect().toSeq
    assert(rsz == ops.Multimodal.mediaResizeExpected,
      s"resize drifted from the catalog: $rsz")
    assert(rsz.count(_._6 >= 0) == 18, "a raster asset lost its pixel path")
    // 4 entropy-coded (GIF LZW x2, JPEG x2) + 3 PNG variants (r16)
    assert(rsz.count(_._8.endsWith("-imageio")) == 7,
      "a raster fell off the ImageIO branch")
  }

  test("real-media fixtures: same scene in BMP and P6 is pixel- and aHash-identical across containers") {
    val byId = sources.MediaFixtures.assets().map { case (id, _, b) => id -> b }.toMap
    // assets 1 (BMP) and 5 (P6) render the SAME deterministic scene —
    // the container changes, the decoded pixels must not
    val Some((w1, h1, g1)) = ops.Multimodal.grayPixels(byId(1L))
    val Some((w5, h5, g5)) = ops.Multimodal.grayPixels(byId(5L))
    assert((w1, h1) == (97, 55) && (w5, h5) == (97, 55))
    assert(g1.sameElements(g5), "cross-container pixel decode diverged")
    assert(ops.Multimodal.aHash64(w1, h1, g1) == ops.Multimodal.aHash64(w5, h5, g5))
    // and a different scene does NOT collide
    val Some((w2, h2, g2)) = ops.Multimodal.grayPixels(byId(2L))
    assert(ops.Multimodal.aHash64(w1, h1, g1) != ops.Multimodal.aHash64(w2, h2, g2))
  }

  test("grayPixels rejects crafted netpbm headers before allocating") {
    import java.nio.charset.StandardCharsets.US_ASCII
    def b(s: String) = s.getBytes(US_ASCII)
    // a ~20-byte header claiming a multi-GB raster must return None,
    // not attempt the allocation (OOME is not NonFatal)
    assert(ops.Multimodal.grayPixels(b("P5\n30000 30000\n255\n ")).isEmpty)
    assert(ops.Multimodal.grayPixels(b("P2\n30000 30000\n255\n0 0 0")).isEmpty)
    // 65536x65536 wraps w*h to 0 in Int — the Long guard must catch it
    assert(ops.Multimodal.grayPixels(b("P2\n65536 65536\n255\n0")).isEmpty)
    assert(ops.Multimodal.grayPixels(b("P3\n65536 65536\n255\n0 0 0")).isEmpty)
    // ascii samples above maxval are rejected, not wrapped into
    // out-of-range gray values
    assert(ops.Multimodal.grayPixels(b("P2\n2 1\n15\n3 99")).isEmpty)
    assert(ops.Multimodal.grayPixels(b("P3\n1 1\n15\n3 900 2")).isEmpty)
  }

  test("grayPixels ascii/binary luma parity at maxval < 255") {
    import java.nio.charset.StandardCharsets.US_ASCII
    // the same 2x1 RGB scene at maxval=15 through P3 (ascii) and P6
    // (binary) must decode to the same grays: weighted sum / 1000 first,
    // THEN the 255/maxv scale, in both branches
    val p3 = "P3\n2 1\n15\n15 0 7 3 14 1".getBytes(US_ASCII)
    val p6 = "P6\n2 1\n15\n".getBytes(US_ASCII) ++
      Array[Byte](15, 0, 7, 3, 14, 1)
    val Some((w3, h3, g3)) = ops.Multimodal.grayPixels(p3)
    val Some((w6, h6, g6)) = ops.Multimodal.grayPixels(p6)
    assert((w3, h3) == (2, 1) && (w6, h6) == (2, 1))
    assert(g3.sameElements(g6),
      s"P3 ${g3.toSeq} vs P6 ${g6.toSeq} diverged at maxval=15")
    // and the grays match the binary-order formula exactly
    val exp = Seq((15, 0, 7), (3, 14, 1)).map { case (r, g, b) =>
      (299 * r + 587 * g + 114 * b) / 1000 * 255 / 15
    }
    assert(g3.toSeq == exp)
  }
}
