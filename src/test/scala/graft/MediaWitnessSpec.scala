package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MediaFixtures
import graft.ops.Multimodal

/** Independent JDK decoder witness for the real-media fixture tier
  * (VERDICT r13 #1). The q_mm_*_media oracle rows hash-match the
  * GENERATOR's parameter catalog, and generator and parser were written
  * by the same hand — a shared misreading of a format field (BMP
  * biHeight sign, WAV block-align, AU encoding) would agree wrong on
  * both sides and still pass. These specs re-decode the exact fixture
  * bytes with decoders this repo did NOT write — `javax.imageio.ImageIO`
  * for BMP/PNG/GIF/JPEG and `javax.sound.sampled.AudioSystem` for
  * WAV/AU — and assert they recover the catalog's numbers, the same
  * independent-verification discipline as the reference's checksum
  * re-reads (Utils.java:28-58, ChunkTest.java:38-100). netpbm has no
  * JDK decoder; its pixel honesty is witnessed transitively instead:
  * ImageIO's pixels for a BMP/PNG asset must equal grayPixels' pixels
  * for the same-scene P6 asset, which crosses generator → ImageIO →
  * grayPixels through two independent containers.
  */
class MediaWitnessSpec extends AnyFunSuite {

  private lazy val payloads: Map[Long, Array[Byte]] =
    MediaFixtures.assets().map { case (id, _, p) => id -> p }.toMap

  private lazy val imageCatalog: Map[Long, (Long, Int, Int, Int, String)] =
    Multimodal.mediaImageExpected
      .map { case (id, nb, w, h, c, dec) => id -> ((nb, w, h, c, dec)) }.toMap

  /** BT.601 integer luma of a BufferedImage — the same formula the
    * generator and grayPixels use, applied to ImageIO's output.
    */
  private def imageIoGray(img: java.awt.image.BufferedImage): (Int, Int, Array[Int]) = {
    val w = img.getWidth; val h = img.getHeight
    val singleBand = img.getRaster.getNumBands == 1
    val g = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        g(y * w + x) =
          if (singleBand) {
            // getRGB on a gray image routes through a CS_GRAY→sRGB
            // ColorModel conversion (gamma), which is not the stored
            // sample — read the raster directly; >8-bit samples
            // downshift to the 8-bit luma contract (the production
            // imageIoGrayDecode rule, re-derived here)
            img.getRaster.getSample(x, y, 0) >>
              math.max(0, img.getColorModel.getComponentSize(0) - 8)
          } else {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val gg = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            (299 * r + 587 * gg + 114 * b) / 1000
          }
        x += 1
      }
      y += 1
    }
    (w, h, g)
  }

  test("ImageIO recovers the catalog dimensions for every BMP and PNG asset") {
    for (id <- Seq(1L, 2L, 3L, 4L, 9L, 10L, 11L)) {
      val (nb, w, h, _, dec) = imageCatalog(id)
      val p = payloads(id)
      assert(p.length.toLong == nb, s"asset $id ($dec): n_bytes catalog drift")
      val img = ImageIO.read(new ByteArrayInputStream(p))
      assert(img != null, s"asset $id ($dec): ImageIO could not decode the fixture bytes")
      assert(img.getWidth == w && img.getHeight == h,
        s"asset $id ($dec): ImageIO saw ${img.getWidth}x${img.getHeight}, catalog says ${w}x$h")
    }
  }

  test("ImageIO recovers the catalog dimensions for the GIF headers") {
    for (id <- Seq(12L, 13L)) {
      val (_, w, h, _, dec) = imageCatalog(id)
      val in = ImageIO.createImageInputStream(new ByteArrayInputStream(payloads(id)))
      val readers = ImageIO.getImageReaders(in)
      assert(readers.hasNext, s"asset $id ($dec): no ImageIO reader claimed the bytes")
      val r = readers.next()
      r.setInput(in)
      try {
        val (gotW, gotH) =
          if (dec == "gif") {
            // the GIF fixtures are container-metadata-only (no image
            // frames — the tier's contract decodes the logical screen
            // descriptor), so dims come from the STREAM metadata the
            // same way the catalog defines them
            val tree = r.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
              .item(0).asInstanceOf[org.w3c.dom.Element]
            (lsd.getAttribute("logicalScreenWidth").toInt,
              lsd.getAttribute("logicalScreenHeight").toInt)
          } else (r.getWidth(0), r.getHeight(0))
        assert((gotW, gotH) == (w, h),
          s"asset $id ($dec): ImageIO saw ${gotW}x$gotH, catalog says ${w}x$h")
      } finally r.dispose()
    }
  }

  test("our parser recovers dims/channels from JPEGs ENCODED by ImageIO (baseline, progressive, gray)") {
    // the JPEG fixtures are header-only (no SOS/scan — the tier's
    // contract is the SOF marker walk), which the JDK's native JPEG
    // reader refuses outright ("missing SOS marker"), so the witness
    // runs in the other direction: bytes produced by an encoder this
    // repo did not write must parse to the encoder's parameters. This
    // also drags the marker walk across segments no fixture emits
    // (JFIF APP0, quant/huffman tables, real entropy-coded data).
    import java.awt.image.BufferedImage
    import javax.imageio.ImageWriteParam
    def encode(w: Int, h: Int, imgType: Int, progressive: Boolean): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      val g2 = img.createGraphics()
      g2.setColor(java.awt.Color.ORANGE); g2.fillRect(0, 0, w, h)
      g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      val wr = ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = wr.getDefaultWriteParam
      if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      wr.setOutput(ImageIO.createImageOutputStream(out))
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose()
      out.toByteArray
    }
    val cases = Seq(
      (encode(200, 150, BufferedImage.TYPE_3BYTE_BGR, progressive = false), 200, 150, 3),
      (encode(32, 24, BufferedImage.TYPE_BYTE_GRAY, progressive = false), 32, 24, 1),
      (encode(64, 48, BufferedImage.TYPE_3BYTE_BGR, progressive = true), 64, 48, 3))
    for (((bytes, w, h, nc), i) <- cases.zipWithIndex) {
      val got = Multimodal.parseImageHeader(bytes)
      assert(got.contains((w, h, nc, "jpeg")),
        s"case $i: parser said $got for an ImageIO-encoded ${w}x$h/$nc JPEG")
    }
  }

  test("ImageIO pixels agree with grayPixels for the BMP assets (bottom-up AND top-down)") {
    for (id <- Seq(1L, 2L, 3L)) {
      val p = payloads(id)
      val (iw, ih, ig) = imageIoGray(ImageIO.read(new ByteArrayInputStream(p)))
      val (gw, gh, gg) = Multimodal.grayPixels(p)
        .getOrElse(fail(s"asset $id: grayPixels refused a 24-bpp BMP"))
      assert((iw, ih) == (gw, gh), s"asset $id: dimension disagreement")
      assert(ig.sameElements(gg),
        s"asset $id: ImageIO and grayPixels disagree on pixel values")
    }
  }

  test("ImageIO pixels agree with grayPixels DIRECTLY for PNG and core-header BMP") {
    // r14: grayPixels gained the real PNG path (IDAT inflate +
    // scanline unfilter) and BITMAPCOREHEADER — so the pixel witness
    // no longer needs the same-scene netpbm detour for these assets:
    // ImageIO decodes the EXACT fixture bytes and must see the same
    // luma raster our decoder reconstructs (PNG is lossless)
    for (id <- Seq(4L, 9L, 10L, 11L)) {
      val p = payloads(id)
      val (iw, ih, ig) = imageIoGray(ImageIO.read(new ByteArrayInputStream(p)))
      val (gw, gh, gg) = Multimodal.grayPixels(p)
        .getOrElse(fail(s"asset $id: grayPixels refused a PNG/core-BMP it now claims to decode"))
      assert((iw, ih) == (gw, gh), s"asset $id: dimension disagreement")
      assert(ig.sameElements(gg),
        s"asset $id: ImageIO and grayPixels disagree on pixel values")
    }
  }

  test("grayPixels reconstructs ImageIO-ENCODED PNGs (adaptive filters, real deflate) pixel-exactly") {
    // the fixture PNGs are filter-0 + stored-deflate; the JDK's PNG
    // writer picks per-row adaptive filters (Sub/Up/Average/Paeth) and
    // dynamic-Huffman deflate on natural gradients — bytes our
    // generator never produces, decoded by a writer this repo did not
    // write. grayPixels must reconstruct the exact raster for RGB,
    // gray, and alpha-carrying images.
    import java.awt.image.BufferedImage
    def gradient(w: Int, h: Int, tp: Int): BufferedImage = {
      val img = new BufferedImage(w, h, tp)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 255 / math.max(1, w - 1)) & 0xFF
        val g = (y * 255 / math.max(1, h - 1)) & 0xFF
        val b = ((x + y) * 7) & 0xFF
        img.setRGB(x, y, (0xFF << 24) | (r << 16) | (g << 8) | b)
      }
      img
    }
    val cases = Seq(
      (BufferedImage.TYPE_3BYTE_BGR, "rgb"),
      (BufferedImage.TYPE_BYTE_GRAY, "gray"),
      (BufferedImage.TYPE_4BYTE_ABGR, "rgba"))
    for ((tp, name) <- cases) {
      val img = gradient(61, 47, tp) // odd dims: no stride regularity to hide behind
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", out), "no ImageIO PNG writer")
      val bytes = out.toByteArray
      val (gw, gh, gg) = Multimodal.grayPixels(bytes)
        .getOrElse(fail(s"$name: grayPixels refused an ImageIO-written PNG"))
      val (iw, ih, ig) = imageIoGray(ImageIO.read(new ByteArrayInputStream(bytes)))
      assert((gw, gh) == (iw, ih), s"$name: dimension disagreement")
      assert(gg.sameElements(ig), s"$name: filter reconstruction diverged from ImageIO")
    }
  }

  /** The resize witness's own 16×16 nearest-neighbor resample —
    * deliberately written in collection style against the production
    * while-loop (Multimodal.resize16), same stated rule: src = d·S/16.
    */
  private def witnessResize16(w: Int, h: Int, g: Array[Int]): (Long, Long) = {
    val out = for (y <- 0 until 16; x <- 0 until 16) yield g((y * h / 16) * w + (x * w / 16))
    (out.map(_.toLong).sum,
      out.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum)
  }

  test("resize catalog checksums reproduce from ImageIO pixels for every raster asset") {
    // q_mm_resize_media's oracle VALUES are generator-derived literals;
    // this closes the circle the same way the dims catalogs do — the
    // independent decoder's pixels, pushed through an independently
    // written resample, must land on the same px_sum/px_wsum. netpbm
    // has no JDK decoder: those four route through same-scene BMP
    // witness bytes (identical scene ⇒ identical gray raster).
    val sceneWitness: Map[Long, Array[Byte]] = Map(
      5L -> MediaFixtures.bmp24(97, 55, seed = 1),
      6L -> MediaFixtures.bmp24(33, 21, seed = 6),
      7L -> MediaFixtures.bmp24(5, 4, seed = 7),
      8L -> MediaFixtures.bmp24(7, 3, seed = 8))
    for ((id, iw, ih, ow, oh, pxSum, pxWsum, dec) <- Multimodal.mediaResizeExpected) {
      assert((ow, oh) == (16, 16), s"asset $id: catalog out dims drifted")
      if (pxSum >= 0) {
        val bytes = sceneWitness.getOrElse(id, payloads(id))
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        assert(img != null, s"asset $id ($dec): ImageIO could not decode the witness bytes")
        val (w, h, g) = imageIoGray(img)
        assert((w, h) == (iw, ih), s"asset $id ($dec): witness dims ${w}x$h != catalog ${iw}x$ih")
        val (s1, s2) = witnessResize16(w, h, g)
        assert((s1, s2) == (pxSum, pxWsum),
          s"asset $id ($dec): ImageIO-derived checksums ($s1, $s2) != catalog ($pxSum, $pxWsum)")
      }
    }
  }

  test("ImageIO branch decodes the LZW GIF fixtures to the EXACT generator scene grays") {
    // the pixel anchor for the entropy-coded tier: GIF is lossless and
    // the fixture palette is identity-gray, so the production decode
    // (imageIoGrayDecode) must reproduce the pure-Scala scene raster
    // bit-for-bit — generator parameters, not decoder output, are the
    // ground truth here
    for ((id, w, h, seed) <- Seq((16L, 31, 19, 16), (17L, 12, 8, 17))) {
      val (gw, gh, g) = Multimodal.imageIoGrayDecode(payloads(id))
        .getOrElse(fail(s"asset $id: ImageIO branch refused the LZW GIF"))
      assert((gw, gh) == (w, h), s"asset $id: dims ${gw}x$gh != ${w}x$h")
      val expected = Array.tabulate(w * h)(k => MediaFixtures.sceneGray(seed)(k % w, k / w))
      assert(g.sameElements(expected),
        s"asset $id: LZW round-trip did not preserve the scene grays")
    }
  }

  test("ImageIO branch decodes the PNG variant fixtures (16-bit, paletted, Adam7) to EXACT scene grays") {
    // VERDICT r15 #3: the three PNG forms grayPixels declines must take
    // the ImageIO fallback and — all being lossless encodings of the
    // scene — land on the generator raster bit-for-bit: 16-bit stores
    // v·257 (downshift recovers v), the palette is identity gray,
    // Adam7 only reorders scanlines
    for ((id, w, h, seed) <- Seq((35L, 14, 9, 35), (36L, 21, 13, 36), (37L, 26, 17, 37))) {
      val p = payloads(id)
      assert(Multimodal.grayPixels(p).isEmpty,
        s"asset $id: grayPixels claims a variant it was built to decline")
      val (gw, gh, g) = Multimodal.imageIoGrayDecode(p)
        .getOrElse(fail(s"asset $id: ImageIO branch refused the PNG variant"))
      assert((gw, gh) == (w, h), s"asset $id: dims ${gw}x$gh != ${w}x$h")
      val expected = Array.tabulate(w * h)(k => MediaFixtures.sceneGray(seed)(k % w, k / w))
      assert(g.sameElements(expected),
        s"asset $id: PNG variant round-trip did not preserve the scene grays")
    }
    // interlace/depth/colorType bytes really are the variant forms
    // (guards against the generator silently emitting the plain form)
    assert(payloads(35L)(24) == 16, "asset 35 is not bit depth 16")
    assert(payloads(36L)(25) == 3, "asset 36 is not colorType 3 (paletted)")
    assert(payloads(37L)(28) == 1, "asset 37 is not Adam7-interlaced")
  }

  test("imageIoGrayDecode rejects a crafted huge-dimension header BEFORE allocating (ADVICE r15)") {
    // a valid interlaced PNG re-headered (CRC recomputed, so the reader
    // trusts it) to claim 60000x60000 (3.6G pixels) must bounce off the
    // header-only cap — reader.read on it would attempt the full-raster
    // allocation inside ImageIO, and OOM is not NonFatal
    val p = MediaFixtures.pngInterlaced(8, 6, seed = 1).clone()
    def be32(v: Long, at: Int): Unit = {
      p(at) = ((v >> 24) & 0xFF).toByte; p(at + 1) = ((v >> 16) & 0xFF).toByte
      p(at + 2) = ((v >> 8) & 0xFF).toByte; p(at + 3) = (v & 0xFF).toByte
    }
    be32(60000L, 16); be32(60000L, 20) // IHDR width, height
    val crc = new java.util.zip.CRC32()
    crc.update(p, 12, 17) // chunk type + 13 IHDR data bytes
    be32(crc.getValue, 29)
    assert(Multimodal.imageIoGrayDecode(p).isEmpty,
      "crafted 3.6-gigapixel header was not rejected")
  }

  test("ImageIO branch decodes the JPEG fixtures within tight luma tolerance of the scene") {
    // JPEG is lossy: the catalog rows are decoder-exact pins; THIS is
    // the semantic check — the decoded luma must track the generator's
    // smooth-gradient scene closely (measured mean |err| ≈ 0.78 on
    // both fixtures; bound at 4 to absorb codec/JDK drift)
    for ((id, w, h, seed) <- Seq((18L, 24, 16, 18), (19L, 17, 11, 19))) {
      val (gw, gh, g) = Multimodal.imageIoGrayDecode(payloads(id))
        .getOrElse(fail(s"asset $id: ImageIO branch refused the JPEG scan"))
      assert((gw, gh) == (w, h), s"asset $id: dims ${gw}x$gh != ${w}x$h")
      val px = MediaFixtures.smoothScene(w, h, seed) _
      var absErr = 0L; var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (r, gg, b) = px(x, y)
        val lum = (299 * r + 587 * gg + 114 * b) / 1000
        val e = math.abs(g(y * w + x) - lum)
        absErr += e; maxErr = math.max(maxErr, e)
      }
      val mean = absErr.toDouble / (w * h)
      assert(mean <= 4.0, s"asset $id: mean luma error $mean exceeds the lossy bound")
      assert(maxErr <= 32, s"asset $id: max luma error $maxErr — decode is not tracking the scene")
    }
    // and the zero-image/header-only containers stay honestly raster-free
    assert(Multimodal.imageIoGrayDecode(payloads(12L)).isEmpty, "zero-image GIF grew a raster")
    assert(Multimodal.imageIoGrayDecode(payloads(14L)).isEmpty, "header-only JPEG grew a raster")
  }

  test("grayPixels decodes the ascii netpbm assets to the same-scene binary rasters") {
    // P3/P2 (ascii) vs P6/P5 (binary) of the same scene must be the
    // same raster — the two encodings differ only in transport
    val pairs = Seq(
      (7L, MediaFixtures.netpbm("P6", 5, 4, seed = 7)),
      (8L, MediaFixtures.netpbm("P5", 7, 3, seed = 8)))
    for ((id, binaryTwin) <- pairs) {
      val a = Multimodal.grayPixels(payloads(id))
        .getOrElse(fail(s"asset $id: grayPixels refused an ascii netpbm raster"))
      val b = Multimodal.grayPixels(binaryTwin)
        .getOrElse(fail(s"asset $id: grayPixels refused the binary twin"))
      assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3),
        s"asset $id: ascii and binary netpbm rasters diverge")
    }
  }

  test("ImageIO pixels for PNG/core-BMP equal grayPixels for the same-scene netpbm") {
    // (payload under test, same-scene P6/P5 witness bytes)
    val pairs = Seq(
      (4L, MediaFixtures.netpbm("P6", 20, 10, seed = 4)),   // BITMAPCOREHEADER
      (9L, MediaFixtures.netpbm("P6", 48, 32, seed = 9)),   // PNG RGB
      (10L, MediaFixtures.netpbm("P6", 16, 16, seed = 10)), // PNG RGBA
      (11L, MediaFixtures.netpbm("P6", 8, 8, seed = 11)))   // PNG grayscale
    for ((id, witness) <- pairs) {
      val (iw, ih, ig) = imageIoGray(ImageIO.read(new ByteArrayInputStream(payloads(id))))
      val (gw, gh, gg) = Multimodal.grayPixels(witness)
        .getOrElse(fail(s"asset $id: grayPixels refused the P6 witness"))
      assert((iw, ih) == (gw, gh), s"asset $id: dimension disagreement with the P6 witness")
      assert(ig.sameElements(gg),
        s"asset $id: ImageIO pixels diverge from the same-scene netpbm raster")
    }
  }

  test("our parser recovers dims from PNG/BMP/GIF bytes ENCODED by ImageIO") {
    // reverse-direction witness for the remaining containers: ImageIO's
    // own encoders exercise header layouts the fixture generator never
    // emits (PNG ancillary chunks, GIF image descriptor + LZW frame,
    // writer-chosen BMP header size), and our parser must still land on
    // the true dimensions.
    import java.awt.image.BufferedImage
    def encode(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      val g2 = img.createGraphics()
      g2.setColor(java.awt.Color.BLUE); g2.fillRect(0, 0, w, h)
      g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"no ImageIO writer for $fmt")
      out.toByteArray
    }
    val cases = Seq(
      ("png", 48, 32, BufferedImage.TYPE_3BYTE_BGR, 3),
      ("png", 8, 8, BufferedImage.TYPE_BYTE_GRAY, 1),
      ("bmp", 97, 55, BufferedImage.TYPE_3BYTE_BGR, 3),
      ("gif", 120, 80, BufferedImage.TYPE_BYTE_INDEXED, 3))
    for ((fmt, w, h, tp, nc) <- cases) {
      val got = Multimodal.parseImageHeader(encode(fmt, w, h, tp))
      assert(got.exists(r => r._1 == w && r._2 == h && r._4 == fmt),
        s"$fmt: parser said $got for an ImageIO-encoded ${w}x$h image")
      if (fmt != "gif") // GIF channel count is a fixed RGB convention, palette depth varies
        assert(got.exists(_._3 == nc), s"$fmt: wrong channel count in $got")
    }
    // and the pixel path: grayPixels must decode an ImageIO-written
    // 24-bpp BMP to exactly the BufferedImage's luma
    val bmpBytes = encode("bmp", 21, 13, BufferedImage.TYPE_3BYTE_BGR)
    val (gw, gh, gg) = Multimodal.grayPixels(bmpBytes)
      .getOrElse(fail("grayPixels refused an ImageIO-written 24-bpp BMP"))
    val (iw, ih, ig) = imageIoGray(ImageIO.read(new ByteArrayInputStream(bmpBytes)))
    assert((gw, gh) == (iw, ih) && gg.sameElements(ig))
  }

  test("volume media corpus: every generated asset decodes through a REAL branch") {
    // the sf-proportional decode tier (StressProbe media_decode_volume)
    // is only evidence if no asset falls back to the md5 stub; pin that
    // on a small corpus here, one of each generator branch included
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 100L
    val assets = spark.range(0, n, 1, 4).as[Long]
      .mapPartitions(_.map(MediaFixtures.volumeAsset)).collect()
    assert(assets.length == n.toInt)
    val images = assets.filter(_._2 == "image").map(a => (a._1, a._3)).toSeq
    val audio = assets.filter(_._2 == "audio").map(a => (a._1, a._3)).toSeq
    val video = assets.filter(_._2 == "video").map(a => (a._1, a._3)).toSeq
    val decI = Multimodal.decodeCore(images.toDS()).collect()
    val decA = Multimodal.audioCore(audio.toDS()).collect()
    val decV = Multimodal.videoCore(video.toDS()).collect()
    assert(decI.length + decA.length + decV.length == n.toInt)
    val stubs = decI.map(_.decoder) ++ decA.map(_.decoder) ++ decV.map(_.decoder)
    assert(!stubs.exists(_.contains("stub")),
      s"volume asset hit the stub branch: ${stubs.distinct.mkString(",")}")
    // dims recovered, not defaulted: every image reports its id-derived size
    decI.foreach { m =>
      val w = 16 + (m.doc_id % 113).toInt; val h = 16 + (m.doc_id % 97).toInt
      assert(m.width == w && m.height == h,
        s"asset ${m.doc_id} (${m.decoder}): ${m.width}x${m.height} != ${w}x$h")
    }
  }

  test("AudioSystem recovers channels/rate/bits/frames for every WAV and AU asset") {
    val catalog = Multimodal.mediaAudioExpected
      .map { case (id, nb, ch, rate, bits, frames, _, dec) =>
        id -> ((nb, ch, rate, bits, frames, dec)) }.toMap
    for (id <- Seq(20L, 21L, 22L, 23L)) {
      val (nb, ch, rate, bits, frames, dec) = catalog(id)
      val p = payloads(id)
      assert(p.length.toLong == nb, s"asset $id ($dec): n_bytes catalog drift")
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(p))
      val f = aff.getFormat
      assert(f.getChannels == ch, s"asset $id ($dec): channels ${f.getChannels} != $ch")
      assert(f.getSampleRate.toInt == rate, s"asset $id ($dec): rate ${f.getSampleRate} != $rate")
      assert(f.getSampleSizeInBits == bits,
        s"asset $id ($dec): bits ${f.getSampleSizeInBits} != $bits")
      assert(aff.getFrameLength.toLong == frames,
        s"asset $id ($dec): frames ${aff.getFrameLength} != $frames")
    }
    // the µ-law AU really is µ-law, not linear PCM mislabeled
    val ulaw = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payloads(23L)))
    assert(ulaw.getFormat.getEncoding == AudioFormat.Encoding.ULAW)
  }
}
