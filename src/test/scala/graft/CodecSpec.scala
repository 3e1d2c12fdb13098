package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, PngCodec, WavCodec}
import graft.operators.Multimodal.PpmCodec

/** The compressed/audio codecs (round 10): PNG (zlib inflate, CRC
  * verification, all five filter reversals) and RIFF/WAVE PCM. Each is
  * round-tripped, fuzz-shaped, failure-injected — and PNG is
  * cross-validated against the JDK's own independent ImageIO
  * implementation in both directions. */
class CodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def testImage(w: Int, h: Int, seed: Int): PpmCodec.Image =
    PpmCodec.Image(w, h, 255,
      Array.tabulate(w * h * 3)(i => ((i * 131 + seed * 7919 + 17) % 256).toByte))

  test("PNG: encode/decode round-trip across shapes (all five filters exercised)") {
    // ≥5 rows cycles every filter type; 1×1 and width-1 hit the
    // no-left-neighbor edge of Sub/Average/Paeth
    for ((w, h) <- Seq((1, 1), (1, 7), (16, 12), (7, 5), (33, 9))) {
      val img = testImage(w, h, w * 100 + h)
      val back = PngCodec.decode(PngCodec.encode(img))
      assert(back.width === w && back.height === h)
      assert(back.pixels.toSeq === img.pixels.toSeq, s"raster mismatch at ${w}x$h")
    }
  }

  test("PNG: our decoder reads ImageIO-written files (truecolor and grayscale)") {
    import java.awt.image.BufferedImage
    val w = 19; val h = 11
    // truecolor (ImageIO writes color type 2)
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      rgb.setRGB(x, y, ((x * 31 + y) % 256 << 16) | ((y * 47 + x) % 256 << 8) | ((x * y + 3) % 256))
    val rgbBytes = {
      val bos = new java.io.ByteArrayOutputStream
      assert(javax.imageio.ImageIO.write(rgb, "png", bos), "no PNG writer in this JDK")
      bos.toByteArray
    }
    val dec = PngCodec.decode(rgbBytes)
    assert(dec.width === w && dec.height === h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = rgb.getRGB(x, y)
      val o = (y * w + x) * 3
      assert((dec.pixels(o) & 0xff) === ((argb >> 16) & 0xff), s"R at ($x,$y)")
      assert((dec.pixels(o + 1) & 0xff) === ((argb >> 8) & 0xff), s"G at ($x,$y)")
      assert((dec.pixels(o + 2) & 0xff) === (argb & 0xff), s"B at ($x,$y)")
    }
    // grayscale (color type 0) expands to RGB
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 13 + y * 29) % 256
      gray.getRaster.setSample(x, y, 0, g)
    }
    val gBos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(gray, "png", gBos)
    val gDec = PngCodec.decode(gBos.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray.getRaster.getSample(x, y, 0)
      val o = (y * w + x) * 3
      assert((gDec.pixels(o) & 0xff) === g && (gDec.pixels(o + 1) & 0xff) === g
        && (gDec.pixels(o + 2) & 0xff) === g, s"gray at ($x,$y)")
    }
  }

  test("PNG: ImageIO reads our encoder's files") {
    val img = testImage(23, 14, 5)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(PngCodec.encode(img)))
    assert(read != null, "ImageIO could not parse our PNG")
    assert(read.getWidth === 23 && read.getHeight === 14)
    for (y <- 0 until 14; x <- 0 until 23) {
      val argb = read.getRGB(x, y)
      val o = (y * 23 + x) * 3
      assert(((argb >> 16) & 0xff) === (img.pixels(o) & 0xff)
        && ((argb >> 8) & 0xff) === (img.pixels(o + 1) & 0xff)
        && (argb & 0xff) === (img.pixels(o + 2) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("PNG: malformed inputs fail loudly") {
    val good = PngCodec.encode(testImage(8, 6, 1))
    // bad signature
    intercept[IllegalArgumentException](PngCodec.decode("nope".getBytes))
    // corrupt one raster byte inside IDAT → CRC must catch it
    val corrupt = good.clone()
    val idatOff = {
      var i = 8; var at = -1
      while (at < 0) {
        val t = new String(corrupt, i + 4, 4, "US-ASCII")
        if (t == "IDAT") at = i else {
          val len = ((corrupt(i) & 0xff) << 24) | ((corrupt(i + 1) & 0xff) << 16) |
            ((corrupt(i + 2) & 0xff) << 8) | (corrupt(i + 3) & 0xff)
          i += 12 + len
        }
      }
      at
    }
    corrupt(idatOff + 10) = (corrupt(idatOff + 10) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](PngCodec.decode(corrupt))
    assert(e.getMessage.contains("CRC"), s"expected CRC failure, got: ${e.getMessage}")
    // truncated file
    intercept[IllegalArgumentException](PngCodec.decode(good.take(good.length - 9)))
    // unsupported color type (ImageIO writes RGBA as color type 6)
    val argbImg = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    argbImg.setRGB(1, 1, 0x80ff00ff)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(argbImg, "png", bos)
    val e2 = intercept[IllegalArgumentException](PngCodec.decode(bos.toByteArray))
    assert(e2.getMessage.contains("color type"))
  }

  test("x_png_decode equals x_image_decode row-for-row (compression cancels)") {
    val ppm = Multimodal.imageDecodeStats(spark, dir).collect().map(_.toSeq)
    val png = Multimodal.pngDecodeStats(spark, dir).collect().map(_.toSeq)
    assert(png.length === ppm.length && png.nonEmpty)
    png.zip(ppm).foreach { case (p, q) => assert(p === q) }
  }

  test("JPEG: constant-block images round-trip EXACTLY (the DC-only lossless case)") {
    import graft.operators.JpegCodec
    // 3×2 blocks of distinct constants, incl. the 0 and 255 extremes
    val vals = Array(0, 255, 128, 17, 200, 65)
    val g = Array.tabulate(24 * 16) { j =>
      val blockIdx = (j / 24 / 8) * 3 + (j % 24) / 8
      vals(blockIdx).toByte
    }
    val (w, h, back) = JpegCodec.decodeGray(JpegCodec.encodeGray(24, 16, g))
    assert(w === 24 && h === 16)
    assert(back.toSeq === g.toSeq,
      "DC-only blocks must round-trip the lossy pipeline losslessly")
  }

  test("JPEG: general content round-trips within quantization error; AC/ZRL/restart/edge paths run") {
    import graft.operators.JpegCodec
    // smooth gradient + texture: plenty of nonzero AC coefficients, runs
    // of zeros (ZRL), non-multiple-of-8 dims (edge replication), and a
    // restart interval (RSTn alignment + DC predictor reset)
    for ((w, h, rst) <- Seq((24, 16, 0), (21, 13, 0), (40, 24, 3), (8, 8, 1))) {
      val g = Array.tabulate(w * h) { j =>
        val x = j % w; val y = j / w
        ((x * 5 + y * 3 + ((x * y) % 7)) % 256).toByte
      }
      val enc = JpegCodec.encodeGray(w, h, g, restartEvery = rst)
      val (dw, dh, back) = JpegCodec.decodeGray(enc)
      assert(dw === w && dh === h)
      val maxErr = g.indices.map(i => math.abs((g(i) & 0xff) - (back(i) & 0xff))).max
      assert(maxErr <= 2,
        s"round-trip error $maxErr at ${w}x$h rst=$rst exceeds flat-quant tolerance")
    }
  }

  test("JPEG color: constant-block YCbCr planes round-trip EXACTLY at 4:2:0 and 4:4:4") {
    import graft.operators.JpegCodec
    // 32×16 frame: Y plane 4×2 blocks, chroma planes (4:2:0) 16×8 = 2×1
    // blocks — all constant, so every component is DC-only and the lossy
    // pipeline round-trips losslessly; replication upsampling is exact
    val w = 32; val h = 16
    val yv = Array(10, 255, 0, 130, 77, 200, 33, 99)
    val cbv = Array(40, 220); val crv = Array(180, 66)
    val yP = Array.tabulate(w * h) { j =>
      val bx = (j % w) / 8; val by = j / w / 8
      yv(by * 4 + bx).toByte
    }
    for ((sh, sv) <- Seq((2, 2), (1, 1))) {
      val cw = w / sh; val ch = h / sv
      val cbP = Array.tabulate(cw * ch) { j => cbv((j % cw) / 8 min 1).toByte }
      val crP = Array.tabulate(cw * ch) { j => crv((j % cw) / 8 min 1).toByte }
      // at 4:4:4 the chroma "blocks" repeat per 8 columns; derive the
      // expected per-pixel chroma from full-res position instead
      val enc = JpegCodec.encodeYcc(w, h, yP, cbP, crP, sh, sv)
      val (dw, dh, rgb) = JpegCodec.decodeColor(enc)
      assert(dw === w && dh === h)
      for (y <- 0 until h; x <- 0 until w) {
        val cb = cbP((y / sv) * cw + x / sh) & 0xff
        val cr = crP((y / sv) * cw + x / sh) & 0xff
        val (er, eg, eb) = JpegCodec.yccToRgb(yP(y * w + x) & 0xff, cb, cr)
        val j = (y * w + x) * 3
        assert((rgb(j) & 0xff) === er, s"R at ($x,$y) sh=$sh")
        assert((rgb(j + 1) & 0xff) === eg, s"G at ($x,$y) sh=$sh")
        assert((rgb(j + 2) & 0xff) === eb, s"B at ($x,$y) sh=$sh")
      }
    }
  }

  test("JPEG color: RGB round-trip within tolerance at 4:4:4/4:2:2/4:2:0; restarts; odd dims") {
    import graft.operators.JpegCodec
    for ((w, h, sh, sv, rst) <- Seq(
        (32, 16, 1, 1, 0), (21, 13, 1, 1, 0), (32, 16, 2, 1, 0),
        (32, 16, 2, 2, 0), (40, 24, 2, 2, 2), (17, 9, 2, 2, 0))) {
      // smooth content (chroma varies slowly, as photographic content
      // does) so subsampling loss stays small and measurable
      val rgb = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (y * w + x) * 3
        rgb(j) = ((x * 3 + y * 2) % 256).toByte
        rgb(j + 1) = ((x * 2 + y * 3 + 40) % 256).toByte
        rgb(j + 2) = ((x + y + 90) % 256).toByte
      }
      val enc = JpegCodec.encodeColor(w, h, rgb, sh, sv, restartEvery = rst)
      val (dw, dh, back) = JpegCodec.decodeColor(enc)
      assert(dw === w && dh === h)
      val errs = rgb.indices.map(i => math.abs((rgb(i) & 0xff) - (back(i) & 0xff)))
      val maxErr = errs.max
      val meanErr = errs.sum.toDouble / errs.size
      // 4:4:4: only DCT + two color-transform roundings (±3); subsampled
      // shapes also pay replication-upsampling loss on the chroma slope
      val bound = if (sh == 1 && sv == 1) 3 else 14
      assert(maxErr <= bound && meanErr <= 4.0,
        s"color round-trip max=$maxErr mean=$meanErr at ${w}x$h ${sh}x$sv rst=$rst")
    }
  }

  test("JPEG color: our decoder agrees with ImageIO on ImageIO-written color files") {
    import graft.operators.JpegCodec
    import java.awt.image.BufferedImage
    val w = 36; val h = 20
    // constant-chroma content (r=g=b): upsampling-filter differences
    // between libjpeg's fancy triangle filter and our replication vanish
    // on constant chroma, leaving only IDCT + color-convert rounding
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 11 + (x * y) % 5) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    val (dw, dh, ours) = JpegCodec.decodeColor(bytes)
    assert(dw === w && dh === h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null)
    val diffs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
      val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      math.abs((ours((y * w + x) * 3 + c) & 0xff) - t)
    }
    assert(diffs.max <= 4,
      s"color decoder disagreement ${diffs.max} exceeds IDCT+convert tolerance")
  }

  test("JPEG color: varying-chroma ImageIO files decode close (upsampling filters differ)") {
    import graft.operators.JpegCodec
    import java.awt.image.BufferedImage
    val w = 48; val h = 32
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5 % 256) << 16) | ((y * 7 % 256) << 8) | ((x + y) % 256))
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    val bos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    val (dw, dh, ours) = JpegCodec.decodeColor(bytes)
    assert(dw === w && dh === h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val diffs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
      val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      math.abs((ours((y * w + x) * 3 + c) & 0xff) - t)
    }
    val mean = diffs.sum.toDouble / diffs.size
    // replication vs libjpeg's triangle filter: bounded by the chroma
    // slope per subsampled pixel, not by content magnitude
    assert(mean <= 3.0 && diffs.max <= 40,
      s"varying-chroma disagreement mean=$mean max=${diffs.max}")
  }

  test("JPEG color: ImageIO reads our color encoder's files (encode direction)") {
    import graft.operators.JpegCodec
    val w = 32; val h = 16
    // constant-chroma again for a tight bound in THEIR decoder too
    val rgb = new Array[Byte](w * h * 3)
    for (j <- 0 until w * h) {
      val v = ((j * 29 + 7) % 256).toByte
      rgb(3 * j) = v; rgb(3 * j + 1) = v; rgb(3 * j + 2) = v
    }
    for ((sh, sv) <- Seq((1, 1), (2, 2))) {
      val enc = JpegCodec.encodeColor(w, h, rgb, sh, sv)
      val read = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      assert(read != null, s"ImageIO could not parse our ${sh}x$sv color JPEG")
      assert(read.getWidth === w && read.getHeight === h)
      val (_, _, ours) = JpegCodec.decodeColor(enc)
      val diffs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
        val t = (read.getRGB(x, y) >> (16 - 8 * c)) & 0xff
        math.abs((ours((y * w + x) * 3 + c) & 0xff) - t)
      }
      assert(diffs.max <= 4, s"ImageIO disagrees by ${diffs.max} at ${sh}x$sv")
    }
  }

  test("JPEG color: out-of-scope component layouts refused by name") {
    import graft.operators.JpegCodec
    val w = 16; val h = 16
    val rgb = Array.fill(w * h * 3)(100.toByte)
    val good = JpegCodec.encodeColor(w, h, rgb)
    // 4-component (CMYK-shaped) SOF refused
    val sofAt = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sofAt > 0)
    val cmyk = good.clone(); cmyk(sofAt + 9) = 4
    val e1 = intercept[IllegalArgumentException](JpegCodec.decodeColor(cmyk))
    assert(e1.getMessage.contains("4-component"), e1.getMessage)
    // chroma sampling 2x2 (super-sampled chroma) refused
    val weird = good.clone(); weird(sofAt + 14) = 0x22 // Cb h,v = 2,2
    val e2 = intercept[IllegalArgumentException](JpegCodec.decodeColor(weird))
    assert(e2.getMessage.contains("chroma sampling"), e2.getMessage)
    // the grayscale entry point refuses color by name
    val e3 = intercept[IllegalArgumentException](JpegCodec.decodeGray(good))
    assert(e3.getMessage.contains("component"), e3.getMessage)
  }

  test("JPEG: our decoder agrees with ImageIO on ImageIO-written grayscale files") {
    import graft.operators.JpegCodec
    import java.awt.image.BufferedImage
    val w = 29; val h = 18
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, (x * 11 + y * 23 + (x * y) % 13) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(gray, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // two independent decoders on the SAME bytes: identical coefficients,
    // so any difference is IDCT implementation rounding (ISO 10918
    // permits small variation; libjpeg's integer IDCT vs our double one)
    val (dw, dh, ours) = JpegCodec.decodeGray(bytes)
    assert(dw === w && dh === h)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null, "ImageIO could not parse its own JPEG")
    val maxDiff = (for (y <- 0 until h; x <- 0 until w) yield
      math.abs((ours(y * w + x) & 0xff) - theirs.getRaster.getSample(x, y, 0))).max
    assert(maxDiff <= 2, s"decoder disagreement $maxDiff exceeds IDCT tolerance")
  }

  test("JPEG: ImageIO reads our encoder's files (cross-validation, encode direction)") {
    import graft.operators.JpegCodec
    val w = 24; val h = 16
    val g = Array.tabulate(w * h)(j => ((j * 37 + 11) % 256).toByte)
    val enc = JpegCodec.encodeGray(w, h, g)
    val read = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(read != null, "ImageIO could not parse our JPEG")
    assert(read.getWidth === w && read.getHeight === h)
    val (_, _, ours) = JpegCodec.decodeGray(enc)
    val maxDiff = (for (y <- 0 until h; x <- 0 until w) yield
      math.abs((ours(y * w + x) & 0xff) - read.getRaster.getSample(x, y, 0))).max
    assert(maxDiff <= 2, s"ImageIO disagrees with our decode by $maxDiff")
  }

  test("JPEG: malformed and out-of-scope inputs fail loudly") {
    import graft.operators.JpegCodec
    import java.awt.image.BufferedImage
    // not a JPEG
    intercept[IllegalArgumentException](JpegCodec.decodeGray("nope".getBytes))
    // truncated entropy stream
    val good = JpegCodec.encodeGray(24, 16,
      Array.tabulate(24 * 16)(j => (j % 251).toByte))
    intercept[IllegalArgumentException](
      JpegCodec.decodeGray(good.take(good.length - 20)))
    // color (3-component) refused by name — chroma is out of scope
    val rgbImg = new BufferedImage(16, 16, BufferedImage.TYPE_3BYTE_BGR)
    val bos2 = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(rgbImg, "jpg", bos2)
    val e2 = intercept[IllegalArgumentException](
      JpegCodec.decodeGray(bos2.toByteArray))
    assert(e2.getMessage.contains("component"), e2.getMessage)
    // per-table bounds inside a DECLARED segment length: a short DQT/DHT
    // len must fail loudly, not read following marker bytes as table data
    val dqtAt = good.indexOfSlice(Seq(0xff.toByte, 0xdb.toByte))
    assert(dqtAt > 0)
    val shortDqt = good.clone()
    shortDqt(dqtAt + 2) = 0; shortDqt(dqtAt + 3) = 0x10
    val e3 = intercept[IllegalArgumentException](
      JpegCodec.decodeGray(shortDqt))
    assert(e3.getMessage.contains("truncated DQT"), e3.getMessage)
    val dhtAt = good.indexOfSlice(Seq(0xff.toByte, 0xc4.toByte))
    assert(dhtAt > 0)
    val shortDht = good.clone()
    shortDht(dhtAt + 2) = 0; shortDht(dhtAt + 3) = 0x05
    val e4 = intercept[IllegalArgumentException](
      JpegCodec.decodeGray(shortDht))
    assert(e4.getMessage.contains("truncated DHT"), e4.getMessage)
  }

  test("x_jpeg_decode: channel sums equal the block-constant replay (the oracle rule)") {
    val got = Multimodal.jpegDecodeStats(spark, dir).collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val tb = docs(id).getBytes("UTF-8")
      val want = (0 until 6).map(i =>
        if (tb.isEmpty) 0L else (tb(i % tb.length) & 0xff).toLong).sum * 64
      assert(r.getAs[Int]("width") === 24 && r.getAs[Int]("height") === 16)
      assert(r.getAs[Long]("r_sum") === want, s"doc $id")
      assert(r.getAs[Long]("g_sum") === want && r.getAs[Long]("b_sum") === want)
    }
  }

  test("x_jpeg_color_decode: channel sums equal the fixed-point YCbCr replay (the oracle rule)") {
    import graft.operators.JpegCodec
    val got = Multimodal.jpegColorDecodeStats(spark, dir).collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val tb = docs(id).getBytes("UTF-8")
      def b(i: Int): Int = if (tb.isEmpty) 0 else tb(i % tb.length) & 0xff
      var rs = 0L; var gs = 0L; var bs = 0L
      for (j <- 0 until 8) {
        val c = (j % 4) / 2
        val (pr, pg, pb) = JpegCodec.yccToRgb(b(j), b(8 + c), b(10 + c))
        rs += pr; gs += pg; bs += pb
      }
      assert(r.getAs[Int]("width") === 32 && r.getAs[Int]("height") === 16)
      assert(r.getAs[Long]("n_px") === 512L)
      assert(r.getAs[Long]("r_sum") === rs * 64, s"doc $id r")
      assert(r.getAs[Long]("g_sum") === gs * 64, s"doc $id g")
      assert(r.getAs[Long]("b_sum") === bs * 64, s"doc $id b")
    }
  }

  test("Y4M: round-trip (C444 + C420), frame params and unknown tags skipped") {
    import graft.operators.Y4mCodec
    def frame(n: Int, cLen: Int, seed: Int) = Y4mCodec.Frame(
      Array.tabulate(n)(j => ((j * 31 + seed) % 256).toByte),
      Array.tabulate(cLen)(j => ((j * 17 + seed) % 256).toByte),
      Array.tabulate(cLen)(j => ((j * 23 + seed) % 256).toByte))
    val v444 = Y4mCodec.Video(6, 4, c420 = false,
      (0 until 3).map(f => frame(24, 24, f * 97)))
    val back = Y4mCodec.decode(Y4mCodec.encode(v444))
    assert(back.width === 6 && back.height === 4 && !back.c420)
    assert(back.frames.length === 3)
    back.frames.zip(v444.frames).foreach { case (a, b) =>
      assert(a.y.toSeq === b.y.toSeq && a.u.toSeq === b.u.toSeq
        && a.v.toSeq === b.v.toSeq)
    }
    val v420 = Y4mCodec.Video(6, 4, c420 = true,
      Seq(frame(24, 6, 1), frame(24, 6, 2)))
    val b420 = Y4mCodec.decode(Y4mCodec.encode(v420))
    assert(b420.c420 && b420.frames.length === 2)
    assert(b420.frames.head.u.length === 6)
    // a stream written by another tool: unknown X-tags in the header,
    // per-frame parameters after FRAME — both skipped per spec
    val exotic = ("YUV4MPEG2 W2 H2 F30000:1001 Ip A128:117 C444 XYSCSS=444\n" +
      "FRAME Xtimecode=00:00:00:01\n").getBytes("US-ASCII") ++
      Array.tabulate(12)(j => j.toByte)
    val ex = Y4mCodec.decode(exotic)
    assert(ex.width === 2 && ex.height === 2 && ex.frames.length === 1)
    assert(ex.frames.head.y.toSeq === (0 until 4).map(_.toByte))
  }

  test("Y4M: malformed and out-of-scope inputs fail loudly") {
    import graft.operators.Y4mCodec
    val good = Y4mCodec.encode(Y4mCodec.Video(2, 2, c420 = false, Seq(
      Y4mCodec.Frame(Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8),
        Array[Byte](9, 10, 11, 12)))))
    intercept[IllegalArgumentException](Y4mCodec.decode("MPEG".getBytes))
    intercept[IllegalArgumentException](Y4mCodec.decode(good.take(good.length - 3)))
    intercept[IllegalArgumentException](Y4mCodec.decode(
      "YUV4MPEG2 W2 H2 C422\nFRAME\n".getBytes ++ Array.fill(8)(0.toByte)))
    // C420 with odd dimensions is geometrically impossible
    intercept[IllegalArgumentException](Y4mCodec.decode(
      "YUV4MPEG2 W3 H2 C420jpeg\nFRAME\n".getBytes ++ Array.fill(9)(0.toByte)))
  }

  test("Y4M frame stats: plane sums and motion vs a driver replica") {
    import graft.operators.Y4mCodec
    val f0 = Y4mCodec.Frame(Array[Byte](10, 20, 30, 40),
      Array[Byte](1, 1, 1, 1), Array[Byte](2, 2, 2, 2))
    val f1 = Y4mCodec.Frame(Array[Byte](15, 10, 30, -1), // -1 = 255 unsigned
      Array[Byte](3, 3, 3, 3), Array[Byte](4, 4, 4, 4))
    val stats = Y4mCodec.frameStats(Y4mCodec.Video(2, 2, c420 = false, Seq(f0, f1)))
    assert(stats(0) === Y4mCodec.FrameStats(0, 100, 4, 8, 0))
    // motion: |15-10| + |10-20| + |30-30| + |255-40| = 5+10+0+215 = 230
    assert(stats(1) === Y4mCodec.FrameStats(1, 15 + 10 + 30 + 255, 12, 16, 230))
  }

  test("x_video_frames equals a driver replica over real Y4M payloads") {
    val got = Multimodal.videoFrameStats(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter(_._1 % 3 == 2)
    assert(got.keySet === docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val tb = text.getBytes("UTF-8")
      def b(k: Int): Int = if (tb.isEmpty) 0 else tb(k % tb.length) & 0xff
      val rows = got(id).sortBy(_.getLong(1))
      assert(rows.length === Multimodal.VidFrames)
      for (f <- 0 until Multimodal.VidFrames) {
        val ys = (0 until 48).map(j => b(f * 48 + j))
        val us = (0 until 48).map(j => b(f * 48 + j + 7))
        val vs = (0 until 48).map(j => b(f * 48 + j + 13))
        val motion = if (f == 0) 0L
          else (0 until 48).map(j => math.abs(b(f * 48 + j) - b((f - 1) * 48 + j)).toLong).sum
        assert(rows(f).toSeq.drop(2) ===
          Seq(ys.sum.toLong, us.sum.toLong, vs.sum.toLong, motion), s"doc $id frame $f")
      }
    }
  }

  test("WAV: round-trip, metadata-chunk traversal, odd-size padding") {
    val samples = Array.tabulate(300)(k => ((k * 1103 + 7) % 65536 - 32768).toShort)
    val audio = WavCodec.Audio(16000, samples)
    val back = WavCodec.decode(WavCodec.encode(audio))
    assert(back.sampleRate === 16000 && back.samples.toSeq === samples.toSeq)

    // splice an odd-length LIST chunk (real-world metadata) between
    // fmt and data: traversal must skip it AND its pad byte
    val enc = WavCodec.encode(audio)
    val fmtEnd = 12 + 8 + 16
    val meta = "INFOsoftware-xy".getBytes("US-ASCII") // 15 bytes — odd
    assert(meta.length % 2 === 1, "fixture must be odd to exercise the pad byte")
    val spliced = enc.take(fmtEnd) ++
      "LIST".getBytes("US-ASCII") ++
      Array(meta.length.toByte, 0.toByte, 0.toByte, 0.toByte) ++
      meta ++ Array(0.toByte) ++ // pad byte
      enc.drop(fmtEnd)
    val viaMeta = WavCodec.decode(spliced)
    assert(viaMeta.samples.toSeq === samples.toSeq, "LIST chunk broke traversal")
  }

  test("WAV: malformed and out-of-scope inputs fail loudly") {
    val good = WavCodec.encode(WavCodec.Audio(8000, Array[Short](1, -2, 3)))
    intercept[IllegalArgumentException](WavCodec.decode("RIFX".getBytes ++ good.drop(4)))
    intercept[IllegalArgumentException](WavCodec.decode(good.take(good.length - 2)))
    // stereo must be rejected, not mis-parsed: flip the channel field
    val stereo = good.clone(); stereo(12 + 8 + 2) = 2
    val e = intercept[IllegalArgumentException](WavCodec.decode(stereo))
    assert(e.getMessage.contains("channel"))
  }

  test("WAV features: exact integer statistics vs a driver replica") {
    val samples = Array[Short](0, 5, -3, -1, 0, 2, -32768, 32767, 0, 0)
    val f = WavCodec.features(WavCodec.Audio(8000, samples))
    assert(f.nSamples === 10L && f.durationMs === 1L) // 10/8000 s → 1 ms floor
    assert(f.peak === 32768L)
    assert(f.sumAbs === samples.map(s => math.abs(s.toLong)).sum)
    assert(f.energy === samples.map(s => s.toLong * s).sum)
    // sign changes (0 counts non-negative): 5→-3 yes, -1→0 yes, 2→-32768
    // yes, -32768→32767 yes
    assert(f.zeroCrossings === 4L)
  }

  test("x_audio_frames tiles the clip: frame stats re-sum to whole-clip stats") {
    val whole = Multimodal.audioDecodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val frames = Multimodal.audioFrameStats(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet === whole.keySet)
    frames.foreach { case (id, fs) =>
      assert(fs.map(_.getLong(1)).sorted.toSeq === (0L until 4L), s"doc $id frames")
      val w = whole(id)
      assert(fs.map(_.getLong(2)).max === w.getLong(4), s"peak $id")
      assert(fs.map(_.getLong(3)).sum === w.getLong(5), s"sum_abs $id")
      assert(fs.map(_.getLong(5)).sum === w.getLong(7), s"energy $id")
      // frame-boundary crossings are excluded by design, nothing else is
      val zcSum = fs.map(_.getLong(4)).sum
      assert(zcSum <= w.getLong(6) && zcSum >= w.getLong(6) - 3, s"zc $id")
    }
  }

  test("progressive JPEG: four-scan encode decodes IDENTICAL to the sequential file") {
    import graft.operators.JpegCodec
    // same fdctQuant coefficients ride both scan structures, so the
    // decoded rasters must be bit-identical — on GENERAL content (AC
    // paths, ZRL, EOB runs, both spectral bands, DC SA + refinement)
    for ((w, h) <- Seq((24, 16), (29, 18), (8, 8), (17, 9))) {
      val g = Array.tabulate(w * h)(j =>
        ((j * 37 + (j / w) * 91 + 11) % 256).toByte)
      val prog = JpegCodec.encodeGrayProgressive(w, h, g)
      // really progressive: SOF2 present, 4 SOS markers
      def count(m: Int) = prog.sliding(2).count(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == m)
      assert(count(0xc2) === 1 && count(0xda) === 4, s"${w}x$h scan script")
      val (pw, ph, ours) = JpegCodec.decodeGray(prog)
      assert(pw === w && ph === h)
      val (_, _, seqv) = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, g))
      assert(ours.toSeq === seqv.toSeq,
        s"progressive != sequential raster at ${w}x$h")
    }
  }

  test("progressive JPEG: 0xFF fill bytes before a between-scan marker " +
      "are skipped (T.81 B.1.1.2), not refused") {
    import graft.operators.JpegCodec
    val w = 24; val h = 16
    val g = Array.tabulate(w * h)(j => ((j * 37 + 11) % 256).toByte)
    val prog = JpegCodec.encodeGrayProgressive(w, h, g)
    val (_, _, clean) = JpegCodec.decodeGray(prog)
    // splice a fill byte before the SECOND SOS (a scan boundary the
    // multi-scan marker loop reads; entropy FFs are stuffed, so a raw
    // FF DA pair is a true marker)
    val sosAt = prog.sliding(2).zipWithIndex.collect {
      case (p, i) if (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xda => i
    }.toSeq
    assert(sosAt.size === 4)
    val filled = prog.take(sosAt(1)) ++ Array(0xff.toByte) ++ prog.drop(sosAt(1))
    val (fw, fh, dec) = JpegCodec.decodeGray(filled)
    assert(fw === w && fh === h)
    assert(dec.toSeq === clean.toSeq, "fill byte changed the raster")
  }

  test("progressive JPEG: constant blocks round-trip EXACTLY (the oracled DC path)") {
    import graft.operators.JpegCodec
    val w = 24; val h = 16
    val g = Array.tabulate(w * h) { j =>
      val cell = (j / w / 8) * 3 + (j % w) / 8
      (cell * 40 + 7).toByte
    }
    val (dw, dh, dec) = JpegCodec.decodeGray(
      JpegCodec.encodeGrayProgressive(w, h, g))
    assert(dw === w && dh === h)
    assert(dec.toSeq === g.toSeq, "DC-only progressive round-trip must be lossless")
  }

  test("progressive JPEG: ImageIO reads our progressive files (encode direction)") {
    import graft.operators.JpegCodec
    val w = 24; val h = 16
    val g = Array.tabulate(w * h)(j => ((j * 53 + 29) % 256).toByte)
    val enc = JpegCodec.encodeGrayProgressive(w, h, g)
    val read = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
    assert(read != null, "ImageIO could not parse our progressive JPEG")
    assert(read.getWidth === w && read.getHeight === h)
    val (_, _, ours) = JpegCodec.decodeGray(enc)
    val maxDiff = (for (y <- 0 until h; x <- 0 until w) yield
      math.abs((ours(y * w + x) & 0xff) - read.getRaster.getSample(x, y, 0))).max
    assert(maxDiff <= 2, s"ImageIO disagrees with our progressive decode by $maxDiff")
  }

  test("progressive JPEG: our decoder agrees with ImageIO on ImageIO-written progressive files (SA + AC refinement script)") {
    import graft.operators.JpegCodec
    import java.awt.image.BufferedImage
    for ((w, h, color) <- Seq((29, 18, false), (32, 16, true))) {
      val img = new BufferedImage(w, h,
        if (color) BufferedImage.TYPE_3BYTE_BGR else BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        // smooth gradient (the baseline varying-chroma fixture): the
        // replication-vs-triangle upsampling gap is bounded by chroma
        // slope, so the comparison isolates the progressive machinery
        if (color) img.setRGB(x, y,
          ((x * 5 % 256) << 16) | ((y * 7 % 256) << 8) | ((x + y) % 256))
        else img.getRaster.setSample(x, y, 0, (x * 11 + y * 23 + (x * y) % 13) % 256)
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      // the libjpeg standard progression script: DC SA, AC bands at
      // Al=2, then THREE refinement scans — the G.1.2.3 decode paths
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      assert(bytes.sliding(2).exists(q =>
        (q(0) & 0xff) == 0xff && (q(1) & 0xff) == 0xc2),
        "ImageIO did not write a progressive (SOF2) file — test is vacuous")
      val theirs = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(theirs != null)
      if (color) {
        val (dw, dh, ours) = JpegCodec.decodeColor(bytes)
        assert(dw === w && dh === h)
        // same bounds as the baseline varying-chroma cross-validation:
        // the residual gap is the upsampling filter, not the scans
        val diffs = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) yield {
          val t = (theirs.getRGB(x, y) >> (16 - 8 * c)) & 0xff
          math.abs((ours((y * w + x) * 3 + c) & 0xff) - t)
        }
        val mean = diffs.sum.toDouble / diffs.size
        assert(mean <= 3.0 && diffs.max <= 40,
          s"progressive color disagreement mean=$mean max=${diffs.max}")
      } else {
        val (dw, dh, ours) = JpegCodec.decodeGray(bytes)
        assert(dw === w && dh === h)
        val maxDiff = (for (y <- 0 until h; x <- 0 until w) yield
          math.abs((ours(y * w + x) & 0xff) -
            theirs.getRaster.getSample(x, y, 0))).max
        assert(maxDiff <= 2,
          s"progressive decoder disagreement $maxDiff exceeds IDCT tolerance")
      }
    }
  }

  test("progressive JPEG: malformed scan scripts fail loudly") {
    import graft.operators.JpegCodec
    val g = Array.tabulate(24 * 16)(j => (j % 251).toByte)
    val enc = JpegCodec.encodeGrayProgressive(24, 16, g)
    // truncated mid-scan
    intercept[IllegalArgumentException](
      JpegCodec.decodeGray(enc.take(enc.length - 10)))
    // corrupt a scan header: find the second SOS and set Ss=0,Se=63 on
    // it (a progressive scan may not mix DC and AC — G.1.1.1.1)
    val idx = (0 until enc.length - 1).filter(i =>
      (enc(i) & 0xff) == 0xff && (enc(i + 1) & 0xff) == 0xda)
    assert(idx.length === 4)
    val bad = enc.clone()
    val sosAt = idx(1) // 1-component scan: Ss at +7, Se at +8
    bad(sosAt + 7) = 0; bad(sosAt + 8) = 63
    val e = intercept[IllegalArgumentException](JpegCodec.decodeGray(bad))
    assert(e.getMessage.contains("G.1.1.1.1"), e.getMessage)
  }

  test("x_audio_decode equals a driver replica over real WAV payloads") {
    val got = Multimodal.audioDecodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val docs = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter(_._1 % 3 == 1)
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { case (id, text) =>
      val tb = text.getBytes("UTF-8")
      val samples = Array.tabulate(Multimodal.WavN) { k =>
        val b = if (tb.isEmpty) 0 else tb(k % tb.length) & 0xff
        (((b * 251 + k * 17) % 65536) - 32768).toShort
      }
      val f = WavCodec.features(WavCodec.Audio(Multimodal.WavRate, samples))
      assert(got(id) === Seq(f.nSamples, f.sampleRate, f.durationMs,
        f.peak, f.sumAbs, f.zeroCrossings, f.energy), s"doc $id")
    }
  }

  // ------------------------------------------------------------- GIF / LZW

  import graft.operators.GifCodec

  private def grayImg(w: Int, h: Int, f: Int => Int): GifCodec.Gray =
    GifCodec.Gray(w, h, Array.tabulate(w * h)(i => (f(i) & 0xff).toByte))

  test("GIF: LZW round-trip across shapes, incl. code-width growth, cScSc runs, and 4096-dict CLEAR") {
    val shapes = Seq(
      grayImg(20, 14, i => i * 131 + 17),         // mixed content
      grayImg(33, 7, _ => 42),                    // constant: cScSc chain
      grayImg(1, 1, _ => 255),                    // minimal
      grayImg(16, 16, i => (i / 7) * 13),         // short runs
      // ~16k px of high-entropy bytes: dictionary hits 4096 → CLEAR
      grayImg(128, 128, i => (i * 2654435761L % 251).toInt))
    for (img <- shapes) {
      val dec = GifCodec.decode(GifCodec.encodeGray(img))
      assert(dec.width === img.width && dec.height === img.height)
      assert(dec.pixels.toSeq === img.pixels.toSeq,
        s"round-trip diverged at ${img.width}x${img.height}")
    }
  }

  test("GIF: our decoder reads ImageIO-written files (interlaced — the JDK default)") {
    import java.awt.image.{BufferedImage, IndexColorModel}
    val w = 20; val h = 14
    val lut = Array.tabulate(256)(_.toByte)
    val cm = new IndexColorModel(8, 256, lut, lut, lut)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 13 + y * 29) % 256)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "gif", bos), "no GIF writer in this JDK")
    val dec = GifCodec.decode(bos.toByteArray)
    assert(dec.width === w && dec.height === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.pixels(y * w + x) & 0xff) === img.getRaster.getSample(x, y, 0),
        s"pixel ($x,$y)")
  }

  test("GIF: ImageIO reads our encoder's files") {
    val img = grayImg(20, 14, i => i * 7 + 3)
    val read = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(GifCodec.encodeGray(img)))
    assert(read.getWidth === 20 && read.getHeight === 14)
    for (y <- 0 until 14; x <- 0 until 20) {
      val expect = img.pixels(y * 20 + x) & 0xff
      val argb = read.getRGB(x, y)
      assert(((argb >> 16) & 0xff) === expect, s"pixel ($x,$y)")
      assert(((argb >> 8) & 0xff) === expect && (argb & 0xff) === expect)
    }
  }

  test("GIF: malformed and out-of-scope inputs fail loudly, by name") {
    def msgOf(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](GifCodec.decode(bytes)).getMessage
    assert(msgOf("NOTAGIF!".getBytes).contains("signature"))
    val good = GifCodec.encodeGray(grayImg(20, 14, i => i))
    assert(msgOf(good.dropRight(20)).contains("truncated"))
    // animated: duplicate the image descriptor block before the trailer
    val desc = {
      val start = 13 + 768 // header + LSD + global table
      good.slice(start, good.length - 1)
    }
    val animated = good.dropRight(1) ++ desc ++ Array(0x3b.toByte)
    assert(msgOf(animated).contains("animated"))
    // local color table flag
    val local = good.clone()
    local(13 + 768 + 9) = (local(13 + 768 + 9) | 0x80).toByte
    assert(msgOf(local).contains("local color table"))
    // transparency flag inside a GCE
    val gce = Array(0x21, 0xf9, 4, 0x01, 0, 0, 0, 0).map(_.toByte)
    val withGce = good.take(13 + 768) ++ gce ++ good.drop(13 + 768)
    assert(msgOf(withGce).contains("transparency"))
  }

  test("x_gif_decode: gray sums and color counts equal the raster-rule replay") {
    val rows = Multimodal.gifDecodeStats(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, dir)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- rows) {
      val id = r.getAs[Long]("media_id")
      val tb = docs(id).getBytes("UTF-8")
      val px = Array.tabulate(280)(j => if (tb.isEmpty) 0 else tb(j % tb.length) & 0xff)
      assert(r.getAs[Long]("gray_sum") === px.map(_.toLong).sum, s"doc $id")
      assert(r.getAs[Long]("n_colors") === px.distinct.length.toLong, s"doc $id")
    }
  }
}
