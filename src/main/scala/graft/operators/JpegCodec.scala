package graft.operators

/** REAL transform-coded image codec: baseline JPEG (ITU-T T.81 /
  * ISO/IEC 10918-1), the rung past PNG on the codec ladder — where PNG
  * is lossless prediction + zlib, JPEG is the lossy 8×8 DCT + scalar
  * quantization + Huffman entropy coding that dominates actual crawl
  * corpora. Implemented from the public spec on the bare JDK: no
  * external libraries, no ImageIO in the codec path (ImageIO appears
  * only in the SPEC, as the independent cross-validation decoder).
  *
  * Scope (honest and loud): sequential DCT (SOF0/SOF1) AND
  * progressive DCT (SOF2 — T.81 Annex G: spectral selection,
  * successive approximation, DC/AC first and refinement scans, EOB
  * runs), 8-bit samples, grayscale AND 3-component YCbCr color
  * (4:4:4 / 4:2:2 / 4:2:0 — interleaved MCUs, subsampled chroma, JFIF
  * fixed-point color transforms), Huffman coding, restart markers,
  * any DQT/DHT layout (tables are read from the stream, so foreign
  * encoders' optimized tables decode fine; progressive files may
  * redefine tables between scans). Arithmetic coding, 12-bit,
  * 4-component CMYK/YCCK, sequential multi-scan (non-interleaved
  * baseline color) files and chroma sampling factors beyond the
  * Y-subsampled shapes are refused BY NAME. Malformed input fails
  * loudly (the PpmCodec convention).
  *
  * Determinism and the oracle: the decoder's IDCT runs in doubles over
  * a StrictMath cosine table (bit-identical on every JVM), with
  * round-half-up to samples. For the DuckDB-oracled query
  * ([[Multimodal.jpegDecodeStats]]) the corpus is built from CONSTANT
  * 8×8 blocks: a constant block carries only its DC coefficient, whose
  * forward-DCT/quantize/IDCT chain is exact integer arithmetic under
  * round-to-nearest — so the lossy codec round-trips those blocks
  * LOSSLESSLY and the raster statistics replay in SQL exactly, while
  * the decode still exercises the full real pipeline (marker parse,
  * DHT canonical-code build, bit unstuffing, DC prediction, EOB
  * handling, dequantize, IDCT). General-content coefficients (AC paths,
  * ZRL, restart intervals, ImageIO cross-validation both directions)
  * are exercised in JpegCodecSpec.
  */
object JpegCodec {
  import Multimodal.PpmCodec.Image

  /** Zigzag scan order → natural (row-major) 8×8 index (T.81 Fig. 5). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.3.1 typical DC luminance table (BITS, HUFFVAL). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray

  /** Annex K.3.2 typical AC luminance table. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Byte] = Array[Int](
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** Annex K.3.3 typical DC chrominance table (BITS, HUFFVAL). */
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).map(_.toByte).toArray

  /** Annex K.3.4 typical AC chrominance table. */
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Byte] = Array[Int](
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa).map(_.toByte)

  /** A flat all-ones quantization table: the near-lossless setting the
    * synthetic corpus uses (DC of a constant block quantizes exactly;
    * a real deployment would scale Annex K.1 by quality instead). */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  // ---- JFIF color transforms (fixed-point, exactly replayable) -------
  //
  // The BT.601 full-range conversions JFIF specifies, computed on a
  // decimal fixed-point grid (scale 10^6, round-half-up): the same
  // exact-rational arithmetic runs on the Scala side (Long floorDiv)
  // and in the DuckDB oracle (integer ops / exact double floor), so a
  // decoded color raster can sit under a hash oracle the way the
  // grayscale one does. libjpeg makes the same move with binary
  // fixed-point (FIX(1.40200) at 2^16); decimal keeps the SQL replay
  // one line instead of a shift-twiddling exercise.

  private val ColorScale = 1000000L
  private val ColorHalf = 500000L
  @inline private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** YCbCr → RGB (JFIF): r = y + 1.402(cr−128), g = y − 0.344136(cb−128)
    * − 0.714136(cr−128), b = y + 1.772(cb−128), round-half-up, clamped. */
  private[graft] def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = Math.floorDiv(ColorScale * y + 1402000L * (cr - 128) + ColorHalf, ColorScale)
    val g = Math.floorDiv(ColorScale * y - 344136L * (cb - 128) - 714136L * (cr - 128) + ColorHalf, ColorScale)
    val b = Math.floorDiv(ColorScale * y + 1772000L * (cb - 128) + ColorHalf, ColorScale)
    (clamp255(r), clamp255(g), clamp255(b))
  }

  /** RGB → YCbCr (JFIF): y = 0.299r + 0.587g + 0.114b,
    * cb = 128 − 0.168736r − 0.331264g + 0.5b,
    * cr = 128 + 0.5r − 0.418688g − 0.081312b, round-half-up, clamped. */
  private[graft] def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y  = Math.floorDiv(299000L * r + 587000L * g + 114000L * b + ColorHalf, ColorScale)
    val cb = 128 + Math.floorDiv(-168736L * r - 331264L * g + 500000L * b + ColorHalf, ColorScale)
    val cr = 128 + Math.floorDiv(500000L * r - 418688L * g - 81312L * b + ColorHalf, ColorScale)
    (clamp255(y), clamp255(cb), clamp255(cr))
  }

  /** StrictMath cosine basis — bit-identical on every JVM, which is what
    * makes the decode deterministic enough to sit under a hash oracle. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8)((x, u) =>
    StrictMath.cos((2 * x + 1) * u * math.Pi / 16))
  private def cScale(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  // ---- canonical Huffman (spec C.2 / F.2.2.3) ------------------------

  /** Encoder side: value → (code, length). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0; var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    table
  }

  /** Decoder side: MINCODE/MAXCODE/VALPTR per length. */
  private final class DecodeTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  // ---- bit I/O with 0xFF stuffing ------------------------------------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var acc = 0; private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      require(len <= 24, s"code too long: $len")
      acc = (acc << len) | (code & ((1 << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing (B.1.1.5)
        nbits -= 8
      }
    }
    /** Pad to a byte boundary with 1-bits (B.2.1; an all-ones pad that
      * completes 0xFF still gets stuffed through write()). */
    def align(): Unit =
      if (nbits > 0) write((1 << (8 - nbits)) - 1, 8 - nbits)
    /** A raw marker byte — byte-aligned, never stuffed. */
    def markerByte(b: Int): Unit = {
      require(nbits == 0, "marker emitted mid-byte")
      out.write(b)
    }
    def toBytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0; private var nbits = 0
    /** Next entropy-coded bit; unstuffs FF00; refuses a bare marker. */
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "entropy stream truncated")
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          require(pos < data.length, "entropy stream truncated at FF")
          val m = data(pos) & 0xff
          require(m == 0x00,
            f"unexpected marker FF$m%02x inside entropy data")
          pos += 1
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: DecodeTable): Int = {
      var code = bit(); var len = 1
      while (len <= 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
        code = (code << 1) | bit(); len += 1
      }
      require(len <= 16, "invalid Huffman code (no match in 16 bits)")
      t.value(len, code)
    }
    /** Align to a byte boundary and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      nbits = 0
      require(pos + 1 < data.length, "truncated at restart marker")
      require((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) == 0xd0 + n,
        f"expected RST$n, found ${data(pos) & 0xff}%02x${data(pos + 1) & 0xff}%02x")
      pos += 2
    }
  }

  // ---- DCT (naive separable, double precision) -----------------------

  private def fdctQuant(block: Array[Int], quant: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            sum += block(y * 8 + x) * Cos(x)(v) * Cos(y)(u)
            x += 1
          }
          y += 1
        }
        val coef = 0.25 * cScale(u) * cScale(v) * sum
        val q = quant(u * 8 + v)
        out(u * 8 + v) = StrictMath.round(coef / q).toInt
        v += 1
      }
      u += 1
    }
    out
  }

  private def idct(coefs: Array[Int], quant: Array[Int]): Array[Int] = {
    val px = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coefs(u * 8 + v)
            if (c != 0)
              sum += cScale(u) * cScale(v) *
                (c.toDouble * quant(u * 8 + v)) * Cos(x)(v) * Cos(y)(u)
            v += 1
          }
          u += 1
        }
        val s = StrictMath.round(0.25 * sum).toInt + 128
        px(y * 8 + x) = if (s < 0) 0 else if (s > 255) 255 else s
        x += 1
      }
      y += 1
    }
    px
  }

  private def bitSize(v: Int): Int = {
    val a = math.abs(v)
    32 - Integer.numberOfLeadingZeros(a) // 0 for 0
  }

  // ---- encoder -------------------------------------------------------

  /** Forward-DCT, quantize and entropy-code one level-shifted block;
    * returns the new DC predictor (the block's quantized DC). */
  private def encodeBlock(bw: BitWriter, block: Array[Int], quant: Array[Int],
      dcEnc: Array[(Int, Int)], acEnc: Array[(Int, Int)], pred: Int): Int = {
    val q = fdctQuant(block, quant)
    // DC: differential, category + offset bits (F.1.2.1)
    val diff = q(0) - pred
    val s = bitSize(diff)
    require(s <= 11, s"DC difference $diff out of baseline range")
    bw.write(dcEnc(s)._1, dcEnc(s)._2)
    if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    // AC: run-length in zigzag order (F.1.2.2)
    var run = 0; var k = 1
    while (k < 64) {
      val c = q(ZigZag(k))
      if (c == 0) run += 1
      else {
        while (run > 15) { // ZRL
          bw.write(acEnc(0xf0)._1, acEnc(0xf0)._2); run -= 16
        }
        val sz = bitSize(c)
        require(sz <= 10, s"AC coefficient $c out of baseline range " +
          "(quant table too fine for this content)")
        val sym = (run << 4) | sz
        bw.write(acEnc(sym)._1, acEnc(sym)._2)
        bw.write(if (c < 0) c + (1 << sz) - 1 else c, sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.write(acEnc(0x00)._1, acEnc(0x00)._2) // EOB
    q(0)
  }

  /** Gather one level-shifted 8×8 block from a plane, edge-replicated. */
  private def gatherBlock(plane: Array[Byte], w: Int, h: Int,
      bx: Int, by: Int): Array[Int] = {
    val block = new Array[Int](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(by * 8 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        block(y * 8 + x) = (plane(sy * w + sx) & 0xff) - 128
        x += 1
      }
      y += 1
    }
    block
  }

  /** Encode an 8-bit grayscale raster as a baseline JPEG (SOF0, Annex K
    * typical luminance Huffman tables, one quant table). `restartEvery`
    * > 0 inserts DRI/RSTn markers every that many MCUs (the resync
    * machinery real files carry). Edges pad by replication. */
  def encodeGray(width: Int, height: Int, samples: Array[Byte],
      quant: Array[Int] = FlatQuant, restartEvery: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(samples.length == width * height,
      s"raster size ${samples.length} != ${width}x$height")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1, 255]")
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    // DQT: precision 0, table id 0, zigzag order
    seg(0xdb, Array(0x00.toByte) ++
      ZigZag.map(nat => quant(nat).toByte))
    // SOF0: 8-bit, 1 component (id 1, sampling 1x1, quant table 0)
    seg(0xc0, Array[Byte](8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte,
      1, 1, 0x11, 0))
    // DHT: DC class 0 id 0, AC class 1 id 0 (Annex K typical tables)
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals)
    seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals)
    if (restartEvery > 0)
      seg(0xdd, Array[Byte]((restartEvery >>> 8).toByte, restartEvery.toByte))
    // SOS: 1 component, DC table 0, AC table 0, full spectral selection
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))

    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter
    val blocksX = (width + 7) / 8; val blocksY = (height + 7) / 8
    var pred = 0
    var mcu = 0; var rstN = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.align()
          bw.markerByte(0xff); bw.markerByte(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          pred = 0
        }
        pred = encodeBlock(bw,
          gatherBlock(samples, width, height, bx, by), quant, dcEnc, acEnc, pred)
        mcu += 1
        bx += 1
      }
      by += 1
    }
    val tail = bw.toBytes
    out.write(tail, 0, tail.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** AC Huffman table for the PROGRESSIVE encoder: the Annex K tables
    * lack the EOBn symbols (r<<4 for r ≥ 1) progressive band coding
    * emits, so the encoder declares its own — every (run, size ≤ 10)
    * symbol, ZRL, and EOB runs up to 63 blocks (r ≤ 5), as a canonical
    * code of 112 8-bit + 55 9-bit codes (incomplete: the all-ones code
    * stays unused, as B.2.4.2 effectively requires). Decoders read
    * tables from the stream, so interop is unaffected. */
  private val AcProgVals: Array[Byte] = {
    val syms = (for (size <- 1 to 10; run <- 0 to 15) yield (run << 4) | size) ++
      Seq(0xf0) ++ (0 to 5).map(r => r << 4)
    syms.map(_.toByte).toArray
  }
  private val AcProgBits: Array[Int] = {
    val n = AcProgVals.length // 167
    Array(0, 0, 0, 0, 0, 0, 0, 112, n - 112, 0, 0, 0, 0, 0, 0, 0)
  }

  /** Encode an 8-bit grayscale raster as a PROGRESSIVE JPEG (SOF2,
    * T.81 Annex G): four scans — DC first with successive approximation
    * (Al=1), two spectral-selection AC bands (1–5, 6–63) with EOB-run
    * coding, and the DC refinement scan delivering the deferred low
    * bit. Quantized coefficients are identical to [[encodeGray]]'s
    * (same [[fdctQuant]]), so the progressive file decodes to the SAME
    * raster as the sequential one — the scan structure is a transport
    * reordering, not a different approximation (spec-pinned). */
  def encodeGrayProgressive(width: Int, height: Int, samples: Array[Byte],
      quant: Array[Int] = FlatQuant): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(samples.length == width * height,
      s"raster size ${samples.length} != ${width}x$height")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in [1, 255]")
    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00.toByte) ++ ZigZag.map(nat => quant(nat).toByte))
    // SOF2: 8-bit, 1 component (id 1, sampling 1x1, quant table 0)
    seg(0xc2, Array[Byte](8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte,
      1, 1, 0x11, 0))
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals)
    seg(0xc4, Array(0x10.toByte) ++ AcProgBits.map(_.toByte) ++ AcProgVals)

    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcProgBits, AcProgVals)
    val blocksX = (width + 7) / 8; val blocksY = (height + 7) / 8
    // quantize once; the scans are views over the same coefficients
    val qb = Array.tabulate(blocksY * blocksX) { b =>
      fdctQuant(gatherBlock(samples, width, height,
        b % blocksX, b / blocksX), quant)
    }
    val dcAl = 1

    // scan 1: DC first, Ah=0 Al=1 — sequential coding of dc >> 1
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 0, 0x01))
    locally {
      val bw = new BitWriter
      var pred = 0
      qb.foreach { coefs =>
        val v = coefs(0) >> dcAl
        val diff = v - pred; pred = v
        val s = bitSize(diff)
        require(s <= 11, s"DC difference $diff out of range")
        bw.write(dcEnc(s)._1, dcEnc(s)._2)
        if (s > 0) bw.write(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      }
      val t = bw.toBytes; out.write(t, 0, t.length)
    }

    // spectral-selection AC bands with EOB-run coding (G.1.2.2)
    def acScan(ss: Int, se: Int): Unit = {
      seg(0xda, Array[Byte](1, 1, 0x00, ss.toByte, se.toByte, 0x00))
      val bw = new BitWriter
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val r = 31 - Integer.numberOfLeadingZeros(eobrun)
        bw.write(acEnc(r << 4)._1, acEnc(r << 4)._2)
        if (r > 0) bw.write(eobrun - (1 << r), r)
        eobrun = 0
      }
      qb.foreach { coefs =>
        var kk = se
        while (kk >= ss && coefs(ZigZag(kk)) == 0) kk -= 1
        if (kk < ss) { // whole band zero: the block joins the EOB run
          eobrun += 1
          if (eobrun == 63) flushEob() // table carries EOBn up to r=5
        } else {
          flushEob()
          var run = 0; var k = ss
          while (k <= kk) {
            val cv = coefs(ZigZag(k))
            if (cv == 0) run += 1
            else {
              while (run > 15) {
                bw.write(acEnc(0xf0)._1, acEnc(0xf0)._2); run -= 16
              }
              val sz = bitSize(cv)
              require(sz <= 10, s"AC coefficient $cv out of range")
              bw.write(acEnc((run << 4) | sz)._1, acEnc((run << 4) | sz)._2)
              bw.write(if (cv < 0) cv + (1 << sz) - 1 else cv, sz)
              run = 0
            }
            k += 1
          }
          if (kk < se) eobrun += 1 // trailing zeros: ends early, joins run
        }
      }
      flushEob()
      val t = bw.toBytes; out.write(t, 0, t.length)
    }
    acScan(1, 5)
    acScan(6, 63)

    // final scan: DC refinement, Ah=1 Al=0 — one raw bit per block
    seg(0xda, Array[Byte](1, 1, 0x00, 0, 0, 0x10))
    locally {
      val bw = new BitWriter
      qb.foreach(coefs => bw.write(coefs(0) & 1, 1))
      val t = bw.toBytes; out.write(t, 0, t.length)
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode YCbCr planes as a 3-component baseline JPEG (SOF0, Annex K
    * typical luminance + chrominance Huffman tables, two quant tables).
    * `sh`/`sv` are the LUMA sampling factors relative to 1×1 chroma:
    * (2,2) = 4:2:0, (2,1) = 4:2:2, (1,1) = 4:4:4. The chroma planes
    * must already be at their subsampled resolution
    * (ceil(w/sh) × ceil(h/sv)) — JPEG's native space is YCbCr, and a
    * camera/ISP pipeline hands the codec exactly this shape; [[encodeColor]]
    * is the RGB-in convenience face on top. `restartEvery` > 0 inserts
    * DRI/RSTn every that many MCUs, resetting all three DC predictors. */
  def encodeYcc(width: Int, height: Int,
      yP: Array[Byte], cbP: Array[Byte], crP: Array[Byte],
      sh: Int = 2, sv: Int = 2,
      quantY: Array[Int] = FlatQuant, quantC: Array[Int] = FlatQuant,
      restartEvery: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require((sh == 1 || sh == 2) && (sv == 1 || sv == 2),
      s"unsupported luma sampling ${sh}x$sv (supported: 1–2 each)")
    val cw = (width + sh - 1) / sh; val ch = (height + sv - 1) / sv
    require(yP.length == width * height, "luma plane size mismatch")
    require(cbP.length == cw * ch && crP.length == cw * ch,
      s"chroma plane size must be ${cw}x$ch for ${sh}x$sv sampling")
    for (q <- Seq(quantY, quantC))
      require(q.length == 64 && q.forall(v => v >= 1 && v <= 255),
        "quant table must be 64 entries in [1, 255]")

    val out = new java.io.ByteArrayOutputStream
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Byte]): Unit = {
      marker(m)
      out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
      out.write(body, 0, body.length)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00.toByte) ++ ZigZag.map(nat => quantY(nat).toByte))
    seg(0xdb, Array(0x01.toByte) ++ ZigZag.map(nat => quantC(nat).toByte))
    // SOF0: 8-bit, 3 components — Y (id 1, sampling sh×sv, quant 0),
    // Cb (id 2, 1×1, quant 1), Cr (id 3, 1×1, quant 1)
    seg(0xc0, Array[Byte](8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte,
      3,
      1, ((sh << 4) | sv).toByte, 0,
      2, 0x11, 1,
      3, 0x11, 1))
    seg(0xc4, Array(0x00.toByte) ++ DcBits.map(_.toByte) ++ DcVals)
    seg(0xc4, Array(0x10.toByte) ++ AcBits.map(_.toByte) ++ AcVals)
    seg(0xc4, Array(0x01.toByte) ++ DcChromaBits.map(_.toByte) ++ DcChromaVals)
    seg(0xc4, Array(0x11.toByte) ++ AcChromaBits.map(_.toByte) ++ AcChromaVals)
    if (restartEvery > 0)
      seg(0xdd, Array[Byte]((restartEvery >>> 8).toByte, restartEvery.toByte))
    // SOS: Y → DC0/AC0, Cb/Cr → DC1/AC1, full spectral selection
    seg(0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val dcEncY = buildEncodeTable(DcBits, DcVals)
    val acEncY = buildEncodeTable(AcBits, AcVals)
    val dcEncC = buildEncodeTable(DcChromaBits, DcChromaVals)
    val acEncC = buildEncodeTable(AcChromaBits, AcChromaVals)
    val bw = new BitWriter
    val mcusX = (width + 8 * sh - 1) / (8 * sh)
    val mcusY = (height + 8 * sv - 1) / (8 * sv)
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0; var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
          bw.align()
          bw.markerByte(0xff); bw.markerByte(0xd0 + rstN)
          rstN = (rstN + 1) % 8
          predY = 0; predCb = 0; predCr = 0
        }
        // interleaved MCU (A.2.3): Y's sh×sv blocks in raster order,
        // then one Cb block, then one Cr block
        var v = 0
        while (v < sv) {
          var h = 0
          while (h < sh) {
            predY = encodeBlock(bw,
              gatherBlock(yP, width, height, mx * sh + h, my * sv + v),
              quantY, dcEncY, acEncY, predY)
            h += 1
          }
          v += 1
        }
        predCb = encodeBlock(bw, gatherBlock(cbP, cw, ch, mx, my),
          quantC, dcEncC, acEncC, predCb)
        predCr = encodeBlock(bw, gatherBlock(crP, cw, ch, mx, my),
          quantC, dcEncC, acEncC, predCr)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    val tail = bw.toBytes
    out.write(tail, 0, tail.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an interleaved RGB raster as a color baseline JPEG: the
    * JFIF fixed-point forward transform ([[rgbToYcc]]) builds the
    * full-resolution YCbCr planes, chroma is box-averaged down to the
    * `sh`×`sv` grid (round-half-up — libjpeg's plain h2v2 downsample),
    * and [[encodeYcc]] does the transform coding. */
  def encodeColor(width: Int, height: Int, rgb: Array[Byte],
      sh: Int = 2, sv: Int = 2,
      quantY: Array[Int] = FlatQuant, quantC: Array[Int] = FlatQuant,
      restartEvery: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"raster size ${rgb.length} != ${width}x${height}x3")
    val yP = new Array[Byte](width * height)
    val cbF = new Array[Byte](width * height)
    val crF = new Array[Byte](width * height)
    var j = 0
    while (j < width * height) {
      val (y, cb, cr) = rgbToYcc(
        rgb(3 * j) & 0xff, rgb(3 * j + 1) & 0xff, rgb(3 * j + 2) & 0xff)
      yP(j) = y.toByte; cbF(j) = cb.toByte; crF(j) = cr.toByte
      j += 1
    }
    val cw = (width + sh - 1) / sh; val ch = (height + sv - 1) / sv
    def downsample(full: Array[Byte]): Array[Byte] =
      if (sh == 1 && sv == 1) full
      else {
        val outP = new Array[Byte](cw * ch)
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            var sum = 0; var n = 0
            var dy = 0
            while (dy < sv) {
              val yy = cy * sv + dy
              if (yy < height) {
                var dx = 0
                while (dx < sh) {
                  val xx = cx * sh + dx
                  if (xx < width) { sum += full(yy * width + xx) & 0xff; n += 1 }
                  dx += 1
                }
              }
              dy += 1
            }
            outP(cy * cw + cx) = ((sum + n / 2) / n).toByte
            cx += 1
          }
          cy += 1
        }
        outP
      }
    encodeYcc(width, height, yP, downsample(cbF), downsample(crF),
      sh, sv, quantY, quantC, restartEvery)
  }

  // ---- decoder -------------------------------------------------------

  /** One decoded component: sampling factors and its PADDED plane
    * (`pw`×`ph` = full MCU-grid multiples; the caller crops/upsamples). */
  private final case class Plane(h: Int, v: Int, pw: Int, ph: Int,
      samples: Array[Byte])

  /** Shared header-parse + entropy-decode for 1- and 3-component
    * baseline JPEG: interleaved MCU traversal (T.81 A.2.3) with
    * per-component Huffman tables, quant tables and DC predictors.
    * Tables come from the stream; anything outside the supported subset
    * is refused by name. */
  private def decodePlanes(payload: Array[Byte]): (Int, Int, Array[Plane]) = {
    require(payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var i = 2
    var width = -1; var height = -1
    var nComp = 0
    // per-component (in SOF order): id, h, v, quant id, dc id, ac id
    val cId = new Array[Int](3); val cH = new Array[Int](3)
    val cV = new Array[Int](3); val cTq = new Array[Int](3)
    val cDc = new Array[Int](3); val cAc = new Array[Int](3)
    var restartInterval = 0
    val quants = new Array[Array[Int]](4)
    val dcTables = new Array[DecodeTable](4)
    val acTables = new Array[DecodeTable](4)
    var scanStart = -1
    var adobeTransform = -1 // APP14 "Adobe" transform byte; -1 = absent
    var progressive = false
    // first scan's header (progressive: Ss/Se/Ah/Al + component subset)
    var scanComps: Array[Int] = null
    var scanSs = 0; var scanSe = 63; var scanAh = 0; var scanAl = 0

    def u16(off: Int): Int = ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)

    // segment parsers shared by the pre-scan header loop and (for
    // progressive files) the between-scans marker loop — tables MAY be
    // redefined between scans (libjpeg emits per-scan DHTs)
    def parseDqt(start: Int, end: Int): Unit = {
      var p = start
      while (p < end) {
        // each table must fit inside the DECLARED segment, not just
        // the buffer — else a short len reads following marker
        // bytes as quant values instead of failing loudly
        require(p + 65 <= end, "truncated DQT table")
        val pq = (payload(p) & 0xff) >> 4; val tq = payload(p) & 0x0f
        require(pq == 0, "16-bit quant tables not supported (baseline is 8)")
        val t = new Array[Int](64)
        var k = 0
        while (k < 64) { t(ZigZag(k)) = payload(p + 1 + k) & 0xff; k += 1 }
        quants(tq) = t
        p += 65
      }
    }
    def parseDht(start: Int, end: Int): Unit = {
      var p = start
      while (p < end) {
        require(p + 17 <= end, "truncated DHT table header")
        val tc = (payload(p) & 0xff) >> 4; val th = payload(p) & 0x0f
        val bits = Array.tabulate(16)(j => payload(p + 1 + j) & 0xff)
        val n = bits.sum
        require(p + 17 + n <= end, "truncated DHT table values")
        val vals = java.util.Arrays.copyOfRange(payload, p + 17, p + 17 + n)
        val t = new DecodeTable(bits, vals)
        if (tc == 0) dcTables(th) = t else acTables(th) = t
        p += 17 + n
      }
    }
    def parseSos(at: Int, len: Int): Unit = {
      require(nComp > 0, "SOS before SOF")
      val ns = payload(at + 4) & 0xff
      require(if (progressive) ns >= 1 && ns <= nComp else ns == nComp,
        s"$ns-component scan over a $nComp-component frame not supported " +
          (if (progressive) "" else "(sequential scope is one interleaved scan)"))
      scanComps = new Array[Int](ns)
      var sc = 0
      while (sc < ns) {
        val cs = payload(at + 5 + 2 * sc) & 0xff
        val tb = payload(at + 6 + 2 * sc) & 0xff
        val c = cId.indexWhere(_ == cs)
        require(c >= 0 && c < nComp, s"scan references unknown component $cs")
        cDc(c) = tb >> 4; cAc(c) = tb & 0x0f
        scanComps(sc) = c
        sc += 1
      }
      scanSs = payload(at + 5 + 2 * ns) & 0xff
      scanSe = payload(at + 6 + 2 * ns) & 0xff
      val ahal = payload(at + 7 + 2 * ns) & 0xff
      scanAh = ahal >> 4; scanAl = ahal & 0x0f
      scanStart = at + 2 + len
    }

    while (scanStart < 0) {
      require(i + 4 <= payload.length, "truncated marker segment")
      require((payload(i) & 0xff) == 0xff,
        f"expected marker, found ${payload(i) & 0xff}%02x at $i")
      val m = payload(i + 1) & 0xff
      val len = u16(i + 2)
      require(i + 2 + len <= payload.length, f"truncated segment FF$m%02x")
      m match {
        case 0xdb => parseDqt(i + 4, i + 2 + len)
        case 0xc4 => parseDht(i + 4, i + 2 + len)
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 sequential, SOF2 progressive
          progressive = m == 0xc2
          require((payload(i + 4) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(i + 5); width = u16(i + 7)
          nComp = payload(i + 9) & 0xff
          require(nComp == 1 || nComp == 3,
            s"$nComp-component JPEG not supported (codec scope is grayscale " +
              "and YCbCr; 4-component CMYK/YCCK is out of this rung's claim)")
          var c = 0
          while (c < nComp) {
            cId(c) = payload(i + 10 + 3 * c) & 0xff
            val hv = payload(i + 11 + 3 * c) & 0xff
            cH(c) = hv >> 4; cV(c) = hv & 0x0f
            cTq(c) = payload(i + 12 + 3 * c) & 0xff
            c += 1
          }
          if (nComp == 1) {
            // a single-component scan is non-interleaved: its MCU is one
            // data unit and declared sampling factors are ignored
            // (T.81 A.2.2), which libjpeg-written grayscale relies on
            cH(0) = 1; cV(0) = 1
          } else {
            require(cH(0) >= 1 && cH(0) <= 2 && cV(0) >= 1 && cV(0) <= 2,
              s"luma sampling ${cH(0)}x${cV(0)} not supported (scope: 1-2 each)")
            require(cH(1) == 1 && cV(1) == 1 && cH(2) == 1 && cV(2) == 1,
              "chroma sampling factors other than 1x1 not supported " +
                "(scope: 4:4:4 / 4:2:2 / 4:2:0 with subsampled chroma)")
          }
        case mm if mm >= 0xc3 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker FF$mm%02x (codec scope is sequential " +
              "and progressive Huffman)")
        case 0xdd => restartInterval = u16(i + 4)
        case 0xda => parseSos(i, len)
        case 0xee => // APP14: Adobe color-transform declaration
          if (len >= 14 &&
              new String(payload, i + 4, 5, "ISO-8859-1") == "Adobe")
            adobeTransform = payload(i + 2 + len - 1) & 0xff
        case _ => () // APPn, COM, ... — skip
      }
      i += 2 + len
    }
    require(width > 0 && height > 0, "missing SOF before SOS")
    if (nComp == 3) {
      // Color-space discipline: the YCbCr inverse transform is only
      // correct for YCbCr-coded planes. Adobe APP14 transform=0 declares
      // RGB-coded components, and non-JFIF component ids (JFIF mandates
      // 1/2/3) signal an unknown layout — both decode to wrong colors
      // silently if assumed YCbCr, so refuse by name like the other
      // out-of-scope shapes.
      require(adobeTransform != 0,
        "Adobe APP14 transform=0 (RGB-coded components) not supported " +
          "(codec scope is JFIF/Adobe YCbCr)")
      require(adobeTransform == 1 ||
        (adobeTransform == -1 && cId(0) == 1 && cId(1) == 2 && cId(2) == 3),
        s"3-component layout ids=${cId.mkString("/")} transform=" +
          s"${if (adobeTransform < 0) "absent" else adobeTransform} not " +
          "supported (scope: JFIF ids 1/2/3 or Adobe APP14 transform=1 YCbCr)")
    }
    val hMax = (0 until nComp).map(cH).max
    val vMax = (0 until nComp).map(cV).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planes = Array.tabulate(nComp) { c =>
      Plane(cH(c), cV(c), mcusX * 8 * cH(c), mcusY * 8 * cV(c),
        new Array[Byte](mcusX * 8 * cH(c) * mcusY * 8 * cV(c)))
    }

    // ---- progressive (SOF2): Annex G multi-scan decode ---------------
    //
    // Coefficients accumulate across scans in per-component full-frame
    // arrays; samples exist only after the last scan's IDCT. Four scan
    // kinds (G.1.1.1): DC first (sequential DC coding of the
    // point-transformed value), DC refinement (one raw bit per block),
    // AC first (run/size coding within the spectral band, EOB runs
    // spanning blocks), AC refinement (correction bits — the G.1.2.3
    // algorithm, in libjpeg's formulation). DC scans may interleave
    // all components; AC scans are single-component non-interleaved
    // (G.1.1.1.1), dimensioned by the component's own block grid.
    if (progressive) {
      def extend(v: Int, s: Int): Int =
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
      // padded (MCU-grid) block geometry per component — where DC scans
      // and the final IDCT live
      val bWc = Array.tabulate(nComp)(c => mcusX * cH(c))
      val bHc = Array.tabulate(nComp)(c => mcusY * cV(c))
      val coefA = Array.tabulate(nComp)(c => new Array[Int](bWc(c) * bHc(c) * 64))

      // decode the current scan's entropy data; returns the position of
      // the byte after it (at the next marker)
      def decodeScan(entry: Int): Int = {
        val br = new BitReader(payload, entry)
        val pred = new Array[Int](nComp)
        var eobrun = 0
        val comps = scanComps
        val ss = scanSs; val se = scanSe; val ah = scanAh; val al = scanAl
        require(ss <= se && se < 64, s"bad spectral selection $ss..$se")
        if (ss == 0) require(se == 0,
          "progressive scan mixes DC and AC coefficients (G.1.1.1.1 " +
            "requires Se=0 when Ss=0)")
        else require(comps.length == 1,
          "progressive AC scan must be single-component (G.1.1.1.1)")
        val dcTab: Array[DecodeTable] =
          if (ss == 0 && ah == 0) comps.map { c =>
            val t = dcTables(cDc(c))
            require(t != null, s"scan references undefined DC table ${cDc(c)}")
            t
          } else null
        val acTab: DecodeTable =
          if (ss > 0) {
            val t = acTables(cAc(comps(0)))
            require(t != null,
              s"scan references undefined AC table ${cAc(comps(0))}")
            t
          } else null

        def unit(ci: Int, c: Int, off: Int): Unit = {
          val A = coefA(c)
          if (ss == 0) {
            if (ah == 0) { // DC first: sequential coding of dc >> Al
              val s = br.decode(dcTab(ci))
              require(s <= 11, s"DC category $s out of range")
              val diff = if (s == 0) 0 else extend(br.bits(s), s)
              pred(c) += diff
              A(off) = pred(c) << al
            } else { // DC refinement: append bit Al (works in two's
              // complement because first-scan DC was an arithmetic shift)
              if (br.bit() == 1) A(off) |= 1 << al
            }
          } else if (ah == 0) { // AC first (G.1.2.2)
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var ended = false
              while (k <= se && !ended) {
                val sym = br.decode(acTab)
                val r = sym >> 4; val s = sym & 0x0f
                if (s == 0) {
                  if (r < 15) { // EOBn: run of 2^r + bits(r) blocks,
                    // this block included
                    eobrun = (1 << r) - 1
                    if (r > 0) eobrun += br.bits(r)
                    ended = true
                  } else k += 16 // ZRL
                } else {
                  k += r
                  require(k <= se, s"AC index $k overran band $ss..$se")
                  A(off + ZigZag(k)) = extend(br.bits(s), s) << al
                  k += 1
                }
              }
            }
          } else { // AC refinement (G.1.2.3)
            val p1 = 1 << al; val m1 = -p1
            def correct(z: Int): Unit =
              if (br.bit() == 1 && (A(z) & p1) == 0)
                A(z) += (if (A(z) >= 0) p1 else m1)
            var k = ss
            if (eobrun == 0) {
              var ended = false
              while (k <= se && !ended) {
                val sym = br.decode(acTab)
                var r = sym >> 4; val s = sym & 0x0f
                var newval = 0
                if (s == 0) {
                  if (r < 15) {
                    eobrun = 1 << r
                    if (r > 0) eobrun += br.bits(r)
                    ended = true
                  } // r == 15: ZRL — skip 16 zero-history coefficients
                } else {
                  require(s == 1,
                    f"AC refinement symbol 0x$sym%02x must have size 1")
                  newval = if (br.bit() == 1) p1 else m1
                }
                if (!ended) {
                  // advance over r zero-history coefficients, emitting
                  // correction bits for nonzero-history ones passed
                  var placed = false
                  while (k <= se && !placed) {
                    val z = off + ZigZag(k)
                    if (A(z) != 0) correct(z)
                    else if (r == 0) { A(z) = newval; placed = true }
                    else r -= 1
                    k += 1
                  }
                }
              }
            }
            if (eobrun > 0) { // correction bits to the end of the band
              while (k <= se) {
                val z = off + ZigZag(k)
                if (A(z) != 0) correct(z)
                k += 1
              }
              eobrun -= 1
            }
          }
        }

        var n = 0; var rstN = 0
        def maybeRestart(): Unit =
          if (restartInterval > 0 && n > 0 && n % restartInterval == 0) {
            br.restart(rstN); rstN = (rstN + 1) % 8
            java.util.Arrays.fill(pred, 0)
            eobrun = 0
          }
        if (comps.length == 1) {
          // non-interleaved: the component's own grid (ceil of its
          // scaled dimensions — NOT the padded MCU grid, T.81 A.2.2)
          val c = comps(0)
          val nbx = ((width * cH(c) + hMax - 1) / hMax + 7) / 8
          val nby = ((height * cV(c) + vMax - 1) / vMax + 7) / 8
          var by = 0
          while (by < nby) {
            var bx = 0
            while (bx < nbx) {
              maybeRestart()
              unit(0, c, (by * bWc(c) + bx) * 64)
              n += 1; bx += 1
            }
            by += 1
          }
        } else { // interleaved DC scan: MCU traversal as in sequential
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              maybeRestart()
              var ci = 0
              while (ci < comps.length) {
                val c = comps(ci)
                var v = 0
                while (v < cV(c)) {
                  var h = 0
                  while (h < cH(c)) {
                    unit(ci, c,
                      ((my * cV(c) + v) * bWc(c) + mx * cH(c) + h) * 64)
                    h += 1
                  }
                  v += 1
                }
                ci += 1
              }
              n += 1; mx += 1
            }
            my += 1
          }
        }
        br.pos
      }

      // scan loop: entropy data, then markers (DHT/DQT/DRI may redefine
      // state between scans) until the next SOS or EOI
      var pos = scanStart
      var done = false
      while (!done) {
        pos = decodeScan(pos)
        var nextScan = false
        while (!nextScan && !done) {
          require(pos + 2 <= payload.length, "truncated between scans")
          require((payload(pos) & 0xff) == 0xff,
            f"expected marker between scans, found ${payload(pos) & 0xff}%02x at $pos")
          // T.81 B.1.1.2: a marker may be preceded by any number of
          // 0xFF FILL bytes — skip them (FF FF .. FF D9 is a legal EOI)
          while (pos + 2 <= payload.length && (payload(pos + 1) & 0xff) == 0xff)
            pos += 1
          require(pos + 2 <= payload.length, "truncated between scans")
          val m = payload(pos + 1) & 0xff
          if (m == 0xd9) done = true // EOI
          else {
            require(pos + 4 <= payload.length, "truncated between scans")
            val len = u16(pos + 2)
            require(pos + 2 + len <= payload.length, f"truncated segment FF$m%02x")
            m match {
              case 0xdb => parseDqt(pos + 4, pos + 2 + len)
              case 0xc4 => parseDht(pos + 4, pos + 2 + len)
              case 0xdd => restartInterval = u16(pos + 4)
              case 0xda => parseSos(pos, len); nextScan = true
              case 0xee | 0xfe => () // APP14 fixed pre-frame; COM — skip
              case mm if mm >= 0xe0 && mm <= 0xef => ()
              case mm => throw new IllegalArgumentException(
                f"unexpected marker FF$mm%02x between progressive scans")
            }
            pos += 2 + len
          }
        }
        if (nextScan) pos = scanStart
      }

      // all scans folded in: dequantize + IDCT every padded block
      var c = 0
      while (c < nComp) {
        val q = quants(cTq(c))
        require(q != null, s"component $c references undefined quant table ${cTq(c)}")
        val pl = planes(c)
        val block = new Array[Int](64)
        var by = 0
        while (by < bHc(c)) {
          var bx = 0
          while (bx < bWc(c)) {
            System.arraycopy(coefA(c), (by * bWc(c) + bx) * 64, block, 0, 64)
            val px = idct(block, q)
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                pl.samples((by * 8 + y) * pl.pw + bx * 8 + x) =
                  px(y * 8 + x).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      return (width, height, planes)
    }

    val quant = Array.tabulate(nComp) { c =>
      val q = quants(cTq(c))
      require(q != null, s"scan references undefined quant table ${cTq(c)}")
      q
    }
    val dcT = Array.tabulate(nComp) { c =>
      val t = dcTables(cDc(c))
      require(t != null, s"scan references undefined DC table ${cDc(c)}")
      t
    }
    val acT = Array.tabulate(nComp) { c =>
      val t = acTables(cAc(c))
      require(t != null, s"scan references undefined AC table ${cAc(c)}")
      t
    }

    val br = new BitReader(payload, scanStart)
    val pred = new Array[Int](nComp)
    var mcu = 0; var rstN = 0

    def decodeBlock(c: Int, bx: Int, by: Int): Unit = {
      val coefs = new Array[Int](64)
      // DC (F.2.2.1)
      val s = br.decode(dcT(c))
      require(s <= 11, s"DC category $s out of range")
      val diff = if (s == 0) 0 else {
        val v = br.bits(s)
        if (v < (1 << (s - 1))) v - (1 << s) + 1 else v // EXTEND
      }
      pred(c) += diff
      coefs(0) = pred(c)
      // AC (F.2.2.2)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val sym = br.decode(acT(c))
        if (sym == 0x00) eob = true
        else if (sym == 0xf0) k += 16
        else {
          val run = sym >> 4; val sz = sym & 0x0f
          // size=0 is only legal as EOB (0x00) or ZRL (0xF0), both
          // handled above; anything else (e.g. 0x30) would read zero
          // bits and lean on negative-shift masking in EXTEND —
          // a silent zero coefficient instead of a loud failure.
          require(sz > 0, f"invalid baseline AC symbol 0x$sym%02x (size=0)")
          k += run
          require(k < 64, s"AC index $k overran the block")
          val v = br.bits(sz)
          coefs(ZigZag(k)) =
            if (v < (1 << (sz - 1))) v - (1 << sz) + 1 else v
          k += 1
        }
      }
      val px = idct(coefs, quant(c))
      val pl = planes(c)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          pl.samples((by * 8 + y) * pl.pw + bx * 8 + x) = px(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
    }

    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstN); rstN = (rstN + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < nComp) {
          var v = 0
          while (v < cV(c)) {
            var h = 0
            while (h < cH(c)) {
              decodeBlock(c, mx * cH(c) + h, my * cV(c) + v)
              h += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    (width, height, planes)
  }

  /** Decode a baseline grayscale JPEG to (width, height, samples).
    * A color (3-component) payload is refused by name here — use
    * [[decode]], which handles both. */
  private[graft] def decodeGray(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, planes) = decodePlanes(payload)
    require(planes.length == 1,
      s"${planes.length}-component JPEG not supported by the grayscale " +
        "entry point (decode handles color)")
    val pl = planes(0)
    val samples = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(pl.samples, y * pl.pw, samples, y * w, w)
      y += 1
    }
    (w, h, samples)
  }

  /** Decode a 3-component YCbCr baseline JPEG to interleaved RGB:
    * chroma upsampled by replication (deterministic and exact on the
    * subsampling grid; T.81 leaves the upsampling filter to the
    * implementation), then the JFIF fixed-point inverse transform. */
  private[graft] def decodeColor(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, planes) = decodePlanes(payload)
    require(planes.length == 3,
      s"${planes.length}-component JPEG is not color (use decode)")
    val Array(py, pcb, pcr) = planes
    val hMax = planes.map(_.h).max; val vMax = planes.map(_.v).max
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yv = py.samples((y * py.v / vMax) * py.pw + x * py.h / hMax) & 0xff
        val cb = pcb.samples((y * pcb.v / vMax) * pcb.pw + x * pcb.h / hMax) & 0xff
        val cr = pcr.samples((y * pcr.v / vMax) * pcr.pw + x * pcr.h / hMax) & 0xff
        val (r, g, b) = yccToRgb(yv, cb, cr)
        val j = (y * w + x) * 3
        rgb(j) = r.toByte; rgb(j + 1) = g.toByte; rgb(j + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** Decode to the shared RGB [[Image]] shape: grayscale expands to RGB
    * (the PngCodec convention) and color goes through the JFIF inverse
    * transform, so downstream channel statistics see one shape across
    * the whole codec ladder. */
  def decode(payload: Array[Byte]): Image = {
    val (w, h, planes) = decodePlanes(payload)
    if (planes.length == 1) {
      val pl = planes(0)
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = pl.samples(y * pl.pw + x)
          val j = (y * w + x) * 3
          rgb(j) = g; rgb(j + 1) = g; rgb(j + 2) = g
          x += 1
        }
        y += 1
      }
      Image(w, h, 255, rgb)
    } else {
      val (_, _, rgb) = decodeColor(payload)
      Image(w, h, 255, rgb)
    }
  }
}
