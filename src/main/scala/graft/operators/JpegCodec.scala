package graft.operators

/** REAL transform-coded image codec: baseline JPEG (ITU-T T.81 /
  * ISO/IEC 10918-1), the rung past PNG on the codec ladder — where PNG
  * is lossless prediction + zlib, JPEG is the lossy 8×8 DCT + scalar
  * quantization + Huffman entropy coding that dominates actual crawl
  * corpora. Implemented from the public spec on the bare JDK: no
  * external libraries, no ImageIO in the codec path (ImageIO appears
  * only in the SPEC, as the independent cross-validation decoder).
  *
  * Scope (honest and loud): baseline sequential DCT (SOF0/SOF1),
  * 8-bit samples, SINGLE-component (grayscale), Huffman coding,
  * restart markers, any DQT/DHT layout (tables are read from the
  * stream, so foreign encoders' optimized tables decode fine).
  * Progressive (SOF2), arithmetic coding, 12-bit, and multi-component
  * scans are refused BY NAME — chroma handling is a color-space detail
  * this rung does not claim; the machinery under test is the
  * entropy-decode → dequantize → IDCT pipeline, which is identical per
  * component. Malformed input fails loudly (the PpmCodec convention).
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

  /** A flat all-ones quantization table: the near-lossless setting the
    * synthetic corpus uses (DC of a constant block quantizes exactly;
    * a real deployment would scale Annex K.1 by quality instead). */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

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
        // gather the level-shifted block, edge-replicated
        val block = new Array[Int](64)
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            block(y * 8 + x) = (samples(sy * width + sx) & 0xff) - 128
            x += 1
          }
          y += 1
        }
        val q = fdctQuant(block, quant)
        // DC: differential, category + offset bits (F.1.2.1)
        val diff = q(0) - pred; pred = q(0)
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

  // ---- decoder -------------------------------------------------------

  /** Decode a baseline grayscale JPEG to (width, height, samples).
    * Tables come from the stream; anything outside the supported subset
    * is refused by name. */
  private[graft] def decodeGray(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(payload.length >= 4 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var i = 2
    var width = -1; var height = -1
    var quantId = -1
    var dcId = -1; var acId = -1
    var restartInterval = 0
    val quants = new Array[Array[Int]](4)
    val dcTables = new Array[DecodeTable](4)
    val acTables = new Array[DecodeTable](4)
    var scanStart = -1

    def u16(off: Int): Int = ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)

    while (scanStart < 0) {
      require(i + 4 <= payload.length, "truncated marker segment")
      require((payload(i) & 0xff) == 0xff,
        f"expected marker, found ${payload(i) & 0xff}%02x at $i")
      val m = payload(i + 1) & 0xff
      val len = u16(i + 2)
      require(i + 2 + len <= payload.length, f"truncated segment FF$m%02x")
      m match {
        case 0xdb => // DQT: one or more tables
          var p = i + 4
          while (p < i + 2 + len) {
            // each table must fit inside the DECLARED segment, not just
            // the buffer — else a short len reads following marker
            // bytes as quant values instead of failing loudly
            require(p + 65 <= i + 2 + len, "truncated DQT table")
            val pq = (payload(p) & 0xff) >> 4; val tq = payload(p) & 0x0f
            require(pq == 0, "16-bit quant tables not supported (baseline is 8)")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(ZigZag(k)) = payload(p + 1 + k) & 0xff; k += 1 }
            quants(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = i + 4
          while (p < i + 2 + len) {
            require(p + 17 <= i + 2 + len, "truncated DHT table header")
            val tc = (payload(p) & 0xff) >> 4; val th = payload(p) & 0x0f
            val bits = Array.tabulate(16)(j => payload(p + 1 + j) & 0xff)
            val n = bits.sum
            require(p + 17 + n <= i + 2 + len, "truncated DHT table values")
            val vals = java.util.Arrays.copyOfRange(payload, p + 17, p + 17 + n)
            val t = new DecodeTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + n
          }
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          require((payload(i + 4) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(i + 5); width = u16(i + 7)
          val nComp = payload(i + 9) & 0xff
          require(nComp == 1,
            s"$nComp-component JPEG not supported (codec scope is grayscale; " +
              "chroma is out of this rung's claim)")
          quantId = payload(i + 12) & 0xff
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) not supported (codec scope is baseline)")
        case mm if mm >= 0xc3 && mm <= 0xcf && mm != 0xc4 && mm != 0xc8 =>
          throw new IllegalArgumentException(
            f"unsupported SOF marker FF$mm%02x (codec scope is baseline Huffman)")
        case 0xdd => restartInterval = u16(i + 4)
        case 0xda => // SOS
          require((payload(i + 4) & 0xff) == 1, "multi-component scan")
          dcId = (payload(i + 6) & 0xff) >> 4; acId = payload(i + 6) & 0x0f
          scanStart = i + 2 + len
        case _ => () // APPn, COM, ... — skip
      }
      i += 2 + len
    }
    require(width > 0 && height > 0, "missing SOF before SOS")
    val quant = quants(quantId)
    require(quant != null, s"scan references undefined quant table $quantId")
    val dcT = dcTables(dcId); val acT = acTables(acId)
    require(dcT != null && acT != null,
      s"scan references undefined Huffman tables (dc=$dcId ac=$acId)")

    val br = new BitReader(payload, scanStart)
    val blocksX = (width + 7) / 8; val blocksY = (height + 7) / 8
    val samples = new Array[Byte](width * height)
    var pred = 0
    var mcu = 0; var rstN = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstN); rstN = (rstN + 1) % 8; pred = 0
        }
        val coefs = new Array[Int](64)
        // DC (F.2.2.1)
        val s = br.decode(dcT)
        require(s <= 11, s"DC category $s out of range")
        val diff = if (s == 0) 0 else {
          val v = br.bits(s)
          if (v < (1 << (s - 1))) v - (1 << s) + 1 else v // EXTEND
        }
        pred += diff
        coefs(0) = pred
        // AC (F.2.2.2)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val sym = br.decode(acT)
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
        val px = idct(coefs, quant)
        var y = 0
        while (y < 8) {
          val sy = by * 8 + y
          if (sy < height) {
            var x = 0
            while (x < 8) {
              val sx = bx * 8 + x
              if (sx < width) samples(sy * width + sx) = px(y * 8 + x).toByte
              x += 1
            }
          }
          y += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    (width, height, samples)
  }

  /** Decode to the shared RGB [[Image]] shape (grayscale expands to RGB,
    * the PngCodec convention, so downstream channel statistics see one
    * shape across the whole codec ladder). */
  def decode(payload: Array[Byte]): Image = {
    val (w, h, g) = decodeGray(payload)
    val rgb = new Array[Byte](w * h * 3)
    var j = 0
    while (j < g.length) {
      rgb(j * 3) = g(j); rgb(j * 3 + 1) = g(j); rgb(j * 3 + 2) = g(j)
      j += 1
    }
    Image(w, h, 255, rgb)
  }
}
