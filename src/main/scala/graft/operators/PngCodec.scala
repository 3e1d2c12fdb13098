package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL compressed image codec: PNG (ISO/IEC 15948), the step past the
  * uncompressed PPM codec ([[Multimodal.PpmCodec]]) — an actual
  * DEFLATE-compressed format with per-scanline predictive filtering,
  * implemented on the JDK's zlib bindings (`java.util.zip`) with no
  * external libraries.
  *
  * Decoder scope (the real-world subset every PNG writer emits by
  * default): 8-bit samples, truecolor (type 2) and grayscale (type 0),
  * non-interlaced, any number of IDAT chunks, ancillary chunks skipped,
  * per-chunk CRC-32 VERIFIED. All five filter types (None/Sub/Up/
  * Average/Paeth) are reversed exactly per spec §9. Malformed input
  * fails loudly (the PpmCodec convention: a corrupt asset must surface
  * at the decode site, not propagate garbage statistics).
  *
  * The encoder cycles the filter type per scanline (y mod 5), so a
  * synthetic corpus round-tripped through this codec exercises every
  * unfilter path — which is what lets the DuckDB oracle gate the real
  * inflate+unfilter machinery end-to-end in [[Multimodal.pngDecodeStats]]:
  * compression round-trips away, the raster statistics replay in SQL.
  *
  * Independent cross-validation: PngCodecSpec decodes ImageIO-written
  * PNGs and has ImageIO decode ours — two unrelated implementations
  * agreeing on the same bytes.
  */
object PngCodec {
  import Multimodal.PpmCodec.Image

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an RGB image as a truecolor PNG, cycling the scanline filter
    * (y mod 5) so every filter type appears in any image ≥5 rows tall.
    * Deterministic given the raster (single-JVM zlib; the decoded raster
    * — the only thing the oracle sees — is deterministic everywhere). */
  def encode(img: Image): Array[Byte] = {
    require(img.maxVal == 255, "PNG encoder emits 8-bit samples only")
    val bpp = 3
    val stride = img.width * bpp
    require(img.pixels.length == stride * img.height,
      s"raster size ${img.pixels.length} != ${stride}x${img.height}")
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) img.pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = f.toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val out = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      out.write(buf, 0, n)
    }
    deflater.end()
    val ihdr = be32(img.width) ++ be32(img.height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, adaptive, no interlace
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse a PNG payload into an RGB [[Image]] (grayscale expands to
    * RGB so downstream channel statistics see one shape). Verifies the
    * signature and every chunk CRC; throws on anything outside the
    * supported subset. */
  def decode(payload: Array[Byte]): Image = {
    require(payload.length >= 8 && Signature.indices.forall(i => payload(i) == Signature(i)),
      "not a PNG: bad signature")
    var i = 8
    var width = -1; var height = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream
    var sawEnd = false
    while (!sawEnd) {
      require(i + 8 <= payload.length, "truncated chunk header")
      val len = readBe32(payload, i)
      require(len >= 0 && i + 12 + len <= payload.length, s"truncated chunk body (len=$len)")
      val tpe = new String(payload, i + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(payload, i + 4, 4 + len)
      require(crc.getValue.toInt == readBe32(payload, i + 8 + len),
        s"CRC mismatch in $tpe chunk")
      tpe match {
        case "IHDR" =>
          width = readBe32(payload, i + 8)
          height = readBe32(payload, i + 12)
          val depth = payload(i + 16) & 0xff
          colorType = payload(i + 17) & 0xff
          val interlace = payload(i + 20) & 0xff
          require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
          require(depth == 8, s"unsupported bit depth $depth (codec handles 8)")
          require(colorType == 2 || colorType == 0,
            s"unsupported color type $colorType (codec handles 0/2)")
          require(interlace == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(payload, i + 8, len)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunk (tEXt, pHYs, ...) — skip
      }
      i += 12 + len
    }
    require(width > 0, "missing IHDR")
    require(idat.size > 0, "missing IDAT")

    val bpp = if (colorType == 2) 3 else 1
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new Inflater(false)
    inflater.setInput(idat.toByteArray)
    var filled = 0
    while (filled < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, filled, raw.length - filled)
      require(n > 0 || inflater.finished(),
        if (inflater.needsInput()) "truncated IDAT stream" else "zlib stall")
      filled += n
    }
    inflater.end()
    require(filled == raw.length,
      s"short raster: inflated $filled of ${raw.length} bytes")

    // reverse the per-scanline filters in place (spec §9: reconstruction
    // is defined on the filtered bytes of this line + the RECONSTRUCTED
    // bytes of the prior line)
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      require(ft <= 4, s"bad filter type $ft on scanline $y")
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
        }
        px(y * stride + x) = v.toByte
        x += 1
      }
      y += 1
    }

    if (colorType == 2) Image(width, height, 255, px)
    else { // expand grayscale to RGB
      val rgb = new Array[Byte](width * height * 3)
      var j = 0
      while (j < px.length) {
        rgb(j * 3) = px(j); rgb(j * 3 + 1) = px(j); rgb(j * 3 + 2) = px(j)
        j += 1
      }
      Image(width, height, 255, rgb)
    }
  }
}
