package graft.operators

/** GIF87a/89a codec — the palette-indexed LZW rung of the codec family
  * (after PPM raw, PNG filter+DEFLATE, JPEG baseline/color/progressive
  * DCT): the dictionary-coder class of format, still ~everywhere in
  * crawl corpora. Implemented from the public specification (GIF89a,
  * CompuServe 1990) and Welch 1984 (LZW), on the bare JDK.
  *
  * Scope (refused BY NAME outside it, same discipline as
  * [[JpegCodec]]): single-image, global color table only, sequential
  * OR 4-pass interlaced row order (the JDK's own writer interlaces by
  * default, and crawl GIFs often do); 89a Graphic Control / Comment /
  * Application extensions are SKIPPED (they carry no raster);
  * animation (a second image descriptor), local color tables, and
  * transparency-used rasters are refused.
  *
  * GIF LZW specifics implemented in full: variable code width starting
  * at minCodeSize+1 bits, LSB-first bit packing across ≤255-byte
  * sub-blocks, CLEAR (2^N) / EOI (2^N+1) control codes, dictionary
  * growth to 4096 with encoder-side CLEAR on overflow, and the
  * "cScSc" deferred-code case (code == next unassigned slot →
  * prev + prev.head).
  *
  * The fixture corpus uses an IDENTITY 256-gray palette (entry i =
  * (i,i,i)), so decoded indices ARE gray values and LZW's losslessness
  * puts the whole parse+decompress machine under the DuckDB hash
  * oracle, exactly the PNG argument.
  */
object GifCodec {

  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"GIF: $msg")

  // ---------------------------------------------------------------- encode

  /** Encode an 8-bit grayscale raster as GIF89a with the identity
    * 256-entry global palette. */
  def encodeGray(img: Gray): Array[Byte] = {
    require(img.pixels.length == img.width * img.height, "raster size")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0xf7) // global table, 8 bits/px, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(img.width); u16(img.height)
    out.write(0)    // no local table, not interlaced
    out.write(8)    // LZW min code size
    out.write(lzwEncode(img.pixels, 8))
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW: emits CLEAR first (decoder-friendly), grows the
    * code width at dictionary size 2^width, CLEARs at 4096. Output is
    * the sub-block-framed data stream (without the terminating 0). */
  private def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bits = new BitWriterLsb
    // LongMap, NOT java.util.HashMap[Long, Int]: Scala null-unboxes a
    // missing java-map Int value to 0, which silently aliases every
    // absent key onto code 0
    var dict = scala.collection.mutable.LongMap.empty[Int]
    var next = eoi + 1
    var width = minCodeSize + 1
    def reset(): Unit = { dict = scala.collection.mutable.LongMap.empty[Int]; next = eoi + 1; width = minCodeSize + 1 }
    bits.write(clear, width)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff // single-byte strings are implicit codes
      var i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key = (prefix.toLong << 8) | b
        val got = dict.getOrElse(key, -1)
        if (got >= 0) prefix = got
        else {
          bits.write(prefix, width)
          if (next < 4096) {
            // the decoder assigns its dictionary slots one code BEHIND
            // the encoder (it cannot build an entry until the next code
            // arrives — the lag behind the cScSc case), so the wire
            // width must grow when the DECODER's counter hits 2^w:
            // encoder-next == decoder-next + 1 == 2^w + 1
            dict.put(key, next)
            next += 1
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else { bits.write(clear, width); reset() }
          prefix = b
        }
        i += 1
      }
      bits.write(prefix, width)
    }
    bits.write(eoi, width)
    // frame into <=255-byte sub-blocks
    val raw = bits.toBytes
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < raw.length) {
      val n = math.min(255, raw.length - off)
      out.write(n); out.write(raw, off, n); off += n
    }
    out.toByteArray
  }

  private final class BitWriterLsb {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= (code.toLong & ((1L << width) - 1)) << nbits
      nbits += width
      while (nbits >= 8) { buf.write((acc & 0xff).toInt); acc >>>= 8; nbits -= 8 }
    }
    def toBytes: Array[Byte] = {
      if (nbits > 0) buf.write((acc & 0xff).toInt)
      buf.toByteArray
    }
  }

  // ---------------------------------------------------------------- decode

  def decode(payload: Array[Byte]): Gray = {
    val in = new Cursor(payload)
    val sig = new String(in.take(6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") fail(s"bad signature '$sig'")
    val w = in.u16(); val h = in.u16()
    val packed = in.u8()
    val hasGlobal = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 7)
    in.u8() // background
    in.u8() // aspect
    if (!hasGlobal) fail("no global color table — unsupported (scope: global table only)")
    val palette = in.take(gctSize * 3)
    // grayscale contract of this codec: every entry r == g == b
    var pi = 0
    while (pi < gctSize) {
      if (palette(pi * 3) != palette(pi * 3 + 1) ||
          palette(pi * 3) != palette(pi * 3 + 2))
        fail(s"non-grayscale palette entry $pi — color GIF unsupported here")
      pi += 1
    }
    var raster: Gray = null
    var done = false
    while (!done) {
      in.u8() match {
        case 0x3b => done = true // trailer
        case 0x21 => // extension: GCE/comment/app — skip sub-blocks
          val label = in.u8()
          if (label == 0xf9) { // graphic control: refuse used transparency
            val n = in.u8(); val flags = in.u8()
            if ((flags & 1) != 0) fail("transparency flag set — unsupported")
            in.take(n - 1); if (in.u8() != 0) fail("unterminated GCE")
          } else {
            var n = in.u8()
            while (n != 0) { in.take(n); n = in.u8() }
          }
        case 0x2c => // image descriptor
          if (raster != null) fail("second image descriptor — animated GIF unsupported")
          val left = in.u16(); val top = in.u16()
          val iw = in.u16(); val ih = in.u16()
          val ip = in.u8()
          if ((ip & 0x80) != 0) fail("local color table — unsupported")
          val interlaced = (ip & 0x40) != 0
          if (left != 0 || top != 0 || iw != w || ih != h)
            fail("sub-rectangle image — unsupported")
          val minCode = in.u8()
          if (minCode < 2 || minCode > 8) fail(s"LZW min code size $minCode out of range")
          val data = {
            val bos = new java.io.ByteArrayOutputStream()
            var n = in.u8()
            while (n != 0) { bos.write(in.take(n)); n = in.u8() }
            bos.toByteArray
          }
          val idx = lzwDecode(data, minCode, iw * ih)
          idx.foreach(b =>
            if ((b & 0xff) >= gctSize) fail(s"palette index ${b & 0xff} >= table size $gctSize"))
          raster = Gray(iw, ih,
            if (interlaced) deinterlace(idx, iw, ih) else idx)
        case other => fail(f"unknown block 0x$other%02x")
      }
    }
    if (raster == null) fail("no image data before trailer")
    raster
  }

  /** GIF 4-pass interlace: transmitted row order is rows 0,8,16… then
    * 4,12… then 2,6,10… then 1,3,5… — reorder into raster order. */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
         row <- start until h by step) {
      System.arraycopy(idx, src * w, out, row * w, w)
      src += 1
    }
    out
  }

  /** Standard LZW decode, GIF flavor (width growth AFTER assigning the
    * slot that fills the current width; cScSc case; CLEAR resets). */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(expected)
    val prefixOf = new Array[Int](4096)
    val suffixOf = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    val bits = new BitReaderLsb(data)
    def emit(code: Int): Byte = { // writes the string of `code`, returns head
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear) { stack = suffixOf(c) :: stack; c = prefixOf(c) }
      val head = c.toByte
      out.write(c)
      stack.foreach(b => out.write(b & 0xff))
      head
    }
    var finished = false
    while (!finished) {
      val code = bits.read(width)
      if (code < 0) fail("bitstream ended before EOI")
      if (code == clear) { next = eoi + 1; width = minCodeSize + 1; prev = -1 }
      else if (code == eoi) finished = true
      else if (prev == -1) {
        if (code >= clear) fail(s"first code $code after clear is not a literal")
        emit(code); prev = code
      } else {
        if (code > next) fail(s"LZW code $code beyond dictionary ($next)")
        val head =
          if (code == next) { // cScSc: string = prev-string + head(prev)
            val h = emit(prev)
            out.write(h & 0xff); h
          } else emit(code)
        if (next < 4096) {
          prefixOf(next) = prev; suffixOf(next) = head
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    val res = out.toByteArray
    if (res.length != expected)
      fail(s"decoded ${res.length} pixels, image declares $expected")
    res
  }

  private final class BitReaderLsb(data: Array[Byte]) {
    private var pos = 0
    private var acc = 0L
    private var nbits = 0
    def read(width: Int): Int = {
      while (nbits < width) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1; nbits += 8
      }
      val v = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      v
    }
  }

  private final class Cursor(data: Array[Byte]) {
    private var pos = 0
    def u8(): Int = {
      if (pos >= data.length) fail("truncated stream")
      val v = data(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def take(n: Int): Array[Byte] = {
      if (pos + n > data.length) fail("truncated stream")
      val a = java.util.Arrays.copyOfRange(data, pos, pos + n); pos += n; a
    }
  }
}
