package graft.operators

/** REAL audio codec: RIFF/WAVE PCM (the Microsoft/IBM WAVE format,
  * public spec) — little-endian chunked container, `fmt ` descriptor,
  * 16-bit signed PCM samples. The audio face of the multimodal family:
  * [[Multimodal.PpmCodec]] / [[PngCodec]] parse image payloads, this
  * parses audio payloads, and all three run behind the same batched
  * `mapPartitions` decode shape.
  *
  * Decoder scope: PCM (format 1), mono, 16-bit; unknown chunks (LIST,
  * fact, cue, ...) are SKIPPED per the RIFF traversal rule including
  * odd-size pad bytes — real-world WAV files carry metadata chunks and
  * a codec that can't step over them is a toy. Malformed input fails
  * loudly (the PpmCodec convention).
  *
  * Everything downstream of the parse is integer arithmetic (peak /
  * |sum| / zero-crossings / energy over int16 samples), so the DuckDB
  * oracle replays synthesis + features exactly — the x_image_decode
  * argument, applied to audio.
  */
object WavCodec {

  case class Audio(sampleRate: Int, samples: Array[Short])

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono 16-bit PCM as a canonical WAV payload. */
  def encode(audio: Audio): Array[Byte] = {
    val dataLen = audio.samples.length * 2
    val byteRate = audio.sampleRate * 2
    val fmt = le16(1) ++ le16(1) ++ le32(audio.sampleRate) ++
      le32(byteRate) ++ le16(2) ++ le16(16)
    val out = new java.io.ByteArrayOutputStream
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + fmt.length + 8 + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(fmt.length))
    out.write(fmt)
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen))
    audio.samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** Parse a WAV payload. Traverses the chunk list (word-aligned, pad
    * byte after odd-size chunks), requires PCM/mono/16-bit, throws on
    * anything malformed or out of scope. */
  def decode(payload: Array[Byte]): Audio = {
    require(payload.length >= 12, "truncated RIFF header")
    require(tag(payload, 0) == "RIFF", s"not RIFF: '${tag(payload, 0)}'")
    require(tag(payload, 8) == "WAVE", s"not WAVE: '${tag(payload, 8)}'")
    var i = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (i + 8 <= payload.length) {
      val id = tag(payload, i)
      val len = readLe32(payload, i + 4)
      require(len >= 0 && i + 8 + len <= payload.length,
        s"truncated '$id' chunk (len=$len)")
      id match {
        case "fmt " =>
          require(len >= 16, s"short fmt chunk ($len bytes)")
          val format = readLe16(payload, i + 8)
          val channels = readLe16(payload, i + 10)
          sampleRate = readLe32(payload, i + 12)
          val bits = readLe16(payload, i + 22)
          require(format == 1, s"unsupported audio format $format (codec handles PCM)")
          require(channels == 1, s"unsupported channel count $channels (codec handles mono)")
          require(bits == 16, s"unsupported sample width $bits (codec handles 16-bit)")
          require(sampleRate > 0, s"bad sample rate $sampleRate")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          require(len % 2 == 0, s"odd PCM16 data length $len")
          samples = Array.tabulate(len / 2)(k => readLe16(payload, i + 8 + k * 2).toShort)
        case _ => () // LIST / fact / cue / ... — skip per RIFF traversal
      }
      i += 8 + len + (len & 1) // odd-size chunks carry a pad byte
    }
    require(samples != null, "missing data chunk")
    Audio(sampleRate, samples)
  }

  case class Features(nSamples: Long, sampleRate: Int, durationMs: Long,
      peak: Long, sumAbs: Long, zeroCrossings: Long, energy: Long)

  /** Exact integer features over the PCM stream: peak |amplitude|,
    * Σ|s|, strict sign-change count (0 counted non-negative), Σs² —
    * each engine-portable (int16² · n fits a 64-bit long for any
    * real clip length). */
  def features(audio: Audio): Features = {
    var peak = 0L; var sumAbs = 0L; var zc = 0L; var energy = 0L
    var k = 0
    val n = audio.samples.length
    while (k < n) {
      val s = audio.samples(k).toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      energy += s * s
      if (k > 0 && ((s < 0) != (audio.samples(k - 1) < 0))) zc += 1
      k += 1
    }
    Features(n.toLong, audio.sampleRate,
      n.toLong * 1000L / math.max(1, audio.sampleRate),
      peak, sumAbs, zc, energy)
  }
}
