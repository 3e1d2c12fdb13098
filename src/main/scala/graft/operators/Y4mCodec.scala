package graft.operators

/** REAL video codec: YUV4MPEG2 ("Y4M"), the standard uncompressed video
  * interchange container (the format `ffmpeg -f yuv4mpeg` emits):
  * ASCII stream header with tagged parameters (`W<width> H<height>
  * F<fps-ratio> I<interlace> A<aspect> C<colorspace>`), then one
  * `FRAME` section per frame — optionally carrying its own parameters
  * — followed by raw planar YUV.
  *
  * Completes the multimodal codec triangle: PPM/PNG (image), WAV
  * (audio), Y4M (video) — each a real public-format parse behind the
  * same batched `mapPartitions` decode shape. Scope: C444 (full chroma)
  * and C420/C420jpeg/C420mpeg2 (quarter chroma, the ffmpeg default);
  * unknown tags are SKIPPED per the spec's extension rule, unsupported
  * colorspaces and truncated planes fail loudly (the PpmCodec
  * convention).
  *
  * Everything downstream of the parse is integer plane statistics and
  * frame differencing — exact, engine-portable, hence DuckDB-oracle-able
  * end-to-end (the x_image_decode argument, applied to video).
  */
object Y4mCodec {

  case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])
  case class Video(width: Int, height: Int, c420: Boolean,
      frames: Seq[Frame]) {
    def chromaLen: Int =
      if (c420) (width / 2) * (height / 2) else width * height
  }

  /** Encode as a spec-compliant Y4M payload (25:1 fps, progressive). */
  def encode(video: Video): Array[Byte] = {
    val chroma = if (video.c420) "C420jpeg" else "C444"
    val out = new java.io.ByteArrayOutputStream
    out.write(s"YUV4MPEG2 W${video.width} H${video.height} F25:1 Ip A1:1 $chroma\n"
      .getBytes("US-ASCII"))
    video.frames.foreach { f =>
      require(f.y.length == video.width * video.height,
        s"bad Y plane: ${f.y.length}")
      require(f.u.length == video.chromaLen && f.v.length == video.chromaLen,
        "bad chroma plane")
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(f.y); out.write(f.u); out.write(f.v)
    }
    out.toByteArray
  }

  /** Parse a Y4M payload. Tag-driven header parse (unknown tags
    * skipped), FRAME sections may carry their own parameters (skipped
    * to the newline), plane sizes follow the declared colorspace. */
  def decode(payload: Array[Byte]): Video = {
    var i = 0
    def line(): String = {
      val s = i
      while (i < payload.length && payload(i) != '\n'.toByte) i += 1
      require(i < payload.length, "truncated header line")
      i += 1 // consume the newline
      new String(payload, s, i - 1 - s, "US-ASCII")
    }
    val header = line()
    require(header.startsWith("YUV4MPEG2"), s"not Y4M: '${header.take(12)}'")
    var width = -1; var height = -1; var chroma = "C420jpeg" // spec default
    header.split(' ').drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.head match {
        case 'W' => width = tag.tail.toInt
        case 'H' => height = tag.tail.toInt
        case 'C' => chroma = tag
        case _   => () // F/I/A/X... — valid, irrelevant to the raster
      }
    }
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val c420 = chroma match {
      case "C444" => false
      case "C420" | "C420jpeg" | "C420mpeg2" | "C420paldv" => true
      case other => throw new IllegalArgumentException(
        s"unsupported colorspace $other (codec handles C444/C420*)")
    }
    if (c420) require(width % 2 == 0 && height % 2 == 0,
      s"C420 needs even dimensions, got ${width}x$height")
    val ySize = width * height
    val cSize = if (c420) (width / 2) * (height / 2) else ySize
    val frames = Seq.newBuilder[Frame]
    while (i < payload.length) {
      val fh = line()
      require(fh == "FRAME" || fh.startsWith("FRAME "),
        s"expected FRAME section, got '${fh.take(12)}'")
      require(i + ySize + 2 * cSize <= payload.length,
        s"truncated frame: need ${ySize + 2 * cSize} bytes, have ${payload.length - i}")
      val y = payload.slice(i, i + ySize); i += ySize
      val u = payload.slice(i, i + cSize); i += cSize
      val v = payload.slice(i, i + cSize); i += cSize
      frames += Frame(y, u, v)
    }
    val fs = frames.result()
    require(fs.nonEmpty, "no FRAME sections")
    Video(width, height, c420, fs)
  }

  case class FrameStats(frame: Long, ySum: Long, uSum: Long, vSum: Long,
      motion: Long)

  /** Exact integer per-frame statistics: plane sums plus `motion` =
    * Σ_j |Y_f(j) − Y_{f−1}(j)| — frame differencing, the first real
    * temporal feature every video pipeline computes (scene-cut
    * detection, static-clip filtering). Frame 0 has motion 0 by
    * convention (no predecessor). */
  def frameStats(video: Video): Seq[FrameStats] =
    video.frames.zipWithIndex.map { case (f, idx) =>
      def sum(p: Array[Byte]): Long = {
        var s = 0L; var j = 0
        while (j < p.length) { s += p(j) & 0xff; j += 1 }
        s
      }
      val motion = if (idx == 0) 0L else {
        val prev = video.frames(idx - 1).y
        var s = 0L; var j = 0
        while (j < f.y.length) {
          s += math.abs((f.y(j) & 0xff) - (prev(j) & 0xff)); j += 1
        }
        s
      }
      FrameStats(idx.toLong, sum(f.y), sum(f.u), sum(f.v), motion)
    }
}
