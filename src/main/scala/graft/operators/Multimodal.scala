package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (driver mandate: treat image/audio/video as
  * opaque binary columns with typed metadata; decode / feature-extract /
  * resize / frame-sample as batched partition-local transforms).
  *
  * The Spark-side contract is real and tested: schema, partitioning,
  * batch shape, write layout. The codec itself is a clearly-marked STUB
  * (`FakeCodec`) — this container has no image/audio libraries, so the
  * stub is a deterministic stand-in with the same signature a JNI/FFI
  * codec (or a Python `mapInPandas` worker) would have.
  *
  * Scale design:
  *  - payloads stay OPAQUE BINARY end-to-end: Spark never interprets
  *    them, so scans project them lazily and shuffles never carry them
  *    unless the user asks;
  *  - decode runs via `mapPartitions` in fixed-size batches — the Scala
  *    analog of `mapInPandas`'s Arrow batches: amortizes codec init
  *    (model load / decoder context) once per batch, not per row;
  *  - feature tables (small, fixed-width) separate from payload tables
  *    (huge): downstream similarity joins touch only features;
  *  - writes partition by `kind` so modality-specific jobs prune files.
  */
object Multimodal {

  /** Typed metadata carried beside every opaque payload. */
  case class MediaMeta(
      format: String,       // e.g. "jpeg" | "wav" | "mp4" (stub values)
      width: Int,           // images/video; -1 otherwise
      height: Int,
      sampleRate: Int,      // audio; -1 otherwise
      durationMs: Long)     // audio/video; -1 otherwise

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String,
      features: Array[Float], n_bytes: Long)

  val FeatureDim = 16

  /** STUB CODEC — deterministic stand-in for a real decoder.
    *
    * A production build replaces this object with JNI bindings (libjpeg /
    * ffmpeg / soundfile) or routes the batch to a Python worker; the
    * call signature (batch in → batch out) and everything around it is
    * the real, tested plumbing. The stub derives values from payload
    * bytes with PORTABLE INTEGER ARITHMETIC ONLY — a polynomial mod-2^64
    * content hash plus a per-dimension linear mix — so any engine with
    * 128-bit integers can replay it exactly: that is what lets the
    * DuckDB oracle gate the end-to-end decode query
    * (x_multimodal_features), the same argument that oracles
    * x_rolling_fingerprint. (An iterated nonlinear mix would be just as
    * deterministic but not SQL-replayable: 64×64-bit wraparound products
    * of two full-width values overflow even HUGEINT.) */
  object FakeCodec {
    /** Polynomial base — shared with [[graft.functions.RollingFingerprint]]
      * so the oracle reuses the same proven powers-table replay. */
    final val P: Long = graft.functions.RollingFingerprint.P
    /** Per-dimension linear-mix constants: 32-bit, so h·A wraps inside
      * 128-bit oracle arithmetic (h < 2^64, A < 2^32 ⇒ product < 2^96). */
    final val MixA: Long = 2654435761L // Knuth's 2^32/φ
    final val MixB: Long = 2246822519L // xxhash PRIME32_2

    /** "Decode" a payload into a FeatureDim-float embedding: content
      * hash h = Σ b_j·P^(n-1-j) (natural 2^64 wrap), dimension i maps
      * h·A + (i+1)·B into [-1, 1) via the top 53 bits. */
    def features(payload: Array[Byte]): Array[Float] = {
      var h = 0L
      payload.foreach(b => h = h * P + (b & 0xffL))
      Array.tabulate(FeatureDim) { i =>
        val v = h * MixA + (i + 1L) * MixB
        ((v >>> 11) * (2.0 / (1L << 53)) - 1.0).toFloat
      }
    }

    /** "Resize" an image payload: deterministic re-encode stub that
      * shrinks the byte budget proportionally to the pixel change. */
    def resize(payload: Array[Byte], w0: Int, h0: Int,
        w1: Int, h1: Int): Array[Byte] = {
      if (payload.isEmpty) return payload
      val ratio = math.max(1e-9, (w1.toDouble * h1) / math.max(1, w0.toLong * h0))
      val n = math.max(4, (payload.length * ratio).toInt)
      Array.tabulate(n)(i => payload(((i.toLong * payload.length) / n).toInt))
    }

    /** "Frame-sample" a video payload into `n` frame payloads. */
    def frames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val span = math.max(1, payload.length / math.max(1, n))
      (0 until n).map(i => payload.slice(i * span,
        math.min(payload.length, i * span + span)))
    }
  }

  /** REAL image codec for binary PPM (P6) — the Netpbm format, public
    * spec: ASCII header (magic, optional `#` comments, width, height,
    * maxval, one whitespace byte) followed by raw RGB sample triples.
    * This is the actual uncompressed-format parse the stub stood in
    * for: spec-compliant header tokenizer, raster bounds checks, real
    * per-pixel channel statistics, and a real nearest-neighbor pixel
    * resize. It runs behind the SAME batched mapPartitions shape as the
    * stub ([[imageDecodeStats]]) — swapping in libjpeg/ffmpeg bindings
    * for compressed formats changes only the body of decode(). */
  object PpmCodec {
    case class Image(width: Int, height: Int, maxVal: Int,
        pixels: Array[Byte])

    def encode(img: Image): Array[Byte] = {
      val header =
        s"P6\n${img.width} ${img.height}\n${img.maxVal}\n".getBytes("US-ASCII")
      header ++ img.pixels
    }

    /** Parse a P6 payload. Throws on malformed input — a corrupt asset
      * must fail loudly at the decode site, where the batch context can
      * route it to a quarantine sink, not propagate NaNs. */
    def decode(payload: Array[Byte]): Image = {
      var i = 0
      def skipWsAndComments(): Unit = {
        var go = true
        while (go && i < payload.length) {
          val c = payload(i).toChar
          if (c == '#') { while (i < payload.length && payload(i) != '\n'.toByte) i += 1 }
          else if (c.isWhitespace) i += 1
          else go = false
        }
      }
      def token(): String = {
        skipWsAndComments()
        val s = i
        while (i < payload.length && !payload(i).toChar.isWhitespace) i += 1
        new String(payload, s, i - s, "US-ASCII")
      }
      val magic = token()
      require(magic == "P6", s"not a binary PPM: magic '$magic'")
      val w = token().toInt
      val h = token().toInt
      val maxVal = token().toInt
      require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
      require(maxVal > 0 && maxVal < 65536, s"bad maxval $maxVal")
      require(maxVal < 256, "16-bit PPM samples not supported by this codec")
      i += 1 // exactly ONE whitespace byte separates header from raster
      val need = w.toLong * h * 3
      require(i + need <= payload.length,
        s"truncated raster: need $need bytes, have ${payload.length - i}")
      Image(w, h, maxVal, payload.slice(i, i + need.toInt))
    }

    /** Per-channel integer sums over the raster (unsigned bytes) —
      * exact statistics, no floating point, hence engine-portable. */
    def channelSums(img: Image): (Long, Long, Long) = {
      var r = 0L; var g = 0L; var b = 0L
      var j = 0
      while (j < img.pixels.length) {
        r += img.pixels(j) & 0xff
        g += img.pixels(j + 1) & 0xff
        b += img.pixels(j + 2) & 0xff
        j += 3
      }
      (r, g, b)
    }

    /** Real nearest-neighbor resize: target pixel (x, y) samples source
      * pixel (x·w0/w1, y·h0/h1) — actual pixel work, unlike the stub's
      * byte-budget shrink. */
    def resizeNearest(img: Image, w1: Int, h1: Int): Image = {
      require(w1 > 0 && h1 > 0, s"bad target ${w1}x$h1")
      val out = new Array[Byte](w1 * h1 * 3)
      var y = 0
      while (y < h1) {
        val sy = (y.toLong * img.height / h1).toInt
        var x = 0
        while (x < w1) {
          val sx = (x.toLong * img.width / w1).toInt
          val s = (sy * img.width + sx) * 3
          val d = (y * w1 + x) * 3
          out(d) = img.pixels(s)
          out(d + 1) = img.pixels(s + 1)
          out(d + 2) = img.pixels(s + 2)
          x += 1
        }
        y += 1
      }
      Image(w1, h1, img.maxVal, out)
    }
  }

  /** Batched partition-local decode: iterate each partition in
    * `batchSize` groups (the Arrow-batch analog), init the codec once per
    * batch, emit fixed-width feature rows. */
  def extractFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be opened here
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind,
            FakeCodec.features(m.payload), m.payload.length.toLong)
        }
      }
    }
  }

  /** Resize every image to the target box; non-images pass through.
    * PPM images take the REAL pixel path (decode → nearest-neighbor →
    * re-encode, [[PpmCodec]]); other image formats fall back to the
    * stub until their codecs are wired the same way. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map {
          case m if m.kind == "image" && m.meta.format == "ppm" =>
            m.copy(
              payload = PpmCodec.encode(
                PpmCodec.resizeNearest(PpmCodec.decode(m.payload), w, h)),
              meta = m.meta.copy(width = w, height = h))
          case m if m.kind == "image" =>
            m.copy(
              payload = FakeCodec.resize(m.payload, m.meta.width, m.meta.height, w, h),
              meta = m.meta.copy(width = w, height = h))
          case m => m
        }
      }
    }
  }

  /** Sample `n` frames from every video into image rows. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      FakeCodec.frames(m.payload, n).zipWithIndex.map { case (f, i) =>
        MediaRow(m.media_id * 1000 + i, "image", f,
          m.meta.copy(format = "frame", durationMs = -1L))
      }
    }
  }

  /** Write a media table partitioned by modality (file-level pruning for
    * modality-specific jobs). */
  def writePartitioned(media: Dataset[MediaRow], dir: String): Unit =
    media.write.partitionBy("kind").mode("overwrite").parquet(dir)


  /** The documents (doc_id, text) source spread across the session's
    * cores BEFORE the per-row synthetic encode + real-codec decode work
    * ([[graft.ops.Spread]], r19): the single-file corpus plans ONE scan
    * split, so the whole encode+decode family ran serially on one core;
    * the gated exchange ships kilobytes of filtered text, and a corpus
    * that already scans wide passes through untouched. Applied ONLY
    * where the measured serial codec work beats the exchange (jpeg
    * gray/progressive/color, y4m video: 0.42-0.77 s -> 0.32-0.39 s
    * warm); the light codecs (ppm, gif, wav, the stub feature pass)
    * were MEASURED as regressions (+0.1-0.46 s: exchange + its AQE
    * stage job > their small serial work) and keep the plain scan —
    * the r18 Spread discipline. */
  private def docsWide(spark: SparkSession, dir: String,
      mod: Int): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    graft.ops.Spread.wide(
      if (mod < 0) base else base.filter(col("doc_id") % 3 === mod),
      col("doc_id"))
  }

  /** Deterministic synthetic media table derived from the documents
    * fixture (no media testdata ships in the container): payload = UTF-8
    * bytes of the text, modality round-robins by doc_id. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = kind match {
          case "image" => MediaMeta("jpeg", 640, 480, -1, -1L)
          case "audio" => MediaMeta("wav", -1, -1, 16000, payload.length * 2L)
          case _       => MediaMeta("mp4", 1280, 720, -1, payload.length * 5L)
        }
        MediaRow(id, kind, payload, meta)
      }
  }

  /** Dimensions of the synthetic PPM corpus — fixed so the oracle can
    * replay the raster generation with literal bounds. */
  private[graft] val PpmW = 16
  private[graft] val PpmH = 12

  /** Deterministic synthetic PPM table: every image-kind document
    * (doc_id % 3 = 0) becomes a REAL binary PPM — 16×12 RGB, raster
    * byte j = text byte (j mod len) (0 for empty text; the fixture is
    * pure ASCII, so DuckDB's ord() replays each byte exactly — the
    * x_rolling_fingerprint argument). Unlike [[syntheticMedia]]'s
    * opaque payloads these parse under the real codec. */
  def syntheticPpmMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val px = Array.tabulate(PpmW * PpmH * 3)(j =>
          if (tb.isEmpty) 0.toByte else tb(j % tb.length))
        MediaRow(id, "image",
          PpmCodec.encode(PpmCodec.Image(PpmW, PpmH, 255, px)),
          MediaMeta("ppm", PpmW, PpmH, -1, -1L))
      }
  }

  /** x_image_decode — REAL-codec decode over the synthetic PPM corpus:
    * batched partition-local parse ([[PpmCodec.decode]] — actual header
    * tokenizer + raster) emitting exact integer per-channel statistics.
    * Everything downstream of the parse is integers, so the DuckDB
    * oracle replays raster generation + channel sums bit-for-bit — the
    * real codec gets a true oracle, not just the stub. */
  def imageDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    syntheticPpmMedia(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be opened here
        batch.iterator.map { m =>
          val img = PpmCodec.decode(m.payload)
          val (r, g, b) = PpmCodec.channelSums(img)
          (m.media_id, img.width, img.height,
            img.width.toLong * img.height, r, g, b)
        }
      }
    }.toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
      .orderBy(col("media_id"))
  }

  /** x_png_decode — REAL COMPRESSED-codec decode: the same deterministic
    * raster as [[syntheticPpmMedia]], but round-tripped through PNG
    * ([[PngCodec]] — zlib deflate + per-scanline predictive filters,
    * cycling the filter type so every unfilter path runs). The decode
    * is a real inflate + filter reversal + CRC verification, and the
    * channel statistics are exact integers — so the x_image_decode
    * oracle argument carries over verbatim: compression round-trips
    * away, DuckDB replays raster generation + channel sums, and the
    * whole compressed codepath is gated end-to-end. */
  def pngDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val px = Array.tabulate(PpmW * PpmH * 3)(j =>
          if (tb.isEmpty) 0.toByte else tb(j % tb.length))
        (id, PngCodec.encode(PpmCodec.Image(PpmW, PpmH, 255, px)))
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec context would be opened here
          batch.iterator.map { case (id, payload) =>
            val img = PngCodec.decode(payload)
            val (r, g, b) = PpmCodec.channelSums(img)
            (id, img.width, img.height, img.width.toLong * img.height, r, g, b)
          }
        }
      }.toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
      .orderBy(col("media_id"))
  }

  /** Dimensions of the synthetic GIF corpus (any size works — LZW is
    * lossless — these are fixed so the oracle replays the raster rule
    * with literal bounds). */
  private[graft] val GifW = 20
  private[graft] val GifH = 14

  /** x_gif_decode — the DICTIONARY-coder rung of the codec family
    * ([[GifCodec]] — GIF89a LZW, variable code width, sub-block
    * framing): palette-indexed like no other codec here, and lossless,
    * so the full parse + LZW machine sits under the DuckDB hash oracle
    * with the PNG argument verbatim — pixel j = text byte (j mod len)
    * through an identity 256-gray palette, statistics are exact
    * integers (`n_colors` = distinct palette indices actually used:
    * the palette-specific statistic). Same batched mapPartitions
    * serving shape as every decoder. */
  def gifDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 2)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val px = Array.tabulate(GifW * GifH)(j =>
          if (tb.isEmpty) 0.toByte else tb(j % tb.length))
        (id, GifCodec.encodeGray(GifCodec.Gray(GifW, GifH, px)))
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val img = GifCodec.decode(payload)
            var s = 0L
            val seen = new Array[Boolean](256)
            img.pixels.foreach { b => s += (b & 0xff); seen(b & 0xff) = true }
            (id, img.width, img.height, img.width.toLong * img.height,
              s, seen.count(identity).toLong)
          }
        }
      }.toDF("media_id", "width", "height", "n_px", "gray_sum", "n_colors")
      .orderBy(col("media_id"))
  }

  /** Dimensions of the synthetic JPEG corpus: multiples of 8 (the DCT
    * block size), 3×2 blocks — fixed so the oracle can replay the
    * block-constant raster rule with literal bounds. */
  private[graft] val JpegW = 24
  private[graft] val JpegH = 16

  /** x_jpeg_decode — REAL TRANSFORM-codec decode: the rung past PNG
    * ([[JpegCodec]] — baseline DCT + Huffman, the format that dominates
    * actual crawl corpora). The synthetic raster is built from CONSTANT
    * 8×8 blocks (block i's value = text byte i mod len, 0 for empty
    * text): a constant block carries only its DC coefficient, which
    * round-trips the lossy pipeline EXACTLY (see [[JpegCodec]]) — so
    * the decode exercises the full real machinery (marker parse, DHT
    * canonical codes, bit unstuffing, DC prediction, EOB, dequantize,
    * IDCT) while the channel statistics stay exact integers that DuckDB
    * replays: pixel (x,y) = byte((y÷8)·3 + (x÷8) mod len), channel sum
    * = 64·Σ block bytes. General-coefficient content (AC paths, ZRL,
    * restarts) is spec-gated in CodecSpec with ImageIO
    * cross-validation, the PNG pattern. */
  def jpegDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val bw = JpegW / 8
    docsWide(spark, dir, 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val g = new Array[Byte](JpegW * JpegH)
        var j = 0
        while (j < g.length) {
          val blockIdx = (j / JpegW / 8) * bw + (j % JpegW) / 8
          g(j) = if (tb.isEmpty) 0 else tb(blockIdx % tb.length)
          j += 1
        }
        (id, JpegCodec.encodeGray(JpegW, JpegH, g))
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec context would be opened here
          batch.iterator.map { case (id, payload) =>
            val img = JpegCodec.decode(payload)
            val (r, g, b) = PpmCodec.channelSums(img)
            (id, img.width, img.height, img.width.toLong * img.height, r, g, b)
          }
        }
      }.toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
      .orderBy(col("media_id"))
  }

  /** x_jpeg_progressive_decode — the PROGRESSIVE rung of the transform
    * codec (T.81 Annex G — the scan structure that dominates real crawl
    * JPEGs): the same constant-block corpus as [[jpegDecodeStats]], but
    * encoded as a four-scan SOF2 file ([[JpegCodec.encodeGrayProgressive]]
    * — DC first with successive approximation Al=1, two spectral AC
    * bands with EOB-run coding, DC refinement) and decoded through the
    * multi-scan coefficient-accumulation machine. Constant blocks make
    * every scan exact: the DC point transform is an arithmetic shift
    * whose dropped bit the refinement scan restores, and the AC bands
    * are pure EOB runs — so the raster equals the sequential one and
    * the SAME channel-sum formula replays in DuckDB. The oracle's hash
    * equality against an INDEPENDENT derivation (not against
    * x_jpeg_decode's output) is what gates the progressive machinery;
    * general-coefficient progressive content (SA on AC, refinement
    * correction bits, ImageIO's standard progression script both
    * directions) is spec-gated in CodecSpec. */
  def jpegProgressiveDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val bw = JpegW / 8
    docsWide(spark, dir, 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val g = new Array[Byte](JpegW * JpegH)
        var j = 0
        while (j < g.length) {
          val blockIdx = (j / JpegW / 8) * bw + (j % JpegW) / 8
          g(j) = if (tb.isEmpty) 0 else tb(blockIdx % tb.length)
          j += 1
        }
        (id, JpegCodec.encodeGrayProgressive(JpegW, JpegH, g))
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec context would be opened here
          batch.iterator.map { case (id, payload) =>
            val img = JpegCodec.decode(payload)
            val (r, g, b) = PpmCodec.channelSums(img)
            (id, img.width, img.height, img.width.toLong * img.height, r, g, b)
          }
        }
      }.toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
      .orderBy(col("media_id"))
  }

  /** Dimensions of the synthetic COLOR JPEG corpus: one 32×16 frame =
    * 2×1 MCUs at 4:2:0 (4×2 luma blocks, 2×1 chroma blocks in the
    * 16×8 subsampled planes) — fixed so the oracle replays with
    * literal bounds. */
  private[graft] val JpegCW = 32
  private[graft] val JpegCH = 16

  /** x_jpeg_color_decode — the color rung of the transform codec:
    * 3-component YCbCr baseline JPEG at 4:2:0 ([[JpegCodec.encodeYcc]]
    * / [[JpegCodec.decode]] — interleaved MCUs, subsampled chroma,
    * per-component Huffman tables and DC predictors, JFIF fixed-point
    * inverse color transform). The synthetic planes are CONSTANT 8×8
    * blocks built from doc text bytes (Y cell j = byte(j mod n) over a
    * 4×2 grid; chroma cell c = bytes((8+c) mod n)/((10+c) mod n) over
    * the 2×1 subsampled grid), so every component is DC-only and
    * round-trips the lossy pipeline EXACTLY; replication upsampling is
    * exact on the subsampling grid; and the YCbCr→RGB conversion runs
    * on a decimal fixed-point grid (scale 10⁶, round-half-up) that
    * DuckDB replays bit-for-bit — the full color machinery sits under
    * a hash oracle. General-coefficient color content (AC paths,
    * restarts, 4:2:2, ImageIO cross-validation both directions) is
    * spec-gated in CodecSpec. */
  def jpegColorDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    val w = JpegCW; val h = JpegCH
    docsWide(spark, dir, 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        def b(i: Int): Byte = if (tb.isEmpty) 0 else tb(i % tb.length)
        val yP = Array.tabulate(w * h) { j =>
          val cell = (j / w / 8) * 4 + (j % w) / 8
          b(cell)
        }
        val cw = w / 2; val ch = h / 2
        val cbP = Array.tabulate(cw * ch)(j => b(8 + (j % cw) / 8))
        val crP = Array.tabulate(cw * ch)(j => b(10 + (j % cw) / 8))
        (id, JpegCodec.encodeYcc(w, h, yP, cbP, crP, 2, 2))
      }
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec context would be opened here
          batch.iterator.map { case (id, payload) =>
            val img = JpegCodec.decode(payload)
            val (r, g, b) = PpmCodec.channelSums(img)
            (id, img.width, img.height, img.width.toLong * img.height, r, g, b)
          }
        }
      }.toDF("media_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")
      .orderBy(col("media_id"))
  }

  /** PCM synthesis constants for the audio corpus — fixed so the oracle
    * replays sample generation with literal bounds: 160 samples at
    * 8 kHz (a 20 ms clip per doc), sample k =
    * ((b(k mod len)·251 + k·17) mod 65536) − 32768 over the doc's
    * ASCII bytes (0 for empty text). Pure small-integer arithmetic. */
  private[graft] val WavN = 160
  private[graft] val WavRate = 8000

  /** Deterministic synthetic WAV table: every audio-kind document
    * (doc_id % 3 = 1) becomes a REAL RIFF/WAVE PCM16 payload under the
    * synthesis rule above. These parse under the real codec
    * ([[WavCodec.decode]]) — header traversal, fmt validation, sample
    * extraction. */
  def syntheticWavMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") % 3 === 1)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val samples = Array.tabulate(WavN) { k =>
          val b = if (tb.isEmpty) 0 else tb(k % tb.length) & 0xff
          (((b * 251 + k * 17) % 65536) - 32768).toShort
        }
        val payload = WavCodec.encode(WavCodec.Audio(WavRate, samples))
        MediaRow(id, "audio", payload,
          MediaMeta("wav", -1, -1, WavRate, WavN * 1000L / WavRate))
      }
  }

  /** x_audio_decode — REAL-codec audio decode over the synthetic WAV
    * corpus: batched partition-local RIFF parse emitting exact integer
    * PCM features (peak, Σ|s|, zero-crossings, Σs²). Same oracle
    * argument as the image codecs: synthesis and features are integer
    * arithmetic, so DuckDB replays both around the parse. */
  def audioDecodeStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    syntheticWavMedia(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be opened here
        batch.iterator.map { m =>
          val audio = WavCodec.decode(m.payload)
          val f = WavCodec.features(audio)
          (m.media_id, f.nSamples, f.sampleRate, f.durationMs,
            f.peak, f.sumAbs, f.zeroCrossings, f.energy)
        }
      }
    }.toDF("media_id", "n_samples", "sample_rate", "duration_ms",
        "peak", "sum_abs", "zero_crossings", "energy")
      .orderBy(col("media_id"))
  }

  /** Samples per analysis frame of [[audioFrameStats]] — 40 samples at
    * 8 kHz = 5 ms frames, 4 frames per synthetic clip. */
  private[graft] val WavFrame = 40

  /** x_audio_frames — frame-windowed audio features: split each decoded
    * PCM stream into fixed-length analysis frames and emit per-frame
    * integer statistics (peak, Σ|s|, in-frame zero-crossings, Σs²) —
    * the windowing step every audio featurizer (MFCC, VAD, loudness)
    * runs between decode and model, and the audio analog of the video
    * frame-sample operator. Frame boundaries RESET the zero-crossing
    * predecessor (frames must be independently computable, or a
    * distributed featurizer couldn't process them in isolation).
    * One decode per clip fans out to nFrames rows — a Generate, no
    * shuffle; ordering/oracle argument as [[audioDecodeStats]]. */
  def audioFrameStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    syntheticWavMedia(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be opened here
        batch.iterator.flatMap { m =>
          val audio = WavCodec.decode(m.payload)
          audio.samples.grouped(WavFrame).zipWithIndex.map { case (fr, i) =>
            val f = WavCodec.features(WavCodec.Audio(audio.sampleRate, fr))
            (m.media_id, i.toLong, f.peak, f.sumAbs, f.zeroCrossings, f.energy)
          }
        }
      }
    }.toDF("media_id", "frame", "peak", "sum_abs", "zero_crossings", "energy")
      .orderBy(col("media_id"), col("frame"))
  }

  /** Dimensions of the synthetic Y4M corpus — fixed so the oracle can
    * replay plane generation with literal bounds: 8×6 C444, 3 frames,
    * plane byte rules over the doc's ASCII bytes (0 for empty text):
    * Y(f, j) = b((f·48 + j) mod n), U offsets by 7, V by 13. */
  private[graft] val VidW = 8
  private[graft] val VidH = 6
  private[graft] val VidFrames = 3

  /** Deterministic synthetic Y4M table: every video-kind document
    * (doc_id % 3 = 2) becomes a REAL YUV4MPEG2 stream under the rule
    * above — these parse under the real codec ([[Y4mCodec.decode]]):
    * tagged header, FRAME traversal, planar reads. */
  def syntheticY4mMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    val px = VidW * VidH
    docsWide(spark, dir, 2)
      .as[(Long, String)]
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        def b(k: Int): Byte = if (tb.isEmpty) 0 else tb(k % tb.length)
        val frames = (0 until VidFrames).map { f =>
          Y4mCodec.Frame(
            Array.tabulate(px)(j => b(f * px + j)),
            Array.tabulate(px)(j => b(f * px + j + 7)),
            Array.tabulate(px)(j => b(f * px + j + 13)))
        }
        val payload = Y4mCodec.encode(
          Y4mCodec.Video(VidW, VidH, c420 = false, frames))
        MediaRow(id, "video", payload,
          MediaMeta("y4m", VidW, VidH, -1, VidFrames * 40L))
      }
  }

  /** x_video_frames — REAL-codec video decode over the synthetic Y4M
    * corpus: batched partition-local container parse emitting exact
    * per-frame integer plane sums plus FRAME DIFFERENCING (Σ|Y_f −
    * Y_{f−1}|) — the temporal feature behind scene-cut detection and
    * static-clip filtering. One decode fans out to nFrames rows (a
    * Generate, no shuffle); same oracle argument as the image/audio
    * codecs. */
  def videoFrameStats(spark: SparkSession, dir: String,
      batchSize: Int = 64): DataFrame = {
    import spark.implicits._
    syntheticY4mMedia(spark, dir).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch codec context would be opened here
        batch.iterator.flatMap { m =>
          val video = Y4mCodec.decode(m.payload)
          Y4mCodec.frameStats(video).map(s =>
            (m.media_id, s.frame, s.ySum, s.uSum, s.vSum, s.motion))
        }
      }
    }.toDF("media_id", "frame", "y_sum", "u_sum", "v_sum", "motion")
      .orderBy(col("media_id"), col("frame"))
  }

  /** x_multimodal_features — the end-to-end feature-extraction query
    * (synthetic media → batched decode → per-modality feature stats).
    * DuckDB-oracled since round 7: the synthetic payloads are the
    * documents' UTF-8 bytes (the x_media_dedup argument) and the stub
    * codec is portable integer arithmetic ([[FakeCodec.features]]), so
    * the oracle replays the decode in HUGEINT mod-2^64 SQL; the
    * scalatest batching/determinism specs stay. */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    featureProjection(extractFeatures(syntheticMedia(spark, dir)))

  /** The shared output shape of the feature queries (full and pruned must
    * stay comparable row-for-row). f0 is exposed in integer MICRO-UNITS
    * (floor(f·1e6 + 0.5), the DetMath half-up convention): the float
    * itself is IEEE-deterministic, but an integer column is immune to
    * engine round()-tie differences in the gate's hash compare. */
  private def featureProjection(feats: Dataset[MediaFeatures]): DataFrame =
    feats.toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        floor(element_at(col("features"), 1).cast(DoubleType) * lit(1e6)
          + lit(0.5)).cast(LongType).as("f0_micro"))
      .orderBy(col("media_id"))

  /** Materialized kind-partitioned media layout for one sf dir, freshness-
    * gated like the ANN/IVF indexes. At 100 TB this write is the one-time
    * organization that lets every modality-specific job skip the other
    * modalities' files entirely. */
  def ensureMediaLayout(spark: SparkSession, dir: String): String = {
    val path = graft.ops.Layout.indexPath("media", dir)
    val sig = graft.ops.Layout.dataSig(s"$dir/documents.parquet")
    graft.ops.Layout.ensureSigGated(path, sig) {
      writePartitioned(syntheticMedia(spark, dir), path)
    }
  }

  /** x_multimodal_pruned — a modality-specific job over the partitioned
    * layout: image-only feature stats where the scan opens ONLY the
    * image partition (PartitionFilters, asserted in MultimodalSpec) —
    * the other two-thirds of the payload bytes are never read. Results
    * equal the image slice of [[featureStats]] (scalatest). */
  def featureStatsPruned(spark: SparkSession, dir: String,
      kind: String = "image"): DataFrame = {
    import spark.implicits._
    val path = ensureMediaLayout(spark, dir)
    // partitioned read: `kind` comes back as a partition column; restore
    // the MediaRow field order for the typed decode
    val media = spark.read.parquet(path)
      .filter(col("kind") === kind)
      .select(col("media_id"), col("kind"), col("payload"), col("meta"))
      .as[MediaRow]
    featureProjection(extractFeatures(media))
  }

  /** x_media_dedup — exact dedup of OPAQUE BINARY payloads over the
    * materialized media layout: group on md5(payload) per modality, keep
    * the smallest media_id as canonical. The binary face of
    * x_fingerprint_dedup — the shuffle carries a 16-byte digest per
    * asset, never the payload bytes (at 100 TB of media that is the
    * entire ballgame). Oracle-able because the synthetic payloads are
    * the documents' UTF-8 bytes, so md5(payload) ≡ DuckDB md5(text). */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureMediaLayout(spark, dir)
    spark.read.parquet(path)
      .groupBy(col("kind"), md5(col("payload")).as("fp"))
      .agg(min(col("media_id")).as("media_id"),
        count(lit(1)).as("n_copies"))
      .select(col("media_id"), col("kind"), col("fp"), col("n_copies"))
      .orderBy(col("media_id"))
  }
}
