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

  /** Resize every image to the target box; non-images pass through. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int,
      batchSize: Int = 64): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map {
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
