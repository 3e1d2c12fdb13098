package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, FeatureDim, PpmCodec}

/** Multimodal plumbing: schema, batch shape, determinism, partitioned
  * layout — plus the REAL PPM codec (round 8): spec-compliant header
  * parse, exact channel statistics, actual pixel resize. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("PPM codec: encode/decode round-trip, comments and whitespace in the header") {
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 37 % 256).toByte)
    val img = PpmCodec.Image(2, 3, 255, px)
    val back = PpmCodec.decode(PpmCodec.encode(img))
    assert(back.width === 2 && back.height === 3 && back.maxVal === 255)
    assert(back.pixels.toSeq === px.toSeq)
    // a header written by another tool: comments, CRLF-ish whitespace —
    // the spec allows both; raster byte 0 is '#' to prove the comment
    // skip stops at the single post-maxval whitespace byte
    val exotic = ("P6 # magic then comment\n# full comment line\n 2\t3 " +
      "# trailing\n255\n").getBytes("US-ASCII") ++ px
    val ex = PpmCodec.decode(exotic)
    assert(ex.width === 2 && ex.height === 3 && ex.pixels.toSeq === px.toSeq)
    // malformed inputs fail loudly, never return garbage
    intercept[IllegalArgumentException](PpmCodec.decode("P5\n2 3\n255\n".getBytes ++ px))
    intercept[IllegalArgumentException](
      PpmCodec.decode("P6\n2 3\n255\n".getBytes ++ px.take(5))) // truncated raster
  }

  test("PPM channel sums and nearest-neighbor resize match a driver replica") {
    val w = 7; val h = 5
    val px = Array.tabulate(w * h * 3)(i => ((i * 131 + 17) % 256).toByte)
    val img = PpmCodec.Image(w, h, 255, px)
    val (r, g, b) = PpmCodec.channelSums(img)
    def sumCh(c: Int) = px.indices.collect { case i if i % 3 == c => px(i) & 0xff }.map(_.toLong).sum
    assert((r, g, b) === ((sumCh(0), sumCh(1), sumCh(2))))
    val small = PpmCodec.resizeNearest(img, 3, 2)
    assert(small.width === 3 && small.height === 2 && small.pixels.length === 18)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      val sx = x * w / 3; val sy = y * h / 2
      assert(small.pixels((y * 3 + x) * 3 + c) === px((sy * w + sx) * 3 + c),
        s"pixel ($x,$y,$c) not nearest-neighbor sampled")
    }
    // resize is wired through the image path for ppm-format rows
    import spark.implicits._
    val row = Multimodal.MediaRow(1L, "image", PpmCodec.encode(img),
      Multimodal.MediaMeta("ppm", w, h, -1, -1L))
    val resized = Multimodal.resizeImages(Seq(row).toDS(), 3, 2).collect().head
    assert(PpmCodec.decode(resized.payload).pixels.toSeq === small.pixels.toSeq)
  }

  test("x_image_decode equals a driver replica over real PPM payloads; batching invisible") {
    val got = Multimodal.imageDecodeStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val want = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter(_._1 % 3 == 0)
      .map { case (id, text) =>
        val tb = text.getBytes("UTF-8")
        val px = Array.tabulate(16 * 12 * 3)(j =>
          if (tb.isEmpty) 0 else tb(j % tb.length) & 0xff)
        def ch(c: Int) = px.indices.collect { case i if i % 3 == c => px(i).toLong }.sum
        id -> ((16, 12, 192L, ch(0), ch(1), ch(2)))
      }.toMap
    assert(got === want)
    assert(got.nonEmpty)
    val rebatched = Multimodal.imageDecodeStats(spark, dir, batchSize = 3)
      .collect().map(_.toSeq).toSeq
    assert(rebatched === Multimodal.imageDecodeStats(spark, dir).collect().map(_.toSeq).toSeq)
  }

  test("batched feature extraction is deterministic with fixed width") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, batchSize = 7).collect().sortBy(_.media_id)
    assert(f1.nonEmpty)
    assert(f1.forall(_.features.length == FeatureDim))
    // batch size must not change results (pure batching, no state leak)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
  }

  test("resize touches only images and updates metadata") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val resized = Multimodal.resizeImages(media, 64, 48).collect()
    val images = resized.filter(_.kind == "image")
    assert(images.nonEmpty)
    assert(images.forall(m => m.meta.width == 64 && m.meta.height == 48))
    val others = resized.filter(_.kind != "image")
    val origOthers = media.collect().filter(_.kind != "image")
    assert(others.map(_.media_id).sorted.toSeq === origOthers.map(_.media_id).sorted.toSeq)
  }

  test("frame sampling yields n image rows per video") {
    val media = Multimodal.syntheticMedia(spark, dir)
    val nVideos = media.filter(_.kind == "video").count()
    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.count() === nVideos * 4)
    assert(frames.collect().forall(_.kind == "image"))
  }

  test("partitioned write lays out one directory per modality") {
    val out = TestSpark.tempDir("media") + "/t"
    Multimodal.writePartitioned(Multimodal.syntheticMedia(spark, dir), out)
    val kinds = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(kinds === Set("kind=image", "kind=audio", "kind=video"))
    // modality filter prunes to one partition directory at read time
    val images = spark.read.parquet(out).filter(org.apache.spark.sql.functions.col("kind") === "image")
    assert(images.count() > 0)
  }

  test("pruned modality job equals the image slice and prunes at the scan") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.Sf0001
    val pruned = operators.Multimodal.featureStatsPruned(spark, dir)
    val plan = pruned.queryExecution.executedPlan.toString
    // the filter must be INSIDE the PartitionFilters bracket (a bare
    // 'PartitionFilters: [' or a projected 'kind' column would match
    // even with pruning broken)
    assert(plan.contains("PartitionFilters: [isnotnull(kind"),
      "kind filter did not reach PartitionFilters:\n" + plan)
    assert("PartitionFilters: \\[[^\\]]*= image".r.findFirstIn(plan).isDefined,
      "image equality not in PartitionFilters:\n" + plan)
    val full = operators.Multimodal.featureStats(spark, dir)
      .filter(col("kind") === "image").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    val got = pruned.collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === full)
  }

  test("stub codec is deterministic (stands in for a real decoder)") {
    val payload = "hello multimodal".getBytes("UTF-8")
    assert(FakeCodec.features(payload).toSeq === FakeCodec.features(payload).toSeq)
    assert(FakeCodec.frames(payload, 3).size === 3)
  }
}
