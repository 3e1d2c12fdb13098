package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, FeatureDim}

/** Multimodal plumbing: schema, batch shape, determinism, partitioned
  * layout. The codec is a stub; everything around it is real. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

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
