package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DedupIn, StreamingDedup}

/** Streaming first-seen dedup: the survivor set equals the batch
  * min(doc_id) groupBy over every prefix of the stream — through
  * intra-batch duplicates, cross-batch duplicates, and a restart. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("first-seen survivors ≡ the batch dedup of each stream prefix, " +
      "across a restart; later copies never re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("sdedup") + "/owners"
    val ckpt = TestSpark.tempDir("sdedup-ckpt")

    // fingerprints a/b/c; intra-batch duplicate of a (min id 1 wins),
    // cross-batch duplicates of a and b, a new fp after restart
    val waves = Seq(
      Seq(DedupIn(3L, "a"), DedupIn(1L, "a"), DedupIn(2L, "b")),
      Seq(DedupIn(4L, "a"), DedupIn(5L, "c"), DedupIn(6L, "b")),
      Seq(DedupIn(7L, "d"), DedupIn(8L, "c")))
    val input = MemoryStream[DedupIn]
    var seen = Seq.empty[DedupIn]
    waves.foreach { wave =>
      input.addData(wave)
      val q = StreamingDedup.start(input.toDS(), root, ckpt)
      q.awaitTermination(60000)
      seen = seen ++ wave
      val expect = seen.groupBy(_.fp).view
        .mapValues(_.map(_.docId).min).toMap
      val got = StreamingDedup.read(spark, root).collect()
        .map(r => r.getAs[String]("fp") -> r.getAs[Long]("docId")).toMap
      assert(got === expect, s"diverged after ${seen.size} docs")
    }
    // one row per fingerprint, ever — later copies never re-emitted
    val all = StreamingDedup.read(spark, root).collect()
    assert(all.length === 4)
    assert(all.map(_.getAs[Long]("docId")).toSet === Set(1L, 2L, 5L, 7L))
  }

  test("first-arrival contract: a SMALLER id in a later batch is a " +
      "duplicate and never revises the emitted owner") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("sdedup-fa") + "/owners"
    val ckpt = TestSpark.tempDir("sdedup-fa-ckpt")

    val waves = Seq(
      Seq(DedupIn(10L, "x"), DedupIn(20L, "y")),
      // id 2 < 10 for already-seen "x": dropped (first-arrival, not
      // global-min); a fresh fp "z" still wins normally
      Seq(DedupIn(2L, "x"), DedupIn(30L, "z")))
    val input = MemoryStream[DedupIn]
    waves.foreach { wave =>
      input.addData(wave)
      StreamingDedup.start(input.toDS(), root, ckpt).awaitTermination(60000)
    }
    val got = StreamingDedup.read(spark, root).collect()
      .map(r => r.getAs[String]("fp") -> r.getAs[Long]("docId")).toMap
    // owner of "x" is the FIRST batch's min (10), not the global min (2)
    assert(got === Map("x" -> 10L, "y" -> 20L, "z" -> 30L))
    // batch reconciliation is on the fingerprint SET, which matches the
    // batch groupBy exactly even where the owner choice differs
    val batchFps = waves.flatten.map(_.fp).toSet
    assert(got.keySet === batchFps)
  }
}
