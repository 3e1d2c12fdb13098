package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MergeTable, Snapshots}

/** `graft-merge` — the lake table as a Structured Streaming sink:
  * streamed change batches ≡ the API merge replay, micro-batch replays
  * refused through the same manifest fences every commit path carries,
  * mode map (cow/mor/auto/occ) dispatching to the right merge face,
  * and loud refusals for every misuse at `.start()` time. */
class MergeTableSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshWork(tag: String): String =
    TestSpark.tempDir(s"graft-sink-$tag")

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  private def stateOf(root: String): Map[Long, (Long, String)] =
    MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  private def changesDf(rows: (String, Long, Long, Long, String)*): DataFrame =
    rows.toSeq.toDF("op", "seq", "k", "v", "tag")

  private def mkSink(root: String, opts: (String, String)*) =
    new graft.sources.MergeTableSink().createSink(spark.sqlContext,
      Map("path" -> root) ++ opts.toMap, Seq.empty, OutputMode.Append())

  test("writeStream.format(graft-merge): streamed change batches land " +
    "exactly-once and the end state ≡ the API merge replay") {
    val work = freshWork("e2e")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(40), "k", nFiles = 3,
      commitTsMillis = 10L)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Long, String)]
    val q = input.toDF().toDF("op", "seq", "k", "v", "tag")
      .writeStream.format("graft-merge")
      .option("path", root)
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    try {
      input.addData(("u", 1L, 7L, 700L, "w1"), ("c", 1L, 100L, 1L, "w1"))
      q.processAllAvailable()
      input.addData(("d", 1L, 3L, 0L, ""), ("u", 1L, 100L, 2L, "w2"))
      q.processAllAvailable()
    } finally q.stop()
    // replay the same two windows through the API on a twin table
    val twin = s"$work/twin"
    MergeTable.create(spark, twin, baseDf(40), "k", nFiles = 3,
      commitTsMillis = 10L)
    MergeTable.merge(spark, twin,
      changesDf(("u", 1L, 7L, 700L, "w1"), ("c", 1L, 100L, 1L, "w1")), "k")
    MergeTable.merge(spark, twin,
      changesDf(("d", 1L, 3L, 0L, ""), ("u", 1L, 100L, 2L, "w2")), "k")
    assert(stateOf(root) === stateOf(twin))
    // an idle drain commits nothing (empty batches are dropped before
    // they can mint an empty generation)
    val gens = Snapshots.generations(spark, root).size
    val q2 = input.toDF().toDF("op", "seq", "k", "v", "tag")
      .writeStream.format("graft-merge")
      .option("path", root)
      .option("checkpointLocation", s"$work/ckpt")
      .start()
    try q2.processAllAvailable() finally q2.stop()
    assert(Snapshots.generations(spark, root).size === gens)
  }

  test("the #batch= fence refuses a replayed micro-batch id on every " +
    "single-writer mode — end state identical after the replay") {
    for (mode <- Seq("cow", "mor", "auto")) {
      val root = s"${freshWork(s"fence-$mode")}/t"
      MergeTable.create(spark, root, baseDf(30), "k", nFiles = 3,
        commitTsMillis = 10L)
      val sink = mkSink(root, "mode" -> mode)
      sink.addBatch(0, changesDf(("u", 1L, 5L, 500L, "b0")))
      val after0 = stateOf(root)
      val gens0 = Snapshots.generations(spark, root).size
      // a crash-restart re-offers batch 0: refused, nothing committed
      sink.addBatch(0, changesDf(("u", 1L, 5L, 999L, "ghost")))
      assert(stateOf(root) === after0, s"mode=$mode replay applied")
      assert(Snapshots.generations(spark, root).size === gens0,
        s"mode=$mode replay minted a generation")
      // the NEXT batch applies
      sink.addBatch(1, changesDf(("d", 1L, 2L, 0L, "")))
      assert(!stateOf(root).contains(2L), s"mode=$mode batch 1 dropped")
      assert(stateOf(root)(5L) === ((500L, "b0")), s"mode=$mode state")
    }
  }

  test("mode=mor writes trickle deletes as DV sidecars; mode=auto " +
    "prices the batch (trickle → MOR, bulk rewrite → COW)") {
    val rootM = s"${freshWork("mor")}/t"
    MergeTable.create(spark, rootM, baseDf(50), "k", nFiles = 2,
      commitTsMillis = 10L)
    mkSink(rootM, "mode" -> "mor")
      .addBatch(0, changesDf(("d", 1L, 4L, 0L, "")))
    assert(MergeTable.currentMeta(spark, rootM).dvs.nonEmpty,
      "mor delete should land as a deletion vector")
    assert(!stateOf(rootM).contains(4L))

    val rootA = s"${freshWork("auto")}/t"
    MergeTable.create(spark, rootA, baseDf(50), "k", nFiles = 2,
      commitTsMillis = 10L)
    val auto = mkSink(rootA, "mode" -> "auto")
    // one changed key in a 25-row file: amplification ≫ 8 → MOR
    auto.addBatch(0, changesDf(("u", 1L, 6L, 600L, "trickle")))
    assert(MergeTable.currentMeta(spark, rootA).dvs.nonEmpty,
      "trickle batch should dispatch MOR")
    // bulk: most keys change → COW rewrite (no NEW dv beyond carried)
    val bulk = (0L until 50L).filter(_ % 2 == 0)
      .map(k => ("u", 1L, k, k * 100L, "bulk"))
    auto.addBatch(1, changesDf(bulk: _*))
    val st = stateOf(rootA)
    assert(st(6L) === ((600L, "bulk")) || st(6L) === ((600L, "trickle")))
    assert(st(8L) === ((800L, "bulk")))
    assert(st(7L) === ((70L, "base")))
  }

  test("mode=occ: two streams, one table — independent #sbatch fences, " +
    "interleaved commits, each stream's replay refused") {
    val root = s"${freshWork("occ")}/t"
    MergeTable.create(spark, root, baseDf(30), "k", nFiles = 3,
      commitTsMillis = 10L)
    val a = mkSink(root, "mode" -> "occ", "streamId" -> "pipe-a")
    val b = mkSink(root, "mode" -> "occ", "streamId" -> "pipe-b")
    a.addBatch(0, changesDf(("u", 1L, 1L, 111L, "a0")))
    b.addBatch(0, changesDf(("u", 1L, 2L, 222L, "b0")))
    a.addBatch(1, changesDf(("c", 1L, 100L, 1L, "a1")))
    // replays of BOTH streams' batch 0, after the other's commits
    val before = stateOf(root)
    a.addBatch(0, changesDf(("u", 1L, 1L, 999L, "ghost")))
    b.addBatch(0, changesDf(("u", 1L, 2L, 999L, "ghost")))
    assert(stateOf(root) === before)
    assert(before(1L) === ((111L, "a0")) && before(2L) === ((222L, "b0")))
    assert(before(100L) === ((1L, "a1")))
  }

  test("mode=occ-mor / occ-auto: the optimistic work phase stages " +
    "merge-on-read — trickle batches append DV sidecars, fences still " +
    "refuse replays") {
    val root = s"${freshWork("occmor")}/t"
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    val a = mkSink(root, "mode" -> "occ-mor", "streamId" -> "trickle-a")
    val b = mkSink(root, "mode" -> "occ-auto", "streamId" -> "auto-b")
    // a trickle batch through occ-mor: DV sidecar lands, nothing rewritten
    val filesBefore = MergeTable.currentManifest(spark, root).map(_.name).toSet
    a.addBatch(0, changesDf(("u", 1L, 5L, 555L, "a0"),
      ("u", 1L, 3005L, 777L, "a0")))
    val m1 = MergeTable.genMeta(spark,
      Snapshots.genDir(root, Snapshots.currentGen(spark, root).get))
    assert(m1.dvs.nonEmpty, "occ-mor batch must land as a DV sidecar")
    assert(filesBefore.subsetOf(m1.entries.map(_.name).toSet),
      "occ-mor must carry every pre-existing file by reference")
    // occ-auto prices per batch: a sparse trickle also goes MOR
    b.addBatch(0, changesDf(("u", 1L, 7L, 700L, "b0"),
      ("u", 1L, 2007L, 707L, "b0")))
    val m2 = MergeTable.genMeta(spark,
      Snapshots.genDir(root, Snapshots.currentGen(spark, root).get))
    assert(m2.dvs.size > m1.dvs.size,
      "occ-auto must price a sparse trickle as MOR")
    // replays refused per stream
    val before = stateOf(root)
    a.addBatch(0, changesDf(("u", 1L, 5L, 999L, "ghost")))
    b.addBatch(0, changesDf(("u", 1L, 7L, 999L, "ghost")))
    assert(stateOf(root) === before)
    assert(before(5L) === ((555L, "a0")) && before(3005L) === ((777L, "a0")))
    assert(before(7L) === ((700L, "b0")) && before(2007L) === ((707L, "b0")))
    // occ modes require a streamId, same as plain occ
    intercept[IllegalArgumentException] {
      mkSink(root, "mode" -> "occ-auto")
    }
  }

  test("refusals are loud at .start()/createSink time: missing path, " +
    "unknown mode, occ without streamId, streamId off occ, Complete " +
    "mode, partitionBy, and a root that is not a table") {
    val root = s"${freshWork("refuse")}/t"
    MergeTable.create(spark, root, baseDf(10), "k", commitTsMillis = 10L)
    def mk(opts: Map[String, String], parts: Seq[String] = Nil,
        om: OutputMode = OutputMode.Append()) =
      new graft.sources.MergeTableSink().createSink(spark.sqlContext,
        opts, parts, om)
    assert(intercept[IllegalArgumentException] { mk(Map.empty) }
      .getMessage.contains("path"))
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root, "mode" -> "upsert")) }
      .getMessage.contains("unknown mode"))
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root, "mode" -> "occ")) }
      .getMessage.contains("streamId"))
    // an EMPTY streamId would silently share one fence across pipelines
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root, "mode" -> "occ", "streamId" -> " ")) }
      .getMessage.contains("streamId"))
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root, "mode" -> "mor", "streamId" -> "s")) }
      .getMessage.contains("occ"))
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root), om = OutputMode.Complete()) }
      .getMessage.contains("Complete"))
    assert(intercept[IllegalArgumentException] {
      mk(Map("path" -> root), parts = Seq("k")) }
      .getMessage.contains("partitionBy"))
    // a misspelled root kills .start(), not the first micro-batch
    intercept[Exception] { mk(Map("path" -> s"$root-nope")) }
    // .option("table", name): a REGISTERED bare name resolves to the
    // root (the SQL registry's spelling); an unregistered one refuses
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "sink_t", root)
    val byName = mk(Map("table" -> "sink_t"))
    byName.addBatch(0, changesDf(("u", 1L, 5L, 555L, "byname")))
    assert(MergeTable.read(spark, root).where(col("k") === 5L)
      .collect().head.getLong(1) === 555L)
    assert(intercept[IllegalArgumentException] {
      mk(Map("table" -> "sink_nope")) }
      .getMessage.contains("not a registered merge table"))
  }
}
