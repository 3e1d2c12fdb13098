package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{Compaction, Snapshots}

/** Z-order layout maintenance under append (round 11): streamed batches
  * land UNCLUSTERED, so the tile pruning the layout exists for decays as
  * they accumulate; [[Compaction.compactZOrdered]] (the OPTIMIZE ZORDER
  * cadence) must restore the batch build's skip ratio — measured with
  * the same leaf-metric machinery as ZOrderSpec — without changing a
  * single result row, and the appender must keep appending afterwards. */
class ZOrderCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val base = 1704067200L // 2024-01-01 UTC, epoch seconds

  /** Deterministically scrambled (user, time) events, same recipe as
    * ZOrderSpec: 200 users, ~23-day span, neither column pre-sorted. */
  private def mkEvents(from: Long, n: Long) =
    spark.range(from, from + n).select(
      (col("id") * 7919 % 200).as("user_id"),
      timestamp_seconds(lit(base) + col("id") * 104729 % 2000000).as("ts"),
      col("id").as("event_id"))

  private def scanned(root: String,
      pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(Snapshots.resolve(spark, root)).filter(pred)
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
  }

  test("compactZOrdered restores tile pruning after unclustered appends; results unchanged; ingest continues") {
    val root = TestSpark.tempDir("zorder-compact") + "/events"
    // batch build: 40k rows, 32 z-ordered files (file = tile granularity)
    graft.ops.Layout.writeZOrdered(mkEvents(0, 40000), s"$root/batch=0",
      files = 32)
    // a ~5% time band × 10% user box — the 2-d shape the tiles serve
    val boxPred = col("ts").between(
        timestamp_seconds(lit(base + 400000)),
        timestamp_seconds(lit(base + 500000))) &&
      col("user_id").between(40, 59)
    val clusteredScan = scanned(root, boxPred)
    assert(clusteredScan < 16000,
      s"fresh z layout should prune the box ($clusteredScan of 40000 scanned)")

    // ingest: 3 unclustered appends of 10k rows each (each batch's files
    // span the full (user, time) envelope — the decay under test)
    (1 to 3).foreach(i =>
      Compaction.appendBatch(mkEvents(40000L + (i - 1) * 10000L, 10000L),
        root, i.toLong))
    val decayedScan = scanned(root, boxPred)
    assert(decayedScan > clusteredScan + 20000,
      s"appended unclustered batches should defeat pruning " +
        s"($clusteredScan -> $decayedScan)")
    val before = spark.read.parquet(Snapshots.resolve(spark, root))
      .filter(boxPred).select(col("event_id"), col("user_id"), col("ts"))
      .orderBy(col("event_id")).collect().map(_.toSeq).toSeq

    Compaction.compactZOrdered(spark, root, files = 32)

    // published atomically as gen 1; results identical; pruning restored
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 1L))
    val after = spark.read.parquet(Snapshots.resolve(spark, root))
      .filter(boxPred).select(col("event_id"), col("user_id"), col("ts"))
      .orderBy(col("event_id")).collect().map(_.toSeq).toSeq
    assert(before.nonEmpty && after === before,
      "compaction must not change results")
    val compactedScan = scanned(root, boxPred)
    assert(compactedScan < decayedScan * 6 / 10,
      s"re-clustering must restore row-group skipping " +
        s"($decayedScan -> $compactedScan over 70000 rows)")

    // the appender keeps going: the new batch lands inside the committed
    // generation and is visible through the same resolved read
    Compaction.appendBatch(mkEvents(200000, 100), root, 4L)
    val n = spark.read.parquet(Snapshots.resolve(spark, root)).count()
    assert(n === 70100L, s"post-compaction append must be visible (got $n)")
  }
}
