package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.StagedFiles
import graft.pipeline.Pipelines

/** A10/A11/A13/A14/A15: staged NDJSON files, empty-batch markers,
  * exactly-once load under crash-retry, suffix strictness, retention. */
class StagedFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDirs() = {
    val root = TestSpark.tempDir("stage")
    (root + "/stage", root + "/warehouse")
  }

  private def mkBatch(rows: Seq[(String, String, java.sql.Timestamp)]) = {
    import spark.implicits._
    rows.toDF("key", "record", "ts")
  }

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  test("data batch → timestamped NDJSON; empty batch → txt marker (A10)") {
    val (stage, _) = freshDirs()
    val p1 = StagedFiles.stageBatch(spark,
      mkBatch(Seq(("k1", """{"v":1}""", ts(1)))), stage, 0L,
      Instant.parse("2026-01-01T00:00:00Z"))
    val p2 = StagedFiles.stageBatch(spark,
      mkBatch(Seq.empty), stage, 1L, Instant.parse("2026-01-01T00:05:00Z"))
    assert(p1.getName.startsWith("2026-01-01T00-00-00Z__"))
    assert(p1.getName.endsWith("__0__inserted_or_modified_records.json"))
    assert(p2.getName.endsWith("__1__no_inserted_or_modified_records.txt"))
    // lexicographic name order == batch time order (reference key design)
    assert(p1.getName < p2.getName)
  }

  test("load appends data files, skips markers, archives both (A13/A14)") {
    val (stage, wh) = freshDirs()
    StagedFiles.stageBatch(spark, mkBatch(Seq(
      ("k1", """{"v":1}""", ts(1)), ("k2", """{"v":2}""", ts(2)))), stage, 0L,
      Instant.parse("2026-01-01T00:00:00Z"))
    StagedFiles.stageBatch(spark, mkBatch(Seq.empty), stage, 1L,
      Instant.parse("2026-01-01T00:05:00Z"))
    val n = StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema)
    assert(n === 1)
    assert(spark.read.parquet(wh).count() === 2)
    assert(StagedFiles.listUnprocessed(spark, stage).isEmpty)
    // second tick: nothing to do
    assert(StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema) === 0)
    assert(spark.read.parquet(wh).count() === 2)
  }

  test("crash between load and move does NOT double-load on retry (closes the reference's at-least-once gap)") {
    val (stage, wh) = freshDirs()
    StagedFiles.stageBatch(spark, mkBatch(Seq(("k1", """{"v":1}""", ts(1)))),
      stage, 0L, Instant.parse("2026-01-01T00:00:00Z"))
    intercept[RuntimeException] {
      StagedFiles.loadUnprocessed(spark, stage, wh,
        Pipelines.TradeWarehouseSchema, crashBeforeMove = true)
    }
    // file still in unprocessed/, but manifest committed
    assert(StagedFiles.listUnprocessed(spark, stage).size === 1)
    assert(spark.read.parquet(wh).count() === 1)
    // retry: must move without re-appending
    val n = StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema)
    assert(n === 0)
    assert(spark.read.parquet(wh).count() === 1)
    assert(StagedFiles.listUnprocessed(spark, stage).isEmpty)
  }

  test("re-staging the same batchId at a later wall-clock is a no-op (foreachBatch replay)") {
    val (stage, wh) = freshDirs()
    val p1 = StagedFiles.stageBatch(spark, mkBatch(Seq(("k1", """{"v":1}""", ts(1)))),
      stage, 7L, Instant.parse("2026-01-01T00:00:00Z"))
    // replay of batch 7 after a crash: different timestamp, same batchId
    val p2 = StagedFiles.stageBatch(spark, mkBatch(Seq(("k1", """{"v":1}""", ts(1)))),
      stage, 7L, Instant.parse("2026-01-01T00:03:21Z"))
    assert(p1.getName === p2.getName) // same artifact (scheme prefix may differ)
    assert(StagedFiles.listUnprocessed(spark, stage).size === 1)
    // also idempotent after the file was loaded and archived
    StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema)
    val p3 = StagedFiles.stageBatch(spark, mkBatch(Seq(("k1", """{"v":1}""", ts(1)))),
      stage, 7L, Instant.parse("2026-01-01T00:09:00Z"))
    assert(p3.getName === p1.getName)
    assert(StagedFiles.listUnprocessed(spark, stage).isEmpty)
    assert(spark.read.parquet(wh).count() === 1)
  }

  test("unknown staged-file suffix raises (handler strictness)") {
    val (stage, wh) = freshDirs()
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val bad = new org.apache.hadoop.fs.Path(
      s"$stage/${StagedFiles.UnprocessedDir}/2026-01-01T00-00-00Z__x__0__garbage.csv")
    fs.mkdirs(bad.getParent)
    fs.create(bad, true).close()
    val e = intercept[IllegalArgumentException](
      StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema))
    assert(e.getMessage.contains("Unexpected file suffix"))
  }

  test("retention sweep expires old processed files (A15)") {
    val (stage, wh) = freshDirs()
    StagedFiles.stageBatch(spark, mkBatch(Seq(("k1", """{"v":1}""", ts(1)))),
      stage, 0L, Instant.parse("2026-01-01T00:00:00Z"))
    StagedFiles.loadUnprocessed(spark, stage, wh, Pipelines.TradeWarehouseSchema)
    assert(StagedFiles.expireProcessed(spark, stage, olderThanMs = 0,
      nowMs = System.currentTimeMillis() + 100000) === 1)
    assert(StagedFiles.expireProcessed(spark, stage, olderThanMs = 0,
      nowMs = System.currentTimeMillis() + 100000) === 0)
  }
}
