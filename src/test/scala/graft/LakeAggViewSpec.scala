package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ChangeFeed, LakeAggView, MergeTable, Snapshots}

/** The lake table's aggregate view as ONE maintenance unit: after every
  * refresh the view equals the batch aggregate of the table's committed
  * state — through COW merges, MOR deletes, a table compaction (feed-
  * invisible), a view compaction, and a crash-replayed window. */
class LakeAggViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirs(tag: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-lav-$tag").toFile
    d.deleteOnExit()
    (new java.io.File(d, "table").getAbsolutePath,
      new java.io.File(d, "view").getAbsolutePath)
  }

  private def viewRows(viewRoot: String): Map[Any, (Long, Long, Long, Long)] =
    LakeAggView.read(spark, viewRoot).collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap

  private def truthRows(tableRoot: String): Map[Any, (Long, Long, Long, Long)] =
    LakeAggView.batchAggregate(spark, tableRoot, "grp", "v").collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap

  test("view ≡ batch aggregate after every drain; table compaction is " +
      "invisible; view compaction and crash-replay change nothing") {
    val (table, view) = dirs("main")
    MergeTable.create(spark, table,
      spark.range(60).select(col("id").as("k"), (col("id") % 5).as("grp"),
        (col("id") * 10).as("v")),
      "k", nFiles = 3, commitTsMillis = 10L)

    // backfill window
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1)
    assert(viewRows(view) === truthRows(table))

    // COW merge: updates move values between (group, value) cells,
    // a delete retracts, an insert lands a new key
    MergeTable.merge(spark, table,
      Seq(("u", 1L, 7L, 7L % 5, 7777L), ("d", 1L, 12L, 0L, 0L),
        ("c", 1L, 100L, 100L % 5, 555L))
        .toDF("op", "seq", "k", "grp", "v"),
      "k", nFiles = 1, commitTsMillis = 20L)
    // MOR wave: a DV delete + an append, no rewrite
    MergeTable.mergeMor(spark, table,
      Seq(("d", 1L, 3L, 0L, 0L), ("c", 1L, 101L, 1L, 42L))
        .toDF("op", "seq", "k", "grp", "v"),
      "k", commitTsMillis = 30L)
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 2,
      "two committed generations = two windows")
    assert(viewRows(view) === truthRows(table))

    // a MIN retraction the runner-up must answer: delete group 0's
    // minimum row (k=0, v=0)
    MergeTable.deleteWhere(spark, table, col("k") === 0L,
      commitTsMillis = 40L)
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1)
    val after = viewRows(view)
    assert(after === truthRows(table))
    assert(after(0L)._3 > 0L, "group 0's min must move to the runner-up")

    // table compaction: invisible to the feed — the window drains but
    // carries zero net change
    MergeTable.compact(spark, table, nFiles = 2, commitTsMillis = 50L)
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1,
      "a compact-only window drains (and must carry zero net change)")
    assert(viewRows(view) === truthRows(table))

    // crash-replay BEFORE any view compaction: rewind the cursor one
    // generation and re-drain — the epoch-keyed append overwrites the
    // same window with the same bytes, view unchanged
    def rewindCursor(): Unit = {
      val cur = ChangeFeed.cursor(spark, table, "agg-view").get
      val gens = Snapshots.generations(spark, table).sorted
      val prev = gens(gens.indexOf(cur) - 1)
      val f = new java.io.File(s"$table/_cdf-cursors/agg-view")
      java.nio.file.Files.write(f.toPath, prev.toString.getBytes)
      new java.io.File(s"$table/_cdf-cursors/.agg-view.crc").delete()
    }
    rewindCursor()
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1)
    assert(viewRows(view) === truthRows(table),
      "a replayed window must be absorbed, not double-counted")

    // view compaction with a LAGGING cursor must refuse: the folded
    // base would collide with that window's epoch key on replay
    rewindCursor()
    val e = intercept[IllegalArgumentException](
      LakeAggView.compact(spark, table, view))
    assert(e.getMessage.contains("refresh once"), e.getMessage)
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1)
    // caught up: the fold goes through; nothing observable changes
    LakeAggView.compact(spark, table, view)
    assert(viewRows(view) === truthRows(table))

    // a fully-retracted group disappears (delete all of group 4); the
    // post-compaction window lands above the folded epoch — no collision
    MergeTable.deleteWhere(spark, table, col("grp") === 4L,
      commitTsMillis = 60L)
    assert(LakeAggView.refresh(spark, table, view, "grp", "v") === 1)
    assert(!viewRows(view).contains(4L))
    assert(viewRows(view) === truthRows(table))
  }
}
