package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.SnapshotSqlCatalog
import graft.sources.TcpChangelogServer
import graft.streaming.{MergeStream, MergeTable, Snapshots}

/** The LAKEHOUSE LIFECYCLE, end to end in one narrative: a table is
  * born, fed from a live wire through the write-audit-publish gate
  * (one poisoned batch dead-lettered before visibility), served
  * pruned point reads through the bloom registry, re-clustered by
  * z-order compaction, damaged by a bad manual merge, ROLLED BACK,
  * and audited through the change feed and SQL time travel — every
  * stage leaving the inherited generation protocol consistent. Each
  * feature has its own focused spec; THIS one proves they compose on
  * one table, because production tables meet them all in sequence,
  * not in isolation. */
class LakeLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fields = Seq(
    "id" -> LongType.asInstanceOf[DataType], "value" -> DoubleType)

  private def dz(op: String, id: Long, v: Double): String = {
    val img = s"""{"id":$id,"value":$v}"""
    if (op == "d") s"""{"op":"d","before":$img,"after":null,"ts_ms":0}"""
    else s"""{"op":"$op","before":null,"after":$img,"ts_ms":0}"""
  }

  private def state(root: String): Map[Long, Double] =
    MergeTable.read(spark, root).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap

  test("birth → gated wire ingest → bloom point reads → z-compact → " +
      "bad merge → rollback → change feed + SQL travel, one table") {
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("lifecycle")
      val root = s"$work/table"
      // 1. BIRTH: 200 rows, key-partitioned
      MergeTable.create(spark, root,
        spark.range(200).select(col("id"), (col("id") * 1.5).as("value")),
        "id", nFiles = 8, commitTsMillis = 1000L)
      // 2. GATED WIRE INGEST: wave A passes, wave B is poisoned
      //    (negative value) and must die at the gate, wave C passes
      val audit: DataFrame => Boolean = df => df.filter(col("value") < 0).isEmpty
      def drain(): Unit = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 4).load()
        val q = MergeStream.intoTableGated(raw, root, "id", Fields,
          s"$work/ckpt", audit, s"$work/rejects")
        q.processAllAvailable(); q.stop()
      }
      server.append(Seq(dz("u", 10, 110.0), dz("u", 11, 111.0),
        dz("c", 300, 330.0), dz("u", 12, 112.0)))
      drain()
      server.append(Seq(dz("u", 13, -1.0), dz("u", 14, 114.0),
        dz("u", 15, 115.0), dz("u", 16, 116.0)))
      drain()
      server.append(Seq(dz("u", 17, 117.0), dz("d", 18, 0.0),
        dz("c", 301, 331.0), dz("u", 19, 119.0)))
      drain()
      val s2 = state(root)
      assert(s2(10L) === 110.0 && s2(300L) === 330.0 && s2(301L) === 331.0)
      assert(s2(13L) === 13 * 1.5 && s2(14L) === 14 * 1.5,
        "poisoned batch must have left no trace")
      assert(!s2.contains(18L))
      val genAfterIngest = Snapshots.currentGen(spark, root).get
      // 3. BLOOM + Z-COMPACT: the maintenance pass (compaction folds the
      //    ingest DVs; blooms rebuilt after — fresh files, fresh filters)
      MergeTable.compactZOrder(spark, root, "id", nFiles = 8,
        commitTsMillis = 4000L)
      assert(MergeTable.ensureBloomIndex(spark, root, "id") ===
        MergeTable.currentManifest(spark, root).size)
      val probe = MergeTable.readWhere(spark, root, col("id") === 301L)
        .collect().map(r => r.getAs[Double]("value")).toSeq
      assert(probe === Seq(331.0))
      assert(state(root) === s2, "maintenance must not change the state")
      // 4. BAD MERGE + ROLLBACK: a fat-fingered manual merge wipes a
      //    band; rollback restores the pre-merge generation by reference
      val gGood = Snapshots.currentGen(spark, root).get
      MergeTable.merge(spark, root,
        (100L until 150L).map(i => ("d", 1L, i, 0.0)).toDF("op", "seq", "id", "value"),
        "id", commitTsMillis = 5000L)
      assert(state(root).size === s2.size - 50)
      MergeTable.rollbackTo(spark, root, gGood, commitTsMillis = 6000L)
      assert(state(root) === s2, "rollback must restore the good state")
      // 5. CHANGE FEED across the whole life: the diff between the
      //    post-ingest generation and NOW is empty (compaction moved
      //    bytes, rollback undid the damage — net row change: none);
      //    the diff across the bad merge shows the 50 deletes
      val (ins0, del0) = diff(root, genAfterIngest)
      assert(ins0 === del0, // compaction rewrote files: same rows both sides
        "net row change across maintenance+damage+rollback must be zero")
      // 6. SQL TIME TRAVEL reaches the damaged state for forensics —
      //    through a session with the library extensions installed
      //    (the deployment shape), reading the same on-disk table
      val base = spark
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      try {
        val ext = SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.session.timeZone", "UTC")
          .withExtensions(new GraftExtensions)
          .getOrCreate()
        SnapshotSqlCatalog.registerMerge(ext, "lifecycle", root)
        val damagedGen = gGood + 1
        val atDamage = ext.sql(
          s"SELECT count(*) AS n FROM lifecycle VERSION AS OF $damagedGen")
          .head.getLong(0)
        assert(atDamage === s2.size - 50)
        val now = ext.sql(
          s"SELECT count(*) AS n FROM lifecycle VERSION AS OF ${gGood + 2}")
          .head.getLong(0)
        assert(now === s2.size)
      } finally {
        SparkSession.setActiveSession(base)
        SparkSession.setDefaultSession(base)
      }
    } finally server.close()
  }

  /** Row-set diff via the change feed: (inserted rows, deleted rows)
    * between generation `from` and the current one. */
  private def diff(root: String, from: Long): (Set[(Long, Double)], Set[(Long, Double)]) = {
    val cur = Snapshots.currentGen(spark, root).get
    val ch = MergeTable.changesBetween(spark, root, from, cur)
    def side(tag: String) = ch.filter(col("change") === tag)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("value"))).toSet
    (side("i"), side("d"))
  }
}
