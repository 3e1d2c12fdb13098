package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, Scd2Apply}

/** Streaming type-2 history maintenance: the merged history table equals
  * the batch SCD2 over the same changelog after every wave — through
  * MODIFYs (close + reopen), REMOVEs (close without reopen), re-inserts
  * after delete (version counter continues), equal-timestamp tie-breaks,
  * out-of-order rejection, and a query restart mid-history. */
class Scd2ApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(name: String, key: String, image: String, t: Long): ChangeEvent =
    ChangeEvent(name, key, image, new Timestamp(t))

  private def canon(df: DataFrame): Seq[(String, Int, String, Long, Option[Long], Boolean)] =
    df.collect().map(r => (
      r.getAs[String]("key"), r.getAs[Number]("version").intValue,
      r.getAs[String]("image"), r.getAs[Long]("validFromUs"),
      Option(r.getAs[java.lang.Long]("validToUs")).map(_.longValue),
      r.getAs[Boolean]("isCurrent"))).toSeq.sortBy(t => (t._1, t._2))

  test("streamed history ≡ batch SCD2 across waves and a restart; " +
      "REMOVE closes without reopening; re-insert continues versions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = TestSpark.tempDir("scd2") + "/history"
    val ckpt = TestSpark.tempDir("scd2-ckpt")

    // wave 1: two keys born; k1 modified twice in ONE batch (both
    // intermediate versions must reach history, not just the last-wins)
    val w1 = Seq(
      ev("INSERT", "k1", "a1", 1000),
      ev("MODIFY", "k1", "a2", 2000),
      ev("MODIFY", "k1", "a3", 3000),
      ev("INSERT", "k2", "b1", 1500))
    // wave 2: k2 removed (lineage kept, no current row); k3 born with an
    // equal-timestamp INSERT+MODIFY pair (eventName breaks the tie:
    // INSERT opens v1, MODIFY closes it at the same microsecond)
    val w2 = Seq(
      ev("REMOVE", "k2", "", 4000),
      ev("INSERT", "k3", "c1", 5000),
      ev("MODIFY", "k3", "c2", 5000))
    // wave 3: k2 re-inserted (version continues at 2); a STALE k1 event
    // older than its applied watermark arrives and must be ignored
    val w3 = Seq(
      ev("INSERT", "k2", "b2", 6000),
      ev("MODIFY", "k1", "stale", 2500))

    var applied = Seq.empty[ChangeEvent]
    val stale = ev("MODIFY", "k1", "stale", 2500)
    val input = MemoryStream[ChangeEvent]
    Seq(w1, w2, w3).foreach { wave =>
      input.addData(wave)
      // fresh AvailableNow query per wave — checkpoint-resume is the
      // restart under test
      val q = Scd2Apply.start(input.toDS(), table, ckpt)
      q.awaitTermination(60000)
      applied = applied ++ wave.filterNot(_ == stale)
      val expect = Scd2Apply.applyBatch(applied.toDS())
      val got = spark.read.parquet(table).drop("asofUs")
      assert(canon(got) === canon(expect),
        s"history diverged from batch SCD2 at ${applied.size} events")
    }

    // the concrete lineage, pinned
    val end = canon(spark.read.parquet(table).drop("asofUs"))
    assert(end === Seq(
      ("k1", 1, "a1", 1000000L, Some(2000000L), false),
      ("k1", 2, "a2", 2000000L, Some(3000000L), false),
      ("k1", 3, "a3", 3000000L, None, true),
      ("k2", 1, "b1", 1500000L, Some(4000000L), false), // closed by REMOVE
      ("k2", 2, "b2", 6000000L, None, true),            // re-insert: v2
      ("k3", 1, "c1", 5000000L, Some(5000000L), false), // zero-width (tie)
      ("k3", 2, "c2", 5000000L, None, true)))

    // exactly-once: re-merging a replayed micro-batch's rows changes nothing
    val replay = Seq(
      ("k2", 2, "b2", 6000000L, None: Option[Long], true, 6000000L))
      .toDF("key", "version", "image", "validFromUs", "validToUs",
        "isCurrent", "asofUs")
    Scd2Apply.mergeHistoryParquet(spark, replay, table)
    assert(canon(spark.read.parquet(table).drop("asofUs")) === end,
      "replayed merge must be idempotent")
  }

  test("sub-millisecond changes keep their MICROsecond identity: two " +
      "MODIFYs in one millisecond both reach history, equal to batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = TestSpark.tempDir("scd2-us") + "/history"
    val ckpt = TestSpark.tempDir("scd2-us-ckpt")
    def evUs(name: String, key: String, image: String, us: Long) = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000L) * 1000L).toInt)
      ChangeEvent(name, key, image, t)
    }
    // 10:00:00.000400 and .000900 — same millisecond, distinct micros
    // (Timestamp.getTime alone truncates both to the same instant; the
    // second event would then be dropped as a non-newer replay)
    val wave = Seq(
      evUs("INSERT", "k", "v0", 1000000L),
      evUs("MODIFY", "k", "v1", 1000400L),
      evUs("MODIFY", "k", "v2", 1000900L))
    val input = MemoryStream[ChangeEvent]
    input.addData(wave)
    val q = Scd2Apply.start(input.toDS(), table, ckpt)
    q.awaitTermination(60000)
    val got = canon(spark.read.parquet(table).drop("asofUs"))
    assert(got === canon(Scd2Apply.applyBatch(wave.toDS())))
    assert(got === Seq(
      ("k", 1, "v0", 1000000L, Some(1000400L), false),
      ("k", 2, "v1", 1000400L, Some(1000900L), false),
      ("k", 3, "v2", 1000900L, None, true)))
  }

  test("at-least-once redelivery: an exact duplicate event yields ONE " +
      "version on both faces — batch ≡ stream through the duplicate") {
    import spark.implicits._
    // the same INSERT delivered twice (identical ts + eventName), then
    // a MODIFY; the streaming watermark drops the duplicate — the batch
    // replay must collapse it too, not mint a phantom instantly-closed
    // version
    val log = Seq(
      ev("INSERT", "k1", "a1", 1000),
      ev("INSERT", "k1", "a1", 1000), // redelivery
      ev("MODIFY", "k1", "a2", 2000))
    val batch = canon(Scd2Apply.applyBatch(log.toDS()))
    assert(batch.map(_._2) === Seq(1, 2),
      s"duplicate must not become its own version: $batch")
    assert(batch.head._3 === "a1" && batch.head._5 === Some(2000000L),
      s"v1 closes at the MODIFY, not at the duplicate's instant: $batch")
    // the streaming face over the same log: one wave through the state
    // machine — the same two versions (the duplicate is watermark-dropped)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[ChangeEvent]
    input.addData(log)
    val q = Scd2Apply.applyStream(input.toDS()).writeStream
      .format("memory").queryName("scd2_dup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = canon(spark.table("scd2_dup"))
    assert(streamed === batch, "the two faces must agree through a replay")
  }

  test("REMOVE with no open row is a no-op that still advances the " +
      "watermark; unknown event names are refused by name") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val table = TestSpark.tempDir("scd2-ghost") + "/history"
    val ckpt = TestSpark.tempDir("scd2-ghost-ckpt")
    // streaming arrival order: REMOVE first (no open row → no-op row-wise,
    // watermark advances), then an INSERT with an OLDER timestamp — the
    // watermark must reject it, so history stays empty
    val input = MemoryStream[ChangeEvent]
    Seq(Seq(ev("REMOVE", "k", "", 2000)),
        Seq(ev("INSERT", "k", "late", 1000))).foreach { wave =>
      input.addData(wave)
      val q = Scd2Apply.start(input.toDS(), table, ckpt)
      q.awaitTermination(60000)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val empty = !fs.exists(new org.apache.hadoop.fs.Path(table)) ||
      spark.read.parquet(table).isEmpty
    assert(empty, "a pre-watermark INSERT must not fork history")
    // the batch face sees the TRUE order (INSERT then REMOVE) and keeps
    // the closed lineage row — the two faces agree given the same order
    val hist = Scd2Apply.applyBatch(
      Seq(ev("REMOVE", "k", "", 2000), ev("INSERT", "k", "late", 1000)).toDS())
    assert(canon(hist) === Seq(("k", 1, "late", 1000000L, Some(2000000L), false)))
    val err = intercept[Exception] {
      Scd2Apply.applyBatch(Seq(ev("UPSERT", "k", "x", 1000)).toDS()).collect()
    }
    assert(err.getMessage.contains("Unexpected event_name"))
  }
}
