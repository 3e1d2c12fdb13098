package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, ChangelogApply}
import graft.cdc.ChangelogApply.Mode

/** t_changelog_apply: envelope stream → materialized keyed table, in the
  * reference-faithful drop-REMOVE mode and the corrected apply-REMOVE
  * mode. */
class ChangelogApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Long) = new Timestamp(s * 1000)

  private val events = Seq(
    ChangeEvent("INSERT", "k1", """{"v":1}""", ts(1)),
    ChangeEvent("MODIFY", "k1", """{"v":2}""", ts(2)),
    ChangeEvent("INSERT", "k2", """{"v":10}""", ts(1)),
    ChangeEvent("REMOVE", "k2", """{"v":10}""", ts(3)),
    ChangeEvent("INSERT", "k3", """{"v":7}""", ts(5)))

  test("batch apply, drop-REMOVE (reference-faithful): deleted key keeps last image") {
    import spark.implicits._
    val out = ChangelogApply.applyBatch(events.toDF(), Mode.DropRemove)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("k1" -> """{"v":2}""", "k2" -> """{"v":10}""", "k3" -> """{"v":7}"""))
  }

  test("batch apply, apply-REMOVE: latest REMOVE deletes the key") {
    import spark.implicits._
    val out = ChangelogApply.applyBatch(events.toDF(), Mode.ApplyRemove)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("k1" -> """{"v":2}""", "k3" -> """{"v":7}"""))
  }

  test("batch apply is idempotent and last-wins under replay (A5 upsert law)") {
    import spark.implicits._
    val replayed = (events ++ events ++ events).toDF()
    val once = ChangelogApply.applyBatch(events.toDF(), Mode.DropRemove).collect().toSet
    val thrice = ChangelogApply.applyBatch(replayed, Mode.DropRemove).collect().toSet
    assert(once === thrice)
  }

  test("unknown event name raises (strict validation, A7)") {
    import spark.implicits._
    val bad = Seq(ChangeEvent("UPSERT", "k", "{}", ts(1))).toDF()
    val e = intercept[Exception](
      ChangelogApply.applyBatch(bad, Mode.DropRemove).collect())
    assert(e.getMessage.contains("Unexpected event_name")
      || e.getCause.getMessage.contains("Unexpected event_name"))
  }

  test("streaming apply emits per-key upserts across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ChangeEvent]
    val upserts = ChangelogApply.applyStream(input.toDS(), Mode.ApplyRemove)
    val q = upserts.writeStream
      .format("memory").queryName("chg_out").outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        ChangeEvent("INSERT", "k1", """{"v":1}""", ts(1)),
        ChangeEvent("INSERT", "k2", """{"v":10}""", ts(1)))
      q.processAllAvailable()
      input.addData(
        ChangeEvent("MODIFY", "k1", """{"v":2}""", ts(2)),
        ChangeEvent("REMOVE", "k2", """{"v":10}""", ts(3)))
      q.processAllAvailable()
      val rows = spark.table("chg_out")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      // batch 1: two inserts; batch 2: modify + delete
      assert(rows.count(_._1 == "k1") === 2)
      assert(rows.filter(_._1 == "k2").map(_._2).toSet === Set(Some("""{"v":10}"""), None))
      assert(rows.filter(r => r._1 == "k1").map(_._2).contains(Some("""{"v":2}""")))
    } finally q.stop()
  }

  test("transformWithState apply matches flatMapGroupsWithState semantics (RocksDB state store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(confKey)
    // the v2 state-store path transformWithState requires
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[ChangeEvent]
      val upserts = ChangelogApply.applyStreamTws(input.toDS(), Mode.ApplyRemove)
      val q = upserts.writeStream
        .format("memory").queryName("chg_tws").outputMode(OutputMode.Append)
        .start()
      try {
        input.addData(
          ChangeEvent("INSERT", "k1", """{"v":1}""", ts(1)),
          ChangeEvent("INSERT", "k2", """{"v":10}""", ts(1)))
        q.processAllAvailable()
        input.addData(
          ChangeEvent("MODIFY", "k1", """{"v":2}""", ts(2)),
          ChangeEvent("REMOVE", "k2", """{"v":10}""", ts(3)),
          ChangeEvent("INSERT", "k3", """{"v":7}""", ts(5)))
        q.processAllAvailable()
        // stale event (older than k1's stored state): must NOT re-emit
        input.addData(ChangeEvent("MODIFY", "k1", """{"v":0}""", ts(1)))
        q.processAllAvailable()
        val rows = spark.table("chg_tws")
          .collect().map(r => (r.getString(0), Option(r.getString(1))))
        // identical per-batch emissions to the fMGWS engine
        assert(rows.count(_._1 == "k1") === 2) // the ts(1) replay is suppressed
        assert(rows.filter(_._1 == "k1").map(_._2).toSet
          === Set(Some("""{"v":1}"""), Some("""{"v":2}""")))
        assert(rows.filter(_._1 == "k2").map(_._2).toSet
          === Set(Some("""{"v":10}"""), None))
        assert(rows.filter(_._1 == "k3").map(_._2) === Seq(Some("""{"v":7}""")))
      } finally q.stop()
    } finally spark.conf.set(confKey, prev)
  }

  test("mergeIntoParquet materializes the upsert changelog") {
    import spark.implicits._
    val dir = TestSpark.tempDir("warehouse") + "/t"
    val b1 = Seq(("k1", """{"v":1}""", ts(1)), ("k2", """{"v":10}""", ts(1)))
      .toDF("key", "newImage", "ts")
    ChangelogApply.mergeIntoParquet(spark, b1, dir)
    val b2 = Seq(("k1", """{"v":2}""", ts(2)), ("k3", """{"v":7}""", ts(2)))
      .toDF("key", "newImage", "ts")
    ChangelogApply.mergeIntoParquet(spark, b2, dir)
    val out = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("newImage")).toMap
    assert(out === Map("k1" -> """{"v":2}""", "k2" -> """{"v":10}""", "k3" -> """{"v":7}"""))
  }
}
