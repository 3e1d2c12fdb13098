package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, ChangelogApply, DebeziumEnvelope}

/** The Debezium envelope decoder must map the public changelog wire
  * format onto ChangeEvent exactly — wrapped and unwrapped forms, the
  * op → eventName mapping with before-image key recovery on deletes,
  * hard errors on unknown ops — and feed the existing apply engines
  * with no behavioral seam. */
class DebeziumEnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def decodeAll(rows: Seq[String]): Seq[(String, String, String, Timestamp)] = {
    import spark.implicits._
    DebeziumEnvelope.decode(rows.toDF("value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getTimestamp(3))).toSeq
  }

  test("wrapped and unwrapped envelopes decode identically; op mapping and delete key recovery") {
    val wrapped = Seq(
      """{"schema":{"type":"struct"},"payload":{"op":"c","before":null,"after":{"id":1,"name":"ada"},"ts_ms":1000}}""",
      """{"schema":{},"payload":{"op":"r","before":null,"after":{"id":2,"name":"lin"},"ts_ms":2000}}""",
      """{"schema":{},"payload":{"op":"u","before":{"id":1,"name":"ada"},"after":{"id":1,"name":"ada2"},"ts_ms":3000}}""",
      """{"schema":{},"payload":{"op":"d","before":{"id":2,"name":"lin"},"after":null,"ts_ms":4000}}""")
    val unwrapped = Seq(
      """{"op":"c","before":null,"after":{"id":1,"name":"ada"},"ts_ms":1000}""",
      """{"op":"r","before":null,"after":{"id":2,"name":"lin"},"ts_ms":2000}""",
      """{"op":"u","before":{"id":1,"name":"ada"},"after":{"id":1,"name":"ada2"},"ts_ms":3000}""",
      """{"op":"d","before":{"id":2,"name":"lin"},"after":null,"ts_ms":4000}""")
    val w = decodeAll(wrapped)
    val u = decodeAll(unwrapped)
    assert(w === u, "schema-wrapped and unwrapped forms must decode identically")
    assert(w.map(_._1) === Seq("INSERT", "INSERT", "MODIFY", "REMOVE"),
      "op mapping: c,r -> INSERT, u -> MODIFY, d -> REMOVE")
    assert(w.map(_._2) === Seq("1", "2", "1", "2"),
      "delete key must be recovered from the before image")
    assert(w.map(_._4.getTime) === Seq(1000L, 2000L, 3000L, 4000L),
      "ts_ms must decode as epoch millis")
    assert(w(2)._3.contains("ada2"), "newImage is the after image")
    assert(w(3)._3.contains("lin"), "delete carries the before image (content unused)")
  }

  test("unknown op is a hard error, like unknown eventName in the native envelope") {
    import spark.implicits._
    val bad = Seq("""{"op":"t","after":{"id":1},"ts_ms":1}""").toDF("value")
    val e = intercept[Exception] {
      DebeziumEnvelope.decode(bad).collect()
    }
    assert(e.getMessage.contains("Unexpected Debezium op") ||
      e.getCause != null && e.getCause.getMessage.contains("Unexpected Debezium op"))
  }

  test("Kafka log-compaction tombstones (null-value records) are dropped, not a stream kill") {
    import spark.implicits._
    // a compacted Debezium topic interleaves real envelopes with null
    // values after deletes — the 'd' event preceding each carried the
    // payload, so the tombstone is droppable hygiene, not data
    val rows = Seq(
      """{"op":"c","after":{"id":1,"name":"ada"},"ts_ms":1000}""",
      null.asInstanceOf[String],
      """{"op":"d","before":{"id":1,"name":"ada"},"after":null,"ts_ms":2000}""",
      null.asInstanceOf[String])
    val out = DebeziumEnvelope.decode(rows.toDF("value")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("INSERT", "REMOVE"))
  }

  test("a missing ts_ms is a hard error at decode, not a downstream NPE") {
    import spark.implicits._
    val bad = Seq("""{"op":"c","after":{"id":1}}""").toDF("value")
    val e = intercept[Exception](DebeziumEnvelope.decode(bad).collect())
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(msg)).mkString(" ")
    assert(msg(e).contains("ts_ms"), msg(e))
  }

  test("a raw Debezium JSON stream drives the streaming apply engine end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    // the deployment shape: a raw envelope stream (Kafka value column)
    // decoded per micro-batch, feeding the stateful apply — the decoder
    // must compose with readStream exactly as with batch frames
    val input = MemoryStream[String]
    val upserts = graft.cdc.ChangelogApply.applyStream(
      DebeziumEnvelope.toChangeEvents(input.toDS().toDF("value")),
      graft.cdc.ChangelogApply.Mode.ApplyRemove)
    val q = upserts.writeStream
      .format("memory").queryName("dbz_out").outputMode(OutputMode.Append)
      .start()
    try {
      input.addData(
        """{"payload":{"op":"c","before":null,"after":{"id":1,"v":1},"ts_ms":1000}}""",
        """{"payload":{"op":"c","before":null,"after":{"id":2,"v":10},"ts_ms":1000}}""")
      q.processAllAvailable()
      input.addData(
        """{"payload":{"op":"u","before":{"id":1,"v":1},"after":{"id":1,"v":2},"ts_ms":2000}}""",
        """{"payload":{"op":"d","before":{"id":2,"v":10},"after":null,"ts_ms":3000}}""")
      q.processAllAvailable()
      val rows = spark.table("dbz_out")
        .collect().map(r => (r.getString(0), Option(r.getString(1))))
      assert(rows.count(_._1 == "1") === 2, "key 1 upserted in both batches")
      assert(rows.filter(_._1 == "2").map(_._2).toSet
        === Set(Some("""{"id":2,"v":10}"""), None),
        "key 2: insert image then delete tombstone")
      assert(rows.filter(_._1 == "1").map(_._2).contains(Some("""{"id":1,"v":2}""")))
    } finally q.stop()
  }

  test("Debezium leg E1 end-to-end under ProcessingTime: decode → apply(REMOVE) → warehouse → reconcile, ≥2 live batches incl. a REMOVE") {
    import java.nio.file.{Files, Paths}
    val root = TestSpark.tempDir("dbz-e2e")
    val srcDir = s"$root/raw"
    val wh = s"$root/warehouse"
    Files.createDirectories(Paths.get(srcDir))
    def env(op: String, id: Int, v: Int, ts: Long): String = {
      val img = s"""{"id":$id,"v":$v}"""
      val (before, after) = if (op == "d") (img, "null") else ("null", img)
      s"""{"payload":{"op":"$op","before":$before,"after":$after,"ts_ms":$ts}}"""
    }
    Files.writeString(Paths.get(s"$srcDir/batch1.json"),
      env("c", 1, 1, 1000) + "\n" + env("c", 2, 10, 2000) + "\n")

    // reconcile source = the apply semantics over ALL raw envelopes so
    // far (the replication task's source-side count); target = the
    // warehouse the stream maintains — both re-read per tick
    val rec = new graft.cdc.ReconcileMetrics.Recorder
    val listener = new graft.cdc.ReconcileMetrics.Listener("dbz_e2e",
      () => ChangelogApply.applyBatch(
        DebeziumEnvelope.decode(spark.read.text(srcDir).toDF("value")),
        ChangelogApply.Mode.ApplyRemove),
      () => spark.read.parquet(wh),
      rec.publish)
    spark.streams.addListener(listener)

    val raw = spark.readStream.text(srcDir).toDF("value")
    val upserts = ChangelogApply.applyStream(
      DebeziumEnvelope.toChangeEvents(raw), ChangelogApply.Mode.ApplyRemove)
    def dataBatches(q: org.apache.spark.sql.streaming.StreamingQuery): Int =
      q.recentProgress.count(_.numInputRows > 0)
    def waitUntil(cond: => Boolean, what: String, timeoutMs: Long = 60000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    val q = upserts.toDF().writeStream
      .queryName("dbz_e2e")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ChangelogApply.mergeIntoParquet(spark, b.toDF(), wh)
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      waitUntil(dataBatches(q) >= 1, "first live micro-batch")
      // a MODIFY and a REMOVE arriving WHILE the query runs
      Files.writeString(Paths.get(s"$srcDir/batch2.json"),
        env("u", 1, 2, 3000) + "\n" + env("d", 2, 10, 4000) + "\n")
      waitUntil(dataBatches(q) >= 2, "second live micro-batch (the REMOVE)")
      // the listener's reconcile must converge to in-sync on the
      // post-REMOVE state: one live key on both sides
      waitUntil(rec.all.exists(t =>
        t.inSync && t.sourceCount == 1 && t.targetCount == 1),
        "an in-sync reconcile tick after the REMOVE")
      assert(q.isActive)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
    // warehouse ground truth: key 2 deleted, key 1 at its final image
    val stateRows = spark.read.parquet(wh).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("newImage"))
    assert(stateRows.map(_._1).toSeq === Seq("1"), "key 2 must be deleted")
    assert(stateRows.head._2 === """{"id":1,"v":2}""", "key 1 at last image")
  }

  test("decoded envelopes feed applyBatch identically to hand-built ChangeEvents") {
    import spark.implicits._
    def env(op: String, id: Int, name: String, ts: Long): String = {
      val img = s"""{"id":$id,"name":"$name"}"""
      val (before, after) =
        if (op == "d") (img, "null") else ("null", img)
      s"""{"payload":{"op":"$op","before":$before,"after":$after,"ts_ms":$ts}}"""
    }
    val envelopes = Seq(
      env("r", 1, "a", 1000), env("u", 1, "a2", 2000), env("u", 1, "a3", 3000),
      env("c", 2, "b", 1500), env("d", 2, "b", 2500),
      env("c", 3, "c", 9000))
    val viaDebezium = ChangelogApply.applyBatch(
      DebeziumEnvelope.toChangeEvents(envelopes.toDF("value")).toDF(),
      ChangelogApply.Mode.ApplyRemove)
      .select(col("key"), col("newImage")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val direct = ChangelogApply.applyBatch(
      Seq(
        ChangeEvent("INSERT", "1", """{"id":1,"name":"a"}""", new Timestamp(1000)),
        ChangeEvent("MODIFY", "1", """{"id":1,"name":"a2"}""", new Timestamp(2000)),
        ChangeEvent("MODIFY", "1", """{"id":1,"name":"a3"}""", new Timestamp(3000)),
        ChangeEvent("INSERT", "2", """{"id":2,"name":"b"}""", new Timestamp(1500)),
        ChangeEvent("REMOVE", "2", """{"id":2,"name":"b"}""", new Timestamp(2500)),
        ChangeEvent("INSERT", "3", """{"id":3,"name":"c"}""", new Timestamp(9000))).toDF(),
      ChangelogApply.Mode.ApplyRemove)
      .select(col("key"), col("newImage")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaDebezium === direct,
      "the decoder must be a pure format adapter — no apply-semantics seam")
    assert(viaDebezium.keySet === Set("1", "3"), "key 2 was deleted")
    assert(viaDebezium("1").contains("a3"), "last-wins per key")
  }
}
