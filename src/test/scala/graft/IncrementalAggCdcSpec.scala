package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, ChangelogApply}
import graft.streaming.IncrementalAggCdc

/** Retractable incremental aggregate view over a CDC changelog: the
  * maintained view equals the batch aggregate of the LIVE table after
  * every wave — through MODIFYs that move a key's contribution between
  * groups and REMOVEs that must retract it entirely (including the min
  * retraction an append-only view cannot express), across query
  * restarts, with replay idempotence and compaction invariance. */
class IncrementalAggCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def img(t: String, v: Double): String =
    s"""{"event_type":"$t","value":$v}"""
  private def ev(name: String, key: String, image: String, t: Long): ChangeEvent =
    ChangeEvent(name, key, image, new Timestamp(t))

  private def canon(df: DataFrame): Seq[(String, Long, Double, Double, Double)] =
    df.collect().map(r => (
      r.getAs[String]("event_type"), r.getAs[Long]("cnt"),
      r.getAs[Double]("sum_value"), r.getAs[Double]("min_v"),
      r.getAs[Double]("max_v"))).toSeq

  test("view tracks the live table through MODIFY and REMOVE, " +
      "across restarts; replay and compaction change nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incaggcdc") + "/view"
    val ckpt = TestSpark.tempDir("incaggcdc-ckpt")

    // wave 1: inserts — group a holds {1.0, 5.0}, b {10.0}, c {2.5, 2.5}
    val w1 = Seq(
      ev("INSERT", "k0", img("a", 1.0), 1000),
      ev("INSERT", "k1", img("a", 5.0), 1001),
      ev("INSERT", "k2", img("b", 10.0), 1002),
      ev("INSERT", "k3", img("c", 2.5), 1003),
      ev("INSERT", "k4", img("c", 2.5), 1004))
    // wave 2: MODIFY k2 out of b into a (b must vanish — full group
    // retraction), MODIFY k1's value within a, INSERT a new key
    val w2 = Seq(
      ev("MODIFY", "k2", img("a", 7.0), 2000),
      ev("MODIFY", "k1", img("a", 4.0), 2001),
      ev("INSERT", "k5", img("b", 3.0), 2002))
    // wave 3: REMOVE the minimum of group a (min must climb 1.0 → 4.0 —
    // the retraction append-only min cannot do), REMOVE one of c's two
    // equal values (multiplicity 2 → 1, min/max unchanged, cnt down)
    val w3 = Seq(
      ev("REMOVE", "k0", img("a", 1.0), 3000),
      ev("REMOVE", "k4", img("c", 2.5), 3001))

    val input = MemoryStream[ChangeEvent]
    var seen = Seq.empty[ChangeEvent]
    Seq(w1, w2, w3).foreach { wave =>
      input.addData(wave)
      // a fresh AvailableNow run per wave — proves checkpoint-resume
      val q = IncrementalAggCdc.start(input.toDS(), root, ckpt)
      q.awaitTermination(60000)
      seen = seen ++ wave
      val live = ChangelogApply.applyBatch(seen.toDF(),
        ChangelogApply.Mode.ApplyRemove)
      val expect = IncrementalAggCdc.batchAggregate(live)
      assert(canon(IncrementalAggCdc.read(spark, root)) === canon(expect),
        s"view diverged from the live-table rebuild at ${seen.size} events")
    }
    // the concrete retraction outcomes, pinned (not just rebuild-equal):
    // b died with k2's modify-out then was reborn by k5; a's min climbed
    val end = canon(IncrementalAggCdc.read(spark, root))
    assert(end === Seq(
      ("a", 2L, 11.0, 4.0, 7.0),
      ("b", 1L, 3.0, 3.0, 3.0),
      ("c", 1L, 2.5, 2.5, 2.5)))

    // exactly-once: re-appending an already-committed epoch overwrites
    // its partition instead of double-retracting
    val replayDeltas = Seq(
      ("k0", Some(img("a", 1.0)), None: Option[String], new Timestamp(3000L)),
      ("k4", Some(img("c", 2.5)), None: Option[String], new Timestamp(3001L)))
      .toDF("key", "before", "after", "ts")
    IncrementalAggCdc.appendBatch(root)(replayDeltas, 2L)
    assert(canon(IncrementalAggCdc.read(spark, root)) === end,
      "replayed epoch must not change the view")

    // compaction folds to ≤ |live (group, value)| net rows (cancelled
    // multiplicities dropped) and changes nothing about the view
    IncrementalAggCdc.compact(spark, root)
    assert(canon(IncrementalAggCdc.read(spark, root)) === end,
      "compaction must not change the view")
    val folded = IncrementalAggCdc.partials(spark, root)
    assert(folded.count() === 4, "compacted base must drop cancelled rows " +
      "(live distinct (group, value): a4.0 a7.0 b3.0 c2.5)")
    assert(folded.filter($"d" === 0).count() === 0,
      "compacted base must hold only net-live multiplicities")
  }

  test("wire-to-view: the retractable view fed from a live TCP changelog " +
      "equals the batch aggregate, across a restart") {
    // the full round-13 CDC composition — socket transport
    // (tcp-changelog) → Debezium decode → keyed state delta emission →
    // signed-partial view maintenance — the reference's E2 path with
    // the aggregate maintained instead of rebuilt
    import graft.cdc.DebeziumEnvelope
    import graft.sources.TcpChangelogServer
    import org.apache.spark.sql.streaming.Trigger
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("tcpview")
      val root = s"$work/view"
      val ckpt = s"$work/ckpt"

      def dz(op: String, id: String, t: String, v: Double, ts: Long): String = {
        val image = s"""{"id":"$id","event_type":"$t","value":$v}"""
        op match {
          case "d" => s"""{"op":"d","before":$image,"after":null,"ts_ms":$ts}"""
          case _   => s"""{"op":"$op","before":null,"after":$image,"ts_ms":$ts}"""
        }
      }
      def runOnce(): Unit = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 3) // forces multi-batch waves
          .load()
        val q = IncrementalAggCdc.start(
          DebeziumEnvelope.toChangeEvents(raw), root, ckpt,
          trigger = Trigger.ProcessingTime("100 milliseconds"))
        q.processAllAvailable()
        q.stop()
      }

      server.append(Seq(
        dz("c", "k0", "a", 1.0, 1000), dz("c", "k1", "a", 5.0, 1001),
        dz("c", "k2", "b", 10.0, 1002), dz("c", "k3", "c", 2.5, 1003)))
      runOnce()
      assert(canon(IncrementalAggCdc.read(spark, root)) === Seq(
        ("a", 2L, 6.0, 1.0, 5.0), ("b", 1L, 10.0, 10.0, 10.0),
        ("c", 1L, 2.5, 2.5, 2.5)))

      // between runs (query down): modify k2 out of b, delete a's min —
      // both retractions must travel the wire and resume from checkpoint
      server.append(Seq(
        dz("u", "k2", "a", 7.0, 2000),
        dz("d", "k0", "a", 1.0, 2001)))
      runOnce()
      assert(canon(IncrementalAggCdc.read(spark, root)) === Seq(
        ("a", 2L, 12.0, 5.0, 7.0), ("c", 1L, 2.5, 2.5, 2.5)),
        "b must vanish (modify-out), a's min must climb (delete) — " +
          "through the socket, the state store, and the signed partials")
    } finally server.close()
  }
}
