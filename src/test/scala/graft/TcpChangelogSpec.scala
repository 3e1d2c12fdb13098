package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangelogApply, DebeziumEnvelope}
import graft.sources.TcpChangelogServer

/** E1 end-to-end over a LIVE network changelog: a TCP replay server
  * feeding Debezium-envelope JSON, the `tcp-changelog` DSv2 source
  * consuming it in admission-capped micro-batches, [[DebeziumEnvelope]]
  * decoding, [[ChangelogApply]] materializing a keyed warehouse table —
  * the in-sandbox analog of DMS tailing a MySQL binlog
  * (`/root/reference/cdk_infrastructure/__init__.py:179-204`), with the
  * exactly-once contract proven across a forced query restart. */
class TcpChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dz(op: String, id: String, v: Double, tsMs: Long): String = {
    val img = s"""{"id":"$id","value":$v}"""
    op match {
      case "d" => s"""{"op":"d","before":$img,"after":null,"ts_ms":$tsMs}"""
      case _   => s"""{"op":"$op","before":null,"after":$img,"ts_ms":$tsMs}"""
    }
  }

  test("live socket feeds ≥3 micro-batches; apply is exactly-once " +
      "across a forced restart; REMOVE deletes through the wire") {
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("tcpcdc")
      val wh = s"$work/warehouse"
      val ckpt = s"$work/ckpt"

      def startQuery() = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 4) // forces multi-batch waves
          .load()
        ChangelogApply
          .applyStream(DebeziumEnvelope.toChangeEvents(raw),
            ChangelogApply.Mode.ApplyRemove)
          .toDF().writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            ChangelogApply.mergeIntoParquet(b.sparkSession, b, wh)
          }
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .start()
      }

      def table(): Map[String, Double] =
        spark.read.parquet(wh).collect().map { r =>
          val key = r.getAs[String]("key")
          val img = r.getAs[String]("newImage")
          key -> """"value":([-0-9.]+)""".r.findFirstMatchIn(img).get
            .group(1).toDouble
        }.toMap

      // wave 1: 10 inserts (> 2 admission-capped batches of 4) landing
      // WHILE the query runs — live micro-batches, not a drained backlog
      val q1 = startQuery()
      server.append((0 until 10).map(i => dz("c", s"k$i", i * 1.0, 1000L + i)))
      q1.processAllAvailable()
      assert(table() === (0 until 10).map(i => s"k$i" -> i * 1.0).toMap)
      val batches1 = q1.recentProgress.count(_.numInputRows > 0)
      assert(batches1 >= 3, s"expected ≥3 data micro-batches, got $batches1")

      // forced restart: kill the query, then modify/delete arrive while
      // it is DOWN — recovery must resume from the checkpointed offset
      q1.stop()
      server.append(Seq(
        dz("u", "k0", 100.0, 2000L), // modify
        dz("d", "k1", 1.0, 2001L),   // delete
        dz("c", "k10", 10.0, 2002L)))
      val q2 = startQuery()
      q2.processAllAvailable()
      assert(table() === ((2 until 10).map(i => s"k$i" -> i * 1.0) ++
        Seq("k0" -> 100.0, "k10" -> 10.0)).toMap,
        "restart must apply exactly the missed suffix: k0 modified, " +
          "k1 deleted, k10 inserted, nothing double-applied")

      // live follow-up on the recovered query: the stream keeps tailing
      server.append(Seq(dz("u", "k10", 11.0, 3000L)))
      q2.processAllAvailable()
      assert(table()("k10") === 11.0)
      q2.stop()
    } finally server.close()
  }

  test("Trigger.AvailableNow drains the WHOLE backlog in admission-capped " +
      "batches, then terminates") {
    // SupportsTriggerAvailableNow pins the server end at query start;
    // without it the wrapper would take ONE capped batch as the drain
    // target and strand the rest (found by the wire-to-view spec)
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("tcpdrain")
      server.append((0 until 11).map(i => dz("c", s"k$i", i * 1.0, 1000L + i)))
      val raw = spark.readStream.format("tcp-changelog")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("eventsPerBatch", 4) // 11 events -> 3 batches
        .load()
      val q = raw.writeStream
        .format("parquet")
        .option("path", s"$work/out")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val got = spark.read.parquet(s"$work/out")
      assert(got.count() === 11, "AvailableNow must drain past the cap")
      assert(got.select("offset").collect().map(_.getLong(0)).sorted.toSeq
        === (0L until 11L).toSeq)
    } finally server.close()
  }
}
