package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.IncrementalAgg

case class AggEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Incremental view maintenance of the per-type aggregate: arriving
  * micro-batches fold into partials whose merged read equals the
  * whole-corpus batch aggregate after EVERY wave, across query
  * restarts, at partial-relation (not corpus) read cost. */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def canon(df: DataFrame): Seq[(String, Long, Double, Double, Double)] =
    df.collect().map(r => (
      r.getAs[String]("event_type"), r.getAs[Long]("cnt"),
      r.getAs[Double]("sum_value"), r.getAs[Double]("min_v"),
      r.getAs[Double]("max_v"))).toSeq

  test("maintained view equals the batch aggregate after every wave; " +
      "replayed epoch does not double-count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incagg") + "/view"
    val ckpt = TestSpark.tempDir("incagg-ckpt")
    val events = Tables.events(spark, dir)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[AggEvent].collect()
    val waves = events.groupBy(_.event_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[AggEvent]
    var seen = Seq.empty[AggEvent]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      // a fresh AvailableNow run per wave — proves checkpoint-resume too
      val q = IncrementalAgg.start(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
      seen = seen ++ wave
      val expect = IncrementalAgg.batchAggregate(
        seen.toDS().toDF())
      assert(canon(IncrementalAgg.read(spark, root)) === canon(expect),
        s"view diverged from batch rebuild at ${seen.size} events")
    }
    // exactly-once by epoch overwrite: replaying a batchId rewrites its
    // partition instead of double-counting
    IncrementalAgg.appendBatch(root)(waves.last.toSeq.toDS().toDF(),
      waves.length - 1L)
    val expect = IncrementalAgg.batchAggregate(seen.toDS().toDF())
    assert(canon(IncrementalAgg.read(spark, root)) === canon(expect),
      "replayed epoch must not change the view")
    // the refresh reads the partial relation, not the corpus: per epoch
    // at most |groups| rows
    val nTypes = events.map(_.event_type).distinct.length.toLong
    assert(IncrementalAgg.partials(spark, root).count() <=
      waves.length * nTypes,
      "partial relation must be |epochs|x|groups|-bounded")
    // compaction folds all epochs into one |groups|-row base partial,
    // resets the append debt, and changes NOTHING about the view; the
    // appender continues on top of the compacted base
    assert(graft.streaming.Compaction.appendDebt(spark, root) ===
      waves.length)
    IncrementalAgg.compact(spark, root)
    assert(graft.streaming.Compaction.appendDebt(spark, root) === 1)
    assert(IncrementalAgg.partials(spark, root).count() === nTypes)
    assert(canon(IncrementalAgg.read(spark, root)) === canon(expect),
      "compaction must not change the view")
    val extra = waves.head
    IncrementalAgg.appendBatch(root)(extra.toSeq.toDS().toDF(),
      waves.length.toLong)
    val expect2 = IncrementalAgg.batchAggregate(
      (seen ++ extra).toSeq.toDS().toDF())
    assert(canon(IncrementalAgg.read(spark, root)) === canon(expect2),
      "append after compaction must fold on the compacted base")
  }
}
