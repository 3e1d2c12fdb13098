package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{ChangeEvent, ChangelogApply}

/** The cdc-gen DataSource V2 source: schema, determinism (replayability),
  * micro-batch advance, and the full source→changelog-apply→warehouse
  * pipeline in one streaming query. */
class CdcGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("batch read is deterministic and schema-correct") {
    val df = spark.read.format("cdc-gen")
      .option("totalEvents", 200).option("keys", 10).load()
    assert(df.schema.fieldNames.toSeq === Seq("eventName", "key", "newImage", "ts"))
    val a = df.collect().map(_.toSeq).toSeq
    val b = spark.read.format("cdc-gen")
      .option("totalEvents", 200).option("keys", 10).load()
      .collect().map(_.toSeq).toSeq
    assert(a === b) // replay-identical: the exactly-once prerequisite
    assert(a.size === 200)
    val names = df.select("eventName").distinct()
      .collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("INSERT", "MODIFY", "REMOVE")))
    assert(names.contains("REMOVE"))
  }

  test("micro-batch stream advances by eventsPerBatch and drains at maxEvents") {
    val stream = spark.readStream.format("cdc-gen")
      .option("keys", 10).option("eventsPerBatch", 50)
      .option("maxEvents", 200).load()
    val q = stream.writeStream.format("memory").queryName("cdcgen_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      // drained exactly to the ceiling, in 50-event batches
      assert(spark.table("cdcgen_out").count() === 200)
    } finally q.stop()
  }

  test("checkpoint restart does not re-emit already-committed offset ranges") {
    val root = TestSpark.tempDir("cdcrestart")
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    def run(maxEvents: Long): Unit = {
      val q = spark.readStream.format("cdc-gen")
        .option("keys", 10).option("eventsPerBatch", 25)
        .option("maxEvents", maxEvents).load()
        .selectExpr("eventName", "key", "newImage")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0)).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(maxEvents = 75) // first life drains to 75
    val n1 = spark.read.parquet(out).count()
    assert(n1 === 75)
    run(maxEvents = 150) // restart from the same checkpoint, higher ceiling
    val rows = spark.read.parquet(out)
    val n2 = rows.count()
    assert(n2 === 150, s"restart emitted $n2 rows (lost or duplicated data)")
    // every synthetic event is unique by its seq (pure function of i):
    // any re-emission after restart would collide
    val distinctSeq = rows
      .selectExpr("get_json_object(newImage, '$.seq') AS seq").distinct().count()
    assert(distinctSeq === n2, s"duplicated events after restart: $n2 rows, $distinctSeq seqs")
  }

  test("end-to-end: cdc-gen source → streaming changelog apply → merged warehouse") {
    import spark.implicits._
    val stream = spark.readStream.format("cdc-gen")
      .option("keys", 7).option("eventsPerBatch", 100).option("removeEvery", 10)
      .option("maxEvents", 300)
      .load()
    val events = stream.as[ChangeEvent]
    val upserts = ChangelogApply.applyStream(events, ChangelogApply.Mode.ApplyRemove)
    val warehouse = TestSpark.tempDir("cdcwh") + "/t"
    val q = upserts.toDF().writeStream
      .option("checkpointLocation", TestSpark.tempDir("cdcck"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ChangelogApply.mergeIntoParquet(batch.sparkSession, batch, warehouse)
      }
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      val table = spark.read.parquet(warehouse)
      // at most one row per live key; images are the latest per key
      assert(table.count() > 0)
      assert(table.count() <= 7)
      assert(table.groupBy("key").count()
        .filter($"count" > 1).count() === 0)
    } finally q.stop()
  }
}
