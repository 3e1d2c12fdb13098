package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipelines

/** End-to-end pipeline tests on reference-SHAPED fixtures (FIXTURES.md §A —
  * synthesized here, not copied from the reference). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // txns.csv-shaped fixture: raw header incl. padded names, quoted
  // comma-grouped money, d-MMM-yy dates, TRUE/FALSE (FIXTURES §A1)
  private val csvFixture =
    """Account No,DATE,TRANSACTION DETAILS,CHIP USED,VALUE DATE, WITHDRAWAL AMT , DEPOSIT AMT ,BALANCE AMT
      |409000611074,29-Jun-17,TRF FROM  Sample SERVICES,TRUE,29-Jun-17,,"  1,000,000.00 ","  1,000,000.00 "
      |409000611074,5-Jul-17,TRF FROM  Sample SERVICES,FALSE,5-Jul-17,"  133,900.00 ",,"  866,100.00 "
      |409000611075,18-Aug-17,NEFT TRANSFER,TRUE,18-Aug-17,,"  500.00 ","  500.00 "
      |""".stripMargin

  test("E1: CSV ingest normalizes headers, keeps strings, APPENDS on replay (A1-A3)") {
    val root = TestSpark.tempDir("e1")
    val csv = s"$root/txns.csv"
    Files.writeString(Paths.get(csv), csvFixture)
    val tableDir = s"$root/rds_cdc_table"
    val once = Pipelines.sqlPathIngest(spark, csv, tableDir)
    assert(once.columns.toSeq === Seq("account_no", "date",
      "transaction_details", "chip_used", "value_date",
      "_withdrawal_amt_", "_deposit_amt_", "balance_amt"))
    assert(once.schema.fields.forall(_.dataType.typeName == "string"))
    assert(once.count() === 3)
    // replay: no PK → append-only multiset (README.md:11 semantics)
    val twice = Pipelines.sqlPathIngest(spark, csv, tableDir)
    assert(twice.count() === 6)
  }

  test("E1: typed view parses d-MMM-yy dates, money decimals, booleans") {
    val root = TestSpark.tempDir("e1t")
    val csv = s"$root/txns.csv"
    Files.writeString(Paths.get(csv), csvFixture)
    val typed = Pipelines.txnsTypedView(
      Pipelines.sqlPathIngest(spark, csv, s"$root/t"))
    val r = typed.filter(org.apache.spark.sql.functions.col("chip_used"))
      .orderBy("date").collect().head
    assert(r.getAs[java.sql.Date]("date").toString === "2017-06-29")
    assert(r.getAs[java.math.BigDecimal]("deposit_amt")
      .compareTo(new java.math.BigDecimal("1000000.00")) === 0)
    assert(r.isNullAt(r.fieldIndex("withdrawal_amt")))
    val aug = typed.filter(org.apache.spark.sql.functions.col("account_no") === "409000611075")
      .collect().head
    assert(aug.getAs[java.sql.Date]("date").toString === "2017-08-18")
  }

  // trades.json-shaped fixture (FIXTURES §A2): nested details/time,
  // optional ticket, Decimal-ish price
  private val tradesFixture =
    """{"data": [
      |  {"id": "A", "details": {"asks": [1.1, 2.2], "bids": [0.9], "lag": 7, "system": "x"},
      |   "price": 10.5, "shares": 100, "ticker": "AAA",
      |   "time": {"date": "2012-03-02T22:00:00.000Z"}},
      |  {"id": "B", "details": {"asks": [3.3], "bids": [2.8, 2.7], "lag": 2, "system": "y"},
      |   "price": 20.25, "shares": 50, "ticker": "BBB", "ticket": "T1",
      |   "time": {"date": "2012-03-03T22:00:00.000Z"}},
      |  {"id": "A", "details": {"asks": [1.5], "bids": [1.0], "lag": 9, "system": "x"},
      |   "price": 11.0, "shares": 120, "ticker": "AAA", "ticket": "T2",
      |   "time": {"date": "2012-03-04T22:00:00.000Z"}}
      |]}""".stripMargin

  test("E2: JSON ingest upserts by id last-write-wins; replay is stable (A4-A5)") {
    val root = TestSpark.tempDir("e2")
    val json = s"$root/trades.json"
    Files.writeString(Paths.get(json), tradesFixture)
    val tableDir = s"$root/dynamodb_table"
    val once = Pipelines.nosqlIngest(spark, json, tableDir)
    assert(once.count() === 2) // ids A (last-wins), B
    val twice = Pipelines.nosqlIngest(spark, json, tableDir)
    assert(twice.count() === 2) // replay does not grow the table
  }

  test("E2: envelope stream → stage → warehouse, exactly-once across ticks (A6-A14)") {
    val root = TestSpark.tempDir("e2s")
    val envDir = s"$root/envelopes"
    Files.createDirectories(Paths.get(envDir))
    // AttributeValue wire-format envelopes, one JSON object per line
    Files.writeString(Paths.get(s"$envDir/batch1.json"),
      """{"eventName":"INSERT","key":"A","newImage":"{\"id\":{\"S\":\"A\"},\"price\":{\"N\":\"10.5\"}}","ts":"2026-01-01T00:00:00.000Z"}
        |{"eventName":"MODIFY","key":"A","newImage":"{\"id\":{\"S\":\"A\"},\"price\":{\"N\":\"11.0\"}}","ts":"2026-01-01T00:01:00.000Z"}
        |{"eventName":"REMOVE","key":"B","newImage":"{\"id\":{\"S\":\"B\"}}","ts":"2026-01-01T00:02:00.000Z"}
        |""".stripMargin)
    val stage = s"$root/stage"
    val ckpt = s"$root/ckpt"
    val wh = s"$root/warehouse"
    Pipelines.stageChangeStream(spark, envDir, stage, ckpt)
    // REMOVE dropped (reference-faithful): 2 staged records
    assert(Pipelines.loadTick(spark, stage, wh) === 1)
    val rows = spark.read.parquet(wh).collect()
    assert(rows.length === 2)
    val decoded = rows.map(_.getAs[String]("record")).sorted
    assert(decoded.forall(_.contains("\"id\":\"A\"")))
    assert(decoded.exists(_.contains("\"price\":11.0")))
    // tick 2 with no new envelopes: checkpoint prevents re-staging
    Pipelines.stageChangeStream(spark, envDir, stage, ckpt)
    assert(Pipelines.loadTick(spark, stage, wh) === 0)
    assert(spark.read.parquet(wh).count() === 2)
    // tick 3 with a new envelope file: only the new record flows
    Files.writeString(Paths.get(s"$envDir/batch2.json"),
      """{"eventName":"INSERT","key":"C","newImage":"{\"id\":{\"S\":\"C\"},\"price\":{\"N\":\"5\"}}","ts":"2026-01-01T00:10:00.000Z"}
        |""".stripMargin)
    Pipelines.stageChangeStream(spark, envDir, stage, ckpt)
    assert(Pipelines.loadTick(spark, stage, wh) === 1)
    assert(spark.read.parquet(wh).count() === 3)
  }

  test("E2 runs continuously under Trigger.ProcessingTime with ≥2 live micro-batches (A20)") {
    val root = TestSpark.tempDir("e2pt")
    val envDir = s"$root/envelopes"
    Files.createDirectories(Paths.get(envDir))
    Files.writeString(Paths.get(s"$envDir/batch1.json"),
      """{"eventName":"INSERT","key":"A","newImage":"{\"id\":{\"S\":\"A\"},\"price\":{\"N\":\"10.5\"}}","ts":"2026-01-01T00:00:00.000Z"}
        |{"eventName":"INSERT","key":"B","newImage":"{\"id\":{\"S\":\"B\"},\"price\":{\"N\":\"20.0\"}}","ts":"2026-01-01T00:01:00.000Z"}
        |""".stripMargin)
    val stage = s"$root/stage"
    val wh = s"$root/warehouse"
    def dataBatches(q: org.apache.spark.sql.streaming.StreamingQuery): Int =
      q.recentProgress.count(_.numInputRows > 0)
    def waitUntil(cond: => Boolean, what: String, timeoutMs: Long = 60000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(cond, s"timed out waiting for $what")
    }
    // live query: the reference's scheduled cadence, not a one-shot tick
    val q = Pipelines.stageChangeStreamQuery(spark, envDir, stage, s"$root/ckpt",
      org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"),
      name = "e2_live")
    try {
      waitUntil(dataBatches(q) >= 1, "first live micro-batch")
      // new envelopes arriving WHILE the query runs → a second live batch
      Files.writeString(Paths.get(s"$envDir/batch2.json"),
        """{"eventName":"INSERT","key":"C","newImage":"{\"id\":{\"S\":\"C\"},\"price\":{\"N\":\"5\"}}","ts":"2026-01-01T00:10:00.000Z"}
          |""".stripMargin)
      waitUntil(dataBatches(q) >= 2, "second live micro-batch")
      assert(q.isActive)
    } finally q.stop()
    // both live batches staged a file; the load tick sees exactly them
    assert(Pipelines.loadTick(spark, stage, wh) === 2)
    assert(spark.read.parquet(wh).count() === 3)
  }
}
