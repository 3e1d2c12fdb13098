package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.cdc.{ChangeEvent, ChangelogApply, StagedFiles}
import graft.functions.DynamoAttributeDecode.dynamoAttrDecode
import graft.ops.Scans

/** End-to-end pipeline wiring mirroring the reference's two CDC paths on
  * local directories (SURVEY §3 E1/E2, §7 module 3). The reference's
  * Lambda hops collapse into stages of single Spark jobs/queries; its
  * 5-minute EventBridge cadence becomes `Trigger.AvailableNow` per tick
  * (or `Trigger.ProcessingTime` for continuous runs).
  */
object Pipelines {

  // ───────────────────────── E1: SQL path ─────────────────────────

  /** CSV → source table append (operators A1–A3:
    * `/root/reference/source/load_data_to_rds_lambda/handler.py:22-49`).
    * Header is normalized (spaces→_, lowercase), every column kept as
    * string (the reference's all-varchar(40) table), rows APPENDED —
    * the table has no primary key, so every replay grows it
    * (`handler.py:36`, `/root/reference/README.md:11`). */
  def sqlPathIngest(spark: SparkSession, csvPath: String,
      tableDir: String): DataFrame = {
    val raw = spark.read
      .option("header", true)
      .option("quote", "\"")
      .option("inferSchema", false) // everything varchar, like the reference
      .csv(csvPath)
    val normalized = Scans.normalizeHeader(raw)
    normalized.write.mode(SaveMode.Append).parquet(tableDir)
    spark.read.parquet(tableDir)
  }

  /** Typed cleanup view over the ingested txns-shaped table: the explicit
    * casts the reference leaves to downstream consumers (§1.2 —
    * `d-MMM-yy` dates, comma-grouped padded money strings, booleans). */
  def txnsTypedView(raw: DataFrame): DataFrame = {
    def money(c: String) =
      regexp_replace(trim(col(c)), ",", "").cast(DecimalType(18, 2))
    raw.select(
      col("account_no"),
      to_date(col("date"), "d-MMM-yy").as("date"),
      col("transaction_details"),
      col("chip_used").cast(BooleanType).as("chip_used"),
      to_date(col("value_date"), "d-MMM-yy").as("value_date"),
      money("_withdrawal_amt_").as("withdrawal_amt"),
      money("_deposit_amt_").as("deposit_amt"),
      money("balance_amt").as("balance_amt"))
  }

  // ──────────────────────── E2: NoSQL path ────────────────────────

  /** Envelope file-stream schema (FIXTURES §A3). */
  val EnvelopeSchema: StructType = StructType(Seq(
    StructField("eventName", StringType),
    StructField("key", StringType),
    StructField("newImage", StringType), // AttributeValue wire JSON
    StructField("ts", TimestampType)))

  /** JSON document → keyed upsert table (operators A4–A5:
    * `/root/reference/source/load_data_to_dynamodb_lambda/handler.py:11-16`):
    * take `$.data[]`, upsert by `id` last-write-wins — replays do NOT
    * grow the table. The reference's sequential `put_item` loop makes the
    * LAST occurrence of a duplicate id win; we reproduce that by giving
    * each record a timestamp offset by its position in `data[]`
    * (posexplode), so the tie-break is deterministic, not arrival-order. */
  def nosqlIngest(spark: SparkSession, jsonPath: String,
      tableDir: String): DataFrame = {
    val records = spark.read.option("multiLine", true).json(jsonPath)
      .select(posexplode(col("data")).as(Seq("pos", "rec")))
      .select(col("rec.id").as("key"),
        to_json(col("rec")).as("newImage"),
        expr("timestamp_micros(unix_micros(current_timestamp()) + pos)").as("ts"))
    val dst = new org.apache.hadoop.fs.Path(tableDir)
    // the TABLE's filesystem, not fs.defaultFS — the two differ on any
    // object-store deployment (hdfs default, s3a table)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit existence check — a transient read error must propagate,
    // not be mistaken for "table absent" (which would drop all history)
    val existing =
      if (fs.exists(dst)) Some(spark.read.parquet(tableDir)) else None
    val all = existing.map(_.unionByName(records)).getOrElse(records)
    val merged = ChangelogApply.applyBatch(
      all.withColumn("eventName", lit(ChangeEvent.Modify)),
      ChangelogApply.Mode.DropRemove)
    merged.write.mode(SaveMode.Overwrite).parquet(tableDir + "__next")
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tableDir + "__next"), dst)
    spark.read.parquet(tableDir)
  }

  /** The stream hop (operators A6–A10): change-envelope stream → strict
    * INSERT/MODIFY filter → AttributeValue decode → staged NDJSON files,
    * one per micro-batch, empty batches emitting marker files.
    *
    * `envelopeDir` is consumed as a file stream (the local stand-in for
    * the DynamoDB stream — same ordered-envelope contract). Runs with
    * `Trigger.AvailableNow` = one reference "tick"; checkpointed, so each
    * envelope is staged exactly once across ticks. */
  def stageChangeStream(spark: SparkSession, envelopeDir: String,
      stageRoot: String, checkpointDir: String): Unit =
    stageChangeStreamQuery(spark, envelopeDir, stageRoot, checkpointDir)
      .awaitTermination()

  /** The same hop as a live query under a caller-chosen trigger: pass
    * `Trigger.ProcessingTime(…)` for the reference's continuous cadence
    * (EventBridge every 5 min / stream batching every 5 s,
    * `cdk_infrastructure/__init__.py:492-511`, `__init__.py:355-356`) —
    * the query stays up and stages each new envelope file as a new
    * micro-batch. Caller owns stop/await. */
  def stageChangeStreamQuery(spark: SparkSession, envelopeDir: String,
      stageRoot: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      name: String = "stage_change_stream"): org.apache.spark.sql.streaming.StreamingQuery = {
    val envelopes = spark.readStream
      .schema(EnvelopeSchema)
      .json(envelopeDir)
    val decoded = envelopes
      .filter(
        when(col("eventName").isin(ChangeEvent.Known: _*), lit(true))
          .otherwise(raise_error(concat(
            lit("Unexpected event_name: "), col("eventName")))))
      .filter(col("eventName").isin(ChangeEvent.Upserts: _*))
      .withColumn("record", dynamoAttrDecode(col("newImage")))
      .select(col("key"), col("record"), col("ts"))
    decoded.writeStream
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        StagedFiles.stageBatch(batch.sparkSession, batch, stageRoot, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Warehouse record schema for the staged trades-shaped records
    * (FIXTURES §A5 — the reference's Redshift DDL at
    * `/root/reference/source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:74-82`;
    * `super` columns become typed structs, §1.2). */
  val TradeWarehouseSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("record", StringType),
    StructField("ts", TimestampType)))

  /** One warehouse-load tick (operators A11–A14): list unprocessed staged
    * files, append to the warehouse, archive. Crash-safe exactly-once —
    * see [[graft.cdc.StagedFiles.loadUnprocessed]]. */
  def loadTick(spark: SparkSession, stageRoot: String,
      warehouseDir: String): Int =
    StagedFiles.loadUnprocessed(spark, stageRoot, warehouseDir,
      TradeWarehouseSchema)
}
