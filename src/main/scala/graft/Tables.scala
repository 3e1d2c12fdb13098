package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet testdata.
  *
  * Mirrors the reference's fixed namespace of source/warehouse tables
  * (RDS `rds_cdc_table`, Redshift `db.schema.table` — see
  * `/root/reference/cdk_infrastructure/__init__.py:140-273` and
  * `source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:74-89`)
  * re-expressed as a parquet-backed Spark catalog: one directory per scale
  * factor, one parquet file per table.
  *
  * All readers go through here so every query gets the same pruned,
  * vectorized parquet scan (column pruning + predicate pushdown reach the
  * scan automatically because we hand Catalyst a plain `spark.read.parquet`).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table of the scale-factor directory. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")

  /** The events table exposes BOTH, whatever the generator wrote:
    *   - `ts`    TIMESTAMP (microsecond, UTC) — for calendar functions;
    *   - `ts_ns` BIGINT epoch-nanos — the exact, total ordering key
    *     (equals DuckDB's `epoch_ns(ts)`, so oracle ordering agrees even
    *     if sub-microsecond components ever appear).
    *
    * The physical `ts` column has shipped in two shapes across testdata
    * generations, so normalization is schema-adaptive:
    *   - TIMESTAMP(NANOS) parquet timestamps, which Spark's vectorized
    *     reader rejects outright ([PARQUET_TYPE_ILLEGAL]) — read as raw
    *     INT64 nanos (`spark.sql.legacy.parquet.nanosAsLong`), then
    *     ts = micros(ns div 1000), ts_ns = the long itself;
    *   - TIMESTAMP(MICROS) (plain timestamp[us], arriving as NTZ) —
    *     ts = cast to session-UTC TIMESTAMP, ts_ns = unix_micros × 1000
    *     (sessions pin UTC, so the NTZ→LTZ cast is deterministic and
    *     DuckDB's epoch_ns(ts) equals ts_ns exactly).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
          .withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
