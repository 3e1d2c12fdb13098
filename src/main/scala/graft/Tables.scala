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

  /** The events table is written with TIMESTAMP(NANOS) parquet timestamps,
    * which Spark's vectorized reader rejects outright
    * ([PARQUET_TYPE_ILLEGAL]). We read nanos as raw INT64
    * (`spark.sql.legacy.parquet.nanosAsLong`) and expose BOTH:
    *   - `ts`    TIMESTAMP (microsecond, UTC) — for calendar functions;
    *   - `ts_ns` BIGINT epoch-nanos — the exact, total ordering key
    *     (equals DuckDB's `epoch_ns(ts)`, so oracle ordering agrees even
    *     if sub-microsecond components ever appear).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
