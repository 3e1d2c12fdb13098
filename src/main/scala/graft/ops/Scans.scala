package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Group S — scans, projection, type conversion (SURVEY §2.B group S).
  *
  * Behavior grounded in the reference's ingest normalization:
  *  - header-normalized projection/rename:
  *    `/root/reference/source/load_data_to_rds_lambda/handler.py:24-27`
  *  - money-string → decimal cleanup (txns.csv money format `"  1,000,000.00 "`):
  *    `/root/reference/source/load_data_to_rds_lambda/txns.csv:2`
  *  - `d-MMM-yy` date handling: same fixture, parsed here into typed parts
  *  - semi-structured JSON extraction (`COPY … format as json 'auto'` /
  *    Redshift `super` columns):
  *    `/root/reference/source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:74-93`
  *
  * Determinism contract (SURVEY §2.B): total ORDER BY over key columns,
  * money through exact DECIMAL(18,2) then cast to DOUBLE, no raw timestamp
  * outputs (date / bigint epoch only) so the parquet↔DuckDB hash compare
  * is stable.
  */
object Scans {

  /** Normalize a raw header name the way the reference does:
    * spaces → underscores, lowercased
    * (`load_data_to_rds_lambda/handler.py:24-27`). */
  def normalizeName(raw: String): String = raw.replace(" ", "_").toLowerCase

  /** Apply header normalization to every column of a frame (operator A2). */
  def normalizeHeader(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  /** s_scan_project_rename — select + rename + reorder, the A2 shape. */
  def scanProjectRename(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        col("l_returnflag").as("return_flag"),
        col("l_linestatus").as("line_status"),
        col("l_quantity").as("quantity"))
      .orderBy(col("order_key"), col("line_number"))

  /** s_cast_money_decimal — clean a padded, comma-grouped money string and
    * cast to DECIMAL(18,2) (txns.csv shape). The dirty string is built
    * deterministically from l_extendedprice so Spark and the oracle see
    * byte-identical inputs. */
  def castMoneyDecimal(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("money_str",
        concat(lit("  1,"),
          col("l_extendedprice").cast(DecimalType(18, 2)).cast(StringType),
          lit(" ")))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("money_str"),
        regexp_replace(trim(col("money_str")), ",", "")
          .cast(DecimalType(18, 2)).cast(DoubleType).as("amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** s_parse_date — typed date-part derivation of the `29-Jun-17` fixture
    * semantics: year / month / day / quarter + a DATE-typed column. */
  def parseDate(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        year(col("l_shipdate")).cast(LongType).as("ship_year"),
        month(col("l_shipdate")).cast(LongType).as("ship_month"),
        dayofmonth(col("l_shipdate")).cast(LongType).as("ship_day"),
        quarter(col("l_shipdate")).cast(LongType).as("ship_quarter"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** s_date_arith — calendar arithmetic over ship dates: day offsets,
    * day difference to a fixed epoch, month truncation, last-of-month. */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        date_add(col("l_shipdate").cast(DateType), 30).as("ship_plus_30"),
        datediff(col("l_shipdate").cast(DateType),
          lit("1995-01-01").cast(DateType)).cast(LongType).as("days_since_95"),
        trunc(col("l_shipdate").cast(DateType), "mm").as("ship_month_start"),
        last_day(col("l_shipdate").cast(DateType)).as("ship_month_end"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** s_json_extract — typed extraction from a semi-structured JSON column
    * (the `super` / `json 'auto'` analog, A13). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy(col("event_id"))

  /** s_variant_super — the Redshift `super` column analog done the
    * Spark-4-native way: parse the JSON props into a VARIANT value and
    * extract typed fields with variant_get (SURVEY §1.2 — the reference
    * lands semi-structured DynamoDB images in `super` columns via
    * `COPY … json 'auto'`). Unlike get_json_object (string re-parse per
    * extraction), the variant binary encoding parses once. */
  def variantSuper(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        try_variant_get(col("v"), "$.k", "bigint").as("k"),
        is_variant_null(col("v")).as("is_null"))
      .orderBy(col("event_id"))

  /** s_string_funcs — the reference's name-normalization string ops (A2)
    * exercised over `part`. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        trim(col("p_brand")).as("brand_trim"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).cast(LongType).as("name_len"))
      .orderBy(col("p_partkey"))

  /** s_math_funcs — amount arithmetic of the txns fixture
    * (withdrawals/deposits/balance columns): + - * /, abs, round,
    * greatest/least over lineitem prices. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        graft.functions.DetMath.round2(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
        graft.functions.DetMath.round2(
          col("l_extendedprice") * col("l_tax")).as("tax_amt"),
        abs(col("l_discount") - col("l_tax")).as("disc_tax_gap"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** s_day_pruned — a one-day query served from the materialized
    * day-partitioned events layout (`Layout.ensureDayLayout`): the day
    * predicate becomes a PARTITION filter, so the scan opens only that
    * day's directory (PlanSpec-asserted) — at 100 TB the difference
    * between scanning the corpus and reading one day. Result is
    * logically identical to filtering the raw table (the oracle's
    * form). */
  def dayPruned(spark: SparkSession, dir: String,
      day: String = "2024-01-15"): DataFrame = {
    val path = Layout.ensureDayLayout(spark, dir)
    Layout.readDay(spark, path, day)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** s_zorder_pruned — a TWO-dimensional range query served from the
    * Z-ORDER clustered events layout (`Layout.ensureZOrderLayout`):
    * `user_id` band × `ts` window. The day layout answers time
    * predicates by directory pruning but nothing helps a user predicate
    * there; the z-layout's Morton-interleaved sort makes row groups
    * ~square (user, time) tiles, so parquet min/max footer stats skip
    * in BOTH dimensions (the Delta/Iceberg OPTIMIZE ZORDER technique;
    * skip ratios measured in ZOrderSpec against a linear sort). Result
    * is logically identical to filtering the raw table — the oracle's
    * form; the layout only changes WHICH bytes the scan touches. */
  def zorderPruned(spark: SparkSession, dir: String,
      uLo: Long = 3, uHi: Long = 9,
      tLo: String = "2024-01-10", tHi: String = "2024-01-20"): DataFrame = {
    val path = Layout.ensureZOrderLayout(spark, dir)
    spark.read.parquet(path)
      .filter(col("user_id").between(uLo, uHi) &&
        col("ts") >= to_timestamp(lit(tLo)) && col("ts") < to_timestamp(lit(tHi)))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** The same 2-d box over the HILBERT-clustered layout
    * (`s_hilbert_pruned`): identical logical result, the scan touches
    * the row groups the continuous curve's (fewer) runs intersect. */
  def hilbertPruned(spark: SparkSession, dir: String,
      uLo: Long = 3, uHi: Long = 9,
      tLo: String = "2024-01-10", tHi: String = "2024-01-20"): DataFrame = {
    val path = Layout.ensureHilbertLayout(spark, dir)
    spark.read.parquet(path)
      .filter(col("user_id").between(uLo, uHi) &&
        col("ts") >= to_timestamp(lit(tLo)) && col("ts") < to_timestamp(lit(tHi)))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }
}
