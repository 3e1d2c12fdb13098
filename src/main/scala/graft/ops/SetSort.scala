package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Group O — sort / limit / set operations (SURVEY §2.B group O).
  *
  * Grounding:
  *  - lexicographically-sortable timestamped staging keys (newest/oldest
  *    ordering): `/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:44-48`
  *  - append-only accumulation (no-PK inserts):
  *    `/root/reference/source/load_data_to_rds_lambda/handler.py:36-49`
  *  - source−target divergence (EXCEPT / INTERSECT reconciliation):
  *    `/root/reference/README.md:30`, A19.
  *
  * Scale: ORDER BY + LIMIT plans as TakeOrderedAndProject (per-partition
  * top-k, then k·partitions rows to the driver — no global sort). UNION ALL
  * is a zero-shuffle concatenation. EXCEPT/INTERSECT shuffle only the key
  * column.
  */
object SetSort {

  /** o_unpivot — long-format melt of the lineitem measures: each row's
    * (quantity, price, discount-cents, tax-cents) become (metric, value)
    * rows — the inverse of g_pivot and the shape feature pipelines want
    * (one row per measurement). Spark's unpivot/melt is a zero-shuffle
    * Expand: output = 4× input rows with NO exchange, so it scales as a
    * pure map stage. Measures normalized to integer cents/units so the
    * melted value column is one exact BIGINT domain. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(LongType).as("quantity"),
        graft.functions.DetMath.cents(col("l_extendedprice")).as("price_cents"),
        graft.functions.DetMath.cents(col("l_discount")).as("discount_cents"),
        graft.functions.DetMath.cents(col("l_tax")).as("tax_cents"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("price_cents"),
          col("discount_cents"), col("tax_cents")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /** o_sort_limit — newest k events (the staged-file ordering shape).
    * Plans as TakeOrderedAndProject: no full sort at any scale. */
  def sortLimit(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("ts_ns").desc, col("event_id").desc)
      .limit(k)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** o_union_append — two appended slices re-aggregated (A3 append-only
    * multiset semantics: duplicates are preserved by UNION ALL). */
  def unionAppend(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val early = li.filter(col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
    val late  = li.filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType))
    early.unionByName(late)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** o_except_reconcile — key-set divergence: customers never seen on the
    * order side (source minus target keys, A19). */
  def exceptReconcile(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("custkey"))
      .except(Tables.orders(spark, dir).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))

  /** o_intersect — keys replicated on both sides. */
  def intersectKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("custkey"))
      .intersect(Tables.orders(spark, dir).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
}
