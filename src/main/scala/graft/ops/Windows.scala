package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Group W — window functions (SURVEY §2.B group W).
  *
  * Grounding:
  *  - last-write-wins upsert by partition key (DynamoDB `put_item`):
  *    `/root/reference/source/load_data_to_dynamodb_lambda/handler.py:12-15`,
  *    key definition `/root/reference/cdk_infrastructure/__init__.py:287-289`
  *  - running `BALANCE AMT` column of the txns fixture
  *    (`/root/reference/source/load_data_to_rds_lambda/txns.csv:2`, cols 6-8)
  *  - lag/lead = CDC change-vs-previous diffing.
  *
  * Scale: each window partitions by a key (user_id / custkey) — one
  * shuffle on the partition key, then per-partition sort. No global sort,
  * no driver state. Skewed users would be the hazard at 100 TB; the
  * partition key cardinality here (users, customers) is high relative to
  * executor count, and AQE handles residual skew.
  *
  * Determinism: (user_id, ts) is unique in the events table (verified),
  * and every orderBy adds event_id/orderkey as a total tiebreak anyway.
  */
object Windows {

  /** w_last_wins_dedup — the A5 upsert semantics materialized in batch:
    * keep the latest event per user_id. */
  def lastWinsDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** w_running_balance — cumulative sum per key in event order (the
    * BALANCE AMT column). Values sum as exact integer cents so every
    * prefix sum is exact regardless of physical partitioning. */
  def runningBalance(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), col("value"),
        (sum(graft.functions.DetMath.cents(col("value"))).over(w)
          .cast(DoubleType) / lit(100.0)).as("balance"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w_running_distinct — running COUNT(DISTINCT event_type) per user in
    * event order ("how many distinct behaviors has this user shown so
    * far"). Spark, like most engines, rejects COUNT(DISTINCT) OVER a
    * running frame; the scalable rewrite is exact and two-pass: flag
    * each row that is the FIRST occurrence of its (user, type), then
    * running-sum the flags. State per window is a single counter — no
    * per-frame distinct set, so the frame never holds data, which is
    * the property that survives 100 TB (a naive per-frame set is O(n²)
    * memory-churn on long user histories). Two shuffles: (user, type)
    * for the flag, (user) for the cumsum — both keyed, no global sort. */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_ns"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("first_seen",
        when(row_number().over(wFirst) === 1, lit(1L)).otherwise(lit(0L)))
      .select(col("user_id"), col("event_id"), col("event_type"),
        sum(col("first_seen")).over(wRun).as("n_types_seen"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w_rolling_median — exact rolling median of the last 10 values per
    * user in event order (the anomaly/fraud baseline shape: "how does
    * this value compare to the user's recent typical"). The median runs
    * over integer CENTS, so sorting inside the frame is exact and the
    * even-count interpolation (a+b)/2 is one correctly-rounded double
    * op — bit-equal cross-engine (probed: Spark `percentile` ==
    * DuckDB `quantile_cont` on all 10k rows). Scale: a bounded ROWS
    * frame holds ≤10 values per row — O(frame) state, one shuffle on
    * the user key, no global sort. */
  def rollingMedian(spark: SparkSession, dir: String, frame: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(-(frame - 1), Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_ns"),
        graft.functions.DetMath.cents(col("value")).as("v_cents"))
      .withColumn("med", expr("percentile(v_cents, 0.5)").over(w))
      .drop("ts_ns")
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w_rank_topn_per_group — top-N orders per customer by total price. */
  def rankTopNPerGroup(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rnk", rank().over(w).cast(LongType))
      .filter(col("rnk") <= n)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"), col("o_orderkey"))
  }

  /** w_ntile_pctrank — distribution windows: quartile bucket and percent
    * rank of each order within its status group. percent_rank is the
    * exact rational (rank-1)/(n-1) — identical across engines.
    *
    * Scale caveat (inherent to ntile/percent_rank): the partition key
    * here has 3 values, so each partition is one global sort of ~n/3 rows
    * on a single task — ntile's semantics NEED the whole partition
    * ordered in one place, there is no partial-aggregation escape. At
    * warehouse scale use a higher-cardinality partition key, or replace
    * exact quartiles with approx_percentile cutpoints (one pass,
    * mergeable sketches) when bucket boundaries are all that's needed. */
  def ntilePctRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pct_rank"))
      .orderBy(col("o_orderkey"))
  }

  /** w_lag_lead — change-vs-previous per key (CDC diffing): previous value
    * and delta per user ordered by time. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        round(col("value") - lag(col("value"), 1).over(w), 2).as("delta"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w_first_last — frame-based value windows: each event annotated with
    * its user's first, last, and second value over the FULL partition
    * frame (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING — last_value
    * over the default frame would be the current row, the classic
    * frame-semantics trap this query pins cross-engine). */
  def firstLast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"), col("value"),
        first(col("value")).over(w).as("first_value"),
        last(col("value")).over(w).as("last_value"),
        nth_value(col("value"), 2).over(w).as("second_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** w_scd2 — slowly-changing-dimension type 2 from the changelog: each
    * event per key becomes a VERSION with a validity interval
    * [valid_from, valid_to) closed by the next change; the open version
    * is current. This is what the reference's warehouse would keep if it
    * versioned instead of overwriting (its upsert at
    * `load_data_to_dynamodb_lambda/handler.py:12-15` keeps only the last
    * image; SCD2 is the auditable form every CDC warehouse eventually
    * needs). One shuffle on the key, one per-partition sort — the lead()
    * closes intervals with no self-join. Times in epoch micros (the
    * shared exact domain); valid_to_us stays NULL on the current row and
    * is never a sort key (NULLS-order trap). */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("us", expr("ts_ns div 1000"))
      .select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("us").as("valid_from_us"),
        lead(col("us"), 1).over(w).as("valid_to_us"),
        lead(col("us"), 1).over(w).isNull.as("is_current"))
      // event_id tiebreak: valid_from_us is micro-truncated, so same-user
      // same-microsecond events would otherwise make the output order
      // engine-nondeterministic (the hash-gate total-order rule)
      .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
  }
}
