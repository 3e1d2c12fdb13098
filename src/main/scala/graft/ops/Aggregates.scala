package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Group G — aggregation (SURVEY §2.B group G).
  *
  * Grounding:
  *  - COUNT(*) reconciliation between source and warehouse:
  *    `/root/reference/source/start_dms_replication_task_lambda/handler.py:27-73`
  *  - per-account rollups over the txns fixture / "easy querying for
  *    business analytics" (`/root/reference/README.md:3`).
  *
  * All aggregates here are plain `groupBy().agg()` — Catalyst plans them
  * as partial (map-side) + final hash aggregation automatically, which is
  * the scale path: the shuffle carries one row per (group × partition),
  * not per input row.
  *
  * Money determinism: doubles are converted to exact integer cents BEFORE
  * summation (DetMath.sumMoney) so totals are exact and associative — safe
  * under any partitioning — and long-sum aggregation codegens tighter than
  * decimal-sum; the single final divide restores DOUBLE for the hash.
  */
object Aggregates {

  private def moneySum(c: String): org.apache.spark.sql.Column =
    graft.functions.DetMath.sumMoney(col(c))

  /** g_count_star — the A19 reconciliation count. */
  def countStar(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).groupBy().agg(count(lit(1)).as("cnt"))

  /** g_group_agg — TPC-H Q1-shaped rollup: sum/avg/min/max/count per
    * (returnflag, linestatus). */
  def groupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum("l_extendedprice").as("sum_price"),
        graft.functions.DetMath.round2(avg(col("l_quantity"))).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** g_distinct — exact distinct counts (the oracle-able variant;
    * `approx_count_distinct` lives in [[approxDistinct]]). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** g_topk_agg — top-3 events per type via a custom TYPED Aggregator
    * ([[graft.functions.TopKAggregator]]): a bounded heap per group with
    * partial (map-side) aggregation, so the shuffle carries ≤ k pairs
    * per group per partition instead of every row — the scale-correct
    * alternative to window row_number(), which must sort each group's
    * full row set ("top 3 per type" at 100 TB must not sort 100 TB).
    * Result is identical to the window form (oracle SQL is the window
    * form) — same cents domain, same DESC/id tiebreak. */
  def topKPerGroup(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    topKFromEvents(spark, Tables.events(spark, dir), k)

  /** [[topKPerGroup]] over an arbitrary events frame (event_type,
    * event_id, value) — lets RelScaleBench drive the bounded-heap plan
    * against replicated corpora without a Tables indirection. */
  def topKFromEvents(spark: SparkSession, events: DataFrame,
      k: Int): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    events
      .select(col("event_type"), col("event_id"),
        graft.functions.DetMath.cents(col("value")).as("cents"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("topk"))
      .toDF("event_type", "topk")
      .select(col("event_type"), posexplode(col("topk")))
      .select(col("event_type"), (col("pos") + 1).cast(LongType).as("rank"),
        col("col._2").as("event_id"), col("col._1").as("value_cents"))
      .orderBy(col("event_type"), col("rank"))
  }

  /** g_hll_merge — MERGEABLE distinct-count sketches: per-day HLL
    * sketches per event type, unioned and estimated per type. The point
    * is the re-aggregation algebra: daily partials are tiny fixed-size
    * binaries a warehouse materializes once, and any rollup (weekly,
    * all-time, cross-type) is a sketch union — no raw re-scan, which at
    * 100 TB is the only affordable way to serve distinct-count rollups.
    * Not DuckDB-oracled (DataSketches binary ≠ DuckDB's HLL); scalatest
    * bounds the estimate against the exact count. */
  def hllMergeDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_users"), count(lit(1)).as("n_partials"))
      .orderBy(col("event_type"))

  /** g_grouping_sets — explicit GROUPING SETS with NON-hierarchical
    * sets: the per-type and per-year marginals in one pass — a shape
    * neither rollup nor cube expresses (rollup is the prefix chain, cube
    * the power set). One aggregation with an Expand feeding both sets;
    * absent keys coalesced to sentinels for hash-stable output. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("yr", year(col("ts")).cast(LongType))
      .groupingSets(
        Seq(Seq(col("event_type")), Seq(col("yr"))),
        col("event_type"), col("yr"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("value")).as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("<all>")).as("event_type"),
        coalesce(col("yr"), lit(-1L)).as("yr"),
        col("cnt"), col("sum_value"))
      .orderBy(col("event_type"), col("yr"))

  /** g_profile — column profiling over the melted measures: row count,
    * distinct count, min and max per metric in one aggregation — the
    * warehouse-side data-quality profile (the observability face of the
    * reference's COUNT(*) reconciliation, generalized per column).
    * Composes o_unpivot's zero-shuffle melt with one hash aggregation. */
  def profileMeasures(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SetSort.unpivotMeasures(spark, dir)
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .orderBy(col("metric"))

  /** g_pivot — wide-format rollup: order counts and money per priority,
    * one COLUMN per order status (the warehouse report shape; the
    * reference's analysts "easily query" exactly such pivots,
    * `README.md:3`). Spark's pivot with an EXPLICIT value list is one
    * hash aggregation — same single shuffle as the long-format groupBy;
    * omitting the list would add a driver-side distinct-scan job. Money
    * as integer cents (DetMath) keeps the pivoted sums hash-exact. */
  def pivotStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"), moneySum("o_totalprice").as("price"))
      // pivot names columns <value>_<agg-alias>; normalize to snake_case
      .withColumnsRenamed(Map(
        "F_cnt" -> "f_cnt", "F_price" -> "f_price",
        "O_cnt" -> "o_cnt", "O_price" -> "o_price",
        "P_cnt" -> "p_cnt", "P_price" -> "p_price"))
      // a (priority, status) combo with no rows pivots to NULL while a
      // filtered COUNT is 0 — pin the count convention to 0 (sums stay
      // NULL-on-empty in both engines)
      .select(col("o_orderpriority"),
        coalesce(col("f_cnt"), lit(0L)).as("f_cnt"), col("f_price"),
        coalesce(col("o_cnt"), lit(0L)).as("o_cnt"), col("o_price"),
        coalesce(col("p_cnt"), lit(0L)).as("p_cnt"), col("p_price"))
      .orderBy(col("o_orderpriority"))

  /** g_approx_distinct — HyperLogLog++ sketch counts: the scale path for
    * distinct cardinality (no exact-distinct double shuffle). Not DuckDB-
    * oracled (different sketch); rows-only check + scalatest bound. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  /** g_rollup — multi-level business rollup over events:
    * (event_type, year) with subtotals and a grand total. Rollup nulls are
    * disambiguated via coalesce so the output is total-orderable and
    * null-free (cross-engine hash stability). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(col("event_type"), year(col("ts")).cast(LongType).as("yr"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("value")).as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("<all>")).as("event_type"),
        coalesce(col("yr"), lit(-1L)).as("yr"),
        col("cnt"), col("sum_value"))
      .orderBy(col("event_type"), col("yr"))

  /** g_cube — full cube over (status, priority): every subtotal
    * combination, GROUPING-disambiguated via coalesce for hash-stable
    * null-free output. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("o_totalprice")).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("cnt"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  /** g_percentile — exact interpolated percentiles per group (the
    * distribution profile a warehouse dashboard wants). Exact
    * `percentile` (sort-based), not `percentile_approx`: the approx
    * sketch would differ from the oracle. */
  def percentileAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** g_approx_percentile — the SCALE path for [[percentileAgg]]: exact
    * `percentile` must materialize and sort every group's values (one
    * giant sorted buffer per group at 100 TB); `approx_percentile` keeps
    * a bounded mergeable sketch per partition (map-side combined, error ≤
    * 1/accuracy), which is the only shape that survives a hot group.
    * Sketch ≠ DuckDB's exact interpolation → declared rows-only; the
    * scalatest proof bounds it against the exact form. */
  def approxPercentileAgg(spark: SparkSession, dir: String,
      accuracy: Int = 10000): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $accuracy)").as("median_qty"),
        expr(s"approx_percentile(l_extendedprice, 0.25, $accuracy)").as("p25_price"),
        expr(s"approx_percentile(l_extendedprice, 0.95, $accuracy)").as("p95_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** g_having — post-aggregation group filter: customers with more than
    * `minOrders` orders. */
  def havingAgg(spark: SparkSession, dir: String, minOrders: Long = 5): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        graft.functions.DetMath.sumMoney(col("o_totalprice")).as("total_spend"))
      .filter(col("n_orders") > minOrders)
      .orderBy(col("o_custkey"))

  /** g_corr — covariance / Pearson correlation per group, determinism-
    * right like [[statsAgg]]: engines' built-in corr() accumulates
    * doubles in partition order and diverges in the last ulp, so the
    * moments are EXACT BIGINT sums (Σx, Σy, Σxy, Σx², Σy² of quantity ×
    * discount-cents — both small integers, so every product of the
    * combination stays far under 2^63 at any tested sf) combined by one
    * double expression at the end. The same partial-sum shape is what a
    * 100 TB engine ships per partition: five longs per group, map-side
    * combined, order-insensitive. */
  def corrAgg(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast(LongType)
    val y = graft.functions.DetMath.cents(col("l_discount"))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"),
        sum(x * x).as("sx2"), sum(y * y).as("sy2"))
      .select(
        col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast(DoubleType) / (col("n") * (col("n") - 1))).as("covar"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
          (sqrt((col("n") * col("sx2") - col("sx") * col("sx")).cast(DoubleType)) *
           sqrt((col("n") * col("sy2") - col("sy") * col("sy")).cast(DoubleType))))
          .as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** g_stats — statistical aggregates (variance / stddev of quantity per
    * returnflag) done determinism-right: naive per-engine `stddev` sums
    * doubles in partition order and diverges in the low bits, so this
    * computes from EXACT integer sums (l_quantity is integer-valued) via
    *   var = (n·Σx² − (Σx)²) / (n·(n−1))
    * where the numerator and denominator are exact BIGINTs well under
    * 2⁵³, leaving ONE double division + ONE sqrt — both correctly-rounded
    * IEEE ops, so Spark and DuckDB agree bit-for-bit. The same trick any
    * cross-engine reconciliation of statistical aggregates needs. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity").cast(LongType)
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q).as("sum_qty"),
        sum(q * q).as("sum_qty2"))
      .select(
        col("l_returnflag"), col("n"), col("sum_qty"),
        ((col("n") * col("sum_qty2") - col("sum_qty") * col("sum_qty"))
          .cast(DoubleType) / (col("n") * (col("n") - 1))).as("var_qty"))
      .withColumn("std_qty", sqrt(col("var_qty")))
      .orderBy(col("l_returnflag"))
  }

  /** g_funnel — ordered conversion funnel (the ClickHouse
    * `windowFunnel` shape): per user, how deep into the sequence
    * view → click → purchase did they get, where each stage must occur
    * STRICTLY AFTER the previous stage's first completion. The
    * relational formulation is min-timestamp chaining: t1 = first view;
    * t2 = first click after t1; t3 = first purchase after t2 — each
    * stage a filter + keyed join + min-agg, all partitioned by user_id,
    * so every stage after the first reuses the same hash partitioning
    * (the joins add no exchange on the chained side; only each stage's
    * filtered event scan shuffles once). At 100 TB you'd repartition
    * events by user once and checkpoint before chaining; at bench scale
    * Catalyst's exchange reuse already dedups the scan-side shuffles.
    * Timestamps are epoch MICROS (no TZ, no parse): the oracle engine
    * reads the nanos parquet column truncated to micros, so micros is
    * the shared exact domain — and (user_id, ts) is unique at micros
    * in this table, so strict-after comparisons agree. */
  def funnel(spark: SparkSession, dir: String,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    funnelFrom(
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us")),
      stages)

  /** [[funnel]]'s core over any (user_id, event_type, ts_us) frame —
    * lets scale experiments (RelScaleBench) run the chain on replicated
    * corpora without the table registry. */
  def funnelFrom(ev: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty)
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("ts1_us"))
    // each step: first occurrence of the next stage strictly after the
    // previous stage's first occurrence, left-joined back so partial
    // converters keep their row (tsN_us stays null)
    val chained = stages.tail.zipWithIndex.foldLeft(first) {
      case (acc, (stage, i)) =>
        val prevCol = s"ts${i + 1}_us"
        val thisCol = s"ts${i + 2}_us"
        val next = ev.filter(col("event_type") === stage)
          .join(acc.select(col("user_id"), col(prevCol)), Seq("user_id"))
          .filter(col("ts_us") > col(prevCol))
          .groupBy(col("user_id")).agg(min(col("ts_us")).as(thisCol))
        acc.join(next, Seq("user_id"), "left")
    }
    // ascending fold so the DEEPEST stage's check ends up outermost:
    // when(ts3 != null, 3) else when(ts2 != null, 2) else 1
    val stageExpr = (2 to stages.size).foldLeft(lit(1L)) {
      (els, i) => when(col(s"ts${i}_us").isNotNull, lit(i.toLong)).otherwise(els)
    }
    chained
      .select(col("user_id") +: stageExpr.as("stage") +:
        (1 to stages.size).map(i => col(s"ts${i}_us")): _*)
      .orderBy(col("user_id"))
  }
}
