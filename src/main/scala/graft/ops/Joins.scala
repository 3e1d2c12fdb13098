package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Group J — joins (SURVEY §2.B group J).
  *
  * Grounding: the warehouse star-schema the reference's pipeline exists to
  * serve (`/root/reference/README.md:3` — "OLAP data warehouse for easy
  * querying for business analytics"), and the two-sided reconciliation /
  * divergence checks of A19
  * (`/root/reference/source/start_dms_replication_task_lambda/handler.py:27-73`,
  * deleted-records divergence `README.md:30`).
  *
  * Scale notes (the 100 TB stance):
  *  - dimension tables (region/nation/supplier/part/customer) are tiny
  *    relative to the fact tables → explicit `broadcast()` hints, so the
  *    fact side never shuffles for the dim join even if AQE stats are
  *    missing at plan time;
  *  - the one genuinely large join (lineitem ⋈ orders) is a plain equi-join
  *    on the natural key — Catalyst/AQE picks shuffled hash / sort-merge
  *    and handles skew (AQE skew-join splitting);
  *  - semi/anti joins ship only the key column of the probe side.
  */
object Joins {

  /** j_broadcast_dim — fact ⋈ small dims with broadcast hash joins:
    * customers per region via customer ⋈ nation ⋈ region. */
  def broadcastDim(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        graft.functions.DetMath.sumMoney(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"))

  /** j_multiway_star — the flagship: revenue by region across the full
    * star (lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region).
    * lineitem⋈orders is the only big-big join. nation/region carry
    * explicit broadcast hints (25 / 5 rows at ANY scale factor — fixed
    * dimension cardinality); customer does NOT: it grows with the scale
    * factor, so the hint that helps at sf0.1 forces a multi-GB broadcast
    * build (executor OOM) at 100×. AQE picks BHJ while stats say small
    * and SMJ/shuffled-hash once they say big (PlanSpec asserts both). */
  def multiwayStar(spark: SparkSession, dir: String): DataFrame =
    starAgg(spark, dir,
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey")))

  /** j_star_bucketed — the same star query reading lineitem/orders from
    * the bucketed warehouse tables ([[Layout.ensureBucketedStar]]): the
    * big-big join consumes co-located buckets, so it plans with ZERO
    * exchanges on either fact side (PlanSpec-asserted) — the shuffle that
    * dominates j_multiway_star at 100 TB was paid once, at write time.
    * First invocation materializes the tables (idempotent, freshness-
    * checked); steady state is the read-only fast path — exactly the
    * reference warehouse's reason to exist (`/root/reference/README.md:3`). */
  def multiwayStarBucketed(spark: SparkSession, dir: String): DataFrame = {
    val (li, ord) = Layout.ensureBucketedStar(spark, dir)
    starAgg(spark, dir,
      spark.table(li).join(spark.table(ord),
        col("l_orderkey") === col("o_orderkey")))
  }

  /** The bucketed star with STATISTICS-DRIVEN hot-key isolation — the
    * mitigation for the measured bucketed-skew trap (RelScaleBench:
    * a zipf-hot orderkey lands every hot row in ONE bucket, and AQE's
    * OptimizeSkewedJoin cannot split it because the bucketed SMJ has no
    * exchange to rewrite; the hot bucket becomes the straggler task).
    * [[SkewOps.hotKeysFromStats]] runs its Misra-Gries pass over the
    * bucketed fact (≤ k+1 rows shipped per partition — at 100 TB this
    * reads the key column once, shuffles nothing of the fact), and any
    * detected hot keys are ISOLATED before the bucket-local join: the
    * hot keys' orders rows (a handful — hot keys are hot by PROBE
    * fan-in) broadcast to meet the hot lineitem rows map-side, while
    * the cold branch keeps the exchange-free bucket-to-bucket SMJ —
    * filters preserve the scan's bucket partitioning, so isolation
    * costs the cold path nothing. No hot keys detected → exactly
    * [[multiwayStarBucketed]]'s plan. Semantically invisible
    * (branches partition the key space; spec-pinned equal rows). */
  def multiwayStarBucketedSkewAware(spark: SparkSession, dir: String,
      frac: Double = 0.01): DataFrame = {
    val (li, ord) = Layout.ensureBucketedStar(spark, dir)
    val liT = spark.table(li)
    val ordT = spark.table(ord)
    val cond = col("l_orderkey") === col("o_orderkey")
    val hot = SkewOps.hotKeysFromStats(liT, "l_orderkey", frac)
    val factJoin =
      if (hot.isEmpty) liT.join(ordT, cond)
      else {
        val hotLi = liT.filter(col("l_orderkey").isin(hot: _*))
        val coldLi = liT.filter(!col("l_orderkey").isin(hot: _*))
        val hotOrd = ordT.filter(col("o_orderkey").isin(hot: _*))
        val coldOrd = ordT.filter(!col("o_orderkey").isin(hot: _*))
        hotLi.join(broadcast(hotOrd), cond)
          .unionByName(coldLi.join(coldOrd, cond))
      }
    starAgg(spark, dir, factJoin)
  }

  /** Shared star tail: fact-join frame ⋈ dims → revenue by region. */
  private def starAgg(spark: SparkSession, dir: String,
      factJoin: DataFrame): DataFrame =
    factJoin
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        graft.functions.DetMath.sumMoneyCents(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))

  /** j_left_outer — null-preserving outer join + aggregate: order count and
    * spend per customer, keeping customers with no orders (the reference's
    * warehouse keeps rows whose source rows disappeared, README.md:30). */
  def leftOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(
          graft.functions.DetMath.sumMoney(col("o_totalprice")),
          lit(0.0)).as("total_spend"))
      .orderBy(col("c_custkey"))

  /** j_semi — EXISTS: orders that have at least one lineitem ("already
    * replicated" check). Left-semi ships only l_orderkey. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** j_anti — NOT EXISTS: customers with no orders (divergence/lag
    * detection, A19 / README.md:30). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** j_full_outer — two-sided divergence reconcile: purchase counts vs
    * error counts per (user, day), keeping keys present on EITHER side
    * (the A19 reconciliation shape when both series can have gaps —
    * `start_dms_replication_task_lambda/handler.py:27-73` compares
    * counts that may each be missing). Completes the join-type matrix
    * (inner/left/semi/anti/as-of/band/bucketed/salted are elsewhere).
    *
    * Scale: both sides are PRE-aggregated to (user, day) before the
    * join, so the shuffle carries one row per key per side, not raw
    * events; the aggregation's hash partitioning on exactly the join
    * keys is reused by the join (no extra exchange). The day is the
    * TZ-free integer epoch day from the nanos column — a pure function
    * of the data, like the day-partitioned layout (ops/Layout). */
  def fullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def daily(tpe: String, cnt: String, u: String, d: String) =
      ev.filter(col("event_type") === tpe)
        .groupBy(
          col("user_id").as(u),
          // exact integer division: ts_ns (~1.6e18) exceeds double's 2^53
          // exact range, so floor(ts_ns / N) could round an event within
          // ~128 ns of midnight onto the wrong day at sub-micro granularity
          expr("ts_ns div 86400000000000").as(d))
        .agg(count(lit(1)).as(cnt))
    val p = daily("purchase", "n_purchases", "p_user", "p_day")
    val e = daily("error", "n_errors", "e_user", "e_day")
    p.join(e, col("p_user") === col("e_user") && col("p_day") === col("e_day"),
        "full_outer")
      .select(
        coalesce(col("p_user"), col("e_user")).as("user_id"),
        coalesce(col("p_day"), col("e_day")).as("epoch_day"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("n_errors"), lit(0L)).as("n_errors"))
      .orderBy(col("user_id"), col("epoch_day"))
  }

  /** j_range_band — non-equi BAND join: every event assigned to its
    * value tier by `lo <= value < hi`. Completes the join matrix with
    * the range/banding shape (equi, outer, semi, anti, as-of, salted,
    * bucketed, interval are elsewhere). Scale stance: a non-equi join
    * has no hash key, so the ONLY viable plan is broadcasting the tiny
    * band table (BroadcastNestedLoopJoin over a handful of tiers) — the
    * hint makes that explicit; with a large band table the right tool is
    * the as-of/interval composition instead. Tier bounds are integer
    * cents so the banding is exact cross-engine. */
  def rangeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("t1_small", 0L, 10000L),
      ("t2_mid", 10000L, 50000L),
      ("t3_large", 50000L, Long.MaxValue))
      .toDF("tier", "lo_cents", "hi_cents")
    Tables.events(spark, dir)
      .select(graft.functions.DetMath.cents(col("value")).as("cents"))
      .join(broadcast(tiers),
        col("cents") >= col("lo_cents") && col("cents") < col("hi_cents"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("cents")).as("sum_cents"))
      .orderBy(col("tier"))
  }

  /** j_fuzzy — FUZZY ENTITY-MATCHING join at edit distance ≤ 1 via the
    * FastSS deletion-neighborhood identity (Bocek et al. 2007):
    * lev(a, b) ≤ 1 ⟺ the sets {a} ∪ deletions₁(a) and {b} ∪
    * deletions₁(b) intersect — so the candidate step is an EXACT
    * equi-join on exploded variants (each row fans out to len+1 short
    * strings; one hash shuffle on the variant) and a codegen'd
    * `levenshtein` verify kills the ≤-distance-2 false candidates the
    * identity admits. NO pairwise pass ever happens: cost is
    * O(rows × len) candidates vs the O(n²) cross-join-levenshtein a
    * naive matcher runs — at 100 TB of entities the latter does not
    * terminate. The dirty side is a deterministic 1-char-deletion
    * corruption of the %3=1 customers (the classic dirty-record
    * linkage fixture, derived from the table itself so the DuckDB
    * oracle replays it exactly); ambiguous dirty records legitimately
    * match several masters and ALL verified pairs are emitted. */
  def fuzzyNameJoin(spark: SparkSession, dir: String): DataFrame = {
    def withVariants(df: DataFrame, nameCol: String, keep: Seq[String]): DataFrame =
      df.select(keep.map(col) :+ explode(expr(
        s"""array_union(array($nameCol), transform(
           |  sequence(1, length($nameCol)),
           |  i -> concat(substring($nameCol, 1, i - 1),
           |              substring($nameCol, i + 1, length($nameCol)))))"""
          .stripMargin)).as("v"): _*)
    // Spread.wide: the per-row deletion-variant explode (≈|name| string
    // builds per row) runs before the variant exchange, and a
    // single-file customer table plans one scan split (r18)
    val master = graft.ops.Spread.wide(Tables.customer(spark, dir),
        col("c_custkey"))
      .select(col("c_custkey").as("m_id"), col("c_name").as("m_name"))
    val dirty = graft.ops.Spread.wide(Tables.customer(spark, dir),
        col("c_custkey"))
      .where(col("c_custkey") % 3 === 1)
      .select(col("c_custkey").as("d_id"),
        expr("""concat(substring(c_name, 1, (c_custkey % (length(c_name) - 2)) + 1),
               |       substring(c_name, (c_custkey % (length(c_name) - 2)) + 3,
               |                 length(c_name)))""".stripMargin).as("d_name"))
    withVariants(dirty, "d_name", Seq("d_id", "d_name"))
      .join(withVariants(master, "m_name", Seq("m_id", "m_name")), Seq("v"))
      .where(levenshtein(col("d_name"), col("m_name")) <= 1)
      .select(col("d_id"), col("m_id"),
        levenshtein(col("d_name"), col("m_name")).cast("long").as("dist"))
      .distinct()
      .orderBy(col("d_id"), col("m_id"))
  }

  /** j_dpp — DYNAMIC PARTITION PRUNING: the day-partitioned events fact
    * (`Layout.ensureDayLayout`) joined on its PARTITION column to the
    * calendar dimension (`Layout.ensureCalendarDim`) filtered on a dim
    * ATTRIBUTE (weekend: dow_idx ∈ {0, 6}). The qualifying day values
    * are not statically known — they exist only in the dim — so static
    * partition pruning cannot fire; Catalyst instead plants a
    * `dynamicpruning` subquery in the fact scan's PartitionFilters that
    * REUSES the join's broadcast of the filtered dim, and the fact scan
    * opens only the surviving day directories (PlanSpec-asserted). At
    * 100 TB this is the difference between scanning every day and
    * opening 2/7 of them, decided at runtime with zero extra reads —
    * the dim was being broadcast for the join anyway. Compare
    * `s_day_pruned` (static pruning: the day is a literal) and the
    * runtime bloom filter (row-level pruning when the join key is NOT
    * the partition column). */
  def dppWeekend(spark: SparkSession, dir: String): DataFrame = {
    val fact = spark.read.parquet(Layout.ensureDayLayout(spark, dir))
    val dim = spark.read.parquet(Layout.ensureCalendarDim(spark, dir))
      .filter(col("dow_idx").isin(0, 6))
    fact.join(broadcast(dim), Seq("day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }
}
