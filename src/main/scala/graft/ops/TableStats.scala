package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-style column statistics + the static join-strategy decision
  * they exist for (the warehouse's cost-based-optimizer face).
  *
  * The reference's warehouse delegates planning entirely to Redshift,
  * whose ANALYZE-maintained statistics drive distribution choices
  * (`/root/reference/README.md:3` — "easily query" presumes the
  * warehouse plans well without per-query hints). Spark-side, AQE
  * re-plans joins from RUNTIME map-output sizes — but only AFTER both
  * sides have paid their map-side shuffle write. A statistics catalog
  * moves that decision to PLAN time: a dimension that is large on disk
  * but tiny after a selective filter can be broadcast outright, and the
  * fact side then never shuffles at all. At 100 TB that is the
  * difference between "no fact shuffle" and "full fact map-write, then
  * AQE converts" — the map-write alone is the dominant cost.
  *
  * Estimation model (the classic ANALYZE triple, uniformity assumed):
  *  - equality predicate on c: selectivity = 1/ndv(c);
  *  - IN (k literals): k/ndv(c);
  *  - range [lo,hi] on numeric c: (hi−lo)/(max−min), clamped;
  *  - post-filter bytes = rows × selectivity × Σ avg column widths.
  * ndv is HyperLogLog (`approx_count_distinct`, ±~2%) — an exact
  * distinct is its own full shuffle at corpus scale, and a 2% ndv error
  * moves a size ESTIMATE 2%, never the decision boundary material to a
  * 10 MB-vs-10 GB broadcast call. Stats collection itself is ONE
  * partial-aggregating pass over the table (no shuffle of data rows —
  * every aggregate here is algebraic), persisted sig-gated beside the
  * other materialized layouts so steady state reads a catalog of
  * |columns| rows.
  */
object TableStats {

  /** One column's catalog row. min/max carried as strings (the catalog
    * holds heterogeneous column types in one relation; numeric callers
    * parse back — the information-schema convention). */
  case class ColStats(table: String, column: String, nRows: Long,
      nNulls: Long, ndv: Long, avgLen: Double,
      minV: Option[String], maxV: Option[String])

  /** Collect per-column stats in ONE aggregation pass: for each column,
    * nulls, HLL ndv, average serialized width, min and max. The result
    * is |cols| catalog rows from a single 1-row aggregate — driver-sized
    * by construction regardless of table size. */
  def analyzeTable(df: DataFrame, table: String,
      cols: Seq[String]): Seq[ColStats] = {
    val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        approx_count_distinct(col(c)).as(s"${c}__ndv"),
        avg(octet_length(col(c).cast("string"))).as(s"${c}__len"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = r.getAs[Long]("_n")
    cols.map { c =>
      ColStats(table, c, n,
        r.getAs[Long](s"${c}__nulls"),
        r.getAs[Long](s"${c}__ndv"),
        Option(r.getAs[java.lang.Double](s"${c}__len"))
          .fold(0.0)(_.doubleValue),
        Option(r.getAs[String](s"${c}__min")),
        Option(r.getAs[String](s"${c}__max")))
    }
  }

  /** Materialize the stats catalog for `table` under the shared
    * sig-gated layout root: rebuilt only when the source data changes,
    * read as |columns| rows forever after. Returns the catalog path. */
  def ensureCatalog(spark: SparkSession, dir: String, table: String,
      cols: Seq[String]): String = {
    val src = s"$dir/$table.parquet"
    val sig = s"${Layout.dataSig(src)}_c${cols.mkString(",").hashCode}"
    val root = Layout.indexPath(s"stats_$table", dir)
    Layout.ensureSigGated(root, sig) {
      import spark.implicits._
      val rows = analyzeTable(spark.read.parquet(src), table, cols)
      rows.toDS().coalesce(1).write.mode("overwrite")
        .parquet(s"$root/catalog.parquet")
    }
    s"$root/catalog.parquet"
  }

  /** Read the catalog back as a by-column map (|columns| rows). */
  def readCatalog(spark: SparkSession, dir: String, table: String,
      cols: Seq[String]): Map[String, ColStats] = {
    import spark.implicits._
    spark.read.parquet(ensureCatalog(spark, dir, table, cols))
      .as[ColStats].collect().map(s => s.column -> s).toMap
  }

  /** Selectivity of `col = literal` under uniformity: 1/ndv. */
  def equalitySelectivity(s: ColStats): Double =
    1.0 / math.max(1L, s.ndv).toDouble

  /** Selectivity of a closed numeric range against the catalog min/max
    * (uniform-density estimate, clamped to [0,1]; unknown bounds
    * estimate 1.0 — the safe, never-underestimating direction). */
  def rangeSelectivity(s: ColStats, lo: Double, hi: Double): Double =
    (for { mn <- s.minV.map(_.toDouble); mx <- s.maxV.map(_.toDouble) }
      yield
        if (mx <= mn) 1.0
        else math.min(1.0, math.max(0.0,
          (math.min(hi, mx) - math.max(lo, mn)) / (mx - mn)))
    ).getOrElse(1.0)

  /** Estimated in-memory bytes of the table filtered at `selectivity`
    * and projected to `projCols`: rows × sel × Σ(avg width + fixed
    * per-value overhead). The 8-byte overhead models the row/offset
    * bookkeeping of Spark's unsafe row — coarse, and fine: the decision
    * this feeds has orders-of-magnitude margins. */
  def estimatedBytes(catalog: Map[String, ColStats], projCols: Seq[String],
      selectivity: Double): Long = {
    val any = catalog(projCols.head)
    val rowBytes = projCols.map(c => catalog(c).avgLen + 8.0).sum
    (any.nRows * selectivity * rowBytes).toLong
  }

  /** The planning decision: broadcast `dim` iff the catalog-estimated
    * post-filter size clears the threshold, else leave it for the
    * shuffle planner. Pure hint plumbing — semantics are identical
    * either way (the spec pins both plans to the same rows). */
  def broadcastIfEstimatedSmall(dim: DataFrame, estBytes: Long,
      thresholdBytes: Long): DataFrame =
    if (estBytes <= thresholdBytes) broadcast(dim) else dim

  /** j_cbo_broadcast — orders ⋈ (customer filtered to one market
    * segment), order count + exact money sum per nation of the matched
    * customers. The join strategy is DECIDED BY THE CATALOG: equality
    * selectivity 1/ndv(c_mktsegment) × avg row width puts the filtered
    * dimension ~100× under the default 10 MB broadcast bar, so the
    * orders side never shuffles — and the decision predates any
    * execution, unlike AQE's post-map-write conversion. At 100 TB the
    * same catalog row makes the same call without reading the customer
    * table at all. */
  /** The one customer catalog both CBO faces share (a per-face column
    * subset would sig-invalidate the other face's catalog on every
    * alternation). */
  val CustomerStatCols: Seq[String] =
    Seq("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")

  def cboBroadcastJoin(spark: SparkSession, dir: String,
      segment: String = "BUILDING",
      thresholdBytes: Long = 10L << 20): DataFrame = {
    val cat = readCatalog(spark, dir, "customer", CustomerStatCols)
    val sel = equalitySelectivity(cat("c_mktsegment"))
    val est = estimatedBytes(cat,
      Seq("c_custkey", "c_nationkey", "c_mktsegment"), sel)
    val dim = graft.Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"), col("c_nationkey"))
    val planned = broadcastIfEstimatedSmall(dim, est, thresholdBytes)
    ordersPerNation(spark, dir, planned)
  }

  /** j_cbo_range — the same catalog decision driven by the RANGE
    * estimator: customers with account balance in [lo, hi] (uniform
    * span-ratio selectivity against the catalog min/max) joined to
    * orders. Integer-representable bounds keep the BETWEEN exact
    * cross-engine. */
  def cboRangeJoin(spark: SparkSession, dir: String,
      lo: Double = 0.0, hi: Double = 2500.0,
      thresholdBytes: Long = 10L << 20): DataFrame = {
    val cat = readCatalog(spark, dir, "customer", CustomerStatCols)
    val sel = rangeSelectivity(cat("c_acctbal"), lo, hi)
    val est = estimatedBytes(cat,
      Seq("c_custkey", "c_nationkey", "c_acctbal"), sel)
    val dim = graft.Tables.customer(spark, dir)
      .filter(col("c_acctbal").between(lo, hi))
      .select(col("c_custkey"), col("c_nationkey"))
    val planned = broadcastIfEstimatedSmall(dim, est, thresholdBytes)
    ordersPerNation(spark, dir, planned)
  }

  private def ordersPerNation(spark: SparkSession, dir: String,
      dim: DataFrame): DataFrame =
    graft.Tables.orders(spark, dir)
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        graft.functions.DetMath.sumMoney(col("o_totalprice"))
          .as("sum_price"))
      .orderBy(col("c_nationkey"))

  /** s_analyze_stats — the ANALYZE sweep as a QUERY: exact per-column
    * statistics (rows, nulls, distinct, min, max) across warehouse
    * tables in information-schema shape, one aggregation pass per
    * table, melted in-plan (no driver loop). This is the hash-oracled
    * face of the catalog ([[ensureCatalog]] keeps the approximate
    * serving copy; a planner consumes HLL ndv because an exact
    * distinct is its own shuffle — this face pays that shuffle
    * deliberately, it IS the audit). Exactness discipline: every
    * statistic lives in the BIGINT/STRING domain (money as integer
    * cents) so min/max/distinct agree bit-for-bit cross-engine —
    * doubles would hit engine-specific string formatting. */
  def analyzeStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def statsOf(df: DataFrame, table: String,
        cols: Seq[(String, Column)]): DataFrame = {
      val aggs: Seq[Column] = Seq(count(lit(1)).as("_n")) ++
        cols.flatMap { case (n, c) =>
          Seq(
            sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}__nulls"),
            countDistinct(c).as(s"${n}__ndv"),
            min(c).cast("string").as(s"${n}__min"),
            max(c).cast("string").as(s"${n}__max"))
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val entries = cols.map { case (n, _) =>
        struct(
          lit(table).as("tbl"), lit(n).as("col"),
          col("_n").as("n_rows"),
          col(s"${n}__nulls").as("n_nulls"),
          col(s"${n}__ndv").as("n_distinct"),
          col(s"${n}__min").as("min_v"),
          col(s"${n}__max").as("max_v"))
      }
      one.select(explode(array(entries: _*)).as("s")).select(col("s.*"))
    }
    val cents = graft.functions.DetMath.cents _
    val c = statsOf(graft.Tables.customer(spark, dir), "customer", Seq(
      "c_custkey" -> col("c_custkey").cast("long"),
      "c_nationkey" -> col("c_nationkey").cast("long"),
      "c_mktsegment" -> col("c_mktsegment"),
      "c_acctbal_cents" -> cents(col("c_acctbal"))))
    val o = statsOf(graft.Tables.orders(spark, dir), "orders", Seq(
      "o_orderkey" -> col("o_orderkey").cast("long"),
      "o_custkey" -> col("o_custkey").cast("long"),
      "o_orderstatus" -> col("o_orderstatus"),
      "o_totalprice_cents" -> cents(col("o_totalprice")),
      "o_orderpriority" -> col("o_orderpriority")))
    val n = statsOf(graft.Tables.nation(spark, dir), "nation", Seq(
      "n_nationkey" -> col("n_nationkey").cast("long"),
      "n_name" -> col("n_name")))
    c.unionByName(o).unionByName(n).orderBy(col("tbl"), col("col"))
  }
}
