package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TableStats

/** The ANALYZE catalog and the static join decision it drives: stats
  * must be exact where exactness is cheap (rows, nulls, min/max),
  * honestly approximate where exactness costs a shuffle (HLL ndv), and
  * the broadcast call must flip with the threshold while the RESULT
  * never changes — planning is semantics-free. */
class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("analyzeTable: exact rows/nulls/min/max, ndv within HLL tolerance") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, None, 30.0),
      (4L, Some("a"), 40.0), (5L, Some("c"), 50.0))
      .toDF("id", "tag", "v")
    val st = TableStats.analyzeTable(df, "t", Seq("id", "tag", "v"))
      .map(s => s.column -> s).toMap
    assert(st("id").nRows === 5L)
    assert(st("id").nNulls === 0L)
    assert(st("tag").nNulls === 1L)
    assert(st("id").minV === Some("1"))
    assert(st("id").maxV === Some("5"))
    assert(st("v").minV.map(_.toDouble) === Some(10.0))
    assert(st("v").maxV.map(_.toDouble) === Some(50.0))
    // exact ndvs 5 / 3 / 5 — HLL at this cardinality is exact in
    // practice; allow ±1 so the assert pins magnitude, not HLL internals
    assert(math.abs(st("id").ndv - 5L) <= 1L)
    assert(math.abs(st("tag").ndv - 3L) <= 1L)
  }

  test("selectivity model: equality = 1/ndv, range = clamped span ratio") {
    val s = TableStats.ColStats("t", "c", 1000L, 0L, 4L, 8.0,
      Some("0"), Some("100"))
    assert(TableStats.equalitySelectivity(s) === 0.25)
    assert(TableStats.rangeSelectivity(s, 0, 50) === 0.5)
    assert(TableStats.rangeSelectivity(s, -100, 200) === 1.0)
    assert(TableStats.rangeSelectivity(s, 200, 300) === 0.0)
    // unknown bounds: never underestimate
    val unk = s.copy(minV = None)
    assert(TableStats.rangeSelectivity(unk, 0, 1) === 1.0)
  }

  test("catalog round-trips sig-gated; estimate sits far under the bar") {
    val cols = TableStats.CustomerStatCols
    val cat = TableStats.readCatalog(spark, dir, "customer", cols)
    val rows = graft.Tables.customer(spark, dir).count()
    assert(cat("c_custkey").nRows === rows)
    val sel = TableStats.equalitySelectivity(cat("c_mktsegment"))
    // 5 market segments → ~0.2
    assert(sel > 0.1 && sel < 0.5, s"selectivity $sel")
    val est = TableStats.estimatedBytes(cat, cols, sel)
    assert(est > 0L && est < (10L << 20), s"estimate $est bytes")
  }

  test("j_cbo_broadcast: catalog decision broadcasts; threshold 0 does " +
      "not; rows identical either way") {
    // pin Spark's own size-based auto-broadcast off so the ONLY
    // broadcast source is the catalog decision under test (at toy scale
    // the raw file-size heuristic would broadcast everything and mask it)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bhj = TableStats.cboBroadcastJoin(spark, dir)
      val pb = bhj.queryExecution.executedPlan.toString
      assert(pb.contains("BroadcastHashJoin"), pb)
      val smj = TableStats.cboBroadcastJoin(spark, dir, thresholdBytes = 0L)
      val ps = smj.queryExecution.executedPlan.toString
      assert(!ps.contains("BroadcastHashJoin"), ps)
      assert(bhj.collect().toSeq === smj.collect().toSeq)
      assert(bhj.count() > 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("s_analyze_stats: information-schema sweep is exact per table") {
    val rows = graft.ops.TableStats.analyzeStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val nNation = Tables.nation(spark, dir).count()
    val nk = rows(("nation", "n_nationkey"))
    assert(nk.getAs[Long]("n_rows") === nNation)
    assert(nk.getAs[Long]("n_distinct") === nNation)
    assert(nk.getAs[Long]("n_nulls") === 0L)
    assert(nk.getAs[String]("min_v") === "0")
    val seg = rows(("customer", "c_mktsegment"))
    assert(seg.getAs[Long]("n_distinct") === 5L)
    // money stats live in the integer-cent domain
    val bal = rows(("customer", "c_acctbal_cents"))
    assert(bal.getAs[String]("min_v").matches("-?\\d+"))
  }

  test("j_cbo_star: the catalog orders the star most-selective-first, " +
      "the physical join order follows it, rows are order-invariant") {
    val edges = TableStats.cboStarEdges(spark, dir)
    val ordered = TableStats.starOrder(edges)
    // the decision is the catalog's own ascending-survival sort
    assert(ordered.map(_.survival) === ordered.map(_.survival).sorted)
    assert(ordered.toSet === edges.toSet)
    // at this fixture the estimates rank part (span ratio of p_size ≤ 5
    // ≈ 0.08) < supplier (1/ndv(s_nationkey) = 1/10 — the sf0.001
    // supplier table covers only 10 nations) < orders
    // (1/ndv(o_orderpriority) = 1/5) — pin the concrete ranking so a
    // silent estimator regression cannot reorder unnoticed
    assert(ordered.map(_.dim) === Seq("part", "supplier", "orders"),
      ordered.toString)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = TableStats.cboStarJoin(spark, dir)
      // logical Join nodes print outermost-first; reversed = execution
      // order. Each edge's condition names exactly one dim key.
      import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
      val conds = df.queryExecution.optimizedPlan.collect {
        case j: LJoin => j.condition.map(_.toString).getOrElse("")
      }
      val planOrder = conds.reverse.map {
        case c if c.contains("s_suppkey") => "supplier"
        case c if c.contains("p_partkey") => "part"
        case c if c.contains("o_orderkey") => "orders"
        case c => fail(s"join condition matches no star edge: $c")
      }
      assert(planOrder === ordered.map(_.dim),
        s"physical order $planOrder != catalog order ${ordered.map(_.dim)}")
      // planning is semantics-free: forcing every edge to shuffle (no
      // catalog broadcast) changes the plan, never the rows
      val noBc = TableStats.cboStarJoin(spark, dir, thresholdBytes = 0L)
      assert(!noBc.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(df.collect().toSeq === noBc.collect().toSeq)
      assert(df.count() > 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("j_cbo_range: the range estimator drives the same decision; " +
      "rows identical either way") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bhj = TableStats.cboRangeJoin(spark, dir)
      val pb = bhj.queryExecution.executedPlan.toString
      assert(pb.contains("BroadcastHashJoin"), pb)
      val smj = TableStats.cboRangeJoin(spark, dir, thresholdBytes = 0L)
      assert(!smj.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      assert(bhj.collect().toSeq === smj.collect().toSeq)
      assert(bhj.count() > 0L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
