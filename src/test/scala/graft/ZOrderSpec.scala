package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder64
import graft.ops.{Layout, Scans}

/** Z-order clustering (round 10): the Morton interleave expression, the
  * clustered layout, result-identity with the raw filter, and the point
  * of the whole exercise — MEASURED two-dimensional row-group skipping
  * vs a linear sort. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  /** Run `body` with INT64-micros parquet timestamps, restoring the
    * shared session's conf after (no cross-suite bleed). */
  private def withMicrosTimestamps[T](body: => T): T = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try body finally spark.conf.set(key, prev)
  }

  test("interleave: bit-exact vs a per-bit reference; range check fails loudly") {
    def slow(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    assert(ZOrder64.interleave(1L, 0L) === 1L)
    assert(ZOrder64.interleave(0L, 1L) === 2L)
    assert(ZOrder64.interleave(3L, 5L) === 39L)
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val a = rnd.nextLong() & 0xffffffffL
      val b = rnd.nextLong() & 0xffffffffL
      assert(ZOrder64.interleave(a, b) === slow(a, b), s"($a, $b)")
    }
    // full-u32 corners survive (sign-extension traps)
    assert(ZOrder64.interleave(0xffffffffL, 0xffffffffL) === -1L)
    intercept[IllegalArgumentException](ZOrder64.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrder64.interleave(0x100000000L, 0L))
  }

  test("zorder64 column: codegen path equals the static function") {
    import spark.implicits._
    val rows = Seq((5L, 9L), (0L, 0L), (0xffffffffL, 1L), (123456L, 7890123L))
    val got = rows.toDF("a", "b")
      .select(ZOrder64.zorder64(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === rows.map { case (a, b) => ZOrder64.interleave(a, b) })
  }

  test("s_zorder_pruned ≡ the raw 2-d filter (layout never changes results)") {
    val raw = Tables.events(spark, dir)
      .filter(col("user_id").between(3, 9) &&
        col("ts") >= to_timestamp(lit("2024-01-10")) &&
        col("ts") < to_timestamp(lit("2024-01-20")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    val z = Scans.zorderPruned(spark, dir).collect().map(_.toSeq)
    assert(raw.nonEmpty && z.toSeq === raw.toSeq)
  }

  test("equi-depth z-order keeps pruning inside a skewed hot range; equi-width degenerates") {
    import spark.implicits._
    // zipf-ish user skew: 80% of rows on users 0..4, the rest spread to
    // 10k — the shape real event logs have
    val base = 1704067200L
    val events = spark.range(40000).select(
      when(col("id") % 5 =!= 0, col("id") % 5)
        .otherwise(col("id") * 7919 % 10000).as("user_id"),
      timestamp_seconds(lit(base) + col("id") * 104729 % 2000000).as("ts"),
      col("id").as("event_id"))
    val root = TestSpark.tempDir("zorder-skew")
    val blockOpt = Map("parquet.block.size" -> (32 * 1024).toString)
    // equi-width: the hot users all normalize into bucket ~0 — tiles
    // inside the hot region degenerate to a time sort
    withMicrosTimestamps {
    val ewDir = s"$root/ew"
    val mm = events.agg(min("user_id"), max("user_id"),
      min(unix_seconds(col("ts"))), max(unix_seconds(col("ts")))).head
    val ewZ = ZOrder64.zorder64(
      (col("user_id") - mm.getLong(0)) * 65535L / lit(mm.getLong(1) - mm.getLong(0)) cast "long",
      (unix_seconds(col("ts")) - mm.getLong(2)) * 65535L / lit(mm.getLong(3) - mm.getLong(2)) cast "long")
    events.repartitionByRange(4, ewZ).sortWithinPartitions(ewZ)
      .write.options(blockOpt).parquet(ewDir)
    val edDir = s"$root/ed"
    graft.ops.Layout.writeZOrderedEquiDepth(events, edDir, files = 4)
    // the writer path uses the default block size; rewrite with small
    // groups so both layouts have the same tile granularity
    val edSmall = s"$root/ed_small"
    spark.read.parquet(edDir).write.options(blockOpt).parquet(edSmall)

    def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
    }
    // a slice INSIDE the hot range (~32% of rows: users 0 and 1... user
    // 1 and 2 are hot; user 0 is cold spread) — use users 1..2
    val pred = col("user_id").between(1, 2)
    val ew = scannedRows(ewDir, pred)
    val ed = scannedRows(edSmall, pred)
    // equi-width cannot separate the hot users (all in bucket 0):
    // expect ~everything scanned; equi-depth spreads them over ~2/5 of
    // the buckets and prunes
    assert(ew > 30000L, s"equi-width unexpectedly pruned the hot range ($ew)")
    assert(ed < ew * 7 / 10, s"equi-depth should prune inside the hot range: $ed vs $ew")
    // identical results either way
    val a = spark.read.parquet(ewDir).filter(pred).orderBy("event_id").collect()
    val c = spark.read.parquet(edSmall).filter(pred).orderBy("event_id").collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq === c.map(_.toSeq).toSeq)
    }
  }

  test("z-order tiles skip in BOTH dimensions; a linear sort skips in one") {
    import spark.implicits._
    // synthetic (user, time) events: 40k rows, 200 users, ~23-day span,
    // deterministically scrambled so neither column arrives pre-sorted
    val base = 1704067200L // 2024-01-01 UTC, epoch seconds
    val events = spark.range(40000).select(
      (col("id") * 7919 % 200).as("user_id"),
      timestamp_seconds(lit(base) + col("id") * 104729 % 2000000).as("ts"),
      col("id").as("event_id"))
    val root = TestSpark.tempDir("zorder-bench")
    // INT64-micros timestamps (INT96 carries no pushdown — the
    // writeZOrdered rationale, verified by this test's own failure mode)
    withMicrosTimestamps {
    // tiny row groups so both layouts have many prunable units — tile
    // granularity IS row-group granularity, so the skip ratio below is
    // a function of this size (16 groups ≈ quarter-dim tiles, right on
    // the assertion boundary; 32 KB ≈ 30+ groups keeps it robust)
    val blockOpt = Map("parquet.block.size" -> (32 * 1024).toString)
    val linDir = s"$root/linear"
    events.repartitionByRange(4, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.options(blockOpt).parquet(linDir)
    val zDir = s"$root/zorder"
    val zCol = ZOrder64.zorder64(
      col("user_id") * 65535L / lit(199L) cast "long",
      (unix_seconds(col("ts")) - lit(base)) * 65535L / lit(1999999L) cast "long")
    events.repartitionByRange(4, zCol).sortWithinPartitions(zCol)
      .write.options(blockOpt).parquet(zDir)

    def scannedRows(path: String, pred: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(pred)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
    }
    // a TIME-ONLY band (~5% of rows): the user-sorted linear layout
    // cannot skip (every row group spans the full time range); z tiles
    // bound time per group
    val tPred = col("ts").between(
      timestamp_seconds(lit(base + 400000)), timestamp_seconds(lit(base + 500000)))
    val linT = scannedRows(linDir, tPred)
    val zT = scannedRows(zDir, tPred)
    assert(linT > 35000L, s"linear layout unexpectedly skipped time ($linT)")
    assert(zT < linT * 3 / 5, s"z layout should skip most time-disjoint tiles: $zT vs $linT")
    // a 2-d box (~5% × ~10%): z keeps skipping; the selected rows are
    // identical either way
    val boxPred = tPred && col("user_id").between(40, 59)
    val zBox = scannedRows(zDir, boxPred)
    assert(zBox < linT * 3 / 5, s"2-d box should stay pruned on z: $zBox")
    val a = spark.read.parquet(linDir).filter(boxPred).orderBy("event_id").collect()
    val b = spark.read.parquet(zDir).filter(boxPred).orderBy("event_id").collect()
    assert(a.nonEmpty && a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    }
  }
}
