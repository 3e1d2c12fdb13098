package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{Hilbert32, ZOrder64}
import graft.ops.Scans

/** Hilbert clustering (round 13): curve correctness (round-trip
  * bijectivity, the adjacency property Z lacks), result-identity of the
  * clustered scan, and the measured claim — a query box decomposes into
  * FEWER contiguous key runs on the Hilbert curve than on the Z curve,
  * which is exactly the row-groups-touched cost of a clustered layout. */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  test("index/inverse round-trip; adjacency: consecutive indices are " +
      "always grid neighbors (the property the Z curve lacks)") {
    // endpoints: starts at (0,0); an even-order Hilbert curve ends at
    // the other corner of the SAME edge, (Side-1, 0)
    assert(Hilbert32.index(0L, 0L) === 0L)
    assert(Hilbert32.inverse(Hilbert32.Side * Hilbert32.Side - 1) ===
      ((Hilbert32.Side - 1, 0L)))
    // bijectivity via round-trip on random indices across the full range
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 5000) {
      val d = math.abs(rnd.nextLong()) % (Hilbert32.Side * Hilbert32.Side)
      val (x, y) = Hilbert32.inverse(d)
      assert(Hilbert32.index(x, y) === d, s"round-trip broke at d=$d")
    }
    // adjacency: |Δx| + |Δy| = 1 for EVERY consecutive pair — checked
    // exhaustively over windows placed at power-of-two seams (where the
    // Z curve jumps half the key space) and at random offsets
    val windows = Seq(0L, (1L << 16) - 8, (1L << 24) - 8, (1L << 31) - 8) ++
      Seq.fill(20)(math.abs(rnd.nextLong()) % (Hilbert32.Side * Hilbert32.Side - 16))
    windows.foreach { start =>
      var (px, py) = Hilbert32.inverse(start)
      ((start + 1) until (start + 16)).foreach { d =>
        val (x, y) = Hilbert32.inverse(d)
        assert(math.abs(x - px) + math.abs(y - py) === 1,
          s"non-adjacent step at d=$d: ($px,$py) -> ($x,$y)")
        px = x; py = y
      }
    }
    // loud range refusal, like zorder64
    intercept[IllegalArgumentException](Hilbert32.index(-1L, 0L))
    intercept[IllegalArgumentException](Hilbert32.index(1L << 16, 0L))
  }

  test("hilbert32 column: codegen path equals the static function") {
    import spark.implicits._
    val rows = Seq((5L, 9L), (0L, 0L), (65535L, 1L), (12345L, 54321L))
    val got = rows.toDF("a", "b")
      .select(Hilbert32.hilbert32(col("a"), col("b"))).as[Long].collect()
    assert(got.toSeq === rows.map { case (a, b) => Hilbert32.index(a, b) })
  }

  test("s_hilbert_pruned ≡ the raw 2-d filter (layout never changes results)") {
    val raw = Tables.events(spark, dir)
      .filter(col("user_id").between(3, 9) &&
        col("ts") >= to_timestamp(lit("2024-01-10")) &&
        col("ts") < to_timestamp(lit("2024-01-20")))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    val h = Scans.hilbertPruned(spark, dir).collect().map(_.toSeq)
    assert(raw.nonEmpty && h.toSeq === raw.toSeq)
  }

  test("measured on disk: row-group skipping for 2-d boxes — the " +
      "hilbert layout scans no more than the z layout, both far " +
      "less than a linear sort") {
    import spark.implicits._
    val base = 1704067200L
    val events = spark.range(40000).select(
      (col("id") * 7919 % 200).as("user_id"),
      timestamp_seconds(lit(base) + col("id") * 104729 % 2000000).as("ts"),
      col("id").as("event_id"))
    val root = TestSpark.tempDir("hilbert-bench")
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key, "INT96")
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try {
      val blockOpt = Map("parquet.block.size" -> (32 * 1024).toString)
      def layout(dir: String, k: org.apache.spark.sql.Column): Unit =
        events.repartitionByRange(4, k).sortWithinPartitions(k)
          .write.options(blockOpt).parquet(dir)
      val u16u = col("user_id") * 65535L / lit(199L) cast "long"
      val u16t = (unix_seconds(col("ts")) - lit(base)) * 65535L / lit(1999999L) cast "long"
      layout(s"$root/z", ZOrder64.zorder64(u16u, u16t))
      layout(s"$root/h", Hilbert32.hilbert32(u16u, u16t))
      layout(s"$root/lin", col("user_id"))
      def scanned(path: String, pred: org.apache.spark.sql.Column): Long = {
        val df = spark.read.parquet(path).filter(pred)
        df.collect()
        df.queryExecution.executedPlan.collectLeaves()
          .head.metrics("numOutputRows").value
      }
      // a TIME-ONLY band (~5%): the user-sorted linear layout cannot
      // skip at all — every row group spans the full time range; both
      // curves bound time per tile
      val tPred = col("ts").between(timestamp_seconds(lit(base + 400000)),
        timestamp_seconds(lit(base + 500000)))
      val (lin, zT, hT) = (scanned(s"$root/lin", tPred),
        scanned(s"$root/z", tPred), scanned(s"$root/h", tPred))
      assert(lin > 35000L, s"linear layout unexpectedly skipped time ($lin)")
      assert(zT < lin * 3 / 5 && hT < lin * 3 / 5,
        s"curve layouts should prune the time band: lin=$lin z=$zT h=$hT")
      // a 2-d box (~10% users × ~5% time): hilbert never worse than z
      // (with ~30 row groups the two are close — the decisive, exact
      // comparison is the run-count test below; this pins the on-disk
      // machinery end-to-end)
      val pred = col("user_id").between(40, 59) && tPred
      val (z, h) = (scanned(s"$root/z", pred), scanned(s"$root/h", pred))
      assert(h <= z * 11 / 10, s"hilbert scanned more than z: h=$h z=$z")
      // identical results on all three layouts
      val a = spark.read.parquet(s"$root/lin").filter(pred).orderBy("event_id").collect()
      val b = spark.read.parquet(s"$root/h").filter(pred).orderBy("event_id").collect()
      assert(a.nonEmpty && a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    } finally spark.conf.set(key, prev)
  }

  test("measured: a query box intersects fewer contiguous key runs on " +
      "the Hilbert curve than on the Z curve") {
    // the cost a clustered layout pays for a box query is the number of
    // contiguous curve ranges the box decomposes into — every break is
    // another row group whose min/max straddles the box. Count runs
    // exactly for boxes of several shapes and positions, including ones
    // crossing the big power-of-two seams where Z locality dies.
    def runs(keys: Seq[Long]): Int = {
      val s = keys.sorted
      1 + s.iterator.zip(s.iterator.drop(1)).count { case (a, b) => b != a + 1 }
    }
    // u16-cell boxes; runs are counted on the curve over cell
    // coordinates. The claim is aggregate, not universal: a thin box
    // flat along Z's favored axis can tie or beat Hilbert (the last
    // box), and a box that IS an aligned tile is 1 run on both — but
    // general unaligned boxes, where real predicates live, decompose
    // into ~half the runs on the continuous curve (measured 19 vs 38
    // interior, 12 vs 18 across the 2^15 seam).
    val boxes = Seq(
      (100L, 163L, 200L, 263L, true),        // interior 64×64, unaligned
      (32736L, 32799L, 100L, 163L, true),    // straddles the x = 2^15 seam
      (16320L, 16383L, 16320L, 16383L, false), // exactly an aligned tile
      (40000L, 40127L, 50000L, 50015L, false)) // wide-flat 128×16
    var hTotal = 0
    var zTotal = 0
    boxes.foreach { case (x0, x1, y0, y1, hilbertMustWin) =>
      val cells = for (x <- x0 to x1; y <- y0 to y1) yield (x, y)
      val hRuns = runs(cells.map { case (x, y) => Hilbert32.index(x, y) })
      val zRuns = runs(cells.map { case (x, y) => ZOrder64.interleave(x, y) })
      hTotal += hRuns; zTotal += zRuns
      if (hilbertMustWin) assert(hRuns < zRuns,
        s"box ($x0..$x1, $y0..$y1): hilbert $hRuns runs vs z $zRuns")
    }
    assert(hTotal * 3 <= zTotal * 2,
      s"hilbert should cut total run count by ≥ a third: $hTotal vs $zTotal")
  }
}
