package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.WindowedStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** Group T windowed streaming: tumbling/sliding/session + watermark
  * late-data policy, driven through MemoryStream micro-batches. */
class WindowedStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(min * 60 * 1000)

  test("tumbling counts close once the watermark passes; late rows are dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = WindowedStreams.tumblingCounts(input.toDF(),
      width = "5 minutes", watermark = "5 minutes")
    val q = agg.writeStream.format("memory").queryName("tumble")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Ev(1, ts(0), 1, "purchase", 10.0),
        Ev(2, ts(1), 2, "purchase", 5.0),
        Ev(3, ts(6), 1, "signup", 1.0))
      q.processAllAvailable()
      // advance watermark beyond window [0,5)
      input.addData(Ev(4, ts(20), 3, "error", 0.0))
      q.processAllAvailable()
      val closed = spark.table("tumble").collect()
      val w0 = closed.filter(_.getAs[Timestamp]("win_start") == ts(0))
      assert(w0.length === 1 && w0.head.getAs[Long]("cnt") === 2)
      val nBefore = spark.table("tumble").count()
      // late event inside the already-closed [0,5) window → dropped
      input.addData(Ev(5, ts(2), 9, "purchase", 99.0))
      q.processAllAvailable()
      input.addData(Ev(6, ts(40), 3, "error", 0.0)) // push watermark again
      q.processAllAvailable()
      val after = spark.table("tumble").collect()
      val w0after = after.filter(_.getAs[Timestamp]("win_start") == ts(0))
      assert(w0after.head.getAs[Long]("cnt") === 2, "late row must not resurrect the window")
    } finally q.stop()
  }

  test("sliding windows assign rows to every overlapping window (batch-mode plan)") {
    import spark.implicits._
    val df = Seq(
      Ev(1, ts(1), 1, "purchase", 1.0),
      Ev(2, ts(7), 1, "purchase", 1.0)).toDF()
    val out = WindowedStreams.slidingCounts(df,
        width = "10 minutes", slide = "5 minutes")
      .collect().map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Long]("cnt")))
      .toMap
    // ts(1) ∈ [-5,5) and [0,10); ts(7) ∈ [0,10) and [5,15)
    assert(out(ts(-5)) === 1 && out(ts(0)) === 2 && out(ts(5)) === 1)
  }

  test("session windows split on gap (batch-mode plan)") {
    import spark.implicits._
    val df = Seq(
      Ev(1, ts(0), 1, "a", 0), Ev(2, ts(10), 1, "a", 0), // one session (gap 30)
      Ev(3, ts(100), 1, "a", 0), // second session
      Ev(4, ts(5), 2, "a", 0)).toDF()
    val out = WindowedStreams.sessionCounts(df, gap = "30 minutes")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cnt")))
    assert(out.count(_._1 == 1) === 2)
    assert(out.filter(_._1 == 1).map(_._2).sorted.toSeq === Seq(1, 2))
    assert(out.count(_._1 == 2) === 1)
  }

  test("stream-stream interval join matches within the horizon only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // epoch-0 event times would EQUAL the join's initial watermark and be
    // dropped as late on arrival — use a realistic clock base
    def ts(min: Long) = new Timestamp(1600000000000L + min * 60 * 1000)
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = WindowedStreams.intervalJoin(
      clicks.toDF().select($"event_id".as("click_id"), $"user_id", $"ts"),
      purchases.toDF().select($"event_id".as("purchase_id"),
        $"user_id", $"ts".as("pts")),
      key = "user_id", leftTs = "ts", rightTs = "pts",
      watermark = "5 minutes", horizon = "30 minutes")
    assert(joined.isStreaming)
    val q = joined
      .select($"click_id", $"purchase_id")
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        Ev(1, ts(0), 1, "click", 0.0),   // u1 clicks at t=0
        Ev(2, ts(0), 2, "click", 0.0))   // u2 clicks at t=0
      purchases.addData(
        Ev(10, ts(10), 1, "purchase", 1.0), // within 30 min → match
        Ev(11, ts(40), 1, "purchase", 1.0), // past horizon → no match
        Ev(12, ts(5), 3, "purchase", 1.0))  // other user → no match
      q.processAllAvailable()
      val out = spark.table("ivj").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("purchase_id")))
      assert(out.toSet === Set((1L, 10L)))
    } finally q.stop()
  }

  test("LEFT OUTER interval join emits unmatched clicks once the watermark closes their horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1600000000000L + min * 60 * 1000)
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = WindowedStreams.intervalJoinOuter(
      clicks.toDF().select($"event_id".as("click_id"), $"user_id", $"ts"),
      purchases.toDF().select($"event_id".as("purchase_id"),
        $"user_id", $"ts".as("pts")),
      key = "user_id", leftTs = "ts", rightTs = "pts",
      watermark = "5 minutes", horizon = "30 minutes")
    assert(joined.isStreaming)
    val q = joined
      .select($"click_id", $"purchase_id")
      .writeStream.format("memory").queryName("ivjo")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(
        Ev(1, ts(0), 1, "click", 0.0),  // will match
        Ev(2, ts(0), 2, "click", 0.0))  // will NEVER match
      purchases.addData(Ev(10, ts(10), 1, "purchase", 1.0))
      q.processAllAvailable()
      val matchedOnly = spark.table("ivjo").collect()
        .map(r => (r.getAs[Long]("click_id"), r.get(1))).toSet
      // u2's click cannot emit yet: a purchase inside its horizon could
      // still arrive — outer results wait for the watermark, not the batch
      assert(matchedOnly === Set((1L, 10L)))
      // advance BOTH watermarks (global watermark = min of the two) past
      // click-ts + horizon + watermark delay, proving no match can come
      clicks.addData(Ev(3, ts(120), 8, "click", 0.0))
      purchases.addData(Ev(11, ts(120), 9, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("ivjo").collect()
        .map(r => (r.getAs[Long]("click_id"), r.get(1))).toSet
      assert(out === Set((1L, 10L), (2L, null)),
        "unmatched click must emit null-extended exactly once")
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim without state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    val enriched = WindowedStreams.enrichStream(input.toDF(), dim, "user_id")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1, ts(100), 1, "purchase", 10.0))
      q.processAllAvailable()
      input.addData(Ev(2, ts(101), 9, "purchase", 5.0)) // no dim row
      q.processAllAvailable()
      val out = spark.table("enrich").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("tier")).toMap
      assert(out === Map(1L -> "gold", 2L -> null))
    } finally q.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark horizon, state evicts past it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val dedup = WindowedStreams.streamingDedup(input.toDF(),
      watermark = "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // duplicate within one micro-batch → one row survives
      input.addData(
        Ev(1, ts(100), 1, "purchase", 10.0),
        Ev(1, ts(100), 1, "purchase", 10.0))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 1)
      // re-delivery in a later batch, still inside the horizon → dropped
      input.addData(Ev(1, ts(101), 1, "purchase", 10.0))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 1)
      // advance the watermark past 100+10 → id-1 state evicted (bounded
      // state is the contract), so a fresh delivery emits again
      input.addData(Ev(2, ts(150), 2, "signup", 1.0))
      q.processAllAvailable()
      input.addData(Ev(1, ts(151), 1, "purchase", 10.0))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 3)
    } finally q.stop()
  }

  test("streaming running-distinct equals the batch rewrite's fold across ordered batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three event-ordered micro-batches, two users, repeated types —
    // the same list a batch w_running_distinct would scan
    val batches = Seq(
      Seq(Ev(1, ts(0), 1, "view", 0), Ev(2, ts(1), 1, "view", 0),
        Ev(3, ts(2), 2, "click", 0)),
      Seq(Ev(4, ts(3), 1, "click", 0), Ev(5, ts(4), 2, "click", 0),
        Ev(6, ts(5), 2, "purchase", 0)),
      Seq(Ev(7, ts(6), 1, "view", 0), Ev(8, ts(7), 1, "error", 0)))
    val input = MemoryStream[Ev]
    val q = WindowedStreams.runningDistinctStream(input.toDF())
      .writeStream.format("memory").queryName("rdist")
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("rdist").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_types_seen"))
        .toMap
      // driver-side fold: the batch rewrite's semantics over the full list
      var seen = Map.empty[Long, Set[String]]
      val want = batches.flatten.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        val s = seen.getOrElse(e.user_id, Set.empty) + e.event_type
        seen += e.user_id -> s
        e.event_id -> s.size.toLong
      }.toMap
      assert(got === want)
    } finally q.stop()
  }

  test("streaming funnel advances only on next-stage-after-previous; change feed matches the batch chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = WindowedStreams.funnelStream(input.toDF())
      .writeStream.format("memory").queryName("sfunnel")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 converts cleanly; user 2's early click and premature
      // purchase must NOT count (wrong order), later ones must
      input.addData(
        Ev(1, ts(0), 1, "view", 0), Ev(2, ts(1), 1, "click", 0),
        Ev(3, ts(0), 2, "click", 0), Ev(4, ts(1), 2, "view", 0),
        Ev(5, ts(2), 2, "view", 0))
      q.processAllAvailable()
      input.addData(
        Ev(6, ts(2), 1, "purchase", 0),
        Ev(7, ts(3), 2, "purchase", 0), // before click-after-view → ignored
        Ev(8, ts(4), 2, "click", 0), Ev(9, ts(5), 2, "purchase", 0))
      q.processAllAvailable()
      val got = spark.table("sfunnel").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("stage"),
          r.getAs[Long]("ts_us"))).toSet
      def us(min: Long) = min * 60L * 1000 * 1000
      assert(got === Set(
        (1L, 1L, us(0)), (1L, 2L, us(1)), (1L, 3L, us(2)),
        (2L, 1L, us(1)), (2L, 2L, us(4)), (2L, 3L, us(5))))
    } finally q.stop()
  }

  test("streaming funnel over the real events table equals the batch min-ts chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // full sf0.001 events in event order, split into 4 ordered batches —
    // the regime where the stream and batch forms must agree exactly
    val all = Tables.events(spark, TestSpark.Sf0001)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val chunks = all.grouped(math.max(1, all.length / 4 + 1)).toSeq
    val input = MemoryStream[Ev]
    val q = WindowedStreams.funnelStream(input.toDF())
      .writeStream.format("memory").queryName("sfunnel_real")
      .outputMode(OutputMode.Append).start()
    try {
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val streamed = spark.table("sfunnel_real").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.map(_.getAs[Long]("stage")).max }
      val batch = graft.ops.Aggregates.funnel(spark, TestSpark.Sf0001)
        .collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("stage")).toMap
      assert(streamed === batch)
    } finally q.stop()
  }
}
