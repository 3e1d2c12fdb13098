package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TcpChangelogServer
import graft.streaming.{MergeStream, MergeTable, Snapshots}

/** Live wire → copy-on-write lake table: the TCP Debezium changelog
  * merged into a MergeTable one atomic generation per micro-batch,
  * exactly-once across a forced restart and against a direct replay. */
class MergeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Fields = Seq("id" -> LongType.asInstanceOf[org.apache.spark.sql.types.DataType],
    "value" -> DoubleType)

  private def dz(op: String, id: Long, v: Double): String = {
    val img = s"""{"id":$id,"value":$v}"""
    if (op == "d") s"""{"op":"d","before":$img,"after":null,"ts_ms":0}"""
    else s"""{"op":"$op","before":null,"after":$img,"ts_ms":0}"""
  }

  private def tableState(root: String): Map[Long, Double] =
    MergeTable.read(spark, root).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("value")).toMap

  test("decode contract: an unknown op or a tombstone fails loudly " +
      "instead of upserting an all-null row") {
    import spark.implicits._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val fields = Seq("id" -> (LongType: org.apache.spark.sql.types.DataType),
      "value" -> (DoubleType: org.apache.spark.sql.types.DataType))
    def decode(lines: String*): Array[org.apache.spark.sql.Row] =
      MergeStream.debeziumToChanges(
        lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
          .toDF("offset", "value"), fields).collect()
    // the known ops map c/r/u → 'u', d → 'd'
    val ok = decode(
      """{"op":"c","after":{"id":1,"value":1.0},"ts_ms":0}""",
      """{"op":"r","after":{"id":2,"value":2.0},"ts_ms":0}""",
      """{"op":"u","after":{"id":3,"value":3.0},"ts_ms":0}""",
      """{"op":"d","before":{"id":4,"value":4.0},"after":null,"ts_ms":0}""")
    assert(ok.map(_.getString(0)).toSeq === Seq("u", "u", "u", "d"))
    // Debezium truncate/message ops and tombstones (op missing): LOUD
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(msg)).mkString(" ")
    val badOp = intercept[Exception](
      decode("""{"op":"t","after":{"id":1,"value":1.0},"ts_ms":0}"""))
    assert(msg(badOp).contains("Unexpected Debezium op"), msg(badOp))
    val tomb = intercept[Exception](decode("""{"schema":null}"""))
    assert(msg(tomb).contains("Unexpected Debezium op"), msg(tomb))
    // ...but a Kafka log-compaction TOMBSTONE — a null VALUE record a
    // standard Debezium producer emits after every delete — is topic
    // hygiene, not a change: dropped silently, never a stream kill
    val withTombstone = MergeStream.debeziumToChanges(
      Seq((0L, """{"op":"c","after":{"id":1,"value":1.0},"ts_ms":0}"""),
        (1L, null.asInstanceOf[String]),
        (2L, """{"op":"d","before":{"id":1,"value":1.0},"after":null,"ts_ms":1}"""))
        .toDF("offset", "value"), fields).collect()
    assert(withTombstone.map(_.getString(0)).toSeq === Seq("u", "d"),
      "null-value tombstones drop; real ops around them survive")
  }

  test("changelog stream merges into the table exactly-once across a restart; deletes flow through") {
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("mergestream")
      val root = s"$work/table"
      val ckpt = s"$work/ckpt"
      MergeTable.create(spark, root,
        spark.range(10).select(col("id"), (col("id") * 1.0).as("value")),
        "id", nFiles = 4, commitTsMillis = 1L)

      def startQuery() = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 4)
          .load()
        MergeStream.intoTable(raw, root, "id", Fields, ckpt)
      }

      // wave 1: updates + inserts, > 1 admission-capped batch
      val q1 = startQuery()
      server.append((0L to 5L).map(i => dz("u", i, 100.0 + i)) ++
        (10L to 13L).map(i => dz("c", i, 1000.0 + i)))
      q1.processAllAvailable()
      val afterW1 = tableState(root)
      assert(afterW1(0L) === 100.0 && afterW1(5L) === 105.0)
      assert(afterW1(13L) === 1013.0 && afterW1(7L) === 7.0)
      q1.stop() // forced restart boundary

      // wave 2 lands while no query runs; the restarted query drains it
      server.append(Seq(dz("d", 2L, 0.0), dz("d", 3L, 0.0),
        dz("u", 0L, 200.0)))
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()

      val finalState = tableState(root)
      val expected = (Map.empty[Long, Double]
        ++ (0L to 9L).map(i => i -> i.toDouble)
        ++ (0L to 5L).map(i => i -> (100.0 + i))
        ++ (10L to 13L).map(i => i -> (1000.0 + i))
        + (0L -> 200.0)) -- Seq(2L, 3L)
      assert(finalState === expected)

      // a replayed batch id (at-least-once delivery) is refused: same
      // changes, same id → no new generation, table unchanged
      val genBefore = Snapshots.currentGen(spark, root).get
      val lastBatch = MergeTable.appliedBatchId(spark, root).get
      val replay = Seq(("u", lastBatch * 1000L, 0L, 99999.0))
        .toDF("op", "seq", "id", "value")
      assert(MergeTable.mergeExactlyOnce(spark, root, replay, "id",
        lastBatch).isEmpty)
      assert(Snapshots.currentGen(spark, root).get === genBefore)
      assert(tableState(root) === expected)
      // and each applied batch left its id in the committed manifest
      assert(lastBatch >= 1L)
    } finally server.close()
  }

  test("WAP-gated sink: a poisoned batch is dead-lettered BEFORE visibility, " +
      "good batches publish, replays idempotent for both verdicts") {
    import org.apache.spark.sql.DataFrame
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("mergestream-wap")
      val root = s"$work/table"
      val ckpt = s"$work/ckpt"
      val rejects = s"$work/rejects"
      MergeTable.create(spark, root,
        spark.range(10).select(col("id"), (col("id") * 1.0).as("value")),
        "id", nFiles = 4, commitTsMillis = 1L)
      // the cross-row invariant the gate enforces on the WOULD-BE state
      val audit: DataFrame => Boolean = df => df.filter(col("value") < 0).isEmpty
      def startQuery() = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 4)
          .load()
        MergeStream.intoTableGated(raw, root, "id", Fields, ckpt, audit, rejects)
      }
      // waves appended while no query runs: the restarted query drains
      // the backlog in admission-capped batches of exactly 4, so batch
      // composition (and thus the gate's batch granularity) is pinned
      server.append(Seq(dz("u", 0, 100.0), dz("u", 1, 101.0),
        dz("c", 20, 2020.0), dz("u", 2, 102.0)))
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      assert(tableState(root)(0L) === 100.0 && tableState(root)(20L) === 2020.0)
      val gensAfterGood = Snapshots.generations(spark, root)
      // wave 2: ONE poisoned row — the WHOLE batch must be rejected
      // (batch is the atomicity unit; a partial apply would tear it)
      server.append(Seq(dz("u", 3, -103.0), dz("u", 4, 104.0),
        dz("u", 5, 105.0), dz("u", 6, 106.0)))
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      assert(Snapshots.generations(spark, root) === gensAfterGood,
        "a rejected batch must not commit any generation")
      assert(tableState(root)(4L) === 4.0, "no partial apply of a rejected batch")
      val rej = spark.read.parquet(s"$rejects/batch=1")
      assert(rej.collect().map(_.getAs[Long]("id")).sorted.toSeq
        === Seq(3L, 4L, 5L, 6L), "dead letter must carry the decoded batch")
      // replay of the REJECTED batch (at-least-once redelivery): same
      // deterministic verdict, dead letter overwritten, still no commit
      val wave2 = Seq(
        (4L, dz("u", 3, -103.0)), (5L, dz("u", 4, 104.0)),
        (6L, dz("u", 5, 105.0)), (7L, dz("u", 6, 106.0))
      ).toDF("offset", "value")
      MergeStream.applyGatedBatch(root, "id", Fields, audit, rejects)(wave2, 1L)
      assert(Snapshots.generations(spark, root) === gensAfterGood)
      assert(spark.read.parquet(s"$rejects/batch=1")
        .collect().map(_.getAs[Long]("id")).sorted.toSeq === Seq(3L, 4L, 5L, 6L))
      // wave 3: the gate reopens for clean data
      server.append(Seq(dz("u", 7, 107.0), dz("d", 8, 0.0),
        dz("u", 9, 109.0), dz("c", 21, 2121.0)))
      val q3 = startQuery(); q3.processAllAvailable(); q3.stop()
      val fin = tableState(root)
      assert(fin(7L) === 107.0 && fin(21L) === 2121.0 && !fin.contains(8L))
      assert(fin(3L) === 3.0 && fin(4L) === 4.0, "rejected batch stayed out")
      // replay of a PUBLISHED batch id: refused from the manifest
      val gens = Snapshots.generations(spark, root)
      val lastId = MergeTable.appliedBatchId(spark, root).get
      MergeStream.applyGatedBatch(root, "id", Fields, audit, rejects)(wave2, lastId)
      assert(Snapshots.generations(spark, root) === gens)
      assert(tableState(root) === fin)
      // dead-letter REPLAY: an identity "fix" is re-refused by the same
      // gate (re-admission grants no bypass); a real fix publishes
      implicit val ss: org.apache.spark.sql.SparkSession = spark
      assert(!MergeStream.replayReject(root, "id", rejects, 1L, audit)(identity))
      assert(tableState(root) === fin, "refused replay must change nothing")
      assert(MergeStream.replayReject(root, "id", rejects, 1L, audit)(
        df => df.withColumn("value", abs(col("value")))))
      val repaired = tableState(root)
      assert(repaired(3L) === 103.0 && repaired(4L) === 104.0 &&
        repaired(5L) === 105.0 && repaired(6L) === 106.0,
        s"repaired batch must land: $repaired")
      // DESCRIBE HISTORY: create + 2 published waves + the repair, with
      // the sink-recorded batch ids on the streamed generations only
      val hist = MergeTable.history(spark, root).collect()
      assert(hist.map(_.getLong(0)).toSeq === hist.map(_.getLong(0)).toSeq.sorted)
      assert(hist.length === 4, hist.mkString(", "))
      val batchIds = hist.flatMap(r =>
        if (r.isNullAt(4)) None else Some(r.getLong(4))).toSeq
      assert(batchIds === Seq(0L, 2L), s"sink batch ids: $batchIds")
      assert(hist.forall(_.getInt(2) > 0), "every generation references files")
    } finally server.close()
  }

  test("merge-on-read sink: same wire, same final state, zero data-file " +
      "rewrites; replayed batch ids refused") {
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("mergestream-mor")
      val root = s"$work/table"
      val ckpt = s"$work/ckpt"
      MergeTable.create(spark, root,
        spark.range(10).select(col("id"), (col("id") * 1.0).as("value")),
        "id", nFiles = 4, commitTsMillis = 1L)
      val baseFiles = MergeTable.currentManifest(spark, root).map(_.name).toSet

      val raw = spark.readStream.format("tcp-changelog")
        .option("host", "127.0.0.1").option("port", server.port)
        .option("eventsPerBatch", 4)
        .load()
      val q = MergeStream.intoTable(raw, root, "id", Fields, ckpt, mor = true)
      server.append((0L to 5L).map(i => dz("u", i, 100.0 + i)) ++
        Seq(dz("d", 7L, 0.0), dz("c", 20L, 2020.0)))
      q.processAllAvailable()
      q.stop()

      val expected = (Map.empty[Long, Double]
        ++ (0L to 9L).map(i => i -> i.toDouble)
        ++ (0L to 5L).map(i => i -> (100.0 + i))
        + (20L -> 2020.0)) - 7L
      assert(tableState(root) === expected)
      // zero write amplification across every micro-batch: the original
      // files are all still referenced by name, deletes live in DVs
      val genDir = Snapshots.genDir(root, Snapshots.currentGen(spark, root).get)
      val nowFiles = MergeTable.currentManifest(spark, root).map(_.name).toSet
      assert(baseFiles.subsetOf(nowFiles), "MOR sink must never rewrite")
      assert(MergeTable.dvNames(spark, genDir).nonEmpty)
      // replay refusal on the MOR path
      val lastBatch = MergeTable.appliedBatchId(spark, root).get
      val replay = Seq(("u", 1L, 0L, 99999.0)).toDF("op", "seq", "id", "value")
      assert(MergeTable.mergeMorExactlyOnce(spark, root, replay, "id",
        lastBatch).isEmpty)
      assert(tableState(root) === expected)
    } finally server.close()
  }

  test("TWO live changelog streams merge into ONE table concurrently " +
    "via the optimistic sink; per-stream replay fences are independent") {
    val serverA = new TcpChangelogServer
    val serverB = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("mergestream-occ")
      val root = s"$work/table"
      MergeTable.create(spark, root,
        spark.range(10).select(col("id"), (col("id") * 1.0).as("value")),
        "id", nFiles = 4, commitTsMillis = 1L)

      def startA() = MergeStream.intoTableOcc(
        spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", serverA.port)
          .option("eventsPerBatch", 3).load(),
        root, "id", Fields, s"$work/ckpt-a", "src-a")
      def startB() = MergeStream.intoTableOcc(
        spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", serverB.port)
          .option("eventsPerBatch", 3).load(),
        root, "id", Fields, s"$work/ckpt-b", "src-b")

      // both queries LIVE at once, racing commits through the OCC loop
      val qA = startA(); val qB = startB()
      serverA.append((0L to 4L).map(i => dz("u", i, 100.0 + i)) ++
        Seq(dz("c", 20L, 2020.0)))
      serverB.append((5L to 9L).map(i => dz("u", i, 200.0 + i)) ++
        Seq(dz("d", 8L, 0.0), dz("c", 30L, 3030.0)))
      qA.processAllAvailable(); qB.processAllAvailable()
      qA.stop(); qB.stop()

      val expected = (Map.empty[Long, Double]
        ++ (0L to 4L).map(i => i -> (100.0 + i))
        ++ (5L to 9L).map(i => i -> (200.0 + i))
        + (20L -> 2020.0) + (30L -> 3030.0)) - 8L
      assert(tableState(root) === expected)
      // each stream left its OWN fence; replays refused independently
      val fences = MergeTable.appliedStreamBatchIds(spark, root)
      assert(fences.contains("src-a") && fences.contains("src-b"), fences)
      val replay = Seq(("u", 1L, 0L, 9e9)).toDF("op", "seq", "id", "value")
      assert(MergeTable.mergeOccExactlyOnce(spark, root, replay, "id",
        "src-a", fences("src-a")).isEmpty)
      assert(MergeTable.mergeOccExactlyOnce(spark, root, replay, "id",
        "src-b", fences("src-b")).isEmpty)
      assert(tableState(root) === expected)
      // restart ONE stream: its checkpoint replays the tail, the fence
      // absorbs it, and fresh events still land
      serverA.append(Seq(dz("u", 0L, 777.0)))
      val qA2 = startA()
      qA2.processAllAvailable()
      qA2.stop()
      assert(tableState(root) === expected + (0L -> 777.0))
    } finally { serverA.close(); serverB.close() }
  }
}
