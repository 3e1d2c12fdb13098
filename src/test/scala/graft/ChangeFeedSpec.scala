package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{ChangeFeed, MergeTable, Snapshots}

/** The table as a changelog: a cursor consumer drains committed
  * generations as change windows — backfill first, then row-exact
  * increments — keeping a downstream mirror equal to the table at every
  * cursor position, surviving a crash-replay, and failing loudly when
  * retention has outrun the cursor. */
class ChangeFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-cdf-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  test("a mirror maintained from the feed equals the table after every " +
      "drain; backfill, increments, crash-replay idempotence") {
    val root = freshRoot("mirror")
    MergeTable.create(spark, root,
      spark.range(30).selectExpr("id AS k", "id * 10 AS v"), "k",
      nFiles = 2, commitTsMillis = 10L)
    // the downstream replica: a set of rows, maintained ONLY from feed
    // windows (never by reading the table)
    var mirror = Set.empty[Seq[Any]]
    def apply(df: org.apache.spark.sql.DataFrame, a: Long, b: Long): Unit =
      df.collect().foreach { r =>
        val row = r.toSeq.dropRight(1)
        if (r.getAs[String]("change") == "i") mirror += row else mirror -= row
      }
    def tableRows: Set[Seq[Any]] =
      MergeTable.read(spark, root).collect().map(_.toSeq).toSet

    // backfill window: never-run cursor drains the whole state as inserts
    assert(ChangeFeed.drain(spark, root, "mirror")(apply) === 1)
    assert(mirror === tableRows)

    // two MOR waves → two fine-grained windows
    MergeTable.mergeMor(spark, root,
      Seq(("u", 1L, 5L, 555L), ("d", 1L, 9L, 0L)).toDF("op", "seq", "k", "v"),
      "k", commitTsMillis = 20L)
    MergeTable.mergeMor(spark, root,
      Seq(("c", 1L, 100L, 1000L), ("d", 1L, 5L, 0L)).toDF("op", "seq", "k", "v"),
      "k", commitTsMillis = 30L)
    assert(ChangeFeed.drain(spark, root, "mirror")(apply) === 2)
    assert(mirror === tableRows)
    assert(!mirror.exists(_.head == 5L) && mirror.exists(_.head == 100L))

    // crash between fn and cursor write = the window replays; set
    // application is idempotent, so the mirror converges anyway
    val cur = ChangeFeed.cursor(spark, root, "mirror").get
    val gens = Snapshots.generations(spark, root).sorted
    val prev = gens(gens.indexOf(cur) - 1)
    val replayed = ChangeFeed.drain(spark, root, "crash") { (df, a, b) => () }
    assert(replayed === 3,
      "an independent fresh consumer walks every generation: backfill + 2")
    // simulate the crash for 'mirror': cursor regressed one generation
    val f = new java.io.File(s"$root/_cdf-cursors/mirror")
    java.nio.file.Files.write(f.toPath, prev.toString.getBytes)
    // the raw rewrite bypassed Hadoop's checksum sidecar — drop it
    new java.io.File(s"$root/_cdf-cursors/.mirror.crc").delete()
    assert(ChangeFeed.drain(spark, root, "mirror")(apply) === 1)
    assert(mirror === tableRows, "replayed window must be absorbed")

    // a second consumer starting late still converges via backfill
    var late = Set.empty[Seq[Any]]
    ChangeFeed.drain(spark, root, "late") { (df, a, b) =>
      df.collect().foreach { r =>
        val row = r.toSeq.dropRight(1)
        if (r.getAs[String]("change") == "i") late += row else late -= row
      }
    }
    assert(late === tableRows)
  }

  test("kappa loop: TCP Debezium wire → exactly-once MOR lake table → " +
      "change feed → incremental downstream aggregate, across restarts " +
      "at every stage") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import graft.sources.TcpChangelogServer
    import graft.streaming.MergeStream
    val server = new TcpChangelogServer
    try {
      val work = TestSpark.tempDir("kappa")
      val root = s"$work/table"
      val ckpt = s"$work/ckpt"
      val fields = Seq(
        "id" -> LongType.asInstanceOf[org.apache.spark.sql.types.DataType],
        "value" -> DoubleType)
      def dz(op: String, id: Long, v: Double): String = {
        val img = s"""{"id":$id,"value":$v}"""
        if (op == "d") s"""{"op":"d","before":$img,"after":null,"ts_ms":0}"""
        else s"""{"op":"$op","before":null,"after":$img,"ts_ms":0}"""
      }
      MergeTable.create(spark, root,
        spark.range(8).select(col("id"), (col("id") * 1.0).as("value")),
        "id", nFiles = 2, commitTsMillis = 1L)

      // downstream: an incrementally-maintained SUM over the table,
      // fed ONLY from feed windows (cents-exact signed fold)
      var sumCents = 0L
      def drainDownstream(): Unit =
        ChangeFeed.drain(spark, root, "sum") { (df, a, b) =>
          val d = df.agg(sum(when(col("change") === "i", 1L).otherwise(-1L) *
            (col("value") * 100.0).cast("long"))).head
          if (!d.isNullAt(0)) sumCents += d.getLong(0)
        }
      def tableSumCents: Long = {
        val r = MergeTable.read(spark, root)
          .agg(sum((col("value") * 100.0).cast("long"))).head
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }

      def runWire(): Unit = {
        val raw = spark.readStream.format("tcp-changelog")
          .option("host", "127.0.0.1").option("port", server.port)
          .option("eventsPerBatch", 3)
          .load()
        val q = MergeStream.intoTable(raw, root, "id", fields, ckpt, mor = true)
        q.processAllAvailable()
        q.stop()
      }

      drainDownstream() // backfill: 0+1+...+7 = 28.00
      assert(sumCents === 2800L && sumCents === tableSumCents)

      server.append(Seq(dz("u", 0L, 100.0), dz("d", 3L, 0.0),
        dz("c", 20L, 5.5)))
      runWire() // wire restart boundary is q.stop() itself
      drainDownstream()
      assert(sumCents === tableSumCents,
        "downstream sum must track the table through the feed")

      // more changes while BOTH consumers are down; each resumes from
      // its own checkpoint/cursor and converges
      server.append(Seq(dz("d", 20L, 0.0), dz("u", 1L, 9.25)))
      runWire()
      drainDownstream()
      assert(sumCents === tableSumCents)
      assert(sumCents === (100.0 + 9.25 + 2 + 4 + 5 + 6 + 7).toLong * 100 +
        25, s"concrete end state: $sumCents")
    } finally server.close()
  }

  test("retention outrunning the cursor fails loudly, not silently") {
    val root = freshRoot("retention")
    MergeTable.create(spark, root,
      spark.range(10).selectExpr("id AS k", "id AS v"), "k",
      nFiles = 1, commitTsMillis = 10L)
    var n = 0
    ChangeFeed.drain(spark, root, "c")((_, _, _) => n += 1)
    (1 to 3).foreach { i =>
      MergeTable.mergeMor(spark, root,
        Seq(("u", 1L, 1L, i.toLong)).toDF("op", "seq", "k", "v"),
        "k", commitTsMillis = 10L + i)
    }
    // sweep to only the newest generation: the cursor's resume point is
    // gone — the consumer must be told, not skipped ahead
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    val e = intercept[IllegalArgumentException] {
      ChangeFeed.drain(spark, root, "c")((_, _, _) => ())
    }
    assert(e.getMessage.toLowerCase.contains("generation"),
      s"refusal should name the missing generation: ${e.getMessage}")
  }
}
