package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** `merge-cdf` — the lake table's change data feed as a Structured
  * Streaming source: streamed windows ≡ [[MergeTable.changesBetween]]
  * across restarts (checkpointed generation offsets), `startGen` skips
  * the backfill, and a swept replay window fails LOUDLY instead of
  * silently skipping the gap. */
class MergeTableCdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshWork(tag: String): String =
    TestSpark.tempDir(s"graft-cdfsrc-$tag")

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  /** Collected (k, v, tag, change) bag of a DataFrame. */
  private def bag(df: org.apache.spark.sql.DataFrame): Map[(Long, Long, String, String), Int] =
    df.select(col("k"), col("v"), col("tag"), col("change"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .groupBy(identity).map { case (k, v) => k -> v.length }

  /** Run the stream until drained, folding every micro-batch into one
    * client-side bag (batches compose like drain windows do). */
  private def drainStream(root: String, ckpt: String,
      startGen: Option[Long] = None): Map[(Long, Long, String, String), Int] = {
    val acc = scala.collection.mutable.Map[(Long, Long, String, String), Int]()
    val rdr = spark.readStream.format("merge-cdf").option("path", root)
    val src = startGen.fold(rdr)(g => rdr.option("startGen", g)).load()
    val q = src.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          bag(df).foreach { case (k, n) =>
            acc(k) = acc.getOrElse(k, 0) + n }
        }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    acc.toMap
  }

  test("an additive evolution committing between .load() and .start() " +
    "does not kill the stream — it serves the analysis-time shape") {
    val work = freshWork("evorace")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(10), "k", nFiles = 2,
      commitTsMillis = 10L)
    // analysis fixes the 4-column shape (k, v, tag, change) ...
    val sdf = spark.readStream.format("merge-cdf").option("path", root).load()
    assert(sdf.schema.fieldNames.toSeq === Seq("k", "v", "tag", "change"))
    // ... then the table evolves BEFORE the query starts
    MergeTable.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.LongType)), commitTsMillis = 20L)
    val acc = scala.collection.mutable.Map[(Long, Long, String, String), Int]()
    val q = sdf.writeStream
      .option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized { bag(df).foreach { case (k, n) =>
          acc(k) = acc.getOrElse(k, 0) + n } }
        ()
      }.start()
    try { q.processAllAvailable() } finally q.stop()
    // the backfill window arrived in the analyzed shape, query alive
    assert(acc.nonEmpty && acc.keys.forall(_._4 == "i"))
  }

  test("pin-token isolation: an abandoned .load() does not shift a " +
    "later stream's schema, and two loads straddling an evolution " +
    "claim their OWN analysis shapes in ANY start order") {
    val work = freshWork("pintoken")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(8), "k", nFiles = 2,
      commitTsMillis = 10L)
    // an ABANDONED load — analyzed, never started (with the old FIFO
    // this pin would sit at the queue head and shift every later
    // start's pairing by one)
    val abandoned = spark.readStream.format("merge-cdf")
      .option("path", root).load()
    assert(abandoned.schema.fieldNames.length === 4)
    // load A before the evolution, load B after — DIFFERENT shapes
    val a = spark.readStream.format("merge-cdf").option("path", root).load()
    MergeTable.addColumns(spark, root,
      Seq(org.apache.spark.sql.types.StructField("flag",
        org.apache.spark.sql.types.LongType)), commitTsMillis = 20L)
    val b = spark.readStream.format("merge-cdf").option("path", root).load()
    assert(a.schema.fieldNames.toSeq === Seq("k", "v", "tag", "change"))
    assert(b.schema.fieldNames.toSeq ===
      Seq("k", "v", "tag", "flag", "change"))
    // start B FIRST (reverse load order): each query must serve exactly
    // its own analysis-time shape — no crossed pins, no width-assert
    // kill, the abandoned pin inert
    def shapesOf(df: org.apache.spark.sql.DataFrame,
        ckpt: String): Set[Seq[String]] = {
      val shapes = scala.collection.mutable.Set[Seq[String]]()
      val q = df.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
          shapes.synchronized { shapes += bdf.schema.fieldNames.toSeq }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      shapes.toSet
    }
    assert(shapesOf(b, s"$work/ckpt-b") ===
      Set(Seq("k", "v", "tag", "flag", "change")))
    assert(shapesOf(a, s"$work/ckpt-a") ===
      Set(Seq("k", "v", "tag", "change")))
  }

  test(".option(\"pairUpdates\", true): the streamed feed carries " +
    "Delta-CDF update pairing — same-key d+i per window reports as a " +
    "pre/post-image pair, lone rows as delete/insert") {
    val work = freshWork("paired")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(20), "k", nFiles = 2,
      commitTsMillis = 10L)
    // one MOR wave: update k=3 (v 30→333), delete k=7, insert k=100
    MergeTable.mergeMor(spark, root,
      Seq(("u", 1L, 3L, 333L, "w"), ("d", 1L, 7L, 0L, ""),
        ("c", 1L, 100L, 5L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    val rows = scala.collection.mutable.Set[(String, Long, Long)]()
    val q = spark.readStream.format("merge-cdf")
      .option("path", root).option("startGen", "1")
      .option("pairUpdates", "true").load()
      .writeStream.option("checkpointLocation", s"$work/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        rows.synchronized {
          df.collect().foreach(r =>
            rows += ((r.getAs[String]("change"), r.getAs[Long]("k"),
              r.getAs[Long]("v"))))
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(rows.toSet === Set(
      ("update_preimage", 3L, 30L),
      ("update_postimage", 3L, 333L),
      ("delete", 7L, 70L),
      ("insert", 100L, 5L)), s"paired stream window: $rows")
  }

  test(".option(\"table\", name) resolves a registered bare name; an " +
    "unregistered one refuses naming the registry verbs") {
    val work = freshWork("byname")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(12), "k", nFiles = 2,
      commitTsMillis = 10L)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "cdf_t", root)
    val got = {
      val acc = scala.collection.mutable.Map[(Long, Long, String, String), Int]()
      val q = spark.readStream.format("merge-cdf").option("table", "cdf_t")
        .load().writeStream
        .option("checkpointLocation", s"$work/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          acc.synchronized { bag(df).foreach { case (k, n) =>
            acc(k) = acc.getOrElse(k, 0) + n } }
          ()
        }.start()
      q.processAllAvailable(); q.stop(); acc.toMap
    }
    val g = Snapshots.generations(spark, root).max
    assert(got === bag(MergeTable.changesBetween(spark, root, 0L, g)))
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("merge-cdf").option("table", "cdf_nope")
        .load()
    }
    assert(e.getMessage.contains("not a registered merge table"))
  }

  test("fresh checkpoint backfills, restarts deliver only new " +
    "generations, an idle restart delivers nothing — ≡ changesBetween") {
    val work = freshWork("restart")
    val root = s"$work/table"
    val ckpt = s"$work/ckpt"
    MergeTable.create(spark, root, baseDf(60), "k", nFiles = 3,
      commitTsMillis = 10L)
    MergeTable.merge(spark, root, Seq(
      ("u", 1L, 7L, 700L, "upd"),
      ("d", 1L, 13L, 0L, ""),
      ("c", 1L, 200L, 42L, "new")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    val g2 = Snapshots.generations(spark, root).max
    // window 1: a fresh checkpoint sees the whole current state as the
    // backfill (changesBetween(0, latest) — inserts only)
    val got1 = drainStream(root, ckpt)
    assert(got1 === bag(MergeTable.changesBetween(spark, root, 0L, g2)))
    assert(got1.keys.forall(_._4 == "i"), "backfill is inserts only")

    // commits while NO stream runs; the restarted checkpoint delivers
    // exactly the delta (the MOR wave's DV deletes included)
    MergeTable.mergeMor(spark, root, Seq(
      ("d", 1L, 2L, 0L, ""),
      ("u", 1L, 5L, 555L, "mor")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 30L)
    val g3 = Snapshots.generations(spark, root).max
    val got2 = drainStream(root, ckpt)
    assert(got2 === bag(MergeTable.changesBetween(spark, root, g2, g3)))
    assert(got2.exists(_._1._4 == "d"), "the delta carries deletes")

    // idle restart: offsets unchanged, zero windows
    assert(drainStream(root, ckpt) === Map.empty)
  }

  test("mid-stream additive schema evolution: the running query keeps " +
    "serving (new column dropped until restart); a beyond-latest " +
    "startGen refuses at construction") {
    val work = freshWork("evolve")
    val root = s"$work/table"
    val ckpt = s"$work/ckpt"
    MergeTable.create(spark, root, baseDf(20), "k", nFiles = 2,
      commitTsMillis = 10L)
    val acc = scala.collection.mutable.ArrayBuffer[Set[String]]()
    val q = spark.readStream.format("merge-cdf").option("path", root)
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized { acc += df.columns.toSet; df.count(); () }
      }
      .start()
    q.processAllAvailable() // backfill window
    // additive evolution WHILE the query runs: the diff widens by
    // 'flag', the stream's fixed schema must keep serving without it
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 3L, 333L, "upd", 1L))
        .toDF("op", "seq", "k", "v", "tag", "flag"),
      "k", commitTsMillis = 20L, evolveSchema = true)
    q.processAllAvailable()
    q.stop()
    assert(acc.size === 2 && acc.forall(_ === Set("k", "v", "tag", "change")),
      s"windows must keep the stream's fixed shape, got $acc")
    // a RESTARTED stream picks the evolved schema up
    val acc2 = scala.collection.mutable.ArrayBuffer[Set[String]]()
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 4L, 444L, "upd", 2L))
        .toDF("op", "seq", "k", "v", "tag", "flag"),
      "k", commitTsMillis = 30L)
    val q2 = spark.readStream.format("merge-cdf").option("path", root)
      .load().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        acc2.synchronized { acc2 += df.columns.toSet; df.count(); () }
      }
      .start()
    q2.processAllAvailable()
    q2.stop()
    assert(acc2.forall(_.contains("flag")),
      s"a restarted stream must carry the evolved column, got $acc2")
    // beyond-latest startGen: loud at source construction (query
    // start — V1 sources are created lazily), not silent idling
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val qq = spark.readStream.format("merge-cdf").option("path", root)
        .option("startGen", 99).load().writeStream
        .option("checkpointLocation", s"$work/ckpt-bad")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try qq.processAllAvailable() finally qq.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
    assert(msgs.exists(_.contains("beyond")))
  }

  test("startGen skips the backfill: the first window diffs from the " +
    "named generation") {
    val work = freshWork("startgen")
    val root = s"$work/table"
    MergeTable.create(spark, root, baseDf(40), "k", nFiles = 2,
      commitTsMillis = 10L)
    val g1 = Snapshots.generations(spark, root).max
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 3L, 333L, "upd")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    val g2 = Snapshots.generations(spark, root).max
    val got = drainStream(root, s"$work/ckpt", startGen = Some(g1))
    assert(got === bag(MergeTable.changesBetween(spark, root, g1, g2)))
    // the re-filed unchanged rows cancel: only k=3's d+i pair remains
    assert(got.keySet.map(_._1) === Set(3L))
  }

  test("a swept replay window fails loudly naming the retained " +
    "generations; schema refusals are loud too") {
    val work = freshWork("swept")
    val root = s"$work/table"
    val ckpt = s"$work/ckpt"
    MergeTable.create(spark, root, baseDf(30), "k", nFiles = 2,
      commitTsMillis = 10L)
    drainStream(root, ckpt) // checkpoint now points at generation 1
    // two more commits, then sweep so generation 1 is GONE
    Seq((50L, 20L), (51L, 30L)).foreach { case (k, ts) =>
      MergeTable.merge(spark, root,
        Seq(("c", 1L, k, k, "new")).toDF("op", "seq", "k", "v", "tag"),
        "k", commitTsMillis = ts)
    }
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainStream(root, ckpt)
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(messages(e).exists(m => m.contains("generation")),
      s"refusal should name generations, got: ${messages(e).mkString(" | ")}")

    // a non-table root refuses at source construction
    val bad = intercept[Exception] {
      spark.readStream.format("merge-cdf")
        .option("path", s"$work/nothing").load()
    }
    assert(bad.getMessage != null)
  }
}
