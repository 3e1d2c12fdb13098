package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CommitLog, MergeTable, Snapshots}

/** The S3-safe commit adapter: [[graft.streaming.CommitLog]] routes the
  * OCC publish through a pluggable claim. The spec's CAS log uses NO
  * rename anywhere — claim via putIfAbsent (the conditional-put shape:
  * S3 If-None-Match, DynamoDB attribute_not_exists), publish via plain
  * per-file COPY with the commit marker landing LAST — and the whole
  * multi-writer protocol must still admit exactly one winner per
  * generation with zero lost updates. */
class CommitLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = TestSpark.tempDir(s"graft-commitlog-$tag")
    s"$d/table"
  }

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  /** Conditional-put commit log refusing to rely on rename atomicity:
    * the claim is a JVM-wide compare-and-set (stand-in for the store's
    * conditional put); the publish copies file by file — exactly what
    * an object store without atomic rename can do. */
  private final class CasLog extends CommitLog {
    val claims: java.util.Set[String] =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    override def publish(f: org.apache.hadoop.fs.FileSystem, root: String,
        target: Long, staged: Path): Boolean = {
      // the CLAIM: one winner per (root, target), atomically
      if (!claims.add(s"$root#$target")) return false
      wins.incrementAndGet()
      val dst = new Path(Snapshots.genDir(root, target))
      f.mkdirs(dst)
      val conf = f.getConf
      // marker LAST: readers resolve by the marker, so the dir must be
      // complete before it appears (the non-atomic-store discipline)
      val parts = f.listStatus(staged).sortBy(st =>
        if (st.getPath.getName == Snapshots.markerName) 1 else 0)
      parts.foreach(st =>
        org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, f,
          new Path(dst, st.getPath.getName), false, conf))
      f.delete(staged, true) // consumed, like the rename protocol
      true
    }
  }

  test("forRoot routes by longest registered prefix and defaults to " +
    "the rename protocol") {
    val a = new CasLog; val b = new CasLog
    CommitLog.register("/x/", a)
    CommitLog.register("/x/deeper/", b)
    try {
      assert(CommitLog.forRoot("/x/t1") eq a)
      assert(CommitLog.forRoot("/x/deeper/t2") eq b)
      assert(CommitLog.forRoot("/elsewhere/t") eq CommitLog.Rename)
    } finally { CommitLog.unregister("/x/"); CommitLog.unregister("/x/deeper/") }
  }

  test("forRoot survives scheme-spelling drift: a bare-path " +
    "registration owns the file:/ spelling and vice versa; '/lake/t1' " +
    "still never captures '/lake/t10'; different schemes never match") {
    val a = new CasLog; val b = new CasLog; val c = new CasLog
    CommitLog.register("/drift/lake", a)
    CommitLog.register("file:/drift/other", b)
    CommitLog.register("s3a://bucket/lake", c)
    try {
      // bare registration ⇄ qualified use, and the reverse
      assert(CommitLog.forRoot("file:/drift/lake/t") eq a)
      assert(CommitLog.forRoot("/drift/other/t") eq b)
      // segment-awareness preserved through the URI comparison
      assert(CommitLog.forRoot("/drift/lakeX/t") eq CommitLog.Rename)
      // both sides schemed: must agree (a local path must not route to
      // an object-store log)
      assert(CommitLog.forRoot("s3a://bucket/lake/t") eq c)
      assert(CommitLog.forRoot("file:/bucket/lake/t") eq CommitLog.Rename)
    } finally {
      CommitLog.unregister("/drift/lake")
      CommitLog.unregister("file:/drift/other")
      CommitLog.unregister("s3a://bucket/lake")
    }
  }

  test("CLAIM-AFTER-WRITE fencing: a winner killed between claim and " +
    "materialize strands nothing — the next writer's lost claim " +
    "RECOVERS the generation from the claimed durable content; ids " +
    "stay dense, no double publish, zero lost updates") {
    val root = freshRoot("fenced")
    val store = new CommitLog.InMemoryClaimStore
    val log = new CommitLog.ClaimAfterWriteLog(store)
    CommitLog.register(root, log)
    try {
      MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
        commitTsMillis = 10L)
      def upd(lo: Long, tag: String) = spark.range(lo, lo + 10).select(
        lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
        (col("id") + 7L).as("v"), lit(tag).as("tag"))
      // writer A: claim lands, then the process "dies" before the
      // generation dir exists — the naive conditional-put stranding
      val hA = MergeTable.prepareMerge(spark, root, upd(0L, "A"), "k",
        nFiles = 1)
      log.beforeMaterialize =
        () => throw new RuntimeException("killed mid-publish")
      val crash = intercept[RuntimeException](
        MergeTable.commitPrepared(spark, root, hA, commitTsMillis = 20L))
      assert(crash.getMessage.contains("killed"))
      log.beforeMaterialize = () => ()
      // the table looks pre-commit to readers (no marker for gen 2)...
      assert(Snapshots.currentGen(spark, root) === Some(1L))
      // ...but the claim names durable content: writer B's lost claim
      // for 2 recovers A's commit, then B lands on 3
      val hB = MergeTable.prepareMerge(spark, root, upd(50L, "B"), "k",
        nFiles = 1)
      val oB = MergeTable.commitPrepared(spark, root, hB,
        commitTsMillis = 30L, maxAttempts = 10)
      assert(oB.gen === 3L, s"B must land AFTER the recovered A: $oB")
      assert(Snapshots.generations(spark, root).sorted === Seq(1L, 2L, 3L))
      val byK = MergeTable.read(spark, root).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(byK.size === 100)
      (0L until 10L).foreach(k => assert(byK(k) === "A",
        s"the killed winner's claimed commit was lost at k=$k"))
      (50L until 60L).foreach(k => assert(byK(k) === "B"))
      // explicit recovery is idempotent (nothing left to materialize)
      val f = new Path(root).getFileSystem(
        spark.sessionState.newHadoopConf())
      assert(!log.recoverClaimed(f, root, 2L))
    } finally CommitLog.unregister(root)
  }

  test("claim-based publish admits exactly one winner for a contested " +
    "generation; the loser's staging survives for its retry") {
    val root = freshRoot("one-winner")
    MergeTable.create(spark, root, baseDf(10), "k", nFiles = 1,
      commitTsMillis = 10L)
    val log = new CasLog
    val f = new Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    // two fully-staged dirs racing for the SAME target id
    def stage(tag: String): Path = {
      val p = new Path(s"$root/_occ-spec-$tag")
      f.mkdirs(p)
      val out = f.create(new Path(p, "payload"), false)
      out.write(tag.getBytes("UTF-8")); out.close()
      val mk = f.create(new Path(p, Snapshots.markerName), false)
      mk.write("42".getBytes("UTF-8")); mk.close()
      p
    }
    val pa = stage("a"); val pb = stage("b")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val ts = Seq(pa, pb).map(p => new Thread(() =>
      results.add(log.publish(f, root, 2L, p))))
    ts.foreach(_.start()); ts.foreach(_.join(60000))
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) === 1,
      "a contested generation must admit exactly one winner")
    // the loser's staging was left untouched (its caller retries)
    assert(f.exists(pa) ^ f.exists(pb))
    assert(f.exists(new Path(Snapshots.genDir(root, 2L),
      Snapshots.markerName)))
  }

  test("the FULL optimistic protocol over a rename-free store shape: " +
    "racing writers through the CAS log — dense generations, zero " +
    "lost updates, claim count = published generations") {
    val root = freshRoot("protocol")
    val log = new CasLog
    CommitLog.register(root, log)
    try {
      MergeTable.create(spark, root, baseDf(2000), "k", nFiles = 4,
        commitTsMillis = 10L)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[
        graft.streaming.MergeTable.OccOutcome]()
      val threads = (0 until 4).map { w =>
        new Thread(() => {
          try {
            (0 until 2).foreach { i =>
              val lo = w * 500L + i * 100L
              val changes = spark.range(lo, lo + 100L).select(
                lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
                (col("id") + 7L).as("v"), lit(s"w$w").as("tag"))
              val h = MergeTable.prepareMerge(spark, root, changes, "k",
                nFiles = 1)
              outcomes.add(MergeTable.commitPrepared(spark, root, h,
                commitTsMillis = 100L + w * 10 + i, maxAttempts = 30))
            }
          } catch { case t: Throwable => errors.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(300000))
      assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
      import scala.jdk.CollectionConverters._
      val gens = outcomes.asScala.map(_.gen).toSeq
      assert(gens.size === 8 && gens.distinct.size === 8)
      // dense ids: create = 1, commits claim 2..9 exactly
      assert(Snapshots.generations(spark, root).sorted ===
        (1L to 9L))
      assert(log.wins.get() === 8,
        "every published generation went through the CAS claim")
      val byK = MergeTable.read(spark, root).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(byK.size === 2000)
      (0 until 4).foreach { w =>
        (w * 500L until w * 500L + 200L).foreach { k =>
          assert(byK(k) === ((k + 7L, s"w$w")), s"lost update at k=$k")
        }
      }
    } finally CommitLog.unregister(root)
  }
}
