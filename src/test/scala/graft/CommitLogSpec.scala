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
