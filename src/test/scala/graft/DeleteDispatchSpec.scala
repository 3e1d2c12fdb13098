package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** deleteWhere's stats-driven dispatch (DV sidecar vs scoped COW
  * rewrite), the size-gated DV read path, and record_count backfill
  * for legacy manifests — the round-15 scale fixes: a majority delete
  * must not mint a table-sized DV every later read broadcasts, and a
  * pre-rows manifest must become honestly priceable. */
class DeleteDispatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-deldisp-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  private def curMeta(root: String) =
    MergeTable.genMeta(spark, Snapshots.resolve(spark, root))

  test("majority delete dispatches to the scoped COW rewrite: no DV, " +
    "candidate files replaced, rows exact") {
    val root = freshRoot("cow")
    MergeTable.create(spark, root, baseDf(400), "k", nFiles = 4,
      commitTsMillis = 10L)
    val namesBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    // 80% of every file matches — the DV shape would tax every later read
    val n = MergeTable.deleteWhere(spark, root, col("k") % 10 < 8,
      commitTsMillis = 20L)
    assert(n === 320L)
    val m = curMeta(root)
    assert(m.dvs.isEmpty, "majority delete must not mint a DV")
    assert(m.entries.map(_.name).toSet.intersect(namesBefore).isEmpty,
      "every candidate file should have been rewritten")
    val got = MergeTable.read(spark, root).orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(got === (0L until 400L).filter(_ % 10 >= 8))
  }

  test("sparse delete keeps the DV sidecar; both forced paths return " +
    "identical rows (three-valued predicate logic included)") {
    // v is NULL on k%7==0: the predicate v>50 is NULL there — kept on
    // BOTH paths (DV deletes only TRUE; rewrite keeps NOT(p <=> true))
    def nullableBase = spark.range(120).select(col("id").as("k"),
      when(col("id") % 7 =!= 0, col("id") * 10).as("v"),
      lit("base").as("tag"))
    def build(tag: String): String = {
      val root = freshRoot(tag)
      MergeTable.create(spark, root, nullableBase, "k", nFiles = 3,
        commitTsMillis = 10L)
      root
    }
    val pred = col("v") > 50L && col("v") < 400L
    val dvRoot = build("dv")
    val cowRoot = build("cowf")
    val nDv = MergeTable.deleteWhere(spark, dvRoot, pred,
      commitTsMillis = 20L, rewriteAboveFraction = 2.0)
    val nCow = MergeTable.deleteWhere(spark, cowRoot, pred,
      commitTsMillis = 20L, rewriteAboveFraction = 0.0)
    assert(nDv === nCow)
    assert(curMeta(dvRoot).dvs.size === 1)
    assert(curMeta(cowRoot).dvs.isEmpty)
    def rows(root: String) = MergeTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L
        else r.getLong(1), r.getString(2))).toSeq
    assert(rows(dvRoot) === rows(cowRoot))
    // null-predicate rows (k%7==0, v null) survived
    assert(rows(dvRoot).exists(_._2 === -1L))
    // default dispatch on a genuinely sparse shape: k%10==3 matches 10%
    // of every candidate file (the modulo defeats pruning, so candidates
    // = all files and the fraction is 12/120) = DV path. Note `pred`
    // above would default-dispatch to COW: its candidates prune to ONE
    // file of which 72% matches — the fraction is candidate-relative.
    val defRoot = build("def")
    MergeTable.deleteWhere(spark, defRoot, col("k") % 10 === 3,
      commitTsMillis = 20L)
    assert(curMeta(defRoot).dvs.size === 1)
  }

  test("dispatch prices LIVE rows: a majority-of-live delete on " +
    "mostly-DV-dead files takes the rewrite, not another DV") {
    val root = freshRoot("live")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 1,
      commitTsMillis = 10L)
    // 70% of written rows are already DV-dead
    MergeTable.deleteWhere(spark, root, col("k") < 70L,
      commitTsMillis = 20L, rewriteAboveFraction = 2.0)
    assert(curMeta(root).dvs.size === 1)
    // 27 of the 30 LIVE rows match: 27/100 written would read sparse,
    // 27/30 live is a majority — the rewrite must win and fold the DV
    val n = MergeTable.deleteWhere(spark, root, col("k") < 97L,
      commitTsMillis = 30L)
    assert(n === 27L)
    val m = curMeta(root)
    assert(m.dvs.isEmpty,
      "a majority-of-live delete must take the COW rewrite")
    assert(MergeTable.read(spark, root).orderBy("k")
      .collect().map(_.getLong(0)).toSeq === Seq(97L, 98L, 99L))
  }

  test("DV read path is size-gated: broadcast under the session " +
    "threshold, shuffled anti-join above — rows identical") {
    val root = freshRoot("gate")
    MergeTable.create(spark, root, baseDf(500), "k", nFiles = 2,
      commitTsMillis = 10L)
    MergeTable.deleteWhere(spark, root, col("k") % 5 === 0,
      commitTsMillis = 20L, rewriteAboveFraction = 2.0)
    assert(curMeta(root).dvs.size === 1)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val expected = (0L until 500L).filter(_ % 5 != 0)
    // default threshold (10 MB): tiny DV broadcasts
    val pBroad = planOf(MergeTable.read(spark, root))
    assert(pBroad.contains("BroadcastHashJoin"),
      s"small DV should broadcast:\n$pBroad")
    // threshold below the DV's on-disk bytes: hint dropped, planner
    // picks a shuffled/sorted anti-join; rows must not move
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val df = MergeTable.read(spark, root)
      val p = planOf(df)
      assert(!p.contains("BroadcastHashJoin"),
        s"over-threshold DV must not broadcast:\n$p")
      assert(df.orderBy("k").collect().map(_.getLong(0)).toSeq === expected)
    } finally spark.conf.set(key, saved)
    assert(MergeTable.read(spark, root).orderBy("k")
      .collect().map(_.getLong(0)).toSeq === expected)
  }

  /** Rewrite the current generation's manifest to the pre-r14 shape:
    * entry lines keep only (name, minKey, maxKey) — no bytes, no rows. */
  private def legacyizeManifest(root: String): Unit = {
    val dir = Snapshots.resolve(spark, root)
    val p = java.nio.file.Paths.get(dir, "_MANIFEST")
    val legacy = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
      .map { l =>
        if (l.startsWith("#") || l.trim.isEmpty) l
        else l.split("\t").take(3).mkString("\t")
      }
    java.nio.file.Files.write(p,
      scala.jdk.CollectionConverters.SeqHasAsJava(legacy.toSeq).asJava)
    // Hadoop's ChecksumFileSystem keeps a .crc sidecar — stale after
    // this raw rewrite; drop it so reads don't fail on checksum
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir, "._MANIFEST.crc"))
  }

  test("record_count backfill: a legacy manifest prices mergeAuto to " +
    "COW; analyzeManifest stamps rows+bytes and flips the trickle to MOR") {
    val root = freshRoot("backfill")
    MergeTable.create(spark, root, baseDf(2000), "k", nFiles = 1,
      commitTsMillis = 10L)
    legacyizeManifest(root)
    val m0 = curMeta(root)
    assert(m0.entries.forall(e => e.rows < 0 && e.bytes < 0))
    def trickle(k: Long, ts: Long) = {
      val ch = Seq(("u", 1L, k, k * 100L, "hot")).toDF("op", "seq", "k", "v", "tag")
      MergeTable.mergeAuto(spark, root, ch, "k", commitTsMillis = ts)
    }
    // legacy: touched rows price as 0 → amplification 0 → COW (the
    // read-optimal bias), even though the true amplification is 2000×
    val (p1, _, _) = trickle(5L, 20L)
    assert(p1 === "cow", s"legacy manifest should bias to COW, got $p1")
    // the COW rewrite re-stamped rows on its OWN output; legacy-ize
    // again to isolate analyzeManifest
    legacyizeManifest(root)
    assert(MergeTable.analyzeManifest(spark, root,
      commitTsMillis = 30L) > 0)
    val m1 = curMeta(root)
    assert(m1.entries.forall(e => e.rows > 0 && e.bytes > 0))
    // second run: nothing legacy, no commit
    val gens = Snapshots.generations(spark, root)
    assert(MergeTable.analyzeManifest(spark, root, commitTsMillis = 40L) === 0)
    assert(Snapshots.generations(spark, root) === gens)
    // now the same trickle prices honestly → MOR
    val (p2, _, _) = trickle(7L, 50L)
    assert(p2 === "mor", "backfilled rows should flip the trickle to MOR")
    // and the table is still exact
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(5L) === 500L && byK(7L) === 700L && byK(9L) === 90L)
    assert(byK.size === 2000)
  }

  test("optimize stamps carried legacy entries opportunistically") {
    val root = freshRoot("optstamp")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 1,
      commitTsMillis = 10L)
    // two tiny appends = small-file debris next to the big file
    Seq((2000L, 20L), (3000L, 30L)).foreach { case (k0, ts) =>
      MergeTable.merge(spark, root,
        spark.range(k0, k0 + 5).select(lit("c").as("op"), lit(1L).as("seq"),
          col("id").as("k"), (col("id") * 10).as("v"), lit("ins").as("tag")),
        "k", nFiles = 1, commitTsMillis = ts)
    }
    legacyizeManifest(root)
    val f = new java.io.File(s"$root/files")
    val sizes = MergeTable.currentManifest(spark, root)
      .map(e => new java.io.File(f, e.name).length())
    val (packed, carried) = MergeTable.optimize(spark, root,
      smallBytes = sizes.max / 2, targetBytes = Long.MaxValue,
      commitTsMillis = 40L)
    assert(packed === 2 && carried === 1)
    val m = curMeta(root)
    assert(m.entries.forall(e => e.rows > 0 && e.bytes > 0),
      "optimize must stamp rows+bytes on carried legacy entries")
    assert(m.entries.map(_.rows).sum === 1010L)
  }
}
