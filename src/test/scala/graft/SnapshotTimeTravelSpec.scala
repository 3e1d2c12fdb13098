package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SnapshotSqlCatalog
import graft.streaming.Snapshots

/** SQL `TIMESTAMP AS OF` / `VERSION AS OF` — the parser face of time
  * travel: the SQL text must resolve the SAME generation as the
  * readAsOf/readAt API, and the pre-window refusal must surface as an
  * AnalysisException naming the available commits. */
class SnapshotTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("SQL time travel resolves the same generation as the API; refusals name the window") {
    import spark.implicits._
    val root = TestSpark.tempDir("sql-asof") + "/wh"
    for (g <- 1L to 3L) {
      Seq((g, s"gen$g")).toDF("doc_id", "body")
        .write.parquet(Snapshots.genDir(root, g) + "/batch=0")
      Snapshots.commit(spark, root, g, commitTsMillis = g * 1000L)
    }
    // a session with the library extensions installed — the deployment
    // shape (spark.sql.extensions=graft.GraftExtensions)
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      SnapshotSqlCatalog.register(ext, "wh", root)

      def bodies(sql: String): Seq[String] =
        ext.sql(sql).select("body").collect().map(_.getString(0)).toSeq

      // TIMESTAMP AS OF: newest commit at-or-before the instant —
      // 2.5s after epoch → gen 2, same as the API
      assert(bodies("SELECT * FROM wh TIMESTAMP AS OF '1970-01-01 00:00:02.5'")
        === Seq("gen2"))
      assert(Snapshots.readAsOf(ext, root, 2500L)
        .select("body").collect().map(_.getString(0)).toSeq === Seq("gen2"))
      // exact commit instant is inclusive
      assert(bodies("SELECT * FROM wh TIMESTAMP AS OF '1970-01-01 00:00:01'")
        === Seq("gen1"))
      // projections/filters compose over the travelled relation
      assert(ext.sql("SELECT doc_id FROM wh TIMESTAMP AS OF " +
          "'1970-01-01 00:00:59' WHERE body = 'gen3'")
        .collect().map(_.getLong(0)).toSeq === Seq(3L))
      // VERSION AS OF: a committed generation number
      assert(bodies("SELECT * FROM wh VERSION AS OF 1") === Seq("gen1"))

      // pre-window: AnalysisException NAMING the available commits
      val pre = intercept[AnalysisException](
        ext.sql("SELECT * FROM wh TIMESTAMP AS OF '1970-01-01 00:00:00.5'")
          .collect())
      assert(pre.getMessage.contains("gen 1 @ 1000"), pre.getMessage)
      // unknown generation: AnalysisException naming committed gens
      val badGen = intercept[AnalysisException](
        ext.sql("SELECT * FROM wh VERSION AS OF 9").collect())
      assert(badGen.getMessage.contains("committed: 1, 2, 3"),
        badGen.getMessage)
      // a plausible-but-unregistered name: refused naming what IS
      // registered, not the opaque builtin error
      val noReg = intercept[AnalysisException](
        ext.sql("SELECT * FROM nope TIMESTAMP AS OF '1970-01-01'")
          .collect())
      assert(noReg.getMessage.contains("registered: wh"), noReg.getMessage)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("SQL time travel over a MERGE table reads manifest-directed and DV-applied") {
    import org.apache.spark.sql.functions._
    import graft.streaming.MergeTable
    val root = TestSpark.tempDir("sql-merge-asof") + "/table"
    val base = spark
    import base.implicits._
    MergeTable.create(spark, root,
      spark.range(10).select(col("id").as("k"), (col("id") * 10).as("v")),
      "k", nFiles = 2, commitTsMillis = 1000L)
    // gen 2: a MOR delete — raw directory reads would resurrect k=3
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 3L, 0L), ("u", 2L, 5L, 555L)).toDF("op", "seq", "k", "v"),
      "k", commitTsMillis = 2000L)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      SnapshotSqlCatalog.registerMerge(ext, "lake", root)
      // current generation through SQL: DV applied (no k=3), upsert seen
      val cur = ext.sql("SELECT k, v FROM lake TIMESTAMP AS OF " +
          "'1970-01-01 00:00:10' ORDER BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!cur.contains(3L), "DV-deleted row resurrected through SQL")
      assert(cur(5L) === 555L)
      assert(cur.size === 9)
      // VERSION AS OF the pre-merge generation: the delete not yet applied
      val g1 = ext.sql("SELECT k, v FROM lake VERSION AS OF 1 ORDER BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(g1(3L) === 30L && g1(5L) === 50L && g1.size === 10)
      // the refusal face lists merge-registered names too
      val noReg = intercept[AnalysisException](
        ext.sql("SELECT * FROM nope2 TIMESTAMP AS OF '1970-01-01'").collect())
      assert(noReg.getMessage.contains("lake"), noReg.getMessage)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("bare SQL reads plan over the manifest FileIndex: pushed filters " +
    "skip files PLANNER-side; DV'd generations keep the indexed scan " +
    "under the anti-join") {
    import org.apache.spark.sql.functions._
    import graft.streaming.MergeTable
    val root = TestSpark.tempDir("sql-fileindex") + "/table"
    val base = spark
    MergeTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), (col("id") * 10).as("v")),
      "k", nFiles = 4, commitTsMillis = 1000L)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      SnapshotSqlCatalog.registerMerge(ext, "lake_idx", root)
      def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        // the WIDEST scan in the plan (a DV'd read carries a second,
        // sidecar-sized scan on the broadcast side — the table scan is
        // the one whose skipping is under test)
        var n = -1L
        def walk(p: SparkPlan): Unit = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            n = math.max(n, s.metrics("numFiles").value)
          case other => other.children.foreach(walk)
        }
        walk(df.queryExecution.executedPlan); n
      }
      // a key band covered by ONE file's manifest range: the SQL scan
      // must open exactly that file — skipping decided from the
      // manifest, zero footer reads
      val df = ext.sql(
        "SELECT k, v FROM lake_idx WHERE k BETWEEN 10 AND 19 ORDER BY k")
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === (10L to 19L).map(k => (k, k * 10)))
      assert(scanFiles(df) === 1L, "manifest pruning must reach the SQL scan")
      // the unfiltered read serves every file, exactly
      val all = ext.sql("SELECT count(*) AS c FROM lake_idx")
      assert(all.head().getLong(0) === 100L)
      // a generation carrying DVs keeps the INDEXED scan and layers the
      // broadcast DV anti-join above it — pushed filters still skip
      // files planner-side between maintenance runs
      MergeTable.mergeMor(ext, root,
        ext.range(1).select(lit("d").as("op"), lit(1L).as("seq"),
          lit(5L).as("k"), lit(0L).as("v")),
        "k", commitTsMillis = 2000L)
      val afterDvQ = ext.sql("SELECT k FROM lake_idx WHERE k < 10 ORDER BY k")
      val afterDv = afterDvQ.collect().map(_.getLong(0))
      assert(afterDv.toSeq === Seq(0L, 1L, 2L, 3L, 4L, 6L, 7L, 8L, 9L),
        "the DV-deleted row must not resurrect through the indexed scan")
      assert(scanFiles(afterDvQ) === 1L,
        "a DV'd generation must still prune files from the manifest")
      // an unfiltered DV'd read stays exact too
      assert(ext.sql("SELECT count(*) AS c FROM lake_idx").head().getLong(0)
        === 99L)
      // compact purges the DVs; the fast path resumes
      MergeTable.compact(ext, root, nFiles = 4, commitTsMillis = 3000L)
      val again = ext.sql(
        "SELECT k FROM lake_idx WHERE k BETWEEN 10 AND 19 ORDER BY k")
      assert(again.collect().map(_.getLong(0)).toSeq === (10L to 19L))
      assert(scanFiles(again) === 1L)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("SELECT * FROM history('lake'): metadata-only rows, no table " +
    "scan in the plan; unregistered names refuse naming the registry") {
    import org.apache.spark.sql.functions._
    import graft.streaming.MergeTable
    val root = TestSpark.tempDir("sql-history") + "/table"
    val base = spark
    MergeTable.create(spark, root,
      spark.range(50).select(col("id").as("k"), (col("id") * 10).as("v")),
      "k", nFiles = 2, commitTsMillis = 1000L)
    MergeTable.mergeMor(spark, root,
      spark.range(1).select(lit("d").as("op"), lit(1L).as("seq"),
        lit(7L).as("k"), lit(0L).as("v")),
      "k", commitTsMillis = 2000L)
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 3000L)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      SnapshotSqlCatalog.registerMerge(ext, "lake_h", root)
      val h = ext.sql("SELECT * FROM history('lake_h') ORDER BY generation")
      val rows = h.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getInt(3)))
      assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
      assert(rows.map(_._2).toSeq === Seq(1000L, 2000L, 3000L))
      assert(rows(1)._4 === 1, "the MOR generation carries one DV")
      assert(rows(2)._4 === 0, "compaction purges DVs")
      // the ops question composes as plain SQL over the function
      assert(ext.sql("SELECT generation FROM history('lake_h') WHERE n_dvs > 0")
        .collect().map(_.getLong(0)).toSeq === Seq(2L))
      // METADATA ONLY: the executed plan scans no files at all
      def hasFileScan(df: org.apache.spark.sql.DataFrame): Boolean = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        var found = false
        def walk(p: SparkPlan): Unit = p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _: org.apache.spark.sql.execution.FileSourceScanExec =>
            found = true
          case other => other.children.foreach(walk)
        }
        walk(df.queryExecution.executedPlan); found
      }
      assert(!hasFileScan(h), "DESCRIBE HISTORY must never scan the table")
      // Spark's own TVFs pass through untouched
      assert(ext.sql("SELECT count(*) AS c FROM range(5)").head().getLong(0)
        === 5L)
      // unregistered: loud refusal naming what IS registered
      val e = intercept[AnalysisException](
        ext.sql("SELECT * FROM history('nope')").collect())
      assert(e.getMessage.contains("lake_h"), e.getMessage)

      // changes(): the CDF as a table function ≡ the API diff, and SQL
      // composes over it
      val sqlDiff = ext.sql(
        "SELECT change, k FROM changes('lake_h', 1, 2) ORDER BY change, k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val apiDiff = MergeTable.changesBetween(ext, root, 1L, 2L)
        .select(col("change"), col("k")).orderBy("change", "k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(sqlDiff === apiDiff)
      assert(sqlDiff === Seq(("d", 7L)), "gen 1→2 is exactly the MOR delete")
      // backfill window: from 0 = the whole state at gTo as inserts
      assert(ext.sql(
        "SELECT count(*) AS c FROM changes('lake_h', 0, 1) WHERE change = 'i'")
        .head().getLong(0) === 50L)
      // SQL composes downstream: count deletes across the full history
      assert(ext.sql(
        "SELECT count(*) AS c FROM changes('lake_h', 1, 3) WHERE change = 'd'")
        .head().getLong(0) === 1L)
      // changes_paired(): the update-paired label vocabulary (this
      // window is a pure delete → 'delete'; the full four-type pairing
      // is oracled as t_change_feed_updates)
      assert(ext.sql(
        "SELECT change, k FROM changes_paired('lake_h', 1, 2)")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
        Seq(("delete", 7L)))
      // out-of-retention / unknown generations refuse loudly
      val badGen = intercept[AnalysisException](
        ext.sql("SELECT * FROM changes('lake_h', 1, 99)").collect())
      assert(badGen.getMessage.contains("99"), badGen.getMessage)
      val badTable = intercept[AnalysisException](
        ext.sql("SELECT * FROM changes('nope', 1, 2)").collect())
      assert(badTable.getMessage.contains("lake_h"), badTable.getMessage)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("SQL DML over a registered merge table: DELETE via DVs, UPDATE " +
    "via scoped COW, bare SELECT serves the current state") {
    import org.apache.spark.sql.functions._
    import graft.streaming.MergeTable
    val root = TestSpark.tempDir("sql-dml") + "/table"
    val base = spark
    MergeTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), (col("id") * 10).as("v"),
        lit("base").as("tag")),
      "k", nFiles = 4, commitTsMillis = 1000L)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      SnapshotSqlCatalog.registerMerge(ext, "lake_dml", root)
      // DELETE: returns the deleted count; lands as one DV generation
      val del = ext.sql("DELETE FROM lake_dml WHERE k < 10").collect()
      assert(del.map(_.getLong(0)).toSeq === Seq(10L))
      // UPDATE: scoped rewrite, returns (rewritten, carried). The OCC
      // path (round 18) prices COW-vs-MOR by write amplification, so
      // the exact file split differs from the legacy face — assert the
      // metrics are CONSISTENT (some candidate work happened, rewritten
      // + carried covers the new manifest) rather than a physical count
      val upd = ext.sql("UPDATE lake_dml SET v = v + 1, tag = 'sqlupd' " +
        "WHERE k BETWEEN 10 AND 19").collect()
      assert(upd.head.getInt(0) >= 1,
        s"expected at least one rewritten candidate, got ${upd.head}")
      assert(upd.head.getInt(1) >= 1,
        s"expected carried files beside the scoped rewrite, got ${upd.head}")
      // bare SELECT = the current committed, DV-applied state
      val got = ext.sql("SELECT k, v, tag FROM lake_dml ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.length === 90 && got.head === ((10L, 101L, "sqlupd")))
      assert(got.find(_._1 == 50L).get === ((50L, 500L, "base")))
      // time travel composes with DML history: VERSION AS OF 1 is pre-DML
      assert(ext.sql("SELECT count(*) AS c FROM lake_dml VERSION AS OF 1")
        .head().getLong(0) === 100L)
      // the API's refusals surface through SQL too (key re-assignment)
      val eKey = intercept[Exception](
        ext.sql("UPDATE lake_dml SET k = 1 WHERE v = 500").collect())
      assert(eKey.getMessage.contains("re-keys"), eKey.getMessage)
      // qualified and aliased statement forms — both valid SQL — resolve
      // (the qualifiers are stripped before the run-time re-parse)
      assert(ext.sql("DELETE FROM lake_dml WHERE lake_dml.k = 99")
        .head().getLong(0) === 1L)
      val updAl = ext.sql(
        "UPDATE lake_dml AS t SET v = t.v + 1000 WHERE t.k = 20").collect()
      // the occ pricing may stage this 1-row update as COW (rewrites
      // its candidate) or MOR (rewrites nothing); the row-value check
      // below is the semantic gate
      assert(updAl.length === 1 && updAl.head.getInt(0) >= 0)
      val after = ext.sql("SELECT k, v FROM lake_dml ORDER BY k")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!after.contains(99L) && after(20L) === 1200L)
      // duplicate SET targets refused (standard SQL), not last-wins
      val eDup = intercept[Exception](
        ext.sql("UPDATE lake_dml SET v = 1, v = 2 WHERE k = 5").collect())
      assert(eDup.getMessage.contains("more than once"), eDup.getMessage)
      // an UNREGISTERED name is untouched by the rule (Spark's own error)
      intercept[Exception](
        ext.sql("DELETE FROM not_registered WHERE k = 1").collect())
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("per-commit CDF pairing: a delete and a later-commit re-insert " +
    "stay d/i under changesBetweenPairedPerCommit (rows carry their " +
    "generation) while the windowed default collapses them to an " +
    "update pair — API and TVF faces agree") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.MergeTable
    val root = TestSpark.tempDir("cdf-percommit") + "/t"
    MergeTable.create(spark, root,
      spark.range(20).select(col("id").as("k"), (col("id") * 10).as("v"),
        lit("base").as("tag")),
      "k", nFiles = 2, commitTsMillis = 10L)
    // gen 2: delete k=5; gen 3: re-insert k=5 with a NEW value — two
    // separate commits, one logical "replacement" across the window
    MergeTable.merge(spark, root,
      Seq(("d", 1L, 5L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 5L, 999L, "reborn")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 30L)
    // windowed default: the whole-span netting reports an UPDATE pair
    val windowed = MergeTable.changesBetweenPaired(spark, root, 1L, 3L)
      .where(col("k") === 5L).select("change", "v").orderBy("change")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(windowed === Seq(("update_postimage", 999L),
      ("update_preimage", 50L)))
    // per-commit: the true event history, each row naming its commit
    val perCommit = MergeTable
      .changesBetweenPairedPerCommit(spark, root, 1L, 3L)
      .where(col("k") === 5L)
      .select("change", "v", "generation").orderBy("generation")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(perCommit === Seq(("delete", 50L, 2L), ("insert", 999L, 3L)))
    // a SAME-commit update still pairs per hop (gen 4 updates k=7)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 7L, 777L, "u")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 40L)
    val hop = MergeTable
      .changesBetweenPairedPerCommit(spark, root, 3L, 4L)
      .where(col("k") === 7L).select("change", "v").orderBy("change")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hop === Seq(("update_postimage", 777L),
      ("update_preimage", 70L)))
    // the TVF face agrees with the API
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "lake_pc", root)
    try {
      val tvf = spark.sql("SELECT change, v, generation FROM " +
        "changes_paired_per_commit('lake_pc', 1, 3) WHERE k = 5 " +
        "ORDER BY generation")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(tvf === perCommit)
    } finally
      graft.plans.SnapshotSqlCatalog.unregisterMerge(spark, "lake_pc")
  }
}
