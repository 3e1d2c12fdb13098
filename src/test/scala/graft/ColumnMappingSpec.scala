package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** Column mapping: RENAME/DROP as METADATA-ONLY commits through the
  * recorded `#schema=` chain — data files untouched, reads coalesce
  * the alias chain, per-file stats and bloom registries keyed by
  * name-at-write keep pruning, time travel serves each generation's
  * own names, and a full compact physically sheds the chain. */
class ColumnMappingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-colmap-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  private def condOf(root: String, p: Column) =
    MergeTable.read(spark, root).limit(0).filter(p)
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }

  private def candidates(root: String, p: Column): Int =
    MergeTable.pruneByCondition(spark, root,
      MergeTable.currentMeta(spark, root), condOf(root, p)).size

  test("RENAME COLUMN is metadata-only: files untouched, new reads " +
    "serve the new name, merges write it, STATS + BLOOM keyed by the " +
    "old name keep pruning, time travel keeps the old name") {
    val root = freshRoot("rename")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    MergeTable.ensureBloomIndex(spark, root, "v")
    val filesBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    val gPre = Snapshots.currentGen(spark, root).get
    val gRen = MergeTable.renameColumn(spark, root, "v", "amount",
      commitTsMillis = 20L)
    // metadata-only: every data file carried by name
    assert(MergeTable.currentManifest(spark, root).map(_.name).toSet ===
      filesBefore)
    val df = MergeTable.read(spark, root)
    assert(df.columns.toSeq === Seq("k", "amount", "tag"))
    assert(df.where(col("k") === 7L).head.getLong(1) === 70L)
    // the v-range stats (keyed 'v' at write) prune an `amount` band —
    // k-correlated, so a narrow band must skip files
    val all = MergeTable.currentManifest(spark, root).size
    assert(candidates(root, col("amount").between(0L, 100L)) < all,
      "renamed column's #cstat ranges must keep pruning")
    // the bloom registry built under 'v' refines an amount EQUALITY
    val eqCand = candidates(root, col("amount") === 700L)
    assert(eqCand < all, "pre-rename bloom registry must keep refining")
    assert(MergeTable.readWhere(spark, root, col("amount") === 700L)
      .collect().map(_.getLong(0)).toSeq === Seq(70L))
    // merges speak the NEW name (COW and MOR both — the MOR path
    // exercises lineage through the mapped read)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 7L, 777L, "w")).toDF("op", "seq", "k", "amount", "tag"),
      "k", commitTsMillis = 30L)
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 9L, 0L, "")).toDF("op", "seq", "k", "amount", "tag"),
      "k", commitTsMillis = 40L)
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(7L) === 777L && !byK.contains(9L) && byK.size === 3999)
    // predicate DML through the new name (DV lineage + scoped COW)
    MergeTable.deleteWhere(spark, root, col("amount") === 110L,
      commitTsMillis = 50L)
    MergeTable.updateWhere(spark, root, col("amount") === 130L,
      Map("amount" -> lit(131L)), commitTsMillis = 60L)
    val byK2 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byK2.contains(11L) && byK2(13L) === 131L)
    // time travel BEFORE the rename: the old name, the old values
    val old = MergeTable.readAt(spark, root, gPre)
    assert(old.columns.toSeq === Seq("k", "v", "tag"))
    assert(old.where(col("k") === 7L).head.getLong(1) === 70L)
    assert(gRen === gPre + 1)
  }

  test("RENAME refusals: key column, missing column, collision with a " +
    "live name and with a STORED old name; reserved names") {
    val root = freshRoot("rename-refuse")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    intercept[IllegalArgumentException] {
      MergeTable.renameColumn(spark, root, "k", "key2")
    }
    intercept[IllegalArgumentException] {
      MergeTable.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      MergeTable.renameColumn(spark, root, "v", "tag")
    }
    intercept[IllegalArgumentException] {
      MergeTable.renameColumn(spark, root, "v", "change")
    }
    MergeTable.renameColumn(spark, root, "v", "amount",
      commitTsMillis = 20L)
    // 'v' is still a STORED name (old files carry amount's bytes under
    // it) — since round 17 re-taking it is a LOGICAL-ONLY rename: tag
    // keeps its physical identity ('tag'), only the label moves, so no
    // new file can ever collide with the old bytes
    MergeTable.renameColumn(spark, root, "tag", "v", commitTsMillis = 30L)
    assert(MergeTable.read(spark, root).columns.toSeq ===
      Seq("k", "amount", "v"))
    val r5 = MergeTable.read(spark, root).where(col("k") === 5L).head
    assert(r5.getLong(1) === 50L && r5.getString(2) === "base",
      "label-only rename must not leak the old 'v' bytes into the label")
    // writes through the new labels land under PHYSICAL identities and
    // read back exactly
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 5L, 555L, "w")).toDF("op", "seq", "k", "amount", "v"),
      "k", commitTsMillis = 40L)
    val r5b = MergeTable.read(spark, root).where(col("k") === 5L).head
    assert(r5b.getLong(1) === 555L && r5b.getString(2) === "w")
    // a VISIBLE logical name still refuses, at both doors
    intercept[IllegalArgumentException] {
      MergeTable.renameColumn(spark, root, "amount", "v")
    }
    intercept[IllegalArgumentException] {
      MergeTable.addColumns(spark, root, Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
    }
  }

  test("DROP COLUMN hides without rewriting; merge evolution still " +
    "refuses the poisoned name; time travel serves it; a full compact " +
    "SHEDS the chain") {
    val root = freshRoot("drop")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 4,
      commitTsMillis = 10L)
    val filesBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    val gPre = Snapshots.currentGen(spark, root).get
    MergeTable.dropColumn(spark, root, "tag", commitTsMillis = 20L)
    assert(MergeTable.currentManifest(spark, root).map(_.name).toSet ===
      filesBefore, "DROP must be metadata-only")
    assert(MergeTable.read(spark, root).columns.toSeq === Seq("k", "v"))
    // merges no longer carry (or require) the dropped column
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 5L, 555L)).toDF("op", "seq", "k", "v"),
      "k", commitTsMillis = 30L)
    assert(MergeTable.read(spark, root).where(col("k") === 5L)
      .head.getLong(1) === 555L)
    // merge EVOLUTION still refuses the poisoned name (the explicit
    // re-add door is addColumns, which mints a fresh physical
    // identity — see the re-ADD test below)
    intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root,
        Seq(("u", 1L, 6L, 66L, "x")).toDF("op", "seq", "k", "v", "tag"),
        "k", commitTsMillis = 35L, evolveSchema = true)
    }
    // time travel to the pre-drop generation serves the column
    val old = MergeTable.readAt(spark, root, gPre)
    assert(old.columns.toSeq === Seq("k", "v", "tag"))
    // key columns never drop
    intercept[IllegalArgumentException] {
      MergeTable.dropColumn(spark, root, "k")
    }
    // the full rewrite sheds the chain: mapping gone, name free again
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 40L)
    val m = MergeTable.currentMeta(spark, root)
    assert(m.schema.exists(s => !MergeTable.hasMapping(s)),
      "compact must clear the mapping chain")
    MergeTable.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType)), commitTsMillis = 50L)
    assert(MergeTable.read(spark, root).columns.toSeq ===
      Seq("k", "v", "tag"))
  }

  test("re-ADD after DROP (field-identity mapping): the new column " +
    "starts NULL everywhere, writes land under a minted physical " +
    "identity, the dropped namesake's bytes stay dark, time travel " +
    "serves BOTH populations, and stats + bloom pruning work") {
    val root = freshRoot("readd")
    // status is key-correlated so pre-drop files carry narrow ranges
    val df = spark.range(800).select(col("id").as("k"),
      (col("id") * 10).as("v"),
      concat(lit("s"), lpad((col("id") / 200).cast("long").cast("string"),
        2, "0")).as("status"))
    MergeTable.create(spark, root, df, "k", nFiles = 4, commitTsMillis = 10L)
    val gPre = Snapshots.currentGen(spark, root).get
    MergeTable.dropColumn(spark, root, "status", commitTsMillis = 20L)
    // the re-ADD: same logical name, FRESH physical identity
    MergeTable.addColumns(spark, root, Seq(
      org.apache.spark.sql.types.StructField("status",
        org.apache.spark.sql.types.StringType)), commitTsMillis = 30L)
    assert(MergeTable.read(spark, root).columns.toSeq ===
      Seq("k", "v", "status"))
    // population 1 — every pre-existing row serves NULL: the dropped
    // namesake's bytes must NEVER leak into the re-added column
    assert(MergeTable.read(spark, root)
      .where(col("status").isNotNull).count() === 0L)
    // population 2 — writes through the new column land and read back
    MergeTable.merge(spark, root,
      spark.range(100, 120).select(lit("u").as("op"), lit(1L).as("seq"),
        col("id").as("k"), (col("id") * 10).as("v"),
        lit("fresh").as("status")),
      "k", nFiles = 1, commitTsMillis = 40L)
    val st = MergeTable.read(spark, root)
      .groupBy(col("status")).count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(st(Some("fresh")) === 20L && st(None) === 780L,
      s"both populations must be exact: $st")
    // time travel: the PRE-DROP generation still serves the original
    // values under the original identity
    val old = MergeTable.readAt(spark, root, gPre)
      .where(col("k") === 5L).head
    assert(old.getString(2) === "s00")
    // pruning on the re-added column: old files have no stats under
    // the minted identity (unknown — always read), but the bloom
    // registry records them as all-NULL ("provably contains no
    // value"), so an equality probe opens ONLY the new file
    assert(MergeTable.ensureBloomIndex(spark, root, "status") === 4)
    val m = MergeTable.currentMeta(spark, root)
    val cond = MergeTable.read(spark, root)
      .filter(col("status") === "fresh")
      .queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
    // the condition names the LOGICAL column; aliasSet translates it to
    // the minted identity for both the #cstat and the bloom lookups
    val cand = MergeTable.pruneByCondition(spark, root, m, cond)
    assert(cand.size === 1,
      s"bloom must confine the probe to the minted file: ${cand.size}")
    assert(MergeTable.readWhere(spark, root, col("status") === "fresh")
      .count() === 20L)
    // CDF across the drop+re-add window stays row-exact under the
    // TO-state schema (old images carry NULL status)
    val gNow = Snapshots.currentGen(spark, root).get
    val feed = MergeTable.changesBetween(spark, root, gPre, gNow)
    val ins = feed.where(col("change") === "i" &&
      col("status") === "fresh").count()
    assert(ins === 20L, s"re-added column must ride the feed: $ins")
  }

  test("the CHANGE FEED crosses a rename window row-exactly: the " +
    "rename commit itself feeds NOTHING, and a post-rename merge feeds " +
    "its true changes under the NEW name") {
    val root = freshRoot("cdf-rename")
    MergeTable.create(spark, root, baseDf(500), "k", nFiles = 2,
      commitTsMillis = 10L)
    val g1 = Snapshots.currentGen(spark, root).get
    val gRen = MergeTable.renameColumn(spark, root, "v", "amount",
      commitTsMillis = 20L)
    assert(MergeTable.changesBetween(spark, root, g1, gRen).count() === 0L,
      "a metadata-only rename must feed zero change rows")
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 3L, 333L, "w")).toDF("op", "seq", "k", "amount", "tag"),
      "k", commitTsMillis = 30L)
    val feed = MergeTable.changesBetween(spark, root, g1,
      Snapshots.currentGen(spark, root).get)
    assert(feed.columns.contains("amount") && !feed.columns.contains("v"))
    val rows = feed.orderBy("change").collect()
      .map(r => (r.getAs[String]("change"), r.getAs[Long]("k"),
        r.getAs[Long]("amount"))).toSeq
    assert(rows === Seq(("d", 3L, 30L), ("i", 3L, 333L)),
      s"feed across the rename window: $rows")
  }

  test("SQL file skipping SURVIVES a rename: the pushed coalesce-chain " +
    "predicate collapses to its alias chain, and the scan opens a " +
    "strict file subset keyed by the OLD stat name") {
    val root = freshRoot("sql-prune")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    MergeTable.renameColumn(spark, root, "v", "amount",
      commitTsMillis = 20L)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "colmap_prune",
      root)
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
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
    // v = k*10 is key-correlated: a narrow amount band lives in one
    // file's 'v'-keyed #cstat range — the mapped SQL scan must open a
    // strict subset (before the coalesce collapse it opened all 8)
    val q = spark.sql("SELECT k, amount FROM colmap_prune " +
      "WHERE amount BETWEEN 100 AND 200 ORDER BY k")
    val rows = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === (10L to 20L).map(k => (k, k * 10)))
    val opened = scanFiles(q)
    assert(opened >= 1 && opened < 8,
      s"mapped SQL scan must file-skip via the alias chain: opened $opened")
  }

  test("SQL citizenship: ALTER TABLE RENAME/DROP COLUMN through the " +
    "catalog; SELECT serves the mapped shape; TYPE changes refuse by " +
    "name") {
    val cat = "colmapcat"
    val wh = TestSpark.tempDir("graft-colmap-wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.plans.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    MergeTable.create(spark, s"$wh/t_map", baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    spark.sql(s"ALTER TABLE $cat.t_map RENAME COLUMN v TO amount")
    assert(spark.sql(s"SELECT amount FROM $cat.t_map WHERE k = 7")
      .head.getLong(0) === 70L)
    spark.sql(s"ALTER TABLE $cat.t_map DROP COLUMN tag")
    assert(spark.table(s"$cat.t_map").columns.toSeq === Seq("k", "amount"))
    val boom = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_map ALTER COLUMN amount TYPE STRING")
    }
    assert(boom.getMessage.contains("TYPE changes"),
      s"type change must refuse by name: ${boom.getMessage}")
    // DML through the mapped shape: INSERT + UPDATE speak the NEW name
    // and the positional width is the VISIBLE width (hidden fields
    // must not count)
    spark.sql(s"INSERT INTO $cat.t_map VALUES (1000, 9L)")
    spark.sql(s"UPDATE $cat.t_map SET amount = 11 WHERE k = 1")
    val got = spark.sql(
      s"SELECT k, amount FROM $cat.t_map WHERE k IN (1, 1000) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 11L), (1000L, 9L)))
  }
}
