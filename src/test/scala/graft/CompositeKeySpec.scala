package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** Composite (multi-column) merge keys: identity is the full tuple
  * (netting, COW anti-join, MOR DV semi-join, PK probe), the manifest
  * range covers the leading column (tight under tuple-lex range
  * partitioning), and trailing key columns prune through `#cstat`.
  * Refusals stay loud where the composite shape is unsupported. */
class CompositeKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-composite-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  /** (order, line ∈ 1..4) fact rows: v = order*100 + line. */
  private def baseDf(orders: Int) =
    spark.range(orders).select(col("id").as("oid"))
      .crossJoin(spark.range(1, 5).select(col("id").cast("int").as("line")))
      .select(col("oid"), col("line"),
        (col("oid") * 100 + col("line")).as("v"))

  private def state(root: String): Map[(Long, Int), Long] =
    MergeTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("tuple identity end-to-end: update one line, delete another, " +
    "insert a new line under an existing leading key — COW and MOR") {
    val root = freshRoot("tuple")
    MergeTable.create(spark, root, baseDf(40), "oid,line", nFiles = 4,
      commitTsMillis = 10L)
    // COW wave: update (7,2); delete (7,3); insert (7,9) — all three
    // share leading key 7, so single-column identity would collapse them
    val cow = Seq(
      ("u", 1L, 7L, 2, 777L),
      ("d", 1L, 7L, 3, 0L),
      ("c", 1L, 7L, 9, 799L)).toDF("op", "seq", "oid", "line", "v")
    MergeTable.merge(spark, root, cow, "oid,line", commitTsMillis = 20L)
    val s1 = state(root)
    assert(s1((7L, 2)) === 777L)
    assert(!s1.contains((7L, 3)))
    assert(s1((7L, 9)) === 799L)
    assert(s1((7L, 1)) === 701L && s1((7L, 4)) === 704L,
      "sibling lines of the same order must be untouched")
    // MOR wave on the same tuples: DV kills exactly (8,1); (8,2..4) live
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 8L, 1, 0L)).toDF("op", "seq", "oid", "line", "v"),
      "oid,line", commitTsMillis = 30L)
    val s2 = state(root)
    assert(!s2.contains((8L, 1)) && s2((8L, 2)) === 802L)
    // intra-batch netting is per TUPLE: u(9,1) and d(9,2) coexist
    MergeTable.merge(spark, root, Seq(
      ("u", 1L, 9L, 1, 901000L),
      ("d", 1L, 9L, 2, 0L)).toDF("op", "seq", "oid", "line", "v"),
      "oid,line", commitTsMillis = 40L)
    val s3 = state(root)
    assert(s3((9L, 1)) === 901000L && !s3.contains((9L, 2)))
    assert(s3.size === 40 * 4 - 1 + 1 - 1 - 1)
  }

  test("leading-column pruning: a one-order change touches one file; " +
    "the key-mismatch and key-assignment refusals are loud") {
    val root = freshRoot("prune")
    MergeTable.create(spark, root, baseDf(400), "oid,line", nFiles = 8,
      commitTsMillis = 10L)
    val before = MergeTable.currentManifest(spark, root)
    assert(before.size >= 4)
    val (touched, carried) = MergeTable.merge(spark, root,
      Seq(("u", 1L, 5L, 1, 1L)).toDF("op", "seq", "oid", "line", "v"),
      "oid,line", nFiles = 1, commitTsMillis = 20L)
    assert(touched === 1 && carried === before.size - 1,
      s"leading-column range should prune to one file ($touched touched)")
    // the key param must match the manifest's full tuple
    val bad = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root,
        Seq(("u", 1L, 5L, 1, 2L)).toDF("op", "seq", "oid", "line", "v"),
        "oid", commitTsMillis = 30L)
    }
    assert(bad.getMessage.contains("does not match"))
    // updateWhere refuses assigning EITHER key column
    intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, root, col("v") > 0,
        Map("line" -> lit(1)), commitTsMillis = 40L)
    }
    // trailing key column carries #cstat ranges (the residual prune)
    val gd = Snapshots.resolve(spark, root)
    val m = MergeTable.genMeta(spark, gd)
    assert(m.cstats.exists(_.col == "line"),
      "trailing key column should carry #cstat ranges")
    assert(m.key === "oid,line")
  }

  test("PK probe is tuple-exact: an existing (oid,line) reports, a new " +
    "line under an existing oid does not") {
    val root = freshRoot("probe")
    MergeTable.create(spark, root, baseDf(30), "oid,line", nFiles = 3,
      commitTsMillis = 10L)
    val m = MergeTable.genMeta(spark, Snapshots.resolve(spark, root))
    val probe = Seq((3L, 2), (3L, 9), (99L, 1)).toDF("oid", "line")
    // integral probe columns normalize to LONG (the probe's documented
    // native-domain normalization)
    val hits = MergeTable.readWhereKeysOf(spark, root, m, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt)).toSet
    assert(hits === Set((3L, 2)),
      s"only the existing tuple should report, got $hits")
  }

  test("deleteWhere/updateWhere/optimize/compact compose on a " +
    "composite-keyed table; SQL MERGE/INSERT address the tuple") {
    val root = freshRoot("compose")
    MergeTable.create(spark, root, baseDf(50), "oid,line", nFiles = 4,
      commitTsMillis = 10L)
    val nDel = MergeTable.deleteWhere(spark, root,
      col("line") === 4 && col("oid") % 10 === 0,
      commitTsMillis = 20L, rewriteAboveFraction = 2.0)
    assert(nDel === 5L)
    MergeTable.updateWhere(spark, root, col("oid") === 1L,
      Map("v" -> (col("v") + 7L)), commitTsMillis = 30L)
    MergeTable.optimize(spark, root, smallBytes = Long.MaxValue,
      targetBytes = Long.MaxValue, commitTsMillis = 40L)
    val s = state(root)
    assert(s.size === 200 - 5)
    assert(s((1L, 2)) === 102L + 7L && !s.contains((0L, 4)))
    // SQL DML: DELETE works (keyless machinery); MERGE addresses the
    // TUPLE — an ON over the full key touches exactly one line
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "comp_t", root)
    spark.sql("DELETE FROM comp_t WHERE oid = 2 AND line = 1")
    assert(!state(root).contains((2L, 1)))
    spark.sql(
      """MERGE INTO comp_t USING
        |  (SELECT 3 AS oid, 2 AS line, 999 AS nv) s
        |ON comp_t.oid = s.oid AND comp_t.line = s.line
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (oid, line, v)
        |  VALUES (s.oid, s.line, s.nv)""".stripMargin)
    val s2 = state(root)
    assert(s2((3L, 2)) === 999L, "MERGE must update the addressed tuple")
    assert(s2((3L, 1)) === 301L, "sibling lines under the oid untouched")
    // an INSERT clause missing part of the key tuple refuses by name
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO comp_t USING (SELECT 777 AS oid, 1 AS nv) s
          |ON comp_t.oid = s.oid AND comp_t.line = 1
          |WHEN NOT MATCHED THEN INSERT (oid, v) VALUES (s.oid, s.nv)
          |""".stripMargin)
    }
    assert(e.getMessage.contains("line"),
      s"partial-key INSERT must refuse naming the missing column: ${e.getMessage}")
    // SQL INSERT: tuple PK contract — a new line under an existing oid
    // inserts; re-inserting an existing tuple refuses
    spark.sql("INSERT INTO comp_t VALUES (3, 9, 12345)")
    assert(state(root)((3L, 9)) === 12345L)
    val dup = intercept[Exception] {
      spark.sql("INSERT INTO comp_t VALUES (3, 9, 1)") }
    assert(dup.getMessage.contains("already exists"))
    // create refuses an unknown key column in the list
    intercept[IllegalArgumentException] {
      MergeTable.create(spark, freshRoot("badcol"), baseDf(5),
        "oid,nope", commitTsMillis = 50L)
    }
  }
}
