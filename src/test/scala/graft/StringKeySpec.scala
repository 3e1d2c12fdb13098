package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** STRING merge keys for the lake table (the reference's own NoSQL PK
  * is `id: STRING`, cdk_infrastructure/__init__.py:287-289): manifest
  * key ranges ride the order-preserving StringPrefix64 embedding, while
  * every probe/join stays in the key's native domain — the embedding is
  * monotone but NOT injective, so an embedding-joined probe would
  * corrupt keys sharing an 8-byte prefix. These specs drive the
  * lifecycle under DENSE prefix collisions (keys differing only past
  * byte 8) and pin the loud create-time refusal for key types the
  * manifest cannot range. */
class StringKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-strkey-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  // keys share the 8-byte prefix "user-000": EVERY key collides in the
  // embedding, so manifest ranges degenerate and correctness rests
  // entirely on the exact-key residuals this spec exists to pin
  private def collideKey(i: Long): String = f"user-000$i%06d"

  private def collidingDf(n: Int) =
    spark.range(n).select(
      format_string("user-000%06d", col("id")).as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  test("string-keyed lifecycle under full prefix collision: " +
      "create / merge / mergeMor / deleteWhere / readWhere are exact") {
    val root = freshRoot("collide")
    MergeTable.create(spark, root, collidingDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    assert(MergeTable.tableKey(spark, root) === "k")
    // COW wave: update k(7), delete k(13), insert a brand-new colliding
    // key, plus an intra-batch seq conflict on k(42) — and crucially,
    // neighbors of every touched key (k(8), k(14), k(41), k(43)) share
    // its 8-byte prefix, so an embedding-domain join would hit them
    val changes = Seq(
      ("u", 1L, collideKey(7), 700L, "upd"),
      ("d", 1L, collideKey(13), 0L, ""),
      ("c", 1L, "user-000x00001", 42L, "new"),
      ("u", 1L, collideKey(42), 1L, "lo"),
      ("u", 2L, collideKey(42), 2L, "hi"),
      ("d", 1L, "user-000gone", 0L, "")
    ).toDF("op", "seq", "k", "v", "tag")
    MergeTable.merge(spark, root, changes, "k", commitTsMillis = 20L)
    // MOR wave: DV-delete k(21), re-price k(30)
    MergeTable.mergeMor(spark, root, Seq(
      ("d", 1L, collideKey(21), 0L, ""),
      ("u", 1L, collideKey(30), 3000L, "mor")
    ).toDF("op", "seq", "k", "v", "tag"), "k", commitTsMillis = 30L)
    // predicate delete over a string band: k(50)..k(59)
    val nDel = MergeTable.deleteWhere(spark, root,
      col("k").between(collideKey(50), collideKey(59)),
      commitTsMillis = 40L)
    assert(nDel === 10L, s"band delete removed $nDel rows, expected 10")
    val expected = ((0L until 100L)
      .filterNot(i => i == 13L || i == 21L || (i >= 50L && i <= 59L))
      .map {
        case 7L => (collideKey(7), 700L, "upd")
        case 42L => (collideKey(42), 2L, "hi")
        case 30L => (collideKey(30), 3000L, "mor")
        case i => (collideKey(i), i * 10, "base")
      } :+ (("user-000x00001", 42L, "new"))).sortBy(_._1)
    val got = MergeTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === expected)
    // the predicate read face: string bounds → embedding prune → exact
    // residual; must equal the full-read filter
    val band = MergeTable.readWhere(spark, root,
      col("k") >= collideKey(60) && col("k") <= collideKey(69))
      .collect().map(_.getString(0)).sorted
    assert(band.toSeq === (60L to 69L).map(collideKey))
  }

  test("string-key manifest pruning: disjoint-prefix bands scan a " +
      "strict file subset; collision bands never lose rows") {
    val root = freshRoot("prune")
    // three well-separated prefixes → range-partitioned files are
    // prefix-pure and a single-prefix predicate can skip the rest
    val df = spark.range(300).select(
      format_string("%s-%05d",
        when(col("id") < 100, "aaa").when(col("id") < 200, "mmm")
          .otherwise("zzz"),
        col("id") % 100).as("k"),
      col("id").as("v"))
    MergeTable.create(spark, root, df, "k", nFiles = 6, commitTsMillis = 10L)
    val m = MergeTable.genMeta(spark, Snapshots.resolve(spark, root))
    def cond(c: org.apache.spark.sql.Column) =
      df.filter(c).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }
    val cand = MergeTable.pruneByCondition(spark, root, m,
      cond(col("k") >= "mmm" && col("k") <= "mmm-99999"))
    assert(cand.nonEmpty && cand.size < m.entries.size,
      s"prefix band should prune: ${cand.size} of ${m.entries.size}")
    val got = MergeTable.readWhere(spark, root,
      col("k") >= "mmm" && col("k") <= "mmm-99999")
      .collect().map(_.getLong(1)).sorted
    assert(got.toSeq === (100L until 200L))
    // a merge touching only 'zzz' keys must carry every non-zzz file
    val (rw, ca) = MergeTable.merge(spark, root, Seq(
      ("u", 1L, "zzz-00050", -1L), ("d", 1L, "zzz-00060", 0L)
    ).toDF("op", "seq", "k", "v"), "k", commitTsMillis = 20L)
    assert(ca > 0, "a single-prefix merge should carry pruned files")
    val after = MergeTable.read(spark, root)
    assert(after.count() === 299L)
    assert(after.filter(col("k") === "zzz-00050").head.getLong(1) === -1L)
  }

  test("SQL INSERT primary-key probe is exact under prefix collisions; " +
      "SQL MERGE drives a string-keyed table") {
    val root = freshRoot("sql")
    MergeTable.create(spark, root, collidingDf(20), "k", nFiles = 2,
      commitTsMillis = 10L)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "strkeyed", root)
    // a NEW key sharing every existing key's 8-byte prefix must NOT
    // clash (embedding-joined probes would report it existing)...
    spark.sql(
      "INSERT INTO strkeyed VALUES ('user-000fresh', 777, 'ins')")
    assert(MergeTable.read(spark, root).count() === 21L)
    // ...while a genuinely existing key must clash loudly
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO strkeyed VALUES ('${collideKey(3)}', 1, 'dup')"))
    def msg(t: Throwable): String =
      (Option(t.getMessage) ++ Option(t.getCause).map(msg)).mkString(" ")
    assert(msg(e).contains("already exists"), msg(e))
    // SQL MERGE over the string key: update one, insert one
    spark.sql(s"""
      MERGE INTO strkeyed t USING (
        SELECT '${collideKey(5)}' AS k, 555 AS v, 'sqlu' AS tag
        UNION ALL SELECT 'user-000y00001', 9, 'sqli'
      ) s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)
    """)
    val rows = MergeTable.read(spark, root).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(rows(collideKey(5)) === ((555L, "sqlu")))
    assert(rows("user-000y00001") === ((9L, "sqli")))
    assert(rows.size === 22)
  }

  test("optimistic merge (OCC) on a string-keyed table: two writers, " +
      "exact state either path") {
    val root = freshRoot("occ")
    MergeTable.create(spark, root, collidingDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val a = MergeTable.prepareMerge(spark, root, Seq(
      ("u", 1L, collideKey(10), -10L, "a")
    ).toDF("op", "seq", "k", "v", "tag"), "k")
    val b = MergeTable.prepareMerge(spark, root, Seq(
      ("u", 1L, collideKey(90), -90L, "b")
    ).toDF("op", "seq", "k", "v", "tag"), "k")
    MergeTable.commitPrepared(spark, root, a, commitTsMillis = 20L)
    // all keys share one 8-byte prefix → B's embedding envelope overlaps
    // A's files: the conservative conflict rules must REPLAY, and the
    // final state must still be both changes applied
    val out = MergeTable.commitPrepared(spark, root, b, commitTsMillis = 30L)
    assert(Set("rebased", "replayed").contains(out.path))
    val rows = MergeTable.read(spark, root).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows(collideKey(10)) === -10L)
    assert(rows(collideKey(90)) === -90L)
    assert(rows.size === 100)
  }

  test("create refuses unsupported key types loudly; accepts every " +
      "integral width and string") {
    val root = freshRoot("types")
    def expectRefusal(df: org.apache.spark.sql.DataFrame, key: String)
        : Unit = {
      val e = intercept[IllegalArgumentException](
        MergeTable.create(spark, s"$root-$key", df, key))
      assert(e.getMessage.contains("unsupported type"), e.getMessage)
    }
    val base = spark.range(4).select(col("id"),
      col("id").cast("double").as("kd"),
      col("id").cast("decimal(10,2)").as("kdec"),
      (col("id") % 2 === 0).as("kb"),
      col("id").cast("string").cast("binary").as("kbin"),
      array(col("id")).as("karr"),
      to_date(lit("2024-01-01")).as("kdate"),
      to_timestamp(lit("2024-01-01 00:00:00")).as("kts"))
    Seq("kd", "kdec", "kb", "kbin", "karr", "kdate", "kts")
      .foreach(expectRefusal(base, _))
    // a missing key column is its own loud error
    val miss = intercept[IllegalArgumentException](
      MergeTable.create(spark, s"$root-miss", base, "nope"))
    assert(miss.getMessage.contains("not a column"), miss.getMessage)
    // supported: byte, short, int, long, string
    Seq("tinyint", "smallint", "int", "bigint", "string")
      .zipWithIndex.foreach { case (t, i) =>
        val r = s"$root-ok$i"
        MergeTable.create(spark,
          r, spark.range(4).select(col("id").cast(t).as("k"),
            col("id").as("v")), "k", commitTsMillis = 10L)
        assert(MergeTable.read(spark, r).count() === 4L)
      }
  }

  test("integral-face APIs refuse string columns loudly instead of " +
      "silently returning empty") {
    val root = freshRoot("faces")
    MergeTable.create(spark, root, collidingDf(10)
      .withColumn("band", concat(lit("b"), col("v").cast("string"))),
      "k", commitTsMillis = 10L)
    val e1 = intercept[IllegalArgumentException](
      MergeTable.readWhereKey(spark, root, 1L, 5L))
    assert(e1.getMessage.contains("integral-key face"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      MergeTable.readWhereCol(spark, root, "band", 1L, 5L))
    assert(e2.getMessage.contains("integral-column face"), e2.getMessage)
    // and a wrong merge-key param is refused before it can write a
    // mixed-domain manifest
    val e3 = intercept[IllegalArgumentException](
      MergeTable.merge(spark, root,
        Seq(("u", 1L, 1L)).toDF("op", "seq", "v"), "v"))
    assert(e3.getMessage.contains("does not match"), e3.getMessage)
  }
}
