package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SnapshotSqlCatalog
import graft.streaming.{MergeTable, Snapshots}

/** SQL `MERGE INTO` over registered merge tables — the parser face of
  * [[MergeTable.merge]]: every supported clause shape must land the
  * same table state as the API change batch, first-clause-wins ordering
  * must hold, the ANSI cardinality contract must refuse, and every
  * unsupported shape must refuse BY NAME. */
class SqlMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(tag: String, n: Int = 40): String = {
    val root = TestSpark.tempDir(s"sqlmerge-$tag") + "/t"
    val base = spark.range(n).select(col("id").as("k"),
      (col("id") * 100).as("v"), lit("base").as("tag"))
    MergeTable.create(spark, root, base, "k", nFiles = 4,
      commitTsMillis = 1000L)
    SnapshotSqlCatalog.registerMerge(spark, s"mt_$tag", root)
    root
  }

  private def state(root: String): Map[Long, (Long, String)] =
    MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("SQL MERGE ≡ API merge: update / conditional delete / insert in " +
      "one statement, metrics row, clause order first-match") {
    val root = freshTable("basic")
    // source: update k%4=1 (v*2), delete k%4=2, insert k+1000 for k%4=3
    Seq.range(0L, 40L).filter(_ % 4 != 0).map { k =>
      if (k % 4 == 1) (k, k * 200, "upd", "u")
      else if (k % 4 == 2) (k, 0L, "del", "d")
      else (k + 1000L, k, "ins", "i")
    }.toDF("k", "nv", "ntag", "act").createOrReplaceTempView("src_basic")

    val res = spark.sql(
      """MERGE INTO mt_basic t
        |USING src_basic s
        |ON t.k = s.k
        |WHEN MATCHED AND s.act = 'd' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.nv, tag = s.ntag
        |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, s.ntag)
        |""".stripMargin).collect().head
    assert(res.getLong(0) === 10L, "rows_updated")  // k%4=1 in 0..39
    assert(res.getLong(1) === 10L, "rows_deleted")
    assert(res.getLong(2) === 10L, "rows_inserted")

    // the API replay on a twin table must land the identical state
    val twin = TestSpark.tempDir("sqlmerge-twin") + "/t"
    MergeTable.create(spark, twin, spark.range(40).select(col("id").as("k"),
      (col("id") * 100).as("v"), lit("base").as("tag")), "k", nFiles = 4,
      commitTsMillis = 1000L)
    val changes = Seq.range(0L, 40L).filter(_ % 4 != 0).map { k =>
      if (k % 4 == 1) ("u", 1L, k, k * 200, "upd")
      else if (k % 4 == 2) ("d", 1L, k, 0L, "del")
      else ("c", 1L, k + 1000L, k, "ins")
    }.toDF("op", "seq", "k", "v", "tag")
    MergeTable.merge(spark, twin, changes, "k", commitTsMillis = 2000L)
    assert(state(root) === state(twin),
      "SQL MERGE and the API face must commute to the same state")
    // deletes really gone, updates applied, inserts landed
    val got = state(root)
    assert(!got.contains(2L) && got(1L) === (200L, "upd") &&
      got(1003L) === (3L, "ins") && got(4L) === (400L, "base"))
  }

  test("UPDATE SET * / INSERT * expand against the aliased source; " +
      "no-op MERGE commits no generation") {
    val root = freshTable("star")
    // the source carries the table's own columns for star expansion
    Seq((5L, 555L, "starred"), (2000L, 42L, "new"))
      .toDF("k", "v", "tag").createOrReplaceTempView("src_star")
    spark.sql(
      """MERGE INTO mt_star t USING src_star s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).collect()
    val got = state(root)
    assert(got(5L) === (555L, "starred") && got(2000L) === (42L, "new"))

    // a MERGE whose clauses all miss: no change, NO new generation
    val gens = Snapshots.generations(spark, root).size
    val res = spark.sql(
      """MERGE INTO mt_star t USING src_star s ON t.k = s.k
        |WHEN MATCHED AND s.tag = 'nope' THEN DELETE""".stripMargin)
      .collect().head
    assert(res.getLong(0) === 0L && res.getLong(1) === 0L &&
      res.getLong(2) === 0L)
    assert(Snapshots.generations(spark, root).size === gens,
      "an all-miss MERGE must not commit an empty generation")
  }

  test("conditional clause chains: first matching clause claims the row") {
    val root = freshTable("order")
    Seq((1L, 10L), (2L, 99L)).toDF("k", "score")
      .createOrReplaceTempView("src_order")
    spark.sql(
      """MERGE INTO mt_order t USING src_order s ON t.k = s.k
        |WHEN MATCHED AND s.score > 50 THEN DELETE
        |WHEN MATCHED AND s.score > 5 THEN UPDATE SET v = s.score
        |WHEN MATCHED THEN UPDATE SET v = -1""".stripMargin).collect()
    val got = state(root)
    assert(!got.contains(2L), "score 99 hits the DELETE clause first")
    assert(got(1L)._1 === 10L, "score 10 falls through to the second clause")
  }

  test("column names resolve case-insensitively; a NULL key from an " +
      "INSERT clause refuses") {
    val root = freshTable("case")
    Seq((3L, 333L, "up"), (4L, 444L, "up")).toDF("k", "nv", "ntag")
      .createOrReplaceTempView("src_case")
    // differently-cased targets must RESOLVE (not silently no-op), and
    // a cased key assignment must still hit the key refusal
    spark.sql(
      """MERGE INTO mt_case t USING src_case s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET V = s.nv, TAG = s.ntag""".stripMargin)
      .collect()
    assert(state(root)(3L) === (333L, "up") && state(root)(4L) === (444L, "up"))
    val keyCase = intercept[AnalysisException](spark.sql(
      """MERGE INTO mt_case t USING src_case s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET K = s.nv""".stripMargin).collect())
    assert(keyCase.getMessage.contains("merge key"), keyCase.getMessage)
    val unknownCol = intercept[AnalysisException](spark.sql(
      """MERGE INTO mt_case t USING src_case s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET nope = s.nv""".stripMargin).collect())
    assert(unknownCol.getMessage.contains("unknown column"),
      unknownCol.getMessage)
    // NULL key via NOT MATCHED INSERT: refused (PK implies NOT NULL)
    spark.sql("SELECT CAST(NULL AS BIGINT) AS k, CAST(9 AS BIGINT) AS nv")
      .createOrReplaceTempView("src_nullkey")
    val nk = intercept[IllegalStateException](spark.sql(
      """MERGE INTO mt_case t USING src_nullkey s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
      .collect())
    assert(nk.getMessage.contains("NULL merge key"), nk.getMessage)
    // INSERT column list resolves case-insensitively too (v null-fills)
    spark.sql("INSERT INTO mt_case (K, TAG) VALUES (500, 'cased')").collect()
    val r500 = MergeTable.read(spark, root).filter(col("k") === 500L).head
    assert(r500.isNullAt(1) && r500.getString(2) === "cased")
  }

  test("ANSI cardinality: two source rows steering one target key refuse") {
    val root = freshTable("card")
    Seq((7L, 1L), (7L, 2L)).toDF("k", "nv")
      .createOrReplaceTempView("src_card")
    val e = intercept[IllegalStateException](spark.sql(
      """MERGE INTO mt_card t USING src_card s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin).collect())
    assert(e.getMessage.contains("multiple source rows"), e.getMessage)
    assert(state(root)(7L)._1 === 700L, "the refused MERGE must not commit")
  }

  test("a non-key ON condition cannot smuggle an existing key through " +
      "WHEN NOT MATCHED — INSERT never overwrites") {
    val root = freshTable("nonkey")
    // source matches nothing by tag, but carries an EXISTING key (7)
    // and a new one (900)
    Seq((7L, 77L, "nomatch"), (900L, 9L, "nomatch"))
      .toDF("k", "nv", "ntag").createOrReplaceTempView("src_nonkey")
    val e = intercept[IllegalStateException](spark.sql(
      """MERGE INTO mt_nonkey t USING src_nonkey s ON t.tag = s.ntag
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
      .collect())
    assert(e.getMessage.contains("already exists"), e.getMessage)
    assert(state(root)(7L)._1 === 700L && !state(root).contains(900L),
      "the refused MERGE must not commit anything")
    // with only genuinely-new keys the same shape goes through
    Seq((901L, 9L, "nomatch")).toDF("k", "nv", "ntag")
      .createOrReplaceTempView("src_nonkey2")
    spark.sql(
      """MERGE INTO mt_nonkey t USING src_nonkey2 s ON t.tag = s.ntag
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""".stripMargin)
      .collect()
    assert(state(root)(901L)._1 === 9L)
  }

  test("INSERT INTO: positional, column-list and BY NAME forms land as " +
      "'c' batches; the PK contract refuses duplicates and existing keys") {
    val root = freshTable("ins", n = 20)
    // null-tolerant state reader (the null-filled column is the point)
    def state(r: String): Map[Long, (Long, String)] =
      MergeTable.read(spark, r).collect()
        .map(x => x.getLong(0) -> ((if (x.isNullAt(1)) -1L else x.getLong(1)),
          x.getString(2))).toMap
    // positional: full arity
    val r1 = spark.sql(
      "INSERT INTO mt_ins VALUES (100, 1000, 'i1'), (101, 1010, 'i2')")
      .collect().head
    assert(r1.getLong(0) === 2L)
    // column list: unnamed column null-fills; key mandatory
    spark.sql("INSERT INTO mt_ins (k, tag) VALUES (102, 'i3')").collect()
    // BY NAME: source column order irrelevant
    Seq(("i4", 103L, 3L)).toDF("tag", "k", "v")
      .createOrReplaceTempView("src_ins")
    spark.sql("INSERT INTO mt_ins BY NAME SELECT * FROM src_ins").collect()
    val got = state(root)
    assert(got(100L) === (1000L, "i1") && got(102L)._2 === "i3" &&
      got(103L) === (3L, "i4") && got.size === 24)
    assert(MergeTable.read(spark, root).filter(col("k") === 102L)
      .head.isNullAt(1), "unlisted column must null-fill")

    // PK contract: duplicate keys in the batch refuse…
    val dup = intercept[IllegalStateException](spark.sql(
      "INSERT INTO mt_ins VALUES (200, 1, 'a'), (200, 2, 'b')").collect())
    assert(dup.getMessage.contains("duplicate merge key"), dup.getMessage)
    // …and a key that already exists refuses (INSERT never overwrites)
    val clash = intercept[IllegalStateException](spark.sql(
      "INSERT INTO mt_ins VALUES (5, 9, 'x')").collect())
    assert(clash.getMessage.contains("already exists"), clash.getMessage)
    assert(state(root).size === 24, "refused inserts must not commit")
    assert(state(root)(5L)._1 === 500L)

    // unsupported shapes refuse by name
    val ow = intercept[AnalysisException](spark.sql(
      "INSERT OVERWRITE TABLE mt_ins VALUES (1, 1, 'x')").collect())
    assert(ow.getMessage.contains("INSERT OVERWRITE"), ow.getMessage)
    val arity = intercept[AnalysisException](spark.sql(
      "INSERT INTO mt_ins VALUES (1, 2)").collect())
    assert(arity.getMessage.contains("positional insert"), arity.getMessage)
    val nokey = intercept[AnalysisException](spark.sql(
      "INSERT INTO mt_ins (v, tag) VALUES (1, 'x')").collect())
    assert(nokey.getMessage.contains("merge key"), nokey.getMessage)
    // a NULL key refuses: ANSI PK implies NOT NULL
    val nullkey = intercept[IllegalStateException](spark.sql(
      "INSERT INTO mt_ins VALUES (NULL, 1, 'x')").collect())
    assert(nullkey.getMessage.contains("NULL merge key"), nullkey.getMessage)
  }

  test("unsupported shapes refuse by name; key assignment and keyless " +
      "insert refuse") {
    val root = freshTable("refuse")
    Seq((1L, 2L)).toDF("k", "nv").createOrReplaceTempView("src_refuse")
    def refusal(sql: String): String =
      intercept[AnalysisException](spark.sql(sql).collect()).getMessage

    assert(refusal(
      """MERGE INTO mt_refuse t USING src_refuse s ON t.k = s.k
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      .contains("NOT MATCHED BY SOURCE"))
    assert(refusal(
      """MERGE INTO mt_refuse t USING src_refuse s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET k = s.nv""".stripMargin)
      .contains("merge key"))
    assert(refusal(
      """MERGE INTO mt_refuse t USING src_refuse s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT (v) VALUES (s.nv)""".stripMargin)
      .contains("merge key"))
    assert(refusal(
      """MERGE WITH SCHEMA EVOLUTION INTO mt_refuse t
        |USING src_refuse s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      .contains("SCHEMA EVOLUTION"))
    // nothing above may have committed
    assert(Snapshots.generations(spark, root).size === 1)
  }
}
