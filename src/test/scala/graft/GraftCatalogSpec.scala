package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** The DSv2 TableCatalog over MergeTable roots: CREATE/SHOW/DROP in
  * plain SQL, catalog-qualified reads through the manifest-pruned
  * DV-applied plan, time travel via the catalog's version hooks, and
  * the full DML verb set (MERGE/INSERT/UPDATE/DELETE) on the qualified
  * name — one read/write implementation shared with the registry path. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cat = "lakecat"
  private lazy val warehouse: String = {
    val d = TestSpark.tempDir("graft-catalog-wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.plans.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def sqlRows(q: String): Seq[Seq[Any]] =
    spark.sql(q).collect().map(_.toSeq.toSeq).toSeq

  test("CREATE TABLE ... USING graft: created, listed by SHOW TABLES, " +
    "described, dropped — and refusals are loud") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_ddl")
    spark.sql(
      s"""CREATE TABLE $cat.t_ddl (k BIGINT, v BIGINT, tag STRING)
         |USING graft TBLPROPERTIES ('key' = 'k')""".stripMargin)
    val listed = sqlRows(s"SHOW TABLES IN $cat").map(_(1))
    assert(listed.contains("t_ddl"), s"SHOW TABLES: $listed")
    // the manifest is the schema authority
    val described = spark.sql(s"DESCRIBE TABLE $cat.t_ddl")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described("k") === "bigint" && described("tag") === "string")
    // empty but readable
    assert(spark.sql(s"SELECT * FROM $cat.t_ddl").count() === 0)
    // duplicate create refuses; IF NOT EXISTS is the idempotent spelling
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t_ddl (k BIGINT) USING graft " +
        "TBLPROPERTIES ('key' = 'k')")
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.t_ddl (k BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'k')")
    // missing key property and partition clauses refuse by name
    val noKey = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t_nokey (k BIGINT) USING graft")
    }
    assert(noKey.getMessage.contains("key"))
    val parted = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t_part (k BIGINT, d BIGINT) " +
        "USING graft PARTITIONED BY (d) TBLPROPERTIES ('key' = 'k')")
    }
    assert(parted.getMessage.toLowerCase.contains("key-range"))
    assert(spark.sql(s"DROP TABLE $cat.t_ddl").collect().isEmpty)
    assert(!sqlRows(s"SHOW TABLES IN $cat").map(_(1)).contains("t_ddl"))
    assert(!new java.io.File(s"$warehouse/t_ddl").exists())
  }

  test("catalog-qualified DML: INSERT, MERGE, UPDATE, DELETE on " +
    "lake.t — states exact after each verb; reads go manifest-pruned") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_dml")
    spark.sql(
      s"""CREATE TABLE $cat.t_dml (k BIGINT, v BIGINT, tag STRING)
         |USING graft TBLPROPERTIES ('key' = 'k')""".stripMargin)
    // INSERT INTO (positional VALUES through the V2 AppendData path)
    spark.sql(s"INSERT INTO $cat.t_dml VALUES " +
      "(1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')")
    assert(sqlRows(s"SELECT k, v, tag FROM $cat.t_dml ORDER BY k") ===
      Seq(Seq(1L, 10L, "a"), Seq(2L, 20L, "b"), Seq(3L, 30L, "c")))
    // duplicate-key INSERT refuses (the upsert verb is MERGE)
    val dup = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t_dml VALUES (2, 99, 'x')")
    }
    assert(dup.getMessage.contains("MERGE"))
    // MERGE INTO through the qualified name, aliased, source as a view
    spark.range(2, 6).select(col("id").as("k"),
      (col("id") * 100).as("nv")).createOrReplaceTempView("dml_src")
    spark.sql(
      s"""MERGE INTO $cat.t_dml AS t USING dml_src AS s ON t.k = s.k
         |WHEN MATCHED AND s.k = 3 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.nv
         |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, 'm')
         |""".stripMargin)
    assert(sqlRows(s"SELECT k, v, tag FROM $cat.t_dml ORDER BY k") ===
      Seq(Seq(1L, 10L, "a"), Seq(2L, 200L, "b"),
        Seq(4L, 400L, "m"), Seq(5L, 500L, "m")))
    // UPDATE and DELETE, bare and alias-qualified references mixed
    spark.sql(s"UPDATE $cat.t_dml SET v = v + 1 WHERE tag = 'm'")
    spark.sql(s"DELETE FROM $cat.t_dml AS x WHERE x.k = 1")
    assert(sqlRows(s"SELECT k, v FROM $cat.t_dml ORDER BY k") ===
      Seq(Seq(2L, 200L), Seq(4L, 401L), Seq(5L, 501L)))
    // INSERT OVERWRITE refuses by name
    val ow = intercept[Exception] {
      spark.sql(s"INSERT OVERWRITE $cat.t_dml VALUES (9, 9, 'z')")
    }
    assert(ow.getMessage.contains("MERGE"))
    // the read path is the manifest FileIndex plan, not a raw dir scan:
    // a key-band WHERE must list a pruned file subset at execution
    MergeTable.compact(spark, s"$warehouse/t_dml", nFiles = 3)
    val plan = spark.sql(
      s"SELECT * FROM $cat.t_dml WHERE k = 4").queryExecution
      .executedPlan.toString
    assert(plan.contains("Scan parquet"), s"expected a parquet scan:\n$plan")
    spark.sql(s"DROP TABLE $cat.t_dml")
  }

  test("VERSION AS OF / TIMESTAMP AS OF on the catalog name read the " +
    "pinned generation DV-applied; history()/changes() compose by " +
    "bare name") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_tt")
    spark.sql(s"CREATE TABLE $cat.t_tt (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'k')")
    val root = s"$warehouse/t_tt"
    import spark.implicits._
    // gen 2: rows; gen 3: a DV delete (readAt must apply it)
    MergeTable.merge(spark, root,
      (0L until 20L).map(i => ("c", 1L, i, i * 10)).toDF("op", "seq", "k", "v"),
      "k", commitTsMillis = 2000L)
    MergeTable.deleteWhere(spark, root, col("k") % 5 === 0,
      commitTsMillis = 3000L, rewriteAboveFraction = 2.0)
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_tt") === Seq(Seq(16L)))
    assert(sqlRows(
      s"SELECT count(*) FROM $cat.t_tt VERSION AS OF 2") === Seq(Seq(20L)))
    assert(sqlRows(
      s"SELECT count(*) FROM $cat.t_tt VERSION AS OF 1") === Seq(Seq(0L)))
    // TIMESTAMP AS OF: at-or-before resolution against commit instants
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_tt TIMESTAMP AS OF " +
      "'1970-01-01 00:00:02.5'") === Seq(Seq(20L)))
    // the catalog's createTable registered the bare name: TVFs compose
    assert(spark.sql("SELECT * FROM history('t_tt')").count() === 3L)
    assert(spark.sql("SELECT * FROM changes('t_tt', 2, 3) " +
      "WHERE change = 'd'").count() === 4L)
    // a pre-window version refuses loudly
    val gone = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.t_tt VERSION AS OF 99").collect()
    }
    assert(gone.getMessage.contains("generation") ||
      gone.getMessage.contains("99"))
    spark.sql(s"DROP TABLE $cat.t_tt")
  }

  test("catalog discovery: a table created by the API under the " +
    "warehouse is listable and queryable with zero registration") {
    warehouse
    import spark.implicits._
    val root = s"$warehouse/t_disc"
    val f = new java.io.File(root)
    if (f.exists()) spark.sql(s"DROP TABLE IF EXISTS $cat.t_disc")
    MergeTable.create(spark, root,
      (0L until 7L).map(i => (i, s"r$i")).toDF("k", "s"), "k",
      commitTsMillis = 1000L)
    assert(sqlRows(s"SHOW TABLES IN $cat").map(_(1)).contains("t_disc"))
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_disc") === Seq(Seq(7L)))
    spark.sql(s"DROP TABLE $cat.t_disc")
  }

  test("a bare-name registration pointing at an EXTERNAL root survives " +
    "CREATE/DROP of a same-named catalog table; mis-cased key " +
    "canonicalizes to the schema spelling") {
    warehouse
    import spark.implicits._
    // external table registered under the bare name first
    val ext = s"${TestSpark.tempDir("graft-cat-ext")}/t"
    MergeTable.create(spark, ext,
      (0L until 4L).map(i => (i, i)).toDF("k", "v"), "k",
      commitTsMillis = 10L)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "t_shared", ext)
    // CREATE a catalog table of the same name: must NOT re-point the
    // bare name (bare-name DML would silently write the wrong table)
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_shared")
    spark.sql(s"CREATE TABLE $cat.t_shared (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'K')") // mis-cased on purpose
    assert(graft.plans.SnapshotSqlCatalog
      .mergeRootOf(spark, Seq("t_shared")) === Some(ext),
      "CREATE must not clobber a registration pointing elsewhere")
    // the mis-cased key canonicalized to the schema spelling
    assert(MergeTable.currentMeta(spark, s"$warehouse/t_shared").key === "k")
    // DROP of the catalog table must not orphan the external name
    spark.sql(s"DROP TABLE $cat.t_shared")
    assert(graft.plans.SnapshotSqlCatalog
      .mergeRootOf(spark, Seq("t_shared")) === Some(ext),
      "DROP must only unregister a name that points at the dropped root")
    graft.plans.SnapshotSqlCatalog.unregisterMerge(spark, "t_shared")
  }

  test("CTAS: CREATE TABLE ... USING graft AS SELECT — DDL + first " +
    "load in one statement, PK contract enforced, all-or-nothing") {
    warehouse
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_ctas")
    (0L until 9L).map(i => (i, i * 10L, s"r$i")).toDF("k", "v", "tag")
      .createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE $cat.t_ctas USING graft " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src")
    assert(sqlRows(s"SELECT k, v, tag FROM $cat.t_ctas ORDER BY k") ===
      (0L until 9L).map(i => Seq(i, i * 10L, s"r$i")))
    assert(sqlRows(s"SHOW TABLES IN $cat").map(_(1)).contains("t_ctas"))
    // the created table is a full citizen: DML works immediately
    spark.sql(s"DELETE FROM $cat.t_ctas WHERE k = 4")
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_ctas") === Seq(Seq(8L)))
    // duplicate create refuses; IF NOT EXISTS is a no-op (not a reload)
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t_ctas USING graft " +
        "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src")
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.t_ctas USING graft " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src")
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_ctas") === Seq(Seq(8L)))

    // all-or-nothing: duplicate keys in the SELECT refuse AND leave no
    // orphan table behind the error
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_ctas_dup")
    val dup = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.t_ctas_dup USING graft " +
        "TBLPROPERTIES ('key' = 'k') AS " +
        "SELECT k % 3 AS k, v, tag FROM ctas_src")
    }
    assert(dup.getMessage.contains("duplicate"))
    assert(!sqlRows(s"SHOW TABLES IN $cat").map(_(1)).contains("t_ctas_dup"),
      "a failed CTAS load must drop the just-created table")
    assert(!new java.io.File(s"$warehouse/t_ctas_dup").exists())
    spark.sql(s"DROP TABLE $cat.t_ctas")
  }

  test("CTAS refusals are loud and pre-create: missing key, key not " +
    "in output, composite key, PARTITIONED BY, foreign provider; " +
    "REPLACE TABLE [AS SELECT] refuses before the non-atomic drop") {
    warehouse
    import spark.implicits._
    (0L until 5L).map(i => (i, i * 2L)).toDF("k", "v")
      .createOrReplaceTempView("ctas_src2")
    def fails(q: String): String =
      intercept[Exception] { spark.sql(q) }.getMessage
    assert(fails(s"CREATE TABLE $cat.t_r1 USING graft AS " +
      "SELECT * FROM ctas_src2").contains("key"))
    assert(fails(s"CREATE TABLE $cat.t_r2 USING graft " +
      "TBLPROPERTIES ('key' = 'nope') AS SELECT * FROM ctas_src2")
      .contains("not in"))
    assert(fails(s"CREATE TABLE $cat.t_r3 USING graft " +
      "TBLPROPERTIES ('key' = 'k,nope') AS SELECT * FROM ctas_src2")
      .contains("not in"))
    // a composite key CTAS works — the tuple is the identity
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_ctas_comp")
    spark.sql(s"CREATE TABLE $cat.t_ctas_comp USING graft " +
      "TBLPROPERTIES ('key' = 'k,v') AS SELECT * FROM ctas_src2")
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_ctas_comp") === Seq(Seq(5L)))
    spark.sql(s"DROP TABLE $cat.t_ctas_comp")
    assert(fails(s"CREATE TABLE $cat.t_r4 USING graft " +
      "PARTITIONED BY (v) TBLPROPERTIES ('key' = 'k') AS " +
      "SELECT * FROM ctas_src2").contains("key-range"))
    assert(fails(s"CREATE TABLE $cat.t_r5 USING parquet " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src2")
      .contains("graft"))
    // none of the refusals left a table behind
    val listed = sqlRows(s"SHOW TABLES IN $cat").map(_(1)).toSet
    assert(Seq("t_r1", "t_r2", "t_r3", "t_r4", "t_r5")
      .forall(!listed.contains(_)))
    // REPLACE verbs refuse BEFORE Spark's drop-then-create exec runs
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_keep")
    spark.sql(s"CREATE TABLE $cat.t_keep USING graft " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src2")
    assert(fails(s"REPLACE TABLE $cat.t_keep USING graft " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src2")
      .contains("REPLACE"))
    assert(fails(s"CREATE OR REPLACE TABLE $cat.t_keep USING graft " +
      "TBLPROPERTIES ('key' = 'k') AS SELECT * FROM ctas_src2")
      .contains("REPLACE"))
    assert(fails(s"REPLACE TABLE $cat.t_keep (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'k')").contains("REPLACE"))
    // the table survived every refusal intact
    assert(sqlRows(s"SELECT count(*) FROM $cat.t_keep") === Seq(Seq(5L)))
    spark.sql(s"DROP TABLE $cat.t_keep")
  }
}
