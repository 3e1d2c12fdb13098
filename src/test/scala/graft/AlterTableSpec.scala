package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{MergeTable, Snapshots}

/** ALTER TABLE ADD COLUMNS over merge tables — additive evolution as a
  * METADATA-ONLY commit: the manifest is copied by reference with a
  * widened `#schema=`, existing rows null-fill on read, a later merge
  * writes real values, time travel still serves the pre-ALTER shape,
  * replay fences survive the commit, and everything that would rewrite
  * data (drops, renames, type changes, positioning) refuses by name. */
class AlterTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cat = "altcat"
  private lazy val warehouse: String = {
    val d = TestSpark.tempDir("graft-alter-wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.plans.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  test("SQL ALTER TABLE ADD COLUMNS: metadata-only commit — old rows " +
    "null-fill, new writes carry values, time travel keeps the old shape") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_alter")
    spark.sql(s"CREATE TABLE $cat.t_alter (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'k')")
    spark.sql(s"INSERT INTO $cat.t_alter VALUES (1, 10), (2, 20)")
    val root = s"$warehouse/t_alter"
    val preGen = Snapshots.generations(spark, root).max
    val filesBefore = MergeTable.currentMeta(spark, root).entries
      .map(_.name).toSet

    spark.sql(s"ALTER TABLE $cat.t_alter ADD COLUMNS (w BIGINT, s STRING)")

    // metadata-only: the new generation references the SAME data files
    val m = MergeTable.currentMeta(spark, root)
    assert(m.entries.map(_.name).toSet === filesBefore,
      "ALTER must not move or rewrite any data file")
    assert(m.schema.get.fieldNames.toSeq === Seq("k", "v", "w", "s"))
    // old rows null-fill the new columns
    assert(spark.sql(s"SELECT k, v, w, s FROM $cat.t_alter ORDER BY k")
      .collect().map(_.toSeq.toSeq).toSeq ===
      Seq(Seq(1L, 10L, null, null), Seq(2L, 20L, null, null)))
    // a post-ALTER write carries real values; untouched rows stay null
    spark.sql(s"INSERT INTO $cat.t_alter VALUES (3, 30, 7, 'x')")
    spark.sql(s"UPDATE $cat.t_alter SET w = 5, s = 'upd' WHERE k = 1")
    assert(spark.sql(s"SELECT k, v, w, s FROM $cat.t_alter ORDER BY k")
      .collect().map(_.toSeq.toSeq).toSeq ===
      Seq(Seq(1L, 10L, 5L, "upd"), Seq(2L, 20L, null, null),
        Seq(3L, 30L, 7L, "x")))
    // the pre-ALTER generation still serves the two-column shape
    val old = spark.sql(
      s"SELECT * FROM $cat.t_alter VERSION AS OF $preGen")
    assert(old.schema.fieldNames.toSeq === Seq("k", "v"))
    assert(old.count() === 2)
  }

  test("ALTER refusals are loud and name the reason: existing column, " +
    "position clauses, type changes, key renames/drops, missing table " +
    "— while payload RENAME/DROP land as metadata-only commits") {
    warehouse
    spark.sql(s"DROP TABLE IF EXISTS $cat.t_refuse")
    spark.sql(s"CREATE TABLE $cat.t_refuse (k BIGINT, v BIGINT) " +
      "USING graft TBLPROPERTIES ('key' = 'k')")
    val exists = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse ADD COLUMNS (v STRING)") }
    assert(exists.getMessage.contains("already exists"))
    val pos = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse ADD COLUMNS (w BIGINT AFTER k)") }
    assert(pos.getMessage.contains("FIRST/AFTER"))
    val nn = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse ADD COLUMNS (w BIGINT NOT NULL)") }
    assert(nn.getMessage.contains("NOT NULL"),
      s"NOT NULL must refuse, not silently downgrade: ${nn.getMessage}")
    // payload RENAME/DROP are supported since round 16 (column
    // mapping, metadata-only — ColumnMappingSpec pins the semantics);
    // the KEY column still refuses both, and TYPE changes refuse
    val keyRen = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse RENAME COLUMN k TO kk") }
    assert(keyRen.getMessage.contains("merge-key"))
    val keyDrop = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse DROP COLUMN k") }
    assert(keyDrop.getMessage.contains("merge-key"))
    spark.sql(s"ALTER TABLE $cat.t_refuse RENAME COLUMN v TO w")
    assert(spark.table(s"$cat.t_refuse").columns.toSeq === Seq("k", "w"))
    spark.sql(s"ALTER TABLE $cat.t_refuse DROP COLUMN w")
    assert(spark.table(s"$cat.t_refuse").columns.toSeq === Seq("k"))
    val retype = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_refuse ALTER COLUMN k TYPE STRING") }
    assert(retype.getMessage.toLowerCase.contains("not supported"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t_missing ADD COLUMNS (w BIGINT)") }
  }

  test("API addColumns: reserved names and duplicates refuse; the " +
    "replay fence survives the metadata commit; evolved merges land") {
    val root = s"${TestSpark.tempDir("graft-alter-api")}/t"
    val base = spark.range(20).select(col("id").as("k"),
      (col("id") * 10).as("v"))
    MergeTable.create(spark, root, base, "k", nFiles = 2,
      commitTsMillis = 10L)
    // a fenced batch, then the ALTER, then the batch's replay: the
    // fence must ride the metadata-only commit like any other
    MergeTable.mergeExactlyOnce(spark, root,
      Seq(("u", 1L, 3L, 333L)).toDF("op", "seq", "k", "v"), "k", 7L)
    MergeTable.addColumns(spark, root,
      Seq(StructField("w", LongType)), commitTsMillis = 30L)
    assert(MergeTable.mergeExactlyOnce(spark, root,
      Seq(("u", 1L, 3L, 999L)).toDF("op", "seq", "k", "v"), "k", 7L)
      .isEmpty, "replayed batch must stay refused after ALTER")
    // post-ALTER merge carries the widened payload
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 5L, 555L, 42L)).toDF("op", "seq", "k", "v", "w"), "k")
    val st = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    assert(st(3L) === ((333L, None)) && st(5L) === ((555L, Some(42L))))

    def refuse(cols: Seq[StructField]): String =
      intercept[IllegalArgumentException] {
        MergeTable.addColumns(spark, root, cols) }.getMessage
    assert(refuse(Seq(StructField("op", StringType))).contains("reserved"))
    assert(refuse(Seq(StructField("seq", LongType))).contains("reserved"))
    assert(refuse(Seq(StructField("V", StringType)))
      .contains("already exists")) // case-insensitive
    assert(refuse(Seq(StructField("x", LongType),
      StructField("X", StringType))).contains("duplicate"))
    assert(refuse(Seq.empty).contains("empty"))
  }
}
