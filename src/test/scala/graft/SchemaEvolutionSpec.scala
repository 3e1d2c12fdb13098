package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.SchemaEvolution
import graft.cdc.SchemaEvolution.EvolvingTable

/** CDC schema evolution (round 10): additive merge with widening
  * promotions, typed-null alignment, the evolving warehouse merge, and
  * the O(metadata) append-mode evolving table. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val ts1 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
  private val ts2 = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")

  test("merge: additive append, field order, nullability relax") {
    val a = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("x", IntegerType, nullable = false)))
    val b = StructType(Seq(
      StructField("x", IntegerType, nullable = true),
      StructField("y", StringType, nullable = false)))
    val m = SchemaEvolution.merge(a, b)
    assert(m.fieldNames.toSeq === Seq("k", "x", "y"))
    assert(m("k").nullable,
      "a field the incoming batch stopped sending gets NULL-filled for " +
        "that batch's rows, so it must relax to nullable")
    assert(m("x").nullable, "evolution may only RELAX nullability")
    assert(m("y").nullable, "a column born mid-stream must be nullable")
  }

  test("merge: a column the incoming batch dropped relaxes to nullable") {
    // the narrow batch's rows get NULL-filled there (alignTo / narrow
    // files under EvolvingTable.read), so keeping nullable=false would
    // declare a schema the data violates — the optimizer is entitled to
    // miscompile IS NULL checks against a required column
    val a = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("qty", IntegerType, nullable = false)))
    val b = StructType(Seq(StructField("k", StringType, nullable = false)))
    val m = SchemaEvolution.merge(a, b)
    assert(!m("k").nullable, "shared required field stays required")
    assert(m("qty").nullable,
      "a column absent from the incoming schema must relax to nullable")
    // and the evolving table's read schema reflects it end-to-end
    val dir = TestSpark.tempDir("evolve-narrow")
    EvolvingTable.append(spark, Seq(("a", 1)).toDF("k", "qty"), dir)
    EvolvingTable.append(spark, Seq(Tuple1("b")).toDF("k"), dir)
    val out = EvolvingTable.read(spark, dir)
    assert(out.schema("qty").nullable, "read schema must admit the NULLs it serves")
    // the NULL the narrow file produces must survive an IS NULL predicate
    assert(out.filter(col("qty").isNull).count() === 1L)
  }

  test("merge: widening promotions pass, contract breaks fail with the column name") {
    def f(n: String, t: DataType) = StructField(n, t)
    assert(SchemaEvolution.merge(StructType(Seq(f("v", IntegerType))),
      StructType(Seq(f("v", LongType))))("v").dataType === LongType)
    assert(SchemaEvolution.merge(StructType(Seq(f("v", FloatType))),
      StructType(Seq(f("v", DoubleType))))("v").dataType === DoubleType)
    assert(SchemaEvolution.merge(
      StructType(Seq(f("v", DecimalType(10, 2)))),
      StructType(Seq(f("v", DecimalType(14, 2)))))("v").dataType === DecimalType(14, 2))
    // nested structs merge recursively; arrays widen element-wise
    val n1 = StructType(Seq(f("s", StructType(Seq(f("a", IntegerType))))))
    val n2 = StructType(Seq(f("s", StructType(Seq(f("a", LongType), f("b", StringType))))))
    assert(SchemaEvolution.merge(n1, n2)("s").dataType ===
      StructType(Seq(f("a", LongType), StructField("b", StringType))))
    assert(SchemaEvolution.merge(
      StructType(Seq(f("l", ArrayType(IntegerType)))),
      StructType(Seq(f("l", ArrayType(LongType)))))("l").dataType === ArrayType(LongType))
    // type change that is not a widening = upstream contract break
    val e = intercept[IllegalArgumentException](SchemaEvolution.merge(
      StructType(Seq(f("price", StringType))), StructType(Seq(f("price", LongType)))))
    assert(e.getMessage.contains("price"), "error must carry the column name")
    // decimal SCALE change loses meaning — refuse
    intercept[IllegalArgumentException](SchemaEvolution.merge(
      StructType(Seq(f("v", DecimalType(10, 2)))),
      StructType(Seq(f("v", DecimalType(10, 4))))))
  }

  test("alignTo: typed nulls for missing columns, target order, widening casts") {
    val target = StructType(Seq(
      StructField("k", StringType), StructField("x", LongType),
      StructField("y", StringType)))
    val out = SchemaEvolution.alignTo(
      Seq((7, "a")).toDF("x", "k"), target)
    assert(out.schema.fieldNames.toSeq === Seq("k", "x", "y"))
    assert(out.schema("x").dataType === LongType, "int widened to long")
    val r = out.collect().head
    assert(r.getString(0) === "a" && r.getLong(1) === 7L && r.isNullAt(2))
  }

  test("mergeIntoParquetEvolving: columns arrive mid-stream, last-wins holds across shapes") {
    val dir = TestSpark.tempDir("evolve-merge") + "/table"
    // batch 1: original deploy shape (key, image, ts, qty)
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("a", "img-a1", ts0, 10), ("b", "img-b1", ts0, 20))
        .toDF("key", "newImage", "ts", "qty"), dir)
    // batch 2: upstream added `price`; also a newer image for a
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("a", "img-a2", ts1, 11, 99L), ("c", "img-c1", ts1, 30, 77L))
        .toDF("key", "newImage", "ts", "qty", "price"), dir)
    val t2 = spark.read.parquet(dir).orderBy("key").collect()
      .map(r => (r.getString(r.fieldIndex("key")),
        r.getString(r.fieldIndex("newImage")),
        if (r.isNullAt(r.fieldIndex("qty"))) null else r.getInt(r.fieldIndex("qty")),
        if (r.isNullAt(r.fieldIndex("price"))) null else r.getLong(r.fieldIndex("price"))))
    assert(t2.toSeq === Seq(
      ("a", "img-a2", 11, 99L),   // updated under the wide shape
      ("b", "img-b1", 20, null),  // pre-evolution row: new column is NULL
      ("c", "img-c1", 30, 77L)))
    // batch 3: a NARROW image (source stopped sending qty) updates b —
    // an image is the full row, so b.qty becomes NULL; a and c keep theirs
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("b", "img-b2", ts2, 55L)).toDF("key", "newImage", "ts", "price"), dir)
    val t3 = spark.read.parquet(dir).orderBy("key").collect()
      .map(r => (r.getString(r.fieldIndex("key")),
        if (r.isNullAt(r.fieldIndex("qty"))) null else r.getInt(r.fieldIndex("qty")),
        if (r.isNullAt(r.fieldIndex("price"))) null else r.getLong(r.fieldIndex("price"))))
    assert(t3.toSeq === Seq(("a", 11, 99L), ("b", null, 55L), ("c", 30, 77L)))
  }

  test("EvolvingTable: O(metadata) evolution — files never rewritten, reads reconcile") {
    val dir = TestSpark.tempDir("evolve-table")
    EvolvingTable.append(spark, Seq((1, "a")).toDF("v", "s"), dir)
    val gen1Files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    // evolve: v widens int→long, new column w arrives
    EvolvingTable.append(spark,
      Seq((2L, "b", 3.5)).toDF("v", "s", "w"), dir)
    val out = EvolvingTable.read(spark, dir).orderBy("v")
    assert(out.schema("v").dataType === LongType,
      "sidecar must carry the widened type")
    assert(out.schema.fieldNames.toSeq === Seq("v", "s", "w"))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    // the int32 file reads as long (Spark 4 widening promotion);
    // the pre-evolution row reads w as NULL
    assert(rows.toSeq === Seq((1L, "a", null), (2L, "b", 3.5)))
    // history untouched: generation-1 data files still exist unmodified
    val nowFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    gen1Files.foreach { case (name, mtime) =>
      assert(nowFiles.get(name).contains(mtime), s"history rewritten: $name")
    }
    // a contract break refuses before writing anything
    intercept[IllegalArgumentException](
      EvolvingTable.append(spark, Seq(("oops", 1)).toDF("v", "s"), dir))
    // reading a non-table fails loudly
    intercept[IllegalArgumentException](
      EvolvingTable.read(spark, TestSpark.tempDir("empty")))
  }

  test("EvolvingTable: a crash between the sidecar delete and rename " +
      "recovers the schema from the tmp instead of bricking the table") {
    val dir = TestSpark.tempDir("evolve-crash")
    EvolvingTable.append(spark, Seq((1, "a")).toDF("v", "s"), dir)
    EvolvingTable.append(spark, Seq((2L, "b", 3.5)).toDF("v", "s", "w"), dir)
    val side = new java.io.File(dir, "_schema.json")
    val tmp = new java.io.File(dir, "_schema.json.tmp")
    // simulate the crash window: tmp fully written, real sidecar deleted
    java.nio.file.Files.copy(side.toPath, tmp.toPath)
    assert(side.delete())
    new java.io.File(dir, "._schema.json.crc").delete()
    val out = EvolvingTable.read(spark, dir).orderBy("v")
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(1L, 2L),
      "the tmp sidecar must serve the schema after the crash")
    // the next append completes the swap and the table stays healthy
    EvolvingTable.append(spark, Seq((3L, "c", 1.0)).toDF("v", "s", "w"), dir)
    assert(EvolvingTable.read(spark, dir).count() === 3L)
  }

  test("streaming ingest across a redeploy: schema evolves between stream generations") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = TestSpark.tempDir("evolve-stream") + "/t"
    // a streaming source has ONE schema for its lifetime — evolution
    // arrives at a REDEPLOY (the pipeline restarts against the altered
    // source), so the contract under test is: generation-2 micro-batches
    // land in the same table generation-1 built, widening it in place
    val gen1 = MemoryStream[(String, Int)]
    val q1 = gen1.toDF().toDF("key", "qty").writeStream
      .foreachBatch((b: DataFrame, _: Long) => EvolvingTable.append(spark, b, dir))
      .outputMode("append").start()
    gen1.addData(("a", 1), ("b", 2))
    q1.processAllAvailable(); q1.stop()
    val gen2 = MemoryStream[(String, Int, Double)]
    val q2 = gen2.toDF().toDF("key", "qty", "price").writeStream
      .foreachBatch((b: DataFrame, _: Long) => EvolvingTable.append(spark, b, dir))
      .outputMode("append").start()
    gen2.addData(("c", 3, 9.9))
    q2.processAllAvailable(); q2.stop()
    val out = EvolvingTable.read(spark, dir).orderBy("key").collect().map(r =>
      (r.getString(0), r.getInt(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 1, null), ("b", 2, null), ("c", 3, 9.9)))
  }

  test("rename policy: a mid-stream column rename is detected, refusable, and migratable") {
    // upstream RENAME COLUMN qty -> quantity arrives as drop+add
    val dir = TestSpark.tempDir("evolve-rename") + "/table"
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("a", "img-a1", ts0, 10), ("b", "img-b1", ts0, 20))
        .toDF("key", "newImage", "ts", "qty"), dir)
    val renamed = Seq(("a", "img-a2", ts1, 11))
      .toDF("key", "newImage", "ts", "quantity")

    // detection: same-type drop+add pairs, infra columns exempt
    val t = spark.read.parquet(dir)
    assert(SchemaEvolution.detectRenames(t.schema, renamed.schema) ===
      Seq(("qty", "quantity")))

    // Fail: the batch is refused, the table untouched, the pair named
    val e = intercept[IllegalStateException](
      SchemaEvolution.mergeIntoParquetEvolving(spark, renamed, dir,
        SchemaEvolution.RenamePolicy.Fail))
    assert(e.getMessage.contains("'qty' → 'quantity'"), e.getMessage)
    assert(spark.read.parquet(dir).columns.toSeq.contains("qty") &&
      spark.read.parquet(dir).filter(col("key") === "a")
        .head.getAs[String]("newImage") === "img-a1",
      "a refused batch must leave the table untouched")

    // Apply: history migrates under the new name in the same merge —
    // b (untouched by the batch) keeps its VALUE under 'quantity'
    SchemaEvolution.mergeIntoParquetEvolving(spark, renamed, dir,
      SchemaEvolution.RenamePolicy.Apply(Map("qty" -> "quantity")))
    val out = spark.read.parquet(dir).orderBy("key").collect()
      .map(r => (r.getString(r.fieldIndex("key")),
        r.getInt(r.fieldIndex("quantity"))))
    assert(out.toSeq === Seq(("a", 11), ("b", 20)))
    assert(!spark.read.parquet(dir).columns.contains("qty"),
      "the old name must be gone after a declared rename")

    // declared-rename preconditions fail loudly
    intercept[IllegalArgumentException](
      SchemaEvolution.mergeIntoParquetEvolving(spark, renamed, dir,
        SchemaEvolution.RenamePolicy.Apply(Map("nope" -> "quantity"))))
  }

  test("rename policy default (FlagAndContinue): drop+add semantics, documented NULLing") {
    val dir = TestSpark.tempDir("evolve-rename-flag") + "/table"
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("a", "img-a1", ts0, 10), ("b", "img-b1", ts0, 20))
        .toDF("key", "newImage", "ts", "qty"), dir)
    SchemaEvolution.mergeIntoParquetEvolving(spark,
      Seq(("a", "img-a2", ts1, 11)).toDF("key", "newImage", "ts", "quantity"),
      dir)
    val out = spark.read.parquet(dir).orderBy("key").collect().map(r => (
      r.getString(r.fieldIndex("key")),
      if (r.isNullAt(r.fieldIndex("qty"))) null
      else r.getInt(r.fieldIndex("qty")),
      if (r.isNullAt(r.fieldIndex("quantity"))) null
      else r.getInt(r.fieldIndex("quantity"))))
    // both columns exist; the touched key NULLs the old one (an image is
    // the full row), the untouched key NULLs the new one
    assert(out.toSeq === Seq(("a", null, 11), ("b", 20, null)))
  }

  test("inferImageSchema: union shape of an evolving JSON image stream") {
    val images = Seq(
      """{"id": 1, "qty": 10}""",
      """{"id": 2, "qty": 20, "price": 9.5}""",
      null).toDF("newImage")
    val s = SchemaEvolution.inferImageSchema(spark, images)
    assert(s.fieldNames.sorted.toSeq === Seq("id", "price", "qty"))
    assert(s("price").dataType === DoubleType)
  }
}
