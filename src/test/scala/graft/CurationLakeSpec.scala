package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** The LLM-curation layer running ON the lake layer — one documents
  * table carried through the full curation shape a 100 TB corpus needs:
  * ingest → a quality score lands by ADDITIVE SCHEMA EVOLUTION (no
  * rewrite of unscored history) → low-quality band dropped by PREDICATE
  * DELETE (deletion vectors, zero rewrites) → contaminated ids dropped
  * the same way → OPTIMIZE folds the DVs and repacks → and the CHANGE
  * FEED audits EXACTLY the curation decisions (the optimize rewrite is
  * invisible to it — row-exactness across layout changes is what makes
  * the feed a usable curation audit). */
class CurationLakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("documents curated in the lake: evolve quality → predicate-delete " +
    "→ optimize; the change feed audits exactly the curation") {
    val root = TestSpark.tempDir("curation-lake") + "/docs"
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
    MergeTable.create(spark, root, docs, "doc_id", nFiles = 4,
      commitTsMillis = 10L)

    // 1. scoring lands as a merge carrying a NEW column — additive
    // evolution, requested explicitly
    val scored = MergeTable.read(spark, root)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), (col("n_chars") % 100L).as("quality"))
      .withColumn("op", lit("u")).withColumn("seq", lit(1L))
    MergeTable.merge(spark, root, scored, "doc_id",
      commitTsMillis = 20L, evolveSchema = true)
    val gScored = Snapshots.currentGen(spark, root).get

    val byId = docs.select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lowQ = byId.collect { case (id, n) if n % 100L < 10L => id }.toSet
    assert(lowQ.nonEmpty && lowQ.size < byId.size)

    // 2. curation: the low-quality band goes by predicate (DV path)...
    assert(MergeTable.deleteWhere(spark, root, col("quality") < 10L,
      commitTsMillis = 30L) === lowQ.size.toLong)
    // ...and a decontamination id-list goes the same way
    val contaminated = byId.keySet.diff(lowQ).toSeq.sorted.take(3)
    assert(MergeTable.deleteWhere(spark, root,
      col("doc_id").isin(contaminated: _*),
      commitTsMillis = 40L) === 3L)

    // 3. maintenance: optimize folds the DVs in and repacks
    val (packed, _) = MergeTable.optimize(spark, root,
      smallBytes = Long.MaxValue, targetBytes = Long.MaxValue,
      commitTsMillis = 50L)
    assert(packed === 4)
    val curDir = Snapshots.genDir(root,
      Snapshots.currentGen(spark, root).get)
    assert(MergeTable.dvNames(spark, curDir).isEmpty,
      "optimize must fold the curation DVs")

    // final state: exactly the survivors, with their scores
    val expected = byId.keySet -- lowQ -- contaminated
    val got = MergeTable.read(spark, root).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("quality")).toMap
    assert(got.keySet === expected)
    expected.foreach(id => assert(got(id) === byId(id) % 100L))

    // 4. the audit: the feed from the scored generation to NOW is the
    // curation decisions and NOTHING else — no optimize rewrite noise
    val feed = MergeTable.changesBetween(spark, root, gScored,
      Snapshots.currentGen(spark, root).get).collect()
    val (ins, del) = feed.partition(_.getAs[String]("change") == "i")
    assert(ins.isEmpty, s"layout changes leaked into the feed: ${ins.length}")
    assert(del.map(_.getAs[Long]("doc_id")).toSet === (lowQ ++ contaminated))
  }
}
