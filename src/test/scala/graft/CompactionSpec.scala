package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Compaction, IncrementalPostings, IncrementalSrpIndex}

/** Compaction of the batch=N appender indexes: the rewrite must be
  * invisible to every consumer (same logical relation, same query
  * results) while collapsing the per-micro-batch file fan-out back to
  * the batch build's shape — and the stream must be able to keep
  * appending afterwards. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("term"), col("doc_id"), col("tf")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def parquetFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(root))
  }

  test("postings compaction preserves results, collapses per-batch files, and ingest continues") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-post") + "/index"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
    val waves = docs.groupBy(_.doc_id % 4).toSeq.sortBy(_._1).map(_._2)
    waves.zipWithIndex.foreach { case (wave, i) =>
      IncrementalPostings.appendBatch(root, partitions = 4)(wave.toSeq.toDF(), i.toLong)
    }
    val before = rows(IncrementalPostings.read(spark, root))
    val filesBefore = parquetFiles(root).size
    val kwBefore = IncrementalPostings.keywordSearch(spark, root, Seq("spark", "merge"))
      .collect().map(_.toSeq).toSeq

    Compaction.compactPostings(spark, root, partitions = 4)

    // results identical through the same read path
    assert(rows(IncrementalPostings.read(spark, root)) === before)
    assert(IncrementalPostings.keywordSearch(spark, root, Seq("spark", "merge"))
      .collect().map(_.toSeq).toSeq === kwBefore)
    // physical shape: one batch=<maxId> dir, batch-build file count
    // (4 waves × 4 partitions → 4 partitions)
    assert(Compaction.batchIds(spark, root) === Seq(3L),
      "compacted relation must live under the newest committed batch id")
    val filesAfter = parquetFiles(root).size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file fan-out ($filesBefore -> $filesAfter)")
    assert(filesAfter <= 4, s"expected <=4 term-clustered files, got $filesAfter")
    // no leftover swap siblings
    assert(!new java.io.File(root + "__compacting").exists)
    assert(!new java.io.File(root + "__precompact").exists)
    // the stream keeps appending after compaction — and the appended
    // batch is visible through the same read
    IncrementalPostings.appendBatch(root)(Seq(IdxDoc(900001L, "zqx zqx")).toDF(), 4L)
    assert(rows(IncrementalPostings.read(spark, root)) ===
      before + (("zqx", 900001L, 2L)))
  }

  test("SRP compaction keeps probe results and the bucket partition column") {
    val root = TestSpark.tempDir("compact-srp") + "/index"
    val emb = Tables.embeddings(spark, dir)
    val waves = Seq(
      emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    waves.zipWithIndex.foreach { case (w, i) =>
      IncrementalSrpIndex.appendBatch(root)(w, i.toLong)
    }
    val before = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .collect().map(_.toSeq).toSeq
    Compaction.compactSrp(spark, root)
    val after = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .collect().map(_.toSeq).toSeq
    assert(after === before, "probe results must not see the compaction")
    // the probe still prunes on bucket as a PARTITION filter
    val plan = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("bucket#"), "bucket no longer a partition column:\n" + plan)
  }

  test("compacting an empty root fails loudly") {
    val root = TestSpark.tempDir("compact-empty") + "/index"
    intercept[IllegalArgumentException] {
      Compaction.compactPostings(spark, root)
    }
  }
}
