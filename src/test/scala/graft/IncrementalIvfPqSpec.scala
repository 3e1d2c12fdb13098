package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PQ
import graft.streaming.IncrementalIvfPq

/** Ingest face of the IVF-PQ composite: per-micro-batch assignment
  * under the FROZEN quantizers must equal the batch-built index
  * row-for-row (pure per-row function ⇒ exact), the cid probe filter
  * must still prune at the partition level inside every batch, replay
  * must be idempotent, and compaction must be invisible. */
class IncrementalIvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def rows(df: DataFrame): Set[(Long, Int, Long, Seq[Int])] =
    df.select(col("vec_id"), col("cid").cast("int"), col("label"), col("codes"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getSeq[Int](3)))
      .toSet

  test("incremental assignment under frozen quantizers equals the batch composite; probes prune") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incivfpq") + "/index"
    val ckpt = TestSpark.tempDir("incivfpq-ckpt")
    val (batchPath, cents, books) = PQ.ensureIvfPqIndex(spark, dir)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label")).as[EmbRow].collect()
    val waves = emb.groupBy(_.vec_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[EmbRow]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalIvfPq.start(input.toDS().toDF(), root, ckpt,
        cents, books)
      q.awaitTermination(60000)
    }
    val inc = IncrementalIvfPq.read(spark, root)
    assert(inc.count() === emb.length.toLong)
    assert(rows(inc) === rows(spark.read.parquet(batchPath)),
      "incrementally-assigned IVF-PQ index must equal the batch build")
    // the probe filter prunes cid DIRECTORIES inside each batch
    val plan = inc.filter(col("cid").isin(0L, 1L))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      "cid probe did not reach PartitionFilters:\n" + plan)

    // the SERVE path: top-k from the incremental index is identical to
    // the batch-built composite's (row-equal index + one shared
    // ivfpqServe ⇒ same probes, same ADC cut, same refined scores)
    val servedInc = IncrementalIvfPq.topK(spark, root, dir, cents, books)
      .collect().map(_.toSeq).toSeq
    val servedBatch = PQ.ivfpqTopK(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(servedInc === servedBatch,
      "IVF-PQ served from the incremental index must equal the batch serve")

    // compaction back to the batch shape is invisible to readers AND to
    // the serve path
    val before = rows(inc)
    IncrementalIvfPq.compact(spark, root)
    assert(rows(IncrementalIvfPq.read(spark, root)) === before)
    assert(IncrementalIvfPq.topK(spark, root, dir, cents, books)
      .collect().map(_.toSeq).toSeq === servedInc)
  }

  test("replaying a batchId overwrites its own directory (exactly-once append)") {
    import spark.implicits._
    val root = TestSpark.tempDir("incivfpq-replay") + "/index"
    val (_, cents, books) = PQ.ensureIvfPqIndex(spark, dir)
    val wave = Seq(
      EmbRow(900001L, Seq.tabulate(64)(i => 0.01f * i), 1),
      EmbRow(900002L, Seq.tabulate(64)(i => 0.02f * i), 2))
    IncrementalIvfPq.appendBatch(root, cents, books)(wave.toDF(), 0L)
    val once = rows(IncrementalIvfPq.read(spark, root))
    IncrementalIvfPq.appendBatch(root, cents, books)(wave.toDF(), 0L)
    assert(rows(IncrementalIvfPq.read(spark, root)) === once,
      "replay must overwrite, not duplicate")
    assert(once.size === 2)
  }
}
