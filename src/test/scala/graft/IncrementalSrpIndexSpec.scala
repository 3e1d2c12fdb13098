package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.IncrementalSrpIndex

case class EmbRow(vec_id: Long, embedding: Seq[Float], label: Int)

/** Streaming maintenance of the SRP ANN index: per-micro-batch bucket
  * append must equal the batch-built index row-for-row and serve the
  * SAME probe query results, with the bucket filter still pruning at
  * the partition level. */
class IncrementalSrpIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def rows(df: DataFrame): Set[(Long, Long, Int)] =
    df.select(col("vec_id"), col("bucket").cast("long"), col("label").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("incremental bucket append equals the batch SRP index; probe query identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incsrp") + "/index"
    val ckpt = TestSpark.tempDir("incsrp-ckpt")
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label")).as[EmbRow].collect()
    val waves = emb.groupBy(_.vec_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[EmbRow]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalSrpIndex.start(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
    }
    val inc = IncrementalSrpIndex.read(spark, root)
    val batch = spark.read.parquet(Similarity.ensureSrpIndex(spark, dir))
    assert(inc.count() === emb.length.toLong)
    assert(rows(inc) === rows(batch),
      "incrementally-appended SRP index must equal the batch build")
    // the probe query sees no seam: identical rows, bit-exact scores
    val got = IncrementalSrpIndex.annKnn(spark, root, dir)
      .collect().map(_.toSeq).toSeq
    val want = Similarity.annKnnCosineIndexed(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got === want, "ANN served from the incremental index must equal batch")
    // bucket probes prune DIRECTORIES of the incremental layout too
    val plan = IncrementalSrpIndex.annKnn(spark, root, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      "bucket probe did not reach PartitionFilters:\n" + plan)
  }

  test("replaying a batchId overwrites its own directory (exactly-once append)") {
    import spark.implicits._
    val root = TestSpark.tempDir("incsrp-replay") + "/index"
    val batch = Seq(
      EmbRow(1, Seq.fill(64)(0.1f), 1),
      EmbRow(2, Seq.tabulate(64)(i => if (i % 2 == 0) -0.2f else 0.3f), 2)).toDF()
    IncrementalSrpIndex.appendBatch(root)(batch, 5L)
    val once = rows(IncrementalSrpIndex.read(spark, root))
    IncrementalSrpIndex.appendBatch(root)(batch, 5L) // foreachBatch replay
    assert(rows(IncrementalSrpIndex.read(spark, root)) === once)
    assert(once.size === 2)
  }
}
