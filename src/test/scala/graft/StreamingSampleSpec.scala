package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSample

case class SampleDoc(doc_id: Long, lang: String)

/** Streaming holdout maintenance: the maintained min-k-by-hash sample
  * must equal the batch sampleExactK ranking of the corpus-so-far
  * after EVERY wave — across a restart, under replay, and after
  * compaction (mergeable-summary exactness, arrival-order-free). */
class StreamingSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001
  private val K = 7

  /** The batch ground truth over an arbitrary docs frame: the window
    * form of the same ranking (hash asc, doc_id tiebreak). */
  private def batchRanking(docs: DataFrame): Seq[(String, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    docs
      .withColumn("h",
        substring(md5(col("doc_id").cast("string")), 1, 15))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rank") <= K)
      .select(col("lang"), col("rank").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def got(root: String): Seq[(String, Long, Long)] =
    StreamingSample.read(spark, root, K).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("maintained sample ≡ batch ranking after every wave, across a " +
      "restart; replay idempotent; compaction changes nothing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("streamsample") + "/sample"
    val ckpt = TestSpark.tempDir("streamsample-ckpt")
    val all = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang")).as[SampleDoc].collect()
    // waves keyed so strata arrive interleaved and out of doc_id order
    val waves = all.groupBy(_.doc_id % 3).toSeq.sortBy(-_._1).map(_._2.toSeq)
    val input = MemoryStream[SampleDoc]
    var sofar = Seq.empty[SampleDoc]
    waves.foreach { wave =>
      input.addData(wave)
      // a NEW query per wave = restart between every wave
      val q = StreamingSample.start(input.toDS().toDF(), root, ckpt, K)
      q.awaitTermination(60000)
      sofar = sofar ++ wave
      assert(got(root) === batchRanking(sofar.toDF()),
        s"diverged after ${sofar.size} docs")
    }
    // the full corpus: stream ≡ the operator's own batch face
    val viaOp = graft.operators.CorpusOps.sampleExactK(spark, dir, K)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got(root) === viaOp, "stream face diverged from sampleExactK")
    // replay: re-append the last batch id by hand — idempotent overwrite
    val before = got(root)
    StreamingSample.appendBatch(root, K)(waves.last.toDF(), waves.size - 1L)
    assert(got(root) === before, "replayed batch changed the sample")
    // compaction folds epochs, sample identical
    StreamingSample.compact(spark, root, K)
    assert(got(root) === before, "compaction changed the sample")
  }
}
