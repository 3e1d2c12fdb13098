package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Subword
import graft.streaming.StreamingSubword

case class SwDoc(doc_id: Long, text: String)

/** The streaming subword face: per-epoch counts under the frozen vocab
  * tile the batch query exactly, across query restarts; a replayed
  * epoch never double-counts. */
class StreamingSubwordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def canon(df: DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords")))).toMap

  test("streamed counts equal the batch query across waves and restarts; " +
      "replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("swstream") + "/counts"
    val ckpt = TestSpark.tempDir("swstream-ckpt")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[SwDoc].collect()
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[SwDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = StreamingSubword.start(input.toDS().toDF(), dir, root, ckpt)
      q.awaitTermination(60000)
    }
    val batch = Subword.subwordTokenize(spark, dir)
    assert(canon(StreamingSubword.read(spark, root)) === canon(batch),
      "accumulated epochs must tile the batch query exactly")
    // replayed epoch: rewrite of the same epoch dir, not a double count
    val vocab = Subword.ensureVocab(spark, dir)
    StreamingSubword.appendBatch(root, vocab)(
      waves.last.toSeq.toDS().toDF(), waves.length - 1L)
    assert(canon(StreamingSubword.read(spark, root)) === canon(batch),
      "replayed epoch must not change the accumulated counts")
  }
}
