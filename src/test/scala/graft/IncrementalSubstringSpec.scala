package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.IncrementalSubstring

/** Substring-dedup occurrences accumulated across micro-batches: the
  * per-doc rows are pure (append is exact), but the derived flags are
  * corpus-GLOBAL — arriving copies must flip OLD docs' flags without
  * recomputing them. */
class IncrementalSubstringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def asTuples(rows: Array[Row]) =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_windows"),
      r.getAs[Long]("n_dup_windows"), r.getAs[Boolean]("dup_heavy"))).toSeq

  private def batchOver(docs: DataFrame) =
    asTuples(Dedup.substringFlagsFrom(Dedup.windowOccurrencesOf(docs)).collect())

  test("accumulated flags equal the batch rebuild after every wave; a later copy flips an earlier doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val waves = all.as[IdxDoc].collect()
      .groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val root = TestSpark.tempDir("sub-stream") + "/occ"
    val ckpt = TestSpark.tempDir("sub-stream-ckpt")
    val input = MemoryStream[IdxDoc]
    var flagHistory = Vector.empty[Map[Long, Boolean]]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalSubstring.start(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
      val got = asTuples(IncrementalSubstring.flags(spark, root).collect())
      val seen = flagHistory.size + 1
      val want = batchOver(all.filter(col("doc_id") % 3 < seen))
      assert(got === want, s"divergence after wave $seen")
      flagHistory :+= got.map(t => t._1 -> t._4).toMap
    }
    // the global effect: some doc present from an EARLIER wave gains its
    // dup flag only when its copy arrives in a later wave
    val flipped = flagHistory.zip(flagHistory.tail).exists { case (a, b) =>
      a.exists { case (id, f) => !f && b.getOrElse(id, false) }
    }
    assert(flipped,
      "no earlier doc's flag flipped on a later arrival — dup families " +
        "should straddle the wave split")
  }

  test("replaying a batchId rewrites the same batch directory (exactly-once)") {
    import spark.implicits._
    val root = TestSpark.tempDir("sub-replay") + "/occ"
    val b0 = Seq(IdxDoc(1, "a b c d e f g h i j k l"),
      IdxDoc(2, "z y x w v u t s r q p o")).toDF()
    val b1 = Seq(IdxDoc(3, "a b c d e f g h i j k l")).toDF()
    IncrementalSubstring.appendBatch(root)(b0, 0L)
    IncrementalSubstring.appendBatch(root)(b1, 1L)
    val once = asTuples(IncrementalSubstring.flags(spark, root).collect())
    IncrementalSubstring.appendBatch(root)(b1, 1L) // replay
    val again = asTuples(IncrementalSubstring.flags(spark, root).collect())
    assert(again === once)
    // and the copy flagged BOTH twelve-token twins (cross-doc windows)
    assert(once.count(_._4) === 2)
  }
}
