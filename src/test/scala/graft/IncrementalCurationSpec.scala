package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Curation}
import graft.streaming.IncrementalCuration

/** The curation DECISION maintained incrementally: per-doc-pure stage
  * flags append exactly, corpus-global stages (substring dup) derive
  * fresh from the maintained occurrence relation — so the composed
  * decision equals the whole-corpus batch funnel after every wave, and
  * an old doc's decision sharpens retroactively when its near-copy
  * arrives. */
class IncrementalCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def asTuples(rows: Array[Row]) =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("pass_lang"),
      r.getAs[Boolean]("pass_quality"), r.getAs[Boolean]("pass_repetition"),
      r.getAs[Boolean]("pass_substring_dup"),
      r.getAs[Boolean]("pass_contamination"), r.getAs[Boolean]("keep"),
      r.getAs[String]("first_fail"))).toSeq

  test("accumulated decision equals the batch funnel after every wave; an old doc's decision sharpens on a later copy") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val all = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val evalShingles = CorpusOps.benchmarkShingles(spark, dir).localCheckpoint()
    val waves = all.as[IdxDoc].collect()
      .groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val root = TestSpark.tempDir("cur-stream")
    val ckpt = TestSpark.tempDir("cur-stream-ckpt")
    val input = MemoryStream[IdxDoc]
    var history = Vector.empty[Map[Long, Boolean]]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalCuration.start(input.toDS().toDF(), dir, root, ckpt)
      q.awaitTermination(60000)
      val got = asTuples(IncrementalCuration.funnel(spark, root).collect())
      val seen = history.size + 1
      val want = asTuples(Curation.funnelOf(
        all.filter(col("doc_id") % 3 < seen &&
          col("doc_id") % CorpusOps.EvalSliceMod =!= 0),
        evalShingles).collect())
      assert(got === want, s"divergence after wave $seen")
      history :+= got.map(t => t._1 -> t._5).toMap // pass_substring_dup
    }
    // the corpus-global effect: a doc present from an EARLIER wave loses
    // pass_substring_dup only when its near-copy arrives later (same
    // fixture property IncrementalSubstringSpec pins)
    val sharpened = history.zip(history.tail).exists { case (a, b) =>
      a.exists { case (id, pass) => pass && !b.getOrElse(id, true) }
    }
    assert(sharpened,
      "no earlier doc's substring stage flipped on a later arrival — " +
        "dup families should straddle the wave split")
  }

  test("replaying a batchId rewrites its own epochs (exactly-once)") {
    import spark.implicits._
    val root = TestSpark.tempDir("cur-replay")
    val eval = Seq(IdxDoc(97, "unrelated benchmark text only")).toDF()
    val evalShingles = CorpusOps.benchmarkShinglesOf(eval)
    val b0 = Seq(IdxDoc(1, "a b c d e f g h i j k l"),
      IdxDoc(2, "z y x w v u t s r q p o")).toDF()
    val b1 = Seq(IdxDoc(3, "a b c d e f g h i j k l")).toDF()
    IncrementalCuration.appendBatch(root, evalShingles)(b0, 0L)
    IncrementalCuration.appendBatch(root, evalShingles)(b1, 1L)
    val once = asTuples(IncrementalCuration.funnel(spark, root).collect())
    IncrementalCuration.appendBatch(root, evalShingles)(b1, 1L) // replay
    val again = asTuples(IncrementalCuration.funnel(spark, root).collect())
    assert(again === once)
    // the arriving copy killed BOTH twelve-token twins at substring_dup
    assert(once.filter(t => !t._5).map(_._1).toSet === Set(1L, 3L))
  }
}
