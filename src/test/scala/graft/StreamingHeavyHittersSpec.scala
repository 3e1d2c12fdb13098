package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.streaming.StreamingHeavyHitters

/** Misra-Gries across micro-batches: the sketch's mergeability is its
  * whole point — per-batch summaries folded by the order-free
  * relational merge must keep the batch query's guarantees over the
  * WHOLE stream, and degenerate to exact counts at k ≥ vocabulary. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def waves = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
      .groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
  }

  private def foldWaves(k: Int, root: String, ckpt: String): Map[String, Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = StreamingHeavyHitters.start(input.toDS().toDF(), root, ckpt, k)
      q.awaitTermination(60000)
    }
    StreamingHeavyHitters.readSummary(spark, root).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
  }

  test("stream-accumulated summary keeps the batch bounds over the whole stream") {
    val k = 20
    val base = TestSpark.tempDir("mg-stream")
    val got = foldWaves(k, s"$base/hh", s"$base/ckpt")
    val exact = Tables.documents(spark, dir).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = exact.values.sum
    val bound = 2.0 * n / (k + 1)
    assert(got.nonEmpty && got.size <= k)
    // est ≤ true and undercount ≤ 2n/(k+1) — the same obligations the
    // batch sketch proves, unchanged by the number of merge rounds
    got.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted across batches")
      assert(exact(t) - est <= bound, s"$t undercount ${exact(t) - est} > $bound")
    }
    // every sufficiently frequent term survives the fold
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(got.contains(t), s"frequent term $t lost in a merge")
    }
  }

  test("at k ≥ vocabulary the fold equals exact counts and the batch query") {
    val exact = Tables.documents(spark, dir).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val k = exact.size + 10
    val base = TestSpark.tempDir("mg-stream-exact")
    val got = foldWaves(k, s"$base/hh", s"$base/ckpt")
    assert(got === exact)
    val batch = TextAnalysis.heavyHitters(spark, dir, k).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("est")).toMap
    assert(got === batch)
  }

  test("replaying a batchId rewrites the same epoch snapshot (exactly-once fold)") {
    import spark.implicits._
    val root = TestSpark.tempDir("mg-replay") + "/hh"
    val b0 = Seq(IdxDoc(1, "a a b c"), IdxDoc(2, "a b d")).toDF()
    val b1 = Seq(IdxDoc(3, "a c c e")).toDF()
    StreamingHeavyHitters.appendBatch(root, k = 3)(b0, 0L)
    StreamingHeavyHitters.appendBatch(root, k = 3)(b1, 1L)
    val once = StreamingHeavyHitters.readSummary(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    StreamingHeavyHitters.appendBatch(root, k = 3)(b1, 1L) // replay
    val again = StreamingHeavyHitters.readSummary(spark, root).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again === once)
  }
}
