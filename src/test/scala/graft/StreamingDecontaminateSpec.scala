package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusOps
import graft.streaming.StreamingDecontaminate

/** Top-level for the state-store/stream encoder (the KeyState rule). */
case class IdxVec(vec_id: Long, embedding: Array[Float])

/** Ingest-time decontamination across micro-batches: per-epoch flags
  * must TILE the batch query's result for any split of the corpus into
  * arrival waves — the per-doc-stateless contract that lets the check
  * run at ingest instead of as a corpus-wide sweep. */
class StreamingDecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def asTuples(rows: Array[Row]) =
    rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_shingles"),
      r.getAs[Long]("n_overlap"), r.getAs[Boolean]("contaminated"))).toSeq

  test("flags accumulated over 3 arrival waves equal the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val waves = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
      .groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val base = TestSpark.tempDir("decon-stream")
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = StreamingDecontaminate.start(
        input.toDS().toDF(), dir, s"$base/flags", s"$base/ckpt")
      q.awaitTermination(60000)
    }
    val streamed = asTuples(
      StreamingDecontaminate.readFlags(spark, s"$base/flags").collect())
    val batch = asTuples(CorpusOps.decontaminate(spark, dir).collect())
    assert(streamed === batch)
    assert(batch.exists(_._4), "no contaminated doc in fixture — test inert")
  }

  test("bloom ingest face: accumulated epochs equal the batch query (filter pinned at start)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val waves = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
      .groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val base = TestSpark.tempDir("decon-stream-bloom")
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = StreamingDecontaminate.startBloom(
        input.toDS().toDF(), dir, s"$base/flags", s"$base/ckpt")
      q.awaitTermination(60000)
    }
    val streamed = asTuples(
      StreamingDecontaminate.readFlags(spark, s"$base/flags").collect())
    // the full equivalence chain: streamed-bloom ≡ batch-bloom ≡ exact
    assert(streamed === asTuples(
      CorpusOps.decontaminateBloom(spark, dir).collect()))
    assert(streamed === asTuples(CorpusOps.decontaminate(spark, dir).collect()))
  }

  test("embedding ingest face: accumulated epochs equal x_embed_decontaminate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val waves = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id"), col("embedding")).as[IdxVec].collect()
      .groupBy(_.vec_id % 3).toSeq.sortBy(_._1).map(_._2)
    val base = TestSpark.tempDir("embed-decon-stream")
    val input = MemoryStream[IdxVec]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = graft.streaming.StreamingDecontaminate.startEmbed(
        input.toDS().toDF(), dir, s"$base/flags", s"$base/ckpt")
      q.awaitTermination(60000)
    }
    val streamed = graft.streaming.StreamingDecontaminate
      .readEmbedFlags(spark, s"$base/flags").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val batch = graft.operators.Similarity.embedDecontaminate(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(streamed === batch)
    assert(batch.exists(_._3), "no contaminated vector in fixture — test inert")
  }

  test("replaying a batchId rewrites the same epoch snapshot (exactly-once)") {
    import spark.implicits._
    val root = TestSpark.tempDir("decon-replay") + "/flags"
    val evalShingles = CorpusOps.benchmarkShingles(spark, dir)
    val Array(w0, w1) = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[IdxDoc].collect()
      .filter(_.doc_id % CorpusOps.EvalSliceMod != 0)
      .splitAt(40) match { case (a, b) => Array(a, b) }
    StreamingDecontaminate.appendBatch(root, evalShingles)(w0.toSeq.toDF(), 0L)
    StreamingDecontaminate.appendBatch(root, evalShingles)(w1.toSeq.toDF(), 1L)
    val once = asTuples(StreamingDecontaminate.readFlags(spark, root).collect())
    StreamingDecontaminate.appendBatch(root, evalShingles)(w1.toSeq.toDF(), 1L)
    val again = asTuples(StreamingDecontaminate.readFlags(spark, root).collect())
    assert(again === once)
  }
}
