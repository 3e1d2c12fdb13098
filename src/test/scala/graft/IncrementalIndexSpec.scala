package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.IncrementalIndex

case class IdxDoc(doc_id: Long, text: String)

/** Streaming maintenance of the signature index: documents arriving in
  * micro-batches produce EXACTLY the index a whole-corpus batch rebuild
  * would — the ingest-time amortization the dedup decision rides on. */
class IncrementalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  /** Comparable canonical form of an index frame: shingle sets sorted
    * (collect_set order is partitioning-dependent), arrays to Seq. */
  private def canon(df: DataFrame): Map[Long, (Long, Seq[Long], Seq[String])] =
    df.select(col("doc_id"), col("sim"), col("sig"),
        array_sort(col("sh")).as("sh"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((
        r.getAs[Long]("sim"),
        Option(r.getAs[Seq[Long]]("sig")).orNull,
        Option(r.getAs[Seq[String]]("sh")).orNull)))
      .toMap

  test("incremental append across restarts equals the batch-built index; pair set identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incidx") + "/index"
    val ckpt = TestSpark.tempDir("incidx-ckpt")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[IdxDoc].collect()
    // three arrival waves; each drained by its own AvailableNow run, so
    // this also proves checkpoint-resume across query restarts
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalIndex.start(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
    }
    val inc = IncrementalIndex.read(spark, root)
    val batch = Dedup.indexRows(Tables.documents(spark, dir))
    assert(inc.count() === docs.length.toLong)
    assert(canon(inc) === canon(batch),
      "incrementally-built index must equal the batch rebuild row-for-row")
    // the decision path consumes it identically: same near-dup pair set
    // at the cluster banding (128 hashes / 32 bands)
    def pairs(idx: DataFrame) =
      Dedup.nearDupFromSignatures(
        idx.filter(col("sig").isNotNull).select(col("doc_id"), col("sig"), col("sh")),
        numHashes = Dedup.IndexHashes, bands = 32, threshold = 0.8)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(inc) === pairs(batch))
  }

  test("per-batch pair discovery accumulates to exactly the whole-corpus pair set") {
    import spark.implicits._
    val root = TestSpark.tempDir("incidx-pairs") + "/index"
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[IdxDoc].collect()
    // deterministic waves; doc_id%3 splits true near-dup pairs across
    // waves (fixture dups are id-adjacent), so cross-wave discovery is
    // genuinely exercised, not just intra-batch
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    var discovered = Seq.empty[(Long, Long)]
    waves.zipWithIndex.foreach { case (wave, i) =>
      val waveDf = wave.toSeq.toDF()
      IncrementalIndex.appendBatch(root)(waveDf, i.toLong)
      val p = IncrementalIndex.pairsForBatch(spark, root,
          waveDf.select(col("doc_id")))
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // no pair may be rediscovered in a later batch
      assert(p.toSet.intersect(discovered.toSet).isEmpty)
      discovered ++= p
    }
    val whole = Dedup.nearDupFromSignatures(
        IncrementalIndex.read(spark, root).filter(col("sig").isNotNull)
          .select(col("doc_id"), slice(col("sig"), 1, 64).as("sig"), col("sh")),
        numHashes = 64, bands = 16, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(discovered.size === discovered.toSet.size, "each pair exactly once")
    assert(discovered.toSet === whole,
      "ingest-time accumulation must equal the batch pair query")
  }

  test("replaying a batchId overwrites its own directory — no duplicate rows (exactly-once)") {
    import spark.implicits._
    val root = TestSpark.tempDir("incidx-replay") + "/index"
    val batch = Seq(IdxDoc(1, "a b c d e f"), IdxDoc(2, "a b c d e g")).toDF()
    IncrementalIndex.appendBatch(root)(batch, 7L)
    val once = IncrementalIndex.read(spark, root).count()
    IncrementalIndex.appendBatch(root)(batch, 7L) // foreachBatch replay
    assert(IncrementalIndex.read(spark, root).count() === once,
      "a replayed micro-batch must not duplicate index rows")
  }
}
