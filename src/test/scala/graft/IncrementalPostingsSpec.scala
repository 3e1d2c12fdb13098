package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search
import graft.streaming.IncrementalPostings

/** Streaming maintenance of the postings index: per-micro-batch append
  * must equal the batch rebuild row-for-row, serve the SAME query
  * results (keyword search, TF-IDF — incl. the corpus statistics df/N),
  * and keep the pushed term filter at the scan. */
class IncrementalPostingsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("term"), col("doc_id"), col("tf")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental append across restarts equals the batch postings; queries identical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incpost") + "/index"
    val ckpt = TestSpark.tempDir("incpost-ckpt")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalPostings.start(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
    }
    val inc = IncrementalPostings.read(spark, root)
    assert(rows(inc) === rows(Search.postings(spark, dir)),
      "incremental postings must equal the batch build row-for-row")
    // query faces: identical results through the incremental index
    val terms = Seq("spark", "merge")
    val kwInc = IncrementalPostings.keywordSearch(spark, root, terms)
      .collect().map(_.toSeq).toSeq
    val kwBatch = Search.keywordSearch(spark, dir, terms)
      .collect().map(_.toSeq).toSeq
    assert(kwInc === kwBatch, "keyword search must not see the seam")
    val tfidfInc = IncrementalPostings.tfidf(spark, root)
      .collect().map(_.toSeq).toSeq
    val tfidfBatch = Search.tfidf(spark, dir).collect().map(_.toSeq).toSeq
    assert(tfidfInc === tfidfBatch,
      "df/N derived from the incremental index must match the batch one")
    // the term probe still prunes at the scan of the incremental index
    val plan = IncrementalPostings.keywordSearch(spark, root, terms)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      "term filter did not reach the incremental index scan:\n" + plan)
  }

  test("incremental POSITIONAL append equals the batch positional build; " +
      "phrase search identical; replay idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = TestSpark.tempDir("incpos") + "/index"
    val ckpt = TestSpark.tempDir("incpos-ckpt")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
    val waves = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[IdxDoc]
    waves.foreach { wave =>
      input.addData(wave.toSeq)
      val q = IncrementalPostings.startPositional(input.toDS().toDF(), root, ckpt)
      q.awaitTermination(60000)
    }
    def posRows(df: DataFrame): Set[(String, Long, Long)] =
      df.select(col("term"), col("doc_id"), col("pos")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val inc = IncrementalPostings.read(spark, root)
    assert(posRows(inc) === posRows(
      Search.positionalPostingsOf(Tables.documents(spark, dir))),
      "incremental positional postings must equal the batch build")
    // the phrase face sees no seam
    val phrase = Seq("spark", "merge")
    val viaInc = Search.phraseSearchFrom(inc, phrase)
      .collect().map(_.toSeq).toSeq
    val viaBatch = Search.phraseSearch(spark, dir, phrase)
      .collect().map(_.toSeq).toSeq
    assert(viaInc === viaBatch, "phrase search must not see the seam")
    // replay idempotence rides the same per-batch overwrite
    val one = Seq(IdxDoc(900001, "x y x")).toDF()
    IncrementalPostings.appendPositionalBatch(root)(one, 99L)
    val once = posRows(IncrementalPostings.read(spark, root))
    IncrementalPostings.appendPositionalBatch(root)(one, 99L)
    assert(posRows(IncrementalPostings.read(spark, root)) === once)
  }

  test("replaying a batchId overwrites its own directory — no duplicate postings") {
    import spark.implicits._
    val root = TestSpark.tempDir("incpost-replay") + "/index"
    val batch = Seq(IdxDoc(1, "a b a"), IdxDoc(2, "b c")).toDF()
    IncrementalPostings.appendBatch(root)(batch, 3L)
    val once = rows(IncrementalPostings.read(spark, root))
    IncrementalPostings.appendBatch(root)(batch, 3L) // foreachBatch replay
    assert(rows(IncrementalPostings.read(spark, root)) === once)
    assert(once === Set(("a", 1L, 2L), ("b", 1L, 1L), ("b", 2L, 1L), ("c", 2L, 1L)))
  }
}
