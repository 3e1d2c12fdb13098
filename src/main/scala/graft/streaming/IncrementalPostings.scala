package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Search

/** Incremental maintenance of the postings (inverted) index
  * ([[graft.operators.Search.ensurePostingsIndex]]): new documents
  * arriving on a stream have their (term, doc_id, tf) rows computed per
  * micro-batch and appended, so lexical search and TF-IDF/BM25 serve an
  * up-to-date index without re-tokenizing the corpus — the third
  * materialized index to gain ingest-time maintenance, after signatures
  * ([[IncrementalIndex]]) and the cluster decision
  * ([[IncrementalClusters]]).
  *
  * Exactness: a document's postings depend on that document alone (pure
  * per-document function), so incremental append is EXACT — batch
  * rebuild and accumulation produce identical row sets, and df / N /
  * dl / corpus totals are aggregates OF the postings, so every derived
  * statistic is as fresh as the index (IncrementalPostingsSpec asserts
  * row-set equality and query-result equality for keyword search and
  * TF-IDF).
  *
  * Exactly-once: per-batch directory overwrite keyed by batchId, the
  * [[IncrementalIndex]] pattern.
  *
  * At 100 TB: each batch directory is term-clustered and term-sorted at
  * append time, so a term lookup still skips non-matching row groups
  * within every batch file (PushedFilters — asserted in the spec); the
  * trade vs the batch build is one term's postings spread across
  * batch-many files instead of one, the standard LSM-like shape search
  * engines compact in the background — a periodic re-run of the batch
  * builder IS that compaction, and consumers are indifferent because
  * both faces read the same logical relation.
  */
object IncrementalPostings {

  /** Append one micro-batch of documents' postings — idempotent per
    * batchId (overwrite of the batch's own directory). `partitions`
    * bounds the append's shuffle width AND the batch's file count;
    * 0 (the default) means min(`spark.sql.shuffle.partitions`, 8) —
    * capped because a micro-batch is wave-sized by definition, and
    * inheriting a warehouse-wide shuffle width (commonly 200) would
    * fan every batch into ~200 tiny files, amplifying exactly the
    * small-file problem [[Compaction]] exists to undo. Pass an explicit
    * width for genuinely huge batches (e.g. an initial backfill). */
  def appendBatch(indexRoot: String, partitions: Int = 0)(
      batch: DataFrame, batchId: Long): Unit =
    appendWith(Search.postingsOf, Seq("term", "doc_id"),
      indexRoot, partitions)(batch, batchId)

  /** [[appendBatch]] for the POSITIONAL index (the phrase/proximity
    * query faces, [[graft.operators.Search.ensurePositionalIndex]]):
    * the same exactness argument — (term, doc, pos) rows are a pure
    * per-document function — and the same idempotent per-batch
    * overwrite and term clustering. */
  def appendPositionalBatch(indexRoot: String, partitions: Int = 0)(
      batch: DataFrame, batchId: Long): Unit =
    appendWith(Search.positionalPostingsOf, Seq("term", "doc_id", "pos"),
      indexRoot, partitions)(batch, batchId)

  private def appendWith(rows: DataFrame => DataFrame,
      sortCols: Seq[String], indexRoot: String, partitions: Int)(
      batch: DataFrame, batchId: Long): Unit = {
    val parts =
      if (partitions > 0) partitions
      else math.min(
        batch.sparkSession.sessionState.conf.numShufflePartitions, 8)
    Compaction.fencedBatchDir(batch.sparkSession, indexRoot, batchId)
      .foreach(dir => rows(batch)
        // term-clustered within the batch, like the batch build:
        // row-group min/max still prune term lookups inside each file
        .repartition(parts, col("term"))
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode("overwrite").parquet(dir))
  }

  /** Wire a documents stream into incremental postings maintenance.
    * AvailableNow by default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, indexRoot: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      partitions: Int = 0): StreamingQuery =
    docsStream.writeStream
      .foreachBatch(appendBatch(indexRoot, partitions) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** [[start]] for the positional index. */
  def startPositional(docsStream: DataFrame, indexRoot: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      partitions: Int = 0): StreamingQuery =
    docsStream.writeStream
      .foreachBatch(appendPositionalBatch(indexRoot, partitions) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The incrementally-maintained index as one postings frame (batch
    * partition column dropped — same schema as the batch-built index).
    * Resolves through [[Snapshots]] so a compacted root serves its
    * current committed generation. */
  def read(spark: SparkSession, indexRoot: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, indexRoot)).drop("batch")

  /** Keyword search served from the incremental index. */
  def keywordSearch(spark: SparkSession, indexRoot: String,
      terms: Seq[String]): DataFrame =
    Search.andCandidatesFrom(read(spark, indexRoot), terms)
      .orderBy(col("tf_sum").desc, col("doc_id"))

  /** TF-IDF statistics served from the incremental index. */
  def tfidf(spark: SparkSession, indexRoot: String): DataFrame =
    Search.tfidfFrom(read(spark, indexRoot))
}
