package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Incremental maintenance of the substring-dedup occurrence index
  * (x_substring_dedup's ingest face): each arriving micro-batch of
  * documents appends its per-(doc, window-hash) multiplicities
  * ([[Dedup.windowOccurrencesOf]] — a pure per-document relation, so
  * the append is EXACT like the postings index), and the dup statistics
  * are derived from the accumulated relation on read.
  *
  * What makes this face interesting — and different from the postings /
  * signature appends — is that the DERIVED flags are corpus-GLOBAL: a
  * window's document frequency counts every doc seen so far, so a newly
  * arrived copy of an old document flips the OLD document's dup flag on
  * the next read, with no recomputation of the old doc's rows
  * (IncrementalSubstringSpec asserts both the equality with the batch
  * rebuild after every wave AND an actual cross-batch flip). That is
  * the contract a training pipeline needs: dedup decisions sharpen as
  * the corpus grows, while ingest work stays proportional to the batch.
  *
  * Exactly-once: per-batch directory overwrite keyed by batchId, the
  * [[IncrementalIndex]] pattern.
  */
object IncrementalSubstring {

  /** Append one micro-batch's occurrence rows — idempotent per batchId. */
  def appendBatch(indexRoot: String, w: Int = 10)(batch: DataFrame,
      batchId: Long): Unit =
    Compaction.fencedBatchDir(batch.sparkSession, indexRoot, batchId)
      .foreach(dir => Dedup.windowOccurrencesOf(batch, w)
        .write.mode("overwrite").parquet(dir))

  /** Wire a documents stream into occurrence maintenance. AvailableNow
    * by default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, indexRoot: String, checkpoint: String,
      w: Int = 10, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .foreachBatch(appendBatch(indexRoot, w) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The accumulated occurrence relation (batch partition dropped —
    * same schema as the batch build's). */
  def read(spark: SparkSession, indexRoot: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, indexRoot)).drop("batch")

  /** Dup statistics over every document seen so far — the same derive
    * as the batch query, over the maintained relation. */
  def flags(spark: SparkSession, indexRoot: String,
      heavyPct: Int = 50): DataFrame =
    Dedup.substringFlagsFrom(read(spark, indexRoot), heavyPct)
}
