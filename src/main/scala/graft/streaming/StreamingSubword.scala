package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Subword

/** Ingest-time subword token accounting (x_subword_tokenize's streaming
  * face): every arriving micro-batch of training documents is token-
  * counted under the FROZEN corpus vocabulary before it enters the
  * corpus — where token budgeting actually runs in a training pipeline
  * (shard packing and mix weights consume per-doc token counts at
  * ingest; recounting the corpus per refresh is the rebuild this face
  * replaces).
  *
  * The vocabulary is trained ONCE at stream start from the base corpus
  * ([[Subword.ensureVocab]] — sig-gated, the pre-trained-quantizer
  * convention [[IncrementalIvfPq]] established: train rarely, serve
  * continuously) and rides every batch as expression state. The count
  * is per-doc stateless given the vocab, so the per-epoch outputs TILE
  * the batch query's result exactly: accumulated counts over any batch
  * split equal [[Subword.countsOf]] over the union
  * (StreamingSubwordSpec). Exactly-once: epoch-directory overwrite
  * keyed by batchId (the [[StreamingDecontaminate]] pattern) — a
  * replayed batch rewrites its own epoch, never double-counts.
  *
  * Vocabulary drift is the declared retrain boundary, NOT silently
  * absorbed: counts stay comparable across the whole corpus only under
  * one vocab, so a corpus-snapshot change retrains via the sig gate and
  * a rebuild (the same contract as every trained index here). */
object StreamingSubword {

  /** Count one micro-batch under the frozen vocab and write its epoch
    * snapshot. */
  def appendBatch(root: String, vocab: Array[String])(
      batch: DataFrame, batchId: Long): Unit =
    Subword.countsOf(batch, vocab)
      .write.mode("overwrite").parquet(s"$root/epoch=$batchId")

  /** Accumulated per-doc counts across every epoch so far, ordered like
    * the batch query. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)
      .select(col("doc_id"), col("n_words"), col("n_subwords"))
      .orderBy(col("doc_id"))

  /** Wire a documents stream into ingest counting. The vocabulary is
    * materialized here, once, before the first batch. AvailableNow by
    * default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, dir: String, root: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val vocab = Subword.ensureVocab(docsStream.sparkSession, dir)
    docsStream.writeStream
      .foreachBatch(appendBatch(root, vocab) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
