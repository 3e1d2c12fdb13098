package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.TextAnalysis

/** Streaming accumulation of the Misra-Gries frequency sketch
  * (x_heavy_hitters): each micro-batch of documents contributes its
  * per-partition MG summaries ([[TextAnalysis.mgPartials]]), which are
  * merged with the accumulated summary by the same order-free
  * relational merge the batch query uses ([[TextAnalysis.mgMerge]]) —
  * mergeability is the sketch's whole point (Agarwal et al., mergeable
  * summaries), demonstrated here across batches the way
  * t_stream_running_distinct demonstrates the running-distinct rewrite.
  *
  * Guarantee across the fold (StreamingHeavyHittersSpec): est ≤ true
  * always (counters only ever under-count), and true − est ≤ 2n/(k+1)
  * over the WHOLE stream — phase-1 decrements and per-merge truncations
  * each charge disjoint decremented mass, ≤ n/(k+1) apiece, so the
  * bound does not degrade with the number of micro-batches. At
  * k ≥ vocabulary the fold degenerates to exact counts and equals the
  * batch query exactly.
  *
  * State is bounded by construction: the accumulated summary is ≤ k
  * rows — the 100 TB property that exact streaming term counting lacks
  * (its state is the vocabulary). Exactly-once: epoch-directory
  * snapshots, the [[IncrementalClusters]] fold pattern.
  */
object StreamingHeavyHitters {

  private val summarySchema = StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType)))

  /** Accumulated (term, cnt) summary as of the newest epoch strictly
    * below `beforeEpoch`; empty at stream start. Epoch discovery goes
    * through the Hadoop FileSystem API ([[Epochs]]) so the fold is
    * filesystem-agnostic. */
  def readSummaryBefore(spark: SparkSession, root: String,
      beforeEpoch: Long): DataFrame =
    Epochs.predecessor(spark, root, beforeEpoch) match {
      case Some(e) => spark.read.parquet(s"$root/epoch=$e")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], summarySchema)
    }

  /** The current accumulated summary, ordered like the batch query. */
  def readSummary(spark: SparkSession, root: String): DataFrame =
    readSummaryBefore(spark, root, Long.MaxValue)
      .select(col("term"), col("cnt").as("est"))
      .orderBy(col("est").desc, col("term"))

  /** Fold one micro-batch of documents into the summary: the previous
    * summary's counters are themselves a valid MG summary, so one
    * relational merge of (previous ∪ batch partials) is the whole
    * update — ≤ k + k·partitions input rows, independent of history. */
  def appendBatch(root: String, k: Int)(batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = readSummaryBefore(spark, root, batchId)
    TextAnalysis.mgMerge(
        prev.unionByName(TextAnalysis.mgPartials(batch, k)), k)
      .select(col("term"), col("est").as("cnt"))
      .write.mode("overwrite").parquet(s"$root/epoch=$batchId")
  }

  /** Retention sweep for the epoch snapshots (each ≤ k rows, but one
    * per micro-batch forever without this — see
    * [[IncrementalClusters.pruneEpochs]] for the safety argument). */
  def pruneEpochs(spark: SparkSession, root: String,
      keep: Int = 2): Seq[Long] =
    Epochs.prune(spark, root, keep)

  /** Wire a documents stream into the sketch fold. AvailableNow by
    * default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, root: String, checkpoint: String,
      k: Int, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .foreachBatch(appendBatch(root, k) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
