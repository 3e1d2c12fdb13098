package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.operators.Dedup

/** Incremental maintenance of the cluster-decision index
  * ([[graft.operators.Dedup.ensureClustersIndex]]): each micro-batch of
  * arriving documents (a) appends its signature rows to the signature
  * index ([[IncrementalIndex]]), (b) discovers the near-dup pairs it
  * creates against the corpus-so-far
  * ([[IncrementalIndex.pairsForBatch]] — batch side broadcast, no
  * corpus self-join), and (c) merges those pairs into the previous
  * (doc_id, canon) labeling via the canon-graph contraction
  * ([[graft.operators.Dedup.mergeClustersBatch]]) — never re-running
  * whole-corpus label propagation.
  *
  * Exactness: a batch's pairs lift to edges between component CANONS;
  * merging those components and taking the min canon reproduces exactly
  * the connected components of the accumulated pair graph, because each
  * existing canon is already its component's minimum (induction over
  * batches — IncrementalClustersSpec asserts equality with the batch
  * rebuild across ≥3 waves including a component-MERGING wave).
  *
  * Exactly-once: each batch writes a full labels SNAPSHOT to its own
  * `epoch=<batchId>/` directory, and reads its predecessor as the
  * newest epoch STRICTLY BELOW its batchId — a foreachBatch replay
  * after a crash re-reads the same predecessor and overwrites the same
  * epoch directory, converging to the same snapshot (the
  * [[IncrementalIndex]] idempotence argument, applied to state that is
  * a fold rather than an append).
  *
  * At 100 TB: the labels index is one (doc_id, canon) pair per document
  * — the snapshot write is a narrow columnar copy, and everything
  * batch-sized (pairs, canon graph, relabel mapping) is broadcast. If
  * even the snapshot copy is too hot, the same mergeClustersBatch
  * output can feed a MERGE INTO a keyed table instead; the fold logic
  * is unchanged.
  */
object IncrementalClusters {

  private val labelsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("canon", LongType)))

  /** The labeling as of the newest epoch strictly below `beforeEpoch`
    * (replay-stable predecessor read), or an empty labeling when none —
    * the empty-corpus start. Epoch discovery goes through the Hadoop
    * FileSystem API ([[Epochs]]) so the fold is filesystem-agnostic. */
  def readLabelsBefore(spark: SparkSession, labelsRoot: String,
      beforeEpoch: Long): DataFrame =
    Epochs.predecessor(spark, labelsRoot, beforeEpoch) match {
      case Some(e) => spark.read.parquet(s"$labelsRoot/epoch=$e")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelsSchema)
    }

  /** The current (newest-epoch) labeling — what consumers
    * (keep-best, corpus emission) read. */
  def readLabels(spark: SparkSession, labelsRoot: String): DataFrame =
    readLabelsBefore(spark, labelsRoot, Long.MaxValue)

  /** Fold one micro-batch into index + labels. Cluster-decision banding
    * (128 hashes / 32 bands) matches [[graft.operators.Dedup.dupClusters]]
    * so the incremental decision sees the same pair recall as the batch
    * one. */
  def appendBatch(indexRoot: String, labelsRoot: String)(
      batch: DataFrame, batchId: Long): Unit = {
    IncrementalIndex.appendBatch(indexRoot)(batch, batchId)
    val spark = batch.sparkSession
    val newIds = batch.select(col("doc_id"))
    val pairs = IncrementalIndex.pairsForBatch(spark, indexRoot, newIds,
        numHashes = Dedup.IndexHashes, bands = 32)
      .select(col("doc_a"), col("doc_b"))
    Dedup.mergeClustersBatch(
        readLabelsBefore(spark, labelsRoot, batchId), newIds, pairs)
      .write.mode("overwrite").parquet(s"$labelsRoot/epoch=$batchId")
  }

  /** Retention sweep: every epoch is a COMPLETE labels snapshot, so all
    * but the newest `keep` are superseded state — without a sweep the
    * root grows one full corpus-sized labeling per micro-batch forever,
    * the classic unbounded-state leak of snapshot folds. Safe anywhere
    * in the batch schedule (a replay only ever touches ids above every
    * committed epoch, whose predecessor is the newest snapshot; the
    * extra retained epoch covers in-flight readers). Returns the swept
    * epoch ids. */
  def pruneEpochs(spark: SparkSession, labelsRoot: String,
      keep: Int = 2): Seq[Long] =
    Epochs.prune(spark, labelsRoot, keep)

  /** Wire a documents stream into incremental index + cluster
    * maintenance. AvailableNow by default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, indexRoot: String, labelsRoot: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream.writeStream
      .foreachBatch(appendBatch(indexRoot, labelsRoot) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
