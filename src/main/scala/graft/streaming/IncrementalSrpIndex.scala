package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.VectorFunctions.{hyperplanes, srpBucket}
import graft.operators.Similarity

/** Incremental maintenance of the SRP (sign-random-projection) ANN
  * index ([[graft.operators.Similarity.ensureSrpIndex]]): new embedding
  * rows have their bucket computed per micro-batch (the hyperplanes are
  * a fixed seeded function — NO training state, unlike IVF) and land in
  * a bucket-partitioned directory under their batch, so vector search
  * serves fresh embeddings without a corpus rebuild. Fourth and last of
  * the pure-per-row materialized indexes to gain ingest-time
  * maintenance (signatures, clusters, postings, SRP); IVF is the
  * deliberate exception — its centroids are corpus-TRAINED, so
  * incremental append is approximate-by-definition there (documented at
  * [[graft.operators.Similarity.ensureIvfIndex]] — re-train per
  * snapshot, serve between).
  *
  * Exactness: bucket = f(embedding, fixed planes) is pure per-row, so
  * accumulated batches equal the batch-built index row-for-row, and the
  * probe query returns IDENTICAL results through either face
  * (IncrementalSrpIndexSpec).
  *
  * Layout: `batch=N/bucket=K/` — partition discovery exposes BOTH as
  * partition columns, so a probe's bucket filter prunes directories
  * inside every batch exactly as it prunes the batch-built layout
  * (PartitionFilters asserted in the spec). The batch level adds one
  * directory fan-out per micro-batch — the same LSM-like shape as the
  * incremental postings, compacted for free whenever the snapshot
  * builder re-runs.
  *
  * Exactly-once: per-batch directory overwrite keyed by batchId.
  */
object IncrementalSrpIndex {

  /** Append one micro-batch of embedding rows — idempotent per batchId. */
  def appendBatch(indexRoot: String, nPlanes: Int = 8, seed: Long = 42L)(
      batch: DataFrame, batchId: Long): Unit =
    Compaction.fencedBatchDir(batch.sparkSession, indexRoot, batchId)
      .foreach(dir => batch
        .withColumn("bucket",
          srpBucket(col("embedding"), hyperplanes(nPlanes, 64, seed)))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(dir))

  /** Wire an embeddings stream into incremental SRP maintenance.
    * AvailableNow by default: drain, checkpoint, stop. */
  def start(embStream: DataFrame, indexRoot: String, checkpoint: String,
      nPlanes: Int = 8, seed: Long = 42L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    embStream.writeStream
      .foreachBatch(appendBatch(indexRoot, nPlanes, seed) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The incrementally-maintained index as one frame (batch partition
    * column dropped; bucket stays — it is the probe key). */
  def read(spark: SparkSession, indexRoot: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, indexRoot)).drop("batch")

  /** ANN top-k served from the incremental index — same probe set and
    * bit-exact scores as the batch-index query. */
  def annKnn(spark: SparkSession, indexRoot: String, dir: String,
      queryId: Long = 0L, k: Int = 20, nPlanes: Int = 8,
      seed: Long = 42L): DataFrame =
    Similarity.annServeFromIndex(spark, read(spark, indexRoot), dir,
      queryId, k, nPlanes, seed)
}
