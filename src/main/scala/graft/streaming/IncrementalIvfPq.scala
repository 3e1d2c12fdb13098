package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType
import graft.functions.NearestCentroid
import graft.operators.PQ

/** Incremental maintenance of the IVF-PQ composite index
  * ([[graft.operators.PQ.ensureIvfPqIndex]]): vectors arriving on a
  * stream are assigned their coarse list and PQ codes under the FROZEN
  * quantizers (the codebooks the batch build trained) and appended
  * per micro-batch — the "add without retrain" serving contract of
  * production IVF-PQ deployments: new vectors become searchable
  * immediately, and the quantizers retrain once per corpus snapshot
  * (the [[graft.operators.Similarity.ensureIvfIndex]] stance; the
  * freshness gate IS the retrain schedule).
  *
  * Exactness: under FIXED codebooks, (cid, codes) is a pure per-row
  * function — so the accumulated index is IDENTICAL row-for-row to a
  * batch rebuild that uses the same codebooks, and a probe query
  * returns identical candidates through either face
  * (IncrementalIvfPqSpec). What incremental append does NOT do is
  * adapt the codebooks to distribution drift — that is the retrain's
  * job, deliberately (appending under frozen centroids degrades
  * assignment quality silently; retraining per snapshot bounds it).
  *
  * Layout: `batch=N/cid=K/` — partition discovery exposes both, so a
  * probe's cid filter prunes inside every batch exactly as in the
  * batch-built layout; compaction back to the one-directory-per-list
  * shape is [[Compaction.compact]] with the batch builder's writer
  * (atomic publish, [[Snapshots]]).
  *
  * Exactly-once: per-batch directory overwrite keyed by batchId, the
  * [[IncrementalIndex]] pattern.
  */
object IncrementalIvfPq {

  /** Assign one micro-batch of embedding rows under frozen quantizers
    * and append — idempotent per batchId. `books` are the RESIDUAL
    * codebooks ([[PQ.ensureIvfPqIndex]]): each row is coarse-assigned,
    * its residual against ITS frozen centroid computed, and the
    * residual encoded — the same [[PQ.withResidual]] +
    * [[PQ.residualCodesCol]] the batch build uses, so (cid, codes)
    * stays a pure per-row function and the rebuild-equality argument
    * holds unchanged. */
  def appendBatch(indexRoot: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]])(
      batch: DataFrame, batchId: Long): Unit = {
    val m = books.length
    val assigned = batch.select(col("vec_id"),
      NearestCentroid.assign(col("embedding"), cents).as("cid"),
      col("label").cast(LongType).as("label"),
      col("embedding"))
    Compaction.fencedBatchDir(batch.sparkSession, indexRoot, batchId)
      .foreach(dir => PQ.withResidual(batch.sparkSession, assigned, cents)
        .select(col("vec_id"), col("cid"), col("label"),
          PQ.residualCodesCol(m, books).as("codes"))
        .write.mode("overwrite").partitionBy("cid")
        .parquet(dir))
  }

  /** Wire an embeddings stream into incremental IVF-PQ maintenance.
    * AvailableNow by default: drain, checkpoint, stop. */
  def start(embStream: DataFrame, indexRoot: String, checkpoint: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    embStream.writeStream
      .foreachBatch(appendBatch(indexRoot, cents, books) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The incrementally-maintained index as one frame (batch partition
    * dropped; cid stays — it is the probe key). Schema matches the
    * batch-built composite exactly. */
  def read(spark: SparkSession, indexRoot: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, indexRoot)).drop("batch")

  /** Compact the per-batch fan-out back to the batch build's
    * one-directory-per-list shape (atomic publish, predecessor
    * retained — [[Snapshots]]). */
  def compact(spark: SparkSession, indexRoot: String): Unit =
    Compaction.compact(spark, indexRoot) { (df, out) =>
      df.write.partitionBy("cid").parquet(out)
    }

  /** IVF-PQ top-k served from the incremental index — the SAME query
    * path as the batch-built composite ([[graft.operators.PQ
    * .ivfpqServe]]): freshly ingested vectors are searchable with no
    * rebuild, and results are identical to the batch index's whenever
    * the accumulated rows are (the frozen-quantizer row-equality the
    * spec pins). */
  def topK(spark: SparkSession, indexRoot: String, dir: String,
      cents: Array[Array[Double]], books: Array[Array[Array[Double]]],
      queryId: Long = 0L, k: Int = 20, nprobe: Int = 4,
      refine: Int = 50): DataFrame =
    PQ.ivfpqServe(spark, read(spark, indexRoot), dir, cents, books,
      queryId, k, nprobe, refine)
}
