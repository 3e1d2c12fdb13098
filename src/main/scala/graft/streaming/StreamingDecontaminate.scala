package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.CorpusOps

/** Ingest-time benchmark decontamination (x_decontaminate's streaming
  * face): every micro-batch of arriving training documents is checked
  * against the FIXED benchmark shingle set before it enters the corpus —
  * which is where decontamination actually runs in a training pipeline
  * (the eval suite is known upfront; checking at ingest means a
  * contaminated doc never has to be clawed back out of downstream
  * shards).
  *
  * The benchmark set is pinned ONCE at stream start
  * ([[CorpusOps.benchmarkShingles]], localCheckpoint'd — a
  * broadcast-sized reference artifact, never recomputed per batch). The
  * op is per-doc stateless given that set, so the per-epoch outputs
  * TILE the batch query's result exactly: accumulated flags over any
  * batch split equal `CorpusOps.decontaminate` over the union
  * (StreamingDecontaminateSpec), the same contract the incremental
  * indexes prove. Exactly-once: epoch-directory overwrite keyed by
  * batchId (the [[IncrementalClusters]] pattern) — a replayed batch
  * rewrites its own epoch, never double-flags.
  */
object StreamingDecontaminate {

  /** Check one micro-batch against the benchmark set and write its
    * epoch snapshot. Arriving benchmark docs are dropped (they are the
    * reference, not training candidates) — the batch face's convention. */
  def appendBatch(root: String, evalShingles: DataFrame,
      minOverlap: Int = 8)(batch: DataFrame, batchId: Long): Unit =
    CorpusOps.decontaminateOf(
        batch.filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0),
        evalShingles, minOverlap)
      .write.mode("overwrite").parquet(s"$root/epoch=$batchId")

  /** Accumulated per-doc contamination flags across every epoch so far,
    * ordered like the batch query. */
  def readFlags(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        col("contaminated"))
      .orderBy(col("doc_id"))

  /** Wire a documents stream into the ingest check. The benchmark set
    * is materialized here, once, before the first batch. AvailableNow
    * by default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, dir: String, root: String,
      checkpoint: String, minOverlap: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val evalShingles = CorpusOps
      .benchmarkShingles(docsStream.sparkSession, dir)
      .localCheckpoint(true, graft.ops.Pin.Level)
    docsStream.writeStream
      .foreachBatch(appendBatch(root, evalShingles, minOverlap) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The BLOOM-PREFILTERED ingest face (x_decontaminate_bloom's
    * streaming twin): both reference artifacts — the ~10-bit/key
    * filter AND the exact shingle set behind the verify join — are
    * pinned once at stream start; each micro-batch then pays only the
    * in-array probe plus a survivor-sized verify. Per-doc stateless
    * under the pinned pair, so the epochs tile the batch bloom face,
    * which is itself result-identical to the exact face — one
    * equivalence chain, each link spec-pinned. */
  def appendBatchBloom(root: String, evalShingles: DataFrame,
      bloom: Array[Byte], minOverlap: Int = 8)(
      batch: DataFrame, batchId: Long): Unit =
    CorpusOps.decontaminateBloomWith(
        batch.filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0),
        evalShingles, bloom, minOverlap)
      .write.mode("overwrite").parquet(s"$root/epoch=$batchId")

  /** The EMBEDDING-SPACE ingest face (x_embed_decontaminate's streaming
    * twin — the n-gram face catches verbatim leakage, this one catches
    * the paraphrased eval item that shares no 8-gram but sits next to
    * the original in embedding space): the benchmark vector frame is
    * pinned once at stream start with precomputed norms; each arriving
    * vector batch runs one broadcast scan + map-side max. Per-vector
    * stateless under the pinned frame, so the epochs tile the batch
    * query exactly. */
  def appendBatchEmbed(root: String, benchVecs: DataFrame,
      tau: Double = 0.4)(batch: DataFrame, batchId: Long): Unit =
    graft.operators.Similarity.embedDecontaminateOf(
        batch.withColumn("nrm",
          graft.functions.VectorFunctions.norm(col("embedding"))),
        benchVecs, tau)
      .write.mode("overwrite").parquet(s"$root/epoch=$batchId")

  /** Accumulated embedding-contamination flags across the epochs. */
  def readEmbedFlags(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)
      .select(col("vec_id"), col("max_cos"), col("contaminated"))
      .orderBy(col("vec_id"))

  /** Wire an embedding stream into the semantic ingest check. */
  def startEmbed(vecStream: DataFrame, dir: String, root: String,
      checkpoint: String, tau: Double = 0.4,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val benchVecs = graft.operators.Similarity
      .benchmarkVectors(vecStream.sparkSession, dir)
      .localCheckpoint(true, graft.ops.Pin.Level)
    vecStream.writeStream
      .foreachBatch(appendBatchEmbed(root, benchVecs) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** [[start]] with the bloom prefilter pinned at stream start. */
  def startBloom(docsStream: DataFrame, dir: String, root: String,
      checkpoint: String, minOverlap: Int = 8, fpp: Double = 0.01,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val evalShingles = CorpusOps
      .benchmarkShingles(docsStream.sparkSession, dir)
      .localCheckpoint(true, graft.ops.Pin.Level)
    val bloom = CorpusOps.buildEvalBloom(evalShingles, fpp)
    docsStream.writeStream
      .foreachBatch(appendBatchBloom(root, evalShingles, bloom, minOverlap) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }
}
