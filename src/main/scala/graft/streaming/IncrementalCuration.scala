package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{CorpusOps, Curation, Dedup}

/** Incremental maintenance of the CURATION DECISION
  * (x_curation_funnel's ingest face) — the capstone of the incremental
  * index family: each arriving micro-batch appends exactly the relations
  * its stages need, and the composed keep/first_fail decision is derived
  * on read, corpus-globally fresh.
  *
  * Per batch, three epoch-keyed appends (each exactly-once by epoch
  * overwrite, the [[IncrementalIndex]] pattern):
  *  - per-doc-PURE stage flags (lang, quality, repetition —
  *    [[Curation.perDocFlags]]): depend only on the document, append is
  *    exact;
  *  - substring-window occurrences ([[Dedup.windowOccurrencesOf]], the
  *    [[IncrementalSubstring]] relation): per-doc pure rows whose
  *    DERIVED dup flags are corpus-global;
  *  - contamination flags vs the benchmark set pinned at stream start
  *    ([[StreamingDecontaminate]]'s convention — the eval suite is known
  *    upfront, so the check is per-doc stateless).
  *
  * The property worth having at 100 TB: [[funnel]] equals the
  * whole-corpus batch decision after EVERY batch, and the decision
  * SHARPENS retroactively — when a near-copy of an old document arrives,
  * the OLD document's pass_substring_dup (and hence keep/first_fail)
  * flips on the next read with zero recomputation of its rows, because
  * the dup flag is an aggregate OF the maintained occurrence relation.
  * A batch-rebuilt funnel pays the full corpus scan per refresh; this
  * face pays per-batch work for the same, provably identical, decision
  * (IncrementalCurationSpec).
  */
object IncrementalCuration {

  /** Append one micro-batch's stage relations — idempotent per batchId.
    * Arriving benchmark-slice docs are dropped (they are the reference,
    * not training candidates) — the batch funnel's convention. */
  def appendBatch(root: String, evalShingles: DataFrame, w: Int = 10,
      minTokens: Int = 20, alphaPctMin: Int = 50, minOverlap: Int = 8)(
      batch: DataFrame, batchId: Long): Unit = {
    // one materialization feeds all three stage writes — without it the
    // batch source would be re-scanned per write
    val train = batch
      .filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0)
      .localCheckpoint(true, graft.ops.Pin.Level)
    Curation.perDocFlags(train, minTokens, alphaPctMin)
      .write.mode("overwrite").parquet(s"$root/flags/epoch=$batchId")
    Dedup.windowOccurrencesOf(train, w)
      .write.mode("overwrite").parquet(s"$root/occ/epoch=$batchId")
    CorpusOps.decontaminateOf(train, evalShingles, minOverlap)
      .write.mode("overwrite").parquet(s"$root/dec/epoch=$batchId")
  }

  /** Wire a documents stream into decision maintenance. The benchmark
    * shingle set is materialized here, once, before the first batch.
    * AvailableNow by default: drain, checkpoint, stop. */
  def start(docsStream: DataFrame, dir: String, root: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery = {
    val evalShingles = CorpusOps
      .benchmarkShingles(docsStream.sparkSession, dir)
      .localCheckpoint(true, graft.ops.Pin.Level)
    docsStream.writeStream
      .foreachBatch(appendBatch(root, evalShingles) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** The curation decision over every document seen so far — the same
    * compose as the batch funnel, with the corpus-global substring stage
    * derived fresh from the accumulated occurrence relation. */
  def funnel(spark: SparkSession, root: String,
      heavyPct: Int = 50): DataFrame =
    Curation.composeFlags(
      spark.read.parquet(s"$root/flags").drop("epoch"),
      Dedup.substringFlagsFrom(
          spark.read.parquet(s"$root/occ").drop("epoch"), heavyPct)
        .select(col("doc_id"), col("dup_heavy")),
      spark.read.parquet(s"$root/dec").drop("epoch")
        .select(col("doc_id"), col("contaminated")))
}
