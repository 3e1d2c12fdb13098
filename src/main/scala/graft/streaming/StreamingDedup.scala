package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}

/** One incoming document on the dedup wire: its id and the 16-hex-char
  * content fingerprint (computed upstream — the full text never needs to
  * reach the dedup operator, the same bytes-on-the-wire discipline as
  * the batch `x_fingerprint_dedup`). */
case class DedupIn(docId: Long, fp: String)

/** A first-seen verdict: `docId` is the canonical owner of `fp`. */
case class DedupFirst(fp: String, docId: Long)

/** STREAMING exact deduplication — the ingest-time face of
  * `x_exact_dedup`/`x_fingerprint_dedup`: as documents arrive, only the
  * FIRST occurrence of each content fingerprint survives; every later
  * copy (in the same micro-batch or any later one) is dropped at the
  * gate instead of being stored and re-deduped in batch. This is how a
  * continuously-crawled corpus stays deduplicated without periodic
  * full-corpus passes.
  *
  * Semantics contract: FIRST-ARRIVAL, not global-min. The winner of a
  * fingerprint is the minimum doc id WITHIN THE FIRST MICRO-BATCH that
  * carried it (deterministic per batch); a smaller id arriving in a
  * LATER batch is a duplicate by content and is dropped — the verdict
  * for a fingerprint is emitted exactly once and never revised. This
  * differs from replaying the whole prefix through the batch
  * `min(doc_id)` groupBy precisely when a later batch carries a smaller
  * id for an already-seen fingerprint (pinned by spec). First-arrival
  * is the honest streaming contract: an append-only sink cannot retract
  * a verdict, and for content dedup ANY single owner per fingerprint is
  * correct — batch reconciliation is on the fingerprint SET (identical
  * by construction), not the owner choice.
  *
  * Scale shape: state = one boolean per DISTINCT fingerprint, keyed and
  * partitioned by the 16-byte digest across the state store (RocksDB at
  * real scale — the same O(live keys) footprint argument as
  * [[graft.cdc.ChangelogApply]]); each micro-batch shuffles only its own
  * (digest, id) pairs. No watermark: content dedup state is
  * deliberately unbounded in TIME (a year-old duplicate is still a
  * duplicate) and bounded in SPACE by distinct content — the honest
  * floor for exact dedup. If business rules allow forgetting,
  * `GroupStateTimeout.ProcessingTimeTimeout` drops in without changing
  * the algebra.
  */
object StreamingDedup {

  /** First-seen filter: emits one [[DedupFirst]] per fingerprint, ever. */
  def firstSeen(docs: Dataset[DedupIn]): Dataset[DedupFirst] = {
    import docs.sparkSession.implicits._
    def update(fp: String, batch: Iterator[DedupIn],
        state: GroupState[Boolean]): Iterator[DedupFirst] =
      if (state.exists) Iterator.empty
      else {
        state.update(true)
        Iterator.single(DedupFirst(fp, batch.map(_.docId).min))
      }
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Wire a document stream into an append-only parquet table of
    * first-seen owners (idempotent per batch id via the shared
    * epoch-keyed appender). */
  def start(docs: Dataset[DedupIn], root: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    firstSeen(docs).toDF()
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        Compaction.appendBatch(b, root, id))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The accumulated survivor table. */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, root)).drop("batch")
}
