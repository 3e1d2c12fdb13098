package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.DataType

/** The full reference pipeline, lake edition: a live Debezium changelog
  * stream (binlog analog — [[graft.sources.TcpChangelog]] or any source
  * yielding `(offset, value)` envelope rows) applied to a
  * copy-on-write [[MergeTable]] via exactly-once micro-batch MERGEs.
  *
  * The reference materializes its change stream into Redshift by
  * reloading staged files (`load_s3_files_to_redshift_lambda/
  * handler.py:74-112`); here each micro-batch becomes ONE atomic MERGE
  * commit whose cost is the batch's touch set, and the idempotence that
  * the reference gets from `COPY`-once file tracking comes from the
  * batch id recorded inside the atomically-published manifest
  * ([[MergeTable.mergeExactlyOnce]]): Structured Streaming re-delivers
  * the last batch after a restart, the table refuses the replay, and
  * end-to-end exactly-once holds over a plain TCP wire.
  */
object MergeStream {

  /** Decode a Debezium-envelope micro-batch into [[MergeTable.merge]]'s
    * change shape: `op` ('u' for c/r/u — MergeTable upserts both —
    * 'd' for deletes), `seq` = the source's log offset (the binlog
    * position: a TOTAL order over the wire, unlike ts_ms which can
    * tie), and the typed payload columns extracted from the after/
    * before image. */
  def debeziumToChanges(batch: DataFrame,
      fields: Seq[(String, DataType)]): DataFrame = {
    // the SHARED envelope probe (DebeziumEnvelope.envelopeField) — the
    // two decoders must never drift on envelope handling
    def j(path: String) = graft.cdc.DebeziumEnvelope.envelopeField("value", path)
    val op = j("op")
    val img = coalesce(j("after"), j("before"))
    // Kafka log-compaction tombstones are NULL-VALUE records a standard
    // Debezium producer emits after every delete (the 'd' event already
    // carried the payload); they are topic hygiene, not changes — drop
    // them BEFORE decoding, keeping raise_error for records that have a
    // payload but an unknown op
    batch.filter(col("value").isNotNull).select(
      // STRICT op contract, same as DebeziumEnvelope.decode: an unknown
      // op or a tombstone (op null) must fail loudly, not silently
      // upsert an all-null row into the table
      when(op === "d", lit("d"))
        .when(op.isin("c", "r", "u"), lit("u"))
        .otherwise(raise_error(concat(
          lit("Unexpected Debezium op: "), coalesce(op, lit("<missing>")))))
        .as("op") +:
        col("offset").as("seq") +:
        fields.map { case (name, dt) =>
          get_json_object(img, s"$$.$name").cast(dt).as(name)
        }: _*)
  }

  /** Wire a changelog stream into `root` as exactly-once MERGE commits.
    * One merge (= one table generation) per non-empty micro-batch.
    * `mor = true` applies batches through the merge-on-read path
    * ([[MergeTable.mergeMorExactlyOnce]] — positional DVs + appends,
    * zero rewrites per batch): the right sink shape for delete-heavy
    * CDC, with [[MergeTable.compact]] folding the DVs on the
    * maintenance cadence instead of on every batch. */
  def intoTable(stream: DataFrame, root: String, key: String,
      fields: Seq[(String, DataType)], checkpoint: String,
      triggerMs: Long = 100L, mor: Boolean = false): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // emptiness on the RAW rows: the decode is row-preserving, and
        // testing the decoded frame would run the whole JSON decode as
        // a separate job every trigger just to count to zero
        if (!batch.isEmpty) {
          val changes = debeziumToChanges(batch, fields)
          if (mor) MergeTable.mergeMorExactlyOnce(batch.sparkSession, root,
            changes, key, batchId)
          else MergeTable.mergeExactlyOnce(batch.sparkSession, root, changes,
            key, batchId)
          ()
        }
      }
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()

  /** [[intoTable]] for the MANY-PIPELINES-ONE-TABLE shape: each stream
    * commits through the optimistic protocol
    * ([[MergeTable.mergeOccExactlyOnce]]) under its own `streamId`
    * replay fence, so N independent changelog streams (per-source CDC
    * pipelines) merge into one table concurrently — disjoint batches
    * arbitrate as metadata-only rebases, true conflicts replay, and a
    * restart-replay of any one stream is refused no matter how many
    * commits the others landed in between. The reference serializes
    * this shape behind one Step Function; the optimistic sink removes
    * the serialization without giving up exactly-once. */
  def intoTableOcc(stream: DataFrame, root: String, key: String,
      fields: Seq[(String, DataType)], checkpoint: String,
      streamId: String, triggerMs: Long = 100L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { // raw-row emptiness: see intoTable
          MergeTable.mergeOccExactlyOnce(batch.sparkSession, root,
            debeziumToChanges(batch, fields), key, streamId, batchId)
          ()
        }
      }
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()

  /** One gated micro-batch: stage → audit → publish-or-dead-letter.
    * Factored out of [[intoTableGated]] so the replay contract is
    * directly testable. Idempotence: a replayed PUBLISHED batch is
    * refused from the committed manifest's batch id (as in
    * [[MergeTable.mergeExactlyOnce]]); a replayed REJECTED batch
    * re-stages, re-fails the same deterministic audit, and OVERWRITES
    * its own dead-letter directory — same end state either way. A
    * crash between stage and publish leaves an uncommitted orphan the
    * sweep collects; the replay simply stages afresh. */
  def applyGatedBatch(root: String, key: String,
      fields: Seq[(String, DataType)], audit: DataFrame => Boolean,
      rejectsDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (!batch.isEmpty && // raw-row emptiness: see intoTable
      !MergeTable.appliedBatchId(spark, root).exists(_ >= batchId)) {
      val changes = debeziumToChanges(batch, fields)
      val g = MergeTable.stageMerge(spark, root, changes, key,
        batchId = Some(batchId))
      if (audit(MergeTable.readStaged(spark, root, g)))
        MergeTable.publishStaged(spark, root, g)
      else {
        MergeTable.discardStaged(spark, root, g)
        changes.write.mode("overwrite").parquet(s"$rejectsDir/batch=$batchId")
      }
    }
  }

  /** Re-admit a corrected DEAD-LETTER batch: read the decoded changes
    * the gate rejected (`rejectsDir/batch=<batchId>`), apply the
    * caller's `fix`, and push the result back through the SAME
    * stage-audit-publish gate — the ops loop WAP implies (bad data is
    * quarantined, repaired upstream or by transform, re-admitted under
    * scrutiny, never force-committed). Returns true iff the fixed
    * batch passed the audit and published. A fix that doesn't actually
    * fix is re-refused and the staged attempt discarded — re-admission
    * grants no bypass. */
  def replayReject(root: String, key: String, rejectsDir: String,
      batchId: Long, audit: DataFrame => Boolean)(
      fix: DataFrame => DataFrame)(implicit spark: SparkSession): Boolean = {
    val changes = fix(spark.read.parquet(s"$rejectsDir/batch=$batchId"))
    val g = MergeTable.stageMerge(spark, root, changes, key)
    if (audit(MergeTable.readStaged(spark, root, g))) {
      MergeTable.publishStaged(spark, root, g); true
    } else {
      MergeTable.discardStaged(spark, root, g); false
    }
  }

  /** [[intoTable]] with a WRITE-AUDIT-PUBLISH gate per micro-batch —
    * the streaming data-quality gate: every batch is staged as an
    * uncommitted generation ([[MergeTable.stageMerge]]), the `audit`
    * predicate inspects the WOULD-BE table state (not just the batch —
    * cross-row invariants like key uniqueness or non-negative balances
    * are checkable against the full staged relation at zero extra
    * copies), and only a passing batch is atomically published. A
    * failing batch is discarded and its decoded changes land in
    * `rejectsDir/batch=<id>` — the dead-letter queue, idempotent by
    * batch directory overwrite. Readers never observe a bad batch, not
    * even transiently: the gate happens BEFORE visibility, which is the
    * entire point of WAP over validate-after-commit + rollback.
    * `audit` must be deterministic (a replayed batch must re-decide the
    * same way). */
  def intoTableGated(stream: DataFrame, root: String, key: String,
      fields: Seq[(String, DataType)], checkpoint: String,
      audit: DataFrame => Boolean, rejectsDir: String,
      triggerMs: Long = 100L): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(applyGatedBatch(root, key, fields, audit, rejectsDir) _)
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()
}
