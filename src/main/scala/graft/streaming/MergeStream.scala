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
    def j(path: String) = coalesce(
      get_json_object(col("value"), s"$$.payload.$path"),
      get_json_object(col("value"), s"$$.$path"))
    val op = j("op")
    val img = coalesce(j("after"), j("before"))
    batch.select(
      when(op === "d", lit("d")).otherwise(lit("u")).as("op") +:
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
        val changes = debeziumToChanges(batch, fields)
        if (!changes.isEmpty) {
          if (mor) MergeTable.mergeMorExactlyOnce(batch.sparkSession, root,
            changes, key, batchId)
          else MergeTable.mergeExactlyOnce(batch.sparkSession, root, changes,
            key, batchId)
          ()
        }
      }
      .trigger(Trigger.ProcessingTime(s"$triggerMs milliseconds"))
      .start()
}
