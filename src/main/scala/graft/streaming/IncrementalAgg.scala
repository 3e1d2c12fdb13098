package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of a MATERIALIZED AGGREGATE VIEW — classic
  * incremental view maintenance, specialized to the append-only case
  * every ingest pipeline actually is: per micro-batch, write the batch's
  * ALGEBRAIC partial aggregate (count / integer-cent sum / min / max per
  * group — each mergeable by construction); on read, fold the partial
  * relation with the same merge the map-side combiner uses.
  *
  * Why this shape at 100 TB: a dashboard aggregate rebuilt per refresh
  * scans the full corpus every time; here each batch pays work
  * proportional to the BATCH (one partial-agg, ≤|groups| rows written),
  * and a refresh reads |epochs|×|groups| partial rows — independent of
  * corpus row count. The same two-phase split Spark uses WITHIN one
  * aggregation (partial → final), applied ACROSS batches with the
  * intermediate state persisted. Min/max are mergeable but not
  * retractable — this face is append-only by contract (deletes need the
  * CDC changelog-apply path, `cdc/ChangelogApply`, which keeps full
  * rows precisely because it must retract).
  *
  * Exactly-once by epoch overwrite (the [[IncrementalIndex]] pattern):
  * a replayed batchId rewrites its own epoch partition rather than
  * double-counting — sums are safe under at-least-once delivery.
  * The reference recomputes its reconciliation aggregates by full
  * COUNT(*) rescan per task run
  * (`start_dms_replication_task_lambda/handler.py:27-73`); this face is
  * that aggregate kept fresh for the cost of each batch's delta.
  */
object IncrementalAgg {

  /** One micro-batch's algebraic partial: per event_type, row count,
    * exact integer-cent value sum, min and max. Everything here merges
    * associatively — the invariant the read-side fold depends on. */
  def partialOf(batch: DataFrame): DataFrame =
    batch.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(graft.functions.DetMath.cents(col("value"))).as("sum_cents"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))

  /** Append one batch's partial — idempotent per batchId (epoch
    * overwrite). */
  def appendBatch(root: String)(batch: DataFrame, batchId: Long): Unit =
    partialOf(batch)
      .write.mode("overwrite").parquet(s"$root/partials/epoch=$batchId")

  /** Wire an events stream into view maintenance. AvailableNow by
    * default: drain, checkpoint, stop. */
  def start(events: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .foreachBatch(appendBatch(root) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The maintained view: merge all epoch partials with the algebraic
    * merge (sum of counts, sum of cent-sums, min of mins, max of maxes).
    * Equals the whole-corpus batch aggregate after every batch
    * (IncrementalAggSpec) at |epochs|×|groups| read cost. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/partials").drop("epoch")
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("cnt"),
        (sum(col("sum_cents")).cast("double") / lit(100.0)).as("sum_value"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
      .orderBy(col("event_type"))

  /** The equivalent one-shot batch aggregate (the spec's ground truth
    * and the rebuild a refresh would otherwise pay). */
  def batchAggregate(events: DataFrame): DataFrame =
    partialOf(events)
      .select(col("event_type"), col("cnt"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_value"),
        col("min_v"), col("max_v"))
      .orderBy(col("event_type"))
}
