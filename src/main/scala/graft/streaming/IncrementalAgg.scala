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
  * The partial relation rides the SHARED appender machinery
  * ([[Compaction.appendBatch]] into the [[Snapshots]]-resolved tree):
  * exactly-once by batch-dir overwrite, append debt observable by the
  * same [[Compaction.appendDebt]] metric, and [[compact]] folds all
  * accumulated partials into ONE partial row-set per group through the
  * atomic generation publish — replay-safe because foreachBatch only
  * replays batch ids the checkpoint has not committed, and every folded
  * id is committed (the [[Compaction]] contract). Register with
  * [[Compaction.Maintenance]] to sweep it on the shared cadence.
  *
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

  /** The partial-merge: same shape in, same shape out — [[read]] folds
    * through it once; [[compact]] persists its result as the new base. */
  private def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Append one batch's partial — idempotent per batchId (batch-dir
    * overwrite into the resolved snapshot tree). */
  def appendBatch(root: String)(batch: DataFrame, batchId: Long): Unit =
    Compaction.appendBatch(partialOf(batch), root, batchId)

  /** Wire an events stream into view maintenance. AvailableNow by
    * default: drain, checkpoint, stop. */
  def start(events: DataFrame, root: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .foreachBatch(appendBatch(root) _)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The raw partial relation (all accumulated epochs). */
  def partials(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(Snapshots.resolve(spark, root)).drop("batch")

  /** The maintained view: fold the partial relation with the algebraic
    * merge. Equals the whole-corpus batch aggregate after every batch
    * (IncrementalAggSpec) at |epochs|×|groups| read cost. */
  def read(spark: SparkSession, root: String): DataFrame =
    mergePartials(partials(spark, root))
      .select(col("event_type"), col("cnt"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_value"),
        col("min_v"), col("max_v"))
      .orderBy(col("event_type"))

  /** Fold every accumulated partial into one |groups|-row base partial
    * published as a fresh committed generation — the view's compaction
    * (refresh cost drops back to |groups| rows read). Safe between
    * drains, like every appender compaction. */
  def compact(spark: SparkSession, root: String): Unit =
    Compaction.compact(spark, root) { (df, out) =>
      mergePartials(df).coalesce(1).write.mode("overwrite").parquet(out)
    }

  /** The equivalent one-shot batch aggregate (the spec's ground truth
    * and the rebuild a refresh would otherwise pay). */
  def batchAggregate(events: DataFrame): DataFrame =
    partialOf(events)
      .select(col("event_type"), col("cnt"),
        (col("sum_cents").cast("double") / lit(100.0)).as("sum_value"),
        col("min_v"), col("max_v"))
      .orderBy(col("event_type"))
}
