package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key SCD2 state (top-level for the state-store encoder, like
  * [[KeyState]]): the open history row if any, the version counter, and
  * the last applied (us, eventName) watermark for out-of-order rejection. */
case class Scd2State(image: String, validFromUs: Long, version: Int,
    lastUs: Long, lastEventName: String, open: Boolean)

/** One maintained history row, identified by (key, version). A row is
  * emitted (as an upsert on that identity) every time its lifecycle
  * changes: once when the version opens, once more when a later change
  * closes it. `asofUs` is the change timestamp that produced this
  * snapshot — the sink's last-wins merge key. */
case class Scd2Row(key: String, version: Int, image: String,
    validFromUs: Long, validToUs: Option[Long], isCurrent: Boolean,
    asofUs: Long)

/** Type-2 slowly-changing-dimension maintenance from a CDC changelog —
  * the HISTORY-preserving rung between [[ChangelogApply]] (type 1:
  * last-wins, history discarded) and the batch `w_scd2` face.
  *
  * The reference lands its CDC stream in Redshift
  * (`/root/reference/load_s3_files_to_redshift_lambda/handler.py:74-112`)
  * where type-2 dimensions are THE canonical consumption pattern: every
  * MODIFY closes the key's open interval (`valid_to` = change time) and
  * opens a new one; a REMOVE closes without reopening, so the key keeps
  * its full lineage but no current row. The reference's own pipeline
  * cannot produce this — its stream is NEW_IMAGE-only upserts and its
  * warehouse writer truncate-reloads — which is exactly why the engine
  * carries it as an operator.
  *
  * Scale shape: state is one open row per live key (same O(live keys)
  * state-store footprint as [[ChangelogApply.applyStream]]); each
  * micro-batch emits ≤ 2 rows per version it touches (open + close),
  * reduced to the final snapshot per (key, version) BEFORE leaving the
  * executor, so the sink merge is keyed on (key, version) and never
  * rescans history — history files are append-mostly, the open-row
  * frontier is the only part ever rewritten.
  */
object Scd2Apply extends Serializable {

  /** Epoch MICROS — the batch face uses `unix_micros(ts)`, and
    * `getTime` alone truncates to milliseconds (the sub-ms digits live
    * in Timestamp.nanos): two events in the same millisecond would
    * collapse to one (us, eventName) slot and the later one be dropped
    * as a replay, silently diverging from the batch ground truth. */
  private def us(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** The per-key reduction: fold a batch of changes (sorted into the
    * same (ts, eventName) total order the batch face uses) through the
    * open-row state machine. Returns the new state and the FINAL
    * snapshot of every (key, version) the batch touched. */
  private[cdc] def reduceKeyScd2(key: String, batch: Iterator[ChangeEvent],
      prior: Option[Scd2State]): Option[(Scd2State, Seq[Scd2Row])] = {
    val ordered = batch.map { e =>
      if (!ChangeEvent.Known.contains(e.eventName))
        throw new IllegalArgumentException(s"Unexpected event_name: ${e.eventName}")
      e
    }.toSeq.sortBy(e => (us(e.ts), e.eventName))
    var st = prior.getOrElse(Scd2State("", 0L, 0, Long.MinValue, "", open = false))
    val touched = scala.collection.mutable.LinkedHashMap[Int, Scd2Row]()
    var changed = false
    ordered.foreach { e =>
      val eUs = us(e.ts)
      // strictly newer in the (us, eventName) order — a late replay of an
      // already-applied change must not fork history
      val newer = eUs > st.lastUs ||
        (eUs == st.lastUs && e.eventName > st.lastEventName)
      if (newer) {
        changed = true
        if (st.open)
          touched(st.version) = Scd2Row(key, st.version, st.image,
            st.validFromUs, Some(eUs), isCurrent = false, asofUs = eUs)
        if (ChangeEvent.Upserts.contains(e.eventName)) {
          val v = st.version + 1
          touched(v) = Scd2Row(key, v, e.newImage, eUs, None,
            isCurrent = true, asofUs = eUs)
          st = Scd2State(e.newImage, eUs, v, eUs, e.eventName, open = true)
        } else // REMOVE: close only (a REMOVE with no open row is a no-op
               // that still advances the watermark)
          st = Scd2State(st.image, st.validFromUs, st.version, eUs,
            e.eventName, open = false)
      }
    }
    if (changed) Some((st, touched.values.toSeq)) else None
  }

  /** Streaming SCD2: each micro-batch emits the final snapshot of every
    * history row it touched, as upserts identified by (key, version).
    * Feed a (key, version)-keyed merge sink ([[mergeHistoryParquet]] or
    * [[graft.streaming.MergeTable]]). */
  def applyStream(events: Dataset[ChangeEvent]): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    def update(key: String, batch: Iterator[ChangeEvent],
        state: GroupState[Scd2State]): Iterator[Scd2Row] =
      reduceKeyScd2(key, batch, state.getOption) match {
        case Some((st, rows)) => state.update(st); rows.iterator
        case None => Iterator.empty
      }
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Batch ground truth over a changelog of [[ChangeEvent]]s: the same
    * history the streaming face converges to, computed with window
    * functions in one pass (lead() closes intervals, a running count of
    * upserts numbers versions). One shuffle on the key. */
  def applyBatch(changelog: Dataset[ChangeEvent]): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("eventName"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ChangelogApply.validated(changelog.toDF())
      .withColumn("us", expr("unix_micros(ts)"))
      // the streaming watermark is STRICT in (us, eventName): an exact
      // at-least-once redelivery is dropped there, so the batch replay
      // must collapse it too — else the duplicate becomes a phantom
      // instantly-closed version and the two faces' histories diverge
      .dropDuplicates("key", "us", "eventName")
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .withColumn("version",
        sum(when(col("eventName") =!= ChangeEvent.Remove, 1L).otherwise(0L))
          .over(wRun))
      .filter(col("eventName") =!= ChangeEvent.Remove)
      .select(col("key"), col("version").cast("int").as("version"),
        col("newImage").as("image"), col("us").as("validFromUs"),
        col("valid_to_us").as("validToUs"),
        col("valid_to_us").isNull.as("isCurrent"))
      .orderBy(col("key"), col("version"))
  }

  /** Wire a changelog stream into a maintained parquet history table:
    * [[applyStream]] → (key, version)-keyed merge per micro-batch. The
    * merge is idempotent (last-wins on an identity the replayed batch
    * reproduces), so a restart replaying the in-flight batch converges. */
  def start(events: Dataset[ChangeEvent], tableDir: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    applyStream(events).toDF().writeStream
      .foreachBatch((b: DataFrame, _: Long) =>
        mergeHistoryParquet(b.sparkSession, b, tableDir))
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Merge a micro-batch of [[Scd2Row]] upserts into a parquet history
    * table: last-wins per (key, version) by (asofUs, closed-beats-open) —
    * a version's close always supersedes its open snapshot even when both
    * carry the same change timestamp. Same write-then-swap crash contract
    * as [[ChangelogApply.mergeIntoParquet]]. */
  def mergeHistoryParquet(spark: SparkSession, rows: DataFrame,
      tableDir: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(tableDir)
    // the TABLE's filesystem, not fs.defaultFS (object-store deployments)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tableDir + "__tmp")
    if (!fs.exists(dst) && fs.exists(tmp)) fs.rename(tmp, dst)
    val existing =
      if (fs.exists(dst)) Some(spark.read.parquet(tableDir)) else None
    val unioned = existing match {
      case Some(e) => e.select(rows.columns.map(col).toIndexedSeq: _*)
        .unionByName(rows)
      case None => rows
    }
    val w = Window.partitionBy(col("key"), col("version"))
      .orderBy(col("asofUs").desc, col("validToUs").isNull.asc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  // ---- t_scd2_apply: the declared, oracled batch face -----------------

  /** The SCD2 algebra as a one-shot batch query over the synthetic
    * changelog every CDC face shares (key = user_id, every 7th event_id a
    * REMOVE): per key, each upsert opens a version at its timestamp,
    * the NEXT change of any kind closes it, a trailing REMOVE leaves the
    * key with full lineage but no current row. The oracle derives the
    * same table independently with DuckDB window functions, so the hash
    * match gates interval closure, version numbering, and REMOVE
    * semantics at once. */
  def batchQuery(spark: SparkSession, dir: String): DataFrame = {
    val ch = graft.Tables.events(spark, dir).select(
      col("user_id").cast("string").as("key"),
      expr("ts_ns div 1000").as("us"), col("event_id"),
      col("event_type"), col("value"),
      (col("event_id") % 7 === 0).as("is_remove"))
    val w = Window.partitionBy(col("key")).orderBy(col("us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ch
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .withColumn("version",
        sum(when(col("is_remove"), 0L).otherwise(1L)).over(wRun))
      .filter(!col("is_remove"))
      .select(col("key"), col("version"), col("event_type"), col("value"),
        col("us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("key"), col("version"))
  }
}
