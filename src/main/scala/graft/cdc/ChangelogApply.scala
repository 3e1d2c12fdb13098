package graft.cdc

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key streaming state (top-level: nested classes break the codegen'd
  * state-store encoder). Carries eventName so the stream tie-break matches
  * applyBatch's (ts, eventName) total order exactly. */
case class KeyState(newImage: String, ts: java.sql.Timestamp,
    eventName: String, removed: Boolean)

/** The `transformWithState` stateful processor behind
  * [[ChangelogApply.applyStreamTws]] (top-level for the same encoder
  * reason as [[KeyState]]). One ValueState[KeyState] per key — the v2
  * state store keeps it off-heap (RocksDB) with a per-variable schema. */
class ChangelogProcessor(dropRemove: Boolean)
    extends StatefulProcessor[String, ChangeEvent, ChangelogApply.Upsert] {
  @transient private var state: ValueState[KeyState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState("changelog_state",
      Encoders.product[KeyState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ChangeEvent],
      timerValues: TimerValues): Iterator[ChangelogApply.Upsert] =
    ChangelogApply.reduceKeyBatch(dropRemove, key, rows,
      if (state.exists()) Some(state.get()) else None) match {
      case Some((st, up)) => state.update(st); Iterator.single(up)
      case None => Iterator.empty
    }
}

/** Changelog application — the core CDC operator (SURVEY §2.B group T,
  * `t_changelog_apply`): turn a stream/batch of change envelopes into a
  * materialized keyed table.
  *
  * Two modes, both grounded in the reference:
  *  - [[Mode.DropRemove]] — reference-faithful: REMOVE events never reach
  *    the warehouse (`/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:31-32`,
  *    divergence documented `/root/reference/README.md:30`), so a deleted
  *    key keeps its last pre-delete image.
  *  - [[Mode.ApplyRemove]] — the corrected semantics: a REMOVE that is the
  *    key's latest event deletes the key.
  *
  * Scale: batch apply is one shuffle on the key (window dedup — exactly
  * the reference's `put_item` last-write-wins, A5). Streaming apply keeps
  * per-key state in the state store via `flatMapGroupsWithState` — state
  * size is O(live keys), partitioned across executors, no driver state.
  */
object ChangelogApply extends Serializable {

  sealed trait Mode
  object Mode {
    case object DropRemove extends Mode
    case object ApplyRemove extends Mode
  }

  /** Validate envelopes: unknown event names are a hard, distributed
    * error (reference raises at `handler.py:33-37`). */
  def validated(events: DataFrame): DataFrame =
    events.filter(
      when(col("eventName").isin(ChangeEvent.Known: _*), lit(true))
        .otherwise(raise_error(concat(
          lit("Unexpected event_name: "), col("eventName")))))

  /** Batch apply: latest image per key (ties broken by a total order on
    * (ts, eventName) — deterministic even if a key has equal timestamps). */
  def applyBatch(events: DataFrame, mode: Mode): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("eventName").desc)
    val base = mode match {
      case Mode.DropRemove =>
        validated(events).filter(col("eventName").isin(ChangeEvent.Upserts: _*))
      case Mode.ApplyRemove => validated(events)
    }
    val latest = base
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
    val applied = mode match {
      case Mode.DropRemove  => latest
      case Mode.ApplyRemove => latest.filter(col("eventName") =!= ChangeEvent.Remove)
    }
    applied.select(col("key"), col("newImage"), col("ts"))
  }

  /** Output row: the key's current materialized image (None = deleted). */
  case class Upsert(key: String, newImage: Option[String], ts: java.sql.Timestamp)

  /** The per-key micro-batch reduction both streaming engines share:
    * validate, reduce the batch last-wins, compare against prior state on
    * the same (ts, eventName) total order applyBatch uses. Returns the new
    * state and the upsert to emit, or None when the batch changes nothing. */
  private[cdc] def reduceKeyBatch(dropRemove: Boolean, key: String,
      batch: Iterator[ChangeEvent],
      prior: Option[KeyState]): Option[(KeyState, Upsert)] = {
    val relevant = batch.filter(e =>
      if (ChangeEvent.Known.contains(e.eventName)) true
      else throw new IllegalArgumentException(s"Unexpected event_name: ${e.eventName}"))
      .filter(e => !dropRemove || ChangeEvent.Upserts.contains(e.eventName))
      .toSeq
    if (relevant.isEmpty) None
    else {
      val last = relevant.maxBy(e => (e.ts.getTime, e.eventName))
      // same total order as applyBatch: (ts, eventName) — an equal-ts
      // event wins only if its eventName sorts at or above the stored one
      val newer = prior.forall(p =>
        last.ts.getTime > p.ts.getTime ||
          (last.ts.getTime == p.ts.getTime && last.eventName >= p.eventName))
      if (!newer) None
      else {
        val removed = !dropRemove && last.eventName == ChangeEvent.Remove
        Some((KeyState(last.newImage, last.ts, last.eventName, removed),
          Upsert(key, if (removed) None else Some(last.newImage), last.ts)))
      }
    }
  }

  /** Streaming apply: emits the updated image of each key touched in a
    * micro-batch (an upsert changelog the sink can merge). State store
    * keyed by `key`; within a batch events are reduced last-wins before
    * touching state, so state updates are O(distinct keys per batch). */
  def applyStream(events: Dataset[ChangeEvent], mode: Mode): Dataset[Upsert] = {
    import events.sparkSession.implicits._
    val dropRemove = mode == Mode.DropRemove

    def update(key: String, batch: Iterator[ChangeEvent],
        state: GroupState[KeyState]): Iterator[Upsert] =
      reduceKeyBatch(dropRemove, key, batch, state.getOption) match {
        case Some((st, up)) => state.update(st); Iterator.single(up)
        case None => Iterator.empty
      }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** A retraction-aware change: the key's materialized image BEFORE and
    * AFTER a micro-batch (None = absent/deleted on that side). This is
    * the changelog shape incremental VIEW maintenance needs: a MODIFY
    * must retract the old image's contribution and add the new one's,
    * and a REMOVE must retract — information the plain [[Upsert]] (after
    * image only, like the reference's NEW_IMAGE-only stream,
    * `cdk_infrastructure/__init__.py:290`) cannot carry. The keyed state
    * store already holds the before image; this face surfaces it. */
  case class Delta(key: String, before: Option[String],
      after: Option[String], ts: java.sql.Timestamp)

  /** [[applyStream]] with retraction information: same [[reduceKeyBatch]]
    * core and state schema, but each emitted change carries the key's
    * prior materialized image alongside the new one. Feeds
    * [[graft.streaming.IncrementalAggCdc]]. */
  def applyStreamDelta(events: Dataset[ChangeEvent],
      mode: Mode): Dataset[Delta] = {
    import events.sparkSession.implicits._
    val dropRemove = mode == Mode.DropRemove

    def update(key: String, batch: Iterator[ChangeEvent],
        state: GroupState[KeyState]): Iterator[Delta] = {
      val prior = state.getOption
      reduceKeyBatch(dropRemove, key, batch, prior) match {
        case Some((st, up)) =>
          val before = prior.filterNot(_.removed).map(_.newImage)
          state.update(st)
          Iterator.single(Delta(key, before, up.newImage, up.ts))
        case None => Iterator.empty
      }
    }

    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  /** Streaming apply on the Spark 4 arbitrary-state API
    * (`transformWithState` + [[ChangelogProcessor]]): byte-identical
    * semantics to [[applyStream]] (same [[reduceKeyBatch]] core), but on
    * the state-store v2 path — RocksDB provider, per-state-variable
    * schemas, optional TTL — which is where streaming state is headed at
    * 100 TB (state larger than executor heap lives off-heap in RocksDB
    * with changelog checkpointing). Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * `…state.RocksDBStateStoreProvider`. */
  def applyStreamTws(events: Dataset[ChangeEvent], mode: Mode): Dataset[Upsert] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new ChangelogProcessor(mode == Mode.DropRemove),
        TimeMode.None(), OutputMode.Append())
  }

  /** Merge an upsert-changelog micro-batch into a parquet warehouse table
    * (directory). Parquet is immutable, so merge = read ∪ new → last-wins
    * → atomic-ish rewrite; at warehouse scale this is the compaction path
    * of a proper table format, the semantics are identical. Used from
    * `foreachBatch`. */
  def mergeIntoParquet(spark: SparkSession, upserts: DataFrame,
      tableDir: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(tableDir)
    // the TABLE's filesystem, not fs.defaultFS — the two differ on any
    // object-store deployment (hdfs default, s3a table)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tableDir + "__tmp")
    // crash recovery: a previous run that died between delete and rename
    // left the merged table only in __tmp — finish its swap first
    if (!fs.exists(dst) && fs.exists(tmp)) fs.rename(tmp, dst)
    // absence is decided by an explicit existence check — a TRANSIENT
    // read error must propagate, not silently erase the table by
    // being mistaken for "first merge"
    val existing =
      if (fs.exists(dst)) Some(spark.read.parquet(tableDir)) else None
    val unioned = existing match {
      case Some(e) => e.select(upserts.columns.map(col).toIndexedSeq: _*)
        .unionByName(upserts)
      case None => upserts
    }
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("newImage").isNotNull)
      .drop("rn")
    // write-then-swap keeps readers consistent on failure mid-write
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }
}
