package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming window operators (SURVEY §2.B group T: t_tumbling_count,
  * t_sliding_session, t_late_data).
  *
  * Grounding: the reference's two cadences — the 5-minute EventBridge
  * micro-batch (`/root/reference/cdk_infrastructure/__init__.py:492-497`)
  * and the 5-second/100-record stream batching window (`__init__.py:355-356`)
  * — generalized to proper event-time windows with watermarks (the
  * reference assumes in-order delivery and has no late-data story;
  * `t_late_data` makes the policy explicit).
  *
  * All three take a *streaming or batch* DataFrame with an event-time
  * column — the same plan serves `readStream` (incremental, stateful) and
  * batch backfill, which is exactly how Structured Streaming is meant to
  * be used. State scale: windowed aggregation state is
  * O(open windows × groups), bounded by the watermark horizon.
  */
object WindowedStreams {

  /** Tumbling-window counts per event type (the 5-minute cadence shape). */
  def tumblingCounts(events: DataFrame, tsCol: String = "ts",
      width: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Sliding-window counts (the stream-batching window generalized). */
  def slidingCounts(events: DataFrame, tsCol: String = "ts",
      width: String = "10 minutes", slide: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("cnt"))

  /** t_tumbling_batch — the tumbling aggregation as a driver-verifiable
    * BATCH query (same `window()` operator the streaming form uses; the
    * oracle checks the bucketing arithmetic). Output carries epoch
    * seconds (BIGINT) instead of raw timestamps for cross-engine hashing. */
  def tumblingCountsBatch(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.DetMath.sumMoney(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("win_start_s"), col("event_type"))

  /** Session windows per user: activity bursts separated by `gap`. */
  def sessionCounts(events: DataFrame, tsCol: String = "ts",
      gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("cnt"))
}
