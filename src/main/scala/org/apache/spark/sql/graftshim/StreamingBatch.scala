package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one `private[sql]` door a V1 streaming `Source` has to use:
  * `MicroBatchExecution` asserts that `getBatch`'s DataFrame carries
  * `isStreaming = true`, and the only constructors that can set the
  * flag (`SparkSession.internalCreateDataFrame`, what Spark's own
  * `FileStreamSource` builds its batches with) are package-private to
  * `org.apache.spark.sql` — hence this shim lives under that package.
  * Nothing else in the repo reaches behind the public API.
  *
  * The batch plan is re-rooted on the source DataFrame's executed RDD
  * (`queryExecution.toRdd` — still lazy; nothing runs until the sink
  * does), so the streaming side sees one `LogicalRDD` leaf. The file
  * pruning that matters happened UPSTREAM when the change-feed plan
  * was built from the manifests; losing cross-boundary pushdown into
  * a diff that is already file-pruned is the accepted cost. */
object StreamingBatch {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse door, for a V1 streaming `Sink`: `addBatch` hands the
    * micro-batch as a STREAMING-flagged DataFrame rooted in the
    * `IncrementalExecution`, on which batch operators (joins,
    * aggregations — everything [[graft.streaming.MergeTable.merge]]
    * plans) refuse to run. Re-rooting the executed RDD as a plain
    * batch frame is exactly what Spark's own `ForeachBatchSink` does
    * before invoking the user function; the RDD stays lazy and
    * re-runnable (sources replay a batch deterministically from the
    * checkpointed offsets, which is the replay contract streaming
    * already lives by). */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
