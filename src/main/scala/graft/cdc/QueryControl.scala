package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Control-plane operators for streaming queries (SURVEY §2.A A16/A18/A20).
  *
  * The reference drives its replication task through a state machine:
  * describe → {ready,stopped} → start; running → no-op (+ reconcile);
  * anything else → raise
  * (`/root/reference/source/start_dms_replication_task_lambda/handler.py:76-95`).
  * On Spark the replication task is a StreamingQuery and the state machine
  * collapses onto `StreamingQueryManager`: start-iff-not-active, status
  * observation, synchronous await (the reference's poll loop A16 —
  * `load_s3_files_…/handler.py:24-45` — is just `awaitTermination` /
  * `processAllAvailable` here, since Spark actions are synchronous).
  */
object QueryControl {

  /** Idempotent start (A18): if a query with `name` is already active,
    * return it untouched; otherwise start a new one. A previously-failed
    * query is no longer active, so a restart starts fresh — its error is
    * surfaced through `StreamingQueryException` on the original handle's
    * await, as usual in Spark. */
  def startIfNotActive(spark: SparkSession, name: String)
      (start: => StreamingQuery): StreamingQuery = {
    spark.streams.active.find(_.name == name) match {
      case Some(active) => active
      case None => start
    }
  }

  /** Status report over all active queries (the reference's CloudWatch
    * print of task status, `handler.py:86-95`). */
  def status(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.streams.active.toSeq
      .map(q => (q.name, q.id.toString, q.isActive,
        Option(q.lastProgress).map(_.batchId).getOrElse(-1L)))
      .toDF("name", "id", "active", "last_batch")
  }

  /** Stop a named query if active (graceful task stop). */
  def stopIfActive(spark: SparkSession, name: String): Boolean =
    spark.streams.active.find(_.name == name) match {
      case Some(q) => q.stop(); true
      case None => false
    }
}
