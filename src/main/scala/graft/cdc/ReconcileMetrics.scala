package graft.cdc

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Reconciliation observability (operator A19 as metrics): the reference
  * surfaces source/target row counts to CloudWatch on every replication
  * tick (`/root/reference/README.md:14`,
  * `source/start_dms_replication_task_lambda/handler.py:27-73`). On Spark
  * the tick is a completed micro-batch, the metrics bus is
  * [[StreamingQueryListener]], and the counts are [[Reconcile.counts]] —
  * this listener re-runs the two-sided count after each progress event of
  * the watched query and publishes one [[ReconcileMetrics.Tick]].
  *
  * Scale note: the reconciliation itself is two O(1)-output count
  * aggregations (no data shipped beyond partial counts), so running it
  * per tick is cheap even over a 100 TB table — the scan parallelizes and
  * only counters move. The publish callback runs on the listener thread,
  * off the streaming hot path.
  */
object ReconcileMetrics {

  /** One reconciliation observation (the CloudWatch datapoint analog). */
  case class Tick(queryName: String, batchId: Long,
      sourceCount: Long, targetCount: Long, lag: Long, inSync: Boolean)

  /** Listener publishing a [[Tick]] after every completed micro-batch of
    * the query named `queryName`. `source`/`target` are re-evaluated per
    * tick (they must re-read their storage, not cache a stale frame). */
  class Listener(queryName: String,
      source: () => DataFrame, target: () => DataFrame,
      publish: Tick => Unit) extends StreamingQueryListener {

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (e.progress.name == queryName) {
        // never let an exception hit the shared listener bus (it would be
        // swallowed there and the tick silently lost) — a failed count
        // (e.g. target storage not created yet on the first batch) is
        // reported, and the next tick retries from scratch
        try {
          val row = Reconcile.counts(source(), target()).head()
          publish(Tick(queryName, e.progress.batchId,
            row.getAs[Long]("source_count"), row.getAs[Long]("target_count"),
            row.getAs[Long]("lag"), row.getAs[Boolean]("in_sync")))
        } catch {
          case t: Throwable =>
            System.err.println(
              s"[reconcile-metrics] tick for $queryName batch ${e.progress.batchId} failed: $t")
        }
      }

    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** A publish target that just records ticks (tests, ad-hoc ops); a real
    * deployment points `publish` at its metrics system instead. */
  class Recorder {
    val ticks = new CopyOnWriteArrayList[Tick]()
    def publish(t: Tick): Unit = ticks.add(t)
    def all: Seq[Tick] = {
      import scala.jdk.CollectionConverters._
      ticks.asScala.toSeq
    }
  }
}
