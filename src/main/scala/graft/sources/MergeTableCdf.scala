package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.streaming.{MergeTable, Snapshots}

/** `merge-cdf` — the lake table's CHANGE DATA FEED as a Structured
  * Streaming source: `spark.readStream.format("merge-cdf")
  * .option("path", root).load()` serves every committed generation's
  * [[graft.streaming.MergeTable.changesBetween]] diff as a micro-batch,
  * so downstream incremental consumers are idiomatic Spark streams
  * (watermarks, stateful ops, exactly-once sinks) instead of bespoke
  * [[graft.streaming.ChangeFeed.drain]] wiring. This is Delta's
  * `readChangeFeed` surface re-expressed over the manifest diff.
  *
  * Why the V1 `Source` API and not a DSv2 `MicroBatchStream`: a window
  * of the feed is a DISTRIBUTED DataFrame (changed-file scans + DV-delta
  * anti-joins, planned from manifests). V1 `getBatch` RETURNS a
  * DataFrame — the data stays on executors under the plan the feed
  * built, exactly like Spark's own `FileStreamSource`. A DSv2
  * `PartitionReader` would have to funnel those rows through
  * driver-planned partitions of its own, re-implementing the parquet
  * scan ([[graft.streaming.ChangeFeed]] documents the same trade for
  * the cursor face; this source is the `readStream` face over the same
  * diff machinery).
  *
  * Contract:
  *   - offsets are COMMITTED GENERATION ids ([[LongOffset]]), the
  *     table's own replayable epochs, persisted in the stream's
  *     checkpoint WAL — a restart replays the last uncommitted window
  *     byte-identically ([[graft.streaming.MergeTable.changesBetween]]
  *     is deterministic for retained generations);
  *   - the first window of a fresh checkpoint is the BACKFILL (the
  *     whole state-at-latest as inserts, i.e. `changesBetween(0, g)`),
  *     unless `startGen` says to begin the diff at a known generation;
  *   - retention is the replay budget: a checkpoint older than
  *     [[graft.streaming.MergeTable.sweep]]'s floor fails LOUDLY at
  *     `resolveAt` (the stream surfaces the error naming the available
  *     generations) instead of silently skipping the gap — the same
  *     contract a binlog/Kafka consumer lives with.
  *
  * Schema evolution note: the source's schema is fixed at stream start
  * (the analyzed plan's shape cannot change mid-query — Spark's own
  * rule); a generation that evolved the table's schema feeds columns
  * the stream predates as nulls once restarted, and NEW columns require
  * a stream restart to appear, same as Delta's CDF. The analysis-time
  * schema pin is keyed by the `.load()`'s OWN options-map instance
  * (Spark hands the same instance to both provider calls), so several
  * streams on one table may start in ANY order across an ALTER-COLUMNS
  * commit — each claims exactly its own analysis shape — and a
  * `.load()` that is never `.start()`-ed perturbs nothing (its pin is
  * weakly held and ages out; spec-pinned in MergeTableCdfSpec). */
class MergeTableCdf extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "merge-cdf"

  private def rootOf(spark: SparkSession,
      parameters: Map[String, String]): String =
    MergeTableCdf.resolveRoot("merge-cdf", spark, parameters)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "merge-cdf: the schema comes from the table's recorded #schema " +
        "— don't pass one")
    val root = rootOf(sqlContext.sparkSession, parameters)
    val s = MergeTableCdf.feedSchema(sqlContext.sparkSession, root)
    // pin the ANALYSIS-time shape for createSource, keyed by THIS
    // .load()'s options-map instance (see pinnedSchema)
    MergeTableCdf.pinSchema(parameters, s)
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val root = rootOf(sqlContext.sparkSession, parameters)
    val startGen = parameters.get("startGen").map(_.toLong).getOrElse(0L)
    require(startGen >= 0L, s"merge-cdf: startGen must be ≥ 0: $startGen")
    // a startGen beyond the table would make getOffset() None forever —
    // a silently idle stream where every other misuse here refuses
    // loudly. startGen == latest is legal (consume FUTURE commits only).
    val latest = Snapshots.generations(sqlContext.sparkSession, root)
      .maxOption.getOrElse(0L)
    require(startGen <= latest,
      s"merge-cdf: startGen $startGen is beyond the latest committed " +
        s"generation $latest under $root")
    val paired = parameters.get("pairUpdates").exists(_.toBoolean)
    val pinned = MergeTableCdf.takePinned(parameters)
    // instance-reuse breadcrumb (r17 advice): the pin relies on Spark's
    // DataSource passing the SAME caseInsensitiveOptions instance to
    // sourceSchema and createSource — internal behavior, not API. A
    // miss here is legal on a handle RE-start, but if a Spark upgrade
    // stops reusing the instance it fires on EVERY first start — the
    // warning names the regression scope before the width assert would
    // (loudly) kill a stream straddling an evolution commit.
    if (pinned.isEmpty) MergeTableCdf.log.warn(
      "merge-cdf: no analysis-time schema pin for this start (re-start " +
        "of an already-started handle, or the Spark runtime no longer " +
        "reuses the options instance between sourceSchema and " +
        "createSource) — falling back to fresh schema derivation; an " +
        "evolution commit between .load() and .start() would then fail " +
        "the width assert instead of serving the analyzed shape")
    new MergeTableCdfSource(sqlContext.sparkSession, root, startGen,
      pinned, paired)
  }
}

object MergeTableCdf {
  /** The schemas handed out at ANALYSIS time (sourceSchema) —
    * createSource must serve exactly that shape: Spark instantiates
    * SEPARATE provider instances for the two calls, and re-deriving
    * from the now-latest generation would race an evolution commit
    * landing between `.load()` and `.start()` (the analyzed plan
    * expects S, every batch would carry S+new → MicroBatchExecution's
    * opaque width assert kills the query on batch one; the contract is
    * "new columns appear after a restart").
    *
    * Keyed by the IDENTITY of the options map (round 17; previously a
    * per-root FIFO whose documented residual this removes): Spark's
    * `DataSource` passes the SAME `caseInsensitiveOptions` instance to
    * `sourceSchema` (inside its lazy `sourceInfo`) and to
    * `createSource`, and every `.load()` mints a fresh `DataSource` —
    * so the map instance is precisely "this `.load()`", the
    * per-invocation token the FIFO could not express. Consequences:
    * two `.load()`s straddling an evolution commit each claim their
    * OWN analysis shape in ANY start order, and an abandoned `.load()`
    * (never started) cannot shift a later stream's pairing — its pin
    * just ages out (weak key; purged on later pins). A take with no
    * pin (a re-start of an already-started handle, or a runtime that
    * stopped passing the same instance) falls back to a fresh
    * derivation, identical to the pin unless an evolution committed in
    * between — and then the width assert kills loudly, never
    * silently. */
  private final class IdentityBox(o: AnyRef) {
    private val ref = new java.lang.ref.WeakReference[AnyRef](o)
    private val hash = System.identityHashCode(o)
    private[MergeTableCdf] def cleared: Boolean = ref.get() == null
    override def hashCode(): Int = hash
    override def equals(other: Any): Boolean = other match {
      case b: IdentityBox =>
        val a = ref.get()
        a != null && (a eq b.ref.get())
      case _ => false
    }
  }

  private[sources] val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  private val pinnedSchema =
    new java.util.concurrent.ConcurrentHashMap[IdentityBox, StructType]()

  private[sources] def pinSchema(token: AnyRef, s: StructType): Unit = {
    // purge pins whose .load() handle was garbage-collected (abandoned
    // loads) — the map stays bounded by LIVE handles
    pinnedSchema.keySet().removeIf(_.cleared)
    pinnedSchema.put(new IdentityBox(token), s)
  }

  private[sources] def takePinned(token: AnyRef): Option[StructType] =
    Option(pinnedSchema.remove(new IdentityBox(token)))

  /** Shared root resolution for the lake's streaming endpoints:
    * `.option("path", <root>)` addresses a directory directly;
    * `.option("table", <name>)` resolves a REGISTERED bare name
    * (`registerMerge` / `CREATE TABLE ... USING graft`), so stream
    * wiring names tables the way SQL does instead of repeating paths. */
  private[sources] def resolveRoot(what: String, spark: SparkSession,
      parameters: Map[String, String]): String =
    parameters.get("path").orElse(parameters.get("root"))
      .orElse(parameters.get("table").map { t =>
        graft.plans.SnapshotSqlCatalog.mergeRootOf(spark, Seq(t)).getOrElse(
          throw new IllegalArgumentException(
            s"$what: table '$t' is not a registered merge table — " +
              "register it (SnapshotSqlCatalog.registerMerge or CREATE " +
              "TABLE ... USING graft) or address it by path"))
      })
      .getOrElse(throw new IllegalArgumentException(
        s"$what: set .option(\"path\", <MergeTable root>) or " +
          ".option(\"table\", <registered name>)"))

  /** The feed's shape: the CURRENT generation's recorded schema plus
    * the `change` ∈ 'i'/'d' marker — computed from metadata only (the
    * plan is built, never run). */
  def feedSchema(spark: SparkSession, root: String): StructType = {
    val latest = Snapshots.generations(spark, root).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"merge-cdf: no committed generations under $root — not a " +
          "MergeTable (create it first)"))
    MergeTable.changesBetween(spark, root, 0L, latest).schema
  }
}

private class MergeTableCdfSource(spark: SparkSession, root: String,
    startGen: Long, analyzedSchema: Option[StructType],
    pairUpdates: Boolean = false) extends Source {

  // the analysis-time shape when the provider saw one (the normal
  // readStream path); a fresh derivation only when createSource runs
  // without a prior sourceSchema call on this provider instance
  override val schema: StructType =
    analyzedSchema.getOrElse(MergeTableCdf.feedSchema(spark, root))

  // any Offset shape (our LongOffset live, SerializedOffset off the
  // checkpoint WAL after a restart) round-trips through json = the
  // generation id in decimal
  private def genOf(o: org.apache.spark.sql.connector.read.streaming.Offset)
      : Long = o.json().trim.toLong

  /** Latest committed generation, or None while nothing is newer than
    * the stream's start — "no new data", so AvailableNow/
    * processAllAvailable can drain and finish. */
  override def getOffset: Option[V1Offset] =
    Snapshots.generations(spark, root).maxOption
      .filter(_ > startGen).map(LongOffset.apply)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(genOf).getOrElse(startGen)
    val to = genOf(end)
    // changesBetween resolves BOTH generations via resolveAt — a swept
    // `from` refuses loudly naming the retained generations, which the
    // stream surfaces as the query's failure cause (replay budget
    // exceeded; re-seed the consumer, don't silently skip the gap).
    // The diff is PROJECTED to the stream's fixed schema: a mid-stream
    // additive evolution widens changesBetween's output by the new
    // column, and an unprojected batch would kill the query with
    // MicroBatchExecution's opaque width assertion — the contract is
    // "new columns appear after a restart", so until then they drop
    // (evolution is additive-only; the fixed columns always exist).
    // .option("pairUpdates", "true"): Delta-CDF update pairing — each
    // window's same-key d+i reports as update_preimage/update_postimage
    // (same column set, so the fixed analyzed schema is unaffected)
    val diff =
      if (pairUpdates) MergeTable.changesBetweenPaired(spark, root, from, to)
      else MergeTable.changesBetween(spark, root, from, to)
    org.apache.spark.sql.graftshim.StreamingBatch.asStreaming(spark,
      diff.select(schema.fieldNames.toSeq.map(n =>
        org.apache.spark.sql.functions.col(s"`$n`")): _*))
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}
