package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.MergeTable

/** `graft-merge` — the lake table as a Structured Streaming SINK:
  * {{{
  *   changes.writeStream.format("graft-merge")
  *     .option("path", root)            // an EXISTING MergeTable —
  *     // or .option("table", name) for a registered/catalog name
  *     .option("mode", "cow")  // cow | mor | auto | occ[-mor|-auto]
  *     .option("checkpointLocation", ckpt)
  *     .start()
  * }}}
  * the write-side twin of [[MergeTableCdf]] (`merge-cdf`): together
  * they make the lake table a first-class streaming endpoint —
  * `readStream` serves its change feed, `writeStream` applies one —
  * where before, writes required bespoke `foreachBatch` wiring
  * ([[graft.streaming.MergeStream.intoTable]]; that face remains for
  * callers who also decode Debezium in the same hop).
  *
  * Input contract — the change-batch shape every merge face takes:
  * `op` ('c'/'u' upsert, 'd' delete), `seq` (in-batch ordering; last
  * wins per key tuple), the table's key column(s), full payload. The
  * KEY IS DISCOVERED from the table's own `#key=` manifest line — the
  * table must already exist (`MergeTable.create`, or `CREATE TABLE ...
  * USING graft`); a sink that could mint tables from a stream's first
  * batch would silently found a table on a typo'd path.
  *
  * Exactly-once: micro-batch ids fence replays through the same
  * manifest `#batch=` (or per-stream `#sbatch=`) lines every other
  * commit path carries — a restart re-offers the last batch and the
  * fence refuses it, end state identical. Mode map:
  *   - `cow`  → [[graft.streaming.MergeTable.mergeExactlyOnce]]
  *   - `mor`  → [[graft.streaming.MergeTable.mergeMorExactlyOnce]]
  *     (trickle deletes as DV sidecars)
  *   - `auto` → [[graft.streaming.MergeTable.mergeAuto]] under the same
  *     `#batch=` fence (per-batch write-amplification pricing decides
  *     COW vs MOR — the right default for a stream whose batches swing
  *     between trickle and bulk)
  *   - `occ`  → [[graft.streaming.MergeTable.mergeOccExactlyOnce]]
  *     with the REQUIRED `streamId` option (N pipelines, one table;
  *     per-stream fences, optimistic rebase; COW work phase)
  *   - `occ-mor` → same, with the MERGE-ON-READ work phase: each
  *     micro-batch stages a DV sidecar + net-insert appends, so N
  *     concurrent trickle pipelines pay ZERO write amplification and
  *     their disjoint commits arbitrate as manifest-only rebases
  *   - `occ-auto` → same, with per-batch [[graft.streaming.MergeTable
  *     .mergeAuto]] pricing INSIDE the OCC loop (a conflict replay
  *     re-prices against the winner's state)
  *
  * `OutputMode`: Append and Update are accepted — the rows ARE a
  * changelog, the mode flag carries no extra meaning here (same stance
  * as `foreachBatch`). Complete refuses loudly: replacing the table
  * from every batch is `create`, not a merge stream. */
class MergeTableSink extends StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-merge"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft-merge: partitionBy is not supported — the table's layout " +
        "is key-range-organized by its manifest, not by directory keys")
    require(outputMode != OutputMode.Complete(),
      "graft-merge: OutputMode.Complete would replace the table every " +
        "batch — the sink applies CHANGE batches; use Append or Update")
    val root = MergeTableCdf.resolveRoot("graft-merge",
      sqlContext.sparkSession, parameters)
    val mode = parameters.getOrElse("mode", "cow").toLowerCase(
      java.util.Locale.ROOT)
    require(Set("cow", "mor", "auto", "occ", "occ-mor", "occ-auto")
      .contains(mode),
      s"graft-merge: unknown mode '$mode' — cow | mor | auto | occ | " +
        "occ-mor | occ-auto")
    val occ = mode.startsWith("occ")
    val streamId = parameters.get("streamId")
    // content, not definedness: an EMPTY streamId (an unset config
    // templated into the option) would make two pipelines share one
    // #sbatch fence — stream B's batches silently dropped as stream A's
    // replays
    require(!occ || streamId.exists(_.trim.nonEmpty),
      s"graft-merge: mode=$mode needs .option(\"streamId\", <stable id>)" +
        " — the per-stream replay fence is keyed by it")
    require(occ || streamId.isEmpty,
      s"graft-merge: streamId only applies to the occ modes (got " +
        s"mode=$mode — a single-writer fence ignores it, which would " +
        "silently weaken the exactly-once contract the caller asked for)")
    val nFiles = parameters.get("nfiles").map(_.toInt).getOrElse(4)
    require(nFiles > 0, s"graft-merge: nFiles must be positive: $nFiles")
    val morAbove = parameters.get("moramplificationabove")
      .map(_.toDouble).getOrElse(8.0)
    // the table must exist NOW — a misspelled root should kill .start(),
    // not the first micro-batch minutes later; key comes from #key=
    val spark = sqlContext.sparkSession
    val key = MergeTable.currentMeta(spark, root).key
    new MergeTableSinkImpl(root, key, mode, streamId, nFiles, morAbove)
  }
}

private class MergeTableSinkImpl(root: String, key: String, mode: String,
    streamId: Option[String], nFiles: Int, morAbove: Double) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    // a replayed batch is refused from the manifest ALONE (a metadata
    // read) before the batch plan runs even once — the authoritative
    // fence stays inside the merge*ExactlyOnce wrappers; this early
    // exit only spares the refused replay (and the emptiness probe
    // below) from executing the micro-batch's upstream stages
    val fenced =
      if (mode.startsWith("occ"))
        MergeTable.appliedStreamBatchIds(spark, root)
          .get(streamId.get).exists(_ >= batchId)
      else MergeTable.appliedBatchId(spark, root).exists(_ >= batchId)
    if (fenced) return
    // re-root as a batch frame (ForeachBatchSink's move): merge plans
    // joins/aggregations the streaming-flagged frame would refuse
    val rerooted = org.apache.spark.sql.graftshim.StreamingBatch
      .asBatch(spark, data)
    // persist BEFORE the emptiness probe: the re-rooted frame is a
    // lazy RDD, so an unpersisted probe would run the micro-batch's
    // upstream plan once for isEmpty and AGAIN inside the merge —
    // every non-empty batch paying double compute (correct via
    // deterministic replay, but 2× the stream's hot path). The probe
    // materializes only up to the first row; the merge completes the
    // cached partitions; unpersist in finally keeps a long-running
    // stream's storage footprint at one in-flight batch.
    val changes = rerooted.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (changes.isEmpty) return // nothing to commit; no empty generation
      applyBatch(spark, changes, batchId)
    } finally changes.unpersist()
  }

  private def applyBatch(spark: org.apache.spark.sql.SparkSession,
      changes: DataFrame, batchId: Long): Unit = {
    mode match {
      case "cow" =>
        MergeTable.mergeExactlyOnce(spark, root, changes, key, batchId,
          nFiles)
      case "mor" =>
        MergeTable.mergeMorExactlyOnce(spark, root, changes, key, batchId,
          nFiles)
      case "auto" =>
        // same #batch= fence, dispatch priced per batch from manifest
        // record_count (trickle → MOR, bulk → COW)
        MergeTable.mergeAutoExactlyOnce(spark, root, changes, key, batchId,
          nFiles, morAmplificationAbove = morAbove)
      case m if m.startsWith("occ") =>
        // the occ work-phase shape: occ = COW staging; occ-mor = DV
        // sidecar + appends (N trickle pipelines, zero amplification);
        // occ-auto = per-batch pricing INSIDE the OCC loop (replays
        // re-price against the winner's state)
        val occMode = if (m == "occ") "cow" else m.stripPrefix("occ-")
        MergeTable.mergeOccExactlyOnce(spark, root, changes, key,
          streamId.get, batchId, nFiles, mode = occMode,
          morAmplificationAbove = morAbove)
    }
    ()
  }

  override def toString: String = s"MergeTableSink[$mode -> $root]"
}
