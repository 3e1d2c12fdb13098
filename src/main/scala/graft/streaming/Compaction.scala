package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for the `batch=N` incrementally-appended indexes
  * (postings, signatures, SRP, substring occurrences): re-run the BATCH
  * builder's layout over the accumulated logical relation and publish
  * the result atomically — the executable form of the LSM story the
  * appenders document ("a periodic re-run of the batch builder IS that
  * compaction"). Consumers are indifferent: both faces read the same
  * logical relation through the same partition-discovery path; what
  * changes is the physical shape — a term/bucket lookup afterwards
  * opens the batch-build file count instead of one file set per
  * micro-batch that ever ran.
  *
  * The compacted relation lands under `batch=<maxId>`, the NEWEST
  * committed batch id, so the directory convention (and any
  * predecessor-style read against it) survives compaction, and the
  * stream simply continues appending at maxId+1.
  *
  * Publish protocol ([[Snapshots]]): the rewrite streams into a fresh
  * `_gen-<n>` directory, which becomes the tree readers resolve to via
  * ONE atomic marker-file create — no rename, no window where the root
  * is missing, atomic on local FS, HDFS and object stores alike. The
  * previous tree is retained until the NEXT compaction commits, so a
  * reader that resolved a moment before the commit keeps reading a
  * complete snapshot. A crash anywhere before the marker leaves an
  * invisible partial `_gen-<n>` that the next run deletes — readers
  * never see a mix and recovery is automatic, not manual.
  *
  * Concurrency contract: READERS need no coordination (they see the
  * old snapshot or the new one, never a mix, never an error). Only
  * APPENDERS must not run concurrently with a compaction — the natural
  * schedule is between AvailableNow drains, exactly when LSM engines
  * compact. Replay safety after compaction holds because foreachBatch
  * only ever replays UNCOMMITTED batch ids: every id ≤ maxId is
  * committed in the stream's checkpoint (its data is what compaction
  * just rewrote), so no replay can land on the compacted directory.
  */
object Compaction {

  /** Batch ids currently materialized under an appender root. */
  def batchIds(spark: SparkSession, root: String): Seq[Long] =
    Epochs.list(spark, root, prefix = "batch=")

  /** The highest batch id folded into the resolved snapshot's compacted
    * base (`_COMPACTED_THROUGH` marker; -1 when never compacted). This
    * is the REPLAY FENCE of the appender tree: a foreachBatch replay of
    * an id at or below it must be a NO-OP — its rows are provably
    * inside the fold (compaction read the materialized batch dir), and
    * an overwrite of `batch=<maxId>` would replace the ENTIRE folded
    * relation with one micro-batch. */
  def compactedThrough(spark: SparkSession, root: String): Long =
    compactedThroughIn(spark, Snapshots.resolve(spark, root))

  /** The fence read against an ALREADY-RESOLVED generation dir — so a
    * caller that also needs the dir (e.g. [[fencedBatchDir]]) resolves
    * exactly once: a concurrent compaction publishing between two
    * resolves could otherwise let a replayed id pass a stale fence and
    * land in (or overwrite the folded base of) the NEW generation. */
  private def compactedThroughIn(spark: SparkSession, resolved: String): Long = {
    val p = new Path(resolved, "_COMPACTED_THROUGH")
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) -1L
    // to-EOF read: a short read's numeric PREFIX ("1" of "12") would
    // lower the fence and let an already-folded replay re-land
    else Snapshots.readMarker(spark, p).trim.toLong
  }

  /** Compact `root` by rewriting its accumulated relation through
    * `write` (the batch builder's layout: df, targetDir ⇒ unit). */
  def compact(spark: SparkSession, root: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val ids = batchIds(spark, root)
    require(ids.nonEmpty, s"nothing to compact under $root")
    val maxId = ids.max
    val source = Snapshots.resolve(spark, root)
    val gen = Snapshots.nextGen(spark, root)
    val genDir = new Path(Snapshots.genDir(root, gen))
    val fs = genDir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(genDir, true) // defensive: ids are never reused, but be sure
    // the rewrite streams current-snapshot → gen=<n> (underscore-free
    // but referenced only via resolve(), never via a listing of root)
    write(spark.read.parquet(source).drop("batch"), s"$genDir/batch=$maxId")
    // the replay fence, INSIDE the generation before its publish: ids
    // ≤ maxId are folded — a post-crash replay of one of them must
    // no-op in appendBatch, not overwrite the folded base. (A batch the
    // stream wrote but never checkpointed is either fully visible —
    // folded here, replay skipped, exactly-once — or invisible thanks
    // to the committer's job-commit atomicity — not folded, its id > a
    // SMALLER maxId, replay lands normally.)
    val out = fs.create(new Path(genDir, "_COMPACTED_THROUGH"), true)
    out.write(maxId.toString.getBytes("UTF-8"))
    out.close()
    Snapshots.commit(spark, root, gen)   // the atomic publish
    Snapshots.sweep(spark, root)         // retain one predecessor snapshot
  }

  /** Compact an [[IncrementalPostings]] root into the batch build's
    * shape: term-clustered, term-sorted ([[graft.operators.Search
    * .ensurePostingsIndex]]'s layout) — a term's postings land
    * contiguously in few row groups of few files again. */
  def compactPostings(spark: SparkSession, root: String,
      partitions: Int = 8): Unit =
    compact(spark, root) { (df, out) =>
      df.repartition(partitions, col("term"))
        .sortWithinPartitions(col("term"), col("doc_id"))
        .write.parquet(out)
    }

  /** Compact an [[IncrementalIndex]] (MinHash/SimHash signature) root:
    * one file set for the whole corpus instead of one per batch. */
  def compactSignatures(spark: SparkSession, root: String): Unit =
    compact(spark, root) { (df, out) => df.write.parquet(out) }

  /** Compact an [[IncrementalSrpIndex]] root back to the batch build's
    * bucket-partitioned layout ([[graft.operators.Similarity
    * .ensureSrpIndex]]): probes keep pruning on `bucket`, but open one
    * directory per bucket instead of one per (batch, bucket). */
  def compactSrp(spark: SparkSession, root: String): Unit =
    compact(spark, root) { (df, out) =>
      df.write.partitionBy("bucket").parquet(out)
    }

  /** Generic unclustered append under the `batch=N` convention — the
    * ingest face of a CLUSTERED table: micro-batches land as written
    * (no clustering work on the ingest path), readers see them through
    * the same partition-discovery union as every appender root, and
    * [[compactZOrdered]] periodically restores the layout. */
  def appendBatch(df: DataFrame, root: String, batchId: Long): Unit =
    fencedBatchDir(df.sparkSession, root, batchId).foreach(dir =>
      df.write.mode("overwrite").parquet(dir))

  /** The directory a micro-batch append should land in — or None when
    * the id is at or below the fold marker: that batch was materialized
    * when compaction ran and its rows live in the folded base, so a
    * post-crash foreachBatch replay of it must NO-OP (writing would
    // overwrite batch=<maxId>, i.e. the whole compacted relation).
    * EVERY appender that writes `batch=<id>` dirs under a [[Snapshots]]
    * root goes through this fence — one definition of replay safety. */
  def fencedBatchDir(spark: SparkSession, root: String,
      batchId: Long): Option[String] = {
    // resolve ONCE: fence and batch dir must come from the same
    // generation, or a compaction publishing between two resolves lets
    // a replayed id pass the old fence and write into the new tree
    val resolved = Snapshots.resolve(spark, root)
    if (batchId <= compactedThroughIn(spark, resolved)) None
    else Some(s"$resolved/batch=$batchId")
  }

  /** Re-cluster a z-ordered events root (the Delta `OPTIMIZE ZORDER BY`
    * cadence): streamed appends land UNCLUSTERED — each micro-batch's
    * files span the full (user, time) envelope, so the tile pruning the
    * layout exists for decays toward a full scan as batches accumulate.
    * This rewrite re-runs [[graft.ops.Layout.writeZOrdered]] over the
    * accumulated relation into a fresh generation: row groups become
    * ~square (user, time) tiles again and footer-stats skipping is
    * restored to the batch build's ratio (measured in ZOrderCompactionSpec).
    *
    * Scale: the rewrite is one range-partitioned sort of the accumulated
    * relation — the same cost the initial clustered build paid, amortized
    * over however many appends ran in between; nothing shuffles twice.
    * The bounds are recomputed from the accumulated data, so drift in
    * either dimension (new users, advancing time) re-normalizes instead
    * of silently saturating a stale [0, hi] mapping at 65535. */
  def compactZOrdered(spark: SparkSession, root: String,
      files: Int = 32): Unit =
    compact(spark, root) { (df, out) =>
      graft.ops.Layout.writeZOrdered(df, out, files)
    }

  // ---- cadence: WHEN to compact -------------------------------------

  /** Accumulated-append count in the LIVE tree — the observable decay
    * metric both index families share. Every metric the layouts exist
    * for decays monotonically in it: an LSM term/bucket lookup opens one
    * file set PER BATCH (fan-out grows linearly), and a z-order tile
    * query scans every unclustered batch's full envelope (pruning ratio
    * decays toward a full scan). Compaction resets it to 1, so the count
    * is exactly "appends since the layout was last restored". */
  def appendDebt(spark: SparkSession, root: String): Int =
    batchIds(spark, root).size

  /** The cadence decision: compact once the live tree carries more than
    * `maxBatches` accumulated appends. The reference automates its
    * analog with an S3 lifecycle sweeping processed staging files on a
    * fixed clock (`cdk_infrastructure/__init__.py:300-307`, A15); a
    * layout's decay is proportional to append count, not wall-clock, so
    * the trigger here reads the observable debt instead. Thresholds:
    * LSM lookups tolerate ~a dozen file sets before open-cost dominates;
    * z-order pruning at `maxBatches` unclustered appends bounds the
    * extra scan to maxBatches×(batch size). */
  def shouldCompact(spark: SparkSession, root: String,
      maxBatches: Int = 8): Boolean = {
    require(maxBatches >= 1, "maxBatches must be at least 1")
    appendDebt(spark, root) > maxBatches
  }

  /** Maintenance registry: every appender index a deployment keeps live
    * registers its root + compaction routine once; one scheduled
    * [[Maintenance.runDue]] call then sweeps them ALL, compacting
    * exactly those whose append debt crossed the threshold — the
    * warehouse-side equivalent of the reference's lifecycle rule, with
    * the decision made from observed decay instead of wall-clock age. */
  object Maintenance {
    import scala.collection.mutable
    private val registry = mutable.LinkedHashMap
      .empty[String, (SparkSession => Unit, Option[SparkSession => Boolean])]

    /** Register (or replace) an index root's compaction routine, due
      * when its append debt crosses [[runDue]]'s threshold. */
    def register(root: String, compactFn: SparkSession => Unit): Unit =
      registry.synchronized { registry.update(root, (compactFn, None)) }

    /** Register with a CUSTOM due-predicate — for roots whose decay is
      * not append-batch-count (a [[MergeTable]]'s small-file debt, a
      * DV-row ratio): the same single maintenance sweep then serves
      * appender indexes and lake tables alike. */
    def register(root: String, compactFn: SparkSession => Unit,
        due: SparkSession => Boolean): Unit =
      registry.synchronized { registry.update(root, (compactFn, Some(due))) }

    def deregister(root: String): Unit =
      registry.synchronized { registry.remove(root) }

    def registered: Seq[String] = registry.synchronized { registry.keys.toSeq }

    /** Sweep every registered index: compact the ones whose debt crossed
      * `maxBatches` (or whose custom due-predicate fired), leave the
      * rest untouched. PER-ROOT fault isolation: one root's failing
      * compaction (transient FS error, bad path) must not starve every
      * root registered after it — each failure is captured and the
      * sweep continues; the caller gets the full outcome map and the
      * FIRST failure is rethrown at the end (the sweep still counts as
      * failed for alerting, but no root went unvisited because of a
      * head-of-line neighbor). Returns (root → ran?). */
    def runDue(spark: SparkSession, maxBatches: Int = 8): Seq[(String, Boolean)] = {
      val snapshot = registry.synchronized { registry.toSeq }
      var firstFailure: Option[(String, Throwable)] = None
      val outcomes = snapshot.map { case (root, (fn, dueFn)) =>
        try {
          val due = dueFn.map(_(spark))
            .getOrElse(shouldCompact(spark, root, maxBatches))
          if (due) fn(spark)
          root -> due
        } catch {
          case scala.util.control.NonFatal(e) =>
            if (firstFailure.isEmpty) firstFailure = Some(root -> e)
            root -> false
        }
      }
      firstFailure.foreach { case (root, e) =>
        throw new RuntimeException(
          s"maintenance sweep: compaction of $root failed (every other " +
            "registered root was still visited)", e)
      }
      outcomes
    }
  }
}
