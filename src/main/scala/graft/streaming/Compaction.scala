package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for the `batch=N` incrementally-appended indexes
  * (postings, signatures, SRP, substring occurrences): re-run the BATCH
  * builder's layout over the accumulated logical relation and swap the
  * result in atomically — the executable form of the LSM story the
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
  * Swap protocol: write to a `__compacting` sibling, then two renames
  * (old root → `__precompact`, sibling → root) and a delete. Each
  * rename is atomic on HDFS-like filesystems, so a reader sees either
  * the old tree or the new one, never a mix; a crash between the
  * renames leaves the full data under one of the two siblings —
  * recovery is a manual rename, never a data loss. On object stores
  * without atomic rename, run compaction inside an ingest pause (the
  * same window it already requires — see below).
  *
  * Concurrency contract: never run concurrently with an in-flight
  * appendBatch — the natural schedule is between AvailableNow drains,
  * exactly when LSM engines compact. Replay safety after compaction
  * holds because foreachBatch only ever replays UNCOMMITTED batch ids:
  * every id ≤ maxId is committed in the stream's checkpoint (its data
  * is what compaction just rewrote), so no replay can land on the
  * compacted directory.
  */
object Compaction {

  /** Batch ids currently materialized under an appender root. */
  def batchIds(spark: SparkSession, root: String): Seq[Long] =
    Epochs.list(spark, root, prefix = "batch=")

  /** Compact `root` by rewriting its accumulated relation through
    * `write` (the batch builder's layout: df, targetDir ⇒ unit). */
  def compact(spark: SparkSession, root: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val ids = batchIds(spark, root)
    require(ids.nonEmpty, s"nothing to compact under $root")
    val maxId = ids.max
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(root + "__compacting")
    val trash = new Path(root + "__precompact")
    fs.delete(tmp, true)
    fs.delete(trash, true)
    // the rewrite streams old-root → tmp (different paths, so the read
    // plan never references directories the swap replaces)
    write(spark.read.parquet(root).drop("batch"), s"$tmp/batch=$maxId")
    if (!fs.rename(rootPath, trash))
      throw new java.io.IOException(s"compaction swap: cannot move $root aside")
    if (!fs.rename(tmp, rootPath))
      throw new java.io.IOException(s"compaction swap: cannot install $tmp")
    fs.delete(trash, true)
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
}
