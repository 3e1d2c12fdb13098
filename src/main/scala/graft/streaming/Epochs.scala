package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Epoch-directory discovery for the incremental state folds
  * ([[IncrementalClusters]], [[StreamingHeavyHitters]]): snapshots live
  * under `root/epoch=<batchId>/` and a fold reads its predecessor as the
  * newest epoch strictly below its own batchId.
  *
  * Listing goes through the Hadoop FileSystem API — `path.getFileSystem`
  * resolves the scheme (file://, hdfs://, s3a://, …) against the
  * session's Hadoop configuration, so the fold works on any filesystem
  * Spark can write to. The previous `java.io.File(root).listFiles`
  * implementation returned null on object-store paths, which made
  * `readLabelsBefore` silently return the EMPTY predecessor and restart
  * the fold from scratch with no error — a correctness trap on exactly
  * the deployments (HDFS/S3) the incremental components target.
  */
private[streaming] object Epochs {

  /** Epoch ids currently materialized under `root` (empty when the root
    * does not exist yet — the stream-start case). `prefix` selects the
    * directory convention: `epoch=` snapshots (the folds) or `batch=`
    * appenders (the LSM-shaped indexes, [[Compaction]]). Compacted
    * roots resolve through [[Snapshots]] to the current committed
    * generation — a no-op for never-compacted roots.
    *
    * Only names whose suffix is a parseable non-negative Long count: a
    * stray `batch=3.tmp` left by a killed writer (or any other junk a
    * tool drops next to the data) is ignored rather than aborting ALL
    * epoch discovery for the root with a NumberFormatException. */
  def list(spark: SparkSession, root: String,
      prefix: String = "epoch="): Seq[Long] = {
    val path = new Path(Snapshots.resolve(spark, root))
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix(prefix).toLong).toOption)
      .filter(_ >= 0L)
  }

  /** The newest epoch strictly below `beforeEpoch`, if any — the
    * replay-stable predecessor of a micro-batch. */
  def predecessor(spark: SparkSession, root: String,
      beforeEpoch: Long): Option[Long] =
    list(spark, root).filter(_ < beforeEpoch).sorted.lastOption

  /** Retention sweep for fold-SNAPSHOT roots (each epoch is a complete
    * state snapshot, so old epochs are superseded, not part of the
    * relation): delete all but the newest `keep` epoch directories.
    * `keep` must be ≥ 2 — correctness needs only the newest (a replay
    * touches an id ABOVE every committed epoch, whose predecessor is
    * the newest snapshot), and the one extra covers a reader that
    * resolved just before a concurrent append, the [[Snapshots]]
    * retention argument. Hard-wired to `epoch=` snapshot directories:
    * on a `batch=` appender root EVERY directory is live data, part of
    * the relation, so a sweep there would delete the index itself —
    * [[Compaction]] (which rewrites before it retires) owns those. */
  def prune(spark: SparkSession, root: String, keep: Int = 2): Seq[Long] = {
    val prefix = "epoch="
    require(keep >= 2, s"retention below 2 breaks in-flight readers (keep=$keep)")
    val doomed = list(spark, root, prefix).sorted.dropRight(keep)
    val base = new Path(Snapshots.resolve(spark, root))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    doomed.foreach(e => fs.delete(new Path(base, s"$prefix$e"), true))
    doomed
  }
}
