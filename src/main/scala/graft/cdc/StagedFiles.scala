package graft.cdc

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The staged-file hop of the NoSQL path: micro-batches land as NDJSON
  * files in an `unprocessed/` folder, a loader appends them to the
  * warehouse and moves them to `processed/` (operators A10/A11/A13/A14,
  * `/root/reference/source/write_dynamodb_stream_to_s3_lambda/handler.py:39-58`
  * and `/root/reference/source/load_s3_files_from_dynamodb_stream_to_redshift_lambda/handler.py:48-114`).
  *
  * Key naming mirrors the reference (`handler.py:44-48`): lexicographically
  * sortable `{utc-ts}__{uuid}__{batchId}__inserted_or_modified_records.json`,
  * and an EMPTY micro-batch still emits a
  * `…__no_inserted_or_modified_records.txt` marker (`handler.py:51-58`) so
  * batch liveness is observable.
  *
  * Exactly-once: the reference has an at-least-once gap — a crash between
  * COPY and file-move double-loads the file on retry (`handler.py:95-96`;
  * SURVEY §7 risk c). We close it two ways: each staged file loads into a
  * DETERMINISTIC warehouse target (rename-replace, so retries overwrite
  * rather than append — see [[loadUnprocessed]]), and a `_manifest/`
  * entry records completion so retries skip the work entirely. (At
  * cluster scale both collapse into one transactional table-format
  * commit; the manifest models that commit record.)
  */
object StagedFiles {
  val UnprocessedDir = "unprocessed_dynamodb_streams"
  val ProcessedDir = "processed_and_safe_to_delete"
  val ManifestDir = "_manifest"
  val DataSuffix = "__inserted_or_modified_records.json"
  val EmptySuffix = "__no_inserted_or_modified_records.txt"

  /** Reference keys embed `HH:mm:ss` (`handler.py:44-48`), fine for S3
    * object keys; Hadoop `Path` forbids `:` (URI scheme ambiguity), so we
    * keep the same lexicographic ordering with `-` separators. */
  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss'Z'")
    .withZone(ZoneOffset.UTC)

  // the STAGE's filesystem, not fs.defaultFS — the two differ on any
  // object-store deployment (hdfs default, s3a stage)
  private def fs(spark: SparkSession, anyPathUnder: String): FileSystem =
    new Path(anyPathUnder)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A staged file's batch id is the third `__`-segment of its name. */
  private def batchIdOf(name: String): Option[String] = {
    val parts = name.split("__")
    if (parts.length >= 3) Some(parts(2).takeWhile(_.isDigit)) else None
  }

  /** True if any staged artifact (unprocessed, processed, or manifest)
    * already carries this batchId — makes staging idempotent under
    * `foreachBatch` replays, whose wall-clock timestamps differ. */
  private def batchAlreadyStaged(hfs: FileSystem, stageRoot: String,
      batchId: Long): Option[Path] = {
    Seq(UnprocessedDir, ProcessedDir, ManifestDir).iterator.flatMap { d =>
      val dir = new Path(s"$stageRoot/$d")
      if (!hfs.exists(dir)) Iterator.empty
      else hfs.listStatus(dir).iterator
        .filter(st => batchIdOf(st.getPath.getName).contains(batchId.toString))
        .map(_.getPath)
    }.nextOption()
  }

  /** Stage one micro-batch as a single NDJSON file (or an empty marker).
    * `now` is injected for deterministic tests.
    *
    * Idempotent per batchId: a `foreachBatch` replay of an uncommitted
    * batch finds the batch's existing artifact (whatever its wall-clock
    * prefix) and returns it instead of staging a duplicate. The NDJSON
    * itself is written executor-side (`coalesce(1).write.json` + rename)
    * — no driver collect, so batch size is bounded by an executor task,
    * not driver memory. */
  def stageBatch(spark: SparkSession, batch: DataFrame, stageRoot: String,
      batchId: Long, now: Instant = Instant.now()): Path = {
    val hfs = fs(spark, stageRoot)
    batchAlreadyStaged(hfs, stageRoot, batchId) match {
      case Some(existing) => return existing
      case None =>
    }
    val ts = TsFmt.format(now)
    val uuid = UUID.nameUUIDFromBytes(s"$ts-$batchId".getBytes("UTF-8"))
    val tmpDir = new Path(s"$stageRoot/__staging_tmp/$batchId")
    hfs.delete(tmpDir, true)
    batch.coalesce(1).write.mode("overwrite").json(tmpDir.toString)
    val part = hfs.listStatus(tmpDir)
      .find(st => st.getPath.getName.startsWith("part-"))
    val nonEmpty = part.exists(_.getLen > 0)
    val name =
      if (nonEmpty) s"${ts}__${uuid}__${batchId}$DataSuffix"
      else s"${ts}__${uuid}__${batchId}$EmptySuffix"
    val dest = new Path(s"$stageRoot/$UnprocessedDir/$name")
    hfs.mkdirs(dest.getParent)
    if (nonEmpty) hfs.rename(part.get.getPath, dest)
    else hfs.create(dest, true).close()
    hfs.delete(tmpDir, true)
    dest
  }

  /** List unprocessed staged files (prefix pruning, A11). */
  def listUnprocessed(spark: SparkSession, stageRoot: String): Seq[Path] = {
    val dir = new Path(s"$stageRoot/$UnprocessedDir")
    val hfs = fs(spark, stageRoot)
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toIndexedSeq.map(_.getPath).sortBy(_.getName)
  }

  /** Load every unprocessed staged file into the warehouse table
    * (parquet dir append = the reference's `COPY … json 'auto'`, A13),
    * then move it to processed/ (A14). Unknown suffixes are an error
    * (`handler.py:113-114`).
    *
    * Exactly-once under crash-retry: each staged file's rows land as ONE
    * deterministically-named parquet file (`<stagedName>.parquet`) inside
    * the warehouse dir, written to a temp location and renamed into
    * place. A retry after ANY crash point rewrites the same target (the
    * rename replaces it) — never appends a second copy. The manifest
    * marks load completion; the move to processed/ is last. This closes
    * the reference's COPY-then-move double-load gap (`handler.py:95-96`)
    * for real, not just narrows it; at cluster scale the same idea is a
    * transactional table-format commit.
    *
    * @return number of data files actually loaded this call */
  def loadUnprocessed(spark: SparkSession, stageRoot: String,
      warehouseDir: String, schema: StructType,
      crashBeforeMove: Boolean = false): Int = {
    val hfs = fs(spark, stageRoot)
    var appended = 0
    listUnprocessed(spark, stageRoot).foreach { p =>
      val name = p.getName
      val manifest = new Path(s"$stageRoot/$ManifestDir/$name")
      if (name.endsWith(DataSuffix)) {
        if (!hfs.exists(manifest)) {
          val target = new Path(s"$warehouseDir/$name.parquet")
          val tmpDir = new Path(s"$stageRoot/__load_tmp/$name")
          hfs.delete(tmpDir, true)
          spark.read.schema(schema).json(p.toString)
            .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
          val part = hfs.listStatus(tmpDir)
            .find(st => st.getPath.getName.startsWith("part-"))
            .getOrElse(throw new IllegalStateException(s"no part file for $name"))
          hfs.mkdirs(target.getParent)
          hfs.delete(target, false) // idempotent retry: replace, never dup
          hfs.rename(part.getPath, target)
          hfs.delete(tmpDir, true)
          hfs.mkdirs(manifest.getParent)
          hfs.create(manifest, true).close() // commit record
          appended += 1
        }
        if (crashBeforeMove) throw new RuntimeException("injected crash")
        moveToProcessed(hfs, stageRoot, p)
      } else if (name.endsWith(EmptySuffix)) {
        moveToProcessed(hfs, stageRoot, p)
      } else {
        throw new IllegalArgumentException(
          s"Unexpected file suffix for staged file: $name")
      }
    }
    appended
  }

  private def moveToProcessed(hfs: FileSystem, stageRoot: String, p: Path): Unit = {
    val dest = new Path(s"$stageRoot/$ProcessedDir/${p.getName}")
    hfs.mkdirs(dest.getParent)
    hfs.rename(p, dest)
  }

  /** Retention sweep over processed/ (A15 — the 1-day S3 lifecycle rule,
    * `/root/reference/cdk_infrastructure/__init__.py:300-307`). */
  def expireProcessed(spark: SparkSession, stageRoot: String,
      olderThanMs: Long, nowMs: Long = System.currentTimeMillis()): Int = {
    val hfs = fs(spark, stageRoot)
    val dir = new Path(s"$stageRoot/$ProcessedDir")
    if (!hfs.exists(dir)) 0
    else hfs.listStatus(dir).count { st =>
      val expired = nowMs - st.getModificationTime > olderThanMs
      if (expired) hfs.delete(st.getPath, false)
      expired
    }
  }
}
