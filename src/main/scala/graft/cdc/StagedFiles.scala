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
  * SURVEY §7 risk c). We close it with a load manifest: a `_manifest/`
  * entry is committed atomically per staged file BEFORE the move; a retry
  * sees the manifest and skips the append. (At cluster scale the manifest
  * write + warehouse append become one transactional commit of a table
  * format; the manifest models that commit record.)
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

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Stage one micro-batch as a single NDJSON object (or an empty marker).
    * `now` is injected for deterministic tests. */
  def stageBatch(spark: SparkSession, batch: DataFrame, stageRoot: String,
      batchId: Long, now: Instant = Instant.now()): Path = {
    val hfs = fs(spark)
    val ts = TsFmt.format(now)
    val uuid = UUID.nameUUIDFromBytes(s"$ts-$batchId".getBytes("UTF-8"))
    val rows = batch.select(to_json(struct(batch.columns.map(col).toIndexedSeq: _*)))
      .collect().map(_.getString(0))
    val name =
      if (rows.isEmpty) s"${ts}__${uuid}__${batchId}$EmptySuffix"
      else s"${ts}__${uuid}__${batchId}$DataSuffix"
    val dest = new Path(s"$stageRoot/$UnprocessedDir/$name")
    hfs.mkdirs(dest.getParent)
    val out = hfs.create(dest, true)
    try if (rows.nonEmpty) out.write((rows.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    dest
  }

  /** List unprocessed staged files (prefix pruning, A11). */
  def listUnprocessed(spark: SparkSession, stageRoot: String): Seq[Path] = {
    val dir = new Path(s"$stageRoot/$UnprocessedDir")
    val hfs = fs(spark)
    if (!hfs.exists(dir)) Seq.empty
    else hfs.listStatus(dir).toIndexedSeq.map(_.getPath).sortBy(_.getName)
  }

  /** Load every unprocessed staged file into the warehouse table
    * (parquet dir append = the reference's `COPY … json 'auto'`, A13),
    * then move it to processed/ (A14). Idempotent under crash-retry via
    * the manifest. Unknown suffixes are an error (`handler.py:113-114`).
    *
    * @return number of data files actually appended this call */
  def loadUnprocessed(spark: SparkSession, stageRoot: String,
      warehouseDir: String, schema: StructType,
      crashBeforeMove: Boolean = false): Int = {
    val hfs = fs(spark)
    var appended = 0
    listUnprocessed(spark, stageRoot).foreach { p =>
      val name = p.getName
      val manifest = new Path(s"$stageRoot/$ManifestDir/$name")
      if (name.endsWith(DataSuffix)) {
        if (!hfs.exists(manifest)) {
          spark.read.schema(schema).json(p.toString)
            .write.mode(SaveMode.Append).parquet(warehouseDir)
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
    val hfs = fs(spark)
    val dir = new Path(s"$stageRoot/$ProcessedDir")
    if (!hfs.exists(dir)) 0
    else hfs.listStatus(dir).count { st =>
      val expired = nowMs - st.getModificationTime > olderThanMs
      if (expired) hfs.delete(st.getPath, false)
      expired
    }
  }
}
