package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

import graft.streaming.MergeTable

/** The MANIFEST as Spark's [[FileIndex]]: a bare-name SQL read of a
  * registered merge table plans over this index, so the file listing
  * comes from the committed manifest (zero directory listings) and the
  * WHERE clause's pushed dataFilters run through the SAME conjunct-
  * bounds + bloom pruning as [[MergeTable.readWhere]] — planner-side
  * FILE skipping with zero footer reads, now on the plain SQL path too
  * (before this, SQL reads fell back to per-file footer/row-group
  * pruning, paying a footer read per file at 100 TB). The index pins
  * ONE generation (immutable files ⇒ immutable listing); each new SQL
  * statement re-resolves and picks up the newest commit. */
class MergeTableFileIndex(spark: SparkSession, root: String,
    m: MergeTable.GenMeta) extends FileIndex {

  private val statuses: Map[String, FileStatus] = {
    // sizes come from the MANIFEST (recorded once at write): resolving
    // a statement costs zero per-file RPCs. A manifest written before
    // the size column falls back to ONE listStatus of the files dir
    // (never a per-entry status loop — that would be the N-RPC cost
    // this index exists to avoid).
    lazy val listed: Map[String, FileStatus] = {
      val dir = new Path(s"$root/files")
      dir.getFileSystem(spark.sessionState.newHadoopConf())
        .listStatus(dir).map(st => st.getPath.getName -> st).toMap
    }
    m.entries.map { e =>
      e.name -> (if (e.bytes >= 0)
        new FileStatus(e.bytes, false, 1, 128L << 20, 0L,
          new Path(MergeTable.dataFilePath(root, e.name)))
      else listed(e.name))
    }.toMap
  }

  override def rootPaths: Seq[Path] = Seq(new Path(s"$root/files"))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cond = dataFilters.reduceOption(And)
    val candidates = MergeTable.pruneByCondition(spark, root, m, cond)
    Seq(PartitionDirectory(InternalRow.empty,
      candidates.map(e => statuses(e.name)).toArray))
  }

  override def inputFiles: Array[String] =
    m.entries.map(e => MergeTable.dataFilePath(root, e.name)).toArray

  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
  override def partitionSchema: StructType = new StructType()
}

object MergeTableRelation {

  /** The plan a bare registered merge-table name resolves to: a parquet
    * relation over [[MergeTableFileIndex]] — manifest listing,
    * manifest+bloom file skipping on pushed filters. A generation
    * carrying deletion vectors layers the broadcast DV anti-join ABOVE
    * the indexed scan: Catalyst pushes data-column predicates through
    * the anti-join's left side down to the scan, so a delete-heavy
    * table keeps planner-side file skipping between maintenance runs
    * (before this, any DV forfeited the index entirely and the SQL read
    * paid a full listing + footer-pruned scan). DV rows naming pruned
    * files are inert — a skipped file contributes no scan rows for them
    * to kill. Only an EMPTY manifest (legal: a delete-everything merge)
    * serves through [[MergeTable.read]], which returns the recorded
    * zero-row frame. */
  def resolve(spark: SparkSession, root: String): LogicalPlan =
    resolve(spark, root, MergeTable.genMeta(
      spark, graft.streaming.Snapshots.resolve(spark, root)))

  /** [[resolve]] over an ALREADY-FETCHED generation meta — the catalog
    * path's hook: `loadTable` parsed the manifest to build the handle,
    * and re-GETting it here would double the per-statement metadata
    * round-trips the [[MergeTable.GenMeta]] type exists to avoid. */
  def resolve(spark: SparkSession, root: String,
      m: MergeTable.GenMeta): LogicalPlan = {
    if (m.entries.isEmpty)
      MergeTable.readMeta(spark, root, m).queryExecution.analyzed
    else {
      val recorded = m.schema.getOrElse(
        MergeTable.readMeta(spark, root, m).schema)
      // a RENAME/DROP chain makes per-file column names vary: the scan
      // requests every stored alias (the same expanded shape readFiles
      // uses) and a projection restores logical names above the DV
      // anti-join. Predicates push THROUGH the projection as
      // coalesce(new, old…) — pruneByCondition collapses a coalesce
      // whose children are exactly a field's stored-name chain back to
      // its newest alias, so manifest file skipping survives the
      // rename (spec-pinned in ColumnMappingSpec).
      val mapped = m.schema.exists(MergeTable.hasMapping)
      val scanSchema =
        if (mapped) MergeTable.expandedReadSchema(recorded) else recorded
      val rel = HadoopFsRelation(
        new MergeTableFileIndex(spark, root, m),
        partitionSchema = new StructType(),
        dataSchema = scanSchema,
        bucketSpec = None,
        fileFormat = new ParquetFileFormat(),
        options = Map.empty[String, String])(spark)
      val base = spark.baseRelationToDataFrame(rel)
      val dvd = if (m.dvs.isEmpty) base
                else MergeTable.applyDvs(spark, root, base, m.dvs)
      val df = if (!mapped) dvd
               else dvd.select(MergeTable.logicalProjection(recorded): _*)
      df.queryExecution.analyzed
    }
  }
}
