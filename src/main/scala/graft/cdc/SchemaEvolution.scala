package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC schema evolution — the gap between "the pipeline that was
  * deployed" and "the table the source has become": upstream `ALTER
  * TABLE ADD COLUMN` lands mid-stream, and change images start carrying
  * fields the warehouse table has never seen. The reference delegates
  * this to DMS+Redshift (`source/load_s3_files_to_redshift_lambda/
  * handler.py` COPYs into a pre-created table and would fail on a new
  * column); a real engine has to take a position:
  *
  *  - **Additive evolution** (the lakehouse rule — Parquet/Delta/Iceberg
  *    `mergeSchema` semantics): new columns append to the table schema;
  *    rows from before the column existed read as NULL.
  *  - **Widening promotions only** (`int→long`, `float→double`,
  *    `decimal` precision growth): the promotions Parquet schema merge
  *    itself performs. Anything else — `string` vs `long`, struct vs
  *    atom — is a REAL upstream contract break and fails loudly with
  *    the column name, never a silent cast.
  *  - **Columns never drop**: a source that stops sending a field keeps
  *    the historical column (absent field in a full-row image = NULL
  *    for rows written from that image — an image IS the row, so this
  *    falls out of last-wins, documented at [[mergeIntoParquetEvolving]]).
  *
  * Scale: evolution is metadata-only — the merge plan gains a typed-NULL
  * projection on the narrow side, no extra shuffle, no rewrite of
  * historical files beyond the merge the operator was already doing.
  */
object SchemaEvolution {

  /** Policy for a SUSPECTED upstream column rename. A rename arrives as
    * drop+add (CDC images carry field names, not identity), and under
    * additive evolution the old column silently NULLs out for every key
    * the renamed stream touches — data that LOOKS lost even though it
    * moved. The engine cannot distinguish a rename from a genuine
    * drop+add, so the position is a caller-chosen policy, not a guess:
    *
    *  - [[RenamePolicy.FlagAndContinue]] (default): proceed with
    *    drop+add semantics (the lakehouse default — Delta/Iceberg
    *    without column-mapping do exactly this) but surface the
    *    suspected pairs through [[detectRenames]] so a pipeline can
    *    alert instead of discovering NULLed history in an audit.
    *  - [[RenamePolicy.Fail]]: refuse the batch, naming the suspected
    *    pairs — for pipelines where silent NULLing of a renamed
    *    column's history is worse than stopping ingest.
    *  - [[RenamePolicy.Apply]]: the operator DECLARES the renames
    *    (`old → new`); history migrates under the new name in the same
    *    merge (the Delta `ALTER TABLE RENAME COLUMN` semantic, executed
    *    as part of the batch that introduced it). */
  sealed trait RenamePolicy
  object RenamePolicy {
    case object FlagAndContinue extends RenamePolicy
    case object Fail extends RenamePolicy
    final case class Apply(renames: Map[String, String]) extends RenamePolicy
  }

  /** Suspected renames between two schemas: (dropped, added) column
    * pairs of the SAME type, excluding `exempt` names (the merge-key
    * infrastructure columns). Heuristic by construction — a type match
    * is the strongest signal schema alone carries; same-type multi-drops
    * / multi-adds pair ambiguously and are all reported (every pairing
    * is suspect, the policy decides what that means). */
  def detectRenames(existing: StructType, incoming: StructType,
      exempt: Set[String] = Set("key", "ts")): Seq[(String, String)] = {
    val inNames = incoming.fieldNames.toSet
    val exNames = existing.fieldNames.toSet
    val dropped = existing.fields.filter(f =>
      !inNames(f.name) && !exempt(f.name))
    val added = incoming.fields.filter(f =>
      !exNames(f.name) && !exempt(f.name))
    for (d <- dropped.toSeq; a <- added.toSeq if d.dataType == a.dataType)
      yield (d.name, a.name)
  }

  /** Widening promotions Parquet merge performs: these never lose
    * information, everything else does (or changes meaning). */
  private def widened(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
    case (ShortType, IntegerType) | (IntegerType, ShortType) => Some(IntegerType)
    case (ShortType, LongType) | (LongType, ShortType) => Some(LongType)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x: DecimalType, y: DecimalType)
        if x.scale == y.scale => // precision growth at fixed scale
      Some(DecimalType(math.max(x.precision, y.precision), x.scale))
    case (x: StructType, y: StructType) => Some(merge(x, y))
    case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
      widened(xe, ye).map(e => ArrayType(e, xn || yn))
    case _ => None
  }

  /** Additive schema union: existing field order first, new fields
    * appended in arrival order; same-name fields must widen. Fails
    * loudly (with the column name) on any non-widenable conflict. */
  def merge(existing: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val kept = existing.fields.map { f =>
      byName.get(f.name) match {
        // a column the incoming batch stopped sending gets NULL-filled
        // for that batch's rows (alignTo / narrow-file reads), so it can
        // no longer be declared required — same rule as added columns
        case None => f.copy(nullable = true)
        case Some(g) =>
          val t = widened(f.dataType, g.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"schema evolution conflict on column '${f.name}': " +
                s"${f.dataType.simpleString} vs ${g.dataType.simpleString} " +
                "is not a widening promotion — upstream contract break"))
          // evolution can only RELAX nullability (a column that gains
          // nulls for historical rows cannot stay required)
          StructField(f.name, t, f.nullable || g.nullable, f.metadata)
      }
    }
    val existingNames = existing.fieldNames.toSet
    val added = incoming.fields.filterNot(f => existingNames(f.name))
      // a column born mid-stream is NULL for every pre-existing row
      .map(f => f.copy(nullable = true))
    StructType(kept ++ added)
  }

  /** Project `df` onto `target`: missing columns become typed NULLs,
    * present columns cast through their widening (the cast is exact by
    * [[merge]]'s construction), order follows the target. */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(target.fields.toIndexedSeq.map { f =>
      have.get(f.name) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(t) if t == f.dataType => col(f.name)
        case Some(_) => col(f.name).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** [[ChangelogApply.mergeIntoParquet]] with additive schema evolution:
    * the warehouse schema becomes `merge(existing, incoming)` before the
    * last-wins merge, so a micro-batch carrying new columns widens the
    * table in the same atomic swap that applies it.
    *
    * Image semantics under evolution: a change image is the FULL row at
    * event time. A key upserted by an image that lacks a historical
    * column gets NULL there — that is last-wins applied to schema, not
    * data loss (keys untouched by the narrow batch keep their values).
    *
    * RENAME/DROP CONTRACT: an upstream `RENAME COLUMN` arrives as
    * drop+add and is indistinguishable from one, so the behavior is the
    * caller's [[RenamePolicy]]: the default proceeds with drop+add
    * semantics (old column NULLs for keys the batch touches — the
    * documented last-wins consequence), `Fail` refuses the batch naming
    * the suspected pairs, and `Apply(old → new)` migrates history under
    * the new name inside the same atomic swap — after it, reads see one
    * column with the full value history, and the old name is gone. */
  def mergeIntoParquetEvolving(spark: SparkSession, upserts: DataFrame,
      tableDir: String,
      onSuspectedRename: RenamePolicy = RenamePolicy.FlagAndContinue): Unit = {
    val dst = new org.apache.hadoop.fs.Path(tableDir)
    // the TABLE's filesystem, not fs.defaultFS (object-store deployments)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tableDir + "__tmp")
    // same crash-recovery contract as the fixed-schema merge
    if (!fs.exists(dst) && fs.exists(tmp)) fs.rename(tmp, dst)
    val existing0 =
      if (fs.exists(dst)) Some(spark.read.parquet(tableDir)) else None
    val existing = (existing0, onSuspectedRename) match {
      case (Some(e), RenamePolicy.Apply(renames)) =>
        // declared renames migrate history FIRST, so merge() then sees
        // the new name on both sides and no drop+add at all
        renames.foreach { case (from, to) =>
          require(e.columns.contains(from),
            s"declared rename '$from' → '$to': '$from' not in $tableDir " +
              s"(have: ${e.columns.mkString(", ")})")
          require(!e.columns.contains(to),
            s"declared rename '$from' → '$to': '$to' already exists in " +
              s"$tableDir — a rename cannot overwrite a column")
        }
        Some(renames.foldLeft(e) { case (df, (from, to)) =>
          df.withColumnRenamed(from, to) })
      case (e, RenamePolicy.Fail) =>
        e.foreach { ex =>
          val suspects = detectRenames(ex.schema, upserts.schema)
          if (suspects.nonEmpty) throw new IllegalStateException(
            s"suspected upstream column rename(s) into $tableDir: " +
              suspects.map { case (f, t) => s"'$f' → '$t'" }.mkString(", ") +
              " — drop+add would NULL the old column's history for every " +
              "key this batch touches; declare RenamePolicy.Apply(...) to " +
              "migrate, or FlagAndContinue to accept drop+add semantics")
        }
        e
      case (e, _) => e
    }
    val target = existing match {
      case Some(e) => merge(e.schema, upserts.schema)
      case None => upserts.schema
    }
    val unioned = existing match {
      case Some(e) => alignTo(e, target).unionByName(alignTo(upserts, target))
      case None => alignTo(upserts, target)
    }
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc)
    val merged = unioned
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("newImage").isNotNull)
      .drop("rn")
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    fs.rename(tmp, dst)
  }

  /** Append-mode evolving table: a parquet directory plus a
    * `_schema.json` sidecar holding the evolved read schema — the
    * minimal form of what Delta/Iceberg keep in their metadata layer.
    * Appends NEVER rewrite history: files stay exactly as written, the
    * sidecar widens, and readers apply it as an explicit read schema —
    * Spark's parquet reader fills columns missing from a file with
    * NULLs, and (since Spark 4.0's widening type promotions in the
    * vectorized reader) reads int32 files as long / float as double.
    * That is the 100 TB contract: `ALTER TABLE ADD COLUMN` on a
    * petabyte table must be O(metadata), not O(data).
    *
    * Sidecar updates are write-then-rename (atomic on local/HDFS;
    * single-writer contract on object stores, as
    * [[graft.streaming.Snapshots]] documents for its markers). */
  object EvolvingTable {
    private def sidecar(dir: String) =
      new org.apache.hadoop.fs.Path(dir, "_schema.json")

    def currentSchema(spark: SparkSession, dir: String): Option[StructType] = {
      val p = sidecar(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def readOf(path: org.apache.hadoop.fs.Path): StructType = {
        val in = fs.open(path)
        try {
          val bytes = new Array[Byte](fs.getFileStatus(path).getLen.toInt)
          in.readFully(bytes)
          DataType.fromJson(new String(bytes, "UTF-8"))
            .asInstanceOf[StructType]
        } finally in.close()
      }
      if (fs.exists(p)) Some(readOf(p))
      else {
        // append's swap is delete-then-rename: a crash in that window
        // leaves only the fully-written tmp (fs.create is overwrite-
        // then-close, and the delete only runs after the close) — the
        // tmp IS the schema, same crash-recovery pattern as the change
        // feed's cursor. A truly partial tmp fails json parsing loudly
        // rather than serving a wrong schema.
        val tmp = new org.apache.hadoop.fs.Path(dir, "_schema.json.tmp")
        if (fs.exists(tmp)) Some(readOf(tmp)) else None
      }
    }

    /** Append a frame, evolving the table schema additively. The frame
      * is written AS IS (its own schema — no null-padding of the new
      * files either; the read schema reconciles both directions). */
    def append(spark: SparkSession, df: DataFrame, dir: String): Unit = {
      val target = currentSchema(spark, dir) match {
        case Some(existing) => merge(existing, df.schema)
        case None => df.schema
      }
      df.write.mode("append").parquet(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, "_schema.json.tmp")
      val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(tmp, true)
      try out.write(target.json.getBytes("UTF-8")) finally out.close()
      fs.delete(sidecar(dir), false)
      require(fs.rename(tmp, sidecar(dir)), s"sidecar swap failed under $dir")
    }

    /** Read through the evolved schema: every file — written under any
      * generation of the schema — comes back in the current shape. */
    def read(spark: SparkSession, dir: String): DataFrame = {
      val schema = currentSchema(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"no evolving table at $dir"))
      spark.read.schema(schema).parquet(dir)
    }
  }

  /** Infer the union row schema of a JSON image column the distributed
    * way (one pass of Spark's JSON inference — the same machinery
    * `spark.read.json` uses), for pipelines that materialize typed
    * tables from image envelopes and need the CURRENT shape of the
    * stream rather than a deploy-time struct. */
  def inferImageSchema(spark: SparkSession, images: DataFrame,
      column: String = "newImage"): StructType = {
    import spark.implicits._
    spark.read.json(images.select(col(column)).as[String].filter(_ != null))
      .schema
  }
}
