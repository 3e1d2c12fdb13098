package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE INTO over a manifest-based copy-on-write table — the warehouse
  * upsert face of the CDC pipeline (the reference's warehouse applies
  * changes by reloading staged files into Redshift,
  * `load_s3_files_to_redshift_lambda/handler.py:74-112`; a columnar lake
  * applies them as a MERGE that rewrites only the files the change set
  * touches — the Delta/Iceberg pattern, Armbrust et al. VLDB 2020).
  *
  * Layout (extends [[Snapshots]]' pointerless generation protocol with a
  * file MANIFEST, so a new generation can REFERENCE unchanged files
  * instead of copying them):
  *
  *   - `root/files/f-<gen>-<n>-<uuid>.parquet` — immutable data files;
  *     a file never changes after the rename that lands it here;
  *   - `root/_gen-N/_MANIFEST` — one line per referenced data file:
  *     `<name>\t<minKey>\t<maxKey>` (key stats computed once, at write);
  *   - `root/_gen-N/_COMMITTED` — [[Snapshots.commit]]'s atomic marker
  *     (body = commit timestamp), so generation resolution, time travel
  *     ([[Snapshots.resolveAt]]/[[Snapshots.resolveAsOf]]) and the
  *     crash contract (a generation without a marker is invisible and
  *     its files are unreachable orphans, GC'd by [[sweep]]) are all
  *     INHERITED rather than re-implemented.
  *
  * Why this shape survives 100 TB:
  *   - MERGE cost ∝ touched files + change set, NOT table size: the
  *     manifest's per-file key ranges prune un-overlapped files with
  *     ZERO reads of them (a broadcast interval semi-join of |files|
  *     manifest rows against the change keys), and the surviving
  *     files are re-referenced by name in the new manifest — no copy,
  *     no rewrite, no bytes moved;
  *   - the rewrite itself reads only candidate files (an explicit path
  *     list scan), anti-joins the net change keys, and writes the merged
  *     rows + inserts as new range-disjoint files (repartitionByRange on
  *     the key keeps future merges' touch sets narrow);
  *   - multiple changes to one key in a batch collapse FIRST
  *     (`max_by(struct, seq)` — one digest-width shuffle of the change
  *     set), so the expensive file rewrite sees one net row per key —
  *     the same last-wins contract as [[graft.cdc.ChangelogApply]].
  *
  * Concurrency contract: single writer per root (same as the
  * single-compactor contract at [[Snapshots.commit]]); [[sweep]] must
  * not run concurrently with a merge (it GCs unreferenced files, and an
  * in-flight merge's files are unreferenced until its commit).
  */
object MergeTable {

  private val FilesDir = "files"
  private val ManifestName = "_MANIFEST"

  /** One manifest row: an immutable data file + its key range + its
    * byte size (the Iceberg `file_size_in_bytes` move: planners and
    * maintenance read sizes from METADATA — without it, resolving one
    * SQL statement over a 100k-file table costs 100k getFileStatus
    * RPCs) + its ROW COUNT (Iceberg `record_count` — what lets
    * [[mergeAuto]] price a copy-on-write rewrite against a change set
    * with zero reads). Both = -1 on manifests written before their
    * column; every consumer falls back. Entries carry BY VALUE across
    * commits, so the columns thread every path for free. */
  final case class FileEntry(name: String, minKey: Long, maxKey: Long,
      bytes: Long = -1L, rows: Long = -1L)

  /** One per-file NON-KEY column range (`#cstat=` manifest line): the
    * Iceberg-manifest-column-stats idea — file skipping on ANY integral
    * column, not just the clustering key, with zero footer reads. Stats
    * are computed in the same single write-time pass as the key range,
    * carried by file name across generations (a file is immutable, so
    * its stats never change), and are PURELY ADDITIVE metadata: every
    * pre-existing reader skips `#` lines it doesn't know. */
  final case class FileStat(file: String, col: String, lo: Long, hi: Long)

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** A column value in the manifest's 64-bit ORDER DOMAIN: integral
    * columns cast exactly; strings embed through the order-preserving
    * [[graft.functions.StringPrefix64]] prefix (monotone, NOT
    * injective — coarser ranges, false keeps only). ONE definition for
    * every stats producer and consumer: the key range on the entry
    * line, the `#cstat` ranges, the bloom registry keys and the
    * merge-path touch-set prune must all agree bit-for-bit, or a file
    * holding a probed value could be skipped — silent row loss. */
  private[graft] def statVal(dt: org.apache.spark.sql.types.DataType,
      c: Column): Column = dt match {
    case org.apache.spark.sql.types.StringType =>
      graft.functions.StringPrefix64.stringPrefix64(c)
    case _ => c.cast("long")
  }

  /** COMPOSITE merge keys: the manifest's `#key=` line holds a
    * comma-separated column list (`order_id,line_no` — the CDC shape of
    * real warehouse fact tables). Identity (netting, anti/semi joins,
    * PK probes) is the full TUPLE; the manifest's per-file [min,max]
    * range covers the LEADING column only (files are range-partitioned
    * in tuple-lex order, so the leading range is tight), and the
    * TRAILING key columns ride the ordinary `#cstat` machinery — a
    * predicate on either column still skips files. ONE parsing point
    * so no consumer can split the list differently. */
  private[graft] def keyCols(key: String): Seq[String] = {
    val cols = key.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    require(cols.nonEmpty, s"empty merge key spec: '$key'")
    cols
  }

  /** The leading key column — the manifest-range/prepartition driver. */
  private[graft] def leadKey(key: String): String = keyCols(key).head

  /** Key types [[create]] accepts (each column of a composite key):
    * integral (exact 64-bit manifest ranges) and string
    * (order-preserving prefix embedding + exact-key residuals on every
    * probe). Everything else is refused LOUDLY at create — the
    * alternative is a table whose manifest ranges are silently
    * null/garbage and whose merges lose rows. The reference's own NoSQL
    * source keys on `id: STRING`
    * (`cdk_infrastructure/__init__.py:287-289`). */
  private def requireKeyType(key: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types._
    keyCols(key).foreach { k =>
      require(schema.fieldNames.contains(k),
        s"merge key column '$k' is not a column: " +
          schema.fieldNames.mkString(", "))
      schema(k).dataType match {
        case ByteType | ShortType | IntegerType | LongType | StringType => ()
        case other => throw new IllegalArgumentException(
          s"merge key column '$k' has unsupported type " +
            s"${other.simpleString} — supported key types: byte/short/" +
            "int/long (exact manifest ranges) and string (order-" +
            "preserving prefix-embedding ranges); key on a surrogate " +
            "or cast the column first")
      }
    }
  }

  /** Column names the table schema can never contain: the change-
    * envelope pair every merge face consumes (`op`/`seq` — a payload
    * column by either name would be eaten by [[netChanges]]' collapse)
    * and `change`, the marker [[graft.sources.MergeTableCdf]] appends
    * to every feed row — a table column by that name would make the
    * CDF stream emit duplicate column names and ambiguous downstream
    * selects. Checked at [[create]] AND [[addColumns]], so the
    * collision can never enter through either door. */
  private[graft] val ReservedColumns = Set("op", "seq", "change")

  private def requireUnreservedNames(
      schema: org.apache.spark.sql.types.StructType, where: String): Unit =
    schema.fieldNames.find(n =>
      ReservedColumns.contains(n.toLowerCase(java.util.Locale.ROOT)))
      .foreach(n => throw new IllegalArgumentException(
        s"$where: column '$n' is reserved — op/seq are the change-" +
          "envelope names every merge consumes, and 'change' is the " +
          "CDF feed marker (merge-cdf would emit duplicate columns)"))

  /** The LEADING key column's declared type, when the manifest recorded
    * a schema (every create since evolution support does); None on
    * legacy manifests, where the key was integral by construction. */
  private def keyType(
      m: GenMeta): Option[org.apache.spark.sql.types.DataType] =
    m.schema.map(_.apply(leadKey(m.key)).dataType)

  private def filePath(root: String, name: String) = s"$root/$FilesDir/$name"
  private[graft] def dataFilePath(root: String, name: String) =
    filePath(root, name)

  private def manifestText(spark: SparkSession, genDir: String): String = {
    val p = new Path(genDir, ManifestName)
    val f = fs(spark, p)
    require(f.exists(p), s"no $ManifestName under $genDir — not a MergeTable generation")
    val in = f.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** EVERY metadata face of one generation's manifest, parsed from ONE
    * read. Commit paths consult 5-9 of these per operation; before this
    * view each accessor re-opened and re-split the manifest — on object
    * storage that is ~9 remote GETs per DML commit for one small file. */
  final case class GenMeta(entries: Seq[FileEntry], key: String,
      dvs: Seq[String], cstats: Seq[FileStat],
      schema: Option[org.apache.spark.sql.types.StructType],
      batchId: Option[Long], applied: Option[Long],
      sbatch: Map[String, Long])

  def genMeta(spark: SparkSession, genDir: String): GenMeta =
    parseMeta(manifestText(spark, genDir), genDir)

  private def parseMeta(text: String, genDir: String): GenMeta = {
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val entries = lines.filterNot(_.startsWith("#")).map { line =>
      line.split("\t") match {
        case Array(name, lo, hi) => FileEntry(name, lo.toLong, hi.toLong)
        case Array(name, lo, hi, bytes) =>
          FileEntry(name, lo.toLong, hi.toLong, bytes.toLong)
        case Array(name, lo, hi, bytes, rows) =>
          FileEntry(name, lo.toLong, hi.toLong, bytes.toLong, rows.toLong)
        case _ => throw new IllegalStateException(
          s"malformed manifest line under $genDir: '$line'")
      }
    }
    def one(prefix: String): Option[String] =
      lines.collectFirst { case l if l.startsWith(prefix) =>
        l.stripPrefix(prefix) }
    GenMeta(
      entries = entries,
      key = one("#key=").getOrElse(throw new IllegalStateException(
        s"manifest under $genDir carries no #key metadata")),
      dvs = lines.collect { case l if l.startsWith("#dv=") =>
        l.stripPrefix("#dv=") },
      cstats = lines.collect { case l if l.startsWith("#cstat=") =>
        val Array(file, c, lo, hi) = l.stripPrefix("#cstat=").split("\t")
        FileStat(file, c, lo.toLong, hi.toLong) },
      schema = one("#schema=").map(j =>
        org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]),
      batchId = one("#batch=").map(_.toLong),
      applied = one("#applied=").map(_.toLong),
      sbatch = lines.collect { case l if l.startsWith("#sbatch=") =>
        val Array(sid, id) = l.stripPrefix("#sbatch=").split("\t", 2)
        sid -> id.toLong }.toMap)
  }

  /** Parse the manifest of a resolved generation directory (metadata
    * lines, `#key=value`, are skipped — see [[appliedBatchId]]). */
  def manifest(spark: SparkSession, genDir: String): Seq[FileEntry] =
    genMeta(spark, genDir).entries

  /** The streaming batch id recorded at the CURRENT generation's commit,
    * if it was written by [[mergeExactlyOnce]] — the watermark a
    * restarted stream compares its replayed batch ids against. */
  def appliedBatchId(spark: SparkSession, root: String): Option[Long] =
    Snapshots.currentGen(spark, root).flatMap(g =>
      batchIdOf(spark, Snapshots.genDir(root, g)))

  private def batchIdOf(spark: SparkSession, genDir: String): Option[Long] =
    genMeta(spark, genDir).batchId

  /** Per-STREAM applied batch ids (`#sbatch=` manifest lines) — the
    * multi-writer generalization of [[appliedBatchId]]: N independent
    * streams share one table, each with its own replay fence. Carried
    * forward by every commit (merge, maintenance, DML, rollback), so a
    * compaction between a batch and its restart-replay never forgets
    * that the batch already applied. */
  def appliedStreamBatchIds(spark: SparkSession,
      root: String): Map[String, Long] =
    Snapshots.currentGen(spark, root).map(g =>
      streamBatchIds(spark, Snapshots.genDir(root, g))).getOrElse(Map.empty)

  private def streamBatchIds(spark: SparkSession,
      genDir: String): Map[String, Long] =
    genMeta(spark, genDir).sbatch

  /** The DELETION VECTORS a generation references (`#dv=` manifest
    * metadata lines): parquet sidecars of (file, pos) positional deletes,
    * the merge-on-read half of the table format (Iceberg v2 position
    * deletes / Delta deletion vectors). Order preserved = append order. */
  def dvNames(spark: SparkSession, genDir: String): Seq[String] =
    genMeta(spark, genDir).dvs

  /** The generation's per-file column ranges (`#cstat=` lines). */
  def colStats(spark: SparkSession, genDir: String): Seq[FileStat] =
    genMeta(spark, genDir).cstats

  /** Current-generation manifest. */
  def currentManifest(spark: SparkSession, root: String): Seq[FileEntry] = {
    val g = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    manifest(spark, Snapshots.genDir(root, g))
  }

  private def currentGenDir(spark: SparkSession, root: String): String = {
    val g = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    Snapshots.genDir(root, g)
  }

  /** The generation's RECORDED table schema (`#schema=` manifest line,
    * compact Catalyst json) — what makes additive evolution serveable
    * without footer reads: files written before a column existed are
    * read THROUGH this schema and null-fill it. Absent on manifests
    * written before evolution support (then the footer schema rules,
    * which is correct because such tables never evolved). */
  def tableSchema(spark: SparkSession,
      genDir: String): Option[org.apache.spark.sql.types.StructType] =
    genMeta(spark, genDir).schema

  /** All fields nullable — the shape schema-on-read demands (an old
    * file null-fills evolved columns, so nothing may claim non-null). */
  private def asNullable(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)))

  // ========== COLUMN MAPPING (metadata-only RENAME / DROP) ==========
  //
  // Delta-style column mapping expressed through the recorded #schema=
  // line alone: data files are IMMUTABLE and keep the column names they
  // were written with, so a rename records the old name in the field's
  // `graft.prev` metadata (a name chain, oldest first) and a drop HIDES
  // the field (`graft.dropped` + a synthetic logical name) — both are
  // O(1) metadata commits at any table size. Readers expand the chain:
  // the scan requests every stored name as a typed column (files
  // lacking one null-fill it — exactly one alias carries data per
  // file) and projects coalesce(newest..oldest) AS the logical name.
  // Stats need no rewrite either: a file's #cstat/bloom entries are
  // keyed by its name-at-write, which IS one of the chain's aliases,
  // so pruning consults the chain. Per-generation schemas give time
  // travel the old names for free, and a whole-table [[compact]]
  // rewrites every row under current names — its committed schema is
  // the rewrite's own (plain) schema, so the chain CLEARS at the next
  // full compaction.

  private val PrevKey = "graft.prev"
  private val HiddenKey = "graft.dropped"
  // the FIELD-IDENTITY half of the mapping (round 17): a field whose
  // logical name is decoupled from the name NEW files write it under.
  // Minted in two places — ADD COLUMNS re-taking a name retained files
  // still store bytes under (the re-add-after-drop ask: the fresh field
  // gets a unique physical name, so the dropped namesake's bytes stay
  // unreachable), and RENAME onto a stored name (the field keeps
  // writing under its current physical name; only the logical label
  // moves). This is Delta's field-id mapping expressed in the same
  // name-chain machinery: physName IS the id, reads/stats/blooms
  // already key by name-at-write.
  private val PhysKey = "graft.phys"

  private[graft] def isHidden(
      f: org.apache.spark.sql.types.StructField): Boolean =
    f.metadata.contains(HiddenKey) && f.metadata.getBoolean(HiddenKey)

  /** The field's PRIOR stored names, oldest first (empty when never
    * renamed). */
  private[graft] def prevNames(
      f: org.apache.spark.sql.types.StructField): Seq[String] =
    if (f.metadata.contains(PrevKey))
      f.metadata.getString(PrevKey).split(',').toSeq.filter(_.nonEmpty)
    else Seq.empty

  /** The name NEW data files write this field under — the logical name
    * unless a `graft.phys` identity decouples them. */
  private[graft] def physName(
      f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
    else f.name

  /** Every name under which this field's data exists in retained data
    * files (a hidden field's current name is synthetic — never
    * stored). */
  private[graft] def storedNames(
      f: org.apache.spark.sql.types.StructField): Seq[String] =
    prevNames(f) ++ (if (isHidden(f)) Seq.empty else Seq(physName(f)))

  private[graft] def hasMapping(
      s: org.apache.spark.sql.types.StructType): Boolean =
    s.fields.exists(f => isHidden(f) || prevNames(f).nonEmpty ||
      physName(f) != f.name)

  private[graft] def visibleStruct(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.filterNot(isHidden))

  /** Visible field names — what every merge/read face means by "the
    * table's columns" once a drop can hide a field. */
  private[graft] def visibleCols(
      s: org.apache.spark.sql.types.StructType): Seq[String] =
    visibleStruct(s).fieldNames.toSeq

  /** All stored names a logical (visible) column may be keyed by in
    * per-file stats and bloom registries. A name with no mapped field
    * is its own alias set (the unmapped fast path). */
  private[graft] def aliasSet(
      schema: Option[org.apache.spark.sql.types.StructType],
      logical: String): Seq[String] =
    schema.flatMap(_.fields.find(f => !isHidden(f) && f.name == logical))
      .map(storedNames).getOrElse(Seq(logical))

  /** The scan-side schema of a mapped table: one typed column per
    * stored name of each VISIBLE field (hidden fields are never
    * requested — their bytes stay dark in the files). */
  private[graft] def expandedReadSchema(
      s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      visibleStruct(s).fields.flatMap(f => storedNames(f).map(a =>
        org.apache.spark.sql.types.StructField(a, f.dataType,
          nullable = true))))

  /** The projection restoring logical names over an expanded scan:
    * exactly one alias carries data per file, so coalesce(newest..
    * oldest) is exact, not a guess. */
  private[graft] def logicalProjection(
      s: org.apache.spark.sql.types.StructType): Seq[Column] =
    visibleStruct(s).fields.toSeq.map { f =>
      val as = storedNames(f).reverse.map(col)
      (if (as.size == 1) as.head else coalesce(as: _*)).as(f.name)
    }

  /** The current generation's one-read metadata view — what a SQL
    * command that needs key + schema + probe + read should fetch ONCE
    * instead of letting each public face re-GET the same manifest
    * (the N-reads-per-DML cost [[GenMeta]] exists to avoid). */
  private[graft] def currentMeta(spark: SparkSession, root: String): GenMeta =
    genMeta(spark, currentGenDir(spark, root))

  /** The table state of an already-fetched generation meta. */
  private[graft] def readMeta(spark: SparkSession, root: String,
      m: GenMeta): DataFrame =
    readFiles(spark, root, m.entries, m.dvs, m.schema)

  /** Read the current table state: manifest-directed path-list scan,
    * minus the generation's deletion vectors (if any). */
  def read(spark: SparkSession, root: String): DataFrame =
    readMeta(spark, root, currentMeta(spark, root))

  /** The current manifest entries whose key range intersects [lo, hi]
    * — the file set a key-predicate read must touch. Pure metadata:
    * |files| interval tests, zero reads. */
  def prunedEntries(spark: SparkSession, root: String,
      lo: Long, hi: Long): Seq[FileEntry] =
    currentManifest(spark, root).filter(e => e.maxKey >= lo && e.minKey <= hi)

  /** Key-predicate read: the table rows with key in [lo, hi], scanning
    * ONLY the manifest-pruned files (through the generation's deletion
    * vectors). The point-lookup/serving face of the manifest stats: a
    * single-key probe of a 100 TB table opens the one file whose range
    * covers the key — the same footer-stats argument as the z-ordered
    * layouts, lifted to file granularity with zero footer reads (the
    * ranges live in the manifest, computed once at write). The residual
    * filter still runs (a file's range can over-approximate), and
    * parquet row-group stats prune WITHIN the file because [[merge]]'s
    * writer range-partitions + the key filter is pushed. */
  def readWhereKey(spark: SparkSession, root: String,
      lo: Long, hi: Long): DataFrame = {
    val m = genMeta(spark, currentGenDir(spark, root))
    // string-keyed tables: the Long lo/hi would compare against prefix
    // EMBEDDINGS in the manifest but CAST(key AS LONG) — null for any
    // non-numeric string — in the residual: silent empty results. The
    // string face is readWhere(col(key).between("a", "b")).
    val lead = leadKey(m.key)
    require(!keyType(m).contains(org.apache.spark.sql.types.StringType),
      s"readWhereKey is the integral-key face; '$root' is keyed on " +
        s"string column '$lead' — use readWhere(col(\"$lead\")" +
        ".between(lo, hi)) with string bounds")
    val entries = m.entries.filter(e => e.maxKey >= lo && e.minKey <= hi)
    if (entries.isEmpty)
      // no file can hold the key: an empty frame in the table's schema
      readFiles(spark, root, m.entries.take(1), schema = m.schema).limit(0)
    else
      readFiles(spark, root, entries, m.dvs, m.schema)
        .filter(col(lead).cast("long").between(lo, hi))
  }

  /** [[readWhereKey]] generalized to ANY integral column via the
    * manifest's `#cstat=` per-file ranges: scan only the files whose
    * recorded range for `column` intersects [lo, hi]. A file with NO
    * recorded range for the column is UNKNOWN and always read —
    * pruning may only ever skip provably-disjoint files — so the read
    * stays correct over manifests written before the stats existed (or
    * over an all-NULL file). This is the Iceberg-manifest-column-stats
    * move: non-key predicates skip files with zero footer reads, which
    * at 100 TB is the difference between scanning a value band and
    * scanning the table — the merge writer range-partitions by KEY, so
    * key-correlated columns (timestamps, monotone ids) cluster into
    * narrow per-file ranges for free. */
  def readWhereCol(spark: SparkSession, root: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val m = genMeta(spark, currentGenDir(spark, root))
    // same refusal as readWhereKey: a string column's #cstat ranges are
    // embeddings, and CAST(strCol AS LONG) in the residual silently
    // empties the result — the string face is readWhere with a predicate
    require(!m.schema.exists(s => s.fieldNames.contains(column) &&
      s(column).dataType == org.apache.spark.sql.types.StringType),
      s"readWhereCol is the integral-column face; '$column' is a string " +
        s"column — use readWhere(col(\"$column\").between(lo, hi)) " +
        "with string bounds")
    // alias-chain lookup: a renamed column's per-file entries are keyed
    // by its name-at-write (at most one alias entry per file)
    val names = aliasSet(m.schema, column).toSet
    val ranges = m.cstats.filter(s => names.contains(s.col))
      .map(s => s.file -> s).toMap
    val candidates = m.entries.filter(e =>
      ranges.get(e.name).forall(s => s.hi >= lo && s.lo <= hi))
    if (candidates.isEmpty)
      readFiles(spark, root, m.entries.take(1), schema = m.schema).limit(0)
    else
      readFiles(spark, root, candidates, m.dvs, m.schema)
        .filter(col(column).cast("long").between(lo, hi))
  }

  /** Conservative per-column bounds extracted from a predicate's
    * CONJUNCTS: =, <, <=, >, >= and BETWEEN over literal ints/longs
    * (either operand order) and over literal STRINGS — a string literal
    * bounds as its order-preserving [[graft.functions.StringPrefix64]]
    * embedding, intersecting the same `#cstat` ranges the writer stores
    * for string columns (strict string bounds stay INCLUSIVE: the
    * embedding is monotone but not injective, so `c < v` admits
    * emb = emb(v)). Anything unrecognized — a disjunction, a
    * non-literal comparison, another type — simply extracts nothing for
    * its columns, which makes the pruning built on it unconditionally
    * safe (an unknown never skips a file). */
  private[graft] def extractBounds(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Map[String, (Long, Long)] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def name(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    // (value, tight): tight = an integral value whose strict bounds may
    // shave ±1; a string EMBEDDING is coarse, so strict stays inclusive
    def litVal(x: Expression): Option[(Long, Boolean)] = x match {
      case Literal(v: Int, _) => Some((v.toLong, true))
      case Literal(v: Long, _) => Some((v, true))
      case Literal(v: Short, _) => Some((v.toLong, true))
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some((graft.functions.StringPrefix64.embed(s), false))
      // the analyzer wraps literals in implicit casts when the column
      // type differs (k > 5 on a LONG column). EVALUATE the foldable
      // cast rather than unwrapping to the pre-cast child: under
      // non-ANSI semantics a value-CHANGING narrowing cast (e.g.
      // CAST(5000000000 AS INT) overflows to 705032704) compares with
      // the post-cast value, and bounding by the pre-cast one would
      // skip provably-matching files — silent row loss.
      case c: Cast if c.foldable => c.eval() match {
        case v: Int => Some((v.toLong, true))
        case v: Long => Some((v, true))
        case v: Short => Some((v.toLong, true))
        case v: Byte => Some((v.toLong, true))
        case _ => None
      }
      case _ => None
    }
    def below(v: (Long, Boolean)): Long = if (v._2) v._1 - 1 else v._1
    def above(v: (Long, Boolean)): Long = if (v._2) v._1 + 1 else v._1
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val perConjunct: Seq[(String, (Long, Long))] = conjuncts(e).flatMap {
      case EqualTo(a, b) =>
        name(a).zip(litVal(b)).map { case (n, v) => n -> (v._1, v._1) } ++
          name(b).zip(litVal(a)).map { case (n, v) => n -> (v._1, v._1) }
      case LessThan(a, b) =>
        name(a).zip(litVal(b)).map { case (n, v) => n -> (Long.MinValue, below(v)) } ++
          name(b).zip(litVal(a)).map { case (n, v) => n -> (above(v), Long.MaxValue) }
      case LessThanOrEqual(a, b) =>
        name(a).zip(litVal(b)).map { case (n, v) => n -> (Long.MinValue, v._1) } ++
          name(b).zip(litVal(a)).map { case (n, v) => n -> (v._1, Long.MaxValue) }
      case GreaterThan(a, b) =>
        name(a).zip(litVal(b)).map { case (n, v) => n -> (above(v), Long.MaxValue) } ++
          name(b).zip(litVal(a)).map { case (n, v) => n -> (Long.MinValue, below(v)) }
      case GreaterThanOrEqual(a, b) =>
        name(a).zip(litVal(b)).map { case (n, v) => n -> (v._1, Long.MaxValue) } ++
          name(b).zip(litVal(a)).map { case (n, v) => n -> (Long.MinValue, v._1) }
      // SQL-parsed BETWEEN survives analysis as a first-class Between
      // expression in Spark 4 (the Column API still expands to >=/<=)
      case Between(a, lo, hi, _) =>
        name(a).zip(litVal(lo).zip(litVal(hi)))
          .map { case (n, (l, h)) => n -> (l._1, h._1) }
      case _ => Seq.empty
    }
    perConjunct.groupBy(_._1).view.mapValues(_.map(_._2)
      .reduce((x, y) => (math.max(x._1, y._1), math.min(x._2, y._2)))).toMap
  }

  /** Per-column POINT SETS extracted from a predicate's conjuncts —
    * the multi-point-lookup complement of [[extractBounds]]' single
    * interval: `IN` lists (catalyst `In` over literals; `InSet` after
    * the optimizer's OptimizeIn conversion, which is what the SQL
    * path's pushed dataFilters carry past the 10-value threshold) and
    * or-of-equalities on ONE column. Values enter the manifest's order
    * domain exactly like [[extractBounds]]' (string literals as their
    * [[graft.functions.StringPrefix64]] embedding — the same value the
    * `#cstat` ranges and bloom registries store, so probe and index
    * agree bit-for-bit). Several point conjuncts on one column
    * INTERSECT. Anything unrecognized (a NULL in the list, a
    * non-literal element, mixed columns under an Or) extracts nothing
    * for its columns — unknown never prunes.
    *
    * The consumer's contract is ∃-semantics per file: a candidate
    * survives for a column iff SOME point lands in the file's recorded
    * range AND survives its bloom — see [[pruneByCondition]]. */
  private[graft] def extractPoints(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Map[String, Seq[Long]] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    def name(x: Expression): Option[String] = x match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    def litVal(x: Expression): Option[Long] = x match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
        Some(graft.functions.StringPrefix64.embed(s))
      // same foldable-cast rule as extractBounds: compare with the
      // POST-cast value or not at all (a narrowing cast changes it)
      case c: Cast if c.foldable => c.eval() match {
        case v: Int => Some(v.toLong)
        case v: Long => Some(v)
        case v: Short => Some(v.toLong)
        case v: Byte => Some(v.toLong)
        case _ => None
      }
      case _ => None
    }
    // an InSet carries RAW internal values, not Literal wrappers
    def setVal(x: Any): Option[Long] = x match {
      case v: Int => Some(v.toLong)
      case v: Long => Some(v)
      case v: Short => Some(v.toLong)
      case v: Byte => Some(v.toLong)
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Some(graft.functions.StringPrefix64.embed(s))
      case _ => None
    }
    def conjuncts(x: Expression): Seq[Expression] = x match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def disjuncts(x: Expression): Seq[Expression] = x match {
      case Or(l, r) => disjuncts(l) ++ disjuncts(r)
      case other => Seq(other)
    }
    val perConjunct: Seq[(String, Seq[Long])] = conjuncts(e).flatMap {
      case In(a, vs) if vs.nonEmpty =>
        name(a).flatMap { n =>
          val pts = vs.map(litVal)
          if (pts.forall(_.isDefined)) Some(n -> pts.flatten) else None
        }
      case s: InSet if s.hset != null && s.hset.nonEmpty =>
        name(s.child).flatMap { n =>
          val pts = s.hset.toSeq.map(setVal)
          if (pts.forall(_.isDefined)) Some(n -> pts.flatten) else None
        }
      case o: Or =>
        // k = 1 OR k = 3 (either operand order), all on ONE column
        val eqs = disjuncts(o).map {
          case EqualTo(a, b) =>
            name(a).zip(litVal(b)).orElse(name(b).zip(litVal(a)))
          case _ => None
        }
        eqs.flatten match {
          case all if all.size == eqs.size && all.map(_._1).distinct.size == 1 =>
            Some(all.head._1 -> all.map(_._2))
          case _ => None
        }
      case _ => None
    }
    perConjunct.groupBy(_._1).view.mapValues(_.map(_._2.toSet)
      .reduce(_ intersect _).toSeq.sorted).toMap
  }

  private def bloomDir(root: String, column: String): String =
    s"$root/blooms/$column"

  /** Registry format witness: probes of STRING columns are keyed on the
    * [[graft.functions.StringPrefix64]] embedding since this marker's
    * version — a registry built BEFORE that (cast-to-long keys) probed
    * with an embedding would return false for values that exist, i.e.
    * FALSE FILE SKIPS. So: [[bloomRefine]] prunes only through a
    * marker-carrying registry (legacy ones degrade to no pruning, never
    * to row loss), and [[ensureBloomIndex]] drops-and-rebuilds a
    * marker-less registry it is asked to extend. The marker file is
    * underscore-prefixed, so parquet readers of the dir skip it. */
  private val BloomFormat = "prefix64-v2"

  private def bloomFormatOk(spark: SparkSession, dir: Path): Boolean = {
    val f = fs(spark, dir)
    val p = new Path(dir, "_FORMAT")
    // to-EOF read: a short read's PREFIX of "prefix64-v2" would
    // misclassify a valid registry as legacy — silently disabling
    // pruning AND making ensureBloomIndex drop and rebuild it
    f.exists(p) && Snapshots.readMarker(spark, p).trim == BloomFormat
  }

  private def writeBloomFormat(spark: SparkSession, dir: Path): Unit = {
    val f = fs(spark, dir)
    val out = f.create(new Path(dir, "_FORMAT"), true)
    out.write(BloomFormat.getBytes("UTF-8"))
    out.close()
  }

  /** Build (or top up) the per-FILE Bloom registry for `column` — the
    * point-probe complement of the `#cstat` ranges: a range prunes
    * bands, but an UNCORRELATED column's per-file ranges all span the
    * domain, so an equality probe prunes nothing by range — while a
    * ~10-bit-per-row bloom answers "is value v possibly in this file?"
    * per file with no reads at query time (Iceberg's puffin-stats
    * move). Opt-in like the other materialized indexes; one
    * distributed pass builds filters for every current file MISSING an
    * entry (files are immutable ⇒ so are their filters; files appended
    * later simply have no entry — unknown, never pruned — until the
    * next ensure). Registry rows for retired files are inert (file
    * names are unique, lookups are by name). False positives only ADD
    * files to a scan; a file containing v can never be skipped.
    * Returns how many file filters were built. */
  /** Per-JVM coverage memo (r19): bloom-registry dir → (the manifest
    * file-name set it was last verified to cover, the registry dir's
    * own filesystem signature at that verification). Manifest and
    * registry sig are re-read every call (cheap local walks), so a new
    * commit OR a replaced/modified registry (e.g. the legacy-format
    * drop-and-rebuild path) invalidates; the memo only skips
    * re-running the registry-coverage collect job when literally
    * nothing changed. */
  private val verifiedBloomCover =
    new java.util.concurrent.ConcurrentHashMap[String, (Set[String], String)]()

  def ensureBloomIndex(spark: SparkSession, root: String, column: String,
      fpp: Double = 0.01): Int = {
    val m = genMeta(spark, currentGenDir(spark, root))
    val cur = m.entries.map(_.name)
    // the registry DIR is named by the column's newest STORED alias
    // (its physical identity) — the name [[bloomRefine]]'s alias-chain
    // probes consult. Unmapped columns: alias set = [column], so the
    // dir name is unchanged from every registry built before mapping
    // existed.
    val registryName = aliasSet(m.schema, column).last
    val memoKey = s"${bloomDir(root, registryName)}#$column"
    def memoVal = (cur.toSet,
      graft.ops.Layout.dataSig(bloomDir(root, registryName)))
    if (verifiedBloomCover.get(memoKey) == memoVal) return 0
    val dir = new Path(bloomDir(root, registryName))
    val f = fs(spark, dir)
    val existing: Set[String] =
      if (!f.exists(dir)) Set.empty
      else if (!bloomFormatOk(spark, dir)) {
        // a pre-embedding (legacy) registry: its keys would poison the
        // probe side — drop and rebuild everything under this format
        f.delete(dir, true)
        Set.empty
      }
      else spark.read.parquet(bloomDir(root, registryName))
        .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    val missing = cur.filterNot(existing)
    if (missing.isEmpty) { verifiedBloomCover.put(memoKey, memoVal); return 0 }
    // read through the RECORDED table schema (the readFiles discipline):
    // on an evolved table some missing files predate `column`; resolving
    // an arbitrary footer schema would fail or mis-bind, while the
    // recorded schema null-fills — and null values index to nothing.
    val mapped = m.schema.exists(hasMapping)
    val rdr = m.schema.fold(spark.read)(s => spark.read.schema(asNullable(
      if (mapped) expandedReadSchema(s) else s)))
    val raw = rdr.parquet(missing.map(filePath(root, _)): _*)
    // a STRING column indexes its StringPrefix64 embedding — the SAME
    // value extractBounds hands bloomRefine for a string equality, so
    // build and probe agree bit-for-bit (strings past 8 bytes share
    // keys: false positives only, the bloom contract). A RENAMED
    // column's values live under its name-at-write per file: coalesce
    // the alias chain, or a pre-rename file would index as all-NULL —
    // "provably contains no value" — and equality probes would
    // FALSE-SKIP it (row loss, the one bloom sin).
    val (vType, vCol) = m.schema match {
      case Some(s) if mapped =>
        val f = visibleStruct(s).apply(column)
        val as = storedNames(f).reverse.map(col)
        (f.dataType, if (as.size == 1) as.head else coalesce(as: _*))
      case _ => (raw.schema(column).dataType, col(column))
    }
    val vExpr = statVal(vType, vCol)
    val scan = raw
      .select(vExpr.as("v"),
        element_at(split(expr("_metadata.file_path"), "/"), -1).as("file"))
      .where(col("v").isNotNull)
    // filters sized for the largest file (same size everywhere keeps
    // the build one pass; a file's fpp only ever improves)
    val maxRowsRow = scan.groupBy(col("file")).count()
      .agg(max(col("count"))).head
    // a file whose column is entirely NULL produces no bloom group; it
    // gets a NULL-bloom registry row — "provably contains no value" —
    // which keeps the build idempotent (the file is no longer missing)
    // and lets equality probes prune it outright (an all-null file
    // cannot match any equality)
    import spark.implicits._
    val built =
      if (maxRowsRow.isNullAt(0)) // every missing file is all-NULL
        missing.toDF("file").withColumn("bloom", lit(null).cast("binary"))
      else missing.toDF("file").join(
        graft.functions.BloomFilters
          .perGroupBlooms(scan, "file", "v", maxRowsRow.getLong(0), fpp),
        Seq("file"), "left")
    built.coalesce(1).write.mode("append")
      .parquet(bloomDir(root, registryName))
    writeBloomFormat(spark, dir)
    verifiedBloomCover.put(memoKey, memoVal)
    missing.size
  }

  /** The equality-probe refinement [[readWhere]] applies when a bloom
    * registry exists for a probed column: drop candidate files whose
    * filter proves the value absent. Planner-side (|candidates| local
    * probes), zero jobs beyond the registry read. */
  private[graft] def bloomRefine(spark: SparkSession, root: String,
      candidates: Seq[FileEntry], column: String, v: Long): Seq[FileEntry] =
    bloomTableFor(spark, root, column, candidates) match {
      case None => candidates
      // a NULL bloom records an all-null file: no value can match
      case Some(blooms) => candidates.filter(e => blooms.get(e.name).forall(
        b => b != null && graft.functions.BloomFilters.mightContainLong(b, v)))
    }

  /** The candidate-scoped bloom registry for `column`, loaded ONCE —
    * None when no registry exists or a pre-embedding legacy one does
    * (never prune through those: a legacy registry probed with
    * embedded keys would false-skip — row loss). Multi-point probes
    * ([[extractPoints]]) share one load across all their values. */
  private def bloomTableFor(spark: SparkSession, root: String,
      column: String, candidates: Seq[FileEntry])
      : Option[Map[String, Array[Byte]]] = {
    val dir = new Path(bloomDir(root, column))
    if (!fs(spark, dir).exists(dir) || !bloomFormatOk(spark, dir)) None
    else {
      val names = candidates.map(_.name).toSet
      Some(spark.read.parquet(bloomDir(root, column))
        .filter(col("file").isin(names.toSeq: _*))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("bloom"))
        .toMap)
    }
  }

  /** Predicate-driven read — [[readWhereKey]]/[[readWhereCol]] unified
    * behind the API a query engine actually presents: extract
    * conservative per-column bounds from the predicate's conjuncts,
    * intersect them with the manifest's per-file ranges (the key range
    * from the entry line, every other integral column from its
    * `#cstat=` line), scan ONLY the files no bound excludes, and apply
    * the FULL predicate as the residual filter over the DV-applied
    * scan. Mirrors what a DSv2 pushdown would do, with the manifest as
    * the statistics source — zero footer reads to prune. */
  /** File skipping from a RESOLVED condition: conjunct bounds against
    * the manifest's key + `#cstat` ranges, equality conjuncts refined
    * through the bloom registry. Shared by the Column-API paths below
    * and by [[graft.plans.MergeTableFileIndex]], which hands Spark's
    * own pushed dataFilters straight here — the manifest as the
    * statistics source for the SQL scan. */
  private[graft] def pruneByCondition(spark: SparkSession, root: String,
      m: GenMeta,
      cond: Option[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[FileEntry] = {
    val entries = m.entries
    // the SQL path pushes predicates THROUGH the alias-restoring
    // projection of a mapped table, so a bound arrives as
    // `coalesce(new, old…) >= v`. When a Coalesce's children are
    // attribute references whose name set is EXACTLY some mapped
    // field's stored-name chain, it IS our projection (user SQL cannot
    // name the non-visible old aliases), and exactly one child is
    // non-null per row — collapsing it to its newest child lets
    // extractBounds read it, and the per-file alias-chain lookup below
    // covers files keyed under any older name. Any other Coalesce is
    // left alone (collapsing a general coalesce would false-skip).
    val chains: Set[Set[String]] = m.schema match {
      case Some(s) if hasMapping(s) =>
        visibleStruct(s).fields.toSet[org.apache.spark.sql.types.StructField]
          .map(f => storedNames(f).toSet).filter(_.size > 1)
      case _ => Set.empty
    }
    val collapsed = cond.map { c =>
      if (chains.isEmpty) c
      else c.transform {
        case co: org.apache.spark.sql.catalyst.expressions.Coalesce
            if co.children.forall(_.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.AttributeReference])
              && chains.contains(co.children.map(_.asInstanceOf[
                org.apache.spark.sql.catalyst.expressions
                  .AttributeReference].name).toSet) =>
          co.children.head
      }
    }
    val bounds = collapsed.map(extractBounds).getOrElse(Map.empty)
    val points = collapsed.map(extractPoints).getOrElse(Map.empty)
    // Alias resolution for a PROBE name, which may be a LOGICAL label
    // (the Column-API path filters above the logical projection) or a
    // PHYSICAL scan column (the SQL path pushes below it). A label-only
    // rename can make one field's label equal a DIFFERENT field's
    // physical name — resolving such a name by label would judge the
    // probe against the wrong field's stats/blooms and false-skip files
    // (row loss). Ambiguous names resolve to NOTHING: unknown never
    // prunes.
    def probeAliases(c: String): Seq[String] = m.schema match {
      case Some(sch) =>
        val vis = visibleStruct(sch).fields
        val labeled = vis.find(_.name == c)
        val physOwners = vis.count(f => f.name != c &&
          storedNames(f).contains(c))
        labeled match {
          case Some(f) if physOwners == 0 => storedNames(f)
          case None => Seq(c) // physical or unmapped: stats keyed by it
          case Some(_) => Seq.empty // label-vs-phys ambiguity: no pruning
        }
      case None => Seq(c)
    }
    val ranges: Map[(String, String), (Long, Long)] =
      m.cstats.map(s => (s.file, s.col) -> (s.lo, s.hi)).toMap ++
        entries.map(e =>
          (e.name, leadKey(m.key)) -> (e.minKey, e.maxKey)).toMap
    // a renamed column's per-file stats are keyed by its NAME-AT-WRITE:
    // consult the whole alias chain (exactly one entry exists per file;
    // a file with no entry under any alias is unknown — always read)
    val byRange = entries.filter(e => bounds.forall { case (c, (lo, hi)) =>
      probeAliases(c).flatMap(a => ranges.get((e.name, a)))
        .headOption.forall(r => r._2 >= lo && r._1 <= hi)
    })
    // equality conjuncts additionally consult the per-file bloom
    // registry when one was built (ensureBloomIndex) — the point-probe
    // pruning ranges cannot give an uncorrelated column. A registry may
    // exist under ANY alias (built before or after a rename); each one
    // describes the same logical values, so refining through all of
    // them only ever drops provably-absent files.
    val eqRefined =
      bounds.collect { case (c, (lo, hi)) if lo == hi => (c, lo) }
        .foldLeft(byRange) { case (cand, (c, v)) =>
          probeAliases(c).foldLeft(cand) { (cc, a) =>
            if (cc.isEmpty) cc else bloomRefine(spark, root, cc, a, v)
          }
        }
    // MULTI-POINT lookups (IN lists / or-of-equalities,
    // extractPoints): ∃-semantics per file — a candidate survives iff
    // SOME point lands inside its recorded range AND survives its
    // bloom (range and bloom judged on the SAME point: passing the
    // range on one value and the bloom on another proves nothing).
    // The classic `WHERE k IN (k1, k2, k3)` then opens the UNION of
    // the per-point candidate sets instead of scanning the table; an
    // empty point set (a provably-false `IN(1) AND IN(2)`) opens
    // nothing. Registries may exist under ANY alias of a renamed
    // column; each describes the same logical values, so requiring
    // every present registry to admit the point only drops
    // provably-absent files. A file with NO recorded range stays
    // unknown on the range half (bloom may still prove absence).
    points.foldLeft(eqRefined) { case (cand, (c, vs)) =>
      if (cand.isEmpty) cand
      else {
        val aliases = probeAliases(c)
        val registries = aliases.flatMap(a =>
          bloomTableFor(spark, root, a, cand))
        cand.filter { e =>
          val r = aliases.flatMap(a => ranges.get((e.name, a))).headOption
          vs.exists(v =>
            r.forall(x => v >= x._1 && v <= x._2) &&
              registries.forall(bm => bm.get(e.name).forall(b =>
                b != null &&
                  graft.functions.BloomFilters.mightContainLong(b, v))))
        }
      }
    }
  }

  private def prunedByPredicate(spark: SparkSession, root: String,
      m: GenMeta, predicate: Column): Seq[FileEntry] = {
    // resolve the Column against the table schema by analyzing a
    // zero-row probe: the Filter node's condition is the catalyst
    // expression (with the analyzer's implicit casts in place) the
    // bounds walk consumes — the public-API route to what a DSv2
    // pushFilters hook would be handed
    val probeCond = readFiles(spark, root, m.entries.take(1),
      schema = m.schema).limit(0)
      .filter(predicate).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
    pruneByCondition(spark, root, m, probeCond)
  }

  def readWhere(spark: SparkSession, root: String,
      predicate: Column): DataFrame = {
    val m = genMeta(spark, currentGenDir(spark, root))
    val candidates = prunedByPredicate(spark, root, m, predicate)
    if (candidates.isEmpty)
      readFiles(spark, root, m.entries.take(1),
        schema = m.schema).limit(0).filter(predicate)
    else
      readFiles(spark, root, candidates, m.dvs, m.schema)
        .filter(predicate)
  }

  /** DELETE WHERE — predicate delete without change rows (the Delta
    * `DELETE FROM t WHERE ...` face; the reference's NoSQL path only
    * ever deletes by key, `load_data_to_dynamodb_lambda/handler.py:17`,
    * but curation at 100 TB deletes by PREDICATE: "drop every row
    * matching X"). STATS-DISPATCHED like [[mergeAuto]], because the two
    * physical shapes fail in opposite regimes:
    *
    *   - merge-on-read (the trickle shape): manifest prunes to
    *     candidate files, ONLY those are scanned for matching
    *     positions, one DV sidecar kills them — zero rewrites, cost ∝
    *     candidates + matches. But the DV is BORN match-count-sized:
    *     a majority delete mints a vector every later read must
    *     anti-join until a compaction folds it.
    *   - scoped copy-on-write (the curation-purge shape): candidate
    *     files are rewritten WITHOUT the matching rows (read through
    *     the current DVs — no resurrection), every other file carries
    *     by reference. Write ∝ survivors; reads stay DV-free.
    *
    * The ratio matches/candidate-rows (manifest `record_count`, zero
    * extra reads) picks: above `rewriteAboveFraction` the DV would be
    * a large standing read tax on mostly-dead files → rewrite; at or
    * below it the delete is sparse and the sidecar wins. Legacy
    * entries (rows = -1) price the denominator low, biasing toward
    * the rewrite — the read-optimal default, same direction as
    * [[mergeAuto]]. Rows are IDENTICAL on both paths (spec-pinned). A
    * no-match delete commits nothing (idempotent no-op). [[compact]]
    * folds the DVs as usual; the change feed shows the deletes
    * row-exactly. Returns rows deleted. */
  def deleteWhere(spark: SparkSession, root: String, predicate: Column,
      commitTsMillis: Long = System.currentTimeMillis(),
      nFiles: Int = 4,
      rewriteAboveFraction: Double = 0.5): Long = {
    val genDir = currentGenDir(spark, root)
    val m = genMeta(spark, genDir)
    val candidates = prunedByPredicate(spark, root, m, predicate)
    if (candidates.isEmpty) return 0L
    // dispatch needs only the COUNT — a column-pruned scan of the
    // predicate columns. Materializing the (file, pos) set here would
    // checkpoint its LARGEST instance (the majority delete) only for
    // the COW branch to discard it; positions are built inside the DV
    // branch alone.
    val matched = readFiles(spark, root, candidates, m.dvs, m.schema)
      .filter(predicate).count()
    if (matched == 0L) return 0L // predicate matched nothing: no commit
    // the ratio prices LIVE rows: manifest record_count is written
    // rows, and candidate files carrying a large prior DV would skew
    // the denominator high — a 90%-of-live delete on 70%-dead files
    // must still read as a majority delete. The DV dead count per
    // candidate is a sidecar-sized aggregate.
    val writtenRows = candidates.map(e => math.max(0L, e.rows)).sum
    val deadRows =
      if (m.dvs.isEmpty || writtenRows == 0L) 0L
      else {
        import spark.implicits._
        val candNames = candidates.map(_.name).toDF("__cand")
        // DISTINCT positions: duplicate DV rows (the same position
        // deleted twice across generations) are sanctioned state for
        // the anti-join read path — counting them raw would undercount
        // live rows and misdispatch a sparse delete to a full rewrite
        spark.read.parquet(m.dvs.map(filePath(root, _)): _*)
          .join(broadcast(candNames), col("file") === col("__cand"),
            "left_semi")
          .select(col("file"), col("pos")).distinct()
          .count()
      }
    val liveRows = math.max(0L, writtenRows - deadRows)
    if (matched.toDouble / math.max(1L, liveRows).toDouble
        > rewriteAboveFraction) {
      // scoped COW rewrite (updateWhere's machinery, minus assignments):
      // keep rows where the predicate is FALSE **or NULL** — the DV path
      // deletes only TRUE matches, and the two paths must agree on
      // three-valued logic or a null-predicate row silently vanishes
      val schema = m.schema.getOrElse(
        readFiles(spark, root, m.entries.take(1)).schema)
      val kept = readFiles(spark, root, candidates, m.dvs, Some(schema))
        .filter(!(predicate <=> lit(true)))
        .select(visibleCols(schema).map(col): _*)
      val gen = Snapshots.nextGen(spark, root)
      val (newEntries, newStats) =
        writeFiles(spark, root, kept, m.key, gen, nFiles,
          physSchema = m.schema)
      val candNames = candidates.map(_.name).toSet
      val carried = m.entries.filterNot(e => candNames.contains(e.name))
      val carriedNames = carried.map(_.name).toSet
      writeManifest(spark, root, gen, carried ++ newEntries, m.key,
        batchId = m.batchId,
        dvs = if (carried.isEmpty) Seq.empty else m.dvs,
        cstats = m.cstats.filter(s => carriedNames.contains(s.file)) ++ newStats,
        schema = Some(schema),
        sbatch = m.sbatch)
      Snapshots.commit(spark, root, gen, commitTsMillis)
      matched
    } else {
      val gen = Snapshots.nextGen(spark, root)
      // materialize the (file,pos) set ONCE: writeDv probes emptiness
      // and then writes — unpinned, each would re-scan the candidate
      // files (the path chosen precisely because it should be cheap)
      val delRows = readFiles(spark, root, candidates, m.dvs, m.schema,
        keepLineage = true)
        .filter(predicate)
        .select(col("__file").as("file"), col("__pos").as("pos"))
        .localCheckpoint(true)
      writeDv(spark, root, gen, delRows) match {
        case None => 0L // unreachable: matched > 0
        case Some(dvName) =>
          writeManifest(spark, root, gen, m.entries, m.key,
            batchId = m.batchId,
            dvs = m.dvs :+ dvName,
            cstats = m.cstats,
            schema = m.schema,
            sbatch = m.sbatch)
          Snapshots.commit(spark, root, gen, commitTsMillis)
          matched
      }
    }
  }

  /** UPDATE WHERE — predicate update with column assignments (the
    * Delta `UPDATE t SET ... WHERE ...` face). Copy-on-write shape:
    * candidate files (manifest-pruned like any predicate read) are
    * rewritten with the assignments applied to MATCHING rows only,
    * reading through the current DVs (no resurrection); every other
    * file carries by reference with its stats. Assignments must name
    * existing non-key columns — updating the clustering key is a
    * re-keying, which is [[merge]]'s job (delete + insert), and an
    * unknown column is a refused typo, not silent evolution.
    * Returns (files rewritten, files carried). */
  def updateWhere(spark: SparkSession, root: String, predicate: Column,
      set: Map[String, Column],
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis()): (Int, Int) = {
    val genDir = currentGenDir(spark, root)
    val m = genMeta(spark, genDir)
    val key = m.key
    val schema = m.schema.getOrElse(
      readFiles(spark, root, m.entries.take(1)).schema)
    require(set.nonEmpty, "updateWhere: no assignments")
    keyCols(key).foreach(k => require(!set.contains(k),
      s"updateWhere: assigning the merge key column '$k' re-keys rows " +
        "— express it as a merge (delete + insert)"))
    val unknown = set.keys.filterNot(visibleCols(schema).contains)
    require(unknown.isEmpty,
      s"updateWhere: unknown columns ${unknown.mkString(", ")} — " +
        "schema evolution goes through merge(evolveSchema = true)")
    val touched = prunedByPredicate(spark, root, m, predicate)
    if (touched.isEmpty) return (0, m.entries.size)
    val touchedNames = touched.map(_.name).toSet
    val carried = m.entries.filterNot(e => touchedNames.contains(e.name))
    val cols = visibleCols(schema)
    val rewritten = readFiles(spark, root, touched, m.dvs, Some(schema))
      .select(cols.map(c => set.get(c)
        .map(a => when(predicate, a).otherwise(col(c)).as(c))
        .getOrElse(col(c))): _*)
    // an assignment must not DRIFT a column's type: when/otherwise would
    // silently widen (long * 1.1 → double), the files would land with a
    // physical type contradicting the recorded #schema, and every later
    // schema-on-read would fail — the one mistake that bricks the table
    rewritten.schema.fields.zip(visibleStruct(schema).fields)
      .foreach { case (got, want) =>
      require(got.dataType == want.dataType,
        s"updateWhere: assignment changes column '${want.name}' from " +
          s"${want.dataType.simpleString} to ${got.dataType.simpleString} " +
          "— cast the assignment to the column's type explicitly")
    }
    val gen = Snapshots.nextGen(spark, root)
    val (newEntries, newStats) =
      writeFiles(spark, root, rewritten, key, gen, nFiles,
        physSchema = Some(schema))
    val carriedNames = carried.map(_.name).toSet
    writeManifest(spark, root, gen, carried ++ newEntries, key,
      batchId = m.batchId,
      dvs = if (carried.isEmpty) Seq.empty else m.dvs,
      cstats = m.cstats.filter(s => carriedNames.contains(s.file)) ++ newStats,
      schema = Some(schema),
      sbatch = m.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    (touched.size, carried.size)
  }

  /** Time travel: the table as of committed generation `g` (with that
    * generation's own deletion-vector view). */
  def readAt(spark: SparkSession, root: String, g: Long): DataFrame = {
    val m = genMeta(spark, Snapshots.resolveAt(spark, root, g))
    readFiles(spark, root, m.entries, m.dvs, m.schema)
  }

  /** Read an already-resolved generation directory (manifest + that
    * generation's DV view) — the hook the SQL time-travel rule uses
    * after [[Snapshots.resolveAsOf]]/[[Snapshots.resolveAt]] picked the
    * directory. */
  private[graft] def readResolved(spark: SparkSession, root: String,
      genDir: String): DataFrame = {
    val m = genMeta(spark, genDir)
    readFiles(spark, root, m.entries, m.dvs, m.schema)
  }

  /** Manifest-directed scan of `entries` through the generation's DVs
    * and (when the recorded schema carries a rename/drop chain) the
    * alias-coalescing projection back to logical names. `keepLineage`
    * additionally emits `__file`/`__pos` (parquet's stable in-file
    * position) — the DV writers' hook, computed BEFORE the mapping
    * projection because `_metadata` resolves only on the scan itself. */
  private def readFiles(spark: SparkSession, root: String,
      entries: Seq[FileEntry], dvs: Seq[String] = Seq.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      keepLineage: Boolean = false)
      : DataFrame = {
    if (entries.isEmpty) {
      // an EMPTY table is a legal state (a delete-everything merge): a
      // recorded schema makes it servable; a schema-less zero-entry
      // manifest is indistinguishable from corruption and still refuses
      val s = schema.getOrElse(throw new IllegalStateException(
        s"empty manifest under $root and no recorded #schema — " +
          "corrupt manifest?"))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        asNullable(visibleStruct(s)))
      return if (!keepLineage) empty
        else empty.withColumn("__file", lit(""))
          .withColumn("__pos", lit(0L))
    }
    val mapped = schema.exists(hasMapping)
    // an explicit schema (the generation's recorded one) null-fills
    // columns a pre-evolution file lacks, with zero footer reads; a
    // MAPPED schema requests every stored alias instead (exactly one
    // carries data per file)
    val rdr = schema.fold(spark.read)(s => spark.read.schema(asNullable(
      if (mapped) expandedReadSchema(s) else s)))
    val base0 = rdr.parquet(entries.map(e => filePath(root, e.name)): _*)
    val base =
      if (!keepLineage) base0
      else base0
        .withColumn("__file",
          element_at(split(expr("_metadata.file_path"), "/"), -1))
        .withColumn("__pos", expr("_metadata.row_index"))
    val dvd = if (dvs.isEmpty) base else applyDvs(spark, root, base, dvs)
    if (!mapped) dvd
    else dvd.select(logicalProjection(schema.get) ++
      (if (keepLineage) Seq(col("__file"), col("__pos")) else Nil): _*)
  }

  /** Merge-on-read over ANY parquet-backed scan of the table's files:
    * anti-join the scan against the union of the generation's DVs on
    * (file name, row position). `_metadata.row_index` is parquet's
    * stable in-file position, so no key column is needed and duplicate
    * DV rows (a position deleted twice across generations) are harmless
    * to an anti-join. Shared by [[readFiles]] and the SQL path's
    * manifest-FileIndex plan ([[graft.plans.MergeTableRelation]]) — DV
    * rows naming files the scan pruned away are simply inert.
    *
    * The join strategy is SIZE-GATED, not forced: DVs are usually
    * change-set-sized (broadcast), but [[deleteWhere]]'s DV path mints a
    * match-count-sized vector in ONE commit — a wide predicate delete
    * on a 100 TB table (kill 5% → billions of positions) would make
    * every later read broadcast an over-limit relation, a hard driver/
    * executor memory ceiling maintenance can't prevent because the DV
    * is born large. Under the session's autoBroadcastJoinThreshold
    * (Spark's own on-disk-bytes convention for the same decision) the
    * DV side is hinted broadcast; above it the hint is dropped and the
    * planner picks a shuffled anti-join — rows identical either way.
    * The |dvs| getFileStatus calls are metadata-sized and bounded by
    * the compaction cadence (compact folds DVs away). */
  private[graft] def applyDvs(spark: SparkSession, root: String,
      base: DataFrame, dvs: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val dvDf = spark.read
      .parquet(dvs.map(filePath(root, _)): _*)
      .select(col("file").as("__dv_file"), col("pos").as("__dv_pos"))
    val f = fs(spark, new Path(root))
    val dvBytes = dvs.map(n =>
      f.getFileStatus(new Path(filePath(root, n))).getLen).sum
    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    val dvSide = if (threshold > 0 && dvBytes <= threshold)
      broadcast(dvDf) else dvDf
    base
      .withColumn("__file",
        element_at(split(expr("_metadata.file_path"), "/"), -1))
      .withColumn("__pos", expr("_metadata.row_index"))
      .join(dvSide,
        col("__file") === col("__dv_file") && col("__pos") === col("__dv_pos"),
        "left_anti")
      .select(cols.map(col): _*)
  }

  /** Write `df` as new immutable data files; return their manifest
    * entries. Range-partitions on the key so the files are (roughly)
    * key-disjoint — narrow ranges keep future merges' touch sets small.
    * Per-file key stats come from ONE column-pruned pass over the just-
    * written bytes (grouped on `_metadata.file_path`) — the write-time
    * cost that buys read-free pruning on every later merge. */
  private def writeFiles(spark: SparkSession, root: String, df: DataFrame,
      key: String, gen: Long, nFiles: Int,
      cluster: Option[Column] = None,
      physSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : (Seq[FileEntry], Seq[FileStat]) = {
    // uuid-suffixed: concurrent optimistic preparers may compute the
    // SAME next gen — their staging must never share a directory
    val tmp = s"$root/_tmp-write-$gen-" +
      java.util.UUID.randomUUID().toString.take(8)
    val tmpPath = new Path(tmp)
    val f = fs(spark, tmpPath)
    // a MAPPED table's new files are written under each field's
    // PHYSICAL name (name-at-write): a re-added column's fresh identity
    // never collides with the bytes a dropped namesake still stores,
    // and a logically-renamed field keeps its on-disk identity. The
    // key is never remapped (rename/drop of key columns refuse).
    val physMap: Map[String, String] = physSchema match {
      case Some(s) if hasMapping(s) =>
        visibleStruct(s).fields.collect {
          case fd if physName(fd) != fd.name => fd.name -> physName(fd)
        }.toMap
      case _ => Map.empty
    }
    def pname(c: String): String = physMap.getOrElse(c, c)
    // default: range-disjoint on the key (narrow future touch sets);
    // with a cluster expression (z-index): range-partitioned AND
    // row-group-sorted by it, so per-file #cstat ranges become ~square
    // tiles over the interleaved dimensions
    val arranged0 = cluster match {
      case Some(z) => df.repartitionByRange(math.max(1, nFiles), z)
        .sortWithinPartitions(z)
      // composite keys: tuple-lex ranges — the LEADING column's per-file
      // [min,max] stays tight (it drives the manifest range), trailing
      // key columns cluster within files and prune via #cstat
      case None => df.repartitionByRange(math.max(1, nFiles),
        keyCols(key).map(col): _*)
    }
    // logical→physical rename AFTER arranging (the cluster expression
    // and key columns bind logical names); a projection preserves the
    // partitioning and within-partition order
    val arranged =
      if (physMap.isEmpty) arranged0
      else arranged0.select(arranged0.columns.toSeq.map(c =>
        col(s"`$c`").as(pname(c))): _*)
    arranged.write.mode("overwrite").parquet(tmp)
    val parts = f.listStatus(tmpPath).toSeq
      .filter(st => st.getPath.getName.startsWith("part-"))
      .map(_.getPath).sortBy(_.getName)
    val filesDir = new Path(s"$root/$FilesDir")
    if (!f.exists(filesDir)) f.mkdirs(filesDir)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = s"f-$gen-$i-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
      require(f.rename(p, new Path(filesDir, name)), s"rename failed for $p")
      // size captured ONCE at write: every later consumer (optimize's
      // debt, the FileIndex's listing/sizeInBytes) reads it from the
      // manifest instead of a per-file RPC
      name -> f.getFileStatus(new Path(filesDir, name)).getLen
    }.toMap
    f.delete(tmpPath, true)
    if (named.isEmpty) (Seq.empty, Seq.empty)
    else {
      // every integral AND string NON-key column gets a file range in
      // the SAME column-pruned pass that computes the key range — the
      // write-time cost that buys read-free pruning on any of those
      // columns. Strings ride as their order-preserving 8-byte-prefix
      // embedding ([[graft.functions.StringPrefix64]] — Iceberg's
      // truncate[N] as an integer), so ONE `#cstat` machine stores,
      // carries and intersects both kinds; min/max commute with the
      // monotone embedding, so aggregating the embedding is exact.
      // only the LEADING key column is excluded (its range lives on the
      // entry line); trailing COMPOSITE key columns get ordinary #cstat
      // ranges — that is the "residual" half of composite-key pruning
      val lead = leadKey(key)
      // stats are computed from the WRITTEN files, so they are keyed by
      // the PHYSICAL names — the name-at-write the alias-chain lookups
      // (aliasSet) consult at read time
      val physType: Map[String, org.apache.spark.sql.types.DataType] =
        df.schema.fields.map(fd => pname(fd.name) -> fd.dataType).toMap
      val statCols = df.schema.fields.collect {
        case f if f.name != lead &&
          (f.dataType == org.apache.spark.sql.types.LongType ||
            f.dataType == org.apache.spark.sql.types.IntegerType ||
            f.dataType == org.apache.spark.sql.types.StringType) =>
          pname(f.name)
      }.toSeq
      def sv(c: String): Column = statVal(physType(c), col(s"`$c`"))
      val aggs = Seq(min(col("k")).as("lo"), max(col("k")).as("hi"),
        count(lit(1)).as("nrows")) ++
        statCols.flatMap(c => Seq(
          min(sv(c)).as(s"lo_$c"),
          max(sv(c)).as(s"hi_$c")))
      val names = named.keys.toSeq.sorted
      // the KEY range rides the same order domain as every other stat:
      // exact for integral keys, prefix-embedded for string keys (min/
      // max commute with the monotone embedding, so aggregating the
      // embedding is exact)
      val rows = spark.read.parquet(names.map(filePath(root, _)): _*)
        .select(statVal(df.schema(lead).dataType, col(lead)).as("k") +:
          expr("_metadata.file_path").as("fp") +:
          statCols.map(c => col(s"`$c`")): _*)
        .groupBy(col("fp"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val byName = rows.map(r => r.getString(0).split("/").last -> r).toMap
      // a range partition can come out empty → part file with no rows →
      // no stats row; an empty file carries an empty range and is
      // dropped from the manifest (nothing references it; sweep GCs it)
      val entries = names.flatMap(n => byName.get(n).map(r =>
        FileEntry(n, r.getAs[Long]("lo"), r.getAs[Long]("hi"), named(n),
          r.getAs[Long]("nrows"))))
      val cstats = names.flatMap(n => byName.get(n).toSeq.flatMap(r =>
        statCols.flatMap { c =>
          // an all-NULL column in a file has no range: no stats line —
          // unknown is never prunable, so correctness is unaffected
          if (r.isNullAt(r.fieldIndex(s"lo_$c"))) Seq.empty
          else Seq(FileStat(n, c,
            r.getAs[Long](s"lo_$c"), r.getAs[Long](s"hi_$c")))
        }))
      (entries, cstats)
    }
  }

  private def manifestBytes(entries: Seq[FileEntry], key: String,
      batchId: Option[Long], dvs: Seq[String],
      cstats: Seq[FileStat],
      schema: Option[org.apache.spark.sql.types.StructType],
      sbatch: Map[String, Long] = Map.empty,
      applied: Option[Long] = None): Array[Byte] = {
    sbatch.keys.foreach(sid => require(
      !sid.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"stream id '$sid' carries a manifest delimiter character"))
    // #batch is the replay FENCE (carried by every commit); #applied is
    // PROVENANCE (only on the generation that applied the batch — what
    // DESCRIBE HISTORY shows)
    val meta = s"#key=$key\n" + batchId.map(b => s"#batch=$b\n").getOrElse("") +
      applied.map(b => s"#applied=$b\n").getOrElse("") +
      sbatch.toSeq.sortBy(_._1)
        .map { case (sid, id) => s"#sbatch=$sid\t$id\n" }.mkString +
      schema.map(s => s"#schema=${asNullable(s).json}\n").getOrElse("") +
      dvs.map(d => s"#dv=$d\n").mkString +
      cstats.map(s => s"#cstat=${s.file}\t${s.col}\t${s.lo}\t${s.hi}\n").mkString
    (meta + entries.map(e =>
      if (e.bytes >= 0 && e.rows >= 0)
        s"${e.name}\t${e.minKey}\t${e.maxKey}\t${e.bytes}\t${e.rows}"
      else if (e.bytes >= 0) s"${e.name}\t${e.minKey}\t${e.maxKey}\t${e.bytes}"
      else s"${e.name}\t${e.minKey}\t${e.maxKey}")
      .mkString("", "\n", "\n")).getBytes("UTF-8")
  }

  private def writeManifest(spark: SparkSession, root: String, gen: Long,
      entries: Seq[FileEntry], key: String,
      batchId: Option[Long] = None,
      dvs: Seq[String] = Seq.empty,
      cstats: Seq[FileStat] = Seq.empty,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      sbatch: Map[String, Long] = Map.empty,
      applied: Option[Long] = None): Unit = {
    val dir = new Path(Snapshots.genDir(root, gen))
    val f = fs(spark, dir)
    if (f.exists(dir)) {
      // only a crashed HALF-write (no marker) may be reclaimed in place:
      // a marker means a concurrent committer published this generation
      // between our nextGen read and now — deleting it would silently
      // erase an acknowledged commit (the single-writer contract broke;
      // fail loudly instead of destroying history)
      require(!f.exists(new Path(dir, Snapshots.markerName)),
        s"$dir already carries a commit marker — a concurrent committer " +
          "published this generation (legacy single-writer paths must " +
          "not run concurrently with optimistic committers); retry")
      f.delete(dir, true)
    }
    f.mkdirs(dir)
    val out = f.create(new Path(dir, ManifestName), false)
    out.write(manifestBytes(entries, key, batchId, dvs, cstats, schema,
      sbatch, applied))
    out.close()
  }

  /** The schema a merge commits: the table's, plus (under explicit
    * `evolveSchema`) the change batch's NEW columns appended — the
    * additive half of Delta's `mergeSchema`. Shared columns must agree
    * in type (a silent cast is the evolution bug formats refuse loudly);
    * a batch LACKING a table column is refused (the merge contract is
    * full payload); extra columns without the flag are refused so a
    * typo'd producer column can never widen a table by accident. */
  private def evolvedSchema(tbl: org.apache.spark.sql.types.StructType,
      changes: DataFrame,
      evolve: Boolean): org.apache.spark.sql.types.StructType = {
    val meta = Set("op", "seq")
    val visible = visibleStruct(tbl)
    val tblNames = visible.fieldNames.toSet
    val missing = visible.fieldNames.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"change batch lacks table columns: ${missing.mkString(", ")}")
    changes.schema.fields.filterNot(f => meta.contains(f.name)).foreach { f =>
      if (tblNames.contains(f.name))
        require(f.dataType == visible(f.name).dataType,
          s"schema evolution conflict on column '${f.name}': table " +
            s"${visible(f.name).dataType.simpleString} vs change batch " +
            s"${f.dataType.simpleString}")
    }
    val extra = changes.schema.fields
      .filterNot(f => meta.contains(f.name) || tblNames.contains(f.name))
    // an extra column must not collide with a name retained data files
    // still store under (a renamed column's prior name, a dropped
    // column's stored names, a logically-renamed field's physical
    // identity): the alias-expanded read would request it for TWO
    // fields and leak stale bytes into the new column. The explicit
    // re-add door is [[addColumns]], which mints a fresh physical
    // identity instead of refusing.
    val stored = tbl.fields.flatMap(storedNames)
      .map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    extra.find(f =>
      stored.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
      .foreach(f => throw new IllegalArgumentException(
        s"schema evolution: column '${f.name}' names data a renamed or " +
          "dropped column still stores in retained files — pick a " +
          "different name (a full compact clears the old names)"))
    if (extra.isEmpty) tbl
    else {
      // the third door into the schema: an evolving batch must not mint
      // the CDF feed marker either (op/seq can't reach here — filtered
      // as envelope above)
      extra.find(f => ReservedColumns.contains(
        f.name.toLowerCase(java.util.Locale.ROOT))).foreach(f =>
        throw new IllegalArgumentException(
          s"schema evolution: column '${f.name}' is reserved — " +
            "'change' is the CDF feed marker"))
      require(evolve,
        "change batch carries columns not in the table schema: " +
          s"${extra.map(_.name).mkString(", ")} — additive evolution " +
          "must be requested explicitly (evolveSchema = true)")
      org.apache.spark.sql.types.StructType(
        tbl.fields ++ extra.map(_.copy(nullable = true)))
    }
  }

  /** The merge key, from the current manifest's metadata. */
  def tableKey(spark: SparkSession, root: String): String = {
    val g = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    genMeta(spark, Snapshots.genDir(root, g)).key
  }

  /** Create the table: `df` becomes generation 1. */
  def create(spark: SparkSession, root: String, df: DataFrame, key: String,
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis()): Unit = {
    requireKeyType(key, df.schema)
    requireUnreservedNames(df.schema, s"create($root)")
    val gen = Snapshots.nextGen(spark, root)
    val (entries, cstats) = writeFiles(spark, root, df, key, gen, nFiles)
    writeManifest(spark, root, gen, entries, key, cstats = cstats,
      schema = Some(df.schema))
    Snapshots.commit(spark, root, gen, commitTsMillis)
  }

  /** MERGE the change batch into the table; commits one new generation.
    *
    * `changes` columns: `op` ('c'/'u' upsert, 'd' delete), `seq`
    * (ordering of changes to the SAME key — must be distinct per key),
    * plus every target column (payload; ignored for deletes). Net
    * effect per key = its highest-`seq` change, exactly
    * [[graft.cdc.ChangelogApply]]'s last-wins contract.
    *
    * Returns (touched files rewritten, files carried by reference). */
  def merge(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      batchId: Option[Long] = None,
      pruneFiles: Boolean = true,
      evolveSchema: Boolean = false): (Int, Int) = {
    val (t, c, _) = mergeCore(spark, root, changes, key, nFiles,
      commitTsMillis, batchId, pruneFiles, commit = true, evolveSchema)
    (t, c)
  }

  /** Manifest entries whose key range meets ANY key of `keys` (first
    * column, cast to long) — the TOUCH SET every merge-family path
    * prices and prunes with: |files| manifest rows broadcast against
    * the change keys, zero reads of the table itself. ONE definition
    * on purpose: a FileEntry column change must not be chased through
    * per-path copies. */
  private def touchedEntries(spark: SparkSession, entries: Seq[FileEntry],
      keys: DataFrame): Seq[FileEntry] = {
    val kc = keys.columns.head
    // keys enter the manifest's order domain through the SAME mapping
    // that produced the entry ranges (statVal): exact for integral
    // keys; for string keys the prefix embedding, where k ∈ [min,max]
    // (string order) ⟹ emb(k) ∈ [emb(min), emb(max)] — a conservative
    // prune (false keeps on prefix collisions, never false skips)
    val names = spark.createDataFrame(entries)
      .toDF("name", "lo", "hi", "bytes", "rows")
      .join(keys.select(statVal(keys.schema(kc).dataType, col(kc)).as("__k")),
        col("__k") >= col("lo") && col("__k") <= col("hi"), "left_semi")
      .select("name").collect().map(_.getString(0)).toSet
    entries.filter(e => names.contains(e.name))
  }

  /** The subset of `keys` (first column, cast to long) that ALREADY
    * exist in the table — the primary-key probe SQL INSERT needs.
    * Manifest-pruned: only the key column of key-range-touched files is
    * read (through the DVs — a DV-deleted key does not exist), never
    * the table; cost ∝ change set + touched files' key column. */
  private[graft] def readWhereKeysOf(spark: SparkSession, root: String,
      keys: DataFrame): DataFrame =
    readWhereKeysOf(spark, root, currentMeta(spark, root), keys)

  private[graft] def readWhereKeysOf(spark: SparkSession, root: String,
      m: GenMeta, keys: DataFrame): DataFrame = {
    // `keys` columns correspond POSITIONALLY to the table's key columns
    // (one for plain keys, the tuple for composite keys)
    val ks = keyCols(m.key)
    require(keys.columns.length == ks.size,
      s"key probe carries ${keys.columns.length} columns; the table is " +
        s"keyed on ${ks.size} (${ks.mkString(", ")})")
    // the probe JOIN must be in each column's NATIVE domain for strings
    // — the prefix embedding is not injective, so joining embeddings
    // would report a false "exists" for a distinct key sharing an
    // 8-byte prefix. The manifest PRUNE (touchedEntries) still rides
    // the embedding; integral columns normalize to long as before.
    def pk(df: DataFrame, from: Seq[String]): DataFrame =
      df.select(from.zip(ks).zipWithIndex.map { case ((src, tk), i) =>
        val dt = m.schema.map(_.apply(tk).dataType)
          .getOrElse(df.schema(src).dataType)
        val c = col(s"`$src`")
        (if (dt == org.apache.spark.sql.types.StringType) c
         else c.cast("long")).as(s"__pk$i")
      }: _*)
    val pkCols = ks.indices.map(i => s"__pk$i")
    val keyed = pk(keys, keys.columns.toSeq).distinct()
    val touched = touchedEntries(spark, m.entries, keyed)
    def renamed(df: DataFrame): DataFrame =
      df.select(pkCols.zip(ks).map { case (p, k) => col(p).as(k) }: _*)
    if (touched.isEmpty) renamed(keyed.limit(0))
    else renamed(
      pk(readFiles(spark, root, touched, m.dvs, m.schema), ks)
        .join(keyed, pkCols, "left_semi"))
  }

  /** STATS-DRIVEN merge dispatch: choose copy-on-write [[merge]] or
    * merge-on-read [[mergeMor]] PER BATCH from manifest metadata alone.
    * The deciding ratio is WRITE AMPLIFICATION — rows the COW path
    * would rewrite (manifest row counts of the key-range-touched files)
    * over net changed rows — priced with zero table reads: the touch
    * set comes from the manifest's key ranges, its size from the
    * `record_count` column every write stamps. Above the threshold the
    * rewrite is mostly copying unchanged rows (the CDC-trickle shape) →
    * DVs + appends; at or below it the change earns its rewrite and
    * reads stay clean (the backfill/bulk-update shape). Files from
    * manifests predating the rows column price as 0 — unknown biases
    * toward COW, the read-optimal default. The decision prices from the
    * DISTINCT CHANGE KEYS alone (net rows ≡ distinct keys — netting is
    * per key), so it costs one key-projection distinct + count, NOT the
    * full max_by payload collapse the dispatched path will run; it
    * never scans the table.
    *
    * Returns (path, a, b): ("cow", files rewritten, files carried) or
    * ("mor", dv rows, files appended). */
  def mergeAuto(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      batchId: Option[Long] = None,
      morAmplificationAbove: Double = 8.0): (String, Long, Long) = {
    val m = genMeta(spark, currentGenDir(spark, root))
    // distinct TUPLES in the key's NATIVE domain (exact net-row count
    // for string and composite keys too); touchedEntries embeds the
    // LEADING column for the manifest prune
    val keys = changes.select(keyCols(key).map(col): _*)
      .distinct().localCheckpoint(true)
    val nNet = keys.count()
    val touchedRows = touchedEntries(spark, m.entries, keys)
      .map(e => math.max(0L, e.rows)).sum
    val amp = touchedRows.toDouble / math.max(1L, nNet)
    if (amp > morAmplificationAbove) {
      val (dvRows, appended) =
        mergeMor(spark, root, changes, key, nFiles, commitTsMillis, batchId)
      ("mor", dvRows, appended.toLong)
    } else {
      val (rw, ca) =
        merge(spark, root, changes, key, nFiles, commitTsMillis, batchId)
      ("cow", rw.toLong, ca.toLong)
    }
  }

  private def mergeCore(spark: SparkSession, root: String,
      changes: DataFrame, key: String, nFiles: Int,
      commitTsMillis: Long, batchId: Option[Long],
      pruneFiles: Boolean, commit: Boolean,
      evolveSchema: Boolean = false): (Int, Int, Long) = {
    val genDir0 = currentGenDir(spark, root)
    val m0 = genMeta(spark, genDir0)
    // a wrong key param would carry old-key ranges next to new-key
    // ranges in one manifest — every later prune silently wrong
    require(key == m0.key,
      s"merge key '$key' does not match the table's key '${m0.key}'")
    val cur = m0.entries
    val curDvs = m0.dvs
    val unionSchema = evolvedSchema(
      m0.schema.getOrElse(readFiles(spark, root, cur.take(1)).schema),
      changes, evolveSchema)
    val targetCols = visibleCols(unionSchema)
    // 1. collapse to one NET change per key (one id-width shuffle)
    val net = netChanges(changes, key, targetCols)
    // 2. PRUNE: a file is touched iff some net-change key falls inside
    //    its manifest [min,max] — |files| manifest rows broadcast
    //    against the change keys; zero reads of the table itself
    // pruneFiles=false is the full-rewrite baseline RelScaleBench
    // measures the manifest pruning against — never the production path
    val touchedNames: Set[String] =
      if (!pruneFiles) cur.map(_.name).toSet
      else touchedEntries(spark, cur,
        net.select(keyCols(key).map(col): _*)).map(_.name).toSet
    val (touched, carried) = cur.partition(e => touchedNames.contains(e.name))
    // 3. REWRITE only the touched files: drop keys with a net change,
    //    then add back the net upserts (deletes simply never come back).
    //    Inserts of brand-new keys ride the same new-file batch.
    val upserts = net.where(col("op") =!= "d").select(targetCols.map(col): _*)
    // touched files are read THROUGH the current deletion vectors — a
    // copy-on-write rewrite over a merge-on-read table must not
    // resurrect DV-deleted rows (carried files keep their names, so the
    // carried-forward DV rows still apply to them; rewritten files get
    // fresh names the old DV rows can never match)
    val merged =
      if (touched.isEmpty) upserts
      else readFiles(spark, root, touched, curDvs, Some(unionSchema))
        .join(net.select(keyCols(key).map(col): _*), keyCols(key),
          "left_anti")
        .select(targetCols.map(col): _*)
        .unionByName(upserts)
    val gen = Snapshots.nextGen(spark, root)
    val (entries, cstats) = writeFiles(spark, root, merged, key, gen,
      nFiles, physSchema = Some(unionSchema))
    // carried files keep their (immutable) column ranges by name
    val carriedNames = carried.map(_.name).toSet
    val carriedStats = m0.cstats.filter(s => carriedNames.contains(s.file))
    // idempotence fences CARRY: a commit without its own batch id keeps
    // the previous one (else a compact/DML between a batch and its
    // restart-replay would forget the batch applied → double-apply)
    writeManifest(spark, root, gen, carried ++ entries, key,
      batchId.orElse(m0.batchId),
      dvs = if (carried.isEmpty) Seq.empty else curDvs,
      cstats = carriedStats ++ cstats,
      schema = Some(unionSchema),
      sbatch = m0.sbatch,
      applied = batchId)
    if (commit) Snapshots.commit(spark, root, gen, commitTsMillis)
    (touched.size, carried.size, gen)
  }

  /** WRITE-AUDIT-PUBLISH, stage step: run the full COW merge but leave
    * the generation UNCOMMITTED — files and manifest land, no
    * `_COMMITTED` marker, so every reader still serves the previous
    * generation (the same invisibility the crash contract guarantees,
    * used deliberately). Audit the staged state with [[readStaged]];
    * then [[publishStaged]] (atomic marker — the data becomes visible
    * in one rename-equivalent step) or [[discardStaged]]. This is the
    * lakehouse WAP gate: bad data is caught BEFORE it is servable,
    * with zero copies (the staged generation IS the would-be commit).
    * Contract: single writer; don't run [[Snapshots.sweep]]-based
    * maintenance while a staged generation is pending (to a sweeper an
    * unpublished generation is indistinguishable from a crashed one).
    * Returns the staged generation id. */
  def stageMerge(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4,
      batchId: Option[Long] = None): Long =
    mergeCore(spark, root, changes, key, nFiles, 0L, batchId,
      pruneFiles = true, commit = false)._3

  /** Read a STAGED (uncommitted) generation — the audit step. Bypasses
    * generation resolution on purpose: committed readers can never see
    * this state. */
  def readStaged(spark: SparkSession, root: String, gen: Long): DataFrame = {
    val m = genMeta(spark, Snapshots.genDir(root, gen))
    readFiles(spark, root, m.entries, m.dvs, m.schema)
  }

  /** Publish a staged generation: the atomic marker commit. Refuses if
    * a LATER generation has been committed since staging (the staged
    * state would silently shadow it — single-writer discipline broke). */
  def publishStaged(spark: SparkSession, root: String, gen: Long,
      commitTsMillis: Long = System.currentTimeMillis()): Unit = {
    val cur = Snapshots.currentGen(spark, root)
    require(cur.forall(_ < gen),
      s"staged gen $gen is not newer than committed gen ${cur.get} under $root")
    val p = new Path(Snapshots.genDir(root, gen), ManifestName)
    require(fs(spark, p).exists(p), s"no staged manifest for gen $gen under $root")
    Snapshots.commit(spark, root, gen, commitTsMillis)
  }

  /** Discard a staged generation: its manifest dir is removed, its data
    * files become unreferenced orphans ([[sweep]] collects them).
    * Refuses to touch a COMMITTED generation — history is never
    * deleted here. */
  def discardStaged(spark: SparkSession, root: String, gen: Long): Unit = {
    require(!Snapshots.generations(spark, root).contains(gen),
      s"gen $gen is committed — discardStaged never deletes history")
    val d = new Path(Snapshots.genDir(root, gen))
    val f = fs(spark, d)
    if (f.exists(d)) f.delete(d, true)
  }

  /** ROLLBACK (Delta RESTORE): commit a NEW generation whose manifest
    * is a copy of committed generation `g`'s — files by reference, DVs
    * and column stats included, nothing moved or deleted, history fully
    * preserved (time travel still reaches the rolled-back-over states,
    * and the change feed shows the rollback as ordinary row changes).
    * Cost: O(manifest). Returns the new generation id. */
  def rollbackTo(spark: SparkSession, root: String, g: Long,
      commitTsMillis: Long = System.currentTimeMillis()): Long = {
    val srcDir = Snapshots.resolveAt(spark, root, g) // must be committed
    val src = genMeta(spark, srcDir)
    val gen = Snapshots.nextGen(spark, root)
    // restore the STATE of gen g, but keep the CURRENT idempotence
    // fences: a rollback must not re-admit already-applied batches
    val cur = genMeta(spark, currentGenDir(spark, root))
    writeManifest(spark, root, gen, src.entries, src.key,
      batchId = cur.batchId,
      dvs = src.dvs, cstats = src.cstats,
      schema = src.schema,
      sbatch = cur.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    gen
  }

  /** ALTER TABLE ADD COLUMNS as a METADATA-ONLY commit: a new
    * generation carrying the current manifest verbatim (files by
    * reference, DVs, stats, fences) with the recorded `#schema=`
    * widened by `cols` — zero data movement, so the statement is O(1)
    * at 100 TB exactly like Delta's. Every existing row null-fills the
    * new columns on read (the same schema-on-read contract the
    * `evolveSchema` merge path established); a later merge writes real
    * values. Time travel to pre-ALTER generations still serves the old
    * shape — the schema is per-generation state, not global.
    *
    * Refusals are loud: empty list, duplicate/existing names
    * (case-insensitive, Spark's resolution default), the reserved
    * names `op`/`seq` (change envelope) and `change` (the merge-cdf
    * feed marker). Nullability is forced — an old
    * file cannot honor NOT NULL on a column it predates. */
  def addColumns(spark: SparkSession, root: String,
      cols: Seq[org.apache.spark.sql.types.StructField],
      commitTsMillis: Long = System.currentTimeMillis()): Long = {
    require(cols.nonEmpty, s"ADD COLUMNS on $root: empty column list")
    // OPTIMISTIC since round 18: the widening is computed as a
    // metadata-only staging (no files, empty conflict envelope) and
    // committed through [[commitPrepared]] — a live occ writer landing
    // mid-ALTER rebases the schema commit instead of failing it at the
    // manifest-write marker guard, and a RACING schema change replays
    // through this closure (the schema-sensitive conflict class), which
    // re-validates against the winner's schema.
    def prep(sp: SparkSession, g0: Long): Option[PreparedMerge] = {
      val cur = genMeta(sp, Snapshots.genDir(root, g0))
      // legacy manifests (pre-#schema) fall back to the footer schema —
      // correct, because such a table never evolved before this commit
      val base = cur.schema.getOrElse(
        readResolved(sp, root, Snapshots.genDir(root, g0)).schema)
      def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)
      // LOGICAL names refuse outright (the column exists). A name only
      // retained data files still store bytes under — a dropped column's
      // stored names, a renamed column's priors — is RE-TAKEABLE since
      // round 17: the new field is minted with a fresh PHYSICAL identity
      // (graft.phys = "<name>#g<gen>"), so new files write under a name
      // no retained file carries and the namesake's old bytes stay
      // unreachable (Delta's field-id move in the name-chain machinery).
      val logical = visibleCols(base).map(norm).toSet
      val stored = base.fields.flatMap(f => f.name +: storedNames(f))
        .map(norm).toSet
      cols.foreach { f =>
        require(!ReservedColumns.contains(norm(f.name)),
          s"ADD COLUMNS on $root: '${f.name}' is reserved — op/seq are " +
            "the change-envelope names, 'change' is the CDF feed marker")
        require(!logical.contains(norm(f.name)),
          s"ADD COLUMNS on $root: column '${f.name}' already exists")
        require(!f.name.contains(","),
          s"ADD COLUMNS on $root: '${f.name}' contains ',' — the alias " +
            "chain is comma-delimited")
      }
      val dup = cols.groupBy(f => norm(f.name)).collectFirst {
        case (_, fs) if fs.size > 1 => fs.head.name }
      require(dup.isEmpty,
        s"ADD COLUMNS on $root: duplicate column '${dup.getOrElse("")}'")
      // identity minting uses the prepare's TARGET generation; a rebase
      // may commit higher — harmless, the string is an identity, not a
      // pointer, and the collision check below still guards it
      val gen = g0 + 1
      val minted = cols.map { f =>
        val f2 = f.copy(nullable = true)
        if (!stored.contains(norm(f.name))) f2
        else {
          val phys = s"${f.name}#g$gen"
          // '#g<gen>' identities are only ever minted here with a fresh
          // generation id, so a collision means a user column literally
          // carries the minted spelling — refuse rather than alias it
          require(!stored.contains(norm(phys)),
            s"ADD COLUMNS on $root: cannot mint physical identity " +
              s"'$phys' — the name is already stored")
          f2.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f2.metadata)
            .putString(PhysKey, phys)
            .build())
        }
      }
      val widened = org.apache.spark.sql.types.StructType(
        base.fields ++ minted)
      Some(ddlHandle(sp, g0, cur, widened, "alter-add", prep))
    }
    commitDdl(spark, root, prep, commitTsMillis)
  }

  /** The shared METADATA-ONLY staging of every optimistic DDL: no
    * files, no DVs, empty conflict envelope (concurrent data commits
    * rebase for free — the splice carries the winner's entries and
    * records the overridden schema), schema-sensitive (a racing schema
    * change replays through `prep`, which re-validates). */
  private def ddlHandle(sp: SparkSession, g0: Long, cur: GenMeta,
      schema: org.apache.spark.sql.types.StructType, modeName: String,
      prep: (SparkSession, Long) => Option[PreparedMerge]): PreparedMerge =
    PreparedMerge(g0, cur.key, 0, Set.empty, Seq.empty, Seq.empty,
      changeLo = Long.MaxValue, changeHi = Long.MinValue,
      changes = sp.emptyDataFrame, mode = modeName,
      schemaOverride = Some(Some(schema)), schemaSensitive = true,
      reprepare = Some(prep))

  private def commitDdl(spark: SparkSession, root: String,
      prep: (SparkSession, Long) => Option[PreparedMerge],
      commitTsMillis: Long): Long = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    val h = prep(spark, g0).getOrElse(throw new IllegalStateException(
      s"DDL prepare on $root staged nothing")) // prep always returns Some
    commitPrepared(spark, root, h, commitTsMillis, maxAttempts = 20).gen
  }

  /** ALTER TABLE RENAME COLUMN as a METADATA-ONLY commit (Delta-style
    * column mapping through the recorded `#schema=` alone): the field
    * keeps its type and position, takes the new logical name, and
    * appends the old name to its `graft.prev` chain — data files are
    * untouched (readers coalesce the chain, see [[logicalProjection]]),
    * `#cstat`/bloom entries keep applying under the name-at-write
    * ([[aliasSet]]), and time travel serves pre-rename generations
    * under their own names because the schema is per-generation state.
    * A later whole-table [[compact]] rewrites every row under current
    * names and clears the chain.
    *
    * Refusals are loud: a missing column, a KEY column (the manifest's
    * `#key=` line and every netting path bind the key by name —
    * re-keying is a rebuild, not a rename), a reserved name, and a
    * target that collides with a VISIBLE logical name. A target only
    * retained files still STORE bytes under renames LOGICALLY (round
    * 17): the field keeps writing under its physical identity
    * (`graft.phys`) and only the label moves — no new file can collide
    * with the old bytes. */
  def renameColumn(spark: SparkSession, root: String,
      from: String, to: String,
      commitTsMillis: Long = System.currentTimeMillis()): Long = {
    // OPTIMISTIC since round 18 — see [[addColumns]]'s staging note
    def prep(sp: SparkSession, g0: Long): Option[PreparedMerge] = {
    val cur = genMeta(sp, Snapshots.genDir(root, g0))
    val base = cur.schema.getOrElse(
      readResolved(sp, root, Snapshots.genDir(root, g0)).schema)
    def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val f = visibleStruct(base).fields.find(f => norm(f.name) == norm(from))
      .getOrElse(throw new IllegalArgumentException(
        s"RENAME COLUMN on $root: no column '$from' (columns: " +
          s"${visibleCols(base).mkString(", ")})"))
    require(!keyCols(cur.key).map(norm).contains(norm(from)),
      s"RENAME COLUMN on $root: '$from' is a merge-key column — the " +
        "manifest and every merge bind the key by name; re-keying is a " +
        "rebuild, not a rename")
    require(!ReservedColumns.contains(norm(to)),
      s"RENAME COLUMN on $root: '$to' is reserved — op/seq are the " +
        "change-envelope names, 'change' is the CDF feed marker")
    // the chain is comma-joined in the field metadata: a name carrying
    // a comma would split into phantom aliases on read — every
    // pre-rename row would silently null-fill (row-level data loss)
    Seq(f.name, to).find(_.contains(",")).foreach(n =>
      throw new IllegalArgumentException(
        s"RENAME COLUMN on $root: '$n' contains ',' — the alias chain " +
          "is comma-delimited; rename such a column only through a " +
          "full rewrite"))
    // a VISIBLE logical name refuses (two columns cannot share a name).
    // A name only retained files still STORE bytes under — including
    // this field's own priors — renames LOGICALLY since round 17: the
    // field keeps writing under its current physical identity
    // (graft.phys) and only the label moves, so no new file can ever
    // collide with the old bytes.
    require(!visibleCols(base).map(norm).contains(norm(to)),
      s"RENAME COLUMN on $root: '$to' already names a column")
    val storedTaken = base.fields.flatMap(x => x.name +: storedNames(x))
      .map(norm).toSet
    val logicalOnly = storedTaken.contains(norm(to))
    val renamed = base.fields.map { x =>
      if (norm(x.name) != norm(from)) x
      else if (logicalOnly)
        // label-only: physical identity and chain unchanged — new files
        // keep writing physName(x); readers alias the chain AS `to`
        x.copy(name = to,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(x.metadata)
            .putString(PhysKey, physName(x))
            .build())
      else
        // physical rename: new files write `to`; the PRIOR physical
        // name joins the chain so old files' bytes keep resolving
        x.copy(name = to,
          metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(x.metadata)
            .putString(PrevKey, (prevNames(x) :+ physName(x)).mkString(","))
            .putString(PhysKey, to)
            .build())
    }
    Some(ddlHandle(sp, g0, cur,
      org.apache.spark.sql.types.StructType(renamed), "alter-rename", prep))
    }
    commitDdl(spark, root, prep, commitTsMillis)
  }

  /** ALTER TABLE DROP COLUMN as a METADATA-ONLY commit: the field is
    * HIDDEN — marked `graft.dropped` under a synthetic logical name,
    * its stored names kept on the chain — so reads stop requesting its
    * bytes (they stay dark in the immutable files) and nothing is
    * rewritten at any table size. Re-ADDING the name mints a FRESH
    * physical identity ([[addColumns]]), so the hidden field's bytes
    * stay dark forever; a full [[compact]] physically sheds the column
    * and clears the chain. Time travel to pre-drop generations serves the column
    * (per-generation schema). Key columns refuse — a keyless table is
    * a rebuild. */
  def dropColumn(spark: SparkSession, root: String, name: String,
      commitTsMillis: Long = System.currentTimeMillis()): Long = {
    // OPTIMISTIC since round 18 — see [[addColumns]]'s staging note
    def prep(sp: SparkSession, g0: Long): Option[PreparedMerge] = {
    val cur = genMeta(sp, Snapshots.genDir(root, g0))
    val base = cur.schema.getOrElse(
      readResolved(sp, root, Snapshots.genDir(root, g0)).schema)
    def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val f = visibleStruct(base).fields.find(f => norm(f.name) == norm(name))
      .getOrElse(throw new IllegalArgumentException(
        s"DROP COLUMN on $root: no column '$name' (columns: " +
          s"${visibleCols(base).mkString(", ")})"))
    require(!keyCols(cur.key).map(norm).contains(norm(name)),
      s"DROP COLUMN on $root: '$name' is a merge-key column — every " +
        "merge and manifest range binds it; dropping the key is a " +
        "rebuild, not an ALTER")
    require(!f.name.contains(","),
      s"DROP COLUMN on $root: '${f.name}' contains ',' — the alias " +
        "chain is comma-delimited; shed such a column through a full " +
        "rewrite instead")
    // hidden-name minting uses the prepare's TARGET generation; a
    // rebase may commit higher — the name is a unique label, not a
    // pointer (same note as addColumns' identity minting)
    val gen = g0 + 1
    val hidden = base.fields.map { x =>
      if (norm(x.name) != norm(name)) x
      else x.copy(name = s"__dropped_g${gen}_${x.name}",
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(x.metadata)
          .putBoolean(HiddenKey, true)
          .putString(PrevKey, storedNames(x).mkString(","))
          .build())
    }
    Some(ddlHandle(sp, g0, cur,
      org.apache.spark.sql.types.StructType(hidden), "alter-drop", prep))
    }
    commitDdl(spark, root, prep, commitTsMillis)
  }

  /** One NET change per key: its highest-`seq` change — the shared
    * last-wins collapse of both merge paths. */
  private def netChanges(changes: DataFrame, key: String,
      targetCols: Seq[String]): DataFrame = {
    // identity = the FULL key tuple (composite keys net per tuple, the
    // (order_id, line_no) CDC contract), one tuple-width shuffle
    val ks = keyCols(key)
    val payload = targetCols.filterNot(ks.contains)
    changes
      .groupBy(ks.map(col): _*)
      .agg(max_by(struct(col("op") +: payload.map(col): _*),
        col("seq")).as("w"))
      .select(ks.map(col) ++ (col("w.op").as("op") +:
        payload.map(c => col(s"w.$c").as(c))): _*)
      .localCheckpoint(true)
  }

  /** MERGE-ON-READ: apply the change batch WITHOUT rewriting any data
    * file. Existing rows of changed keys are killed by appending a
    * positional DELETION VECTOR (a parquet sidecar of (file, pos) rows,
    * found by scanning only the manifest-pruned candidate files); net
    * upserts land as new appended files; every current data file AND
    * every current DV carries into the new manifest by reference.
    *
    * This is the delete-heavy/CDC-heavy half of the table format
    * (Iceberg v2 position deletes, Delta deletion vectors): merge cost
    * ∝ change set + touched-file SCAN, with ZERO write amplification —
    * where [[merge]] (copy-on-write) rewrites every touched file to
    * serve reads clean. The trade is read-side: every read anti-joins
    * the accumulated DVs until [[compact]] folds them away (read() of a
    * compacted generation is DV-free — compact IS the purge).
    *
    * Returns (dv rows written, files appended). */
  /** Persist a (file, pos) relation as a DV sidecar under `files/`;
    * None if the relation is empty. */
  private def writeDv(spark: SparkSession, root: String, gen: Long,
      delRows: DataFrame): Option[String] = {
    if (delRows.isEmpty) return None
    val tmp = s"$root/_tmp-dv-$gen-" +
      java.util.UUID.randomUUID().toString.take(8)
    delRows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val f = fs(spark, new Path(tmp))
    val part = f.listStatus(new Path(tmp)).toSeq
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val name = s"dv-$gen-${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val filesDir = new Path(s"$root/$FilesDir")
    if (!f.exists(filesDir)) f.mkdirs(filesDir)
    require(f.rename(part, new Path(filesDir, name)), s"rename failed for $part")
    f.delete(new Path(tmp), true)
    Some(name)
  }

  def mergeMor(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      batchId: Option[Long] = None,
      evolveSchema: Boolean = false): (Long, Int) = {
    val genDir0 = currentGenDir(spark, root)
    val m0 = genMeta(spark, genDir0)
    require(key == m0.key,
      s"merge key '$key' does not match the table's key '${m0.key}'")
    val cur = m0.entries
    val curDvs = m0.dvs
    val unionSchema = evolvedSchema(
      m0.schema.getOrElse(readFiles(spark, root, cur.take(1)).schema),
      changes, evolveSchema)
    val targetCols = visibleCols(unionSchema)
    val net = netChanges(changes, key, targetCols)
    // candidate files: manifest interval pruning, zero table reads
    val touched = touchedEntries(spark, cur,
      net.select(keyCols(key).map(col): _*))
    val gen = Snapshots.nextGen(spark, root)
    // positional deletes: live rows (current DVs already applied — a
    // position must not be re-deleted) of touched files whose key has
    // ANY net change ('d' removes it; 'c'/'u' re-add the new image below)
    val newDvName =
      if (touched.isEmpty) None
      else {
        val delRows = readFiles(spark, root, touched, curDvs,
          Some(unionSchema), keepLineage = true)
          .withColumn("file", col("__file"))
          .withColumn("pos", col("__pos"))
          .join(net.select(keyCols(key).map(col): _*), keyCols(key),
            "left_semi")
          .select(col("file"), col("pos"))
        writeDv(spark, root, gen, delRows)
      }
    val upserts = net.where(col("op") =!= "d").select(targetCols.map(col): _*)
    val (appended, appendedStats) = writeFiles(spark, root, upserts, key,
      gen, nFiles, physSchema = Some(unionSchema))
    writeManifest(spark, root, gen, cur ++ appended, key,
      batchId.orElse(m0.batchId),
      dvs = curDvs ++ newDvName,
      // every current file carries (MOR rewrites nothing) — so do all
      // its column ranges, plus the appended files' fresh ones
      cstats = m0.cstats ++ appendedStats,
      schema = Some(unionSchema),
      sbatch = m0.sbatch,
      applied = batchId)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    val nDv = newDvName.map(n => spark.read
      .parquet(filePath(root, n)).count()).getOrElse(0L)
    (nDv, appended.size)
  }

  /** [[merge]] with STREAMING idempotence: a replayed `foreachBatch`
    * invocation (same batch id as the current commit, Structured
    * Streaming's at-least-once delivery after a restart) is detected
    * from the committed manifest metadata and skipped — the
    * marker+manifest publish is atomic, so a batch is either fully
    * applied-and-recorded or invisible, never half-applied. Batch ids
    * must be the stream's own monotone ids. Returns None on a skipped
    * replay. */
  def mergeExactlyOnce(spark: SparkSession, root: String,
      changes: DataFrame, key: String, batchId: Long,
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis()): Option[(Int, Int)] =
    if (appliedBatchId(spark, root).exists(_ >= batchId)) None
    else Some(merge(spark, root, changes, key, nFiles, commitTsMillis,
      Some(batchId)))

  /** [[mergeMor]] with the same streaming idempotence contract as
    * [[mergeExactlyOnce]] — the delete-heavy lake sink: a replayed
    * micro-batch is refused from the committed manifest's batch id, so
    * a restart never appends a duplicate DV or duplicate files. */
  def mergeMorExactlyOnce(spark: SparkSession, root: String,
      changes: DataFrame, key: String, batchId: Long,
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis()): Option[(Long, Int)] =
    if (appliedBatchId(spark, root).exists(_ >= batchId)) None
    else Some(mergeMor(spark, root, changes, key, nFiles, commitTsMillis,
      Some(batchId)))

  /** [[mergeAuto]] with the same streaming idempotence contract as
    * [[mergeExactlyOnce]] — the stats-dispatched lake sink: a replayed
    * micro-batch is refused from the committed manifest's batch id
    * BEFORE the batch is priced, so a restart never re-prices (or
    * re-applies) an already-committed wave. */
  def mergeAutoExactlyOnce(spark: SparkSession, root: String,
      changes: DataFrame, key: String, batchId: Long,
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      morAmplificationAbove: Double = 8.0): Option[(String, Long, Long)] =
    if (appliedBatchId(spark, root).exists(_ >= batchId)) None
    else Some(mergeAuto(spark, root, changes, key, nFiles, commitTsMillis,
      Some(batchId), morAmplificationAbove))

  /** t_merge_read_pruned — the ORACLED face of the predicate-driven
    * pruned read: t_merge_into's merged orders table served through
    * [[readWhere]] with a conjunct predicate (key band × status) whose
    * key bound prunes via the manifest, while the oracle recomputes the
    * logical net effect with the same WHERE. The failure mode of every
    * stats-pruning bug is SILENT ROW LOSS — exactly what the result
    * hash catches, which is why this face is gated and not just
    * spec'd. */
  def mergeReadPrunedQuery(spark: SparkSession, dir: String): DataFrame = {
    mergeOrdersQuery(spark, dir) // sig-gated build of the merged table
    val root = graft.ops.Layout.indexPath("merge_orders", dir)
    readWhere(spark, root,
      col("o_orderkey").between(1000L, 3000L) && col("o_orderstatus") === "O")
      .orderBy(col("o_orderkey"))
  }

  /** t_merge_read_str — the ORACLED face of STRING manifest statistics
    * ([[graft.functions.StringPrefix64]] riding the `#cstat` machine):
    * an orders table carrying a key-correlated string label (`o_band`,
    * the zero-padded-thousands bucket — the shape every partition-label/
    * date-string column has), served a string BAND × status predicate
    * through [[readWhere]]. The band prunes files from the embedded
    * string ranges with zero footer reads; the oracle recomputes the
    * label and band in plain SQL — a false skip (the failure mode of
    * every stats-pruning bug) is silent row loss, which the hash
    * catches. */
  def mergeReadStringPrunedQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("str_orders", dir)
    // v2: hundreds-bucket bands (thousands were empty below sf0.01)
    val sig = s"v2_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"),
        concat(lit("b"), lpad(expr("o_orderkey div 100").cast("string"),
          4, "0")).as("o_band"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
    }
    readWhere(spark, root,
      col("o_band").between("b0002", "b0005") && col("o_orderstatus") === "O")
      .orderBy(col("o_orderkey"))
  }

  /** t_zorder_read — the ORACLED face of z-order clustered compaction:
    * an orders table created key-range-partitioned, re-clustered by
    * [[compactZOrder]] on the UNCORRELATED price dimension, then served
    * a price-band predicate through [[readWhere]] — the read prunes via
    * the post-compaction `#cstat` tiles, and the oracle recomputes the
    * band from raw orders. Gates the whole chain: normalize →
    * interleave → clustered write → stats carry → prune → residual. */
  def zorderReadQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("zorder_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8, commitTsMillis = 1000L)
      compactZOrder(spark, root, "price_cents", nFiles = 8,
        commitTsMillis = 2000L)
    }
    readWhere(spark, root,
      col("price_cents").between(1000000L, 5000000L))
      .orderBy(col("o_orderkey"))
  }

  /** t_hilbert_read — the ORACLED face of HILBERT-clustered compaction
    * ([[compactHilbert]], the t_zorder_read pattern with the curve
    * swapped): the same key-range-created orders table re-clustered on
    * the uncorrelated price dimension by Hilbert index, serving the
    * same price band through [[readWhere]]. The oracle recomputes the
    * band from raw orders — the layout may only change WHICH files a
    * read opens, never a row. The ≤-z-order leaf-metric claim is
    * spec-pinned (MergeTableSpec's seam-crossing box family). */
  def hilbertReadQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("hilbert_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8, commitTsMillis = 1000L)
      compactHilbert(spark, root, "price_cents", nFiles = 8,
        commitTsMillis = 2000L)
    }
    readWhere(spark, root,
      col("price_cents").between(1000000L, 5000000L))
      .orderBy(col("o_orderkey"))
  }

  /** t_bloom_read — the ORACLED face of the bloom registry: the
    * z-clustered orders table (t_zorder_read's fixture) gains per-file
    * price blooms, then serves an EQUALITY probe on the uncorrelated
    * price dimension — the shape where even the z-tiles' ranges keep
    * most files (a point is in every straddling tile's range) and only
    * the bloom can prove absence per file. The oracle recomputes the
    * probe from raw orders: a false-negative bloom (the impossible
    * failure this gate exists to catch) would silently drop the row. */
  def bloomReadQuery(spark: SparkSession, dir: String): DataFrame = {
    zorderReadQuery(spark, dir) // sig-gated build of the clustered table
    val root = graft.ops.Layout.indexPath("zorder_orders", dir)
    ensureBloomIndex(spark, root, "price_cents")
    // the probe value: an actual price from the table, chosen
    // deterministically (min price of orderkey band 100-200)
    val v = read(spark, root)
      .filter(col("o_orderkey").between(100L, 200L))
      .agg(min(col("price_cents"))).head.getLong(0)
    readWhere(spark, root, col("price_cents") === v)
      .orderBy(col("o_orderkey"))
  }

  /** t_merge_read_in — the ORACLED face of IN-LIST file skipping (the
    * classic multi-point lookup): a 3-value `price_cents IN (...)`
    * probe on the bloom-indexed clustered table, served by
    * [[readWhere]]. [[extractPoints]] turns the IN into a per-value
    * candidate-set UNION — each point opens only files whose manifest
    * range covers it AND whose bloom admits it — instead of the
    * scan-everything a single-interval bounds walk degrades to (the
    * points' hull spans most of the table). A false skip is silent
    * row loss; the hash gate catches exactly that. Probe values are
    * chosen deterministically from three disjoint key bands. */
  def mergeReadInQuery(spark: SparkSession, dir: String): DataFrame = {
    zorderReadQuery(spark, dir) // sig-gated build of the clustered table
    val root = graft.ops.Layout.indexPath("zorder_orders", dir)
    ensureBloomIndex(spark, root, "price_cents")
    // an EMPTY band (small scale factors) contributes no probe — the
    // same null-dropping semantics SQL IN gives the oracle's subquery.
    // ONE scan computes all three band minima (r19, guide §1.2): the
    // former per-band filter+agg ran three full table scans; min(when)
    // over the OR of the bands is the same per-band minimum, and the
    // disjunction still pushes to the parquet scan.
    val bands = Seq((100L, 200L), (2000L, 2100L), (4000L, 4100L))
    val probeRow = read(spark, root)
      .filter(bands.map { case (lo, hi) =>
        col("o_orderkey").between(lo, hi) }.reduce(_ || _))
      .agg(min(when(col("o_orderkey").between(bands.head._1, bands.head._2),
          col("price_cents"))).as("v0"),
        bands.tail.zipWithIndex.map { case ((lo, hi), i) =>
          min(when(col("o_orderkey").between(lo, hi),
            col("price_cents"))).as(s"v${i + 1}") }: _*)
      .head
    val vs = bands.indices
      .flatMap(i => if (probeRow.isNullAt(i)) None
                    else Some(probeRow.getLong(i))).distinct
    require(vs.nonEmpty, s"mergeReadInQuery($dir): every probe band empty")
    readWhere(spark, root, col("price_cents").isin(vs: _*))
      .orderBy(col("o_orderkey"))
  }

  /** t_merge_read_in_str — STRING IN-list file skipping THROUGH
    * REGISTERED SQL TEXT (the r17 verdict's ask #8): the str_orders
    * fixture (key-correlated band label whose per-file ranges ride the
    * [[graft.functions.StringPrefix64]]-embedded `#cstat` machine)
    * served a 12-value band `IN` — PAST the optimizer's 10-value
    * OptimizeIn threshold, so the pushed dataFilter reaches
    * [[extractPoints]] as an `InSet` over raw UTF8String values, which
    * must embed and prune exactly like the Column-API `In`. A false
    * file skip is silent row loss; the DuckDB hash gate catches
    * exactly that, and MergeTableSpec pins the plan side (the physical
    * scan opens a strict file subset). */
  def mergeReadInStrQuery(spark: SparkSession, dir: String): DataFrame = {
    mergeReadStringPrunedQuery(spark, dir) // sig-gated build of str_orders
    val root = graft.ops.Layout.indexPath("str_orders", dir)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "str_orders_sql",
      root)
    val bands = (1 to 12).map(i => f"'b$i%04d'").mkString(", ")
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, price_cents, o_band
         |FROM str_orders_sql
         |WHERE o_band IN ($bands) AND o_orderstatus = 'O'
         |ORDER BY o_orderkey""".stripMargin)
  }

  /** t_merge_into — the oracled batch face: a MergeTable built from
    * `orders` (money as exact integer cents), hit with one deterministic
    * MERGE batch exercising every clause — updates (key%10=3 doubles the
    * price), deletes (key%10=7), inserts (key%10=1 re-keyed past the
    * domain), and an intra-batch last-wins conflict (key%100=42 gets two
    * updates; the higher seq must stick) — then read back. The oracle
    * replays the same net effect in plain SQL; commit timestamps are
    * pinned so the build is bit-reproducible. */
  def mergeOrdersQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8, commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val updates = base.where(col("o_orderkey") % 10 === 3)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val deletes = base.where(col("o_orderkey") % 10 === 7)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val conflictA = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val conflictB = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3 + 500).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(2L))
      val inserts = base.where(col("o_orderkey") % 10 === 1)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey") +:
          (col("o_custkey") +: col("o_orderstatus") +:
            (col("price_cents") + 100L).as("price_cents") +: Nil): _*)
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      val changes = updates.unionByName(deletes).unionByName(conflictA)
        .unionByName(conflictB).unionByName(inserts)
      merge(spark, root, changes, "o_orderkey", nFiles = 4,
        commitTsMillis = 2000L)
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_merge_str_key — the ORACLED face of STRING merge keys: a table
    * keyed on `ok = status || '-' || lpad(orderkey, 7, '0')` (the
    * reference's own NoSQL PK is `id: STRING`,
    * `cdk_infrastructure/__init__.py:287-289`) driven through the full
    * lifecycle — create, a COW merge (updates ×2 on %10=3, deletes
    * %10=7, an intra-batch seq conflict on %100=42, inserts under a new
    * 'Z-' prefix), a MOR merge (DV deletes %10=9, repricing %100=55),
    * and a predicate DELETE over a string-key band — then read back
    * through the predicate path (string bounds → prefix-embedding
    * manifest prune → exact residual). Keys differing only in their 7th
    * digit share an 8-byte prefix, so embedding COLLISIONS are dense:
    * any probe or prune that joined embeddings instead of exact keys
    * would corrupt neighbors and break the hash. The oracle replays the
    * same net effect in plain SQL. */
  def mergeStrKeyQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_str_key", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        concat(col("o_orderstatus"), lit("-"),
          lpad(col("o_orderkey").cast("string"), 7, "0")).as("ok"),
        col("o_orderkey"), col("o_custkey"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "ok", nFiles = 8, commitTsMillis = 1000L)
      val payload = Seq(col("ok"), col("o_orderkey"), col("o_custkey"))
      val updates = base.where(col("o_orderkey") % 10 === 3)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val deletes = base.where(col("o_orderkey") % 10 === 7)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val conflictA = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val conflictB = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3 + 500).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(2L))
      val inserts = base.where(col("o_orderkey") % 10 === 1)
        .select(concat(lit("Z-"),
          lpad(col("o_orderkey").cast("string"), 7, "0")).as("ok") +:
          (col("o_orderkey") +: col("o_custkey") +:
            (col("price_cents") + 100L).as("price_cents") +: Nil): _*)
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      merge(spark, root, updates.unionByName(deletes).unionByName(conflictA)
        .unionByName(conflictB).unionByName(inserts), "ok", nFiles = 4,
        commitTsMillis = 2000L)
      // MOR wave over DISJOINT keys (%10=9 deletes, %100=55 reprices):
      // positional DVs + appends on the string-keyed manifest
      val morDel = base.where(col("o_orderkey") % 10 === 9)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val morUpd = base.where(col("o_orderkey") % 100 === 55)
        .select(payload :+ (col("price_cents") + 7L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      mergeMor(spark, root, morDel.unionByName(morUpd), "ok", nFiles = 4,
        commitTsMillis = 3000L)
      // predicate DELETE over a string-key band: literal string bounds
      // extract as embeddings, prune the manifest, residual exact
      deleteWhere(spark, root,
        col("ok").between("P-0000000", "P-0001999"),
        commitTsMillis = 4000L)
      ()
    }
    readWhere(spark, root, col("ok") >= "A").orderBy(col("ok"))
  }

  /** Oracled face of the OPTIMISTIC path ([[prepareMerge]] /
    * [[commitPrepared]]): two writers prepared against the SAME base
    * snapshot — A updating low keys, B deleting high keys and inserting
    * beyond the domain — committed in sequence, so B's base is stale at
    * commit time and the conflict rules arbitrate (disjoint envelopes →
    * B rebases with zero data recomputation; the hash gate holds either
    * way because a replay is also exact). Final state must equal both
    * change sets applied to the base — order-free because disjoint. */
  def mergeOccQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_occ", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val mx = currentManifest(spark, root).map(_.maxKey).max
      val loT = mx / 4
      val hiT = mx * 3 / 4
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val aChanges = base
        .where(col("o_orderkey") % 10 === 3 && col("o_orderkey") <= loT)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val bDel = base
        .where(col("o_orderkey") % 10 === 7 && col("o_orderkey") >= hiT)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val bIns = base
        .where(col("o_orderkey") % 10 === 1 && col("o_orderkey") >= hiT)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey") +:
          (col("o_custkey") +: col("o_orderstatus") +:
            (col("price_cents") + 100L).as("price_cents") +: Nil): _*)
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      val hA = prepareMerge(spark, root, aChanges, "o_orderkey", nFiles = 2)
      val hB = prepareMerge(spark, root, bDel.unionByName(bIns),
        "o_orderkey", nFiles = 2)
      val a = commitPrepared(spark, root, hA, commitTsMillis = 2000L)
      val b = commitPrepared(spark, root, hB, commitTsMillis = 3000L)
      require(a.path == "clean" && b.gen > a.gen,
        s"occ face: unexpected outcomes $a / $b")
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_merge_occ_mor — the ORACLED face of MOR/auto dispatch INSIDE the
    * optimistic loop: two writers prepare from one base snapshot with
    * `mode = auto`. Writer A is the trickle shape (sparse %1000 keys
    * spread across every file — rewrite amplification ~10³, so pricing
    * stages MERGE-ON-READ: a DV sidecar + appends, nothing rewritten);
    * writer B is the bulk shape (a dense low-key band — amplification
    * ~1, priced COPY-ON-WRITE). A commits clean; B's arbitration then
    * runs against A's MOR commit (A's appended files overlap B's
    * envelope → replay, re-priced against the winner's state, its COW
    * rewrite reading THROUGH A's staged DV). The change sets are
    * key-disjoint, so the net state is order-free — the oracle computes
    * it logically, and ANY arbitration bug (a resurrected DV delete, a
    * dropped MOR append, a double-applied band) breaks the hash. */
  def mergeOccMorQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_occ_mor", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val mx = currentManifest(spark, root).map(_.maxKey).max
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      // A: trickle — sparse updates + sparse deletes, every file a
      // candidate, a handful of net keys
      val aChanges = base.where(col("o_orderkey") % 1000 === 7)
        .select(payload :+ (col("price_cents") + 11L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
        .unionByName(base.where(col("o_orderkey") % 1000 === 333)
          .select(payload :+ col("price_cents"): _*)
          .withColumn("op", lit("d")).withColumn("seq", lit(1L)))
      // B: bulk — the dense low-key band, minus A's keys (disjoint)
      val bChanges = base.where(col("o_orderkey") <= mx / 4 &&
          col("o_orderkey") % 1000 =!= 7 && col("o_orderkey") % 1000 =!= 333)
        .select(payload :+ (col("price_cents") * 3L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val hA = prepareMergeAuto(spark, root, aChanges, "o_orderkey",
        nFiles = 2)
      val hB = prepareMergeAuto(spark, root, bChanges, "o_orderkey",
        nFiles = 4)
      require(hA.morStaged && hA.dvName.isDefined,
        s"occ-mor face: trickle writer was not priced MOR ($hA)")
      require(!hB.morStaged,
        s"occ-mor face: bulk writer was not priced COW")
      val a = commitPrepared(spark, root, hA, commitTsMillis = 2000L)
      val b = commitPrepared(spark, root, hB, commitTsMillis = 3000L)
      require(a.path == "clean" && b.gen > a.gen,
        s"occ-mor face: unexpected outcomes $a / $b")
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_optimize — the ORACLED face of bin-packed small-file compaction:
    * two narrow merges leave small rewrite files next to the creation
    * files; [[optimize]] (threshold = half the largest file) packs the
    * small ones and carries the rest, and the read after it must be
    * byte-for-byte the logical merged state — OPTIMIZE is pure layout,
    * so ANY row drift (a dropped DV, a resurrected delete, a double-
    * packed file) breaks the hash. */
  def optimizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("optimize_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 6,
        commitTsMillis = 1000L)
      val mx = currentManifest(spark, root).map(_.maxKey).max
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      merge(spark, root, base.where(col("o_orderkey") <= mx / 20)
        .select(payload :+ (col("price_cents") + 7L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L)),
        "o_orderkey", nFiles = 2, commitTsMillis = 2000L)
      merge(spark, root, base.where(col("o_orderkey") > mx - mx / 8)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L)),
        "o_orderkey", nFiles = 2, commitTsMillis = 3000L)
      val maxLen = currentManifest(spark, root).map(e =>
        f.getFileStatus(new Path(filePath(root, e.name))).getLen).max
      val (packedN, carriedN) = optimize(spark, root,
        smallBytes = maxLen / 2, targetBytes = Long.MaxValue,
        commitTsMillis = 4000L)
      require(packedN >= 2 && carriedN >= 1,
        s"optimize face: unexpected layout ($packedN packed, $carriedN carried)")
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_sql_read — the ORACLED face of the SQL read path: the optimized
    * orders table registered under a name and served by PLAIN SQL
    * through the manifest-backed FileIndex (a DV-free generation, so
    * the fast path is what runs): the banded WHERE is pruned
    * planner-side from manifest ranges, and the result must hash-equal
    * the logical state — a pruning bug on the SQL path is silent row
    * loss, exactly what the gate catches. */
  def sqlReadQuery(spark: SparkSession, dir: String): DataFrame = {
    optimizeQuery(spark, dir) // sig-gated build of the optimized table
    val root = graft.ops.Layout.indexPath("optimize_orders", dir)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "sql_lake_orders",
      root)
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
        |FROM sql_lake_orders
        |WHERE o_orderkey BETWEEN 1000 AND 3000
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** One sig-gated orders table carrying the predicate-DML history the
    * two DML faces read: gen 1 = create, gen 2 = [[deleteWhere]] (DV
    * path — keys %10=4 in the lower key half), gen 3 = [[updateWhere]]
    * (pruned COW path — +55 cents on status F). Composing them on one
    * table exercises update-through-DVs: the rewrite must not resurrect
    * deleted rows. */
  private def ensureDmlOrders(spark: SparkSession, dir: String): String = {
    import graft.ops.Layout
    val root = Layout.indexPath("dml_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val mx = currentManifest(spark, root).map(_.maxKey).max
      val nDel = deleteWhere(spark, root,
        col("o_orderkey") % 10 === 4 && col("o_orderkey") <= mx / 2,
        commitTsMillis = 2000L)
      require(nDel > 0, s"dml face: delete matched nothing under $dir")
      updateWhere(spark, root, col("o_orderstatus") === "F",
        Map("price_cents" -> (col("price_cents") + 55L)),
        nFiles = 4, commitTsMillis = 3000L)
    }
    root
  }

  /** t_delete_where — the post-delete generation (gen 2): a predicate
    * delete served through one DV sidecar, zero rewrites. */
  def deleteWhereQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureDmlOrders(spark, dir)
    readAt(spark, root, 2L).orderBy(col("o_orderkey"))
  }

  /** t_update_where — the current state: the predicate update applied
    * OVER the delete (rewritten candidates read through the DVs). */
  def updateWhereQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = ensureDmlOrders(spark, dir)
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_delete_auto — the ORACLED face of [[deleteWhere]]'s stats
    * dispatch: gen 2 is a SPARSE delete (keys %10=6, ~10% of candidate
    * rows) that must take the DV sidecar, gen 3 a MAJORITY delete
    * (price_cents %10 < 8, ~80%) that must take the scoped COW rewrite —
    * reading THROUGH gen 2's DV (no resurrection) and folding it away
    * (post-rewrite generation carries zero DVs). Both dispatch decisions
    * are REQUIRED, and the final read must hash-equal the composed
    * logical state — a wrong dispatch that still returned the right
    * rows would fail the requires; a right dispatch with row drift
    * fails the oracle. */
  def deleteAutoQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("delete_auto_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 6,
        commitTsMillis = 1000L)
      val nSparse = deleteWhere(spark, root, col("o_orderkey") % 10 === 6,
        commitTsMillis = 2000L)
      val mSparse = genMeta(spark, currentGenDir(spark, root))
      require(nSparse > 0 && mSparse.dvs.size == 1,
        s"delete_auto face: sparse delete should take the DV path " +
          s"(deleted $nSparse, dvs ${mSparse.dvs.size})")
      val nBulk = deleteWhere(spark, root, col("price_cents") % 10 < 8,
        commitTsMillis = 3000L)
      val mBulk = genMeta(spark, currentGenDir(spark, root))
      require(nBulk > nSparse && mBulk.dvs.isEmpty,
        s"delete_auto face: majority delete should take the COW rewrite " +
          s"and fold the DV (deleted $nBulk, dvs ${mBulk.dvs.size})")
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** Oracled face of ADDITIVE SCHEMA EVOLUTION: a merge whose change
    * batch carries a column the table lacks (`o_flag`), applied with
    * `evolveSchema = true`. Updated rows carry the new value; every
    * other row — including rows in files the merge never touched, read
    * through the recorded `#schema=` with zero rewrites — null-fills
    * it. The oracle recomputes the same shape from raw orders, so a
    * silently-dropped column OR a wrongly-backfilled value both break
    * the hash. */
  def mergeEvolveQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_evolve", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val upd = base.where(col("o_orderkey") % 10 === 3)
        .select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
          (col("price_cents") % 7).as("o_flag"))
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val del = base.where(col("o_orderkey") % 10 === 7)
        .select(col("o_orderkey"), col("o_custkey"), col("price_cents"),
          lit(null).cast("long").as("o_flag"))
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      merge(spark, root, upd.unionByName(del), "o_orderkey", nFiles = 4,
        commitTsMillis = 2000L, evolveSchema = true)
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** CHANGE DATA FEED: the row-level diff between two committed
    * generations, derived from the manifests alone — no table-state
    * comparison, no full scans (the Delta CDF / Iceberg changelog-scan
    * capability, computed rather than logged):
    *
    *   - files only in `gTo`'s manifest → their (DV-visible) rows are
    *     INSERTS; files only in `gFrom`'s → their rows are DELETES;
    *   - files in BOTH are immutable bytes, so their visible rows can
    *     differ only via deletion vectors: positions in `gTo`'s DVs but
    *     not `gFrom`'s are DELETES (and vice versa re-births), read by
    *     scanning ONLY the files the DV delta names.
    *
    * Cost ∝ changed files + DV delta — at 100 TB a day's CDF reads a
    * day's changes. Granularity contract: ROW-EXACT across the whole
    * history — MOR windows diff by DV delta, and rows a copy-on-write
    * rewrite (or [[compact]]/[[optimize]]) merely RE-FILED cancel via
    * bag-EXCEPT between the added-file and removed-file sides (what
    * other formats need per-row lineage ids for). One shape remains
    * visible by design: a row deleted AND re-inserted with identical
    * values inside one window reports as its real d+i event pair.
    *
    * Returns the target schema plus `change` ∈ 'i'/'d'. */
  def changesBetween(spark: SparkSession, root: String,
      gFrom: Long, gTo: Long): DataFrame = {
    // window from "before the table existed": the whole gTo state is the
    // insert set (the backfill window of a change-feed consumer)
    if (gFrom == 0L) {
      val m = genMeta(spark, Snapshots.resolveAt(spark, root, gTo))
      return readFiles(spark, root, m.entries, m.dvs, m.schema)
        .withColumn("change", lit("i"))
    }
    val from = genMeta(spark, Snapshots.resolveAt(spark, root, gFrom))
    val to = genMeta(spark, Snapshots.resolveAt(spark, root, gTo))
    val mFrom = from.entries
    val mTo = to.entries
    val namesFrom = mFrom.map(_.name).toSet
    val namesTo = mTo.map(_.name).toSet
    val dvFrom = from.dvs
    val dvTo = to.dvs
    // both sides read through gTo's schema: the feed's shape is the TO
    // state's, and pre-evolution files null-fill columns they predate
    val toSchema = to.schema
    val cols = readFiles(spark, root, mTo, schema = toSchema).columns.toSeq

    def dvRel(dvs: Seq[String]): DataFrame =
      if (dvs.isEmpty)
        spark.range(0).select(lit("").as("file"), lit(0L).as("pos"))
      else spark.read.parquet(dvs.map(filePath(root, _)): _*)
        .select(col("file"), col("pos"))
    // the DV delta, both directions (deleted-at-to, re-born-at-to),
    // in ONE aggregation pass (r18: the former exceptAll pair cost two
    // eager-checkpoint jobs plus two union+aggregate rewrites over the
    // same inputs; downstream only membership matters — the positions
    // feed a distinct + left-semi join — so the count comparison is
    // bag-EXCEPT-equivalent here)
    val dvDelta = dvRel(dvFrom)
      .select(col("file"), col("pos"), lit(1L).as("__f"), lit(0L).as("__t"))
      .unionByName(dvRel(dvTo)
        .select(col("file"), col("pos"), lit(0L).as("__f"), lit(1L).as("__t")))
      .groupBy(col("file"), col("pos"))
      .agg(sum(col("__f")).as("__nf"), sum(col("__t")).as("__nt"))
      .filter(col("__nf") =!= col("__nt"))
      // LAZY (r19): the touched-file collect below materializes it
      .localCheckpoint(false)
    val newDels = dvDelta.filter(col("__nt") > col("__nf"))
      .select(col("file"), col("pos"))
    val unDels = dvDelta.filter(col("__nf") > col("__nt"))
      .select(col("file"), col("pos"))
    // ONE collect decides which live files each DV-delta direction
    // touches (metadata-sized: distinct changed files + a direction bit)
    val touchedArr = dvDelta
      .select(col("file"), (col("__nt") > col("__nf")).as("__nw"))
      .distinct().collect()
    val touchedNew = touchedArr.filter(_.getBoolean(1)).map(_.getString(0)).toSet
    val touchedUn = touchedArr.filterNot(_.getBoolean(1)).map(_.getString(0)).toSet

    def rowsOf(entries: Seq[FileEntry], dvs: Seq[String]) =
      if (entries.isEmpty) None
      else Some(readFiles(spark, root, entries, dvs, toSchema)
        .select(cols.map(col): _*))
    // positions named by a DV delta, read from ONLY the files it names
    def rowsAt(positions: DataFrame, touched: Set[String],
        live: Seq[FileEntry], tag: String) = {
      val entries = live.filter(e => touched.contains(e.name))
      if (entries.isEmpty) None
      else Some(readFiles(spark, root, entries, schema = toSchema,
        keepLineage = true)
        .join(broadcast(positions.select(col("file").as("__file"),
          col("pos").as("__pos"))), Seq("__file", "__pos"), "left_semi")
        .select(cols.map(col): _*).withColumn("change", lit(tag)))
    }
    val common = mTo.filter(e => namesFrom.contains(e.name))
    // a COW rewrite (or compact/optimize) re-files UNCHANGED rows under
    // new names, putting identical values on both the added-file and
    // removed-file sides — bag-EXCEPT cancels them, so the feed is
    // row-exact across rewrites too, not just MOR history. Cost ∝
    // changed-file rows, which the diff was already scanning; a full
    // compact makes that the whole table (the one window where the
    // feed's cost matches a rewrite it must prove empty). r18: the
    // netting runs as ONE tagged union + aggregate + replicate pass
    // (exactly the union+count rewrite Spark plans for each exceptAll,
    // done once for both directions over one checkpoint job instead of
    // two checkpoint jobs + two separate aggregations).
    val (insNet, delNet) =
      (rowsOf(mTo.filterNot(e => namesFrom.contains(e.name)), dvTo),
        rowsOf(mFrom.filterNot(e => namesTo.contains(e.name)), dvFrom)) match {
        case (Some(i0), Some(d0)) =>
          val counted = i0
            .withColumn("__ci", lit(1L)).withColumn("__cd", lit(0L))
            .unionByName(d0
              .withColumn("__ci", lit(0L)).withColumn("__cd", lit(1L)))
            .groupBy(cols.map(col): _*)
            .agg(sum(col("__ci")).as("__si"), sum(col("__cd")).as("__sd"))
            .filter(col("__si") =!= col("__sd"))
            // LAZY (r19): both replicate branches read it inside the
            // final union's job (per-block compute lock, no recompute)
            .localCheckpoint(false)
          // bag semantics: a row surviving k times net emits k copies
          def replicate(df: DataFrame, n: Column) = df
            .withColumn("__x", explode(sequence(lit(1L), n)))
            .select(cols.map(col): _*)
          (Some(replicate(counted.filter(col("__si") > col("__sd")),
              col("__si") - col("__sd"))),
            Some(replicate(counted.filter(col("__sd") > col("__si")),
              col("__sd") - col("__si"))))
        case other => other
      }
    val parts = Seq(
      insNet.map(_.withColumn("change", lit("i"))),
      delNet.map(_.withColumn("change", lit("d"))),
      rowsAt(newDels, touchedNew, common, "d"),
      rowsAt(unDels, touchedUn, common, "i")).flatten
    require(parts.nonEmpty || mTo.nonEmpty,
      s"empty manifests under $root")
    parts.reduceOption(_ unionByName _).getOrElse(
      readFiles(spark, root, mTo, schema = toSchema).limit(0)
        .select(cols.map(col): _*).withColumn("change", lit("i")))
  }

  /** t_change_feed — the oracled CDF face: the diff between
    * [[mergeDvOrdersQuery]]'s wave-1 and wave-2 generations (a pure
    * merge-on-read history, so the feed is row-exact): deletes = the
    * %10=9 wave-1 rows and the %100=42 old images; inserts = the
    * re-updated 42s and the re-born 77s. The oracle derives the same
    * diff from the two logical states. */
  def changeFeedQuery(spark: SparkSession, dir: String): DataFrame = {
    mergeDvOrdersQuery(spark, dir) // ensure the 3-generation table exists
    val root = graft.ops.Layout.indexPath("merge_dv_orders", dir)
    val gens = Snapshots.generations(spark, root).sorted
    require(gens.size >= 3, s"expected 3 generations, got $gens")
    changesBetween(spark, root, gens(gens.size - 2), gens.last)
      .orderBy(col("change"), col("o_orderkey"))
  }

  /** t_change_feed_cow — the ORACLED face of CDF row-exactness ACROSS
    * COPY-ON-WRITE REWRITES: the window spans a whole-table [[compact]]
    * (every file re-named, every row re-filed) plus one small COW
    * merge. A file-granular feed would report the ENTIRE table as
    * delete+insert churn; the bag-EXCEPT netting cancels every re-filed
    * unchanged row, so the feed must contain EXACTLY the small merge's
    * true change rows — old images out, new images in, nothing else.
    * The oracle derives those rows logically; ANY spurious churn (or a
    * change row the netting wrongly cancelled) breaks rows+hash. */
  def changeFeedCowQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("change_feed_cow", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      // wave 1 (BEFORE the window): a broad COW update — its rows must
      // ride the netting as unchanged images, not churn
      merge(spark, root, base.where(col("o_orderkey") % 10 === 3)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L)),
        "o_orderkey", nFiles = 4, commitTsMillis = 2000L)
      // the window opens here: a WHOLE-TABLE rewrite renames every file
      compact(spark, root, nFiles = 6, commitTsMillis = 3000L)
      // wave 2: the only TRUE changes inside the window
      val w2 = base.where(col("o_orderkey") % 100 === 55)
        .select(payload :+ (col("price_cents") + 9L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
        .unionByName(base.where(col("o_orderkey") % 100 === 61)
          .select(payload :+ col("price_cents"): _*)
          .withColumn("op", lit("d")).withColumn("seq", lit(1L)))
        .unionByName(base.where(col("o_orderkey") % 100 === 71)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey") +:
            col("o_custkey") +: col("o_orderstatus") +:
            col("price_cents") +: Nil: _*)
          .withColumn("op", lit("c")).withColumn("seq", lit(1L)))
      merge(spark, root, w2, "o_orderkey", nFiles = 2,
        commitTsMillis = 4000L)
    }
    val gens = Snapshots.generations(spark, root).sorted
    require(gens.size == 4, s"expected 4 generations, got $gens")
    // window = (post-wave-1 .. post-wave-2], crossing the compact
    changesBetween(spark, root, gens(1), gens(3))
      .orderBy(col("change"), col("o_orderkey"))
  }

  /** [[changesBetween]] with UPDATE PAIRING — the Delta-CDF consumer
    * contract: a key carrying BOTH a delete and an insert inside one
    * window is one logical UPDATE, reported as its
    * 'update_preimage' / 'update_postimage' pair; lone rows report as
    * 'delete' / 'insert'. Derived, not logged: one key-partitioned
    * window count over CHANGE-SET-sized rows (never a table scan)
    * relabels the raw 'i'/'d' feed — the diff machinery, DV-delta
    * scoping and rewrite netting are [[changesBetween]]'s verbatim.
    * Shape contract (documented): a key deleted and re-inserted inside
    * one window is indistinguishable from an update by construction
    * (the feed nets per window) and reports as an update pair — the
    * same collapse Delta's CDF applies within a commit. */
  def changesBetweenPaired(spark: SparkSession, root: String,
      gFrom: Long, gTo: Long): DataFrame = {
    val raw = changesBetween(spark, root, gFrom, gTo)
    // the key at the window's TO state names the pairing identity
    val m = genMeta(spark, Snapshots.resolveAt(spark, root, gTo))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols(m.key).map(col): _*)
    raw
      .withColumn("__kinds",
        size(collect_set(col("change")).over(w)))
      .withColumn("change",
        when(col("__kinds") === 2 && col("change") === "d",
          lit("update_preimage"))
          .when(col("__kinds") === 2 && col("change") === "i",
            lit("update_postimage"))
          .when(col("change") === "d", lit("delete"))
          .otherwise(lit("insert")))
      .drop("__kinds")
  }

  /** [[changesBetweenPaired]] at COMMIT granularity — the consumer
    * option the windowed form cannot offer: the window is walked
    * generation hop by generation hop (over the SAME diff machinery,
    * cost still ∝ each hop's change set — never a table scan), pairing
    * within each hop only, and every row carries the `generation` that
    * committed it. The semantic difference, pinned in spec: a key
    * deleted in one commit and re-inserted in a LATER commit reports
    * as its true 'delete' + 'insert' events here, where the windowed
    * default (netting across the whole span, like Delta nets within a
    * commit) collapses it into an update pair. Granularity = RETAINED
    * commit granularity: hops across swept generations merge into one
    * (their intermediate states are unrecoverable by construction). */
  def changesBetweenPairedPerCommit(spark: SparkSession, root: String,
      gFrom: Long, gTo: Long): DataFrame = {
    val all = Snapshots.generations(spark, root).sorted
    val within = all.filter(g => g > gFrom && g <= gTo)
    require(within.nonEmpty,
      s"changesBetweenPairedPerCommit($root): no retained generation in " +
        s"($gFrom, $gTo]")
    (gFrom +: within).zip(within).map { case (a, b) =>
      changesBetweenPaired(spark, root, a, b)
        .withColumn("generation", lit(b))
    }.reduce(_ unionByName _)
  }

  /** t_change_feed_updates — the ORACLED face of CDF update pairing:
    * one MOR wave carrying updates (%100=42, +11 cents), deletes
    * (%100=77) and inserts (%100=88 re-keyed past the domain) against
    * the orders-derived table; the paired feed must report EXACTLY
    * four change types — the updated keys as pre/post-image pairs
    * (old and new values both present, correctly labeled), the
    * deletes as 'delete', the new keys as 'insert'. The oracle
    * derives all four populations logically; a mislabeled or missing
    * pair breaks rows+hash. */
  def changeFeedUpdatesQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("change_feed_upd", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 6,
        commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val wave = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") + 11L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
        .unionByName(base.where(col("o_orderkey") % 100 === 77)
          .select(payload :+ col("price_cents"): _*)
          .withColumn("op", lit("d")).withColumn("seq", lit(1L)))
        .unionByName(base.where(col("o_orderkey") % 100 === 88)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey") +:
            col("o_custkey") +: col("o_orderstatus") +:
            col("price_cents") +: Nil: _*)
          .withColumn("op", lit("c")).withColumn("seq", lit(1L)))
      // merge-on-read: the update wave lands as DV + appends, so the
      // window diff exercises the DV-delta path on the preimage side
      mergeMor(spark, root, wave, "o_orderkey", nFiles = 2,
        commitTsMillis = 2000L)
    }
    val gens = Snapshots.generations(spark, root).sorted
    require(gens.size == 2, s"expected 2 generations, got $gens")
    changesBetweenPaired(spark, root, gens(0), gens(1))
      .orderBy(col("change"), col("o_orderkey"))
  }

  /** t_sql_merge — the PARSER face of [[merge]]: t_merge_into's net
    * change batch driven through SQL `MERGE INTO` text instead of the
    * API. One statement exercises every supported clause: conditional
    * `WHEN MATCHED AND ... THEN DELETE` ahead of an unconditional
    * `WHEN MATCHED THEN UPDATE` (first-clause-wins, the ANSI rule) and
    * `WHEN NOT MATCHED THEN INSERT`; read back through the registered
    * SQL name. The oracle is t_merge_into's — the SQL verb and the API
    * face must commute to the same table state, hash-exact. The
    * intra-batch seq conflict of the API face (%100=42 twice) is
    * pre-netted here because ANSI MERGE *refuses* two source rows per
    * target key (the cardinality contract the command enforces). */
  def sqlMergeQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("sql_merge_orders", dir)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "sql_merge_orders",
      root)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      // %10=3 and %100=42 are disjoint (42 ends in 2): one update row
      // per key, as ANSI demands
      val upd = base.where(col("o_orderkey") % 10 === 3)
        .select(payload :+ (col("price_cents") * 2).as("new_price"): _*)
        .withColumn("action", lit("upd"))
      val upd42 = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3 + 500).as("new_price"): _*)
        .withColumn("action", lit("upd"))
      val del = base.where(col("o_orderkey") % 10 === 7)
        .select(payload :+ lit(0L).as("new_price"): _*)
        .withColumn("action", lit("del"))
      val ins = base.where(col("o_orderkey") % 10 === 1)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey") +:
          (col("o_custkey") +: col("o_orderstatus") +:
            (col("price_cents") + 100L).as("new_price") +: Nil): _*)
        .withColumn("action", lit("ins"))
      upd.unionByName(upd42).unionByName(del).unionByName(ins)
        .createOrReplaceTempView("sql_merge_src")
      spark.sql(
        """MERGE INTO sql_merge_orders t
          |USING sql_merge_src s
          |ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.action = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET price_cents = s.new_price
          |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey,
          |  o_orderstatus, price_cents) VALUES (s.o_orderkey, s.o_custkey,
          |  s.o_orderstatus, s.new_price)""".stripMargin)
    }
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
        |FROM sql_merge_orders ORDER BY o_orderkey""".stripMargin)
  }

  /** t_merge_auto — the ORACLED face of the stats-driven dispatch: the
    * orders table takes two [[mergeAuto]] waves — a TRICKLE (3 keys →
    * write amplification in the thousands → the decision must land MOR)
    * then a BULK update (status-F repricing, most files touched → COW).
    * Both decisions are REQUIRED, not just observed: a wrong flip fails
    * the build loudly, and the final state must hash-equal the oracle's
    * net-effect replay — so the dispatch machinery AND both dispatched
    * paths gate together on one table history. */
  def mergeAutoQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("auto_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      // trickle: keys 10/20/30 — two updates and a delete
      val trickle = base.where(col("o_orderkey").isin(10L, 20L))
        .select(payload :+ (col("price_cents") + 5L).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
        .unionByName(base.where(col("o_orderkey") === 30L)
          .select(payload :+ col("price_cents"): _*)
          .withColumn("op", lit("d")).withColumn("seq", lit(1L)))
      val (p1, _, _) = mergeAuto(spark, root, trickle, "o_orderkey",
        commitTsMillis = 2000L)
      require(p1 == "mor", s"trickle wave must dispatch MOR, got $p1")
      // bulk: reprice every F-status order (excluding the deleted key)
      val bulk = base
        .where(col("o_orderstatus") === "F" && col("o_orderkey") =!= 30L)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val (p2, _, _) = mergeAuto(spark, root, bulk, "o_orderkey",
        commitTsMillis = 3000L)
      require(p2 == "cow", s"bulk wave must dispatch COW, got $p2")
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_sql_insert — the ORACLED face of SQL INSERT: the orders table
    * created WITHOUT the %10=6 slice, which is then inserted back
    * through `INSERT INTO ... BY NAME` SQL text and read back through
    * the registered name. The oracle is simply ALL orders — a dropped
    * row, a mis-mapped column, or a null-filled value that shouldn't be
    * breaks the hash. The PK-refusal shapes are spec-pinned
    * (SqlMergeSpec). */
  def sqlInsertQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("sql_insert_orders", dir)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "sql_ins_orders",
      root)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base.where(col("o_orderkey") % 10 =!= 6),
        "o_orderkey", nFiles = 8, commitTsMillis = 1000L)
      base.where(col("o_orderkey") % 10 === 6)
        .createOrReplaceTempView("sql_ins_src")
      spark.sql("INSERT INTO sql_ins_orders BY NAME SELECT * FROM sql_ins_src")
    }
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
        |FROM sql_ins_orders ORDER BY o_orderkey""".stripMargin)
  }

  /** t_sql_create — the ORACLED face of the DSv2 catalog's full DDL
    * lifecycle ([[graft.plans.GraftCatalog]]): CREATE TABLE ... USING
    * graft declares the keyed table in plain SQL, INSERT INTO loads it
    * through the V2 AppendData path, MERGE INTO applies an
    * update+delete wave on the catalog-qualified name, and the gated
    * read is a catalog-qualified SELECT — so table creation, loading,
    * mutation and serving all happen without a single API call. The
    * oracle replays the same net effect from raw orders; any drift in
    * the catalog's resolution swap (wrong generation, dropped DV,
    * mis-bound attribute after the relation swap) breaks the hash. */
  def sqlCreateQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val wh = Layout.indexPath("graft_warehouse", dir)
    spark.conf.set("spark.sql.catalog.graft_wh",
      "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wh.warehouse", wh)
    val root = s"$wh/sqlc_orders"
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      spark.sql(
        """CREATE TABLE graft_wh.sqlc_orders (
          |  o_orderkey BIGINT, o_custkey BIGINT,
          |  o_orderstatus STRING, price_cents BIGINT)
          |USING graft TBLPROPERTIES ('key' = 'o_orderkey')""".stripMargin)
      graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
        .createOrReplaceTempView("sqlc_src")
      spark.sql(
        "INSERT INTO graft_wh.sqlc_orders SELECT * FROM sqlc_src")
      spark.sql(
        """MERGE INTO graft_wh.sqlc_orders AS t
          |USING sqlc_src AS s ON t.o_orderkey = s.o_orderkey
          |WHEN MATCHED AND s.o_orderkey % 10 = 7 THEN DELETE
          |WHEN MATCHED AND s.o_orderkey % 10 = 3
          |  THEN UPDATE SET price_cents = s.price_cents * 2
          |""".stripMargin)
    }
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
        |FROM graft_wh.sqlc_orders ORDER BY o_orderkey""".stripMargin)
  }

  /** t_sql_alter — the ORACLED face of ALTER TABLE ADD COLUMNS
    * ([[addColumns]] through [[graft.plans.GraftCatalog.alterTable]]):
    * additive evolution as a METADATA-ONLY commit. The table is
    * created and loaded two-columned in SQL, widened by `ALTER TABLE
    * ... ADD COLUMNS (o_flag BIGINT, note STRING)` — one manifest
    * commit, zero data movement — then a catalog-qualified UPDATE
    * writes real values into the new columns for one slice and a
    * DELETE removes another, so the read exercises all three row
    * populations at once: evolved-and-written, evolved-but-null-filled
    * (old files served THROUGH the widened `#schema=`), and deleted.
    * The oracle replays the same net effect from raw orders; a dropped
    * null-fill, a wrongly-backfilled value, or an ALTER that rewrote
    * (and thereby re-stamped) data files all break the hash. */
  def sqlAlterQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val wh = Layout.indexPath("graft_warehouse", dir)
    spark.conf.set("spark.sql.catalog.graft_wh",
      "graft.plans.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_wh.warehouse", wh)
    val root = s"$wh/sqla_orders"
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      spark.sql(
        """CREATE TABLE graft_wh.sqla_orders (
          |  o_orderkey BIGINT, price_cents BIGINT)
          |USING graft TBLPROPERTIES ('key' = 'o_orderkey')""".stripMargin)
      graft.Tables.orders(spark, dir).select(
        col("o_orderkey"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
        .createOrReplaceTempView("sqla_src")
      spark.sql("INSERT INTO graft_wh.sqla_orders SELECT * FROM sqla_src")
      val filesBefore = currentMeta(spark, root).entries.map(_.name).toSet
      spark.sql(
        "ALTER TABLE graft_wh.sqla_orders ADD COLUMNS " +
          "(o_flag BIGINT, note STRING)")
      // the declared contract IS the gate: a rewriting ALTER fails the
      // build loudly, not just a scalatest run
      val after = currentMeta(spark, root)
      require(after.entries.map(_.name).toSet == filesBefore,
        "t_sql_alter: ADD COLUMNS must be metadata-only (data files " +
          "changed across the ALTER commit)")
      spark.sql(
        """UPDATE graft_wh.sqla_orders
          |SET o_flag = price_cents % 7, note = 'flagged'
          |WHERE o_orderkey % 10 = 3""".stripMargin)
      spark.sql(
        "DELETE FROM graft_wh.sqla_orders WHERE o_orderkey % 10 = 7")
    }
    spark.sql(
      """SELECT o_orderkey, price_cents, o_flag, note
        |FROM graft_wh.sqla_orders ORDER BY o_orderkey""".stripMargin)
  }

  /** t_stream_sink — the ORACLED face of the `graft-merge` streaming
    * sink ([[graft.sources.MergeTableSink]]): the sink's exactly-once
    * protocol driven batch-by-batch the way `MicroBatchExecution`
    * drives it — `addBatch(0)` lands a trickle wave (mode=auto prices
    * it MOR: one key per file ⇒ amplification ≫ threshold), a CRASH
    * REPLAY of batch 0 carrying poison values is REFUSED by the
    * `#batch=` fence, `addBatch(1)` lands a bulk wave (priced COW),
    * and batch 1's replay is refused again — so the oracle hash
    * certifies end-state exactness THROUGH two dispatch regimes and
    * two refused replays, not just a happy path. (The `writeStream
    * .format("graft-merge")` wiring above this protocol is
    * MergeTableSinkSpec's e2e job — the harness is batch-only.) */
  def streamSinkQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("stream_sink", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      val sink = new graft.sources.MergeTableSink().createSink(
        spark.sqlContext, Map("path" -> root, "mode" -> "auto"),
        Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
      def wave(cond: Column, op: String, price: Column) = base.where(cond)
        .select(lit(op).as("op"), lit(1L).as("seq"), col("o_orderkey"),
          col("o_orderstatus"), price.as("price_cents"))
      // batch 0: trickle reprice (~0.1% of keys) → auto dispatches MOR
      sink.addBatch(0, wave(col("o_orderkey") % 1000 === 1, "u",
        col("price_cents") * 3))
      // crash replay of batch 0 with POISON values: fence refuses it
      sink.addBatch(0, wave(col("o_orderkey") % 1000 === 1, "u",
        lit(-1L)))
      // batch 1: bulk wave (delete %10=7, reprice %10=3) → priced COW
      sink.addBatch(1, wave(col("o_orderkey") % 10 === 7, "d",
        col("price_cents"))
        .unionByName(wave(col("o_orderkey") % 10 === 3, "u",
          col("price_cents") * 2)))
      sink.addBatch(1, wave(col("o_orderkey") % 10 === 3, "u", lit(-1L)))
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** t_merge_composite — the ORACLED face of COMPOSITE merge keys: a
    * lineitem-shaped table keyed (l_orderkey, l_linenumber) — the CDC
    * shape of real warehouse fact tables — through create + one change
    * wave that exercises every tuple-identity hazard at once:
    *   - an UPDATE addressed to (k, 1) must not touch (k, 2..7);
    *   - a DELETE of (k%10=7, line ≥ 4) must keep that order's lower
    *     lines alive (same leading key, different tuple);
    *   - an INSERT of (k%100=1, line 8) reuses an EXISTING leading key
    *     with a new second column — tuple identity makes it an insert,
    *     single-column identity would have clobbered line 1.
    * The oracle replays the same net effect in plain SQL; a netting,
    * anti-join or probe that collapses to the leading column breaks the
    * hash immediately. */
  def mergeCompositeQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_composite", dir)
    // v2: the base dedupes to one row per tuple (the synthetic lineitem
    // is not tuple-unique); v3: the wave applies through SQL MERGE
    val sig = s"v3_${Layout.dataSig(s"$dir/lineitem.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      // the synthetic lineitem is NOT tuple-unique (unlike real TPC-H):
      // a keyed table holds one row per key, so the face's base is the
      // deterministic per-tuple aggregate — the oracle replays the same
      val base = graft.Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(max(graft.functions.DetMath.cents(col("l_quantity")))
          .as("qty_cents"),
          min(col("l_returnflag")).as("l_returnflag"))
      create(spark, root, base, "l_orderkey,l_linenumber", nFiles = 8,
        commitTsMillis = 1000L)
      val upd = base
        .where(col("l_linenumber") === 1 && col("l_orderkey") % 10 === 3)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("qty_cents") + 100L).as("qty_cents"), col("l_returnflag"))
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val del = base
        .where(col("l_orderkey") % 10 === 7 && col("l_linenumber") >= 4)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val ins = base.where(col("l_orderkey") % 100 === 1)
        .select(col("l_orderkey")).distinct()
        .select(col("l_orderkey"), lit(8).as("l_linenumber"),
          lit(42L).as("qty_cents"), lit("Z").as("l_returnflag"))
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      // the wave travels as SQL `MERGE INTO` (round 15): the lowered
      // command must address the TUPLE through netting, cardinality,
      // anti-join and PK probe — the same oracle hash now gates the
      // SQL composite path (the API path stays state-pinned in
      // CompositeKeySpec, and both lower onto ONE merge core)
      graft.plans.SnapshotSqlCatalog.registerMerge(spark,
        "comp_sql_tbl", root)
      upd.unionByName(del).unionByName(ins)
        .withColumnRenamed("op", "action").drop("seq")
        .createOrReplaceTempView("comp_sql_src")
      spark.sql(
        """MERGE INTO comp_sql_tbl AS t USING comp_sql_src AS s
          |ON t.l_orderkey = s.l_orderkey
          |  AND t.l_linenumber = s.l_linenumber
          |WHEN MATCHED AND s.action = 'd' THEN DELETE
          |WHEN MATCHED AND s.action = 'u' THEN UPDATE SET
          |  qty_cents = s.qty_cents, l_returnflag = s.l_returnflag
          |WHEN NOT MATCHED AND s.action = 'c' THEN INSERT
          |  (l_orderkey, l_linenumber, qty_cents, l_returnflag)
          |  VALUES (s.l_orderkey, s.l_linenumber, s.qty_cents,
          |    s.l_returnflag)""".stripMargin)
    }
    read(spark, root).orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** t_cluster3d_read — the ORACLED face of n-dimensional clustered
    * compaction ([[compactZOrderN]]): the orders lake table re-clustered
    * on (o_orderkey, o_custkey, price_cents) and served a 2-of-3-dims
    * band predicate through [[readWhere]] — the cstat ranges of BOTH
    * non-key dims prune files the key-range layout could never skip,
    * and the oracle recomputes the band in plain SQL (a false skip is
    * silent row loss, exactly what the hash catches). The 3-d-vs-2-d
    * file-count separation is spec-pinned (Cluster3dSpec). */
  def cluster3dReadQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("cluster3d_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      compactZOrderN(spark, root, Seq("o_custkey", "price_cents"),
        nFiles = 8, commitTsMillis = 2000L)
    }
    readWhere(spark, root,
      col("o_custkey").between(20L, 80L) &&
        col("price_cents").between(10000000L, 20000000L))
      .orderBy(col("o_orderkey"))
  }

  /** t_cluster_str_read — the ORACLED face of STRING-dimension
    * clustered compaction: orders re-clustered on
    * (o_orderkey × o_orderstatus) where the status dimension is a
    * STRING, interleaved via its order-preserving prefix embedding
    * ([[graft.functions.StringPrefix64]] through `Layout.normBitsAuto`'s
    * pre-shifted wide-domain normalization — the refusal this face
    * replaces). The (key band × status) box is served by [[readWhere]]
    * — the key band prunes via the manifest ranges of the CLUSTERED
    * layout, the status equality via its embedded `#cstat` range — and
    * must hash-equal the same WHERE recomputed from raw orders: a
    * non-monotone embedding or a scrambled interleave is silent row
    * loss, exactly what the gate catches. File-count separation vs the
    * unclustered layout is spec-pinned (MergeTableSpec). */
  def clusterStrReadQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("cluster_str_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true)
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8,
        commitTsMillis = 1000L)
      compactZOrder(spark, root, "o_orderstatus", nFiles = 8,
        commitTsMillis = 2000L)
    }
    val mx = currentManifest(spark, root).map(_.maxKey).max
    readWhere(spark, root,
      col("o_orderkey") <= lit(mx / 2) && col("o_orderstatus") === "F")
      .orderBy(col("o_orderkey"))
  }

  /** t_merge_dv — the oracled merge-on-read face: the same base table
    * and first change batch as [[mergeOrdersQuery]] but applied through
    * [[mergeMor]] (positional DVs + appends, zero rewrites), followed by
    * a SECOND MOR wave — deletes (key%10=9), a re-update of the wave-1
    * conflict keys (key%100=42, +7 on their merged price), and the
    * RE-INSERT of keys deleted in wave 1 (key%100=77 ⊂ the %10=7
    * deletes) — so the read path must compose DVs accumulated across
    * two generations with appended files that resurrect a DV'd key.
    * The oracle replays both waves' net effect in plain SQL. */
  def mergeDvOrdersQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("merge_dv_orders", dir)
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new Path(root)
      val f = fs(spark, rootPath)
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("price_cents"))
      create(spark, root, base, "o_orderkey", nFiles = 8, commitTsMillis = 1000L)
      val payload = Seq(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"))
      val updates = base.where(col("o_orderkey") % 10 === 3)
        .select(payload :+ (col("price_cents") * 2).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val deletes = base.where(col("o_orderkey") % 10 === 7)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val conflictA = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val conflictB = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3 + 500).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(2L))
      val inserts = base.where(col("o_orderkey") % 10 === 1)
        .select((col("o_orderkey") + 1000000L).as("o_orderkey") +:
          (col("o_custkey") +: col("o_orderstatus") +:
            (col("price_cents") + 100L).as("price_cents") +: Nil): _*)
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      val wave1 = updates.unionByName(deletes).unionByName(conflictA)
        .unionByName(conflictB).unionByName(inserts)
      mergeMor(spark, root, wave1, "o_orderkey", nFiles = 4,
        commitTsMillis = 2000L)
      val del9 = base.where(col("o_orderkey") % 10 === 9)
        .select(payload :+ col("price_cents"): _*)
        .withColumn("op", lit("d")).withColumn("seq", lit(1L))
      val reupd42 = base.where(col("o_orderkey") % 100 === 42)
        .select(payload :+ (col("price_cents") * 3 + 507).as("price_cents"): _*)
        .withColumn("op", lit("u")).withColumn("seq", lit(1L))
      val reins77 = base.where(col("o_orderkey") % 100 === 77)
        .select(payload :+ (col("price_cents") + 999L).as("price_cents"): _*)
        .withColumn("op", lit("c")).withColumn("seq", lit(1L))
      val wave2 = del9.unionByName(reupd42).unionByName(reins77)
      mergeMor(spark, root, wave2, "o_orderkey", nFiles = 4,
        commitTsMillis = 3000L)
    }
    read(spark, root).orderBy(col("o_orderkey"))
  }

  /** COMPACT the table: rewrite the current file set as `nFiles`
    * range-disjoint files in one new generation. Every micro-batch
    * MERGE adds a small file (change-set-sized), so a streamed-into
    * table fragments linearly with batch count — the same append-debt
    * decay [[Compaction]] tracks for the epoch roots; this is the
    * MergeTable face of the cure. Readers never block (generation
    * publish is atomic), time travel to pre-compaction generations
    * still works until [[sweep]], and the rewritten layout restores
    * narrow manifest key ranges so future merges prune well again.
    * Doubles as the [[mergeMor]] PURGE: read() folds the deletion
    * vectors in, the rewrite emits clean files, and the new manifest
    * carries no `#dv=` lines — the standard MOR maintenance cycle
    * (accumulate cheap positional deletes, fold them at compaction). */
  def compact(spark: SparkSession, root: String, nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis()): Int = {
    val genDir0 = currentGenDir(spark, root)
    val m0 = genMeta(spark, genDir0)
    val gen = Snapshots.nextGen(spark, root)
    val df = readFiles(spark, root, m0.entries, m0.dvs, m0.schema)
    val (entries, cstats) = writeFiles(spark, root, df, m0.key, gen, nFiles)
    writeManifest(spark, root, gen, entries, m0.key,
      batchId = m0.batchId,
      cstats = cstats,
      schema = Some(df.schema), // evolved schema folds into the rewrite
      sbatch = m0.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    m0.entries.size
  }

  /** OPTIMIZE — bin-packed SMALL-FILE compaction (the Delta/Iceberg
    * OPTIMIZE production tables actually run: at 100 TB, [[compact]]'s
    * whole-table rewrite is a petabyte of IO, while streaming sinks and
    * narrow merges keep minting KB-scale files; OPTIMIZE rewrites ONLY
    * files under `smallBytes`, repacked into ~`targetBytes`
    * range-partitioned outputs, and carries every right-sized file by
    * reference — IO ∝ small-file bytes, never table bytes). DVs
    * targeting rewritten files fold in (a scoped purge); DVs on carried
    * files keep applying by name. Fewer than 2 small files = already
    * optimal: no-op, no generation. Returns (files packed, carried).
    *
    * OCC-STAGED since round 17: the pack is a [[prepareOptimizeAgainst]]
    * staging committed through [[commitPrepared]]'s arbitration, so
    * OPTIMIZE runs CONCURRENTLY with live optimistic writers — the
    * maintenance a fleet of trickle pipelines needs cannot require
    * quiescing them (N occ writers mint exactly the small files this
    * verb exists to pack). A winner touching a packed input (C1/C2)
    * replays the selection against the winner's state; disjoint ingest
    * rebases manifest-only; a racing optimizer that already packed the
    * same files turns the replay into a committed-nothing "noop". */
  def optimize(spark: SparkSession, root: String,
      smallBytes: Long = 8L << 20, targetBytes: Long = 64L << 20,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20): (Int, Int) = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareOptimizeAgainst(spark, root, g0, smallBytes, targetBytes) match {
      case None => (0, currentManifest(spark, root).size)
      case Some(h) =>
        val (o, hf) = commitPreparedCore(spark, root, h, commitTsMillis,
          maxAttempts)
        if (o.path == "noop") (0, currentManifest(spark, root).size)
        else {
          val total = manifest(spark, Snapshots.genDir(root, o.gen)).size
          (hf.touchedNames.size, total - hf.newEntries.size)
        }
    }
  }

  /** [[prepareMerge]]'s MAINTENANCE twin — stage an OPTIMIZE pack
    * against the CURRENT committed snapshot without committing it
    * (commit through [[commitPrepared]]; abandon through
    * [[discardPrepared]]). None = fewer than 2 small files (already
    * optimal — nothing to stage). */
  def prepareOptimize(spark: SparkSession, root: String,
      smallBytes: Long = 8L << 20,
      targetBytes: Long = 64L << 20): Option[PreparedMerge] = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareOptimizeAgainst(spark, root, g0, smallBytes, targetBytes)
  }

  /** OPTIMIZE's work phase as an OPTIMISTIC staging — maintenance
    * through the SAME prepare/commit arbitration as the N-writer merges
    * ([[commitPrepared]]): select `g0`'s small files, pack their live
    * rows (through `g0`'s DVs) into ~targetBytes outputs on disk,
    * commit nothing. Conflict footprint: `touchedNames` = the packed
    * inputs — a winner rewriting one (C1) or DV-ing one (C2)
    * invalidates the pack and the replay RE-SELECTS against the
    * winner's state; the change-key envelope is EMPTY (an optimize
    * changes no keys — any key a concurrent winner wrote stays exactly
    * as the winner left it, so C3's insert-overlap rule has nothing to
    * arbitrate and concurrent disjoint ingest rebases for free). This
    * is what lets maintenance run CONCURRENTLY with live occ writers:
    * the trickle pipelines keep committing while the pack is staged,
    * and the commit splices the packed files into whatever manifest is
    * newest. None = fewer than 2 small files (already optimal — the
    * caller commits nothing). */
  private def prepareOptimizeAgainst(spark: SparkSession, root: String,
      g0: Long, smallBytes: Long, targetBytes: Long): Option[PreparedMerge] = {
    val m = genMeta(spark, Snapshots.genDir(root, g0))
    val f = fs(spark, new Path(root))
    // sizes from the manifest; pre-size-column manifests fall back to
    // one status call per legacy entry
    val sized = m.entries.map(e =>
      e -> (if (e.bytes >= 0) e.bytes
        else f.getFileStatus(new Path(filePath(root, e.name))).getLen))
    val small = sized.collect { case (e, len) if len < smallBytes => e }
    if (small.size < 2) return None
    val nOut = math.max(1, math.ceil(
      sized.collect { case (_, len) if len < smallBytes => len }
        .sum.toDouble / targetBytes).toInt)
    val packed = readFiles(spark, root, small, m.dvs, m.schema)
    val (newEntries, newStats) =
      writeFiles(spark, root, packed, m.key, g0 + 1, nOut,
        physSchema = m.schema)
    // carried legacy entries get their bytes (already statused above)
    // and rows (one columnless pass) stamped in the same commit — the
    // opportunistic half of [[analyzeManifest]], so tables that predate
    // the columns converge to honest [[mergeAuto]] pricing through
    // ordinary maintenance. Stamps ride the handle as name-keyed values
    // (physical properties of immutable files) and apply at splice time.
    val carriedLegacy = sized.collect {
      case (e, len) if len >= smallBytes && (e.bytes < 0 || e.rows < 0) =>
        e.copy(bytes = len) }
    val carriedCounts =
      rowCountsByFile(spark, root, carriedLegacy.filter(_.rows < 0))
    val stamp = carriedLegacy.map(e => e.name ->
      (e.bytes, if (e.rows >= 0) e.rows
        else carriedCounts.getOrElse(e.name, -1L))).toMap
    Some(PreparedMerge(g0, m.key, nOut, small.map(_.name).toSet,
      newEntries, newStats,
      changeLo = Long.MaxValue, changeHi = Long.MinValue, // C3 never fires
      changes = spark.emptyDataFrame, mode = "optimize",
      optimizeSpec = Some((smallBytes, targetBytes)),
      carriedStamp = stamp))
  }

  /** Per-file physical row counts for `entries`, in ONE columnless
    * pass (the scan projects only `_metadata.file_path`, so parquet
    * materializes no data columns — row-group metadata drives it).
    * Counts are WRITTEN rows (DVs not applied) — the same quantity
    * [[writeFiles]] stamps, so backfilled and fresh entries price
    * identically in [[mergeAuto]]/[[deleteWhere]]. */
  private def rowCountsByFile(spark: SparkSession, root: String,
      entries: Seq[FileEntry]): Map[String, Long] = {
    if (entries.isEmpty) return Map.empty
    spark.read.parquet(entries.map(e => filePath(root, e.name)): _*)
      .groupBy(element_at(split(expr("_metadata.file_path"), "/"), -1)
        .as("file"))
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Backfill `rows` (and `bytes`) on legacy manifest entries — ones
    * written before those columns existed (-1). Without this, a
    * pre-rows table prices every candidate as 0 rows, so
    * [[mergeAuto]]/[[deleteWhere]] can never choose merge-on-read no
    * matter how large the rewrite would be. One columnless pass for
    * the counts + one getFileStatus per legacy entry for the bytes;
    * commits a METADATA-ONLY generation (no data files written, DVs
    * and stats carried verbatim). Returns entries backfilled; 0 =
    * nothing legacy, no commit. */
  def analyzeManifest(spark: SparkSession, root: String,
      commitTsMillis: Long = System.currentTimeMillis()): Int = {
    val m = genMeta(spark, currentGenDir(spark, root))
    val legacy = m.entries.filter(e => e.rows < 0 || e.bytes < 0)
    if (legacy.isEmpty) return 0
    val counts = rowCountsByFile(spark, root, legacy.filter(_.rows < 0))
    val f = fs(spark, new Path(root))
    val stamped = m.entries.map { e =>
      val withRows =
        if (e.rows >= 0) e
        else e.copy(rows = counts.getOrElse(e.name, -1L))
      if (withRows.bytes >= 0) withRows
      else withRows.copy(bytes =
        f.getFileStatus(new Path(filePath(root, e.name))).getLen)
    }
    val gen = Snapshots.nextGen(spark, root)
    writeManifest(spark, root, gen, stamped, m.key,
      batchId = m.batchId,
      dvs = m.dvs,
      cstats = m.cstats,
      schema = m.schema,
      sbatch = m.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    legacy.size
  }

  /** OPTIMIZE's debt metric: small files in the current manifest —
    * pure metadata when the manifest carries sizes. */
  def optimizeDebt(spark: SparkSession, root: String,
      smallBytes: Long = 8L << 20): Int = {
    val f = fs(spark, new Path(root))
    currentManifest(spark, root).count(e =>
      (if (e.bytes >= 0) e.bytes
       else f.getFileStatus(new Path(filePath(root, e.name))).getLen)
        < smallBytes)
  }

  /** The OPTIMIZE cadence decision — pair with
    * [[Compaction.Maintenance.register]]'s custom-due overload so one
    * scheduled sweep serves appender indexes and lake tables alike. */
  def shouldOptimize(spark: SparkSession, root: String,
      smallBytes: Long = 8L << 20, maxSmall: Int = 8): Boolean = {
    require(maxSmall >= 1, "maxSmall must be at least 1")
    optimizeDebt(spark, root, smallBytes) > maxSmall
  }

  /** DESCRIBE HISTORY — one row per committed generation: commit
    * instant, file/DV counts, the recorded streaming batch id (if the
    * generation came from an exactly-once sink). The operational
    * audit face every table format exposes (Delta DESCRIBE HISTORY,
    * Iceberg snapshots table); O(generations × manifest) METADATA
    * reads, zero data touched — the question "what happened to this
    * table and when" must never cost a table scan. */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    // provenance, not the fence: the batch THIS generation applied is
    // #applied; manifests written before that line existed carried only
    // the #batch fence, for which "the fence CHANGED at this generation"
    // is the same fact — the fold below recovers it. The fallback is
    // OFF for the FIRST retained generation: after a sweep the fence
    // before the window is unknowable, and a carried fence at the left
    // edge would be misattributed to a maintenance commit (null beats
    // wrong in a forensics view).
    var prevFence: Option[Long] = None
    var prevS: Map[String, Long] = Map.empty
    var first = true
    val rows = Snapshots.generationsWithTimes(spark, root).map { case (g, ts) =>
      val m = genMeta(spark, Snapshots.genDir(root, g))
      val batch = m.applied
        .orElse(if (!first && m.batchId != prevFence) m.batchId else None)
        .orElse(if (first) None else m.sbatch.collectFirst {
          case (sid, id) if !prevS.get(sid).contains(id) => id
        })
      prevFence = m.batchId
      prevS = m.sbatch
      first = false
      (g, ts, m.entries.size, m.dvs.size, batch)
    }
    rows.toDF("generation", "commit_ts_millis", "n_files", "n_dvs", "batch_id")
      .orderBy(col("generation"))
  }

  /** Z-ORDER CLUSTERED compaction — [[compact]] with the rewrite
    * arranged by the Morton interleave of (key, `dim2`) instead of the
    * key alone (Delta/Iceberg `OPTIMIZE ZORDER BY`): both columns
    * equi-width-normalized to u16 from the table's own min/max
    * (one aggregation), interleaved by the codegen'd
    * [[graft.functions.ZOrder64]], range-partitioned + sorted by the
    * code. Files become ~square tiles in (key, dim2) space, so the
    * manifest's key ranges AND `#cstat` dim2 ranges BOTH prune —
    * where key-range compaction leaves an UNCORRELATED dim2 spanning
    * the full domain in every file (no dim2 predicate can ever skip).
    * The trade is the classic one: per-file key ranges widen (≈√ the
    * tile), so point merges touch a few files instead of one — the
    * price of serving the whole 2-d query family from one clustered
    * copy. DVs fold in like [[compact]] (the rewrite reads through
    * them); dim2 must be integral (same domain as the stats). */
  def compactZOrder(spark: SparkSession, root: String, dim2: String,
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis()): Int =
    compactClustered(spark, root, dim2, nFiles, commitTsMillis,
      "compactZOrder", graft.functions.ZOrder64.zorder64)

  /** HILBERT-clustered compaction — [[compactZOrder]] with the Hilbert
    * curve as the space-filling order (Hilbert 1891; what Delta's
    * clustered tables and Databricks liquid clustering moved to): the
    * curve never jumps across the plane, so per-file tiles stay
    * contiguous and a 2-d box predicate opens ≤ the z-order file set on
    * seam-crossing boxes — `s_hilbert_pruned` measured exactly that
    * family, and the t_hilbert_read gate + leaf-metric spec pin it for
    * the lake table. Same machinery, same trade (per-file key ranges
    * widen ≈√tile), same DV fold-in. */
  def compactHilbert(spark: SparkSession, root: String, dim2: String,
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis()): Int =
    compactClustered(spark, root, dim2, nFiles, commitTsMillis,
      "compactHilbert", graft.functions.Hilbert32.hilbert32)

  /** N-DIMENSIONAL clustered compaction — [[compactZOrder]] generalized
    * past (key, dim2) for the (user, time, domain) query family: the
    * rewrite is arranged by [[graft.functions.InterleaveN]]'s n-way
    * Morton code over (leading key, dims...), each dimension equi-width
    * normalized into its `63/n`-bit budget from the table's own min/max
    * (ONE aggregation pass). Files become ~cubic tiles, so the
    * manifest's key ranges AND every dim's `#cstat` ranges prune — a
    * third-dimension band opens strictly fewer files than the 2-d
    * layout leaves it (spec-pinned), at the usual trade: per-file key
    * ranges widen ≈ⁿ√tile. Dims must be integral (same domain contract
    * as [[compactZOrder]]); DVs fold in like [[compact]]. */
  def compactZOrderN(spark: SparkSession, root: String, dims: Seq[String],
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis()): Int = {
    val genDir0 = currentGenDir(spark, root)
    val m0 = genMeta(spark, genDir0)
    val df = readFiles(spark, root, m0.entries, m0.dvs, m0.schema)
    val z = clusterCodeN(root, df, m0, dims)
    val gen = Snapshots.nextGen(spark, root)
    val (entries, cstats) =
      writeFiles(spark, root, df, m0.key, gen, nFiles, cluster = Some(z))
    writeManifest(spark, root, gen, entries, m0.key,
      batchId = m0.batchId,
      cstats = cstats,
      schema = Some(df.schema),
      sbatch = m0.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    m0.entries.size
  }

  /** The N-way Morton code of (leading key, dims...) over the table's
    * own bounds — [[clusterCode2]]'s n-dimensional sibling, shared by
    * the legacy and OCC n-d clustered compactions. String dims ride
    * their order-preserving prefix embedding (the SAME domain the
    * manifest's #cstat ranges store, so the layout's tiles and the
    * planner's pruning stats agree by construction); the wide-domain
    * normalization pre-shifts instead of overflowing
    * (Layout.normBitsAuto). */
  private def clusterCodeN(root: String, df: DataFrame, m: GenMeta,
      dims: Seq[String]): Column = {
    val lead = leadKey(m.key)
    val all = lead +: dims
    require(dims.nonEmpty && all.distinct.size == all.size,
      s"compactZOrderN($root): dims must be non-empty and distinct " +
        s"from the leading key '$lead': ${dims.mkString(", ")}")
    val dimVal = all.map(c => statVal(df.schema(c).dataType, col(c)))
    val bits = graft.functions.InterleaveN.bitsFor(all.size)
    val aggs = dimVal.flatMap(v => Seq(min(v), max(v)))
    val b = df.agg(aggs.head, aggs.tail: _*).head
    all.indices.foreach(i => require(!b.isNullAt(2 * i),
      s"compactZOrderN($root): empty table or all-null ${all(i)} — " +
        "no bounds to normalize against"))
    graft.functions.InterleaveN.interleaveN(
      dimVal.zipWithIndex.map { case (v, i) =>
        graft.ops.Layout.normBitsAuto(v, b.getLong(2 * i),
          b.getLong(2 * i + 1), bits)
      })
  }

  /** The 2-d interleave code of (leading key, dim2) over the table's
    * own bounds — ONE aggregation pass, shared by the legacy and OCC
    * clustered compactions so the two faces cannot drift. String
    * dimensions interleave through their order-preserving prefix
    * embedding (StringPrefix64 — the #cstat/manifest-range domain, so
    * layout tiles and pruning stats agree by construction); the u16
    * normalization would overflow on the embedding's near-full-Long
    * span, so normBitsAuto PRE-SHIFTS the wide domain instead of
    * refusing (monotone floor-division — tile order exact). */
  private def clusterCode2(root: String, df: DataFrame, m: GenMeta,
      dim2: String, face: String,
      code: (Column, Column) => Column): Column = {
    // composite keys interleave their LEADING column (the manifest-range
    // driver) with dim2; the full key still names the manifest
    val key = leadKey(m.key)
    val kVal = statVal(df.schema(key).dataType, col(key))
    val dVal = statVal(df.schema(dim2).dataType, col(dim2))
    val b = df.agg(min(kVal), max(kVal), min(dVal), max(dVal)).head
    (0 until 4).foreach(i => require(!b.isNullAt(i),
      s"$face($root): empty table or all-null " +
        s"${if (i < 2) key else dim2} — no bounds to normalize against"))
    code(
      graft.ops.Layout.normBitsAuto(kVal, b.getLong(0), b.getLong(1), 16),
      graft.ops.Layout.normBitsAuto(dVal, b.getLong(2), b.getLong(3), 16))
  }

  private def compactClustered(spark: SparkSession, root: String,
      dim2: String, nFiles: Int, commitTsMillis: Long, face: String,
      code: (Column, Column) => Column): Int = {
    val genDir0 = currentGenDir(spark, root)
    val m0 = genMeta(spark, genDir0)
    val df = readFiles(spark, root, m0.entries, m0.dvs, m0.schema)
    val z = clusterCode2(root, df, m0, dim2, face, code)
    val gen = Snapshots.nextGen(spark, root)
    // the FULL key names the manifest (a clustered rewrite must not
    // silently drop trailing composite-key columns); the cluster code
    // drives the layout, leadKey the entry ranges
    val (entries, cstats) =
      writeFiles(spark, root, df, m0.key, gen, nFiles, cluster = Some(z))
    writeManifest(spark, root, gen, entries, m0.key,
      batchId = m0.batchId,
      cstats = cstats,
      schema = Some(df.schema),
      sbatch = m0.sbatch)
    Snapshots.commit(spark, root, gen, commitTsMillis)
    m0.entries.size
  }

  // ---- OCC-STAGED COMPACTION (round 18): the compact family through
  // the SAME prepare/commit arbitration as optimize, so whole-table and
  // CLUSTERED re-layout run CONCURRENTLY with live optimistic writers —
  // a z-ordered 100 TB table under trickle ingest re-clusters without a
  // maintenance window. Conflict footprint: touched = EVERY base file
  // (the rewrite consumed them all); the change-key envelope is EMPTY
  // (a compaction changes no keys), so concurrent disjoint ingest
  // rebases manifest-only — the winner's new files carry beside the
  // re-clustered outputs and a LATER pass re-clusters them. A winner
  // rewriting or DV-ing a consumed file (C1/C2) replays: the closure
  // re-reads and re-clusters against the winner's state. Base DVs fold
  // into the rewrite and are dropped at splice (`baseDvs`).
  //
  // DELIBERATE DIVERGENCE from the legacy faces: the staged rewrite is
  // written under the CURRENT PHYSICAL schema (`physSchema`) and the
  // commit records the live state's schema — alias chains are KEPT, not
  // cleared. Clearing requires every surviving file to be rewritten
  // under logical names, but a concurrent winner's carried files store
  // bytes under the PRIOR physical names — a cleared chain would
  // silently null-fill them (row-level data loss). Chain-shedding
  // therefore remains the quiescent legacy [[compact]]'s job; the OCC
  // faces trade it for running inside the writer loop.

  /** [[prepareOptimizeAgainst]]'s FULL-REWRITE sibling: stage a
    * compaction (optionally clustered) of generation `g0`'s entire
    * live row set, commit nothing. None = empty manifest (nothing to
    * rewrite — the replay-to-noop case). */
  private[graft] def prepareCompactAgainst(spark: SparkSession, root: String,
      g0: Long, nFiles: Int,
      clusterOf: (DataFrame, GenMeta) => Option[Column],
      modeName: String): Option[PreparedMerge] = {
    val m = genMeta(spark, Snapshots.genDir(root, g0))
    if (m.entries.isEmpty) return None
    val df = readFiles(spark, root, m.entries, m.dvs, m.schema)
    val (entries, cstats) = writeFiles(spark, root, df, m.key, g0 + 1,
      nFiles, cluster = clusterOf(df, m), physSchema = m.schema)
    Some(PreparedMerge(g0, m.key, nFiles, m.entries.map(_.name).toSet,
      entries, cstats,
      changeLo = Long.MaxValue, changeHi = Long.MinValue, // C3 never fires
      changes = spark.emptyDataFrame, mode = modeName,
      baseDvs = m.dvs.toSet,
      reprepare = Some((sp, g) =>
        prepareCompactAgainst(sp, root, g, nFiles, clusterOf, modeName))))
  }

  private def compactOccVia(spark: SparkSession, root: String,
      nFiles: Int, commitTsMillis: Long, maxAttempts: Int,
      clusterOf: (DataFrame, GenMeta) => Option[Column],
      modeName: String): Int = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareCompactAgainst(spark, root, g0, nFiles, clusterOf, modeName) match {
      case None => 0
      case Some(h) =>
        val (o, hf) = commitPreparedCore(spark, root, h, commitTsMillis,
          maxAttempts)
        if (o.path == "noop") 0 else hf.touchedNames.size
    }
  }

  /** [[compact]] as an OPTIMISTIC writer — whole-table rewrite (and DV
    * purge: base DVs fold into the rewrite) that runs CONCURRENTLY
    * with live occ pipelines; alias chains are kept, not cleared (see
    * the divergence note above). Returns files rewritten. */
  def compactOcc(spark: SparkSession, root: String, nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20): Int =
    compactOccVia(spark, root, nFiles, commitTsMillis, maxAttempts,
      (_, _) => None, "compact-occ")

  /** [[compactZOrder]] as an OPTIMISTIC writer — the 2-d Morton
    * re-cluster inside the commit-arbitration loop; a conflict replay
    * re-reads AND re-normalizes against the winner's state (its bounds
    * may have moved). */
  def compactZOrderOcc(spark: SparkSession, root: String, dim2: String,
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20): Int =
    compactOccVia(spark, root, nFiles, commitTsMillis, maxAttempts,
      (df, m) => Some(clusterCode2(root, df, m, dim2, "compactZOrderOcc",
        graft.functions.ZOrder64.zorder64)), "compact-zorder-occ")

  /** [[compactHilbert]] as an OPTIMISTIC writer. */
  def compactHilbertOcc(spark: SparkSession, root: String, dim2: String,
      nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20): Int =
    compactOccVia(spark, root, nFiles, commitTsMillis, maxAttempts,
      (df, m) => Some(clusterCode2(root, df, m, dim2, "compactHilbertOcc",
        graft.functions.Hilbert32.hilbert32)), "compact-hilbert-occ")

  /** [[compactZOrderN]] as an OPTIMISTIC writer. */
  def compactZOrderNOcc(spark: SparkSession, root: String,
      dims: Seq[String], nFiles: Int = 8,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20): Int =
    compactOccVia(spark, root, nFiles, commitTsMillis, maxAttempts,
      (df, m) => Some(clusterCodeN(root, df, m, dims)),
      "compact-zordern-occ")

  /** [[rollbackTo]] as an OPTIMISTIC commit — the restore manifest is
    * staged (files of generation `g` BY REFERENCE — nothing copied,
    * nothing deletable) and committed through the same claim loop, but
    * with `strictAdvance`: ANY commit landing since the current state
    * was read REFUSES loudly instead of arbitrating — "restore g" was a
    * decision about a history that no longer ends where the caller saw
    * it end, and silently erasing the concurrent commit is precisely
    * the lost update the loop exists to prevent. Idempotence fences
    * carry from the CURRENT state (a rollback must not re-admit
    * already-applied stream batches), exactly like the legacy face. */
  def rollbackToOcc(spark: SparkSession, root: String, g: Long,
      commitTsMillis: Long = System.currentTimeMillis()): Long =
    commitPrepared(spark, root, prepareRollback(spark, root, g),
      commitTsMillis, maxAttempts = 5).gen

  /** [[rollbackToOcc]]'s staging half — a handle referencing generation
    * `g`'s committed files BY NAME (nothing copied, nothing owned),
    * strict against any concurrent advancement. */
  private[graft] def prepareRollback(spark: SparkSession, root: String,
      g: Long): PreparedMerge = {
    val srcDir = Snapshots.resolveAt(spark, root, g) // must be committed
    val src = genMeta(spark, srcDir)
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    val cur = genMeta(spark, Snapshots.genDir(root, g0))
    PreparedMerge(g0, cur.key, 0,
      touchedNames = cur.entries.map(_.name).toSet,
      newEntries = src.entries, newCstats = src.cstats,
      changeLo = Long.MaxValue, changeHi = Long.MinValue,
      changes = spark.emptyDataFrame, mode = "rollback",
      schemaOverride = Some(src.schema),
      dvsOverride = Some(src.dvs),
      ownsStaged = false, strictAdvance = true)
  }

  /** Retire old generations ([[Snapshots.sweep]] semantics — count-based
    * and/or AGE-based via `olderThanMillis`, the reference's 1-day
    * lifecycle window) and GC data files no retained manifest references
    * — copy-on-write's deferred delete. Also collects crash orphans
    * (files landed by a merge that never committed). Safe to run
    * CONCURRENTLY with optimistic writers when `minOrphanAgeMillis` is
    * set above the longest prepare-to-commit window (see the age guard
    * below); legacy two-step writers still require exclusion. */
  def sweep(spark: SparkSession, root: String,
      retainPredecessors: Int = 1,
      minOrphanAgeMillis: Long = 0L,
      olderThanMillis: Long = -1L,
      nowMillis: Long = System.currentTimeMillis()): Int = {
    Snapshots.sweep(spark, root, retainPredecessors, olderThanMillis,
      nowMillis)
    // referenced = data files AND deletion vectors of retained manifests
    val referenced = Snapshots.generations(spark, root).flatMap { g =>
      val gd = Snapshots.genDir(root, g)
      manifest(spark, gd).map(_.name) ++ dvNames(spark, gd)
    }.toSet
    val filesDir = new Path(s"$root/$FilesDir")
    val f = fs(spark, filesDir)
    if (!f.exists(filesDir)) return 0
    // age guard (Delta VACUUM's retention rule): an in-flight optimistic
    // [[prepareMerge]]'s staged files are UNREFERENCED until their
    // commit — indistinguishable from crash orphans by name alone. A
    // deployment running sweeps alongside optimistic writers sets
    // `minOrphanAgeMillis` above its longest prepare-to-commit window;
    // only files OLDER than that are collected (mtime of the landed
    // rename). The default 0 keeps the single-maintainer behavior.
    // Orphan age is judged against the WALL clock even when `nowMillis`
    // is injected: injected time drives generation-retention specs,
    // while the orphan guard protects REAL in-flight preparers whose
    // staged-file mtimes are real timestamps.
    val cutoff = System.currentTimeMillis() - minOrphanAgeMillis
    val orphans = f.listStatus(filesDir).toSeq
      .filter(st => st.getModificationTime <= cutoff)
      .map(_.getPath).filterNot(p => referenced.contains(p.getName))
    orphans.foreach(p => f.delete(p, false))
    // bloom registries: rows keyed by retired file names are inert for
    // correctness (lookups are by name) but accumulate forever — the
    // sweep rewrites each registry down to the rows still referenced.
    // The rewrite goes through a temp dir + delete + rename so a reader
    // racing the sweep sees either the old registry or NO registry
    // (unknown = read unpruned — the safe direction), never a partial.
    val bloomsRoot = new Path(s"$root/blooms")
    if (f.exists(bloomsRoot)) {
      // crash recovery first: a '<col>-sweep-tmp' left between a prior
      // sweep's delete and rename. If the registry is gone the tmp IS
      // the registry (finish the rename); if the registry survived the
      // tmp is stale (drop it). Never iterate a tmp as a registry.
      f.listStatus(bloomsRoot).filter(_.isDirectory)
        .filter(_.getPath.getName.endsWith("-sweep-tmp")).foreach { st =>
          val real = new Path(bloomsRoot,
            st.getPath.getName.stripSuffix("-sweep-tmp"))
          if (!f.exists(real))
            require(f.rename(st.getPath, real),
              s"bloom registry crash recovery rename failed for ${st.getPath}")
          else f.delete(st.getPath, true)
        }
      f.listStatus(bloomsRoot).filter(_.isDirectory)
        .filterNot(_.getPath.getName.endsWith("-sweep-tmp")).foreach { st =>
        val dir = st.getPath.toString
        // the parquet rewrite drops non-data files: remember whether
        // this registry carried the format marker and restore it after
        // (a LEGACY registry must stay marker-less — its keys are still
        // legacy after the row filter)
        val hadMarker = bloomFormatOk(spark, st.getPath)
        val rows = spark.read.parquet(dir)
        val keep = rows.filter(col("file").isin(referenced.toSeq: _*))
        if (keep.count() < rows.count()) {
          val tmp = s"$dir-sweep-tmp"
          keep.coalesce(1).write.mode("overwrite").parquet(tmp)
          // the marker rides INSIDE the tmp, BEFORE the delete/rename
          // window: a crash there recovers the tmp as the registry, and
          // a current-format registry must not silently demote to
          // legacy (losing all pruning until a full rebuild). A legacy
          // registry stays marker-less — its keys are still legacy.
          if (hadMarker) writeBloomFormat(spark, new Path(tmp))
          f.delete(st.getPath, true)
          require(f.rename(new Path(tmp), st.getPath),
            s"bloom registry sweep rename failed for $dir")
        }
      }
    }
    orphans.size
  }

  // ========== OPTIMISTIC CONCURRENCY (multi-writer MERGE) ==========
  //
  // Everything above assumes the single-writer contract the reference
  // gets from its Step Function serialization (one state machine owns
  // the warehouse load end-to-end, `cdk_infrastructure/__init__.py`).
  // At 100 TB with many ingest pipelines that serialization IS the
  // bottleneck, so table formats replace it with optimistic MVCC
  // (Armbrust et al., VLDB 2020 §3.2): writers compute against a base
  // snapshot without locks, and COMMIT arbitrates — an atomic claim of
  // the next generation id, with file-granular conflict rules deciding
  // whether a loser's work is still valid (manifest-only REBASE) or
  // must be recomputed against the winner's state (REPLAY). Correctness
  // contract: the committed history is equivalent to SOME serial order
  // of the merges (each commit's state = its change set applied to the
  // previous commit's state).

  /** A merge computed against a base snapshot but not yet committed.
    * Its data files are on disk under `files/` (uuid-named and
    * UNREFERENCED — invisible to every reader; [[sweep]] collects them
    * if the handle is abandoned). `changeLo/changeHi` is the net change
    * set's key envelope: conflict tests are file-range-vs-envelope, so
    * the handle stays O(files) metadata at any change-set size — the
    * trade is an occasional false conflict (safe: it only forces a
    * replay, never a wrong state).
    *
    * `morStaged` records WHAT the staging physically is — it drives the
    * commit splice: a COW staging swaps `touchedNames` out of the
    * manifest for `newEntries`; a MOR staging carries EVERY current
    * entry and appends `newEntries` plus the `dvName` sidecar (zero
    * rewrites, the trickle-CDC shape). `mode` records what the CALLER
    * asked for ("cow" | "mor" | "auto") — it drives a REPLAY's
    * re-prepare, so `mode = "auto"` re-PRICES each attempt against the
    * winner's state (the batch that was a trickle against the base may
    * be a bulk rewrite against a compacted winner). */
  final case class PreparedMerge(
      baseGen: Long, key: String, nFiles: Int,
      touchedNames: Set[String],
      newEntries: Seq[FileEntry], newCstats: Seq[FileStat],
      changeLo: Long, changeHi: Long,
      changes: DataFrame,
      streamBatch: Option[(String, Long)] = None,
      dvName: Option[String] = None,
      morStaged: Boolean = false,
      mode: String = "cow",
      // replay pricing matches the prepare-time request by construction:
      // the threshold rides IN the handle (a separate commit-time
      // parameter could silently re-price a conflict replay differently)
      morAmplificationAbove: Double = 8.0,
      // mode = "optimize": the (smallBytes, targetBytes) selection spec a
      // conflict replay re-runs against the winner's state (maintenance
      // has no change set to recompute from — `changes` is unused)
      optimizeSpec: Option[(Long, Long)] = None,
      // mode = "optimize": rows/bytes stamped onto carried LEGACY entries
      // at commit (the opportunistic [[analyzeManifest]] half of
      // [[optimize]]) — physical properties of immutable files, so valid
      // under whichever manifest the splice carries them into
      carriedStamp: Map[String, (Long, Long)] = Map.empty,
      // PREDICATE writers (delete-where/update-where): a conflict replay
      // must RE-EVALUATE the predicate against the winner's state — a
      // frozen change set would delete/update rows the winner's commits
      // made non-matching (a lost update). The closure re-prepares
      // against the given generation; None = nothing matches anymore →
      // commit nothing ("noop"). Takes precedence over `mode` dispatch.
      reprepare: Option[(SparkSession, Long) => Option[PreparedMerge]] = None,
      // predicate writers: files whose invalidation must force a replay
      // even though the staging never rewrote them — the predicate's
      // FULL candidate set (an undelete could restore a matching row in
      // a candidate the change set never keyed). Guards C1/C2 only; the
      // commit splice still swaps exactly `touchedNames`.
      conflictNames: Set[String] = Set.empty,
      // the prepare's NET change-row count when the prepare already paid
      // for it (the auto-pricer's nNet) — what the SQL DML faces report
      // as rows affected without a second read of the candidate files.
      // -1 = not counted.
      netCount: Long = -1L,
      // METADATA handles (DDL / rollback): the schema the commit must
      // RECORD instead of carrying the live state's. Outer None = no
      // override (the default for every data staging); Some(inner) =
      // record exactly `inner` (inner None = a legacy schema-less
      // manifest, the rollback-to-legacy case).
      schemaOverride: Option[Option[
        org.apache.spark.sql.types.StructType]] = None,
      // conflict class D (metadata): the override above was computed
      // FROM the base generation's schema — a winner that changed the
      // schema since base invalidates it, so the commit must replay
      // (the re-prepare recomputes against the winner's schema). Data
      // commits that leave the schema untouched rebase for free.
      schemaSensitive: Boolean = false,
      // FULL-REWRITE handles (compact family): every base data file is
      // touched and read THROUGH the base DVs, so those DVs are folded
      // into the staged rewrite — the splice must drop them (they'd
      // dangle) while keeping any DV a concurrent winner added for its
      // OWN files (a winner DV targeting a touched file is a C2 replay,
      // so the survivors provably target only carried winner files).
      baseDvs: Set[String] = Set.empty,
      // ROLLBACK handles: the manifest's DV list verbatim (the restored
      // generation's own sidecars). Takes precedence over the carried-
      // state DV splice.
      dvsOverride: Option[Seq[String]] = None,
      // ROLLBACK handles reference COMMITTED files of the restored
      // generation as `newEntries` — a discard (replay/abandon) must
      // never delete them. True (default) = the staging minted its own
      // uuid files and owns their lifecycle.
      ownsStaged: Boolean = true,
      // ROLLBACK handles: ANY commit landing since base refuses loudly
      // instead of rebasing/replaying — "restore generation g" computed
      // against a state that then advanced would silently erase the
      // winner's commit (a lost update by construction; the caller must
      // re-decide against the new history, not have the verb decide).
      strictAdvance: Boolean = false)

  /** `path`: "clean" (no concurrent commit since base), "rebased"
    * (concurrent commits were disjoint — staged files reused verbatim,
    * manifest-only arbitration), "replayed" (true conflict — the merge
    * recomputed against the winner's state), "fenced" (a stream-batch
    * commit whose batch id another instance of the same stream already
    * applied — nothing committed, staging discarded; `gen` is the
    * generation that carried the fence), "noop" (an optimize replay
    * found the winner's state already optimal — e.g. a racing
    * optimizer packed the same small files — nothing committed,
    * staging discarded). */
  final case class OccOutcome(gen: Long, attempts: Int, path: String)

  /** Compute a merge against the CURRENT committed snapshot without
    * committing it — the optimistic writer's work phase. Same change
    * contract as [[merge]] (`op`/`seq` + payload, last-wins per key). */
  def prepareMerge(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4): PreparedMerge = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareAgainst(spark, root, g0, changes, key, nFiles)
  }

  /** [[prepareMerge]]'s merge-on-read twin — stage the change batch as
    * a DV sidecar + appended net-insert files against the CURRENT
    * committed snapshot (see [[prepareAgainstMor]] for why this is the
    * concurrent-trickle shape). */
  def prepareMergeMor(spark: SparkSession, root: String, changes: DataFrame,
      key: String, nFiles: Int = 4): PreparedMerge = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareAgainstMor(spark, root, g0, changes, key, nFiles)
  }

  /** The manifest metadata of a PINNED committed generation — what a
    * re-preparing SQL command reads its frames from (the closure's `g`
    * is the winner's generation, not the current one by the time the
    * read plans). */
  private[graft] def metaAt(spark: SparkSession, root: String,
      g: Long): GenMeta =
    genMeta(spark, Snapshots.genDir(root, g))

  /** [[prepareMergeAuto]] against a PINNED base generation — the hook
    * the SQL MERGE command's re-evaluating replay closure stages
    * through (its matched/not-matched computation is a function of the
    * generation it ran against, so prepare and computation must share
    * the pin). */
  private[graft] def prepareMergeAutoAt(spark: SparkSession, root: String,
      g0: Long, changes: DataFrame, key: String, nFiles: Int = 4,
      morAmplificationAbove: Double = 8.0): PreparedMerge =
    prepareAutoAgainst(spark, root, g0, changes, key, nFiles,
      morAmplificationAbove)

  /** [[commitPrepared]] returning the FINAL committed handle too — the
    * SQL faces read their row/file metrics from it (a replay
    * re-prepares, so the committed staging may not be the caller's). */
  private[graft] def commitPreparedWithHandle(spark: SparkSession,
      root: String, prepared: PreparedMerge,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 5): (OccOutcome, PreparedMerge) =
    commitPreparedCore(spark, root, prepared, commitTsMillis, maxAttempts)

  /** [[prepareMerge]]'s stats-dispatched twin — price the batch
    * against the current snapshot and stage COW or MOR accordingly;
    * a conflict replay re-prices against the winner's state. */
  def prepareMergeAuto(spark: SparkSession, root: String,
      changes: DataFrame, key: String, nFiles: Int = 4,
      morAmplificationAbove: Double = 8.0): PreparedMerge = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareAutoAgainst(spark, root, g0, changes, key, nFiles,
      morAmplificationAbove)
  }

  /** The shared WORK-PHASE preamble of every optimistic prepare: the
    * base snapshot's metadata, the net change set, its conflict-key
    * envelope, and the manifest-pruned candidate files.
    *
    * The conflict envelope lives in the manifest's order domain —
    * embedding for string keys, same as the entry ranges C3 tests it
    * against; composite keys use the LEADING column's span, the same
    * domain as the entry ranges (coarser envelope = occasional false
    * conflict, never a missed one). */
  private final case class PrepCtx(m0: GenMeta, targetCols: Seq[String],
      net: DataFrame, kLo: Long, kHi: Long, touched: Seq[FileEntry])

  private def prepareCtx(spark: SparkSession, root: String, g0: Long,
      changes: DataFrame, key: String): PrepCtx = {
    val genDir0 = Snapshots.genDir(root, g0)
    val m0 = genMeta(spark, genDir0)
    require(key == m0.key,
      s"merge key '$key' does not match the table's key '${m0.key}'")
    val targetCols = m0.schema.map(visibleCols).getOrElse(
      readFiles(spark, root, m0.entries.take(1)).columns.toSeq)
    val net = netChanges(changes, key, targetCols)
    val lead = leadKey(key)
    val kv = statVal(net.schema(lead).dataType, col(lead))
    val bounds = net.agg(min(kv), max(kv)).head
    require(!bounds.isNullAt(0),
      s"prepareMerge($root): empty change set — nothing to merge")
    val touched = touchedEntries(spark, m0.entries,
      net.select(keyCols(key).map(col): _*))
    PrepCtx(m0, targetCols, net, bounds.getLong(0), bounds.getLong(1),
      touched)
  }

  private def prepareAgainst(spark: SparkSession, root: String, g0: Long,
      changes: DataFrame, key: String, nFiles: Int,
      ctx0: Option[PrepCtx] = None): PreparedMerge = {
    // ctx0 = the auto-pricer's already-computed context (meta fetch,
    // netting and candidate pruning are the prepare's planning cost —
    // paying them twice per occ-auto micro-batch would double the
    // streaming hot path's planning work)
    val c = ctx0.getOrElse(prepareCtx(spark, root, g0, changes, key))
    import c.{m0, targetCols, net, touched}
    // identical pruning + rewrite shape as the single-writer merge
    val upserts = net.where(col("op") =!= "d").select(targetCols.map(col): _*)
    val merged =
      if (touched.isEmpty) upserts
      else readFiles(spark, root, touched, m0.dvs, m0.schema)
        .join(net.select(keyCols(key).map(col): _*), keyCols(key),
          "left_anti")
        .select(targetCols.map(col): _*)
        .unionByName(upserts)
    val (entries, cstats) = writeFiles(spark, root, merged, key, g0 + 1,
      nFiles, physSchema = m0.schema)
    PreparedMerge(g0, key, nFiles, touched.map(_.name).toSet, entries, cstats,
      c.kLo, c.kHi, changes)
  }

  /** The MERGE-ON-READ work phase of an optimistic writer — what
    * [[mergeMor]] stages, without a commit: net deletes land as a
    * staged DV sidecar over the candidate files' live rows, net
    * upserts as appended files, and NOTHING is rewritten. This is the
    * shape N concurrent trickle-CDC pipelines want: zero write
    * amplification per micro-batch, and because the staging touches no
    * existing file, the loser's arbitration is almost always a
    * manifest-only REBASE — where a COW staging's wide touch set makes
    * C1/C3 conflicts (→ full replays) frequent under contention.
    *
    * Conflict footprint: `touchedNames` = the candidate files whose
    * live rows the staged DV was computed FROM — the same C1/C2/C3
    * rules arbitrate both staging kinds (a rewritten/re-DV'd candidate
    * invalidates our position set exactly like a rewritten COW input
    * file; an envelope-overlapping new file carries key images our DV
    * does not kill). */
  private def prepareAgainstMor(spark: SparkSession, root: String, g0: Long,
      changes: DataFrame, key: String, nFiles: Int,
      ctx0: Option[PrepCtx] = None): PreparedMerge = {
    val c = ctx0.getOrElse(prepareCtx(spark, root, g0, changes, key))
    import c.{m0, targetCols, net, touched}
    val dvName =
      if (touched.isEmpty) None
      else {
        val delRows = readFiles(spark, root, touched, m0.dvs,
          m0.schema, keepLineage = true)
          .withColumn("file", col("__file"))
          .withColumn("pos", col("__pos"))
          .join(net.select(keyCols(key).map(col): _*), keyCols(key),
            "left_semi")
          .select(col("file"), col("pos"))
        writeDv(spark, root, g0 + 1, delRows)
      }
    val upserts = net.where(col("op") =!= "d").select(targetCols.map(col): _*)
    val (entries, cstats) = writeFiles(spark, root, upserts, key, g0 + 1,
      nFiles, physSchema = m0.schema)
    PreparedMerge(g0, key, nFiles, touched.map(_.name).toSet, entries, cstats,
      c.kLo, c.kHi, changes, dvName = dvName, morStaged = true, mode = "mor")
  }

  /** [[prepareMerge]]'s stats-dispatched twin: price the batch against
    * `g0`'s manifest (rewrite amplification = candidate live rows per
    * net change, the [[mergeAuto]] metric) and stage MERGE-ON-READ when
    * a copy-on-write rewrite would amplify past the threshold. The
    * chosen staging rides in the handle's `morStaged`; the REQUEST
    * ("auto") rides in `mode`, so a conflict replay re-prices against
    * the winner's state instead of blindly repeating this attempt's
    * choice. */
  private def prepareAutoAgainst(spark: SparkSession, root: String, g0: Long,
      changes: DataFrame, key: String, nFiles: Int,
      morAmplificationAbove: Double): PreparedMerge = {
    // price FROM the prepare's own context: the netted change set is
    // one row per key tuple (nNet = its count) and `touched` is the
    // candidate set the dispatched prepare will use — ONE meta fetch,
    // ONE pruning pass per attempt, shared with the staging itself via
    // ctx0. The net frame is PERSISTED for the attempt: sharing PrepCtx
    // shares the plan, not the result, so without the cache the pricing
    // count and the dispatched staging would each pay the netting
    // shuffle — twice per occ-auto micro-batch on the streaming hot path.
    val c0 = prepareCtx(spark, root, g0, changes, key)
    val c = c0.copy(net = c0.net.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val nNet = c.net.count()
      val touchedRows = c.touched.map(e => math.max(0L, e.rows)).sum
      val amp = touchedRows.toDouble / math.max(1L, nNet)
      val h =
        if (amp > morAmplificationAbove)
          prepareAgainstMor(spark, root, g0, changes, key, nFiles, Some(c))
        else prepareAgainst(spark, root, g0, changes, key, nFiles, Some(c))
      // the net count was paid for by the pricing — ride it on the
      // handle so the SQL DML faces report rows affected for free
      h.copy(mode = "auto", morAmplificationAbove = morAmplificationAbove,
        netCount = nNet)
    } finally c.net.unpersist(blocking = false)
  }

  /** [[deleteWhere]] as an OPTIMISTIC writer — predicate delete that
    * runs CONCURRENTLY with live occ pipelines instead of requiring
    * their quiescence: matching rows are read once (pruned candidates
    * only) into a keyed 'd' change set, staged through
    * [[prepareMergeAuto]]'s pricing (DV sidecar for sparse matches,
    * scoped rewrite for dense — the same two physical shapes
    * [[deleteWhere]] dispatches between) and committed through
    * [[commitPrepared]]'s arbitration. The SEMANTIC point is the
    * replay: a conflict RE-EVALUATES the predicate against the
    * winner's state (the handle's `reprepare` closure), so a row the
    * winner updated out of the predicate is NOT deleted — a frozen
    * change set would lose that update. None = no matching rows at
    * the current state (nothing staged; the no-op contract). */
  def prepareDeleteWhere(spark: SparkSession, root: String,
      predicate: Column, nFiles: Int = 4,
      morAmplificationAbove: Double = 8.0): Option[PreparedMerge] = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareDeleteWhereAgainst(spark, root, g0, predicate, nFiles,
      morAmplificationAbove)
  }

  private def prepareDeleteWhereAgainst(spark: SparkSession, root: String,
      g0: Long, predicate: Column, nFiles: Int,
      morAmplificationAbove: Double): Option[PreparedMerge] = {
    val m = genMeta(spark, Snapshots.genDir(root, g0))
    val candidates = prunedByPredicate(spark, root, m, predicate)
    val matching =
      if (candidates.isEmpty)
        readFiles(spark, root, m.entries.take(1), schema = m.schema)
          .limit(0).filter(predicate)
      else readFiles(spark, root, candidates, m.dvs, m.schema)
        .filter(predicate)
    if (matching.isEmpty) return None
    val changes = matching
      .withColumn("op", lit("d")).withColumn("seq", lit(1L))
    Some(prepareAutoAgainst(spark, root, g0, changes, m.key, nFiles,
      morAmplificationAbove).copy(mode = "delete-where",
      // a FULL conflict envelope + the predicate's candidate set: ANY
      // file added since base (it may hold new matching rows the frozen
      // change set would miss) and any invalidation of a candidate (an
      // undelete could restore a matching row the change set never
      // keyed) must force the re-evaluating replay — the write-skew
      // guard a key-span envelope cannot give a predicate writer
      changeLo = Long.MinValue, changeHi = Long.MaxValue,
      conflictNames = candidates.map(_.name).toSet,
      reprepare = Some((sp, g) => prepareDeleteWhereAgainst(sp, root, g,
        predicate, nFiles, morAmplificationAbove))))
  }

  /** [[deleteWhere]]'s one-call optimistic face: prepare + arbitrated
    * commit. None = nothing matched (nothing committed).
    *
    * Liveness (documented trade, r17 advice): the predicate writer's
    * conflict envelope is deliberately FULL — ANY concurrent commit
    * forces a re-prepare (re-prune, re-read, re-price), because a file
    * added or undeleted anywhere may change what matches (the
    * write-skew guard a key-span envelope cannot give). Under
    * sustained trickle ingest the verb can therefore burn attempts
    * without ever losing a data race; `maxAttempts` defaults to 20
    * (4× [[commitPrepared]]'s default) for exactly that reason —
    * raise it further for hot tables, or quiesce for a guaranteed
    * window. */
  def deleteWhereOcc(spark: SparkSession, root: String, predicate: Column,
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20,
      morAmplificationAbove: Double = 8.0): Option[OccOutcome] =
    prepareDeleteWhere(spark, root, predicate, nFiles,
      morAmplificationAbove).map(h =>
      commitPrepared(spark, root, h, commitTsMillis, maxAttempts))

  /** [[updateWhere]] as an OPTIMISTIC writer — same contract as
    * [[prepareDeleteWhere]] (assignment validation is
    * [[updateWhere]]'s: non-key existing columns, no type drift), with
    * the matching rows carried as a keyed 'u' change set whose payload
    * has the assignments applied. A conflict replay re-reads and
    * re-assigns against the winner's state, so assignments compose
    * with concurrent updates instead of clobbering them. */
  def prepareUpdateWhere(spark: SparkSession, root: String,
      predicate: Column, set: Map[String, Column], nFiles: Int = 4,
      morAmplificationAbove: Double = 8.0): Option[PreparedMerge] = {
    val g0 = Snapshots.currentGen(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed generation under $root"))
    prepareUpdateWhereAgainst(spark, root, g0, predicate, set, nFiles,
      morAmplificationAbove)
  }

  private def prepareUpdateWhereAgainst(spark: SparkSession, root: String,
      g0: Long, predicate: Column, set: Map[String, Column], nFiles: Int,
      morAmplificationAbove: Double): Option[PreparedMerge] = {
    val m = genMeta(spark, Snapshots.genDir(root, g0))
    val schema = m.schema.getOrElse(
      readFiles(spark, root, m.entries.take(1)).schema)
    require(set.nonEmpty, "prepareUpdateWhere: no assignments")
    keyCols(m.key).foreach(k => require(!set.contains(k),
      s"prepareUpdateWhere: assigning the merge key column '$k' re-keys " +
        "rows — express it as a merge (delete + insert)"))
    val unknown = set.keys.filterNot(visibleCols(schema).contains)
    require(unknown.isEmpty,
      s"prepareUpdateWhere: unknown columns ${unknown.mkString(", ")} — " +
        "schema evolution goes through merge(evolveSchema = true)")
    val candidates = prunedByPredicate(spark, root, m, predicate)
    val matching =
      if (candidates.isEmpty)
        readFiles(spark, root, m.entries.take(1), schema = m.schema)
          .limit(0).filter(predicate)
      else readFiles(spark, root, candidates, m.dvs, m.schema)
        .filter(predicate)
    // the when/otherwise wrap is TYPE-semantics parity with the legacy
    // updateWhere: the conditional coerces the assignment to the common
    // type with the column (an int literal widens to a bigint column),
    // so exactly the assignments the legacy face accepts pass the drift
    // guard below — `matching` is already predicate-filtered, so the
    // branch is always taken and the VALUE is the assignment's
    val assigned = matching.select(visibleCols(schema).map(c =>
      set.get(c).map(a => when(predicate, a).otherwise(col(c)).as(c))
        .getOrElse(col(c))): _*)
    // the type-drift guard updateWhere enforces: files contradicting
    // the recorded #schema brick every later schema-on-read
    assigned.schema.fields.zip(visibleStruct(schema).fields)
      .foreach { case (got, want) =>
        require(got.dataType == want.dataType,
          s"prepareUpdateWhere: assignment changes column '${want.name}' " +
            s"from ${want.dataType.simpleString} to " +
            s"${got.dataType.simpleString} — cast explicitly")
      }
    if (matching.isEmpty) return None
    val changes = assigned
      .withColumn("op", lit("u")).withColumn("seq", lit(1L))
    Some(prepareAutoAgainst(spark, root, g0, changes, m.key, nFiles,
      morAmplificationAbove).copy(mode = "update-where",
      // same write-skew guard as prepareDeleteWhereAgainst
      changeLo = Long.MinValue, changeHi = Long.MaxValue,
      conflictNames = candidates.map(_.name).toSet,
      reprepare = Some((sp, g) => prepareUpdateWhereAgainst(sp, root, g,
        predicate, set, nFiles, morAmplificationAbove))))
  }

  /** [[updateWhere]]'s one-call optimistic face: prepare + arbitrated
    * commit. None = nothing matched (nothing committed). Same FULL-
    * envelope liveness trade as [[deleteWhereOcc]] — see its note. */
  def updateWhereOcc(spark: SparkSession, root: String, predicate: Column,
      set: Map[String, Column], nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20,
      morAmplificationAbove: Double = 8.0): Option[OccOutcome] =
    prepareUpdateWhere(spark, root, predicate, set, nFiles,
      morAmplificationAbove).map(h =>
      commitPrepared(spark, root, h, commitTsMillis, maxAttempts))

  /** [[deleteWhereOcc]] returning the DELETED ROW COUNT — what the SQL
    * `DELETE FROM` face reports. The count is the committed prepare's
    * own net-change count (paid for by the auto-pricing), so a conflict
    * replay's re-evaluation is what gets counted — never the stale
    * first attempt. 0 = nothing matched (no commit). */
  private[graft] def deleteWhereOccCounted(spark: SparkSession,
      root: String, predicate: Column, nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20,
      morAmplificationAbove: Double = 8.0): Long =
    prepareDeleteWhere(spark, root, predicate, nFiles,
      morAmplificationAbove) match {
      case None => 0L
      case Some(h) =>
        val (o, hf) = commitPreparedCore(spark, root, h, commitTsMillis,
          maxAttempts)
        if (o.path == "noop") 0L else math.max(0L, hf.netCount)
    }

  /** [[updateWhereOcc]] returning the (files rewritten, files carried)
    * pair the SQL `UPDATE` face reports — a MOR-priced staging rewrote
    * nothing (its work is a DV + appends), mirroring what the metrics
    * mean on the legacy face. */
  private[graft] def updateWhereOccCounted(spark: SparkSession,
      root: String, predicate: Column, set: Map[String, Column],
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20,
      morAmplificationAbove: Double = 8.0): (Int, Int) =
    prepareUpdateWhere(spark, root, predicate, set, nFiles,
      morAmplificationAbove) match {
      case None => (0, currentManifest(spark, root).size)
      case Some(h) =>
        val (o, hf) = commitPreparedCore(spark, root, h, commitTsMillis,
          maxAttempts)
        if (o.path == "noop") (0, currentManifest(spark, root).size)
        else {
          val total = manifest(spark, Snapshots.genDir(root, o.gen)).size
          (if (hf.morStaged) 0 else hf.touchedNames.size,
            total - hf.newEntries.size)
        }
    }

  /** File-granular conflict test between what `h` read/affected at its
    * base and everything committed since (the Delta commit-conflict
    * rules, envelope-coarse on inserts):
    *   C1 — a file we REWROTE was itself rewritten/compacted/rolled
    *        away: the rows we merged from are no longer the table's;
    *   C2 — a deletion vector added since base targets a file we
    *        rewrote: same staleness through the MOR path;
    *   C3 — a file ADDED since base overlaps our change-key envelope:
    *        the winner wrote rows for keys we also changed (or deleted),
    *        and carrying their file next to our rewrite would duplicate
    *        or resurrect them.
    * Any hit → replay. A swept base is indistinguishable from a
    * conflict (nothing to diff against) and also replays. */
  private def hasConflict(spark: SparkSession, root: String,
      h: PreparedMerge, now: GenMeta): Boolean = {
    if (!Snapshots.generations(spark, root).contains(h.baseGen)) return true
    val base = genMeta(spark, Snapshots.genDir(root, h.baseGen))
    // D — METADATA conflict (schema-sensitive handles only): the
    // handle's schemaOverride was derived from base's schema; a winner
    // that changed the schema since base (a racing ALTER) invalidates
    // the derivation — replay recomputes it against the winner's schema
    if (h.schemaSensitive && now.schema != base.schema) return true
    val baseNames = base.entries.map(_.name).toSet
    // C1/C2 guard the REWRITTEN set plus a predicate writer's wider
    // candidate set (conflictNames); the splice still swaps exactly
    // touchedNames
    val guarded = h.touchedNames ++ h.conflictNames
    if (!guarded.subsetOf(now.entries.map(_.name).toSet))
      return true // C1
    // C2: the SYMMETRIC DV delta — a DV added since base deletes rows we
    // merged from; a DV REMOVED since base (a rollback's undelete)
    // restores rows our rewrite of the same file would re-delete. Either
    // direction on a touched file invalidates the rewrite. Sidecars are
    // change-set-sized reads.
    val dvDelta = ((now.dvs.toSet -- base.dvs.toSet) ++
      (base.dvs.toSet -- now.dvs.toSet)).toSeq.sorted
    if (dvDelta.nonEmpty) {
      val targets = spark.read.parquet(dvDelta.map(filePath(root, _)): _*)
        .select("file").distinct().collect().map(_.getString(0)).toSet
      if (targets.exists(guarded)) return true
    }
    now.entries.exists(e => !baseNames.contains(e.name) && // C3
      e.minKey <= h.changeHi && e.maxKey >= h.changeLo)
  }

  /** Atomically PUBLISH a fully-committed staged dir (manifest AND
    * marker already inside) as generation `target` — routed through the
    * root's [[CommitLog]]: the rename protocol by default (the claim IS
    * the commit — no window where a generation id is taken but
    * uncommitted, and no commit can interleave between a writer's state
    * read and its publish: any such commit must itself be `target`, and
    * the claim admits exactly one winner), or a registered
    * conditional-put log on stores without atomic rename (raw S3 — see
    * [[CommitLog]]'s contract and CommitLogSpec). */
  private def publishGeneration(f: org.apache.hadoop.fs.FileSystem,
      root: String, target: Long, tmp: Path): Boolean =
    CommitLog.forRoot(root).publish(f, root, target, tmp)

  /** Commit a prepared merge — the optimistic CAS loop. Each attempt:
    * read the current committed state gNow; if it moved past our base,
    * run the conflict rules (disjoint → REBASE: splice our staged files
    * into the winner's manifest, zero data work; conflict → REPLAY:
    * delete our staged files and recompute against the winner's state);
    * stage a COMPLETE generation dir (manifest + marker) and rename it
    * onto exactly `gNow + 1`. The rename is the serialization point:
    * committing `t` requires winning the rename of `t`, `t` is always
    * read-state + 1, and generation ids stay dense (a crashed writer
    * leaves only an `_occ-*` tmp, never a half-claimed id) — so the
    * winner's manifest is ALWAYS built against the newest committed
    * generation, with no lost-update window. A lost rename loops.
    * Rebase arbitration costs O(manifest) metadata — at 100 TB
    * concurrent writers on disjoint key ranges (the normal
    * partitioned-ingest shape) never reread or rewrite a byte of data.
    *
    * Scope (documented, same class as [[Snapshots.commit]]): rename
    * with dst-exists-fails atomicity (local, HDFS). On raw S3 an
    * external lock or conditional-put commit log is required. Do not
    * interleave LEGACY two-step writers — [[merge]], [[mergeMor]],
    * [[stageMerge]], [[compact]], [[compactZOrder]],
    * [[deleteWhere]], [[updateWhere]], [[rollbackTo]] — with optimistic
    * committers. Every one of those verbs now has an in-loop face that
    * runs CONCURRENTLY with live occ writers instead: [[optimize]]
    * stages through this loop natively; predicate DML goes through
    * [[deleteWhereOcc]] / [[updateWhereOcc]] (conflict replays
    * RE-EVALUATE the predicate against the winner's state); compaction
    * through [[compactOcc]] / [[compactZOrderOcc]] /
    * [[compactHilbertOcc]] / [[compactZOrderNOcc]] (replays re-read and
    * re-cluster; alias chains kept — chain-shedding alone still needs
    * the quiescent legacy [[compact]]); restore through
    * [[rollbackToOcc]] (refuses loudly if the table advanced); and the
    * ALTER family ([[addColumns]] / [[renameColumn]] / [[dropColumn]])
    * commits optimistically since round 18. The registered SQL surface
    * (DML commands and `CALL lake.*`) routes through the occ faces.
    * A crashed legacy staging under `_gen-(gNow+1)` blocks
    * the rename until discarded ([[discardStaged]]) — the give-up error
    * names it — and a legacy writer racing an optimistic commit fails
    * loudly at its own manifest write (the marker guard) rather than
    * erasing the published generation. */
  def commitPrepared(spark: SparkSession, root: String,
      prepared: PreparedMerge,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 5): OccOutcome =
    commitPreparedCore(spark, root, prepared, commitTsMillis, maxAttempts)._1

  /** [[commitPrepared]] returning the FINAL handle too (a replay
    * re-prepares, so the committed staging may not be the caller's) —
    * what [[optimize]]'s metrics read their packed/carried counts from. */
  private def commitPreparedCore(spark: SparkSession, root: String,
      prepared: PreparedMerge,
      commitTsMillis: Long,
      maxAttempts: Int): (OccOutcome, PreparedMerge) = {
    val f = fs(spark, new Path(root))
    var h = prepared
    var path = "clean"
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val gNow = Snapshots.currentGen(spark, root).getOrElse(
        throw new IllegalStateException(s"no committed generation under $root"))
      val state = genMeta(spark, Snapshots.genDir(root, gNow))
      // re-check OUR stream's fence against the live state EVERY
      // attempt: a newer instance of the same stream may have applied
      // this batch (and later ones) while this zombie writer was still
      // preparing — committing would regress the fence and re-admit
      // already-applied batches on the next restart
      h.streamBatch.foreach { case (sid, id) =>
        if (state.sbatch.get(sid).exists(_ >= id)) {
          discardStaging(f, root, h)
          return (OccOutcome(gNow, attempt, "fenced"), h)
        }
      }
      if (gNow != h.baseGen) {
        require(state.key == h.key,
          s"table key changed under prepared merge (${h.key})")
        // strict handles (rollback): restoring a past state over a
        // winner's commit would erase it — refuse, never arbitrate
        if (h.strictAdvance) {
          discardStaging(f, root, h)
          throw new IllegalStateException(
            s"${h.mode} on $root: the table advanced (generation " +
              s"${h.baseGen} -> $gNow) while the ${h.mode} was staged — " +
              "committing would erase the concurrent commit; re-examine " +
              "the new history and re-run if the restore is still wanted")
        }
        if (hasConflict(spark, root, h, state)) {
          discardStaging(f, root, h)
          // the replay honors the handle's REQUESTED mode: cow/mor
          // re-stage their own shape against the winner's state; auto
          // RE-PRICES (the winner may have compacted the table out from
          // under the base-time pricing); optimize RE-SELECTS small
          // files against the winner's state — and when the winner
          // already packed them away (two optimizers racing), commits
          // NOTHING ("noop": already optimal is not a failure)
          h = (h.reprepare match {
            // predicate writers: RE-EVALUATE against the winner's state
            // (the closure re-prunes, re-reads matching rows, re-prices
            // and carries its own fresh reprepare)
            case Some(f) => f(spark, gNow) match {
              case Some(h2) => h2
              case None => return (OccOutcome(gNow, attempt, "noop"), h)
            }
            case None => h.mode match {
              case "optimize" =>
                val (sb, tb) = h.optimizeSpec.getOrElse(
                  throw new IllegalStateException(
                    "optimize handle without its selection spec"))
                prepareOptimizeAgainst(spark, root, gNow, sb, tb) match {
                  case Some(h2) => h2
                  case None => return (OccOutcome(gNow, attempt, "noop"), h)
                }
              case "mor" =>
                prepareAgainstMor(spark, root, gNow, h.changes, h.key,
                  h.nFiles)
              case "auto" => prepareAutoAgainst(spark, root, gNow, h.changes,
                h.key, h.nFiles, h.morAmplificationAbove)
              case _ =>
                prepareAgainst(spark, root, gNow, h.changes, h.key, h.nFiles)
            }
          }).copy(streamBatch = h.streamBatch, mode = h.mode,
            morAmplificationAbove = h.morAmplificationAbove)
          path = "replayed"
        } else if (path == "clean") path = "rebased"
      }
      // splice against the CURRENT state: for gNow == baseGen this is
      // exactly the single-writer merge manifest; after a clean rebase
      // it is the winner's manifest with our staging folded in. A COW
      // staging swaps its touched files out for the rewrites; a MOR
      // staging carries EVERY current entry and every current DV, and
      // appends its net-insert files + its DV sidecar (the arbitration
      // stays O(manifest) metadata either way).
      val (entries, dvs, cstats) =
        if (h.morStaged)
          (state.entries ++ h.newEntries,
            state.dvs ++ h.dvName,
            state.cstats ++ h.newCstats)
        else {
          // an optimize handle's stamp backfills rows/bytes on carried
          // LEGACY entries (physical properties of the immutable files —
          // valid whichever manifest carries them)
          val carried = state.entries.filterNot(e =>
            h.touchedNames.contains(e.name)).map(e =>
            h.carriedStamp.get(e.name).fold(e) { case (b, r) =>
              e.copy(bytes = if (e.bytes >= 0) e.bytes else b,
                rows = if (e.rows >= 0) e.rows else r) })
          val carriedNames = carried.map(_.name).toSet
          // DV splice: a rollback override is verbatim; a full-rewrite
          // handle (compact family) drops the base DVs it folded into
          // the rewrite (a C2 check already replayed any winner DV
          // targeting a touched file, so the survivors target only
          // carried winner files); everything else carries the live set
          (carried ++ h.newEntries,
            h.dvsOverride.getOrElse(
              if (carried.isEmpty) Seq.empty[String]
              else state.dvs.filterNot(h.baseDvs)),
            state.cstats.filter(s =>
              carriedNames.contains(s.file)) ++ h.newCstats)
        }
      // fences MERGE BY MAX, never overwrite: a rebase of an older batch
      // must not regress a newer instance's fence for the same stream
      val fences = h.streamBatch match {
        case Some((sid, id)) => state.sbatch +
          (sid -> math.max(id, state.sbatch.getOrElse(sid, Long.MinValue)))
        case None => state.sbatch
      }
      val tmp = new Path(
        s"$root/_occ-${java.util.UUID.randomUUID().toString.take(8)}")
      f.mkdirs(tmp)
      val out = f.create(new Path(tmp, ManifestName), false)
      // the schema is the CURRENT state's (a winner may have evolved it;
      // our staged files simply null-fill any column they predate) —
      // unless the handle IS a schema change (DDL) or a restore
      // (rollback), whose override the schema-sensitive conflict rule
      // guarantees was derived from this very state's schema
      out.write(manifestBytes(entries, h.key,
        state.batchId, dvs, cstats,
        h.schemaOverride.getOrElse(state.schema), fences,
        applied = h.streamBatch.map(_._2)))
      out.close()
      val mk = f.create(new Path(tmp, Snapshots.markerName), false)
      mk.write(commitTsMillis.toString.getBytes("UTF-8"))
      mk.close()
      val target = gNow + 1
      if (publishGeneration(f, root, target, tmp))
        return (OccOutcome(target, attempt, path), h)
      f.delete(tmp, true) // lost the rename (or it nested) — retry
    }
    val blockDir = new Path(Snapshots.genDir(root,
      Snapshots.currentGen(spark, root).map(_ + 1).getOrElse(1L)))
    val blocked = f.exists(blockDir) &&
      !f.exists(new Path(blockDir, Snapshots.markerName))
    throw new IllegalStateException(
      s"optimistic merge on $root gave up after $maxAttempts attempts" +
        (if (blocked) s" — $blockDir exists without a commit marker " +
          "(a crashed legacy staging?); discardStaged it to unblock"
        else " (sustained commit contention)"))
  }

  /** N INDEPENDENT STREAMS, ONE TABLE: [[commitPrepared]] with a
    * per-stream replay fence. Each stream carries its own monotone
    * batch ids (`#sbatch=<streamId>` manifest lines, carried by every
    * commit), so a restart-replay of stream A is refused regardless of
    * how many commits streams B..Z landed in between — the exactly-once
    * contract of [[mergeExactlyOnce]], generalized to concurrent
    * writers. Returns None on a refused replay.
    *
    * `mode` picks the WORK-PHASE shape: "cow" (the default — rewrite
    * touched files), "mor" (DV sidecar + appends, zero write
    * amplification — the N-trickle-pipelines shape), or "auto"
    * (per-batch [[mergeAuto]] pricing INSIDE the OCC loop: each
    * prepare, including a conflict replay's re-prepare, prices against
    * the state it actually runs on). */
  def mergeOccExactlyOnce(spark: SparkSession, root: String,
      changes: DataFrame, key: String, streamId: String, batchId: Long,
      nFiles: Int = 4,
      commitTsMillis: Long = System.currentTimeMillis(),
      maxAttempts: Int = 20,
      mode: String = "cow",
      morAmplificationAbove: Double = 8.0): Option[OccOutcome] =
    if (appliedStreamBatchIds(spark, root).get(streamId).exists(_ >= batchId))
      None
    else {
      val h = (mode match {
        case "cow" => prepareMerge(spark, root, changes, key, nFiles)
        case "mor" => prepareMergeMor(spark, root, changes, key, nFiles)
        case "auto" => prepareMergeAuto(spark, root, changes, key, nFiles,
          morAmplificationAbove)
        case other => throw new IllegalArgumentException(
          s"mergeOccExactlyOnce($root): unknown mode '$other' — " +
            "cow | mor | auto")
      }).copy(streamBatch = Some(streamId -> batchId))
      val o = commitPrepared(spark, root, h, commitTsMillis, maxAttempts)
      // a zombie of this stream lost to a newer instance mid-commit:
      // the loop detected the fence and discarded — a refused replay
      if (o.path == "fenced") None else Some(o)
    }

  /** Delete a handle's staged artifacts: its uuid-named data files and
    * (for a MOR staging) its DV sidecar — the shared cleanup of a
    * replay, a refused fence, and an explicit abandon. */
  private def discardStaging(f: org.apache.hadoop.fs.FileSystem,
      root: String, h: PreparedMerge): Unit = {
    // a rollback handle's newEntries are COMMITTED files of the restored
    // generation, referenced by name — never staged, never deletable here
    if (!h.ownsStaged) return
    h.newEntries.foreach(e =>
      f.delete(new Path(filePath(root, e.name)), false))
    h.dvName.foreach(n => f.delete(new Path(filePath(root, n)), false))
  }

  /** Abandon a prepared merge: its staged files (and staged DV sidecar,
    * for a MOR handle) are deleted now rather than waiting for
    * [[sweep]]'s orphan collection. */
  def discardPrepared(spark: SparkSession, root: String,
      prepared: PreparedMerge): Unit =
    discardStaging(fs(spark, new Path(root)), root, prepared)
}
