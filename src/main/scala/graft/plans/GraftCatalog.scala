package graft.plans

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCapability, TableCatalog}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.{MergeTable, Snapshots}

/** A DataSource V2 `TableCatalog` over [[graft.streaming.MergeTable]]
  * roots — the SQL-citizenship face the conf registry
  * ([[SnapshotSqlCatalog.registerMerge]]) cannot give: tables are
  * CREATED, LISTED and DROPPED in plain SQL, visible to `SHOW TABLES`,
  * addressable by catalog-qualified name from any session that shares
  * the warehouse directory.
  *
  * {{{
  *   spark.sql.catalog.lake           = graft.plans.GraftCatalog
  *   spark.sql.catalog.lake.warehouse = s3://bucket/lake
  *
  *   CREATE TABLE lake.orders (o_orderkey BIGINT, price_cents BIGINT)
  *     USING graft TBLPROPERTIES ('key' = 'o_orderkey')
  *   SHOW TABLES IN lake
  *   SELECT * FROM lake.orders [VERSION AS OF 3]
  *   MERGE INTO / INSERT INTO / UPDATE / DELETE FROM lake.orders ...
  *   DROP TABLE lake.orders
  * }}}
  *
  * Design: the catalog is a THIN directory mapping — a table named `t`
  * IS the MergeTable at `<warehouse>/t`, discovered by its committed
  * generations (the manifest is the schema authority, so there is no
  * second metadata store to drift; the same move Delta makes with the
  * path-is-the-table rule). `loadTable` returns a [[GraftTable]] handle
  * with NO native read/write capability on purpose: every read and DML
  * resolves through [[SnapshotTimeTravelRule]]'s rewrites onto the
  * manifest-pruned, DV-applied plans the API faces use — one read path,
  * not two ([[MergeTableRelation]]'s FileIndex does the pruning either
  * way). `CREATE TABLE` also registers the bare table name in the
  * session registry, so the `history('t')` / `changes('t', a, b)` table
  * functions and bare-name statements compose immediately.
  *
  * Reference grounding: the reference provisions its warehouse DDL
  * out-of-band and idempotently (`source/sql_to_redshift_ingestion/
  * handler.py:23-40`, CREATE TABLE IF NOT EXISTS per pipeline start) —
  * here the same idempotence is the catalog's `IF NOT EXISTS` clause
  * over a real listable catalog. */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"graft catalog '$name' needs a warehouse directory: set " +
          s"spark.sql.catalog.$name.warehouse=<dir>"))
  }

  override def name(): String = catName

  private def spark = SparkSession.active
  private def fs(p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Single flat namespace: `lake.t` (namespace []) and `lake.default.t`
    * both address `<warehouse>/t`; anything deeper refuses loudly. */
  private def requireNamespace(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(ns)

  private def rootOf(ident: Identifier): String = {
    requireNamespace(ident.namespace())
    s"$warehouse/${ident.name.toLowerCase(java.util.Locale.ROOT)}"
  }

  /** The directory a table name maps to — for the CTAS command, which
    * creates through [[createTable]] then loads through the same
    * manifest-pruned insert path every other write uses. */
  private[plans] def tableRoot(ident: Identifier): String = rootOf(ident)

  /** The root for a bare table name — the maintenance procedures'
    * `table` argument resolution ([[GraftProcedures]]). */
  private[plans] def tableRootByName(tbl: String): String =
    rootOf(Identifier.of(Array.empty, tbl))

  /** `CALL lake.optimize('t', ...)` — the SQL maintenance verbs, see
    * [[GraftProcedures]] (OPTIMIZE / COMPACT / VACUUM / ROLLBACK /
    * ANALYZE as one-row-result stored procedures). */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    requireNamespace(ident.namespace())
    GraftProcedures.load(this, ident.name)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    GraftProcedures.Names.toArray
      .map(n => Identifier.of(namespace, n))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    val wh = new Path(warehouse)
    val f = fs(wh)
    if (!f.exists(wh)) return Array.empty
    f.listStatus(wh).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => Snapshots.currentGen(spark, s"$warehouse/$n").nonEmpty)
      .sorted
      .map(n => Identifier.of(namespace, n))
  }

  override def tableExists(ident: Identifier): Boolean =
    try Snapshots.currentGen(spark, rootOf(ident)).nonEmpty
    catch { case _: NoSuchNamespaceException => false }

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    if (Snapshots.currentGen(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    GraftTable.at(spark, root, ident.name, pinnedDir = None)
  }

  /** `SELECT ... FROM lake.t VERSION AS OF <g>` — Spark routes the
    * clause here for catalog tables; the handle pins the generation
    * directory and the resolution rule reads it manifest-directed and
    * DV-applied ([[graft.streaming.MergeTable.readResolved]]). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val g = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"VERSION AS OF over ${ident.name} takes a generation number; " +
          s"got '$version'"))
    GraftTable.at(spark, root, ident.name,
      pinnedDir = Some(Snapshots.resolveAt(spark, root, g)))
  }

  /** `TIMESTAMP AS OF` — micros since epoch arrive here; the same
    * at-or-before resolution (+ loud pre-window refusal) as the API. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootOf(ident)
    GraftTable.at(spark, root, ident.name,
      pinnedDir = Some(Snapshots.resolveAsOf(spark, root,
        Math.floorDiv(timestampMicros, 1000L))))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = rootOf(ident)
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      Seq(catName) ++ ident.namespace() :+ ident.name)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      s"CREATE TABLE ${ident.name} USING graft: PARTITIONED BY/" +
        "CLUSTERED BY are not supported — a merge table is key-range-" +
        "organized; declare the key with TBLPROPERTIES ('key' = '<col>')")
    val rawKey = Option(properties.get("key"))
      .orElse(Option(properties.get(TableCatalog.OPTION_PREFIX + "key")))
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TABLE ${ident.name} USING graft requires the merge key: " +
          "TBLPROPERTIES ('key' = '<column>')"))
    // canonicalize each key column to the SCHEMA's spelling (Spark SQL
    // resolves case-insensitively; MergeTable.create's own key check is
    // case-sensitive — a mis-cased TBLPROPERTIES key would fail deeper
    // with a misleading "not a column" on a column that plainly exists)
    val key = graft.streaming.MergeTable.keyCols(rawKey).map { k =>
      schema.fieldNames.find(_.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE ${ident.name}: key column '$k' is not a " +
            s"table column (${schema.fieldNames.mkString(", ")})"))
    }.mkString(",")
    // external LOCATION is refused rather than half-honored: the
    // catalog's contract is name ⟺ <warehouse>/<name> (DROP and
    // re-discovery depend on it)
    if (properties.containsKey(TableCatalog.PROP_LOCATION))
      throw new UnsupportedOperationException(
        s"CREATE TABLE ${ident.name} USING graft: LOCATION is not " +
          s"supported — the table lives at <warehouse>/${ident.name}; " +
          "register an external root with SnapshotSqlCatalog.registerMerge")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    MergeTable.create(spark, root, empty, key)
    // bare-name composition: history('t') / changes('t', ...) and
    // bare-name DML statements work immediately in this session —
    // UNLESS the bare name is already registered to a DIFFERENT root
    // (an external table): silently re-pointing it would redirect the
    // session's bare-name DML at this new table (silent wrong-table
    // writes); the catalog-qualified name always works regardless
    val prior = SnapshotSqlCatalog.mergeRootOf(spark, Seq(ident.name))
    if (prior.forall(_ == root))
      SnapshotSqlCatalog.registerMerge(spark, ident.name, root)
    loadTable(ident)
  }

  /** `ALTER TABLE lake.t ADD COLUMNS (c TYPE, ...)` — the SQL face of
    * additive evolution: ONE metadata-only commit
    * ([[graft.streaming.MergeTable.addColumns]] — manifest copied by
    * reference, `#schema=` widened, zero data movement), so the
    * statement is O(manifest) at any table size. Everything else
    * (drops, renames, type changes, repositioning, property edits)
    * refuses BY NAME: each would either rewrite data or break the
    * schema-on-read null-fill contract old files depend on. */
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    import org.apache.spark.sql.connector.catalog.TableChange
    val root = rootOf(ident)
    if (Snapshots.currentGen(spark, root).isEmpty)
      throw new NoSuchTableException(ident)
    def norm(n: String) = n.toLowerCase(java.util.Locale.ROOT)

    // PHASE 1 — validate EVERY change against the statement-start
    // schema, simulated through the statement's own earlier changes,
    // before committing ANY: each RENAME/DROP/ADD lands as its own
    // generation below, and a refusal halfway through a multi-change
    // ALTER must leave the table untouched rather than half-altered.
    // The simulation tracks the same name sets the MergeTable faces
    // enforce (visible logical names, key columns, reserved words);
    // the deep faces re-check for real at apply time — this pass
    // exists so they cannot fail after a sibling change already
    // committed.
    val m0 = MergeTable.genMeta(spark, Snapshots.resolve(spark, root))
    val base = m0.schema.getOrElse(
      MergeTable.readResolved(spark, root,
        Snapshots.resolve(spark, root)).schema)
    var visible = MergeTable.visibleCols(base).map(norm).toSet
    // every name retained files store bytes under — read-only context
    // for the mint-collision simulation (the statement's own changes
    // cannot add stored names that matter here: minted identities are
    // generation-stamped)
    val stored = base.fields
      .flatMap(f => f.name +: MergeTable.storedNames(f)).map(norm).toSet
    val keySet = MergeTable.keyCols(m0.key).map(norm).toSet
    def refuse(msg: String): Nothing = throw new IllegalArgumentException(
      s"ALTER TABLE ${ident.name}: $msg (no change of this statement " +
        "was applied)")
    changes.foreach {
      case a: TableChange.AddColumn =>
        if (a.fieldNames().length != 1) throw new UnsupportedOperationException(
          s"ALTER TABLE ${ident.name}: nested column " +
            s"${a.fieldNames().mkString(".")} is not supported — merge " +
            "table evolution is additive TOP-LEVEL columns only")
        if (a.position() != null) throw new UnsupportedOperationException(
          s"ALTER TABLE ${ident.name}: FIRST/AFTER positioning is not " +
            "supported — new columns APPEND (old files null-fill them " +
            "by position-independent name resolution; order is cosmetic)")
        // NOT NULL refuses rather than silently downgrading: every
        // pre-ALTER row would serve NULL in the column the user just
        // declared NOT NULL (old files cannot honor it)
        if (!a.isNullable()) throw new UnsupportedOperationException(
          s"ALTER TABLE ${ident.name}: ADD COLUMNS " +
            s"${a.fieldNames().head} NOT NULL is not supported — " +
            "existing rows null-fill an added column; declare it " +
            "nullable")
        val n = norm(a.fieldNames().head)
        if (MergeTable.ReservedColumns.contains(n))
          refuse(s"'${a.fieldNames().head}' is reserved — op/seq are the " +
            "change-envelope names, 'change' is the CDF feed marker")
        // only a VISIBLE collision refuses: re-ADDING a name retained
        // files still store bytes under mints a fresh physical identity
        // in MergeTable.addColumns (round 17)
        if (visible.contains(n))
          refuse(s"column '${a.fieldNames().head}' already exists")
        // addColumns' own refusals, simulated here so they cannot fire
        // AFTER a sibling change already committed: the comma rule
        // (alias chains are comma-delimited) and a stored name that
        // would collide with the minted physical identity
        if (n.contains(","))
          refuse(s"'${a.fieldNames().head}' contains ',' — the alias " +
            "chain is comma-delimited")
        if (stored.exists(t => t.startsWith(s"$n#g")))
          refuse(s"a retained file stores a name of the minted form " +
            s"'$n#g<gen>' — re-adding '$n' cannot mint a unique " +
            "physical identity")
        visible += n
      case r: TableChange.RenameColumn =>
        if (r.fieldNames().length != 1) throw new UnsupportedOperationException(
          s"ALTER TABLE ${ident.name}: nested column " +
            s"${r.fieldNames().mkString(".")} is not supported")
        val from = norm(r.fieldNames().head); val to = norm(r.newName())
        if (!visible.contains(from))
          refuse(s"no column '${r.fieldNames().head}' to rename")
        if (keySet.contains(from))
          refuse(s"'${r.fieldNames().head}' is a merge-key column — " +
            "re-keying is a rebuild, not a rename")
        if (MergeTable.ReservedColumns.contains(to))
          refuse(s"'${r.newName()}' is reserved")
        // a STORED-only collision renames logically (the field keeps
        // its physical identity) — only a visible name refuses
        if (visible.contains(to))
          refuse(s"'${r.newName()}' already names a column")
        if (r.fieldNames().head.contains(",") || r.newName().contains(","))
          refuse("alias chains are comma-delimited — a name carrying " +
            "',' renames only through a full rewrite")
        visible -= from; visible += to
      case d: TableChange.DeleteColumn =>
        if (d.fieldNames().length != 1) throw new UnsupportedOperationException(
          s"ALTER TABLE ${ident.name}: nested column " +
            s"${d.fieldNames().mkString(".")} is not supported")
        val n = norm(d.fieldNames().head)
        if (!visible.contains(n))
          refuse(s"no column '${d.fieldNames().head}' to drop")
        if (keySet.contains(n))
          refuse(s"'${d.fieldNames().head}' is a merge-key column — " +
            "dropping the key is a rebuild, not an ALTER")
        visible -= n // its stored names stay claimed (bytes stay in files)
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE ${ident.name}: ${other.getClass.getSimpleName} is " +
          "not supported on a merge table — ADD COLUMNS, RENAME COLUMN " +
          "and DROP COLUMN are; TYPE changes would contradict the bytes " +
          "every retained file already stores (rewrite through a new " +
          "column + merge instead)")
    }

    // PHASE 2 — apply in STATEMENT ORDER (an ADD preceding a RENAME is
    // applied before it, so `ADD c; RENAME c TO d` means what it says).
    // RENAME/DROP are METADATA-ONLY commits through the column-mapping
    // chain (MergeTable.renameColumn/dropColumn): data files untouched,
    // time travel keeps old names, stats keyed by name-at-write keep
    // applying. Consecutive ADDs coalesce into one commit (the plain
    // ADD COLUMNS statement stays one generation).
    // Each apply below is its own OPTIMISTIC commit (round 18) whose
    // conflict replay REVALIDATES against the live schema — so a
    // concurrent writer landing between phase 1 and an apply surfaces
    // as that apply's own loud refusal, not a corrupt commit. The
    // statement is still NOT atomic ACROSS its changes under such a
    // race: a failure after earlier sibling changes committed must say
    // so explicitly, never let the phase-1 "(no change was applied)"
    // wording be inferred (the r17 advice's scoping ask).
    var appliedChanges = 0
    def applying[T](what: String)(body: => T): T =
      try { val r = body; appliedChanges += 1; r }
      catch {
        case e: Throwable if appliedChanges > 0 =>
          throw new IllegalStateException(
            s"ALTER TABLE ${ident.name}: '$what' failed AFTER " +
              s"$appliedChanges earlier change(s) of this statement " +
              "committed (a concurrent writer changed the table between " +
              "validation and apply) — the statement is not atomic " +
              "across its changes; inspect history() and re-issue the " +
              "remainder", e)
      }
    val pendingAdds =
      scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.types.StructField]()
    def flushAdds(): Unit = if (pendingAdds.nonEmpty) {
      val names = pendingAdds.map(_.name).mkString(", ")
      applying(s"ADD COLUMNS $names") {
        MergeTable.addColumns(spark, root, pendingAdds.toSeq)
      }
      pendingAdds.clear()
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        pendingAdds += org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
      case r: TableChange.RenameColumn =>
        flushAdds()
        applying(s"RENAME COLUMN ${r.fieldNames().head} TO ${r.newName()}") {
          MergeTable.renameColumn(spark, root, r.fieldNames().head,
            r.newName())
        }
      case d: TableChange.DeleteColumn =>
        flushAdds()
        applying(s"DROP COLUMN ${d.fieldNames().head}") {
          MergeTable.dropColumn(spark, root, d.fieldNames().head)
        }
      case _ => () // unreachable: phase 1 refused it
    }
    flushAdds()
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (Snapshots.currentGen(spark, root).isEmpty) return false
    fs(new Path(root)).delete(new Path(root), true)
    // only drop the bare-name registration that POINTS HERE: the name
    // may be registered to an unrelated external root, which this DROP
    // must not orphan
    if (SnapshotSqlCatalog.mergeRootOf(spark, Seq(ident.name))
        .contains(root))
      SnapshotSqlCatalog.unregisterMerge(spark, ident.name)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported on the graft catalog — the table " +
        "name IS its directory; copy-create-drop explicitly if needed")
}

/** The catalog's table handle: schema from the (pinned or current)
  * generation's manifest, NO native capabilities — reads and DML are
  * rewritten by [[SnapshotTimeTravelRule]] onto the manifest-pruned,
  * DV-applied plans, so the catalog path and the registry path share
  * ONE read/write implementation. The handle CARRIES the parsed
  * [[graft.streaming.MergeTable.GenMeta]] so the analyzer's relation
  * swap reuses it instead of re-GETting the same manifest (loadTable
  * is per-statement, so the meta is one statement's consistent
  * snapshot, never a stale cache). */
final case class GraftTable(root: String, tableName: String,
    tableSchema: StructType, key: String, pinnedDir: Option[String],
    meta: MergeTable.GenMeta) extends Table {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("key", key)
    m.put(TableCatalog.PROP_LOCATION, root)
    m.put(TableCatalog.PROP_PROVIDER, "graft")
    m
  }
}

object GraftTable {
  def at(spark: SparkSession, root: String, name: String,
      pinnedDir: Option[String]): GraftTable = {
    val dir = pinnedDir.getOrElse(Snapshots.resolve(spark, root))
    val m = MergeTable.genMeta(spark, dir)
    // the VISIBLE shape: hidden (dropped) fields never reach DESCRIBE
    // or analysis; the resolution rule's plan serves the same columns
    val schema = m.schema.map(MergeTable.visibleStruct).getOrElse(
      MergeTable.readResolved(spark, root, dir).schema)
    GraftTable(root, name, schema, m.key, pinnedDir, m)
  }
}
