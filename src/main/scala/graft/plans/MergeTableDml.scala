package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, count, expr, lit, when}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL DML over registered [[graft.streaming.MergeTable]] roots — the
  * parser face of the predicate-DML API. Spark's ANSI grammar already
  * produces `DeleteFromTable` / `UpdateTable` nodes; for a name
  * registered via [[SnapshotSqlCatalog.registerMerge]] the resolution
  * rule in [[SnapshotTimeTravelRule]] rewrites them into these runnable
  * commands, which execute the manifest-pruned DV delete /
  * copy-on-write update when the statement runs. The predicate and
  * assignment expressions travel as SQL TEXT (re-parsed against the
  * table's own frame), so the commands stay decoupled from analyzer
  * state and the table's recorded schema — including columns added by
  * evolution after the plan was built. */
object MergeTableDml {

  /** `DELETE FROM <merge-table> WHERE <cond>` → the OPTIMISTIC
    * predicate delete ([[graft.streaming.MergeTable.deleteWhereOcc]],
    * round 18): manifest-pruned candidates staged as a priced change
    * set and committed through the occ arbitration, so SQL DELETE runs
    * CONCURRENTLY with live optimistic writers — a conflict replay
    * re-evaluates the predicate against the winner's state (never a
    * lost update, never a quiesce). Returns the deleted row count.
    * Liveness note: the predicate writer's conflict envelope is FULL
    * (any concurrent commit forces re-evaluation — the write-skew
    * guard), so under sustained trickle ingest the statement may burn
    * its attempts and fail loudly rather than commit a stale delete. */
  case class MergeTableDeleteCommand(root: String, condSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("rows_deleted", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val n = graft.streaming.MergeTable.deleteWhereOccCounted(session, root,
        expr(condSql))
      Seq(Row(n))
    }
  }

  /** `UPDATE <merge-table> SET c = e, ... [WHERE cond]` → the
    * OPTIMISTIC predicate update
    * ([[graft.streaming.MergeTable.updateWhereOcc]], round 18): same
    * concurrency contract (and liveness note) as the DELETE command —
    * a conflict replay re-reads and re-assigns against the winner's
    * state, so assignments compose with concurrent updates instead of
    * clobbering them. Returns (rewritten, carried) file counts; a
    * MOR-priced staging rewrote nothing (its work is a DV + appends). */
  case class MergeTableUpdateCommand(root: String,
      assignments: Seq[(String, String)], condSql: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("files_rewritten", IntegerType, nullable = false)(),
      AttributeReference("files_carried", IntegerType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val (t, c) = graft.streaming.MergeTable.updateWhereOccCounted(
        session, root,
        condSql.map(expr).getOrElse(expr("true")),
        assignments.map { case (k, v) => k -> expr(v) }.toMap)
      Seq(Row(t, c))
    }
  }

  // ---------------------------------------------------------------------
  // SQL MERGE INTO
  // ---------------------------------------------------------------------

  /** One WHEN MATCHED clause of a lowered MERGE, expressions as SQL text
    * (the same travel discipline as the other commands: re-parsed at run
    * time against the statement's own frames — target aliased as the
    * statement aliased it, source carrying its own alias — so qualified
    * references resolve exactly as written). */
  sealed trait SqlMergeClause extends Serializable
  /** WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, ... */
  final case class SqlUpdate(condSql: Option[String],
      assigns: Seq[(String, String)]) extends SqlMergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE */
  final case class SqlDelete(condSql: Option[String]) extends SqlMergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT (cols) VALUES (exprs) */
  final case class SqlInsert(condSql: Option[String],
      assigns: Seq[(String, String)]) extends Serializable

  /** `MERGE INTO <merge-table> USING <source> ON <cond> WHEN ...` →
    * ONE change batch staged through the auto-priced OPTIMISTIC merge
    * ([[graft.streaming.MergeTable.prepareMergeAutoAt]] +
    * `commitPrepared`, round 18 — runs concurrently with live occ
    * writers; a conflict replay re-runs the whole statement against
    * the winner's state): matched rows come from an inner join on the statement's
    * ON condition with FIRST-MATCHING-CLAUSE selection (the ANSI rule),
    * not-matched inserts from a left-anti join, and the whole batch
    * nets per key exactly as the API face does. The ANSI cardinality
    * contract is enforced: two source rows steering the same target key
    * refuse loudly instead of netting arbitrarily.
    *
    * The source travels as its (unresolved) LogicalPlan and is
    * re-analyzed when the command runs — names resolve against live
    * session state, including other registered merge tables (a
    * self-referential MERGE reads the target's CURRENT committed
    * generation, which is exactly snapshot-isolation semantics). */
  case class MergeTableMergeCommand(root: String, table: String,
      targetAlias: String, source: LogicalPlan, condSql: String,
      matched: Seq[SqlMergeClause], notMatched: Seq[SqlInsert])
      extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq(
      AttributeReference("rows_updated", LongType, nullable = false)(),
      AttributeReference("rows_deleted", LongType, nullable = false)(),
      AttributeReference("rows_inserted", LongType, nullable = false)(),
      AttributeReference("files_rewritten", IntegerType, nullable = false)(),
      AttributeReference("files_carried", IntegerType, nullable = false)())

    // EXPLAIN shows the USING source under the command
    override def innerChildren: Seq[QueryPlan[_]] = Seq(source)

    override def run(session: SparkSession): Seq[Row] = {
      val mt = graft.streaming.MergeTable
      // OPTIMISTIC since round 18: the whole matched/not-matched
      // computation (joins, guards, netting) is a function of the
      // generation it ran against, so it lives in a prepare closure the
      // occ loop re-runs on conflict — a winner's insert flips a key
      // from not-matched to matched on replay, exactly as if the MERGE
      // had executed serially after the winner. The conflict envelope
      // is FULL (any concurrent commit re-evaluates; the same liveness
      // trade as the predicate DML commands), committed through
      // [[graft.streaming.MergeTable.commitPrepared]]'s arbitration so
      // SQL MERGE runs concurrently with live occ pipelines.
      var lastByOp: Map[String, Long] = Map.empty
      def prep(sp: SparkSession, g0: Long): Option[mt.PreparedMerge] = {
      // ONE manifest fetch (pinned at g0) serves key, schema, the PK
      // probe AND the conflict set
      val meta = mt.metaAt(sp, root, g0)
      val key = meta.key
      val ks = mt.keyCols(key) // composite: identity is the tuple
      val target = mt.readMeta(sp, root, meta)
      val tgtSchema = target.schema
      val tCols = tgtSchema.fieldNames.toSeq
      val t = target.alias(targetAlias)
      val s = org.apache.spark.sql.graft.PlanBridge.dataFrame(sp, source)
      def tq(c: String) = col(s"$targetAlias.`$c`")

      // ---- MATCHED: inner join; first clause whose condition holds
      // claims the row (__midx = -1 ⇒ no clause fired ⇒ row untouched)
      val midx = matched.zipWithIndex.foldRight(lit(-1)) {
        case ((cl, i), acc) =>
          val c = (cl match {
            case SqlUpdate(cs, _) => cs
            case SqlDelete(cs) => cs
          }).map(expr).getOrElse(lit(true))
          when(c, lit(i)).otherwise(acc)
      }
      val mOp = matched.zipWithIndex.foldRight(lit(null).cast("string")) {
        case ((cl, i), acc) => when(col("__midx") === i,
          lit(cl match { case _: SqlUpdate => "u"; case _: SqlDelete => "d" }))
          .otherwise(acc)
      }
      // payload per table column: the claiming UPDATE's assignment if it
      // assigns the column, else the target's value (deletes keep target
      // values — the merge ignores delete payloads); assignment-cast to
      // the table's type, standard SQL store-assignment
      def mVal(c: String): Column =
        matched.zipWithIndex.foldRight(tq(c)) {
          case ((SqlUpdate(_, assigns), i), acc) =>
            assigns.find(_._1 == c) match {
              case Some((_, v)) =>
                when(col("__midx") === i, expr(v)).otherwise(acc)
              case None => acc
            }
          case ((_: SqlDelete, _), acc) => acc
        }.cast(tgtSchema(c).dataType).as(c)
      val matchedChanges = t.join(s, expr(condSql), "inner")
        .withColumn("__midx", midx).where(col("__midx") >= 0)
        .select(mOp.as("op") +: lit(1L).as("seq") +: tCols.map(mVal): _*)

      // ---- NOT MATCHED: anti join (source frame only — exactly the
      // columns ANSI lets an INSERT clause reference); unassigned
      // columns null-fill, the standard INSERT contract
      val nidx = notMatched.zipWithIndex.foldRight(lit(-1)) {
        case ((cl, i), acc) =>
          when(cl.condSql.map(expr).getOrElse(lit(true)), lit(i)).otherwise(acc)
      }
      def iVal(c: String): Column =
        notMatched.zipWithIndex.foldRight(lit(null): Column) {
          case ((cl, i), acc) =>
            cl.assigns.find(_._1 == c) match {
              case Some((_, v)) =>
                when(col("__nidx") === i, expr(v)).otherwise(acc)
              case None => acc
            }
        }.cast(tgtSchema(c).dataType).as(c)
      val insertChanges = s.join(t, expr(condSql), "left_anti")
        .withColumn("__nidx", nidx).where(col("__nidx") >= 0)
        .select(lit("c").as("op") +: lit(1L).as("seq") +: tCols.map(iVal): _*)

      val all = (matched, notMatched) match {
        case (Nil, _) => insertChanges
        case (_, Nil) => matchedChanges
        case _ => matchedChanges.unionByName(insertChanges)
      }
      // one computation, three consumers (guard, metrics, merge)
      val changes = all.localCheckpoint(true)

      // a NULL merge key can only arrive via an INSERT clause (ON never
      // matches NULL): refuse — the row would be permanently
      // unaddressable (no later MERGE/UPDATE/DELETE key join can reach
      // it) and unprunable; the same PK-implies-NOT-NULL contract as
      // the INSERT command
      if (!changes.where(ks.map(k => col(s"`$k`").isNull)
          .reduce(_ || _)).isEmpty)
        throw new IllegalStateException(
          s"MERGE INTO $table: an INSERT clause produced a NULL merge " +
            s"key — '$key' is the table's primary key")
      // ANSI cardinality guard: a target key steered by 2+ source rows
      // has no well-defined result — refuse, never net arbitrarily
      val dup = changes.groupBy(ks.map(k => col(s"`$k`")): _*)
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalStateException(
        s"MERGE INTO $table: multiple source rows affect target key " +
          s"${ks.indices.map(dup.head.get).mkString("(", ", ", ")")} — " +
          "the ANSI MERGE cardinality contract forbids this (dedupe " +
          "the source first)")
      // the PK contract on the INSERT clauses: under a key-equality ON
      // the anti-join already excludes existing keys, but an ON over
      // OTHER columns can emit a 'c' row whose key exists — last-wins
      // would silently REPLACE it (ANSI raises a unique violation; so
      // do we). Probe is manifest-pruned: only touched files' key
      // column, and an insert set beyond the key domain touches nothing.
      if (notMatched.nonEmpty) {
        val clash = mt.readWhereKeysOf(sp, root, meta,
          changes.where(col("op") === "c")
            .select(ks.map(k => col(s"`$k`")): _*))
          .limit(1).collect()
        if (clash.nonEmpty) throw new IllegalStateException(
          s"MERGE INTO $table: WHEN NOT MATCHED inserted key " +
            s"${ks.indices.map(clash.head.get).mkString("(", ", ", ")")}, " +
            "which already exists (the ON condition does not cover the " +
            "merge key) — INSERT never overwrites; match the key in ON " +
            "or use UPDATE")
      }

      val byOp = changes.groupBy(col("op")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      lastByOp = byOp
      if (byOp.isEmpty) None // nothing fired: no new generation
      else Some(mt.prepareMergeAutoAt(sp, root, g0, changes, key)
        .copy(mode = "sql-merge",
          // FULL conflict envelope + the pinned generation's whole file
          // set: ANY concurrent commit re-runs the matched/not-matched
          // computation (the anti-join's result is a statement about
          // the ENTIRE target state, which a key-span envelope cannot
          // guard)
          changeLo = Long.MinValue, changeHi = Long.MaxValue,
          conflictNames = meta.entries.map(_.name).toSet,
          reprepare = Some((s2, g2) => prep(s2, g2))))
      }
      val g0 = graft.streaming.Snapshots.currentGen(session, root)
        .getOrElse(throw new IllegalStateException(
          s"no committed generation under $root"))
      prep(session, g0) match {
        case None => Seq(Row(0L, 0L, 0L, 0, 0))
        case Some(h) =>
          val (o, hf) = mt.commitPreparedWithHandle(session, root, h,
            maxAttempts = 20)
          // "noop" = a replay found nothing left to do against the
          // winner's state (every clause went quiet) — nothing committed
          if (o.path == "noop") Seq(Row(0L, 0L, 0L, 0, 0))
          else {
            val total = mt.metaAt(session, root, o.gen).entries.size
            Seq(Row(lastByOp.getOrElse("u", 0L), lastByOp.getOrElse("d", 0L),
              lastByOp.getOrElse("c", 0L),
              if (hf.morStaged) 0 else hf.touchedNames.size,
              total - hf.newEntries.size))
          }
      }
    }
  }

  /** `INSERT INTO <merge-table> [(cols)|BY NAME] <query>` → a pure
    * 'c' change batch through the auto-priced OPTIMISTIC merge
    * (round 18: a conflict replay re-probes the PK guards against the
    * winner's state). The table is KEYED
    * (last-wins upsert semantics), so this face enforces the ANSI
    * primary-key contract INSERT implies: in-batch duplicate keys and
    * keys already present both refuse loudly — silently upserting on an
    * INSERT verb would mask a producer bug (the upsert verb is MERGE).
    * The existing-key probe is manifest-pruned: only the key column of
    * key-range-touched files is read, never the table. Unnamed inserts
    * map positionally (arity-checked); a column list (or BY NAME)
    * null-fills unassigned columns and must cover the merge key. */
  case class MergeTableInsertCommand(root: String, table: String,
      cols: Seq[String], byName: Boolean, query: LogicalPlan)
      extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq(
      AttributeReference("rows_inserted", LongType, nullable = false)(),
      AttributeReference("files_rewritten", IntegerType, nullable = false)(),
      AttributeReference("files_carried", IntegerType, nullable = false)())

    override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

    override def run(session: SparkSession): Seq[Row] = {
      def refuse(msg: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
      val mt = graft.streaming.MergeTable
      // OPTIMISTIC since round 18 (same shape as the MERGE command):
      // the mapping, PK guards and existing-key probe live in a
      // prepare closure pinned to a generation — a conflict replay
      // re-probes against the winner's state, so a winner inserting
      // the same key surfaces as this statement's own loud PK refusal
      // instead of a silent last-wins overwrite. The natural change-key
      // envelope suffices here: any winner file overlapping the
      // inserted key span is a C3 replay, and the clash probe's
      // candidate files are the staging's own touched set (C1/C2).
      var lastN = 0L
      def prep(sp: SparkSession, g0: Long): Option[mt.PreparedMerge] = {
      // ONE manifest fetch (pinned at g0) serves key, schema and the
      // PK probe
      val meta = mt.metaAt(sp, root, g0)
      val tgtSchema = meta.schema.map(mt.visibleStruct)
        .getOrElse(mt.readMeta(sp, root, meta).schema)
      val tCols = tgtSchema.fieldNames.toSeq
      val src = org.apache.spark.sql.graft.PlanBridge.dataFrame(sp, query)
      // column names resolve case-insensitively (Spark SQL's default)
      // to the table's canonical spelling — including the manifest #key
      // (composite keys: identity is the TUPLE of canonical columns)
      val canonical: Map[String, String] =
        tCols.map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
      val ks = mt.keyCols(meta.key).map(k =>
        canonical.getOrElse(k.toLowerCase(java.util.Locale.ROOT), k))
      val rawNamed: Seq[String] =
        if (byName) src.columns.toSeq
        else if (cols.nonEmpty) cols
        else Seq.empty
      val unknown = rawNamed.filterNot(c =>
        canonical.contains(c.toLowerCase(java.util.Locale.ROOT)))
      if (unknown.nonEmpty) refuse(
        s"INSERT INTO $table names unknown columns: ${unknown.mkString(", ")}")
      val named = rawNamed.map(c =>
        canonical(c.toLowerCase(java.util.Locale.ROOT)))
      val dupCols = named.groupBy(identity)
        .collect { case (c, vs) if vs.size > 1 => c }
      if (dupCols.nonEmpty) refuse(
        s"INSERT INTO $table lists ${dupCols.mkString(", ")} more than once")
      val mapped =
        if (named.isEmpty) {
          if (src.columns.length != tCols.length) refuse(
            s"INSERT INTO $table: positional insert carries " +
              s"${src.columns.length} columns, the table has ${tCols.length}" +
              " — list the columns or match the arity")
          src.toDF(tCols: _*)
        } else {
          val missingKey = ks.filterNot(named.contains)
          if (missingKey.nonEmpty) refuse(
            s"INSERT INTO $table: the column list must include the " +
              s"merge key column(s) ${missingKey.mkString(", ")}")
          if (named.size != src.columns.length) refuse(
            s"INSERT INTO $table: ${named.size} target columns vs " +
              s"${src.columns.length} query columns")
          val bySrc = src.toDF(named: _*)
          bySrc.select(tCols.map(c =>
            (if (named.contains(c)) col(s"`$c`") else lit(null)).as(c)): _*)
        }
      // ONE store-assignment cast point for both mapping branches
      val rows = mapped.select(tCols.map(c =>
        col(s"`$c`").cast(tgtSchema(c).dataType).as(c)): _*)
        .localCheckpoint(true)
      // the PK contract: no null keys (ANSI PK implies NOT NULL — and a
      // null key can neither range-prune nor match a later MERGE)…
      if (!rows.where(ks.map(k => col(s"`$k`").isNull).reduce(_ || _))
          .isEmpty)
        throw new IllegalStateException(
          s"INSERT INTO $table: NULL merge key — '${meta.key}' is the " +
            "table's primary key")
      // …no in-batch duplicates…
      val dup = rows.groupBy(ks.map(k => col(s"`$k`")): _*)
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1).limit(1).collect()
      if (dup.nonEmpty) throw new IllegalStateException(
        s"INSERT INTO $table: duplicate merge key " +
          s"${ks.indices.map(dup.head.get).mkString("(", ", ", ")")} in " +
          "the inserted rows — a keyed table holds one row per key " +
          "(the upsert verb is MERGE)")
      // …and no collision with EXISTING keys: probe only the key columns
      // of manifest-range-touched files (never a table scan)
      val clash = mt.readWhereKeysOf(sp, root, meta,
        rows.select(ks.map(k => col(s"`$k`")): _*)).limit(1).collect()
      if (clash.nonEmpty) throw new IllegalStateException(
        s"INSERT INTO $table: key " +
          s"${ks.indices.map(clash.head.get).mkString("(", ", ", ")")} " +
          "already exists — INSERT never overwrites on a keyed table " +
          "(the upsert verb is MERGE)")
      val n = rows.count()
      if (n == 0) None
      else {
        lastN = n
        val changes = rows
          .withColumn("op", lit("c")).withColumn("seq", lit(1L))
        Some(mt.prepareMergeAutoAt(sp, root, g0, changes, meta.key)
          .copy(mode = "sql-insert",
            reprepare = Some((s2, g2) => prep(s2, g2))))
      }
      }
      val g0 = graft.streaming.Snapshots.currentGen(session, root)
        .getOrElse(throw new IllegalStateException(
          s"no committed generation under $root"))
      prep(session, g0) match {
        case None => Seq(Row(0L, 0, 0))
        case Some(h) =>
          val (o, hf) = mt.commitPreparedWithHandle(session, root, h,
            maxAttempts = 20)
          if (o.path == "noop") Seq(Row(0L, 0, 0))
          else {
            val total = mt.metaAt(session, root, o.gen).entries.size
            Seq(Row(lastN, if (hf.morStaged) 0 else hf.touchedNames.size,
              total - hf.newEntries.size))
          }
      }
    }
  }

  /** `CREATE TABLE lake.t USING graft TBLPROPERTIES('key'='k') AS
    * SELECT ...` — DDL + first load as one statement. Spark's V2 CTAS
    * exec would create through the catalog then demand a BATCH_WRITE
    * capability the handle deliberately lacks (it would be a SECOND
    * write path beside the manifest-pruned insert) — worse, the
    * capability check fires AFTER createTable, leaving an empty orphan
    * table behind the error. This command keeps the one-write-path
    * rule: create via [[GraftCatalog.createTable]] (same refusals:
    * key property, LOCATION, partitioning), load via
    * [[MergeTableInsertCommand]] (same PK contract: null/duplicate
    * keys refuse), and on ANY load failure DROP the just-created
    * table so the statement is all-or-nothing. */
  case class MergeTableCtasCommand(catalog: GraftCatalog,
      ident: org.apache.spark.sql.connector.catalog.Identifier,
      props: Map[String, String], query: LogicalPlan,
      ignoreIfExists: Boolean) extends LeafRunnableCommand {

    override val output: Seq[Attribute] = Seq.empty
    override def innerChildren: Seq[QueryPlan[_]] = Seq(query)

    override def run(session: SparkSession): Seq[Row] = {
      def refuse(msg: String): Nothing =
        throw new org.apache.spark.sql.AnalysisException(
          "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
      val name = ident.name
      if (catalog.tableExists(ident)) {
        if (ignoreIfExists) return Seq.empty
        throw new org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException(
            Seq(catalog.name) ++ ident.namespace() :+ name)
      }
      val key = props.getOrElse("key", refuse(
        s"CREATE TABLE $name USING graft AS SELECT requires the merge " +
          "key: TBLPROPERTIES ('key' = '<column>')"))
      // refusals that would otherwise fire AFTER createTable fire
      // BEFORE it — nothing to clean up (composite keys: each tuple
      // column must be in the SELECT's output)
      val missingKey = graft.streaming.MergeTable.keyCols(key)
        .filterNot(k => query.schema.fieldNames.exists(_.equalsIgnoreCase(k)))
      if (missingKey.nonEmpty) refuse(
        s"CREATE TABLE $name AS SELECT: key column(s) " +
          s"${missingKey.mkString(", ")} not in the query's output " +
          s"(${query.schema.fieldNames.mkString(", ")})")
      val ju = new java.util.HashMap[String, String]()
      props.foreach { case (k, v) => ju.put(k, v) }
      // every field nullable: schema-on-read null-fills evolved columns
      val nullable = org.apache.spark.sql.types.StructType(
        query.schema.fields.map(_.copy(nullable = true)))
      catalog.createTable(ident, nullable,
        Array.empty[org.apache.spark.sql.connector.expressions.Transform],
        ju)
      try {
        MergeTableInsertCommand(catalog.tableRoot(ident), name,
          cols = Seq.empty, byName = false, query).run(session)
      } catch { case e: Throwable =>
        // all-or-nothing: a failed load (e.g. duplicate keys in the
        // SELECT) must not leave an empty table claiming the name
        try catalog.dropTable(ident)
        catch { case cleanup: Throwable => e.addSuppressed(cleanup) }
        throw e
      }
      Seq.empty
    }
  }

  /** Lower the parser's [[MergeIntoTable]] over a registered merge table
    * into [[MergeTableMergeCommand]], refusing BY NAME every clause
    * shape the COW merge cannot honor. */
  def lowerMerge(spark: SparkSession,
      m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable,
      table: String, quals: Set[String], root: String,
      targetAlias: String): MergeTableMergeCommand = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def refuse(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    if (m.withSchemaEvolution) refuse(
      s"MERGE INTO $table WITH SCHEMA EVOLUTION is not supported through " +
        "SQL — use the merge API's evolveSchema flag, which makes the " +
        "additive widening explicit per batch")
    if (m.notMatchedBySourceActions.nonEmpty) refuse(
      s"MERGE INTO $table: WHEN NOT MATCHED BY SOURCE is not supported " +
        "on the COW merge path — target-only sweeps are the DELETE/" +
        "UPDATE DML's job")
    // ONE manifest fetch serves key and schema (not one GET per face)
    val meta = graft.streaming.MergeTable.currentMeta(spark, root)
    val tCols = meta.schema.map(graft.streaming.MergeTable.visibleCols)
      .getOrElse(
        graft.streaming.MergeTable.read(spark, root).schema.fieldNames.toSeq)
    // the qualifier star-expansion needs: the source's alias or name
    val sourceQual: Option[String] = m.sourceTable match {
      case SubqueryAlias(id, _) => Some(id.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        Some(u.multipartIdentifier.last)
      case _ => None
    }
    def starQual: String = sourceQual.getOrElse(refuse(
      s"MERGE INTO $table: UPDATE SET * / INSERT * needs a named or " +
        "aliased USING source to expand against — alias the source"))
    // assignment targets RESOLVE to the table's canonical column names,
    // case-insensitively (Spark SQL's default resolution) — matching
    // raw would silently DROP a differently-cased assignment downstream
    // (mVal/iVal look pairs up by canonical name) and let `SET K = ...`
    // slip past the key refusal
    val canonical: Map[String, String] =
      tCols.map(c => c.toLowerCase(java.util.Locale.ROOT) -> c).toMap
    def resolveCol(raw: String, context: String): String =
      canonical.getOrElse(raw.toLowerCase(java.util.Locale.ROOT), refuse(
        s"MERGE INTO $table $context assigns unknown column '$raw' " +
          s"(table columns: ${tCols.mkString(", ")})"))
    // the manifest #key may be cased differently from the schema fields
    // (create takes both independently): comparisons against
    // canonicalized assignment names need each key column's CANONICAL
    // spelling, else `SET <key>` slips the refusal and star expansion
    // includes it. Composite keys are the tuple of columns.
    val keySet: Seq[String] =
      graft.streaming.MergeTable.keyCols(meta.key).map(k =>
        canonical.getOrElse(k.toLowerCase(java.util.Locale.ROOT), k))
    def pairs(assigns: Seq[Assignment], context: String): Seq[(String, String)] = {
      val ps = assigns.map { a =>
        stripQualifiers(a.key, quals) match {
          case u: UnresolvedAttribute if u.nameParts.size == 1 =>
            resolveCol(u.nameParts.head, context) -> rebindAlias(a.value).sql
          case ar: AttributeReference =>
            resolveCol(ar.name, context) -> rebindAlias(a.value).sql
          case other => refuse(
            s"MERGE INTO $table $context assigns ${other.sql} — only " +
              "top-level columns of the table are assignable")
        }
      }
      val dup = ps.groupBy(_._1).collect { case (c, vs) if vs.size > 1 => c }
      if (dup.nonEmpty) refuse(
        s"MERGE INTO $table $context assigns ${dup.mkString(", ")} more than once")
      ps
    }
    // clause expressions travel alias-qualified ([[rebindAlias]]): on
    // the catalog path they arrive RESOLVED, and a bound attribute's
    // .sql prints catalog-deep qualifiers the command frames don't have
    def condSql(cond: Option[org.apache.spark.sql.catalyst.expressions
        .Expression]): Option[String] = cond.map(c => rebindAlias(c).sql)
    val matched: Seq[SqlMergeClause] = m.matchedActions.map {
      case DeleteAction(cond) => SqlDelete(condSql(cond))
      case UpdateAction(cond, assigns, _) =>
        val ps = pairs(assigns, "UPDATE")
        ps.map(_._1).find(keySet.contains).foreach(k => refuse(
          s"MERGE INTO $table: UPDATE must not assign the merge key " +
            s"'$k' — a COW merge addresses rows by key"))
        SqlUpdate(condSql(cond), ps)
      case UpdateStarAction(cond) =>
        // every non-key column from the source's same name (the key
        // keeps the target value — under the ON equality it is equal
        // anyway, and a key REWRITE is refused just above)
        SqlUpdate(condSql(cond),
          tCols.filterNot(keySet.contains).map(c => c -> s"`$starQual`.`$c`"))
      case other => refuse(
        s"MERGE INTO $table: unsupported WHEN MATCHED action " +
          other.getClass.getSimpleName)
    }
    val notMatched: Seq[SqlInsert] = m.notMatchedActions.map {
      case InsertAction(cond, assigns) =>
        val ps = pairs(assigns, "INSERT")
        val missing = keySet.filterNot(k => ps.exists(_._1 == k))
        if (missing.nonEmpty) refuse(
          s"MERGE INTO $table: INSERT must assign the merge key " +
            s"column(s) ${missing.mkString(", ")}")
        SqlInsert(condSql(cond), ps)
      case InsertStarAction(cond) =>
        SqlInsert(condSql(cond), tCols.map(c => c -> s"`$starQual`.`$c`"))
      case other => refuse(
        s"MERGE INTO $table: unsupported WHEN NOT MATCHED action " +
          other.getClass.getSimpleName)
    }
    MergeTableMergeCommand(root, table, targetAlias, m.sourceTable,
      rebindAlias(m.mergeCondition).sql, matched, notMatched)
  }

  /** RESOLVED attribute references → bare unresolved names. On the
    * conf-registry path DML expressions arrive unresolved (no catalog
    * claims the name, so the built-in resolver leaves everything
    * alone); on the [[GraftCatalog]] path ResolveReferences has ALREADY
    * bound them to the V2 relation's output by the time extended rules
    * fire — and a bound attribute's `.sql` prints its full qualifier
    * (`lake`.`t`.`k`), which cannot re-parse against the command's bare
    * table frame. DELETE/UPDATE frames carry exactly the table's
    * columns, so the bare name is always unambiguous. */
  def rebindBare(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transform {
      case ar: AttributeReference => UnresolvedAttribute(Seq(ar.name))
    }

  /** [[rebindBare]]'s two-frame sibling for MERGE: keep the LAST
    * qualifier part (the alias level — `lake`.`t`.`k` → `t`.`k`), so
    * target references resolve against the command's aliased target
    * frame and source references against the source's own alias, and
    * same-named columns on the two sides stay unambiguous. */
  def rebindAlias(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transform {
      case ar: AttributeReference =>
        UnresolvedAttribute(ar.qualifier.takeRight(1) :+ ar.name)
    }

  /** Strip table/alias qualifiers off attribute references: the command
    * re-parses expressions against the BARE table frame, where
    * `lake.o_custkey` / `t.o_custkey` cannot resolve — but both are
    * valid statement SQL for a relation named or aliased that way. */
  def stripQualifiers(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      names: Set[String])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transform {
      case u: UnresolvedAttribute if u.nameParts.size > 1 &&
          names.contains(u.nameParts.init.mkString(".")
            .toLowerCase(java.util.Locale.ROOT)) =>
        UnresolvedAttribute(Seq(u.nameParts.last))
    }

  /** The SET clause as (column name, value SQL) pairs. Duplicate
    * targets are refused (standard SQL rejects them; silently keeping
    * the last would mask a user error), as are nested/foreign-qualified
    * targets (the API updates top-level columns). */
  def assignmentPairs(
      assigns: Seq[org.apache.spark.sql.catalyst.plans.logical.Assignment],
      table: String, quals: Set[String]): Seq[(String, String)] = {
    def refuse(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    val pairs = assigns.map { a =>
      stripQualifiers(rebindBare(a.key), quals) match {
        case u: UnresolvedAttribute if u.nameParts.size == 1 =>
          u.nameParts.head ->
            stripQualifiers(rebindBare(a.value), quals).sql
        case other => refuse(
          s"UPDATE on merge table $table assigns ${other.sql} — only " +
            "top-level columns of the table are assignable")
      }
    }
    val dup = pairs.groupBy(_._1).collect { case (c, vs) if vs.size > 1 => c }
    if (dup.nonEmpty) refuse(
      s"UPDATE on merge table $table assigns ${dup.mkString(", ")} " +
        "more than once")
    pairs
  }
}
