package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.TimestampType

import graft.streaming.Snapshots

/** SQL `TIMESTAMP AS OF` / `VERSION AS OF` over [[Snapshots]] roots —
  * the parser face of the time-travel API. Spark's own parser already
  * produces [[RelationTimeTravel]] for the standard syntax
  *
  * {{{
  *   SELECT * FROM wh TIMESTAMP AS OF '2026-08-15 00:00:00'
  *   SELECT * FROM wh VERSION   AS OF 3
  * }}}
  *
  * so no grammar extension is needed: this is a RESOLUTION rule
  * (injected by [[graft.GraftExtensions]]) that resolves the node for
  * table names registered against a snapshot root via
  * [[SnapshotSqlCatalog.register]], turning the clause into
  * [[Snapshots.resolveAsOf]] / [[Snapshots.resolveAt]] — the same
  * at-or-before resolution and LOUD pre-window refusal as the API,
  * surfaced as an `AnalysisException` naming the available commits
  * (the contract table formats give a time-travel query past
  * retention). Names not registered here fall through untouched for
  * the built-in analyzer to handle, so the rule composes with real
  * catalogs.
  *
  * Reference grounding: the warehouse history face of
  * `/root/reference/source/load_s3_files_to_redshift_lambda/handler.py:96-112`
  * (processed-folder retention — yesterday's loaded state stays
  * inspectable); here yesterday's state is a complete queryable
  * snapshot addressable from plain SQL. */
class SnapshotTimeTravelRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def refuse(msg: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> msg))

  /** A merge-table relation — a conf-REGISTERED name (unresolved, since
    * no real catalog claims it) or a [[GraftCatalog]] table (already a
    * DataSourceV2Relation by the time extended rules run: the built-in
    * ResolveRelations fires earlier in the same fixed-point iteration) —
    * bare or under the alias the statement gave it (`DELETE FROM lake
    * AS t ...` wraps the relation in a SubqueryAlias, and a catalog
    * reference is ALWAYS alias-wrapped by the resolver): (statement-
    * visible name, qualifier spellings to strip from expressions,
    * root). */
  private object MergeRel {
    def unapply(p: LogicalPlan): Option[(String, Set[String], String)] = {
      def of(u: UnresolvedRelation, extra: Seq[String]) =
        SnapshotSqlCatalog.mergeRootOf(spark, u.multipartIdentifier).map { root =>
          val n = u.multipartIdentifier.mkString(".")
          (n, (n +: extra).map(_.toLowerCase(java.util.Locale.ROOT)).toSet,
            root)
        }
      def ofV2(t: GraftTable, extra: Seq[String]) =
        Some((t.tableName,
          (t.tableName +: extra).map(_.toLowerCase(java.util.Locale.ROOT)).toSet,
          t.root))
      p match {
        case u: UnresolvedRelation => of(u, Seq.empty)
        case org.apache.spark.sql.catalyst.plans.logical
            .SubqueryAlias(id, u: UnresolvedRelation) => of(u, Seq(id.name))
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          ofV2(r.table.asInstanceOf[GraftTable], Seq.empty)
        case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(id,
            r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2Relation) if r.table.isInstanceOf[GraftTable] =>
          ofV2(r.table.asInstanceOf[GraftTable], Seq(id.name))
        // a user alias OVER the resolver's own catalog alias:
        // `DELETE FROM lake.t AS x`
        case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(outer,
            org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(inner,
              r: org.apache.spark.sql.execution.datasources.v2
                .DataSourceV2Relation)) if r.table.isInstanceOf[GraftTable] =>
          ofV2(r.table.asInstanceOf[GraftTable],
            Seq(outer.name, inner.name))
        case _ => None
      }
    }
  }

  // TOP-DOWN on purpose: RelationTimeTravel must claim its child
  // relation before the bare-name case below could resolve it to the
  // CURRENT state (which would silently defeat the AS OF clause)
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if SnapshotSqlCatalog.rootOf(spark, u.multipartIdentifier).isDefined ||
            SnapshotSqlCatalog.mergeRootOf(spark, u.multipartIdentifier).isDefined =>
        val name = u.multipartIdentifier.mkString(".")
        // a MERGE-registered name resolves through the SAME commit
        // markers (MergeTable inherits the Snapshots protocol) but must
        // read manifest-directed THROUGH the generation's deletion
        // vectors — a plain directory read of a MergeTable generation
        // would return raw files incl. DV-deleted rows
        val mergeRoot = SnapshotSqlCatalog.mergeRootOf(spark, u.multipartIdentifier)
        val root = mergeRoot.getOrElse(
          SnapshotSqlCatalog.rootOf(spark, u.multipartIdentifier).get)
        val dir = (ts, ver) match {
          case (Some(expr), None) =>
            if (!expr.foldable) refuse(
              s"time travel over snapshot table $name needs a constant " +
                s"timestamp; got non-foldable expression ${expr.sql}")
            val micros = Cast(expr, TimestampType,
              Some(spark.sessionState.conf.sessionLocalTimeZone))
              .eval(null)
            if (micros == null) refuse(
              s"time travel timestamp ${expr.sql} for snapshot table " +
                s"$name did not parse as a timestamp")
            val millis = Math.floorDiv(micros.asInstanceOf[Long], 1000L)
            try Snapshots.resolveAsOf(spark, root, millis)
            catch { case e: IllegalArgumentException => refuse(e.getMessage) }
          case (None, Some(v)) =>
            val g = v.toLongOption.getOrElse(refuse(
              s"VERSION AS OF over snapshot table $name takes a " +
                s"generation number; got '$v'"))
            try Snapshots.resolveAt(spark, root, g)
            catch { case e: IllegalArgumentException => refuse(e.getMessage) }
          case _ =>
            // the parser rejects both-or-neither before this rule runs
            refuse(s"invalid time travel spec on snapshot table $name")
        }
        // the resolved relation: for a snapshot root a plain parquet
        // read of the pinned generation dir (batch= partition discovery
        // included) — exactly what readAsOf/readAt return; for a merge
        // root the manifest-directed, DV-applied read of that generation
        val df = mergeRoot match {
          case Some(mr) => graft.streaming.MergeTable.readResolved(spark, mr, dir)
          case None => spark.read.parquet(dir)
        }
        df.queryExecution.analyzed
      case tt @ RelationTimeTravel(u: UnresolvedRelation, _, _)
          if u.multipartIdentifier.size == 1 &&
            SnapshotSqlCatalog.registered(spark).nonEmpty &&
            !spark.catalog.tableExists(u.multipartIdentifier.head) =>
        // a plausible-but-unregistered bare name: refuse loudly naming
        // what IS registered, instead of the opaque built-in error
        refuse(s"table ${u.multipartIdentifier.head} is not registered " +
          s"for snapshot time travel (registered: " +
          s"${SnapshotSqlCatalog.registered(spark).toSeq.sorted.mkString(", ")})")

      // ---- SQL DML over registered merge tables --------------------
      // `DELETE FROM lake WHERE ...` / `UPDATE lake [AS t] SET ...` —
      // bare or aliased — become the manifest-pruned DV delete / scoped
      // COW update. The statement's expressions travel as SQL text
      // (table/alias qualifiers stripped, since the command re-parses
      // against the bare table frame) — see MergeTableDml.
      case org.apache.spark.sql.catalyst.plans.logical
          .DeleteFromTable(MergeRel(name, quals, root), cond) =>
        MergeTableDml.MergeTableDeleteCommand(root,
          MergeTableDml.stripQualifiers(
            MergeTableDml.rebindBare(cond), quals).sql)
      case org.apache.spark.sql.catalyst.plans.logical
          .UpdateTable(MergeRel(name, quals, root), assigns, cond) =>
        MergeTableDml.MergeTableUpdateCommand(root,
          MergeTableDml.assignmentPairs(assigns, name, quals),
          cond.map(c => MergeTableDml.stripQualifiers(
            MergeTableDml.rebindBare(c), quals).sql))
      // `INSERT INTO lake [(cols)|BY NAME] <query>` — a pure 'c' change
      // batch with the ANSI primary-key contract enforced (the table is
      // keyed; the upsert verb is MERGE). OVERWRITE/partition clauses
      // refuse by name.
      case i @ org.apache.spark.sql.catalyst.plans.logical
          .InsertIntoStatement(MergeRel(name, _, root),
            partSpec, cols, _, overwrite, ifPartNotExists, byName) =>
        if (overwrite) refuse(
          s"INSERT OVERWRITE on merge table $name is not supported — " +
            "a keyed table replaces rows through MERGE/UPDATE, or " +
            "rebuilds through create")
        if (partSpec.nonEmpty || ifPartNotExists) refuse(
          s"INSERT INTO $name: partition clauses are not supported — " +
            "the merge table is key-range-organized, not partitioned")
        MergeTableDml.MergeTableInsertCommand(root, name, cols, byName,
          i.query)
      // `CREATE TABLE lake.t ... AS SELECT` — Spark's own CTAS exec
      // would create the table then fail the capability check (the
      // handle is deliberately write-capability-less), orphaning an
      // empty table; lowered instead onto create + the manifest-pruned
      // insert with drop-on-failure (see MergeTableCtasCommand)
      case ctas @ org.apache.spark.sql.catalyst.plans.logical
          .CreateTableAsSelect(org.apache.spark.sql.catalyst.analysis
            .ResolvedIdentifier(cat: GraftCatalog, ident),
          parts, query, spec, _, ignoreIfExists, _) if query.resolved =>
        if (parts.nonEmpty) refuse(
          s"CREATE TABLE ${ident.name} USING graft AS SELECT: " +
            "PARTITIONED BY/CLUSTERED BY are not supported — a merge " +
            "table is key-range-organized; declare the key with " +
            "TBLPROPERTIES ('key' = '<col>')")
        val ts = spec match {
          case t: org.apache.spark.sql.catalyst.plans.logical.TableSpec => t
          case other => refuse(
            s"CREATE TABLE ${ident.name} AS SELECT: unexpected table " +
              s"spec shape ${other.getClass.getSimpleName}")
        }
        if (ts.location.nonEmpty) refuse(
          s"CREATE TABLE ${ident.name} USING graft AS SELECT: LOCATION " +
            s"is not supported — the table lives at <warehouse>/" +
            s"${ident.name}")
        ts.provider.filterNot(_.equalsIgnoreCase("graft")).foreach(p =>
          refuse(s"CREATE TABLE ${ident.name} AS SELECT: the graft " +
            s"catalog hosts graft tables only; got USING $p"))
        MergeTableDml.MergeTableCtasCommand(cat, ident,
          ts.properties ++ ts.options, query, ignoreIfExists)
      // [CREATE OR] REPLACE TABLE [AS SELECT]: Spark's non-atomic
      // replace exec DROPS the existing table before the create/write —
      // on a capability-less handle the write then fails, so the verb
      // would DESTROY data and error out. Refused before the exec can
      // touch it.
      case r: org.apache.spark.sql.catalyst.plans.logical
          .ReplaceTableAsSelect if (r.name match {
            case org.apache.spark.sql.catalyst.analysis
              .ResolvedIdentifier(_: GraftCatalog, _) => true
            case _ => false }) =>
        refuse(s"REPLACE TABLE ${r.tableName.name} AS SELECT is not " +
          "supported on the graft catalog — the non-atomic drop-then-" +
          "create would destroy the table on any load failure; DROP + " +
          "CREATE AS SELECT explicitly, or replace rows through MERGE")
      case r: org.apache.spark.sql.catalyst.plans.logical.ReplaceTable
          if (r.name match {
            case org.apache.spark.sql.catalyst.analysis
              .ResolvedIdentifier(_: GraftCatalog, _) => true
            case _ => false }) =>
        refuse(s"REPLACE TABLE ${r.tableName.name} is not supported on " +
          "the graft catalog — DROP + CREATE explicitly (generations " +
          "preserve nothing across a drop; the history IS the table)")
      // the CATALOG spelling of INSERT: by the time extended rules run,
      // ResolveInsertInto has already turned `INSERT INTO lake.t ...`
      // into AppendData over the V2 relation, with the query projected/
      // cast to the table's full width (column lists and BY NAME are
      // normalized there) — so the command takes it positionally
      case a: org.apache.spark.sql.catalyst.plans.logical.AppendData =>
        a.table match {
          case MergeRel(name, _, root) =>
            MergeTableDml.MergeTableInsertCommand(root, name,
              cols = Seq.empty, byName = false, a.query)
          case _ => a
        }
      case o: org.apache.spark.sql.catalyst.plans.logical
          .OverwriteByExpression =>
        o.table match {
          case MergeRel(name, _, _) =>
            refuse(s"INSERT OVERWRITE on merge table $name is not " +
              "supported — a keyed table replaces rows through MERGE/" +
              "UPDATE, or rebuilds through create")
          case _ => o
        }
      case o: org.apache.spark.sql.catalyst.plans.logical
          .OverwritePartitionsDynamic =>
        o.table match {
          case MergeRel(name, _, _) =>
            refuse(s"dynamic-partition INSERT OVERWRITE on merge table " +
              s"$name is not supported — the merge table is key-range-" +
              "organized, not partitioned")
          case _ => o
        }
      // `MERGE INTO lake [AS t] USING src ON ... WHEN ...` — the verb a
      // warehouse lives on (the reference's whole pipeline IS a merge:
      // load_s3_files_…/handler.py:86-95). Lowered onto the COW
      // MergeTable.merge as ONE change batch; unsupported clause shapes
      // refuse by name inside lowerMerge. Matched top-down like the TT
      // case, so the bare-name rewrite below can never claim the target
      // relation first.
      case m @ org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable(
          MergeRel(name, quals, root), _, _, _, _, _, _) =>
        val alias = m.targetTable match {
          case org.apache.spark.sql.catalyst.plans.logical
              .SubqueryAlias(id, _) => id.name
          case _ => name
        }
        MergeTableDml.lowerMerge(spark, m, name, quals, root, alias)

      // ---- bare registered names are directly queryable ------------
      // `SELECT * FROM lake` = the current committed state: manifest-
      // directed and DV-applied for a merge root, newest-generation
      // parquet for a snapshot root. Registration is explicit and
      // session-scoped, so nothing in a real catalog can be shadowed
      // accidentally; time travel never reaches here (the TT case above
      // rewrote the whole node first, top-down).
      // Pruning trade on this path: a WHERE over the bare name is
      // pushed into the parquet scan as usual (PushedFilters +
      // row-group stat skipping — with the range-partitioned writer
      // that skips whole files' row groups), but it pays FOOTER reads
      // where MergeTable.readWhere consults the manifest's ranges and
      // blooms with zero reads; predicate-heavy serving should use
      // readWhere or the DML faces, which prune planner-side.
      // ---- GraftCatalog reads: swap the capability-less V2 handle ----
      // `SELECT * FROM lake.t [VERSION/TIMESTAMP AS OF ...]` resolves
      // through the catalog to DataSourceV2Relation(GraftTable) — here
      // it becomes the SAME manifest-pruned, DV-applied plan the
      // registry path uses (readResolved for a pinned generation,
      // MergeTableRelation's FileIndex otherwise). References above were
      // already bound to the V2 relation's attribute ids earlier in this
      // fixed-point iteration, so the swap restores them with an
      // id-preserving Project (the FileStreamSource-era relation-swap
      // discipline: never orphan a bound reference).
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
        val t = r.table.asInstanceOf[GraftTable]
        // the handle CARRIES its generation's parsed meta (pinned or
        // current): no second manifest GET per statement
        val resolved = t.pinnedDir match {
          case Some(_) => graft.streaming.MergeTable
            .readMeta(spark, t.root, t.meta).queryExecution.analyzed
          case None => MergeTableRelation.resolve(spark, t.root, t.meta)
        }
        val byName = resolved.output
          .map(a => a.name.toLowerCase(java.util.Locale.ROOT) -> a).toMap
        val restored = r.output.map { o =>
          val a = byName.getOrElse(o.name.toLowerCase(java.util.Locale.ROOT),
            refuse(s"catalog table ${t.tableName}: column ${o.name} " +
              "vanished between catalog resolution and the manifest read " +
              "— concurrent non-additive schema change?"))
          org.apache.spark.sql.catalyst.expressions.Alias(a, o.name)(
            exprId = o.exprId, qualifier = o.qualifier)
        }
        org.apache.spark.sql.catalyst.plans.logical.Project(restored, resolved)

      case u: UnresolvedRelation
          if SnapshotSqlCatalog.mergeRootOf(spark, u.multipartIdentifier).isDefined =>
        // DV-free generations plan over MergeTableFileIndex: the WHERE's
        // pushed dataFilters run the manifest+bloom pruning, so the SQL
        // scan opens only the candidate FILES (zero footer reads to
        // decide) — see MergeTableRelation for the DV'd fallback
        MergeTableRelation.resolve(spark,
          SnapshotSqlCatalog.mergeRootOf(spark, u.multipartIdentifier).get)
      case u: UnresolvedRelation
          if SnapshotSqlCatalog.rootOf(spark, u.multipartIdentifier).isDefined =>
        spark.read.parquet(Snapshots.resolve(spark,
          SnapshotSqlCatalog.rootOf(spark, u.multipartIdentifier).get))
          .queryExecution.analyzed
    }
}

/** The SQL `DESCRIBE HISTORY` face: `SELECT * FROM history('lake')` —
  * the table-valued spelling of [[graft.streaming.MergeTable.history]]
  * (Delta's DESCRIBE HISTORY / Iceberg's snapshots metadata table).
  * Registered as a real table function (injected by
  * [[graft.GraftExtensions]]), so Spark's own TVF resolution serves it;
  * the rows come from manifests alone — the produced plan is a
  * LocalRelation, no data file is ever scanned (asserted by spec). The
  * ops question then composes as plain SQL:
  * `SELECT generation FROM history('lake') WHERE n_dvs > 0`. */
object HistoryTableFunction {
  def build(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    def refuse(msg: String): Nothing =
      throw new AnalysisException("USER_RAISED_EXCEPTION",
        Map("errorMessage" -> msg))
    val spark = SparkSession.active
    val name = args match {
      case Seq(org.apache.spark.sql.catalyst.expressions
          .Literal(s: org.apache.spark.unsafe.types.UTF8String, _)) =>
        s.toString.toLowerCase(java.util.Locale.ROOT)
      case _ => refuse(
        "history() takes exactly one string literal: the registered " +
          "merge-table name, e.g. SELECT * FROM history('lake')")
    }
    SnapshotSqlCatalog.mergeRootOf(spark, Seq(name)) match {
      case Some(root) =>
        graft.streaming.MergeTable.history(spark, root)
          .queryExecution.analyzed
      case None => refuse(
        s"table $name is not registered as a merge table for history() " +
          s"(registered: " +
          s"${SnapshotSqlCatalog.registered(spark).toSeq.sorted.mkString(", ")})")
    }
  }
}

/** The SQL face of the CHANGE DATA FEED:
  * `SELECT * FROM changes('lake', 2, 5)` — the row-level diff between
  * two committed generations ([[graft.streaming.MergeTable
  * .changesBetween]]) as a table function, so downstream SQL composes
  * directly over the feed (`WHERE change = 'd'`, joins, aggregates).
  * `changes('lake', 0, g)` is the backfill window (the whole state at
  * g as inserts), matching [[graft.streaming.ChangeFeed]]'s cursor
  * semantics. A generation outside retention refuses loudly through
  * `resolveAt` naming what is available — the same contract as the
  * API. Unlike history(), the produced plan is the DISTRIBUTED diff
  * (changed files + DV deltas), cost ∝ changed data. */
object ChangesTableFunction {
  def build(args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    buildWith(args, mode = "raw", fn = "changes")

  /** `changes_paired('t', a, b)` — the UPDATE-PAIRED feed
    * ([[graft.streaming.MergeTable.changesBetweenPaired]]): same diff,
    * `change` ∈ insert/delete/update_preimage/update_postimage. */
  def buildPaired(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    buildWith(args, mode = "paired", fn = "changes_paired")

  /** `changes_paired_per_commit('t', a, b)` — pairing at COMMIT
    * granularity ([[graft.streaming.MergeTable
    * .changesBetweenPairedPerCommit]]): each retained generation hop
    * pairs independently and rows carry their `generation`, so a
    * delete + later-commit re-insert reports as its true d/i events
    * instead of the windowed form's update collapse. */
  def buildPairedPerCommit(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    buildWith(args, mode = "perCommit", fn = "changes_paired_per_commit")

  private def buildWith(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      mode: String, fn: String)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def refuse(msg: String): Nothing =
      throw new AnalysisException("USER_RAISED_EXCEPTION",
        Map("errorMessage" -> msg))
    val spark = SparkSession.active
    def gen(e: org.apache.spark.sql.catalyst.expressions.Expression): Long =
      e match {
        case Literal(v: Int, _) => v.toLong
        case Literal(v: Long, _) => v
        case _ => refuse(s"$fn() generation bounds must be integer " +
          s"literals; got ${e.sql}")
      }
    args match {
      case Seq(Literal(s: org.apache.spark.unsafe.types.UTF8String, _),
          fromE, toE) =>
        val name = s.toString.toLowerCase(java.util.Locale.ROOT)
        SnapshotSqlCatalog.mergeRootOf(spark, Seq(name)) match {
          case Some(root) =>
            try {
              val mt = graft.streaming.MergeTable
              val df = mode match {
                case "paired" =>
                  mt.changesBetweenPaired(spark, root, gen(fromE), gen(toE))
                case "perCommit" => mt.changesBetweenPairedPerCommit(
                  spark, root, gen(fromE), gen(toE))
                case _ =>
                  mt.changesBetween(spark, root, gen(fromE), gen(toE))
              }
              df.queryExecution.analyzed
            }
            catch { case e: IllegalArgumentException => refuse(e.getMessage) }
          case None => refuse(
            s"table $name is not registered as a merge table for " +
              s"$fn() (registered: " +
              s"${SnapshotSqlCatalog.registered(spark).toSeq.sorted.mkString(", ")})")
        }
      case _ => refuse(
        s"$fn() takes (table-name string literal, from-generation, " +
          s"to-generation), e.g. SELECT * FROM $fn('lake', 2, 5)")
    }
  }
}

/** The name → snapshot-root registry the SQL face reads. Entries live in
  * the session conf (`graft.snapshots.table.<name>`), so they are scoped,
  * inspectable with `SET`, and clonable with `newSession` — no engine
  * global. */
object SnapshotSqlCatalog {
  private val Prefix = "graft.snapshots.table."
  private val MergePrefix = "graft.merge.table."

  def register(spark: SparkSession, name: String, root: String): Unit =
    spark.conf.set(Prefix + name.toLowerCase(java.util.Locale.ROOT), root)

  /** Register a [[graft.streaming.MergeTable]] root: SQL time travel
    * then reads manifest-directed and DV-applied, not directory-raw. */
  def registerMerge(spark: SparkSession, name: String, root: String): Unit =
    spark.conf.set(MergePrefix + name.toLowerCase(java.util.Locale.ROOT), root)

  /** Drop a merge registration (the [[GraftCatalog]] DROP TABLE hook);
    * a name that was never registered is a no-op. */
  def unregisterMerge(spark: SparkSession, name: String): Unit =
    spark.conf.unset(MergePrefix + name.toLowerCase(java.util.Locale.ROOT))

  def rootOf(spark: SparkSession, nameParts: Seq[String]): Option[String] =
    if (nameParts.size != 1) None
    else spark.conf.getOption(
      Prefix + nameParts.head.toLowerCase(java.util.Locale.ROOT))

  def mergeRootOf(spark: SparkSession, nameParts: Seq[String]): Option[String] =
    if (nameParts.size != 1) None
    else spark.conf.getOption(
      MergePrefix + nameParts.head.toLowerCase(java.util.Locale.ROOT))

  def registered(spark: SparkSession): Set[String] =
    spark.conf.getAll.keysIterator.collect {
      case k if k.startsWith(Prefix) => k.stripPrefix(Prefix)
      case k if k.startsWith(MergePrefix) => k.stripPrefix(MergePrefix)
    }.toSet
}
