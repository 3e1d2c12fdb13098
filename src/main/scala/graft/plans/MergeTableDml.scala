package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.expr
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

  /** `DELETE FROM <merge-table> WHERE <cond>` → one DV sidecar over the
    * manifest-pruned candidate files; returns the deleted row count. */
  case class MergeTableDeleteCommand(root: String, condSql: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(AttributeReference("rows_deleted", LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val n = graft.streaming.MergeTable.deleteWhere(session, root,
        expr(condSql))
      Seq(Row(n))
    }
  }

  /** `UPDATE <merge-table> SET c = e, ... [WHERE cond]` → scoped
    * copy-on-write of the candidate files; returns (rewritten, carried)
    * file counts. */
  case class MergeTableUpdateCommand(root: String,
      assignments: Seq[(String, String)], condSql: Option[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      AttributeReference("files_rewritten", IntegerType, nullable = false)(),
      AttributeReference("files_carried", IntegerType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val (t, c) = graft.streaming.MergeTable.updateWhere(session, root,
        condSql.map(expr).getOrElse(expr("true")),
        assignments.map { case (k, v) => k -> expr(v) }.toMap)
      Seq(Row(t, c))
    }
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
      stripQualifiers(a.key, quals) match {
        case u: UnresolvedAttribute if u.nameParts.size == 1 =>
          u.nameParts.head -> stripQualifiers(a.value, quals).sql
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
