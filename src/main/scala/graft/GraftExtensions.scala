package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library-level injection of this engine's SQL surface via the public
  * `SparkSessionExtensions` hook: a deployment sets
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and EVERY session on the cluster gets `vector_dot`,
  * `rolling_fingerprint`, and `dynamo_attr_decode` with no code call —
  * the way a production cluster ships engine extensions (vs.
  * [[GraftFunctions.register]], the per-session programmatic form; both
  * share one builder table so the two surfaces cannot drift). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // SQL `TIMESTAMP AS OF` / `VERSION AS OF` over snapshot roots
    // registered via [[graft.plans.SnapshotSqlCatalog.register]]
    ext.injectResolutionRule(session =>
      new graft.plans.SnapshotTimeTravelRule(session))
    // `SELECT * FROM history('lake')` — DESCRIBE HISTORY as a table
    // function; resolved by Spark's own TVF machinery, rows from
    // manifests alone (a LocalRelation — no table scan, ever)
    ext.injectTableFunction((
      FunctionIdentifier("history"),
      new ExpressionInfo("graft", "history"),
      graft.plans.HistoryTableFunction.build))
    // `SELECT * FROM changes('lake', 2, 5)` — the change data feed as
    // a table function: the DISTRIBUTED generation diff, composable by
    // plain SQL downstream
    ext.injectTableFunction((
      FunctionIdentifier("changes"),
      new ExpressionInfo("graft", "changes"),
      graft.plans.ChangesTableFunction.build))
    // `SELECT * FROM changes_paired('lake', 2, 5)` — the same feed with
    // Delta-CDF update pairing: change ∈ insert/delete/update_preimage/
    // update_postimage (same-key d+i within the window is one UPDATE)
    ext.injectTableFunction((
      FunctionIdentifier("changes_paired"),
      new ExpressionInfo("graft", "changes_paired"),
      graft.plans.ChangesTableFunction.buildPaired))
    // `SELECT * FROM changes_paired_per_commit('lake', 2, 5)` — pairing
    // at COMMIT granularity: each retained generation hop pairs
    // independently (rows carry their `generation`), so a delete and a
    // later-commit re-insert stay d/i instead of collapsing to an
    // update pair
    ext.injectTableFunction((
      FunctionIdentifier("changes_paired_per_commit"),
      new ExpressionInfo("graft", "changes_paired_per_commit"),
      graft.plans.ChangesTableFunction.buildPairedPerCommit))
  }
}
