package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** AGGREGATE VIEW OVER A LAKE TABLE as one registered maintenance unit —
  * the kappa loop's last mile, closing the gap between [[ChangeFeed]]
  * (the table as a replayable changelog) and the signed-delta view
  * algebra ([[IncrementalAggCdc]], Gupta/Mumick/Subrahmanian '93):
  * [[refresh]] drains every committed generation past the view's cursor
  * and folds each window's row-level inserts/deletes into signed
  * partials, so the view tracks the TABLE — through COW merges, MOR
  * waves, SQL DML, rollbacks — at cost ∝ changed rows, never a table
  * scan.
  *
  * Exactly-once by composition: the drain is at-least-once with the
  * window's `toGen` as its idempotence key, and the partial lands via
  * the epoch-keyed appender ([[Compaction.appendBatch]] overwrites the
  * epoch dir) — a crash-replayed window rewrites the same bytes. A
  * compaction of the TABLE is feed-invisible (no window), a compaction
  * of the VIEW ([[compact]]) folds partials through the atomic
  * generation publish; neither moves the cursor.
  *
  * Retraction floor: count/sum fold signed weights; MIN/MAX need the
  * runner-up after a retraction, so partials keep per-(group, value)
  * multiplicities — the same honest floor as [[IncrementalAggCdc]]
  * (anything smaller cannot answer MIN after a delete without a
  * rescan).
  *
  * Reference grounding: the reference keeps its warehouse aggregates
  * fresh by re-running queries over the whole replicated table
  * (`/root/reference/README.md:11-12` — every consumer re-reads); here
  * the view is maintained from the table's own history at delta cost. */
object LakeAggView {

  /** One maintenance unit: the view over `group(valueCol)` of the merge
    * table at `tableRoot`, materialized under `viewRoot`, with its own
    * named cursor. Drains every committed window and returns how many
    * windows were folded (0 = already fresh). */
  def refresh(spark: SparkSession, tableRoot: String, viewRoot: String,
      groupCol: String, valueCol: String,
      cursorName: String = "agg-view"): Int =
    ChangeFeed.drain(spark, tableRoot, cursorName) { (changes, _, to) =>
      val partial = changes.select(
        col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"),
        when(col("change") === "i", 1L).otherwise(-1L).as("d"))
        .groupBy(col("g"), col("v"))
        .agg(sum(col("d")).as("d"))
      Compaction.appendBatch(partial, viewRoot, to)
    }

  private def mergePartials(partials: DataFrame): DataFrame =
    partials.groupBy(col("g"), col("v")).agg(sum(col("d")).as("d"))

  /** The maintained view: per group — live count, sum, min, max. A
    * fully-retracted group disappears, exactly as from a batch
    * aggregate of the live table. */
  def read(spark: SparkSession, viewRoot: String): DataFrame =
    viewOf(mergePartials(
      spark.read.parquet(Snapshots.resolve(spark, viewRoot)).drop("batch")))

  private def viewOf(vc: DataFrame): DataFrame =
    vc.groupBy(col("g"))
      .agg(sum(col("d")).as("cnt"),
        sum(col("v") * col("d")).as("sum_v"),
        min(when(col("d") > 0, col("v"))).as("min_v"),
        max(when(col("d") > 0, col("v"))).as("max_v"))
      .filter(col("cnt") > 0)

  /** The ground truth [[read]] must equal after EVERY refresh: the
    * batch aggregate over the table's current committed state. */
  def batchAggregate(spark: SparkSession, tableRoot: String,
      groupCol: String, valueCol: String): DataFrame =
    viewOf(MergeTable.read(spark, tableRoot).select(
      col(groupCol).as("g"), col(valueCol).cast("long").as("v"),
      lit(1L).as("d")))

  /** t_lake_agg_view — the ORACLED face of the maintenance unit: a
    * merge table built from orders (group = custkey mod 10, value =
    * exact cents), backfill-refreshed, hit with one MOR change wave
    * (deletes + updates), refreshed again — and the VIEW is what the
    * gate hashes, against an oracle that recomputes the group aggregate
    * from the logical net effect. A retraction bug (double-count on
    * update, ghost row on delete, stale min) lands in cnt/sum/min/max
    * and breaks the hash. */
  def lakeAggViewQuery(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Layout
    val root = Layout.indexPath("agg_view_orders", dir)
    val table = s"$root/table"
    val view = s"$root/view"
    val sig = s"v1_${Layout.dataSig(s"$dir/orders.parquet")}"
    Layout.ensureSigGated(root, sig) {
      val rootPath = new org.apache.hadoop.fs.Path(root)
      val f = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
      if (f.exists(rootPath)) f.delete(rootPath, true) // stale tree: rebuild
      val base = graft.Tables.orders(spark, dir).select(
        col("o_orderkey").as("k"),
        (col("o_custkey") % 10).as("grp"),
        graft.functions.DetMath.cents(col("o_totalprice")).as("v"))
      MergeTable.create(spark, table, base, "k", nFiles = 8,
        commitTsMillis = 1000L)
      refresh(spark, table, view, "grp", "v") // backfill window
      val wave = base.where(col("k") % 10 === 7)
        .select(lit("d").as("op"), lit(1L).as("seq"), col("k"),
          col("grp"), col("v"))
        .unionByName(base.where(col("k") % 10 === 3)
          .select(lit("u").as("op"), lit(1L).as("seq"), col("k"),
            col("grp"), (col("v") + 11L).as("v")))
      MergeTable.mergeMor(spark, table, wave, "k", commitTsMillis = 2000L)
      refresh(spark, table, view, "grp", "v") // incremental window
    }
    read(spark, view).orderBy(col("g"))
  }

  /** Fold accumulated epochs to ≤ |live (group, value)| rows through
    * the atomic generation publish; the cursor is untouched.
    *
    * REFUSES unless the view's cursor has caught up past every folded
    * epoch: the folded base lands under the MAX epoch id
    * ([[Compaction.compact]]'s convention), and a crash-replayed drain
    * window with that same `toGen` would epoch-key-OVERWRITE the base
    * with one window's partial — silently truncating the view. With
    * cursor ≥ maxId, every future drain starts strictly above it, so
    * the collision is impossible by construction (the replay-safety
    * argument streaming appenders get from their checkpoint, rebuilt
    * here on the cursor). A refused compact means: refresh once (the
    * re-drain is idempotent and advances the cursor), then compact. */
  def compact(spark: SparkSession, tableRoot: String, viewRoot: String,
      cursorName: String = "agg-view"): Unit = {
    val ids = Compaction.batchIds(spark, viewRoot)
    require(ids.nonEmpty,
      s"nothing to compact under $viewRoot — refresh the view first " +
        "(no epoch has ever been recorded)")
    val maxId = ids.max
    val cur = ChangeFeed.cursor(spark, tableRoot, cursorName)
    require(cur.exists(_ >= maxId),
      s"view compaction under $viewRoot before the cursor caught up " +
        s"(cursor=$cur, newest folded epoch would be $maxId): a " +
        "crash-replay of that window would overwrite the folded base — " +
        "refresh once, then compact")
    Compaction.compact(spark, viewRoot) { (df, out) =>
      mergePartials(df).filter(col("d") =!= 0)
        .coalesce(1).write.mode("overwrite").parquet(out)
    }
  }
}
