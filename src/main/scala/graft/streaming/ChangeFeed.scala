package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental CONSUMPTION of a [[MergeTable]]'s history: the table
  * itself becomes the changelog (the kappa loop closed — CDC wire →
  * MOR table → downstream incremental consumers), each committed
  * generation a replayable micro-batch of [[MergeTable.changesBetween]]
  * rows.
  *
  * Why a checkpointed CURSOR rather than a DSv2 stream: the feed of a
  * window is a DISTRIBUTED DataFrame (changed files + DV-delta reads);
  * a DSv2 `PartitionReader` would have to funnel those rows through
  * driver-planned partitions of its own, re-implementing the parquet
  * scan. The cursor keeps the plumbing at the edge and the data on
  * executors — the same shape Structured Streaming's own `foreachBatch`
  * consumers have.
  *
  * Delivery contract: the cursor advances AFTER the consumer returns —
  * at-least-once per window, with the window's `toGen` as the natural
  * idempotence key (pair with an epoch-keyed sink like
  * [[Compaction.appendBatch]] for end-to-end exactly-once, the same
  * discipline as every incremental index in this engine). Replay is
  * possible exactly as long as the generations are retained: a cursor
  * older than [[MergeTable.sweep]]'s retention floor fails LOUDLY at
  * `resolveAt` (naming the available generations) instead of silently
  * skipping the gap — retention is the replay budget, the same
  * contract a binlog/Kafka consumer lives with.
  */
object ChangeFeed {

  private def cursorPath(root: String, name: String) =
    new Path(s"$root/_cdf-cursors/$name")

  /** The consumer's last fully-processed generation (None = never ran).
    * Crash recovery: [[writeCursor]] deletes the cursor before renaming
    * the tmp over it; a crash in that window leaves ONLY the fully-
    * written `.{name}.tmp` sibling. Falling back to generation 0 there
    * would re-deliver a backfill window whose `toGen` idempotence key
    * collides with a previously delivered incremental window carrying
    * different contents — so on a missing cursor we recover from the
    * tmp sibling first (the same sweep-crash-recovery pattern the
    * bloom registry uses), and only a missing BOTH means never-ran. */
  def cursor(spark: SparkSession, root: String, name: String): Option[Long] = {
    val p = cursorPath(root, name)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    def readAll(path: Path): String = {
      val in = f.open(path)
      try {
        // read to EOF — a short read must not truncate the number
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8")
      } finally in.close()
    }
    if (f.exists(p))
      // first line = the generation; the "#end" terminator line (absent
      // on legacy cursors) is irrelevant once the rename made it real
      Some(readAll(p).linesIterator.next().trim.toLong)
    else if (f.exists(tmp)) {
      // the tmp may itself be a PARTIAL write (crash DURING the very
      // first cursor write, before any real cursor existed). A partial
      // numeric PREFIX of the real generation still parses — "1" of
      // "12" — and recovering it would re-deliver windows whose
      // epoch keys collide with already-recorded ones. Only a tmp whose
      // terminator line made it to disk is a COMPLETE write. A
      // terminator-less tmp that still PARSES is genuinely ambiguous:
      // it is either a new-format partial (recover nothing) or a
      // COMPLETE legacy-format tmp (recover its value) — and guessing
      // either way silently corrupts one of the two cases, so it
      // refuses LOUDLY and names the file for the operator. Unparseable
      // bytes can only be a partial (every format leads with digits):
      // no window was ever durably recorded.
      val s = readAll(tmp)
      val firstLine = s.linesIterator.nextOption().map(_.trim).getOrElse("")
      if (s.endsWith("\n#end")) firstLine.toLongOption
      else if (firstLine.toLongOption.isEmpty) None
      else throw new IllegalStateException(
        s"ambiguous cursor recovery state at $tmp: a numeric tmp " +
          "without the #end terminator is either a mid-write partial " +
          "(discard it) or a complete pre-terminator-format cursor " +
          "(rename it over the cursor file) — decide and retry")
    } else None
  }

  private def writeCursor(spark: SparkSession, root: String, name: String,
      gen: Long): Unit = {
    val p = cursorPath(root, name)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    if (!f.exists(p.getParent)) f.mkdirs(p.getParent)
    val out = f.create(tmp, true)
    // the terminator line is the completeness witness the tmp-recovery
    // path demands (a partial numeric prefix must never be recovered)
    out.write(s"$gen\n#end".getBytes("UTF-8"))
    out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"cursor rename failed for $p")
  }

  /** Drain every committed generation beyond `name`'s cursor, invoking
    * `fn(changes, fromGen, toGen)` once per generation window (the
    * finest feed — a consumer that prefers coarser windows can batch by
    * raising `maxGens`, the diffs compose). A cursor that has never run
    * starts at 0: the first window is the whole current state as
    * inserts (backfill), after which the consumer is incremental.
    * Returns the number of windows processed. */
  def drain(spark: SparkSession, root: String, name: String,
      gensPerWindow: Int = 1, maxWindows: Int = Int.MaxValue)
      (fn: (DataFrame, Long, Long) => Unit): Int = {
    require(gensPerWindow >= 1, s"gensPerWindow must be ≥ 1: $gensPerWindow")
    var from = cursor(spark, root, name).getOrElse(0L)
    var windows = 0
    var gens = Snapshots.generations(spark, root).sorted.filter(_ > from)
    while (gens.nonEmpty && windows < maxWindows) {
      val to = gens.take(gensPerWindow).last
      fn(MergeTable.changesBetween(spark, root, from, to), from, to)
      writeCursor(spark, root, name, to)
      from = to
      windows += 1
      gens = gens.filter(_ > to)
    }
    windows
  }
}
