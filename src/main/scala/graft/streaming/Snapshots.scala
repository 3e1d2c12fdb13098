package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Committed-generation indirection for the `batch=N` appender roots.
  *
  * [[Compaction]] used to swap the compacted tree in with two renames
  * (root → `__precompact`, sibling → root), which left a window where
  * the root did not exist: a concurrent reader got path-not-found, or
  * [[Epochs.list]] silently returned empty. Renames also are not atomic
  * on object stores, so the old protocol quietly narrowed the
  * "ingest-pause" contract into a "nobody may even READ" contract.
  *
  * This object replaces the swap with a pointerless manifest
  * convention built on create-if-absent of a marker file. On local
  * filesystems and HDFS `create(path, overwrite = false)` is an atomic
  * check-and-create, so concurrent committers genuinely exclude each
  * other; on S3A it is a client-side existence check followed by a PUT
  * — NOT atomic — so writer exclusion there must come from the caller
  * (see the single-compactor contract at [[commit]]). READERS are safe
  * on every store regardless: they resolve to the highest generation
  * whose marker exists, and any committed generation is a complete
  * tree.
  *
  *   - a compacted snapshot lands under `root/_gen-<n>/batch=<maxId>/…`;
  *   - it becomes visible by creating the empty marker file
  *     `root/_gen-<n>/_COMMITTED` — one atomic create, no rename, no
  *     window with no data;
  *   - readers resolve `root` to the HIGHEST committed generation (or
  *     to `root` itself while no generation exists — the pre-compaction
  *     layout, so appender roots never pay the indirection until they
  *     first compact);
  *   - a crash before the marker leaves an invisible half-written
  *     `_gen-<n>` that the next compaction deletes and rewrites — never
  *     a reader-visible mix, never data loss;
  *   - the PREVIOUS generation is retained until the next compaction
  *     commits, so a reader that resolved just before a commit keeps
  *     reading a complete tree (snapshot isolation with a retention of
  *     one, the same policy table formats default to).
  *
  * Underscore-prefixed names (`_gen-<n>`, `_COMMITTED`) are invisible
  * to Spark's file listing, so neither the marker nor a generation tree
  * ever leaks into a partition discovery of `root`; generations are
  * only ever read via an explicit resolved path.
  */
object Snapshots {

  // underscore-prefixed AND equals-free: Spark's hidden-name filter
  // exempts names containing "=" (partition columns may start with _),
  // so `_gen=1` would still be discovered — `_gen-1` is genuinely
  // hidden, and a generation tree under a not-yet-compacted root can
  // never leak into a partition discovery of `root` itself (which would
  // otherwise see conflicting `batch=` vs `_gen=/batch=` layouts)
  private val Marker = "_COMMITTED"

  /** The commit-marker file name — for protocol extensions that stage a
    * FULLY-COMMITTED generation dir and publish it with one atomic
    * rename ([[MergeTable.commitPrepared]]'s claim-is-commit). */
  private[graft] def markerName: String = Marker
  private val GenPrefix = "_gen-"
  private val GenName = raw"_gen-(\d+)".r

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Read a small marker file to EOF and return its body. A single
    * `in.read(buf)` may legally return a PREFIX of the file (HDFS,
    * object-store streams), and a numeric prefix of a marker body still
    * parses — "1" of "12" — silently corrupting whatever fence or
    * format check the marker backs. Every marker reader in the repo
    * must loop to EOF through this helper. */
  private[graft] def readMarker(spark: SparkSession, p: Path): String = {
    val in = fs(spark, p).open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream(64)
      val buf = new Array[Byte](256)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Directory of generation `g` under `root`. */
  def genDir(root: String, g: Long): String = s"$root/$GenPrefix$g"

  /** All generation ids present under `root`, committed or not. */
  private def gens(spark: SparkSession, root: String): Seq[(Long, Boolean)] = {
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq.collect {
      case st if st.isDirectory =>
        st.getPath.getName match {
          case GenName(n) =>
            Some(n.toLong -> f.exists(new Path(st.getPath, Marker)))
          case _ => None
        }
    }.flatten
  }

  /** The newest committed generation under `root`, if any. */
  def currentGen(spark: SparkSession, root: String): Option[Long] =
    gens(spark, root).collect { case (g, true) => g }.sorted.lastOption

  /** All COMMITTED generation ids under `root`, ascending — the
    * time-travel catalog. With the default retention (current + one
    * predecessor, [[sweep]]) this has at most two entries; a caller that
    * sweeps less aggressively sees its full history here. Half-written
    * (uncommitted) generations never appear. */
  def generations(spark: SparkSession, root: String): Seq[Long] =
    gens(spark, root).collect { case (g, true) => g }.sorted

  /** Resolve a SPECIFIC committed generation — time travel. Fails loudly
    * on an uncommitted or swept generation (reading a half-written tree
    * would return a silent mix; reading a swept one, nothing), naming
    * what IS available. Immutability contract: the CURRENT generation is
    * the live appender target (new `batch=` dirs land inside it via
    * [[resolve]]), so it is a moving snapshot; a generation becomes
    * byte-stable the moment a newer one commits — "generation g" as a
    * time-travel target means "the table as of the commit of g+1", the
    * same frozen-on-supersede semantic table formats give historical
    * versions. A superseded generation stays readable until [[sweep]]
    * retires it, which retention delays until two newer commits exist. */
  def resolveAt(spark: SparkSession, root: String, g: Long): String = {
    val committed = generations(spark, root)
    require(committed.contains(g),
      s"generation $g is not committed under $root " +
        s"(committed: ${if (committed.isEmpty) "none" else committed.mkString(", ")})")
    genDir(root, g)
  }

  /** Read a specific committed generation — the audit face of the CDC
    * warehouse (reference: the processed-folder history
    * `load_s3_files_to_redshift_lambda/handler.py:96-112` keeps loaded
    * files around precisely so yesterday's state stays inspectable;
    * here yesterday's state is a complete queryable snapshot, not a pile
    * of staged files). Same relation shape as reading
    * [[resolve]] — `batch=` partition discovery included. */
  def readAt(spark: SparkSession, root: String, g: Long): org.apache.spark.sql.DataFrame =
    spark.read.parquet(resolveAt(spark, root, g))

  /** The directory consumers should read: the newest committed
    * generation, or `root` itself while none exists (the plain appender
    * layout — this function is a no-op until the root first compacts). */
  def resolve(spark: SparkSession, root: String): String =
    currentGen(spark, root).map(genDir(root, _)).getOrElse(root)

  /** The generation id the next compaction should write into: one past
    * everything present, committed or not (a crashed half-write is never
    * reused in place — it is deleted and its id skipped). */
  def nextGen(spark: SparkSession, root: String): Long =
    gens(spark, root).map(_._1).maxOption.getOrElse(0L) + 1L

  /** Publish generation `g`: one marker-file create-if-absent. The data
    * under [[genDir]] must be fully written first.
    *
    * SINGLE-COMPACTOR CONTRACT: at most one compactor may run against a
    * root at a time (the same exclusion [[Compaction]] already demands
    * of appenders during compaction). On local/HDFS a violated contract
    * still fails loudly — `create(overwrite = false)` is atomic there,
    * so the second committer of the same generation throws (spec-pinned
    * in CompactionSpec). On S3A the check-then-put is NOT atomic and two
    * racing committers could both "succeed"; the contract is the guard
    * there, not this call — stores with conditional-put could upgrade
    * this to a real compare-and-set, but Hadoop's FileSystem API does
    * not expose one portably. */
  def commit(spark: SparkSession, root: String, g: Long,
      commitTsMillis: Long = System.currentTimeMillis()): Unit = {
    val marker = new Path(genDir(root, g), Marker)
    val f = fs(spark, marker)
    // create-if-absent: fails if the marker already exists (atomicity of
    // the check is filesystem-dependent — see the contract above). The
    // marker BODY is the commit timestamp (epoch millis, one decimal
    // line) — the metadata [[resolveAsOf]] needs; an injectable ts keeps
    // specs deterministic.
    val out = f.create(marker, false)
    out.write(commitTsMillis.toString.getBytes("UTF-8"))
    out.close()
  }

  /** Commit timestamp of generation `g` (epoch millis): the marker body,
    * falling back to the marker file's modification time for markers
    * written before the body carried it (round-11 format). None if `g`
    * is not committed. */
  def commitTime(spark: SparkSession, root: String, g: Long): Option[Long] = {
    val marker = new Path(genDir(root, g), Marker)
    val f = fs(spark, marker)
    if (!f.exists(marker)) None
    else {
      val in = f.open(marker)
      // read to EOF: a single read() may legally return a prefix (e.g.
      // on HDFS), and a truncated "16" would parse as a valid-but-wrong
      // epoch — the silent corruption resolveAsOf's loud contract bans
      val body = try {
        val bos = new java.io.ByteArrayOutputStream(32)
        val buf = new Array[Byte](64)
        var n = in.read(buf)
        while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
        new String(bos.toByteArray, "UTF-8").trim
      } finally in.close()
      Some(body.toLongOption.getOrElse(f.getFileStatus(marker).getModificationTime))
    }
  }

  /** The time-travel catalog WITH commit metadata: (generation,
    * commit epoch millis), ascending by generation. */
  def generationsWithTimes(spark: SparkSession, root: String): Seq[(Long, Long)] =
    generations(spark, root).flatMap(g =>
      commitTime(spark, root, g).map(g -> _))

  /** Resolve "the table as of time `tsMillis`": the NEWEST generation
    * committed at-or-before that instant — so "as of yesterday" needs a
    * wall-clock, not out-of-band knowledge of generation ids. Fails
    * loudly (naming the available window) when every retained commit is
    * newer than the asked instant: silently serving a later state would
    * be a wrong answer, and the earlier state is swept — the same
    * contract table formats give a time-travel query past retention. */
  def resolveAsOf(spark: SparkSession, root: String, tsMillis: Long): String = {
    val cat = generationsWithTimes(spark, root)
    val atOrBefore = cat.filter(_._2 <= tsMillis)
    require(atOrBefore.nonEmpty,
      s"no generation committed at or before $tsMillis under $root " +
        s"(committed: ${
          if (cat.isEmpty) "none"
          else cat.map { case (g, t) => s"gen $g @ $t" }.mkString(", ")})")
    // tie-break equal commit instants by generation id: two commits in
    // the same millisecond (burst maintenance) must resolve to the
    // NEWER state, not whichever listed first
    genDir(root, atOrBefore.maxBy(e => (e._2, e._1))._1)
  }

  /** Read the table as of a wall-clock instant — [[resolveAsOf]] +
    * partition discovery, the timestamp face of [[readAt]]. */
  def readAsOf(spark: SparkSession, root: String,
      tsMillis: Long): org.apache.spark.sql.DataFrame =
    spark.read.parquet(resolveAsOf(spark, root, tsMillis))

  /** Delete superseded trees, retaining the current generation and its
    * `retainPredecessors` most recent predecessors (default 1: one-deep
    * snapshot retention for in-flight readers — table formats' default).
    * A deeper knob widens the [[resolveAsOf]] window at the cost of
    * keeping that many full snapshots on disk. The pre-generation layout
    * (`root/batch=*` directly) is treated as the oldest generation and
    * swept once it falls outside the retained window.
    *
    * AGE-BASED retention (`olderThanMillis` ≥ 0 — the reference's own
    * lifecycle semantics, a 1-day expiry window on the processed stage,
    * `cdk_infrastructure/__init__.py:300-307`): ALSO retain every
    * generation committed within the window, PLUS the newest generation
    * committed at-or-before the window's floor — the BOUNDARY
    * generation, which was "the table" when the window opened, so
    * [[resolveAsOf]] stays answerable for EVERY instant inside the
    * window (dropping it would silently unanswer "as of 23 hours ago"
    * under a 1-day window). The two policies UNION (the safe
    * direction); pass `retainPredecessors = 0` for pure age semantics.
    * A pre-window as-of then refuses loudly, naming the retained
    * time floor ([[resolveAsOf]]'s existing contract). `nowMillis` is
    * injectable so retention specs are deterministic. */
  def sweep(spark: SparkSession, root: String,
      retainPredecessors: Int = 1,
      olderThanMillis: Long = -1L,
      nowMillis: Long = System.currentTimeMillis()): Unit = {
    require(retainPredecessors >= 0, "retention cannot be negative")
    val rootPath = new Path(root)
    val f = fs(spark, rootPath)
    val all = gens(spark, root)
    val committed = all.collect { case (g, true) => g }.sorted
    if (committed.isEmpty) return
    val current = committed.last
    val ageRetain: Set[Long] =
      if (olderThanMillis < 0L) Set.empty
      else {
        val cutoff = nowMillis - olderThanMillis
        val timed = committed.flatMap(g =>
          commitTime(spark, root, g).map(g -> _))
        val inWindow = timed.collect { case (g, t) if t > cutoff => g }
        // the boundary generation: newest committed at-or-before the
        // floor — the state every as-of inside the window resolves to
        // when no in-window commit precedes the asked instant
        val boundary = timed.filter(_._2 <= cutoff)
          .sortBy(e => (e._2, e._1)).lastOption.map(_._1)
        inWindow.toSet ++ boundary
      }
    val retain: Set[Long] =
      (Set(current) ++ committed.dropRight(1).takeRight(retainPredecessors)
        ++ ageRetain)
    // half-written (uncommitted) gens below current are dead weight too
    all.foreach { case (g, _) =>
      if (!retain.contains(g) && g < current)
        f.delete(new Path(genDir(root, g)), true)
    }
    // the pre-gen layout is the oldest generation of all: it occupies
    // one predecessor slot while fewer committed generations exist than
    // the window holds, so sweep it once the window is full of real ones
    if (committed.size >= retainPredecessors + 1) {
      f.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .foreach(st => f.delete(st.getPath, true))
    }
  }
}
