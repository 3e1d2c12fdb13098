package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Pluggable COMMIT-CLAIM adapter — the one protocol point where the
  * lake's optimistic concurrency touches filesystem atomicity.
  *
  * [[MergeTable.commitPrepared]]'s serialization point is "publish the
  * fully-staged generation dir as exactly `gNow + 1`, admitting ONE
  * winner". On local filesystems and HDFS a dst-must-not-exist rename
  * IS that claim ([[CommitLog.Rename]], the default — the protocol the
  * repo always used). On raw object stores rename is copy+delete and
  * dst-exists checks race (the reference sidesteps this by giving each
  * pipeline run a Step-Function-serialized single writer,
  * `cdk_infrastructure/__init__.py` — serialization that IS the
  * bottleneck at N writers), so table formats route the claim through
  * a CONDITIONAL PUT: S3 `If-None-Match`, DynamoDB
  * `attribute_not_exists`, Delta's LogStore / S3DynamoDBLogStore shape.
  * This trait is that hook: register a store-backed log for a root
  * prefix and the SAME prepare/arbitrate/commit loop runs on a store
  * with no atomic rename at all — the 100 TB object-store story is an
  * adapter, not a rewrite (spec-pinned: CommitLogSpec races committers
  * through a claim-based log whose publish uses NO rename).
  *
  * Contract for implementations:
  *   - `publish` returns true iff THIS caller won generation `target`
  *     of `root`; two concurrent callers for the same (root, target)
  *     must never both win (the claim must be a real compare-and-set);
  *   - on a won claim the staged dir's CONTENT must be fully visible
  *     under the generation dir before returning (readers resolve by
  *     the commit marker, which therefore lands LAST when copying);
  *   - a lost claim must leave the staged dir untouched (the caller
  *     deletes and retries against the new state);
  *   - crash scope: the default rename protocol cannot strand a
  *     half-claimed id (the rename is all-or-nothing). A naive
  *     conditional-put log CAN crash between claim and content copy;
  *     production implementations carry claim fencing/TTL or
  *     claim-after-write — [[CommitLog.ClaimAfterWriteLog]] is the
  *     shipped reference implementation of the latter: content is made
  *     durable under a writer-unique name BEFORE the claim (which then
  *     NAMES it), so a claimed-but-unmaterialized generation is always
  *     recoverable by any successor, never stranded (spec-pinned:
  *     CommitLogSpec kills a winner between claim and materialize). */
trait CommitLog {

  /** Publish `staged` (a fully-written generation dir: manifest AND
    * commit marker already inside) as generation `target` under
    * `root`. True = this caller won; false = lost the race. */
  def publish(f: FileSystem, root: String, target: Long,
      staged: Path): Boolean
}

object CommitLog {

  /** The default local/HDFS protocol: one dst-must-not-exist rename of
    * the staged dir — the claim IS the commit (no window where an id
    * is taken but unpublished). Hadoop's rename(src, existingDir)
    * NESTS src inside dst instead of failing, so a lost race is
    * detected by the nested dir and undone. */
  object Rename extends CommitLog {
    override def publish(f: FileSystem, root: String, target: Long,
        staged: Path): Boolean = {
      val dst = new Path(Snapshots.genDir(root, target))
      if (f.exists(dst)) return false
      if (!f.rename(staged, dst)) return false
      val nested = new Path(dst, staged.getName)
      if (f.exists(nested)) { f.delete(nested, true); return false }
      f.exists(new Path(dst, Snapshots.markerName))
    }
  }

  // longest-prefix registry: one deployment typically registers its
  // store root once ("s3a://bucket/lake/"); everything else (local
  // tests, HDFS tables) keeps the rename protocol
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitLog]()

  private def norm(p: String): String =
    if (p.endsWith("/")) p.dropRight(1) else p

  /** (scheme, authority, path) of a root spelling, via Path#toUri — so
    * the registry match survives spelling drift between registration
    * and use ('file:/x/t' vs '/x/t', trailing slashes, '//' runs). An
    * ABSENT scheme/authority on either side matches any (a bare path
    * registration must cover the qualified spelling the writer ends up
    * with — a silent miss here falls back to the rename protocol on a
    * store where rename is NOT atomic, the exact failure the r17
    * advice flagged); when both sides carry one, they must agree. */
  private def uriParts(p: String): (String, String, String) = {
    val u = new Path(p).toUri
    val path = Option(u.getPath).filter(_.nonEmpty)
      .getOrElse(Option(u.getSchemeSpecificPart).getOrElse(p))
    (Option(u.getScheme).getOrElse(""),
      Option(u.getAuthority).getOrElse(""), norm(path))
  }

  private def owns(prefix: String, root: String): Boolean = {
    val (ps, pa, pp) = uriParts(prefix)
    val (rs, ra, rp) = uriParts(root)
    (ps.isEmpty || rs.isEmpty || ps == rs) &&
      (pa.isEmpty || ra.isEmpty || pa == ra) &&
      (rp == pp || rp.startsWith(pp + "/"))
  }

  /** Route every root AT or UNDER `rootPrefix` through `log`. The
    * match is SEGMENT-aware (prefix equal, or followed by '/'), never
    * raw startsWith: registering "/lake/t1" must not capture
    * "/lake/t10", and a trailing-slash registration must still cover
    * the root spelled without one. Comparison runs over Path#toUri
    * (scheme, authority, path) so 'file:/lake' and '/lake' resolve to
    * the same owner. */
  def register(rootPrefix: String, log: CommitLog): Unit =
    registry.put(norm(rootPrefix), log)

  def unregister(rootPrefix: String): Unit = registry.remove(norm(rootPrefix))

  /** The log that owns `root`: the longest registered segment-prefix
    * match (by normalized path length), or the rename default. */
  def forRoot(root: String): CommitLog = {
    var best: Option[(String, CommitLog)] = None
    registry.forEach { (p, l) =>
      if (owns(p, root) &&
        best.forall(b => uriParts(b._1)._3.length < uriParts(p)._3.length))
        best = Some(p -> l)
    }
    best.map(_._2).getOrElse(Rename)
  }

  /** CLAIM-AFTER-WRITE conditional-put log — the FENCED reference
    * implementation of the non-atomic-store protocol (the shape of
    * Delta's S3DynamoDBLogStore): the staged content is made durable
    * under a WRITER-UNIQUE `_pub-<gen>-<uuid>` dir FIRST, then the
    * claim (a compare-and-set in an external [[ClaimStore]] — DynamoDB
    * `attribute_not_exists`, S3 `If-None-Match`) records that dir as
    * generation `target`'s content, and only then is the `_gen-N` dir
    * materialized for readers. Crash anatomy, window by window:
    *   - before the claim: only an UNCLAIMED `_pub-*` orphan remains
    *     (age-GC it; no generation id was consumed);
    *   - between claim and materialize — the window the naive
    *     conditional-put log strands a table in: the claim NAMES the
    *     durable content, so ANY successor (the next writer's lost
    *     claim, or an explicit [[recoverClaimed]]) completes the copy;
    *     the generation is late, never lost, and the id never
    *     double-publishes (materialization is idempotent byte-copy of
    *     the one claimed dir, marker landing last);
    *   - after materialize: fully published; the leftover staged dir
    *     is consumed exactly like the rename protocol. */
  final class ClaimAfterWriteLog(store: ClaimStore) extends CommitLog {
    /** Test seam: invoked between winning the claim and materializing
      * the generation dir — the spec's kill point. */
    @volatile var beforeMaterialize: () => Unit = () => ()

    override def publish(f: FileSystem, root: String, target: Long,
        staged: Path): Boolean = {
      val key = s"${norm(root)}#$target"
      store.get(key) match {
        case Some(src) =>
          // an earlier winner holds this id: finish its publish if it
          // crashed mid-materialize, then report the lost race so the
          // caller re-reads the (now advanced) state
          recover(f, root, target, src)
          return false
        case None => ()
      }
      // 1. durable content first, under a name no other writer shares
      val pub = new Path(s"$root/_pub-$target-" +
        java.util.UUID.randomUUID().toString.take(8))
      copyDir(f, staged, pub)
      // 2. the claim names the content
      if (!store.putIfAbsent(key, pub.toString)) {
        f.delete(pub, true) // ours never got claimed — plain garbage
        store.get(key).foreach(src => recover(f, root, target, src))
        return false
      }
      beforeMaterialize()
      // 3. readers' view; any successor can redo this from the claim
      materialize(f, new Path(Snapshots.genDir(root, target)), pub)
      f.delete(staged, true)
      true
    }

    /** Complete any claimed-but-unmaterialized generation under `root`
      * at `target` — the explicit recovery entry point (the implicit
      * one is every later writer's lost claim). True = something was
      * materialized. */
    def recoverClaimed(f: FileSystem, root: String, target: Long): Boolean =
      store.get(s"${norm(root)}#$target").exists(src =>
        recover(f, root, target, src))

    private def recover(f: FileSystem, root: String, target: Long,
        src: String): Boolean = {
      val dst = new Path(Snapshots.genDir(root, target))
      if (f.exists(new Path(dst, Snapshots.markerName))) return false
      materialize(f, dst, new Path(src))
      true
    }

    /** Byte-copy `pub` → `dst` with the commit marker LAST (readers
      * resolve by the marker, so the dir is complete before it
      * appears). Idempotent: concurrent recoverers copy the same
      * immutable claimed bytes with overwrite. */
    private def materialize(f: FileSystem, dst: Path, pub: Path): Unit = {
      f.mkdirs(dst)
      val conf = f.getConf
      f.listStatus(pub).sortBy(st =>
        if (st.getPath.getName == Snapshots.markerName) 1 else 0)
        .foreach(st => org.apache.hadoop.fs.FileUtil.copy(f, st.getPath,
          f, new Path(dst, st.getPath.getName), false, true, conf))
    }

    private def copyDir(f: FileSystem, src: Path, dst: Path): Unit = {
      f.mkdirs(dst)
      val conf = f.getConf
      f.listStatus(src).foreach(st =>
        org.apache.hadoop.fs.FileUtil.copy(f, st.getPath, f,
          new Path(dst, st.getPath.getName), false, true, conf))
    }
  }

  /** The external compare-and-set the claim-after-write log fences
    * through — one record per (root, generation). Implement over any
    * store with a conditional write (DynamoDB `attribute_not_exists`,
    * S3 `If-None-Match`, a SQL unique key); [[InMemoryClaimStore]] is
    * the in-process stand-in the specs race through. */
  trait ClaimStore {
    /** True iff THIS caller created the record — the atomic claim. */
    def putIfAbsent(key: String, value: String): Boolean
    def get(key: String): Option[String]
  }

  final class InMemoryClaimStore extends ClaimStore {
    private val m =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    override def putIfAbsent(key: String, value: String): Boolean =
      m.putIfAbsent(key, value) == null
    override def get(key: String): Option[String] = Option(m.get(key))
  }
}
