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
  *     half-claimed id (the rename is all-or-nothing). A conditional-
  *     put log CAN crash between claim and content copy; production
  *     implementations carry claim fencing/TTL or claim-after-write —
  *     the same recovery trade every external-log table format
  *     documents. */
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

  /** Route every root AT or UNDER `rootPrefix` through `log`. The
    * match is SEGMENT-aware (prefix equal, or followed by '/'), never
    * raw startsWith: registering "/lake/t1" must not capture
    * "/lake/t10", and a trailing-slash registration must still cover
    * the root spelled without one — a miss here silently falls back to
    * the rename protocol on a store where rename is not atomic. */
  def register(rootPrefix: String, log: CommitLog): Unit =
    registry.put(norm(rootPrefix), log)

  def unregister(rootPrefix: String): Unit = registry.remove(norm(rootPrefix))

  /** The log that owns `root`: the longest registered segment-prefix
    * match, or the rename default. */
  def forRoot(root: String): CommitLog = {
    val r = norm(root)
    var best: Option[(String, CommitLog)] = None
    registry.forEach { (p, l) =>
      if ((r == p || r.startsWith(p + "/")) &&
        best.forall(_._1.length < p.length))
        best = Some(p -> l)
    }
    best.map(_._2).getOrElse(Rename)
  }
}
