package graft.ops

import org.apache.spark.storage.StorageLevel

/** The storage level every `localCheckpoint` in the engine uses.
  *
  * `localCheckpoint` trades fault-tolerance for speed: it truncates
  * lineage and keeps the blocks on executors, so losing the executor
  * loses the frame UNRECOVERABLY (Spark raises
  * `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`). That failure mode is invisible
  * in single-JVM `local[n]` — the first multi-JVM run
  * (`local-cluster[2,4,4096]`, round 12) hit it immediately when an
  * OOM-killed executor took the n-gram shingle frame's blocks with it.
  * On a 1000-executor cluster, executor loss is ROUTINE (spot
  * reclamation, OOM, decommission), so every pinned frame carries 2×
  * replication: any single executor's death leaves a live replica, and
  * the disk tier keeps the memory cost evictable. The cost is one extra
  * copy of frames that are by design small relative to the corpus
  * (signatures, codebooks, candidate lists) — cheap insurance against
  * recomputing a truncated lineage that no longer exists.
  */
object Pin {
  val Level: StorageLevel = StorageLevel.MEMORY_AND_DISK_2
}
