package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Compaction, IncrementalPostings, IncrementalSrpIndex, Snapshots}

/** Compaction of the batch=N appender indexes: the rewrite must be
  * invisible to every consumer (same logical relation, same query
  * results) while collapsing the per-micro-batch file fan-out back to
  * the batch build's shape — and the stream must be able to keep
  * appending afterwards. The publish is a single atomic marker-file
  * create ([[graft.streaming.Snapshots]]): readers resolve to the
  * newest COMMITTED generation, a half-written generation is invisible,
  * and the predecessor tree survives until the next commit. */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def rows(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("term"), col("doc_id"), col("tf")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def parquetFiles(root: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new java.io.File(root))
  }

  test("postings compaction preserves results, collapses per-batch files, and ingest continues") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-post") + "/index"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[IdxDoc].collect()
    val waves = docs.groupBy(_.doc_id % 4).toSeq.sortBy(_._1).map(_._2)
    waves.zipWithIndex.foreach { case (wave, i) =>
      IncrementalPostings.appendBatch(root, partitions = 4)(wave.toSeq.toDF(), i.toLong)
    }
    val before = rows(IncrementalPostings.read(spark, root))
    val filesBefore = parquetFiles(root).size
    val kwBefore = IncrementalPostings.keywordSearch(spark, root, Seq("spark", "merge"))
      .collect().map(_.toSeq).toSeq

    Compaction.compactPostings(spark, root, partitions = 4)

    // results identical through the same read path
    assert(rows(IncrementalPostings.read(spark, root)) === before)
    assert(IncrementalPostings.keywordSearch(spark, root, Seq("spark", "merge"))
      .collect().map(_.toSeq).toSeq === kwBefore)
    // physical shape: one batch=<maxId> dir, batch-build file count
    // (4 waves × 4 partitions → 4 partitions)
    assert(Compaction.batchIds(spark, root) === Seq(3L),
      "compacted relation must live under the newest committed batch id")
    val resolved = Snapshots.resolve(spark, root)
    assert(resolved === Snapshots.genDir(root, 1L),
      "first compaction must publish gen=1")
    val filesAfter = parquetFiles(resolved).size
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file fan-out ($filesBefore -> $filesAfter)")
    assert(filesAfter <= 4, s"expected <=4 term-clustered files, got $filesAfter")
    // the PREDECESSOR tree (the pre-gen batch dirs) is retained for
    // in-flight readers — a reader that resolved just before the commit
    // still reads a complete snapshot
    assert(rows(spark.read.parquet(root + "/batch=0")).nonEmpty,
      "predecessor snapshot must survive the first compaction")
    // the stream keeps appending after compaction — and the appended
    // batch is visible through the same read
    IncrementalPostings.appendBatch(root)(Seq(IdxDoc(900001L, "zqx zqx")).toDF(), 4L)
    assert(rows(IncrementalPostings.read(spark, root)) ===
      before + (("zqx", 900001L, 2L)))

    // second compaction: publishes gen=2 atomically, sweeps the pre-gen
    // layout (now two generations old), retains gen=1
    Compaction.compactPostings(spark, root, partitions = 4)
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 2L))
    assert(rows(IncrementalPostings.read(spark, root)) ===
      before + (("zqx", 900001L, 2L)))
    assert(!new java.io.File(root + "/batch=0").exists,
      "pre-gen layout must be swept once two committed generations exist")
    assert(new java.io.File(Snapshots.genDir(root, 1L)).exists,
      "immediate predecessor generation must be retained")
  }

  test("a half-written (uncommitted) generation is invisible to readers and recovered by the next compaction") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-crash") + "/index"
    IncrementalPostings.appendBatch(root, partitions = 2)(
      Seq(IdxDoc(1L, "alpha beta"), IdxDoc(2L, "beta gamma")).toDF(), 0L)
    val before = rows(IncrementalPostings.read(spark, root))

    // simulate a compaction that crashed before the marker: data fully
    // written under gen=1, no _COMMITTED
    Seq(IdxDoc(99L, "bogus crash leftovers")).toDF()
      .write.parquet(Snapshots.genDir(root, 1L) + "/batch=0")
    assert(Snapshots.resolve(spark, root) === root,
      "uncommitted generation must not become visible")
    assert(rows(IncrementalPostings.read(spark, root)) === before,
      "readers must keep seeing the old snapshot after a crashed compaction")

    // the next compaction skips the dead id, writes gen=2, and commits
    Compaction.compactPostings(spark, root, partitions = 2)
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 2L))
    assert(rows(IncrementalPostings.read(spark, root)) === before)
  }

  test("time travel: readAt serves the predecessor snapshot byte-stable while the new generation serves") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-timetravel") + "/index"
    IncrementalPostings.appendBatch(root, partitions = 2)(
      Seq(IdxDoc(1L, "alpha beta"), IdxDoc(2L, "beta gamma")).toDF(), 0L)
    // no generation yet: time-travel catalog is empty, readAt fails loudly
    assert(Snapshots.generations(spark, root) === Seq.empty)
    val e0 = intercept[IllegalArgumentException](
      Snapshots.readAt(spark, root, 1L))
    assert(e0.getMessage.contains("none"), e0.getMessage)

    Compaction.compactPostings(spark, root, partitions = 2)
    IncrementalPostings.appendBatch(root)(Seq(IdxDoc(7L, "delta")).toDF(), 1L)
    // gen 1 is the LIVE appender target until superseded: its
    // time-travel content is the state at the moment gen 2 commits
    val gen1Final = rows(spark.read.parquet(Snapshots.resolve(spark, root)))
    Compaction.compactPostings(spark, root, partitions = 2)

    // catalog: both commits visible; current resolve = gen 2
    assert(Snapshots.generations(spark, root) === Seq(1L, 2L))
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 2L))
    // the superseded generation is frozen: appends now land in gen 2 and
    // must not leak into it — the audit query "what did the warehouse
    // say before the latest compaction"
    IncrementalPostings.appendBatch(root)(
      Seq(IdxDoc(8L, "omega")).toDF(), 2L)
    assert(rows(Snapshots.readAt(spark, root, 1L)) === gen1Final)
    assert(gen1Final.contains(("delta", 7L, 1L)),
      "pre-supersede append is part of gen 1's frozen state")
    assert(rows(Snapshots.readAt(spark, root, 2L)) ===
      gen1Final + (("omega", 8L, 1L)))
    // retention stays bounded: a third commit sweeps gen 1, and readAt
    // then refuses it BY NAME instead of returning a partial tree
    Compaction.compactPostings(spark, root, partitions = 2)
    assert(Snapshots.generations(spark, root) === Seq(2L, 3L))
    val e2 = intercept[IllegalArgumentException](
      Snapshots.readAt(spark, root, 1L))
    assert(e2.getMessage.contains("2, 3"), e2.getMessage)
    // an UNCOMMITTED generation is not travelable (half-written tree)
    Seq(IdxDoc(99L, "crash junk")).toDF()
      .write.parquet(Snapshots.genDir(root, 9L) + "/batch=0")
    val e1 = intercept[IllegalArgumentException](
      Snapshots.readAt(spark, root, 9L))
    assert(e1.getMessage.contains("not committed") &&
      e1.getMessage.contains("2, 3"), e1.getMessage)
  }

  test("cadence: shouldCompact fires at the append-debt threshold and maintenance compacts exactly the due indexes") {
    import spark.implicits._
    val hot = TestSpark.tempDir("compact-cadence") + "/hot"
    val cold = TestSpark.tempDir("compact-cadence") + "/cold"
    IncrementalPostings.appendBatch(cold, partitions = 2)(
      Seq(IdxDoc(1L, "cold index")).toDF(), 0L)
    // drive appends until the trigger fires: debt counts appends since
    // the layout was last restored, so it must fire at maxBatches+1
    val maxBatches = 3
    var batch = 0L
    while (!Compaction.shouldCompact(spark, hot, maxBatches)) {
      IncrementalPostings.appendBatch(hot, partitions = 2)(
        Seq(IdxDoc(100L + batch, s"hot wave$batch term$batch")).toDF(), batch)
      batch += 1
    }
    assert(batch === maxBatches + 1,
      s"trigger must fire exactly when debt exceeds $maxBatches")
    val before = rows(IncrementalPostings.read(spark, hot))
    val coldBefore = rows(IncrementalPostings.read(spark, cold))

    Compaction.Maintenance.register(hot,
      s => Compaction.compactPostings(s, hot, partitions = 2))
    Compaction.Maintenance.register(cold,
      s => Compaction.compactPostings(s, cold, partitions = 2))
    try {
      val ran = Compaction.Maintenance.runDue(spark, maxBatches).toMap
      assert(ran === Map(hot -> true, cold -> false),
        "maintenance must compact exactly the indexes whose debt crossed")
      // compaction restored the measured metric: debt back to 1, results
      // identical, the trigger disarmed
      assert(Compaction.appendDebt(spark, hot) === 1)
      assert(!Compaction.shouldCompact(spark, hot, maxBatches))
      assert(rows(IncrementalPostings.read(spark, hot)) === before)
      assert(rows(IncrementalPostings.read(spark, cold)) === coldBefore)
      // and the stream keeps appending on the restored layout
      IncrementalPostings.appendBatch(hot)(
        Seq(IdxDoc(999L, "post maintenance")).toDF(), batch)
      assert(Compaction.appendDebt(spark, hot) === 2)
    } finally {
      Compaction.Maintenance.deregister(hot)
      Compaction.Maintenance.deregister(cold)
    }
  }

  test("time travel by timestamp: resolveAsOf picks the newest commit at-or-before; retention knob honored") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-asof") + "/index"
    // three generations with INJECTED commit times (1s, 2s, 3s) — the
    // injectable ts is what keeps this deterministic
    for (g <- 1L to 3L) {
      Seq(IdxDoc(g, s"gen$g content")).toDF()
        .write.parquet(Snapshots.genDir(root, g) + "/batch=0")
      Snapshots.commit(spark, root, g, commitTsMillis = g * 1000L)
    }
    assert(Snapshots.generationsWithTimes(spark, root) ===
      Seq(1L -> 1000L, 2L -> 2000L, 3L -> 3000L))
    // as-of resolution: newest commit at-or-before the instant
    assert(Snapshots.resolveAsOf(spark, root, 1000L) === Snapshots.genDir(root, 1L))
    assert(Snapshots.resolveAsOf(spark, root, 1999L) === Snapshots.genDir(root, 1L))
    assert(Snapshots.resolveAsOf(spark, root, 2000L) === Snapshots.genDir(root, 2L))
    assert(Snapshots.resolveAsOf(spark, root, 999999L) === Snapshots.genDir(root, 3L))
    // before the first commit: refused loudly, naming the window
    val e = intercept[IllegalArgumentException](
      Snapshots.resolveAsOf(spark, root, 999L))
    assert(e.getMessage.contains("gen 1 @ 1000"), e.getMessage)
    // equal-instant commits (burst maintenance) tie-break to the NEWER
    // generation — serving the superseded state would be a wrong answer
    val tied = TestSpark.tempDir("compact-asof-tie") + "/index"
    for (g <- 1L to 2L) {
      Seq(IdxDoc(g, s"gen$g")).toDF()
        .write.parquet(Snapshots.genDir(tied, g) + "/batch=0")
      Snapshots.commit(spark, tied, g, commitTsMillis = 5000L)
    }
    assert(Snapshots.resolveAsOf(spark, tied, 5000L)
      === Snapshots.genDir(tied, 2L),
      "same-millisecond commits must resolve to the newest generation")
    // the read face returns the right snapshot's content
    assert(Snapshots.readAsOf(spark, root, 2500L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq === Seq(2L))
    // retention knob: a 2-deep window keeps all three; the default (1)
    // sweeps gen 1; zero predecessors leaves only current
    Snapshots.sweep(spark, root, retainPredecessors = 2)
    assert(Snapshots.generations(spark, root) === Seq(1L, 2L, 3L))
    Snapshots.sweep(spark, root)
    assert(Snapshots.generations(spark, root) === Seq(2L, 3L))
    Snapshots.sweep(spark, root, retainPredecessors = 0)
    assert(Snapshots.generations(spark, root) === Seq(3L))
    // round-11 markers had an empty body: commitTime falls back to the
    // marker file's mtime, so old roots stay as-of-resolvable
    val legacyRoot = TestSpark.tempDir("compact-asof-legacy") + "/index"
    Seq(IdxDoc(1L, "legacy")).toDF()
      .write.parquet(Snapshots.genDir(legacyRoot, 1L) + "/batch=0")
    val marker = new org.apache.hadoop.fs.Path(
      Snapshots.genDir(legacyRoot, 1L), "_COMMITTED")
    val f = marker.getFileSystem(spark.sessionState.newHadoopConf())
    f.create(marker, false).close() // empty body, r11 format
    val t = Snapshots.commitTime(spark, legacyRoot, 1L)
    assert(t.exists(_ > 0L), s"legacy marker must fall back to mtime, got $t")
    assert(Snapshots.resolveAsOf(spark, legacyRoot, System.currentTimeMillis() + 60000)
      === Snapshots.genDir(legacyRoot, 1L))
  }

  test("replay fence: a post-compaction replay of a folded batch id " +
      "no-ops instead of overwriting the folded base; new ids land") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-fence") + "/idx"
    (0L to 3L).foreach(i =>
      Compaction.appendBatch(Seq((i, s"v$i")).toDF("k", "v"), root, i))
    Compaction.compact(spark, root) { (df, out) =>
      df.coalesce(1).write.parquet(out)
    }
    def state(): Set[(Long, String)] =
      spark.read.parquet(Snapshots.resolve(spark, root)).drop("batch")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val folded = state()
    assert(folded === (0L to 3L).map(i => (i, s"v$i")).toSet)
    assert(Compaction.compactedThrough(spark, root) === 3L)
    // the crash shape: the stream replays batch 3 (it wrote the data,
    // never checkpointed, and maintenance folded it meanwhile) — the
    // replay must NO-OP, not replace the entire folded relation with
    // one micro-batch
    Compaction.appendBatch(Seq((3L, "v3")).toDF("k", "v"), root, 3L)
    assert(state() === folded, "a folded batch id must never overwrite")
    // genuinely new batches land normally above the fence
    Compaction.appendBatch(Seq((4L, "v4")).toDF("k", "v"), root, 4L)
    assert(state() === folded + ((4L, "v4")))
    // the fence rides generations: a SECOND compaction folds 0..4
    Compaction.compact(spark, root) { (df, out) =>
      df.coalesce(1).write.parquet(out)
    }
    assert(Compaction.compactedThrough(spark, root) === 4L)
    Compaction.appendBatch(Seq((4L, "ghost")).toDF("k", "v"), root, 4L)
    assert(state() === folded + ((4L, "v4")))
  }

  test("maintenance sweep: one root's failing compaction does not starve " +
      "the roots after it; the failure still surfaces") {
    import spark.implicits._
    import graft.streaming.Compaction.Maintenance
    val bad = TestSpark.tempDir("maint-bad") + "/idx"
    val good = TestSpark.tempDir("maint-good") + "/idx"
    (0L to 9L).foreach { i =>
      Compaction.appendBatch(Seq((i, i)).toDF("k", "v"), good, i)
    }
    try {
      Maintenance.register(bad,
        _ => throw new RuntimeException("boom"), _ => true)
      Maintenance.register(good, s =>
        Compaction.compact(s, good)((df, out) =>
          df.coalesce(1).write.parquet(out)))
      val e = intercept[RuntimeException](
        Maintenance.runDue(spark, maxBatches = 8))
      assert(e.getMessage.contains(bad), e.getMessage)
      // the root AFTER the failing one was still visited and compacted
      assert(Snapshots.currentGen(spark, good).contains(1L),
        "the good root must compact despite the head-of-line failure")
    } finally {
      Maintenance.deregister(bad)
      Maintenance.deregister(good)
    }
  }

  test("committing the same generation twice fails loudly (single-compactor contract)") {
    import spark.implicits._
    val root = TestSpark.tempDir("compact-double-commit") + "/index"
    Seq(IdxDoc(1L, "alpha")).toDF()
      .write.parquet(Snapshots.genDir(root, 1L) + "/batch=0")
    Snapshots.commit(spark, root, 1L)
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 1L))
    // a second committer of the same generation violates the contract;
    // on local/HDFS create(overwrite=false) makes the violation throw
    // rather than silently republish (on S3A the caller-side exclusion
    // is the only guard — see the Snapshots.commit doc)
    intercept[java.io.IOException] {
      Snapshots.commit(spark, root, 1L)
    }
    assert(Snapshots.resolve(spark, root) === Snapshots.genDir(root, 1L),
      "the committed snapshot must be unaffected by the failed double commit")
  }

  test("SRP compaction keeps probe results and the bucket partition column") {
    val root = TestSpark.tempDir("compact-srp") + "/index"
    val emb = Tables.embeddings(spark, dir)
    val waves = Seq(
      emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    waves.zipWithIndex.foreach { case (w, i) =>
      IncrementalSrpIndex.appendBatch(root)(w, i.toLong)
    }
    val before = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .collect().map(_.toSeq).toSeq
    Compaction.compactSrp(spark, root)
    val after = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .collect().map(_.toSeq).toSeq
    assert(after === before, "probe results must not see the compaction")
    // the probe still prunes on bucket as a PARTITION filter
    val plan = IncrementalSrpIndex.annKnn(spark, root, dir, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("bucket#"), "bucket no longer a partition column:\n" + plan)
  }

  test("compacting an empty root fails loudly") {
    val root = TestSpark.tempDir("compact-empty") + "/index"
    intercept[IllegalArgumentException] {
      Compaction.compactPostings(spark, root)
    }
  }

  test("epoch discovery ignores junk directories instead of aborting") {
    import spark.implicits._
    val root = TestSpark.tempDir("epochs-junk") + "/index"
    IncrementalPostings.appendBatch(root, partitions = 2)(
      Seq(IdxDoc(1L, "alpha beta")).toDF(), 3L)
    // a killed writer's leftovers and other non-numeric junk
    assert(new java.io.File(root, "batch=4.tmp").mkdirs())
    assert(new java.io.File(root, "batch=garbage").mkdirs())
    assert(new java.io.File(root, "unrelated").mkdirs())
    assert(Compaction.batchIds(spark, root) === Seq(3L))
  }

  test("appendBatch default shuffle width is capped, not the session's full width") {
    import spark.implicits._
    val root = TestSpark.tempDir("append-cap") + "/index"
    val wide = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(wide)
    try {
      spark.conf.set(wide, "64")
      val docs = (1L to 200L).map(i => IdxDoc(i, s"tok$i alpha beta gamma"))
      IncrementalPostings.appendBatch(root)(docs.toDF(), 0L)
      val files = parquetFiles(root).size
      assert(files <= 8,
        s"default append must write <=8 files under a 64-wide session, got $files")
    } finally spark.conf.set(wide, old)
  }
}
