package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** Copy-on-write MERGE INTO over the manifest-based snapshot table:
  * net-effect correctness, file-level pruning (untouched files carried
  * by REFERENCE), time travel through the inherited generation
  * protocol, reference-counted sweep, crash-orphan collection. */
class MergeTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-merge-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  test("merge applies updates, deletes, inserts; result equals the logical net effect") {
    val root = freshRoot("net")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val changes = Seq(
      ("u", 1L, 7L, 700L, "upd"),   // update k=7
      ("d", 1L, 13L, 0L, ""),       // delete k=13
      ("c", 1L, 200L, 42L, "new"),  // insert k=200
      ("d", 1L, 999L, 0L, "")       // delete of a key that never existed
    ).toDF("op", "seq", "k", "v", "tag")
    MergeTable.merge(spark, root, changes, "k", commitTsMillis = 20L)
    val got = MergeTable.read(spark, root).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expected = ((0L until 100L).filter(_ != 13L).map {
      case 7L => (7L, 700L, "upd")
      case k  => (k, k * 10, "base")
    } :+ (200L, 42L, "new")).sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("intra-batch conflicts resolve last-wins by seq") {
    val root = freshRoot("lastwins")
    MergeTable.create(spark, root, baseDf(10), "k", commitTsMillis = 10L)
    val changes = Seq(
      ("u", 1L, 3L, 111L, "first"),
      ("u", 3L, 3L, 333L, "third"),
      ("u", 2L, 3L, 222L, "second"),
      ("u", 1L, 4L, 444L, "upd"),
      ("d", 2L, 4L, 0L, "")          // update then delete: net = delete
    ).toDF("op", "seq", "k", "v", "tag")
    MergeTable.merge(spark, root, changes, "k", commitTsMillis = 20L)
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK(3L) === ((333L, "third")))
    assert(!byK.contains(4L))
  }

  test("file-level pruning: a narrow merge rewrites only overlapping files; the rest carry by reference") {
    val root = freshRoot("prune")
    // 8 range-disjoint files over 0..799
    MergeTable.create(spark, root, baseDf(800), "k", nFiles = 8,
      commitTsMillis = 10L)
    val before = MergeTable.currentManifest(spark, root)
    assert(before.size >= 4, s"want several files, got ${before.size}")
    // touch exactly one key — only the file whose range holds it rewrites
    val changes = Seq(("u", 1L, 5L, 5000L, "hot"))
      .toDF("op", "seq", "k", "v", "tag")
    val (touched, carried) = MergeTable.merge(spark, root, changes, "k",
      nFiles = 1, commitTsMillis = 20L)
    assert(touched === 1, s"one file should be touched, got $touched")
    assert(carried === before.size - 1)
    val after = MergeTable.currentManifest(spark, root)
    // the carried entries are the SAME file names — referenced, not copied
    val beforeNames = before.map(_.name).toSet
    val afterNames = after.map(_.name).toSet
    assert((afterNames intersect beforeNames).size === carried)
    // and the data still reads back complete + updated
    val got = MergeTable.read(spark, root)
    assert(got.count() === 800L)
    assert(got.where(col("k") === 5L).head().getLong(1) === 5000L)
  }

  test("point/range lookup scans only the manifest-pruned files, through DVs") {
    val root = freshRoot("point")
    MergeTable.create(spark, root, baseDf(800), "k", nFiles = 8,
      commitTsMillis = 10L)
    val files = MergeTable.currentManifest(spark, root)
    assert(files.size >= 4)
    // a point probe touches exactly the files whose range covers the key
    val pruned = MergeTable.prunedEntries(spark, root, 5L, 5L)
    assert(pruned.nonEmpty && pruned.size < files.size,
      s"point probe should prune: ${pruned.size} of ${files.size}")
    val got = MergeTable.readWhereKey(spark, root, 5L, 5L).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((5L, 50L)))
    // range probe ≡ full-read filter
    val range = MergeTable.readWhereKey(spark, root, 100L, 260L)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(range === (100L to 260L).toSeq)
    // a MOR delete must not resurrect in a pruned read
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 5L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    assert(MergeTable.readWhereKey(spark, root, 5L, 5L).isEmpty,
      "DV-deleted row resurrected in a pruned read")
    // outside every file's range: empty, in the table's schema
    val none = MergeTable.readWhereKey(spark, root, 10000L, 10001L)
    assert(none.isEmpty && none.columns.toSeq === Seq("k", "v", "tag"))
  }

  test("column stats: non-key predicates prune files; stats carry across " +
      "COW/MOR generations; unknown columns never prune") {
    val root = freshRoot("cstat")
    // v = k*10 is key-correlated → per-file v-ranges are narrow
    MergeTable.create(spark, root, baseDf(800), "k", nFiles = 8,
      commitTsMillis = 10L)
    def genDir = graft.streaming.Snapshots.genDir(root,
      graft.streaming.Snapshots.currentGen(spark, root).get)
    val stats0 = MergeTable.colStats(spark, genDir)
    val files0 = MergeTable.currentManifest(spark, root)
    assert(stats0.map(_.col).distinct.sorted === Seq("tag", "v"),
      "integral AND string non-key columns carry ranges (tag embeds)")
    assert(stats0.count(_.col == "v") === files0.size, "one v-range per file")
    // a narrow v-band reads a strict file subset and exactly its rows
    val band = MergeTable.readWhereCol(spark, root, "v", 1000L, 1200L)
    assert(band.orderBy("k").collect().map(_.getLong(0)).toSeq
      === (100L to 120L).toSeq)
    val overlapping = stats0.count(s => s.hi >= 1000L && s.lo <= 1200L)
    assert(overlapping < files0.size,
      s"v-band should prune: $overlapping of ${files0.size}")
    // COW merge: carried files keep their ranges, rewritten get fresh ones
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 5L, -999L, "hot")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    val stats1 = MergeTable.colStats(spark, genDir)
    assert(stats1.count(_.col == "v")
      === MergeTable.currentManifest(spark, root).size)
    assert(stats1.exists(s => s.col == "v" && s.lo === -999L),
      "rewritten file's fresh v-range")
    assert(MergeTable.readWhereCol(spark, root, "v", -999L, -999L)
      .collect().map(_.getLong(0)).toSeq === Seq(5L))
    // MOR merge: every carried file keeps its range; appended adds one
    MergeTable.mergeMor(spark, root,
      Seq(("c", 1L, 900L, 424242L, "new")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 30L)
    val stats2 = MergeTable.colStats(spark, genDir)
    assert(stats2.toSet.intersect(stats1.toSet) === stats1.toSet,
      "MOR must carry every existing range (files are immutable)")
    assert(MergeTable.readWhereCol(spark, root, "v", 424242L, 424242L)
      .collect().map(_.getLong(0)).toSeq === Seq(900L))
    // a column with no recorded stats is unknown: all files read, result
    // still exact (pruning may only skip provably-disjoint files)
    val viaKeyCol = MergeTable.readWhereCol(spark, root, "k", 100L, 120L)
    assert(viaKeyCol.orderBy("k").collect().map(_.getLong(0)).toSeq
      === (100L to 120L).toSeq,
      "key column has no #cstat line — must fall back to reading all files")
  }

  test("time travel reads the pre-merge generation; sweep GCs unreferenced files only") {
    val root = freshRoot("travel")
    MergeTable.create(spark, root, baseDf(50), "k", nFiles = 2,
      commitTsMillis = 10L)
    val g1 = Snapshots.currentGen(spark, root).get
    MergeTable.merge(spark, root,
      Seq(("d", 1L, 0L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    // pre-merge state intact through the old manifest
    assert(MergeTable.readAt(spark, root, g1).count() === 50L)
    assert(MergeTable.read(spark, root).count() === 49L)
    // retention 0: only the current gen remains; gen-1-only files die
    val referencedBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    // java.io sees Hadoop's hidden .crc sidecars; compare visible files
    val filesLeft = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_"))
      .toSet
    assert(filesLeft === referencedBefore,
      s"sweep must keep exactly the referenced files: $filesLeft vs $referencedBefore")
    assert(MergeTable.read(spark, root).count() === 49L)
    intercept[IllegalArgumentException] {
      MergeTable.readAt(spark, root, g1)
    }
  }

  test("compact defragments a streamed-into table: files collapse, data and key metadata survive") {
    val root = freshRoot("compact")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    // 6 insert-only merges land beyond every file's key range: nothing
    // is touched, each batch becomes a standalone fragment file
    (1 to 6).foreach { i =>
      MergeTable.merge(spark, root,
        Seq(("c", 1L, 1000L + i, i * 1000L, s"m$i")).toDF("op", "seq", "k", "v", "tag"),
        "k", nFiles = 1, commitTsMillis = 10L + i)
    }
    val fragmented = MergeTable.currentManifest(spark, root).size
    assert(fragmented >= 6, s"expected fragment growth, got $fragmented files")
    val before = MergeTable.read(spark, root).orderBy("k").collect().toSeq
    val rewritten = MergeTable.compact(spark, root, nFiles = 2,
      commitTsMillis = 100L)
    assert(rewritten === fragmented)
    assert(MergeTable.currentManifest(spark, root).size <= 2)
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === before)
    assert(MergeTable.tableKey(spark, root) === "k")
    // a post-compaction merge still works (key metadata carried through)
    MergeTable.merge(spark, root,
      Seq(("d", 1L, 99L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 200L)
    assert(MergeTable.read(spark, root).count() === before.size - 1L)
  }

  test("merge-on-read: zero rewrites (every data file carried by name), " +
      "result ≡ the copy-on-write merge, DVs accumulate across waves") {
    val rootMor = freshRoot("mor")
    val rootCow = freshRoot("cow")
    val changes1 = Seq(
      ("u", 1L, 7L, 700L, "upd"),
      ("d", 1L, 13L, 0L, ""),
      ("c", 1L, 200L, 42L, "new"),
      ("u", 1L, 7L, 770L, "upd2"), // same-key conflict, lower seq loses
      ("u", 2L, 7L, 777L, "upd3")
    ).toDF("op", "seq", "k", "v", "tag")
    Seq(rootMor, rootCow).foreach(r =>
      MergeTable.create(spark, r, baseDf(100), "k", nFiles = 4,
        commitTsMillis = 10L))
    val before = MergeTable.currentManifest(spark, rootMor).map(_.name).toSet
    val (dvRows, appended) =
      MergeTable.mergeMor(spark, rootMor, changes1, "k", commitTsMillis = 20L)
    MergeTable.merge(spark, rootCow, changes1, "k", commitTsMillis = 20L)
    // zero write amplification: every original file still referenced
    val after = MergeTable.currentManifest(spark, rootMor).map(_.name).toSet
    assert(before.subsetOf(after), "MOR must carry every data file by name")
    assert(appended >= 1 && dvRows === 2L, // k=7 and k=13 had live rows
      s"dvRows=$dvRows appended=$appended")
    // identical table state on both paths
    def state(r: String) = MergeTable.read(spark, r).orderBy("k")
      .collect().map(_.toSeq).toSeq
    assert(state(rootMor) === state(rootCow))
    // wave 2: delete the key wave 1 updated (its live row is in an
    // APPENDED file), re-insert the key wave 1 deleted — DV composition
    val changes2 = Seq(
      ("d", 1L, 7L, 0L, ""),
      ("c", 1L, 13L, 130L, "back")
    ).toDF("op", "seq", "k", "v", "tag")
    MergeTable.mergeMor(spark, rootMor, changes2, "k", commitTsMillis = 30L)
    MergeTable.merge(spark, rootCow, changes2, "k", commitTsMillis = 30L)
    assert(state(rootMor) === state(rootCow))
    val byK = MergeTable.read(spark, rootMor).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!byK.contains(7L) && byK(13L) === ((130L, "back")))
    // two generations of DVs referenced
    val genDir = Snapshots.genDir(rootMor,
      Snapshots.currentGen(spark, rootMor).get)
    assert(MergeTable.dvNames(spark, genDir).size === 2)
  }

  test("MOR time travel sees each generation's own DV view; compact " +
      "purges DVs; sweep keeps referenced DV files, GCs retired ones") {
    val root = freshRoot("morpurge")
    MergeTable.create(spark, root, baseDf(40), "k", nFiles = 2,
      commitTsMillis = 10L)
    val g1 = Snapshots.currentGen(spark, root).get
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 5L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    val g2 = Snapshots.currentGen(spark, root).get
    // time travel: pre-delete generation is DV-free and complete
    assert(MergeTable.readAt(spark, root, g1).count() === 40L)
    assert(MergeTable.readAt(spark, root, g2).count() === 39L)
    // sweep with the DV generation retained must NOT GC its DV file
    MergeTable.sweep(spark, root, retainPredecessors = 1)
    assert(MergeTable.read(spark, root).count() === 39L)
    val before = MergeTable.read(spark, root).orderBy("k").collect().toSeq
    // compact = purge: same data, no #dv lines, DV file becomes orphan
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 30L)
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === before)
    val genDir = Snapshots.genDir(root, Snapshots.currentGen(spark, root).get)
    assert(MergeTable.dvNames(spark, genDir).isEmpty, "compact must purge DVs")
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    val filesLeft = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).filterNot(n => n.startsWith(".") || n.startsWith("_"))
    assert(!filesLeft.exists(_.startsWith("dv-")),
      "retired DV files must be GC'd after purge+sweep")
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === before)
  }

  test("change data feed: manifest+DV-delta diff equals the set-diff of " +
      "states across MOR waves, composes across generations, and is " +
      "row-exact (no rewrite noise)") {
    val root = freshRoot("cdf")
    MergeTable.create(spark, root, baseDf(60), "k", nFiles = 3,
      commitTsMillis = 10L)
    val g1 = Snapshots.currentGen(spark, root).get
    MergeTable.mergeMor(spark, root, Seq(
      ("u", 1L, 7L, 700L, "upd"),
      ("d", 1L, 13L, 0L, ""),
      ("c", 1L, 200L, 42L, "new")
    ).toDF("op", "seq", "k", "v", "tag"), "k", commitTsMillis = 20L)
    val g2 = Snapshots.currentGen(spark, root).get
    MergeTable.mergeMor(spark, root, Seq(
      ("d", 1L, 7L, 0L, ""),        // delete the row wave 1 appended
      ("c", 1L, 13L, 130L, "back")  // re-birth of a deleted key
    ).toDF("op", "seq", "k", "v", "tag"), "k", commitTsMillis = 30L)
    val g3 = Snapshots.currentGen(spark, root).get

    def state(g: Long): Set[Seq[Any]] =
      MergeTable.readAt(spark, root, g).collect().map(_.toSeq).toSet
    def feed(a: Long, b: Long): (Set[Seq[Any]], Set[Seq[Any]]) = {
      val rows = MergeTable.changesBetween(spark, root, a, b).collect()
      val (i, d) = rows.partition(_.getAs[String]("change") == "i")
      (i.map(_.toSeq.dropRight(1)).toSet, d.map(_.toSeq.dropRight(1)).toSet)
    }
    // the ground truth: set difference of the two states (valid because
    // the history is pure MOR — no rewrites re-filing unchanged rows)
    for ((a, b) <- Seq((g1, g2), (g2, g3), (g1, g3))) {
      val (ins, del) = feed(a, b)
      assert(ins === (state(b) -- state(a)), s"inserts wrong for $a->$b")
      assert(del === (state(a) -- state(b)), s"deletes wrong for $a->$b")
    }
    // pin the interesting window: wave 2 deleted an APPENDED file's row
    // via DV and re-birthed a DV-deleted key via append
    val (ins23, del23) = feed(g2, g3)
    assert(del23.map(_.head) === Set(7L) && ins23.map(_.head) === Set(13L))
    // empty window: no changes between a generation and itself
    val (insSame, delSame) = feed(g2, g2)
    assert(insSame.isEmpty && delSame.isEmpty)
    // COW wave: the rewrite re-files every unchanged row of the touched
    // file under a new name — the feed must cancel those and report
    // ONLY the real change (row-exactness across rewrites)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 2L, 222L, "cow")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 40L)
    val g4 = Snapshots.currentGen(spark, root).get
    val (ins34, del34) = feed(g3, g4)
    assert(ins34 === Set(Seq(2L, 222L, "cow")), s"rewrite noise: $ins34")
    assert(del34 === Set(Seq(2L, 20L, "base")), s"rewrite noise: $del34")
    assert(ins34 === (state(g4) -- state(g3)) &&
      del34 === (state(g3) -- state(g4)))
    // a compact-only window re-files EVERYTHING and changes NOTHING
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 50L)
    val g5 = Snapshots.currentGen(spark, root).get
    val (ins45, del45) = feed(g4, g5)
    assert(ins45.isEmpty && del45.isEmpty,
      s"compaction must be invisible to the feed: $ins45 / $del45")
  }

  test("bloom registry: equality probes skip files ranges cannot; " +
      "unknown files always read; false positives only widen") {
    val root = freshRoot("bloom")
    // v = (k*7919) % 8000: every file's v-RANGE spans ~the domain, so a
    // point probe prunes nothing by range — the bloom's whole case
    val df = spark.range(4000).select(col("id").as("k"),
      (col("id") * 7919 % 8000).as("v"), lit("x").as("tag"))
    MergeTable.create(spark, root, df, "k", nFiles = 16, commitTsMillis = 10L)
    val files = MergeTable.currentManifest(spark, root)
    val built = MergeTable.ensureBloomIndex(spark, root, "v")
    assert(built === files.size, s"one filter per file, got $built")
    assert(MergeTable.ensureBloomIndex(spark, root, "v") === 0, "idempotent")
    // a present value: found exactly, through a strict candidate subset
    val v = 1234L * 7919L % 8000L
    val cand = MergeTable.bloomRefine(spark, root, files, "v", v)
    assert(cand.nonEmpty && cand.size < files.size,
      s"bloom should prune a point probe: ${cand.size} of ${files.size}")
    val got = MergeTable.readWhere(spark, root, col("v") === v)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1234L))
    // an absent (in-domain) value: blooms empty the candidate set but
    // the result is simply empty — never wrong
    val absent = 4001L * 7919L % 8000L // k stops at 3999; residues unique
    assert(MergeTable.readWhere(spark, root, col("v") === absent).isEmpty)
    // a file appended AFTER the build has no filter: unknown ⇒ read ⇒
    // the new value is found even though no bloom knows it
    MergeTable.mergeMor(spark, root,
      Seq(("c", 1L, 9000L, 4321L, "new")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    assert(MergeTable.readWhere(spark, root, col("v") === 4321L)
      .collect().map(_.getLong(0)).toSeq === Seq(9000L))
    // top-up builds exactly the missing file's filter
    assert(MergeTable.ensureBloomIndex(spark, root, "v") === 1)
    assert(MergeTable.readWhere(spark, root, col("v") === 4321L)
      .collect().map(_.getLong(0)).toSeq === Seq(9000L))
    // sweep rewrites the registry down to live files' rows; probes
    // still exact through the fresh (post-compaction) filters
    MergeTable.compact(spark, root, nFiles = 4, commitTsMillis = 30L)
    MergeTable.ensureBloomIndex(spark, root, "v")
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    val regFiles = spark.read.parquet(s"$root/blooms/v")
      .select(col("file")).distinct().collect().map(_.getString(0)).toSet
    val live = MergeTable.currentManifest(spark, root).map(_.name).toSet
    assert(regFiles.subsetOf(live),
      s"swept registry references dead files: ${regFiles -- live}")
    assert(MergeTable.readWhere(spark, root, col("v") === 4321L)
      .collect().map(_.getLong(0)).toSeq === Seq(9000L))
  }

  test("optimize: bin-packs ONLY small files — big files carried by " +
    "name, DVs respected both ways, no-op when already optimal") {
    val root = freshRoot("optimize")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 2,
      commitTsMillis = 10L)
    // three tiny insert-only merges: classic streaming-sink debris
    Seq((2000L, 20L), (3000L, 30L), (4000L, 40L)).foreach { case (k0, ts) =>
      MergeTable.merge(spark, root,
        spark.range(k0, k0 + 20).select(lit("c").as("op"), lit(1L).as("seq"),
          col("id").as("k"), (col("id") * 10).as("v"), lit("ins").as("tag")),
        "k", nFiles = 1, commitTsMillis = ts)
    }
    // DV on a BIG file (must keep applying) and on a SMALL file (folds)
    MergeTable.deleteWhere(spark, root, col("k") === 500L,
      commitTsMillis = 50L)
    MergeTable.deleteWhere(spark, root, col("k") === 2005L,
      commitTsMillis = 60L)
    val f = new java.io.File(s"$root/files")
    def len(n: String) = new java.io.File(f, n).length()
    val sizes = MergeTable.currentManifest(spark, root)
      .map(e => e.name -> len(e.name)).toMap
    val small = sizes.values.max / 2
    assert(MergeTable.optimizeDebt(spark, root, small) === 3)
    assert(MergeTable.shouldOptimize(spark, root, small, maxSmall = 2))
    val bigNames = sizes.collect { case (n, l) if l >= small => n }.toSet
    val (packed, carried) = MergeTable.optimize(spark, root,
      smallBytes = small, targetBytes = Long.MaxValue, commitTsMillis = 70L)
    assert(packed === 3 && carried === bigNames.size)
    val now = MergeTable.currentManifest(spark, root).map(_.name)
    // every big file carried BY NAME; the three small ones became one
    assert(bigNames.subsetOf(now.toSet))
    assert(now.size === bigNames.size + 1)
    val got = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0)).toSet
    val expected = ((0L until 1000L).toSet - 500L) ++
      ((2000L until 2020L).toSet - 2005L) ++
      (3000L until 3020L).toSet ++ (4000L until 4020L).toSet
    assert(got === expected)
    // the packed output is itself still under the threshold — ONE small
    // file is optimal by definition (the <2 rule prevents thrashing)
    assert(MergeTable.optimizeDebt(spark, root, small) === 1)
    // already optimal: no-op, no new generation
    val gens = Snapshots.generations(spark, root)
    assert(MergeTable.optimize(spark, root, smallBytes = small,
      commitTsMillis = 80L) === ((0, bigNames.size + 1)))
    assert(Snapshots.generations(spark, root) === gens)
    // one maintenance sweep serves lake tables via the custom due-
    // predicate: more debris → due → the sweep optimizes it back
    import graft.streaming.Compaction.Maintenance
    MergeTable.merge(spark, root,
      spark.range(5000, 5010).select(lit("c").as("op"), lit(1L).as("seq"),
        col("id").as("k"), (col("id") * 10).as("v"), lit("ins").as("tag")),
      "k", nFiles = 1, commitTsMillis = 90L)
    Maintenance.register(root,
      s => { MergeTable.optimize(s, root, smallBytes = small,
        commitTsMillis = 100L); () },
      due = s => MergeTable.shouldOptimize(s, root, small, maxSmall = 1))
    try {
      val ran = Maintenance.runDue(spark).toMap
      assert(ran(root) === true)
      assert(!MergeTable.shouldOptimize(spark, root, small, maxSmall = 1))
      assert(Maintenance.runDue(spark).toMap.apply(root) === false)
    } finally Maintenance.deregister(root)
  }

  test("deleteWhere: predicate delete via one DV sidecar — zero " +
    "rewrites, pruned scan, idempotent no-op, time travel intact") {
    val root = freshRoot("delwhere")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val namesBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    // rewriteAboveFraction pinned high: this test is about the DV
    // sidecar MECHANICS, and k<25 matches 100% of the one candidate
    // file — the default dispatch would (correctly) choose the rewrite
    val n = MergeTable.deleteWhere(spark, root,
      col("k") < 25L && col("tag") === "base", commitTsMillis = 20L,
      rewriteAboveFraction = 2.0)
    assert(n === 25L)
    // zero rewrites: every data file carried by name; one DV appeared
    val gd2 = s"$root/_gen-2"
    assert(MergeTable.currentManifest(spark, root).map(_.name).toSet ===
      namesBefore)
    val dvs = MergeTable.dvNames(spark, gd2)
    assert(dvs.size === 1)
    // the DV only names files whose range could hold k<25 (pruned scan)
    val dvFiles = spark.read.parquet(s"$root/files/${dvs.head}")
      .select("file").distinct().collect().map(_.getString(0)).toSet
    val couldMatch = MergeTable.manifest(spark, gd2)
      .filter(_.minKey < 25L).map(_.name).toSet
    assert(dvFiles.subsetOf(couldMatch))
    assert(MergeTable.read(spark, root).count() === 75)
    assert(MergeTable.readAt(spark, root, 1L).count() === 100)
    // a no-match predicate commits NOTHING (no empty generations)
    assert(MergeTable.deleteWhere(spark, root, col("v") === -1L,
      commitTsMillis = 30L) === 0L)
    assert(Snapshots.generations(spark, root) === Seq(1L, 2L))
  }

  test("updateWhere: pruned copy-on-write — matching rows updated, " +
    "carried files by reference, deletes never resurrect, refusals") {
    val root = freshRoot("updwhere")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    // layer a DV first: the update's rewrite must read THROUGH it
    MergeTable.deleteWhere(spark, root, col("k") === 10L,
      commitTsMillis = 20L)
    val namesBefore = MergeTable.currentManifest(spark, root)
      .map(_.name).toSet
    val (touched, carried) = MergeTable.updateWhere(spark, root,
      col("k") < 25L, Map("v" -> (col("v") + 1L), "tag" -> lit("upd")),
      commitTsMillis = 30L)
    assert(touched === 1 && carried === 3) // only the low file rewritten
    val nowNames = MergeTable.currentManifest(spark, root).map(_.name).toSet
    assert((namesBefore -- nowNames).size === 1) // one file replaced
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK(5L) === ((51L, "upd")))
    assert(byK(30L) === ((300L, "base"))) // untouched file, untouched row
    assert(!byK.contains(10L)) // DV'd row did not resurrect updated
    assert(byK.size === 99)
    // refusals by name
    val eKey = intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, root, col("k") === 1L,
        Map("k" -> lit(999L)))
    }
    assert(eKey.getMessage.contains("re-keys"))
    val eCol = intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, root, col("k") === 1L,
        Map("nope" -> lit(1L)))
    }
    assert(eCol.getMessage.contains("nope"))
  }

  test("additive schema evolution: new column appends, old rows and " +
    "untouched files null-fill via the recorded schema; refusals by name") {
    val root = freshRoot("evolve")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val evolving = Seq(
      ("u", 1L, 5L, 555L, "upd", 55L),
      ("c", 1L, 200L, 42L, "new", 77L)
    ).toDF("op", "seq", "k", "v", "tag", "w")
    // refused without the flag, naming the column
    val e1 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root, evolving, "k", commitTsMillis = 20L)
    }
    assert(e1.getMessage.contains("w") &&
      e1.getMessage.contains("evolveSchema"))
    MergeTable.merge(spark, root, evolving, "k", commitTsMillis = 20L,
      evolveSchema = true)
    val got = MergeTable.read(spark, root)
    assert(got.columns.toSeq === Seq("k", "v", "tag", "w"))
    val byK = got.collect().map(r => r.getLong(0) ->
      (r.getLong(1), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(byK(5L) === ((555L, Some(55L))))
    assert(byK(200L) === ((42L, Some(77L))))
    // a row in a file the merge never TOUCHED (k=99 is in the top range
    // file; changes hit low keys + a fresh insert) null-fills w
    assert(byK(99L) === ((990L, None)))
    assert(byK.size === 101)
    // time travel: the pre-evolution generation keeps its own shape
    assert(MergeTable.readAt(spark, root, 1L).columns.toSeq ===
      Seq("k", "v", "tag"))
    // later batches must carry the evolved column (full-payload contract)
    val e2 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root,
        Seq(("u", 1L, 6L, 666L, "x")).toDF("op", "seq", "k", "v", "tag"),
        "k", commitTsMillis = 30L)
    }
    assert(e2.getMessage.contains("lacks table columns: w"))
    // a type conflict on a shared column is refused by name
    val e3 = intercept[IllegalArgumentException] {
      MergeTable.merge(spark, root,
        Seq(("u", 1L, 6L, "oops", "x", 1L))
          .toDF("op", "seq", "k", "v", "tag", "w"),
        "k", commitTsMillis = 30L, evolveSchema = true)
    }
    assert(e3.getMessage.contains("conflict on column 'v'"))
  }

  test("schema evolution through MOR appends; compact folds the evolved " +
    "schema into clean files; stats on the new column serve reads") {
    val root = freshRoot("evolve-mor")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    MergeTable.mergeMor(spark, root,
      Seq(("u", 1L, 10L, 101L, "m", 1000L), ("d", 1L, 20L, 0L, "", 0L))
        .toDF("op", "seq", "k", "v", "tag", "w"),
      "k", commitTsMillis = 20L, evolveSchema = true)
    val got = MergeTable.read(spark, root)
    assert(got.columns.toSeq === Seq("k", "v", "tag", "w"))
    val byK = got.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(byK(10L) === Some(1000L) && !byK.contains(20L) &&
      byK(50L) === None && byK.size === 99)
    // compact folds: every file now physically carries w
    MergeTable.compact(spark, root, nFiles = 3, commitTsMillis = 30L)
    val after = MergeTable.read(spark, root)
    assert(after.columns.toSeq === Seq("k", "v", "tag", "w"))
    assert(after.where(col("w") === 1000L).count() === 1)
    // the evolved column is a first-class pruning citizen post-compact
    val probe = MergeTable.readWhereCol(spark, root, "w", 1000L, 1000L)
      .collect().map(_.getLong(0)).toSeq
    assert(probe === Seq(10L))
  }

  test("optimistic merge: disjoint concurrent writers — loser rebases " +
    "with its staged files spliced in verbatim; state = both change sets") {
    val root = freshRoot("occ-disjoint")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 4,
      commitTsMillis = 10L)
    val aChanges = spark.range(100).select(lit("u").as("op"),
      lit(1L).as("seq"), col("id").as("k"),
      (col("id") * 10 + 1).as("v"), lit("a").as("tag"))
    val bChanges = spark.range(900, 950).select(lit("d").as("op"),
      lit(1L).as("seq"), col("id").as("k"), lit(0L).as("v"),
      lit("").as("tag"))
      .unionByName(spark.range(2000, 2010).select(lit("c").as("op"),
        lit(1L).as("seq"), col("id").as("k"),
        (col("id") * 10).as("v"), lit("b").as("tag")))
    // both writers prepare against the SAME committed snapshot
    val hA = MergeTable.prepareMerge(spark, root, aChanges, "k", nFiles = 2)
    val hB = MergeTable.prepareMerge(spark, root, bChanges, "k", nFiles = 2)
    val a = MergeTable.commitPrepared(spark, root, hA, commitTsMillis = 20L)
    assert(a.path === "clean" && a.attempts === 1)
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    // B's base is stale but its file/key footprint is disjoint from A's
    // commit: manifest-only rebase, staged data files reused VERBATIM
    assert(b.path === "rebased" && b.gen > a.gen)
    val finalNames = MergeTable.currentManifest(spark, root).map(_.name).toSet
    hB.newEntries.foreach(e => assert(finalNames.contains(e.name),
      s"rebase did not reuse staged file ${e.name}"))
    val got = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val expected = ((0L until 1000L).filterNot(k => k >= 900 && k < 950).map {
      case k if k < 100 => k -> ((k * 10 + 1, "a"))
      case k            => k -> ((k * 10, "base"))
    } ++ (2000L until 2010L).map(k => k -> ((k * 10, "b")))).toMap
    assert(got === expected)
  }

  test("optimistic merge: overlapping writers — loser replays against " +
    "the winner's state (serial last-wins); superseded staging deleted") {
    val root = freshRoot("occ-overlap")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    def upd(v: Long) = Seq(("u", 1L, 50L, v, "w")).toDF("op", "seq", "k", "v", "tag")
    val hA = MergeTable.prepareMerge(spark, root, upd(111L), "k", nFiles = 1)
    val hB = MergeTable.prepareMerge(spark, root, upd(222L), "k", nFiles = 1)
    assert(MergeTable.commitPrepared(spark, root, hA,
      commitTsMillis = 20L).path === "clean")
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    // both rewrote the file holding k=50: C1 fires, B recomputes
    assert(b.path === "replayed")
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(50L) === 222L) // B serialized after A
    assert(byK.size === 100)
    // the replay deleted B's superseded first-attempt files
    val f = new java.io.File(s"$root/files")
    val onDisk = f.listFiles().map(_.getName).toSet
    hB.newEntries.foreach(e => assert(!onDisk.contains(e.name),
      s"superseded staged file ${e.name} survived the replay"))
  }

  test("optimistic merge: a deletion vector landed since base targets a " +
    "touched file (C2) — replay; abandoned prepares leave no trace") {
    val root = freshRoot("occ-dv")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    val hB = MergeTable.prepareMerge(spark, root,
      Seq(("u", 1L, 10L, 777L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    // winner: a MOR delete of a DIFFERENT key in the SAME file — file
    // names all carry, so C1 passes; the DV delta is what must conflict
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 20L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    assert(b.path === "replayed")
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(10L) === 777L && !byK.contains(20L) && byK.size === 99)
    // an abandoned prepare: never visible, discarded without residue
    val before = MergeTable.read(spark, root).count()
    val hX = MergeTable.prepareMerge(spark, root,
      Seq(("u", 1L, 0L, 1L, "x")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    assert(MergeTable.read(spark, root).count() === before)
    MergeTable.discardPrepared(spark, root, hX)
    val onDisk = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).toSet
    hX.newEntries.foreach(e => assert(!onDisk.contains(e.name)))
  }

  test("optimistic merge: concurrent inserts of the SAME new key (C3) — " +
    "the loser replays, one row survives with the later value") {
    val root = freshRoot("occ-ins")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    def ins(v: Long) = Seq(("c", 1L, 200L, v, "i")).toDF("op", "seq", "k", "v", "tag")
    val hA = MergeTable.prepareMerge(spark, root, ins(1L), "k", nFiles = 1)
    val hB = MergeTable.prepareMerge(spark, root, ins(2L), "k", nFiles = 1)
    assert(MergeTable.commitPrepared(spark, root, hA,
      commitTsMillis = 20L).path === "clean")
    // B touched NO base file (new key) — without the added-file-vs-
    // envelope rule a rebase would carry BOTH inserts: two rows for 200
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    assert(b.path === "replayed")
    val rows = MergeTable.read(spark, root).where(col("k") === 200L)
      .collect().map(r => r.getLong(1)).toSeq
    assert(rows === Seq(2L))
    assert(MergeTable.read(spark, root).count() === 101)
  }

  test("a delete-everything merge leaves a READABLE empty table; rows " +
    "merge back in; the change feed sees the wipe") {
    val root = freshRoot("wipe")
    MergeTable.create(spark, root, baseDf(10), "k", nFiles = 2,
      commitTsMillis = 10L)
    val wipe = spark.range(10).select(lit("d").as("op"), lit(1L).as("seq"),
      col("id").as("k"), lit(0L).as("v"), lit("").as("tag"))
    MergeTable.merge(spark, root, wipe, "k", commitTsMillis = 20L)
    // empty is a legal, servable state — not a corrupt manifest
    val empty = MergeTable.read(spark, root)
    assert(empty.columns.toSeq === Seq("k", "v", "tag"))
    assert(empty.count() === 0)
    assert(MergeTable.readWhere(spark, root, col("k") === 3L).count() === 0)
    val (ins, del) = {
      val rows = MergeTable.changesBetween(spark, root, 1L, 2L).collect()
      rows.partition(_.getAs[String]("change") == "i")
    }
    assert(ins.isEmpty && del.length === 10)
    // the table is reborn by an ordinary insert merge
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 5L, 50L, "back")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 30L)
    assert(MergeTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((5L, 50L)))
  }

  test("updateWhere refuses a type-drifting assignment (the silent " +
    "widen that would contradict the recorded schema and brick reads)") {
    val root = freshRoot("upd-drift")
    MergeTable.create(spark, root, baseDf(20), "k", nFiles = 2,
      commitTsMillis = 10L)
    val e = intercept[IllegalArgumentException] {
      MergeTable.updateWhere(spark, root, col("k") === 1L,
        Map("v" -> (col("v") * 1.1)))
    }
    assert(e.getMessage.contains("'v'") &&
      e.getMessage.contains("bigint") && e.getMessage.contains("double"))
    // an explicit cast back to the column's type is the sanctioned form
    MergeTable.updateWhere(spark, root, col("k") === 1L,
      Map("v" -> (col("v") * 1.1).cast("long")), commitTsMillis = 20L)
    assert(MergeTable.read(spark, root).where(col("k") === 1L)
      .head().getLong(1) === 11L)
  }

  test("zombie stream writer: a prepared batch fenced mid-commit by a " +
    "newer instance is discarded, never regressing the fence") {
    val root = freshRoot("occ-zombie")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    def upd(k: Long, v: Long) =
      Seq(("u", 1L, k, v, "s")).toDF("op", "seq", "k", "v", "tag")
    // the zombie prepares batch 4 of stream S... and stalls
    val zombie = MergeTable.prepareMerge(spark, root, upd(1L, -4L), "k",
      nFiles = 1).copy(streamBatch = Some("S" -> 4L))
    // the restarted instance applies 4 and 5
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(1L, 44L), "k",
      "S", 4L, commitTsMillis = 20L).isDefined)
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(2L, 55L), "k",
      "S", 5L, commitTsMillis = 30L).isDefined)
    // the zombie wakes up and tries to commit its stale batch 4
    val o = MergeTable.commitPrepared(spark, root, zombie,
      commitTsMillis = 40L)
    assert(o.path === "fenced")
    assert(MergeTable.appliedStreamBatchIds(spark, root) === Map("S" -> 5L))
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(1L) === 44L && byK(2L) === 55L) // nothing regressed
    // a batch-5 replay is still refused (the fence never moved back)
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(2L, -5L), "k",
      "S", 5L).isEmpty)
    // the zombie's staged files were discarded
    val onDisk = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).toSet
    zombie.newEntries.foreach(e => assert(!onDisk.contains(e.name)))
  }

  test("optimistic merge vs concurrent ROLLBACK: a DV removed since " +
    "base (an undelete) on a touched file forces replay, not rebase") {
    val root = freshRoot("occ-undelete")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    // gen 2: MOR-delete k=10 (a DV on the low file)
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 10L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    // writer B prepares against gen 2 (reads the low file THROUGH the
    // DV — its rewrite excludes k=10), touching the same file via k=20
    val hB = MergeTable.prepareMerge(spark, root,
      Seq(("u", 1L, 20L, 2020L, "b")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    // concurrent rollback to gen 1 commits: the DV is dropped, k=10
    // is restored — no DV was ADDED, one was REMOVED
    MergeTable.rollbackTo(spark, root, 1L, commitTsMillis = 30L)
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 40L)
    assert(b.path === "replayed",
      "a removed DV on a touched file must conflict")
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(10L) === 100L, "the rollback's undelete must survive")
    assert(byK(20L) === 2020L)
    assert(byK.size === 100)
  }

  test("mergeAuto: a trickle flips to MOR, a bulk update stays COW — " +
    "decided from manifest row counts alone; both states exact") {
    val root = freshRoot("auto")
    MergeTable.create(spark, root, baseDf(10000), "k", nFiles = 4,
      commitTsMillis = 10L)
    val m0 = MergeTable.genMeta(spark,
      graft.streaming.Snapshots.resolve(spark, root))
    assert(m0.entries.forall(_.rows > 0),
      "every write must stamp record counts")
    assert(m0.entries.map(_.rows).sum === 10000L)
    // TRICKLE: 2 changed rows in one ~2500-row file → amplification
    // ~1250 ≫ 8 → merge-on-read, zero rewrites, a DV appears
    val trickle = Seq(("u", 1L, 5L, 555L, "t"), ("d", 1L, 6L, 0L, ""))
      .toDF("op", "seq", "k", "v", "tag")
    val (p1, dvRows, _) = MergeTable.mergeAuto(spark, root, trickle,
      "k", commitTsMillis = 20L)
    assert(p1 === "mor", "a trickle must take the DV path")
    assert(dvRows === 2L)
    assert(MergeTable.dvNames(spark, graft.streaming.Snapshots
      .resolve(spark, root)).nonEmpty)
    val got1 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1(5L) === 555L && !got1.contains(6L) && got1.size === 9999)
    // BULK: update half of every file → amplification ~2 ≤ 8 → COW
    // k=6 stays excluded: 'u' is an upsert and would resurrect it
    val bulk = baseDf(10000).where(col("k") % 2 === 0 && col("k") =!= 6L)
      .select(lit("u").as("op"), lit(1L).as("seq"), col("k"),
        (col("v") + 1L).as("v"), col("tag"))
    val (p2, rewritten, _) = MergeTable.mergeAuto(spark, root, bulk,
      "k", commitTsMillis = 30L)
    assert(p2 === "cow", "a bulk update must earn its rewrite")
    assert(rewritten > 0L)
    val got2 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(4L) === 41L && got2(5L) === 555L && got2(7L) === 70L &&
      !got2.contains(6L) && got2.size === 9999)
    // the threshold is the knob: forcing it inverts both decisions
    val (p3, _, _) = MergeTable.mergeAuto(spark, root, trickle, "k",
      commitTsMillis = 40L, morAmplificationAbove = Double.MaxValue)
    assert(p3 === "cow")
    val (p4, _, _) = MergeTable.mergeAuto(spark, root, bulk, "k",
      commitTsMillis = 50L, morAmplificationAbove = 0.5)
    assert(p4 === "mor")
  }

  test("STRING-dim clustered compaction: the status dimension becomes " +
    "prunable via its embedded #cstat ranges; key-range layout cannot; " +
    "reads stay exact") {
    val root = freshRoot("strcluster")
    // status cycles through 6 values, uncorrelated with the key — the
    // layout where a key-range file always spans every status
    val statuses = Seq("alpha", "bravo", "carol", "delta", "echo1", "fox")
    val df = spark.range(6000).select(col("id").as("k"),
      element_at(array(statuses.map(lit): _*),
        (col("id") % 6 + 1).cast("int")).as("st"),
      (col("id") * 3).as("v"))
    MergeTable.create(spark, root, df, "k", nFiles = 12,
      commitTsMillis = 10L)
    def stCandidates: Int = {
      val gd = Snapshots.genDir(root, Snapshots.currentGen(spark, root).get)
      val probe = graft.functions.StringPrefix64.embed("carol")
      val ranges = MergeTable.colStats(spark, gd).filter(_.col == "st")
        .map(s => s.file -> s).toMap
      MergeTable.currentManifest(spark, root).count(e =>
        ranges.get(e.name).forall(s => s.hi >= probe && s.lo <= probe))
    }
    val files0 = MergeTable.currentManifest(spark, root).size
    assert(stCandidates === files0,
      "key-range layout: every file must span every status")
    val before = MergeTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    MergeTable.compactZOrder(spark, root, "st", nFiles = 12,
      commitTsMillis = 20L)
    val filesZ = MergeTable.currentManifest(spark, root).size
    assert(stCandidates < filesZ,
      s"string-dim-clustered layout must skip files on a status probe " +
        s"($stCandidates of $filesZ)")
    val after = MergeTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after === before)
    val got = MergeTable.readWhere(spark, root,
      col("k") <= 3000L && col("st") === "carol").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === before.filter(t => t._1 <= 3000L && t._2 == "carol"))
  }

  test("compactHilbert: reads stay exact through the re-cluster; the " +
    "seam-crossing box family opens no more files than the z layout") {
    // uncorrelated 2-d data: key k, dim v a scrambled permutation
    val n = 4096L
    val df = spark.range(n).select(col("id").as("k"),
      ((col("id") * 7919) % n).as("v"), lit("x").as("tag"))
    def build(tag: String)(cluster: (org.apache.spark.sql.SparkSession,
        String, String, Int, Long) => Int): String = {
      val root = freshRoot(tag)
      MergeTable.create(spark, root, df, "k", nFiles = 8, commitTsMillis = 10L)
      cluster(spark, root, "v", 16, 20L)
      root
    }
    val rootZ = build("clust-z")(
      (s, r, d, f, t) => MergeTable.compactZOrder(s, r, d, f, t))
    val rootH = build("clust-h")(
      (s, r, d, f, t) => MergeTable.compactHilbert(s, r, d, f, t))
    // the seam-crossing family: 2-d boxes straddling the power-of-two
    // midlines of the (k, v) domain — exactly where Z's locality dies
    // (adjacent cells across the big seam are curve-distant) and
    // Hilbert's contiguity holds
    val mid = n / 2
    val boxes = Seq(
      (mid - 256L, mid + 256L, 1000L, 1400L),
      (mid - 512L, mid + 512L, mid - 200L, mid + 200L),
      (200L, 600L, mid - 256L, mid + 256L),
      (mid - 128L, mid + 128L, mid - 1024L, mid + 1024L))
    def filesOpened(root: String, b: (Long, Long, Long, Long)): Int = {
      val m = MergeTable.genMeta(spark,
        graft.streaming.Snapshots.resolve(spark, root))
      val cond = df.filter(col("k").between(b._1, b._2) &&
        col("v").between(b._3, b._4)).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.get
      MergeTable.pruneByCondition(spark, root, m, Some(cond)).size
    }
    var zTotal = 0; var hTotal = 0
    boxes.foreach { b =>
      val p = col("k").between(b._1, b._2) && col("v").between(b._3, b._4)
      // exactness on BOTH layouts: clustering never changes a row
      val want = df.filter(p).orderBy("k").collect().map(_.toSeq).toSeq
      assert(MergeTable.readWhere(spark, rootZ, p)
        .orderBy("k").collect().map(_.toSeq).toSeq === want)
      assert(MergeTable.readWhere(spark, rootH, p)
        .orderBy("k").collect().map(_.toSeq).toSeq === want)
      zTotal += filesOpened(rootZ, b)
      hTotal += filesOpened(rootH, b)
    }
    assert(hTotal <= zTotal,
      s"hilbert must open ≤ z files over the seam family: h=$hTotal z=$zTotal")
    assert(hTotal < 4 * 16,
      s"the family must actually prune (h=$hTotal of ${4 * 16})")
  }

  test("string manifest stats: a key-correlated string band prunes a " +
    "strict file subset; probes stay exact; blooms key on the embedding") {
    import graft.functions.StringPrefix64
    // the two embedding faces must agree bit-for-bit, and preserve order
    assert(StringPrefix64.embed("") < StringPrefix64.embed("a"))
    assert(StringPrefix64.embed("a") < StringPrefix64.embed("ab"))
    assert(StringPrefix64.embed("ab") < StringPrefix64.embed("b"))
    assert(StringPrefix64.embed("b0001") < StringPrefix64.embed("b0002"))
    // identical 8-byte prefixes collide (coarse, never wrong)
    assert(StringPrefix64.embed("prefix09_a") === StringPrefix64.embed("prefix09_b"))
    val viaExpr = spark.range(1)
      .select(StringPrefix64.stringPrefix64(lit("b0002"))).head.getLong(0)
    assert(viaExpr === StringPrefix64.embed("b0002"),
      "planner-side and codegen embeddings must agree")

    val root = freshRoot("sstats")
    // band = zero-padded key/100 bucket: key-correlated, so per-file
    // string ranges are narrow — the partition-label/date-string shape
    val df = spark.range(800).select(col("id").as("k"),
      (col("id") * 10).as("v"),
      concat(lit("b"), lpad((col("id") / 100).cast("long").cast("string"),
        3, "0")).as("band"))
    MergeTable.create(spark, root, df, "k", nFiles = 8, commitTsMillis = 10L)
    // a one-bucket string band: strict file subset from #cstat alone
    val m = MergeTable.genMeta(spark,
      graft.streaming.Snapshots.resolve(spark, root))
    def toExpr(frame: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.Column) =
      frame.filter(c).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.get
    val cand = MergeTable.pruneByCondition(spark, root, m,
      Some(toExpr(df, col("band") === "b003")))
    assert(cand.nonEmpty && cand.size < m.entries.size,
      s"string equality should prune: ${cand.size} of ${m.entries.size}")
    // band range: also a strict subset, and the rows are exact
    val got = MergeTable.readWhere(spark, root,
      col("band") >= "b002" && col("band") <= "b004")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (200L until 500L), "string band rows must be exact")
    // strict bounds stay conservative-correct
    assert(MergeTable.readWhere(spark, root, col("band") < "b001")
      .count() === 100L)
    // an UNCORRELATED string column: ranges can't prune an equality,
    // the bloom registry (keyed on the embedding) can
    val root2 = freshRoot("sbloom")
    val df2 = spark.range(400).select(col("id").as("k"),
      concat(lit("u"), ((col("id") * 7919) % 400).cast("string")).as("tag"))
    MergeTable.create(spark, root2, df2, "k", nFiles = 8, commitTsMillis = 10L)
    assert(MergeTable.ensureBloomIndex(spark, root2, "tag") === 8)
    val m2 = MergeTable.genMeta(spark,
      graft.streaming.Snapshots.resolve(spark, root2))
    val probe = "u" + (123L * 7919L % 400L)
    val cand2 = MergeTable.pruneByCondition(spark, root2, m2,
      Some(toExpr(df2, col("tag") === probe)))
    assert(cand2.nonEmpty && cand2.size < m2.entries.size,
      s"string bloom should prune a point probe: ${cand2.size} of 8")
    assert(MergeTable.readWhere(spark, root2, col("tag") === probe)
      .collect().map(_.getLong(0)).toSeq === Seq(123L))
  }

  test("IN-LIST file skipping: a multi-point probe opens the UNION of " +
    "per-point candidate sets (strict subset of the hull's), " +
    "or-of-equalities and a provably-false intersection prune too, " +
    "blooms refine per point, and the SQL path prunes — rows exact") {
    val root = freshRoot("in-prune")
    // v = k*10 is key-correlated: each point's candidate set is ~1 file,
    // while the 3 points' HULL spans nearly the whole table — exactly
    // the case where interval bounds degrade to a full scan and only
    // per-point ∃-semantics skips files
    val df = spark.range(800).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("x").as("tag"))
    MergeTable.create(spark, root, df, "k", nFiles = 8, commitTsMillis = 10L)
    val m = MergeTable.genMeta(spark,
      graft.streaming.Snapshots.resolve(spark, root))
    def toExpr(frame: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.Column) =
      frame.filter(c).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition
      }.get
    def cand(c: org.apache.spark.sql.Column): Int =
      MergeTable.pruneByCondition(spark, root, m, Some(toExpr(df, c))).size
    val hull = cand(col("v").between(500L, 7900L))
    val in3 = cand(col("v").isin(500L, 3500L, 7900L))
    assert(in3 >= 1 && in3 <= 3 && in3 < hull,
      s"IN must open per-point candidates, not the hull: $in3 vs $hull")
    // or-of-equalities on the KEY (manifest entry ranges drive it)
    assert(cand(col("k") === 10L || col("k") === 700L) <= 2)
    // intersecting point conjuncts: provably false opens NOTHING
    assert(cand(col("k").isin(5L) && col("k").isin(6L)) === 0)
    assert(MergeTable.readWhere(spark, root,
      col("k").isin(5L) && col("k").isin(6L)).count() === 0L)
    // rows exact, including a point that exists in no row (55 ∉ 10ℤ)
    assert(MergeTable.readWhere(spark, root,
      col("v").isin(500L, 3500L, 55L)).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(50L, 350L))
    // bloom ∃-refinement on an UNCORRELATED column: every file's range
    // spans the domain, only the per-point bloom can skip — and the
    // probe must open ≤ the sum of the per-point bloom survivor sets
    val root2 = freshRoot("in-bloom")
    val df2 = spark.range(400).select(col("id").as("k"),
      ((col("id") * 7919) % 100000).as("u"))
    MergeTable.create(spark, root2, df2, "k", nFiles = 8, commitTsMillis = 10L)
    assert(MergeTable.ensureBloomIndex(spark, root2, "u") === 8)
    val m2 = MergeTable.genMeta(spark,
      graft.streaming.Snapshots.resolve(spark, root2))
    val p1 = 123L * 7919L % 100000L
    val p2 = 377L * 7919L % 100000L
    val one1 = MergeTable.pruneByCondition(spark, root2, m2,
      Some(toExpr(df2, col("u") === p1))).size
    val one2 = MergeTable.pruneByCondition(spark, root2, m2,
      Some(toExpr(df2, col("u") === p2))).size
    val in2 = MergeTable.pruneByCondition(spark, root2, m2,
      Some(toExpr(df2, col("u").isin(p1, p2)))).size
    assert(one1 < 8 && one2 < 8, "single-point bloom probes must prune")
    assert(in2 <= one1 + one2 && in2 < 8,
      s"IN must open the union of per-point bloom survivors: $in2")
    assert(MergeTable.readWhere(spark, root2, col("u").isin(p1, p2))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(123L, 377L))
    // the SQL path: pushed dataFilters reach pruneByCondition through
    // MergeTableFileIndex — the physical scan opens a strict subset
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "in_prune_t", root)
    def scanFiles(q: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      var n = -1L
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          n = math.max(n, s.metrics("numFiles").value)
        case other => other.children.foreach(walk)
      }
      walk(q.queryExecution.executedPlan); n
    }
    val q = spark.sql(
      "SELECT k, v FROM in_prune_t WHERE v IN (500, 3500, 7900) ORDER BY k")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(50L, 350L, 790L))
    val opened = scanFiles(q)
    assert(opened >= 1 && opened <= 3,
      s"SQL IN must file-skip through the FileIndex: opened $opened of 8")
    // a >10-value list (the optimizer's InSet conversion threshold):
    // the pushed filter arrives as InSet and must still prune
    val vals11 = (500L to 600L by 10L).mkString(", ") // 11 values, 1 file
    val q2 = spark.sql(
      s"SELECT k FROM in_prune_t WHERE v IN ($vals11) ORDER BY k")
    assert(q2.collect().map(_.getLong(0)).toSeq === (50L to 60L))
    val opened2 = scanFiles(q2)
    assert(opened2 >= 1 && opened2 <= 2,
      s"InSet (>10 values) must still prune: opened $opened2 of 8")
  }

  test("STRING IN through SQL text: a 12-value band IN — past the " +
    "optimizer's InSet threshold, so the pushed filter carries raw " +
    "UTF8Strings — prunes through the prefix embedding (strict file " +
    "subset) and returns exact rows") {
    val root = freshRoot("in-str")
    // band is key-correlated (the partition-label shape): 40 bands
    // across 8 key-range files → 5 bands per file
    val df = spark.range(4000).select(col("id").as("k"),
      concat(lit("b"), lpad(expr("id div 100").cast("string"), 4, "0"))
        .as("band"),
      (col("id") * 3).as("v"))
    MergeTable.create(spark, root, df, "k", nFiles = 8, commitTsMillis = 10L)
    graft.plans.SnapshotSqlCatalog.registerMerge(spark, "in_str_t", root)
    def scanFiles(q: org.apache.spark.sql.DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      var n = -1L
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case qs: QueryStageExec => walk(qs.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          n = math.max(n, s.metrics("numFiles").value)
        case other => other.children.foreach(walk)
      }
      walk(q.queryExecution.executedPlan); n
    }
    // 12 literal bands (b0001..b0012) = keys 100..1299, living in 3 of
    // the 8 files; 12 > spark.sql.optimizer.inSetConversionThreshold
    val bands = (1 to 12).map(i => f"'b$i%04d'").mkString(", ")
    val q = spark.sql(
      s"SELECT k FROM in_str_t WHERE band IN ($bands) ORDER BY k")
    assert(q.collect().map(_.getLong(0)).toSeq === (100L until 1300L))
    val opened = scanFiles(q)
    assert(opened >= 1 && opened <= 3,
      s"string InSet must file-skip through the embedding: " +
        s"opened $opened of 8")
    // a band list entirely OUTSIDE the domain opens nothing
    val none = spark.sql("SELECT k FROM in_str_t WHERE band IN (" +
      (90 to 101).map(i => f"'b$i%04d'").mkString(", ") + ")")
    assert(none.isEmpty && scanFiles(none) <= 0,
      "an out-of-domain string IN must prune every file planner-side")
    graft.plans.SnapshotSqlCatalog.unregisterMerge(spark, "in_str_t")
  }

  test("bloom build edge cases: an all-NULL probe column builds nothing " +
    "(no NPE); files predating an evolved column read through the " +
    "recorded schema and index cleanly") {
    val root = freshRoot("bloom-edge")
    // nv is NULL in every row of the initial files
    MergeTable.create(spark, root,
      baseDf(100).withColumn("nv", lit(null).cast("long")), "k",
      nFiles = 4, commitTsMillis = 10L)
    // all-NULL column: no NPE; every file gets a NULL-bloom row
    // ("provably contains nothing") so the build is idempotent
    assert(MergeTable.ensureBloomIndex(spark, root, "nv") === 4)
    assert(MergeTable.ensureBloomIndex(spark, root, "nv") === 0, "idempotent")
    // an equality probe on the all-null column prunes EVERY file —
    // exactly correct, since no row can match
    assert(MergeTable.bloomRefine(spark, root,
      MergeTable.currentManifest(spark, root), "nv", 42L).isEmpty)
    assert(MergeTable.readWhere(spark, root, col("nv") === 42L).isEmpty)
    assert(MergeTable.readWhere(spark, root, col("nv").isNull).count() === 100L)
    // evolve: v2 arrives on a NEW file only; the 4 original files
    // predate it — the build must resolve them through the recorded
    // #schema (null-filling v2), not an arbitrary footer
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 500L, 5000L, "e", 42L, 7L))
        .toDF("op", "seq", "k", "v", "tag", "nv", "v2"),
      "k", nFiles = 1, commitTsMillis = 20L, evolveSchema = true)
    val files = MergeTable.currentManifest(spark, root).size
    assert(MergeTable.ensureBloomIndex(spark, root, "v2") === files,
      "old files must read through the recorded schema, not a random footer")
    assert(MergeTable.readWhere(spark, root, col("v2") === 7L)
      .collect().map(_.getLong(0)).toSeq === Seq(500L))
    // only the NEW file lacked an nv filter; it carries the one value
    assert(MergeTable.ensureBloomIndex(spark, root, "nv") === 1)
    assert(MergeTable.readWhere(spark, root, col("nv") === 42L)
      .collect().map(_.getLong(0)).toSeq === Seq(500L))
    // LEGACY registry (pre-embedding, no _FORMAT marker): probes must
    // NOT prune through it — its keys could false-skip — and the next
    // ensure drops and rebuilds the whole registry under the marker
    val marker = new java.io.File(s"$root/blooms/v2/_FORMAT")
    assert(marker.exists, "every build must stamp the format marker")
    assert(marker.delete())
    val cur = MergeTable.currentManifest(spark, root)
    assert(MergeTable.bloomRefine(spark, root, cur, "v2", 7L)
      === cur, "a marker-less registry must never prune")
    assert(MergeTable.readWhere(spark, root, col("v2") === 7L)
      .collect().map(_.getLong(0)).toSeq === Seq(500L))
    assert(MergeTable.ensureBloomIndex(spark, root, "v2") === cur.size,
      "a legacy registry is dropped and fully rebuilt")
    assert(MergeTable.bloomRefine(spark, root, cur, "v2", 7L).size
      < cur.size, "the rebuilt registry prunes again")
  }

  test("bloom registry sweep crash recovery: an orphaned -sweep-tmp is " +
    "restored when the registry is gone, dropped when it survived") {
    val root = freshRoot("bloom-crash")
    MergeTable.create(spark, root, baseDf(100)
      .withColumn("v2", (col("k") * 7919) % 8000), "k", nFiles = 4,
      commitTsMillis = 10L)
    MergeTable.ensureBloomIndex(spark, root, "v2")
    val probe = MergeTable.readWhere(spark, root, col("v2") === 7919L)
      .collect().map(_.getLong(0)).toSeq
    assert(probe === Seq(1L))
    val blooms = new java.io.File(s"$root/blooms")
    val real = new java.io.File(blooms, "v2")
    val tmp = new java.io.File(blooms, "v2-sweep-tmp")
    // crash shape 1: delete happened, rename didn't — tmp IS the registry
    assert(real.renameTo(tmp))
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    assert(real.exists && !tmp.exists, "recovery must finish the rename")
    assert(MergeTable.readWhere(spark, root, col("v2") === 7919L)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // crash shape 2: stale tmp next to a live registry — dropped
    tmp.mkdirs()
    MergeTable.sweep(spark, root, retainPredecessors = 0)
    assert(real.exists && !tmp.exists, "stale tmp must be dropped")
  }

  test("sweep age guard: young unreferenced files (an in-flight prepare) " +
    "survive; old crash orphans still collected") {
    val root = freshRoot("sweep-age")
    MergeTable.create(spark, root, baseDf(50), "k", nFiles = 2,
      commitTsMillis = 10L)
    // an in-flight optimistic prepare: staged files, not yet committed
    val h = MergeTable.prepareMerge(spark, root,
      Seq(("u", 1L, 5L, 555L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    // a CRASH orphan from long ago: same unreferenced shape, old mtime
    val filesDir = new java.io.File(s"$root/files")
    val orphan = new java.io.File(filesDir, "f-9-0-deadbeef.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    assert(orphan.setLastModified(System.currentTimeMillis() - 86400000L))
    MergeTable.sweep(spark, root, retainPredecessors = 0,
      minOrphanAgeMillis = 3600000L)
    val onDisk = filesDir.listFiles().map(_.getName).toSet
    assert(!onDisk.contains(orphan.getName), "old crash orphan must go")
    h.newEntries.foreach(e => assert(onDisk.contains(e.name),
      "the age guard must protect in-flight staged files"))
    // the prepare is still committable after the sweep
    val o = MergeTable.commitPrepared(spark, root, h, commitTsMillis = 20L)
    assert(o.path === "clean")
    assert(MergeTable.read(spark, root).where(col("k") === 5L)
      .head().getLong(1) === 555L)
  }

  test("AGE-BASED retention (injected time): generations inside the " +
    "window survive plus the boundary generation; every in-window " +
    "as-of stays answerable; a pre-window as-of names the time floor") {
    val root = freshRoot("sweep-time")
    MergeTable.create(spark, root, baseDf(50), "k", nFiles = 2,
      commitTsMillis = 1000L)
    def upd(k: Long, v: Long, ts: Long) = MergeTable.merge(spark, root,
      Seq(("u", 1L, k, v, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = ts)
    upd(1L, 11L, 2000L)
    upd(2L, 22L, 3000L)
    upd(3L, 33L, 4000L)
    val gens = Snapshots.generations(spark, root).sorted
    assert(gens.size === 4)
    // window [2500, 4000]: in-window = gens @3000/@4000; BOUNDARY =
    // gen @2000 (it was "the table" when the window opened — dropping
    // it would unanswer "as of 2600"); gen @1000 sweeps. retain = 0
    // isolates the age policy from the count policy.
    MergeTable.sweep(spark, root, retainPredecessors = 0,
      olderThanMillis = 1500L, nowMillis = 4000L)
    assert(Snapshots.generations(spark, root).sorted === gens.drop(1))
    // any instant inside the window resolves: the floor lands on the
    // boundary generation, newer instants on the in-window commits
    assert(Snapshots.resolveAsOf(spark, root, 2600L) ===
      Snapshots.genDir(root, gens(1)))
    assert(Snapshots.resolveAsOf(spark, root, 3500L) ===
      Snapshots.genDir(root, gens(2)))
    val byK = MergeTable.readAt(spark, root, gens(1)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(1L) === 11L && byK(2L) === 20L && byK.size === 50)
    // pre-window refuses loudly, naming the retained floor
    val boom = intercept[Exception] {
      Snapshots.resolveAsOf(spark, root, 1500L)
    }
    assert(boom.getMessage.contains(s"gen ${gens(1)} @ 2000"),
      s"refusal must name the time floor: ${boom.getMessage}")
    // the two policies UNION: a count floor keeps a generation the age
    // window alone would sweep
    upd(4L, 44L, 5000L)
    MergeTable.sweep(spark, root, retainPredecessors = 3,
      olderThanMillis = 500L, nowMillis = 5000L)
    assert(Snapshots.generations(spark, root).size === 4,
      "count retention must still floor the age policy")
  }

  test("idempotence fences survive maintenance and DML: replays are " +
    "refused after compact/delete/update; per-stream fences independent") {
    val root = freshRoot("fences")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    def upd(k: Long, v: Long) =
      Seq(("u", 1L, k, v, "w")).toDF("op", "seq", "k", "v", "tag")
    assert(MergeTable.mergeExactlyOnce(spark, root, upd(1L, 111L), "k",
      batchId = 5L, commitTsMillis = 20L).isDefined)
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(2L, 222L), "k",
      "src-a", 3L, commitTsMillis = 30L).isDefined)
    // maintenance + DML commits in between — each must CARRY the fences
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 40L)
    MergeTable.deleteWhere(spark, root, col("k") === 50L,
      commitTsMillis = 50L)
    MergeTable.updateWhere(spark, root, col("k") === 60L,
      Map("v" -> lit(606L)), commitTsMillis = 60L)
    assert(MergeTable.appliedBatchId(spark, root) === Some(5L))
    assert(MergeTable.appliedStreamBatchIds(spark, root) ===
      Map("src-a" -> 3L))
    // the restart-replays: both fences still standing
    val gens = Snapshots.generations(spark, root)
    assert(MergeTable.mergeExactlyOnce(spark, root, upd(1L, -1L), "k",
      batchId = 5L).isEmpty)
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(2L, -1L), "k",
      "src-a", 3L).isEmpty)
    assert(Snapshots.generations(spark, root) === gens)
    // higher ids admit; other streams have their own fence
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(3L, 333L), "k",
      "src-a", 4L, commitTsMillis = 70L).isDefined)
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(4L, 444L), "k",
      "src-b", 1L, commitTsMillis = 80L).isDefined)
    assert(MergeTable.appliedStreamBatchIds(spark, root) ===
      Map("src-a" -> 4L, "src-b" -> 1L))
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(1L) === 111L && byK(2L) === 222L && byK(3L) === 333L &&
      byK(4L) === 444L && byK(60L) === 606L && !byK.contains(50L))
    // DESCRIBE HISTORY at a SWEPT left edge: two maintenance commits,
    // then retention drops everything older — the carried fences must
    // show as null batch ids, never be misattributed to the compacts
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 90L)
    MergeTable.compact(spark, root, nFiles = 2, commitTsMillis = 100L)
    MergeTable.sweep(spark, root, retainPredecessors = 1)
    val hist = MergeTable.history(spark, root).collect().map(r =>
      if (r.isNullAt(4)) None else Some(r.getLong(4)))
    assert(hist.length === 2 && hist.forall(_.isEmpty),
      s"carried fence misattributed at the left edge: ${hist.mkString(",")}")
    // the fences themselves survive the sweep
    assert(MergeTable.appliedBatchId(spark, root) === Some(5L))
    assert(MergeTable.appliedStreamBatchIds(spark, root) ===
      Map("src-a" -> 4L, "src-b" -> 1L))
  }

  test("optimistic merge under REAL thread contention: every writer's " +
    "commit lands exactly once, state = all change sets applied") {
    val root = freshRoot("occ-threads")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    // 4 writers × 3 sequential merges each, on disjoint key bands —
    // racing prepare/claim/commit for real (same-target rename races,
    // concurrent staging, concurrent manifest reads all exercised)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[
      graft.streaming.MergeTable.OccOutcome]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try {
          (0 until 3).foreach { i =>
            val lo = w * 1000L + i * 100L
            val changes = spark.range(lo, lo + 100L).select(
              lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
              (col("id") + 7L).as("v"), lit(s"w$w").as("tag"))
            val h = MergeTable.prepareMerge(spark, root, changes, "k",
              nFiles = 1)
            outcomes.add(MergeTable.commitPrepared(spark, root, h,
              commitTsMillis = 100L + w * 10 + i, maxAttempts = 30))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val all = outcomes.asScala.toSeq
    assert(all.size === 12)
    // every commit claimed a DISTINCT generation (no lost updates)
    assert(all.map(_.gen).distinct.size === 12)
    assert(Snapshots.generations(spark, root).size === 13)
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK.size === 4000)
    (0 until 4).foreach { w =>
      (w * 1000L until w * 1000L + 300L).foreach { k =>
        assert(byK(k) === ((k + 7L, s"w$w")), s"lost update at k=$k")
      }
    }
    assert(byK(3500L) === ((35000L, "base"))) // untouched band untouched
  }

  test("optimistic MOR staging: a disjoint concurrent commit REBASES " +
    "the DV-append handle — sidecar + appends spliced verbatim, " +
    "nothing rewritten") {
    val root = freshRoot("occ-mor-rebase")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 4,
      commitTsMillis = 10L)
    // A: COW on the low band; B: MOR on the high band — disjoint files
    val hA = MergeTable.prepareMerge(spark, root,
      spark.range(100).select(lit("u").as("op"), lit(1L).as("seq"),
        col("id").as("k"), (col("id") * 10 + 1).as("v"), lit("a").as("tag")),
      "k", nFiles = 2)
    val hB = MergeTable.prepareMergeMor(spark, root,
      Seq(("u", 1L, 900L, 9001L, "b"), ("u", 1L, 901L, 9011L, "b"),
        ("d", 1L, 950L, 0L, ""), ("c", 1L, 2000L, 7L, "b"))
        .toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    assert(hB.morStaged && hB.dvName.isDefined && hB.mode === "mor")
    assert(MergeTable.commitPrepared(spark, root, hA,
      commitTsMillis = 20L).path === "clean")
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    assert(b.path === "rebased")
    // the staged sidecar and appends carried into the final manifest
    // by NAME — a MOR rebase is manifest-only arbitration
    val m = MergeTable.genMeta(spark, Snapshots.genDir(root, b.gen))
    assert(m.dvs.contains(hB.dvName.get))
    hB.newEntries.foreach(e => assert(m.entries.exists(_.name == e.name),
      s"rebase did not reuse staged MOR file ${e.name}"))
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK(0L) === ((1L, "a")) && byK(99L) === ((991L, "a")))
    assert(byK(900L) === ((9001L, "b")) && byK(901L) === ((9011L, "b")))
    assert(!byK.contains(950L) && byK(2000L) === ((7L, "b")))
    assert(byK.size === 1000)
  }

  test("optimistic MOR staging: a conflicting rewrite REPLAYS the MOR " +
    "handle (superseded sidecar deleted); serial last-wins holds") {
    val root = freshRoot("occ-mor-replay")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    val hB = MergeTable.prepareMergeMor(spark, root,
      Seq(("u", 1L, 50L, 222L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1)
    val dvBefore = hB.dvName.get
    // winner COW-rewrites the file holding k=50 → C1 invalidates the
    // staged (file,pos) set
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 50L, 111L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    val b = MergeTable.commitPrepared(spark, root, hB, commitTsMillis = 30L)
    assert(b.path === "replayed")
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(50L) === 222L && byK.size === 100)
    // the superseded first-attempt sidecar is gone from disk
    val onDisk = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).toSet
    assert(!onDisk.contains(dvBefore),
      s"superseded staged DV $dvBefore survived the replay")
    hB.newEntries.foreach(e => assert(!onDisk.contains(e.name)))
  }

  test("optimistic auto pricing: trickle stages MOR, bulk stages COW, " +
    "and a replay RE-PRICES against the winner's state") {
    val root = freshRoot("occ-auto")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    // trickle: 4 keys spread one-per-file-ish → amplification ≫ 8
    val trickle = Seq(0L, 1000L, 2000L, 3000L).map(k =>
      ("u", 1L, k, k + 5L, "t")).toDF("op", "seq", "k", "v", "tag")
    val hT = MergeTable.prepareMergeAuto(spark, root, trickle, "k",
      nFiles = 1)
    assert(hT.morStaged && hT.mode === "auto",
      "sparse trickle must price MERGE-ON-READ")
    // bulk: a dense band → amplification ~1
    val bulk = spark.range(500, 1000).select(lit("u").as("op"),
      lit(1L).as("seq"), col("id").as("k"), (col("id") + 9L).as("v"),
      lit("bulk").as("tag"))
    val hBk = MergeTable.prepareMergeAuto(spark, root, bulk, "k",
      nFiles = 2)
    assert(!hBk.morStaged, "dense bulk must price COPY-ON-WRITE")
    // commit bulk first: trickle's touched set includes the rewritten
    // band file → C1 → replay, re-priced (still MOR: amplification is
    // layout-driven, not luck) against the winner's state
    assert(MergeTable.commitPrepared(spark, root, hBk,
      commitTsMillis = 20L).path === "clean")
    val t = MergeTable.commitPrepared(spark, root, hT, commitTsMillis = 30L)
    assert(t.path === "replayed")
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK(0L) === ((5L, "t")) && byK(1000L) === ((1005L, "t")))
    assert(byK(2000L) === ((2005L, "t")) && byK(3000L) === ((3005L, "t")))
    assert(byK(700L) === ((709L, "bulk")) && byK.size === 4000)
    // the replayed trickle really landed as MOR: its DV rides the
    // final manifest (nothing after it folded DVs away)
    assert(MergeTable.genMeta(spark,
      Snapshots.genDir(root, t.gen)).dvs.nonEmpty)
  }

  test("optimistic merge under REAL thread contention with MIXED " +
    "COW/MOR stagings: every commit lands exactly once, no lost updates") {
    val root = freshRoot("occ-threads-mixed")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[
      graft.streaming.MergeTable.OccOutcome]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // writers 0-1 stage copy-on-write, writers 2-3 merge-on-read —
    // racing rename claims, manifest reads, and the two SPLICE shapes
    // against each other on one table
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try {
          (0 until 2).foreach { i =>
            val lo = w * 1000L + i * 100L
            val changes = spark.range(lo, lo + 100L).select(
              lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
              (col("id") + 7L).as("v"), lit(s"w$w").as("tag"))
            val h =
              if (w < 2) MergeTable.prepareMerge(spark, root, changes,
                "k", nFiles = 1)
              else MergeTable.prepareMergeMor(spark, root, changes, "k",
                nFiles = 1)
            outcomes.add(MergeTable.commitPrepared(spark, root, h,
              commitTsMillis = 100L + w * 10 + i, maxAttempts = 30))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    import scala.jdk.CollectionConverters._
    val all = outcomes.asScala.toSeq
    assert(all.size === 8)
    assert(all.map(_.gen).distinct.size === 8)
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK.size === 4000)
    (0 until 4).foreach { w =>
      (w * 1000L until w * 1000L + 200L).foreach { k =>
        assert(byK(k) === ((k + 7L, s"w$w")), s"lost update at k=$k")
      }
    }
    assert(byK(3500L) === ((35000L, "base")))
  }

  test("OPTIMIZE stages optimistically: disjoint concurrent ingest " +
    "REBASES the pack manifest-only; a winner touching a packed file " +
    "REPLAYS the selection; a racing optimizer turns the replay into " +
    "a committed-nothing noop") {
    val root = freshRoot("occ-optimize")
    MergeTable.create(spark, root, baseDf(2000), "k", nFiles = 2,
      commitTsMillis = 10L)
    // three single-row inserts beyond every file range → KB-scale files
    Seq(5000L, 6000L, 7000L).zipWithIndex.foreach { case (k, i) =>
      MergeTable.merge(spark, root,
        Seq(("c", 1L, k, k + 1L, "w")).toDF("op", "seq", "k", "v", "tag"),
        "k", nFiles = 1, commitTsMillis = 20L + i)
    }
    val sizes = MergeTable.currentManifest(spark, root).map(e =>
      e.name -> new java.io.File(s"$root/files", e.name).length()).toMap
    val cut = sizes.values.max / 2
    val smallNames = sizes.collect { case (n, len) if len < cut => n }.toSet
    assert(smallNames.size >= 3)

    // 1. REBASE: pack staged, then a winner COW-merges inside a BIG
    //    (unpacked) file — no packed input touched, the commit splices
    //    the pack into the winner's manifest without re-reading a byte
    val h1 = MergeTable.prepareOptimize(spark, root, smallBytes = cut,
      targetBytes = Long.MaxValue).get
    assert(h1.mode === "optimize" && h1.touchedNames === smallNames)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 100L, 9999L, "win")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 40L)
    val o1 = MergeTable.commitPrepared(spark, root, h1, commitTsMillis = 50L)
    assert(o1.path === "rebased")
    val m1 = MergeTable.genMeta(spark, Snapshots.genDir(root, o1.gen))
    h1.newEntries.foreach(e => assert(m1.entries.exists(_.name == e.name),
      s"rebase did not reuse packed file ${e.name}"))
    assert(smallNames.forall(n => !m1.entries.exists(_.name == n)),
      "a packed small file survived the splice")
    val byK1 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK1(100L) === 9999L && byK1(5000L) === 5001L &&
      byK1(6000L) === 6001L && byK1(7000L) === 7001L &&
      byK1.size === 2003)

    // 2. REPLAY: stage a pack, then a winner rewrites one of ITS inputs
    //    (C1) — the selection re-runs against the winner's state and the
    //    superseded staged files are gone from disk
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 8000L, 8001L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 60L)
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 9000L, 9001L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 61L)
    val h2 = MergeTable.prepareOptimize(spark, root, smallBytes = cut,
      targetBytes = Long.MaxValue).get
    val victim = h2.touchedNames.head
    // the winner UPDATES a key inside a packed input → that file is
    // rewritten away → C1
    val vEntry = MergeTable.currentManifest(spark, root)
      .find(_.name == victim).get
    MergeTable.merge(spark, root,
      Seq(("u", 1L, vEntry.minKey, -5L, "win2"))
        .toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 62L)
    val o2 = MergeTable.commitPrepared(spark, root, h2, commitTsMillis = 63L)
    assert(o2.path === "replayed")
    val onDisk = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).toSet
    h2.newEntries.foreach(e => assert(!onDisk.contains(e.name),
      s"superseded staged pack ${e.name} survived the replay"))
    val byK2 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK2(vEntry.minKey) === -5L, "replayed pack lost the winner's update")

    // 3. NOOP: stage a pack, let a racing optimizer commit the same
    //    selection first — the replay finds nothing to pack and commits
    //    NOTHING (generation count unchanged by the noop)
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 9500L, 1L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 70L)
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 9600L, 1L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 71L)
    val h3 = MergeTable.prepareOptimize(spark, root, smallBytes = cut,
      targetBytes = Long.MaxValue).get
    val (packedN, _) = MergeTable.optimize(spark, root, smallBytes = cut,
      targetBytes = Long.MaxValue, commitTsMillis = 72L)
    assert(packedN >= 2)
    val gensBefore = Snapshots.generations(spark, root)
    val stateBefore = MergeTable.read(spark, root).collect()
      .map(_.toSeq).toSet
    val o3 = MergeTable.commitPrepared(spark, root, h3, commitTsMillis = 73L)
    assert(o3.path === "noop")
    assert(Snapshots.generations(spark, root) === gensBefore)
    assert(MergeTable.read(spark, root).collect()
      .map(_.toSeq).toSet === stateBefore)
    val onDisk3 = new java.io.File(s"$root/files").listFiles()
      .map(_.getName).toSet
    h3.newEntries.foreach(e => assert(!onDisk3.contains(e.name),
      s"noop left staged pack ${e.name} on disk"))
  }

  test("MAINTENANCE races ingest: live occ-auto writers vs concurrent " +
    "optimize and age-guarded vacuum — zero lost updates, maintenance " +
    "committed, no staged file collected mid-prepare") {
    val root = freshRoot("occ-maint-race")
    MergeTable.create(spark, root, baseDf(4000), "k", nFiles = 8,
      commitTsMillis = 10L)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val optimized = new java.util.concurrent.atomic.AtomicInteger(0)
    val writers = (0 until 3).map { w =>
      new Thread(() => {
        try {
          (0 until 3).foreach { i =>
            val lo = w * 1000L + i * 100L
            val changes = spark.range(lo, lo + 100L).select(
              lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
              (col("id") + 7L).as("v"), lit(s"w$w").as("tag"))
            MergeTable.mergeOccExactlyOnce(spark, root, changes, "k",
              streamId = s"pipe-$w", batchId = i.toLong,
              commitTsMillis = 100L + w * 10 + i, maxAttempts = 40,
              mode = "auto")
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    val maintenance = new Thread(() => {
      try {
        (0 until 3).foreach { _ =>
          // pack whatever small files the trickle writers have minted so
          // far; racing their commits exercises rebase/replay/noop live
          val (p, _) = MergeTable.optimize(spark, root,
            smallBytes = 256L << 10, targetBytes = Long.MaxValue,
            commitTsMillis = 200L, maxAttempts = 40)
          if (p > 0) optimized.incrementAndGet()
          // age-guarded GC alongside the writers: a 10-minute orphan
          // floor means no in-flight prepare's staged files are touched;
          // deep generation retention keeps every writer's base readable
          MergeTable.sweep(spark, root, retainPredecessors = 100,
            minOrphanAgeMillis = 10L * 60L * 1000L)
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    (writers :+ maintenance).foreach(_.start())
    (writers :+ maintenance).foreach(_.join(300000))
    assert(errors.isEmpty, s"racer failed: ${errors.peek()}")
    // every writer's last batch applied exactly once — no lost updates
    // through any rebase/replay the maintenance forced
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(byK.size === 4000)
    (0 until 3).foreach { w =>
      (w * 1000L until w * 1000L + 300L).foreach { k =>
        assert(byK(k) === ((k + 7L, s"w$w")), s"lost update at k=$k")
      }
    }
    assert(byK(3500L) === ((35000L, "base")))
    assert(MergeTable.appliedStreamBatchIds(spark, root) ===
      Map("pipe-0" -> 2L, "pipe-1" -> 2L, "pipe-2" -> 2L))
    // at least one optimize truly committed against the moving table
    assert(optimized.get() >= 1, "no optimize ever packed anything")
  }

  test("PREDICATE DML as optimistic writers: a conflict replay " +
    "RE-EVALUATES the predicate against the winner's state (a row " +
    "updated out of the predicate survives; a row updated into it is " +
    "caught); disjoint ingest rebases; updates compose") {
    val root = freshRoot("occ-predicate")
    MergeTable.create(spark, root, baseDf(1000), "k", nFiles = 4,
      commitTsMillis = 10L)
    // 1. the LOST-UPDATE trap a frozen change set would spring: stage a
    //    delete matching k=50 (v=500); a winner updates k=50 to v=555
    //    (no longer matching) before the commit — the replay must
    //    re-evaluate and DELETE NOTHING
    val hD = MergeTable.prepareDeleteWhere(spark, root,
      col("v") === 500L).get
    assert(hD.mode === "delete-where" && hD.reprepare.nonEmpty)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 50L, 555L, "win")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    val oD = MergeTable.commitPrepared(spark, root, hD, commitTsMillis = 30L)
    assert(oD.path === "noop",
      s"nothing matches after the winner's update: ${oD.path}")
    val byK1 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK1(50L) === 555L && byK1.size === 1000,
      "a frozen change set would have deleted the winner's update")
    // 2. the inverse: stage a delete matching {k=70}; the winner then
    //    updates k=60 INTO the predicate — the replayed delete must
    //    catch BOTH (predicate re-evaluated, not key-frozen)
    val hD2 = MergeTable.prepareDeleteWhere(spark, root,
      col("v").isin(700L, 777L)).get // only k=70 (v=700) matches yet
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 60L, 777L, "win")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 40L)
    val oD2 = MergeTable.commitPrepared(spark, root, hD2,
      commitTsMillis = 50L)
    assert(oD2.path === "replayed")
    val byK2 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byK2.contains(60L) && !byK2.contains(70L) && byK2.size === 998,
      "the re-evaluated predicate must catch the winner's new match")
    // 2b. WRITE-SKEW guard: the winner INSERTS a brand-new matching
    //     row into a DISJOINT file (no staged candidate touched, key
    //     outside every staged envelope) — the predicate handle's FULL
    //     conflict envelope still forces the re-evaluating replay, so
    //     the delete catches the insert too (a key-span envelope would
    //     have rebased and silently left it)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 80L, 888L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 52L)
    val hD3 = MergeTable.prepareDeleteWhere(spark, root,
      col("v") === 888L).get // matches only k=80 at prepare
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 5000L, 888L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 54L)
    val oD3 = MergeTable.commitPrepared(spark, root, hD3,
      commitTsMillis = 56L)
    assert(oD3.path === "replayed",
      s"a disjoint new match must conflict a predicate writer: ${oD3.path}")
    val byK2b = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byK2b.contains(80L) && !byK2b.contains(5000L) &&
      byK2b.size === 997,
      "the re-evaluated delete must catch the concurrently-inserted match")
    // 3. update composition: occ update (+1 on a band) racing a
    //    disjoint occ-auto merge — rebase, both effects present
    val hU = MergeTable.prepareUpdateWhere(spark, root,
      col("k").between(100L, 109L), Map("v" -> (col("v") + 1L))).get
    assert(hU.mode === "update-where")
    MergeTable.mergeOccExactlyOnce(spark, root,
      Seq(("u", 1L, 900L, 9009L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", "pipe-p", 0L, commitTsMillis = 60L, mode = "auto")
    val oU = MergeTable.commitPrepared(spark, root, hU, commitTsMillis = 70L)
    assert(oU.path === "rebased" || oU.path === "replayed")
    val byK3 = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 109L).foreach(k => assert(byK3(k) === k * 10 + 1,
      s"update lost at k=$k"))
    assert(byK3(900L) === 9009L, "concurrent merge lost")
    // 4. assignment composition under REPLAY: stage v+1 on k=200, a
    //    winner sets k=200 to 7000 first — the re-evaluated assignment
    //    applies to the WINNER's value (7001), never the stale base
    val hU2 = MergeTable.prepareUpdateWhere(spark, root,
      col("k") === 200L, Map("v" -> (col("v") + 1L))).get
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 200L, 7000L, "win")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 80L)
    val oU2 = MergeTable.commitPrepared(spark, root, hU2,
      commitTsMillis = 90L)
    assert(oU2.path === "replayed")
    assert(MergeTable.read(spark, root).where(col("k") === 200L)
      .head.getLong(1) === 7001L,
      "the replayed assignment must compose with the winner's value")
    // 5. no-match faces commit nothing
    assert(MergeTable.deleteWhereOcc(spark, root,
      col("v") === -12345L).isEmpty)
    assert(MergeTable.updateWhereOcc(spark, root, col("v") === -12345L,
      Map("v" -> lit(0L))).isEmpty)
  }

  test("mergeOccExactlyOnce honors mode: a mor-staged stream batch is " +
    "fenced on replay exactly like the cow path") {
    val root = freshRoot("occ-mor-fence")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 2,
      commitTsMillis = 10L)
    def upd(v: Long) =
      Seq(("u", 1L, 10L, v, "s")).toDF("op", "seq", "k", "v", "tag")
    val o = MergeTable.mergeOccExactlyOnce(spark, root, upd(111L), "k",
      "pipe", 0L, commitTsMillis = 20L, mode = "mor")
    assert(o.isDefined)
    assert(MergeTable.genMeta(spark,
      Snapshots.genDir(root, o.get.gen)).dvs.nonEmpty)
    // a replay of batch 0 is refused BEFORE any staging
    assert(MergeTable.mergeOccExactlyOnce(spark, root, upd(999L), "k",
      "pipe", 0L, commitTsMillis = 30L, mode = "mor").isEmpty)
    val byK = MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK(10L) === 111L)
    intercept[IllegalArgumentException] {
      MergeTable.mergeOccExactlyOnce(spark, root, upd(1L), "k",
        "pipe", 1L, mode = "upsert")
    }
  }

  test("z-order compaction makes an UNCORRELATED dimension prunable; " +
      "key-range layout cannot; both read exactly") {
    val root = freshRoot("zcompact")
    // v = (k * 7919) % 8000: spans the full domain in any key range —
    // the layout where key-range files give v-predicates nothing
    val df = spark.range(4000).select(col("id").as("k"),
      (col("id") * 7919 % 8000).as("v"), lit("x").as("tag"))
    MergeTable.create(spark, root, df, "k", nFiles = 16, commitTsMillis = 10L)
    def genDir = Snapshots.genDir(root,
      Snapshots.currentGen(spark, root).get)
    def vCandidates(lo: Long, hi: Long): Int = {
      val ranges = MergeTable.colStats(spark, genDir).filter(_.col == "v")
        .map(s => s.file -> s).toMap
      MergeTable.currentManifest(spark, root)
        .count(e => ranges.get(e.name).forall(s => s.hi >= lo && s.lo <= hi))
    }
    val files0 = MergeTable.currentManifest(spark, root).size
    assert(vCandidates(100L, 300L) === files0,
      "uncorrelated v should be unprunable under the key-range layout")
    val want = MergeTable.read(spark, root)
      .filter(col("v").between(100L, 300L))
      .orderBy("k").collect().map(_.toSeq).toSeq
    // a DV first, so the clustered rewrite must fold it (purge check)
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 17L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    MergeTable.compactZOrder(spark, root, "v", nFiles = 16,
      commitTsMillis = 30L)
    val filesZ = MergeTable.currentManifest(spark, root).size
    val vCand = vCandidates(100L, 300L)
    assert(vCand < filesZ,
      s"v-band should prune after z-compaction: $vCand of $filesZ")
    // the key dimension still prunes too (tiles, not a v-sort)
    val kRanges = MergeTable.currentManifest(spark, root)
    val kCand = kRanges.count(e => e.maxKey >= 100L && e.minKey <= 300L)
    assert(kCand < filesZ,
      s"k-band should still prune after z-compaction: $kCand of $filesZ")
    // reads stay exact: the v-band through readWhere ≡ pre-compact truth
    // minus the DV'd key, and the manifest carries no #dv lines (purged)
    val got = MergeTable.readWhere(spark, root, col("v").between(100L, 300L))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(got === want.filterNot(_.head == 17L))
    assert(MergeTable.dvNames(spark, genDir).isEmpty, "compaction must purge DVs")
    assert(MergeTable.read(spark, root).count() === 3999L)
  }

  test("predicate-driven readWhere: conjunct bounds prune; unknowns and " +
      "disjunctions never prune; result always ≡ full-scan filter") {
    val root = freshRoot("where")
    MergeTable.create(spark, root, baseDf(800), "k", nFiles = 8,
      commitTsMillis = 10L)
    def toExpr(c: org.apache.spark.sql.Column) =
      baseDf(1).filter(c).queryExecution.analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }.get
    def sameAsFullScan(p: org.apache.spark.sql.Column): Unit = {
      val got = MergeTable.readWhere(spark, root, p)
        .orderBy("k").collect().map(_.toSeq).toSeq
      val want = MergeTable.read(spark, root).filter(p)
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(got === want, s"predicate $p")
    }
    // conjunct bounds: integral AND string columns extracted (the
    // string equality bounds as its 8-byte-prefix embedding)
    val p1 = col("v") >= 1000L && col("v") <= 1200L && col("tag") === "base"
    val embBase = graft.functions.StringPrefix64.embed("base")
    assert(MergeTable.extractBounds(toExpr(p1))
      === Map("v" -> (1000L, 1200L), "tag" -> (embBase, embBase)))
    sameAsFullScan(p1)
    // literal-on-the-left and strict comparisons normalize correctly
    assert(MergeTable.extractBounds(toExpr(lit(10L) > col("k")))
      === Map("k" -> (Long.MinValue, 9L)))
    assert(MergeTable.extractBounds(toExpr(col("k") > 5 && col("k") < 8))
      === Map("k" -> (6L, 7L)))
    sameAsFullScan(col("k") > 5 && col("k") < 8)
    // a value-CHANGING narrowing cast bounds by the POST-cast value:
    // non-ANSI CAST(5000000000 AS INT) overflows to 705032704, and the
    // comparison evaluates against THAT — bounding by the pre-cast
    // 5000000000 would skip files that provably match
    locally {
      import org.apache.spark.sql.catalyst.expressions.{
        AttributeReference, Cast, EqualTo, EvalMode, Literal}
      import org.apache.spark.sql.types.{IntegerType, LongType}
      val kAttr = AttributeReference("k", IntegerType)()
      val narrowing = Cast(Literal(5000000000L, LongType), IntegerType,
        None, EvalMode.LEGACY)
      assert(narrowing.eval() === 705032704)
      assert(MergeTable.extractBounds(EqualTo(kAttr, narrowing))
        === Map("k" -> (705032704L, 705032704L)))
      // a cast to a non-integral type extracts nothing (never prunes)
      val toStr = Cast(Literal(5L, LongType),
        org.apache.spark.sql.types.StringType, None, EvalMode.LEGACY)
      assert(MergeTable.extractBounds(EqualTo(kAttr, toStr)) === Map.empty)
    }
    // a disjunction extracts nothing — every file stays in, result exact
    assert(MergeTable.extractBounds(
      toExpr(col("v") === 10L || col("v") === 7990L)) === Map.empty)
    sameAsFullScan(col("v") === 10L || col("v") === 7990L)
    // contradictory bounds short-circuit to empty, schema intact
    val none = MergeTable.readWhere(spark, root, col("k") > 100L && col("k") < 50L)
    assert(none.isEmpty && none.columns.toSeq === Seq("k", "v", "tag"))
    // the same probe as readWhereKey: equal results through both faces
    val a = MergeTable.readWhere(spark, root, col("k") === 5L)
      .collect().map(_.toSeq).toSeq
    val b = MergeTable.readWhereKey(spark, root, 5L, 5L)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("write-audit-publish: staged merge invisible until published; discard leaves no trace") {
    val root = freshRoot("wap")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val before = MergeTable.read(spark, root).orderBy("k").collect().toSeq
    // stage a merge: the bad batch a WAP gate would catch
    val g = MergeTable.stageMerge(spark, root,
      Seq(("u", 1L, 7L, -1L, "bad")).toDF("op", "seq", "k", "v", "tag"), "k")
    // invisible: readers still serve the previous generation
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === before)
    assert(Snapshots.currentGen(spark, root).get < g)
    // auditable: the staged state is exactly the would-be commit
    val staged = MergeTable.readStaged(spark, root, g)
    assert(staged.where(col("k") === 7L).head().getLong(1) === -1L)
    assert(staged.count() === 100L)
    // audit fails → discard; the staged generation vanishes, orphans GC'd
    MergeTable.discardStaged(spark, root, g)
    intercept[IllegalArgumentException](MergeTable.readStaged(spark, root, g))
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === before)
    MergeTable.sweep(spark, root)
    assert(MergeTable.read(spark, root).count() === 100L, "sweep ate live files")
    // stage again, audit passes → publish: atomic flip to the staged state
    val g2 = MergeTable.stageMerge(spark, root,
      Seq(("u", 1L, 7L, 777L, "ok")).toDF("op", "seq", "k", "v", "tag"), "k")
    MergeTable.publishStaged(spark, root, g2, commitTsMillis = 20L)
    assert(MergeTable.read(spark, root).where(col("k") === 7L)
      .head().getLong(1) === 777L)
    // a committed generation can never be "discarded"
    intercept[IllegalArgumentException](MergeTable.discardStaged(spark, root, g2))
    // publishing a stale staged gen (≤ committed) is refused
    intercept[IllegalArgumentException](MergeTable.publishStaged(spark, root, g2))
  }

  test("rollback commits a manifest copy: state restored, history intact, O(manifest)") {
    val root = freshRoot("rollback")
    MergeTable.create(spark, root, baseDf(100), "k", nFiles = 4,
      commitTsMillis = 10L)
    val g1 = Snapshots.currentGen(spark, root).get
    val v1 = MergeTable.read(spark, root).orderBy("k").collect().toSeq
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 7L, -1L, "bad"), ("d", 1L, 13L, 0L, ""))
        .toDF("op", "seq", "k", "v", "tag"), "k", commitTsMillis = 20L)
    val g2 = Snapshots.currentGen(spark, root).get
    val rb = MergeTable.rollbackTo(spark, root, g1, commitTsMillis = 30L)
    assert(rb > g2)
    // state is back to g1, bit for bit — including column stats
    assert(MergeTable.read(spark, root).orderBy("k").collect().toSeq === v1)
    assert(MergeTable.readWhereCol(spark, root, "v", 130L, 130L)
      .collect().map(_.getLong(0)).toSeq === Seq(13L),
      "rolled-back manifest must carry the column ranges")
    // files referenced, not copied: rollback manifest names ⊆ g1 names
    val names1 = MergeTable.manifest(spark, Snapshots.genDir(root, g1)).map(_.name).toSet
    val namesRb = MergeTable.currentManifest(spark, root).map(_.name).toSet
    assert(namesRb === names1)
    // the rolled-back-over state remains time-travelable history
    assert(MergeTable.readAt(spark, root, g2).where(col("k") === 7L)
      .head().getLong(1) === -1L)
  }

  test("a crashed merge (files landed, no commit) is invisible and its orphans are collected") {
    val root = freshRoot("crash")
    MergeTable.create(spark, root, baseDf(20), "k", nFiles = 2,
      commitTsMillis = 10L)
    // simulate the crash: land a data file in files/ with no manifest
    val orphan = new java.io.File(s"$root/files/f-9-0-deadbeef.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    assert(MergeTable.read(spark, root).count() === 20L) // reader unaffected
    val collected = MergeTable.sweep(spark, root)
    assert(collected === 1)
    assert(!orphan.exists())
    assert(MergeTable.read(spark, root).count() === 20L)
  }
}
