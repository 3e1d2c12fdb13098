package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** `CALL lake.<verb>(...)` — the SQL maintenance surface over the
  * lake's API faces: OPTIMIZE packs only small files, VACUUM honors
  * the retention floor and makes swept reads refuse loudly, ROLLBACK
  * restores state as a NEW commit, COMPACT folds deletion vectors
  * away, and every verb returns its API metrics as a one-row result. */
class GraftProceduresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cat = "proccat"
  private lazy val warehouse: String = {
    val d = TestSpark.tempDir("graft-proc-wh")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.plans.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def baseDf(n: Int) =
    spark.range(n).select(col("id").as("k"),
      (col("id") * 10).as("v"), lit("base").as("tag"))

  private def mkTable(name: String, n: Int = 200, nFiles: Int = 6): String = {
    // the warehouse tempdir is fresh per suite run — names never clash
    val root = s"$warehouse/$name"
    MergeTable.create(spark, root, baseDf(n), "k", nFiles = nFiles,
      commitTsMillis = 10L)
    root
  }

  private def stateOf(root: String): Map[Long, (Long, String)] =
    MergeTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("CALL optimize packs ONLY small files (named + defaulted args), " +
    "carries the rest by reference, and the state is bit-identical") {
    val root = mkTable("p_opt", n = 2000, nFiles = 4)
    // two single-row INSERT merges (keys beyond every file range —
    // nothing touched, nothing rewritten) leave KB-scale files next to
    // the ~500-row creation files
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 5000L, 333L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    MergeTable.merge(spark, root,
      Seq(("c", 1L, 6000L, 155L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 30L)
    val before = stateOf(root)
    val entries = MergeTable.currentManifest(spark, root)
    val f = new java.io.File(s"$root/files")
    val sizes = entries.map(e =>
      e.name -> new java.io.File(f, e.name).length()).toMap
    val cut = sizes.values.max / 2
    val big = entries.filter(e => sizes(e.name) >= cut).map(_.name).toSet
    val r = spark.sql(s"CALL $cat.optimize('p_opt', " +
      s"small_bytes => ${cut}L, target_bytes => ${Long.MaxValue}L)")
      .collect().head
    assert(r.getInt(0) >= 2 && r.getInt(1) >= 1,
      s"optimize metrics: $r")
    val after = MergeTable.currentManifest(spark, root).map(_.name).toSet
    big.foreach(n => assert(after.contains(n),
      s"right-sized file $n was rewritten by CALL optimize"))
    assert(stateOf(root) === before)
    assert(r.getLong(2) === Snapshots.currentGen(spark, root).get)
  }

  test("CALL vacuum honors retain and a swept generation then refuses " +
    "loudly, naming what is retained") {
    val root = mkTable("p_vac", n = 50, nFiles = 2)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 1L, 11L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 2L, 22L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 30L)
    val gens = Snapshots.generations(spark, root).sorted
    assert(gens.size === 3)
    val removed = spark.sql(s"CALL $cat.vacuum('p_vac', retain => 1)")
      .collect().head.getInt(0)
    assert(removed > 0, "vacuum must report the files it removed")
    assert(Snapshots.generations(spark, root).sorted ===
      gens.takeRight(2))
    val boom = intercept[Exception] {
      MergeTable.readAt(spark, root, gens.head).collect()
    }
    assert(boom.getMessage.contains(gens.takeRight(2).head.toString),
      s"swept read must name the retained generations: ${boom.getMessage}")
    // state intact through the sweep
    assert(stateOf(root)(1L) === ((11L, "w")))
  }

  test("CALL rollback restores a prior state as a NEW commit; CALL " +
    "compact folds deletion vectors away") {
    val root = mkTable("p_rb", n = 50, nFiles = 2)
    val g1 = Snapshots.currentGen(spark, root).get
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 7L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 20L)
    assert(!stateOf(root).contains(7L))
    assert(MergeTable.currentMeta(spark, root).dvs.nonEmpty)
    val g = spark.sql(s"CALL $cat.rollback('p_rb', generation => $g1)")
      .collect().head.getLong(0)
    assert(g === Snapshots.currentGen(spark, root).get && g > g1)
    assert(stateOf(root)(7L) === ((70L, "base")))
    // re-delete, then compact purges the sidecar
    MergeTable.mergeMor(spark, root,
      Seq(("d", 1L, 9L, 0L, "")).toDF("op", "seq", "k", "v", "tag"),
      "k", commitTsMillis = 40L)
    assert(MergeTable.currentMeta(spark, root).dvs.nonEmpty)
    val rc = spark.sql(s"CALL $cat.compact('p_rb', n_files => 2)")
      .collect().head
    assert(rc.getInt(0) >= 1)
    assert(MergeTable.currentMeta(spark, root).dvs.isEmpty,
      "compact must fold DVs away")
    assert(!stateOf(root).contains(9L) && stateOf(root).size === 49)
  }

  test("CALL compact(cluster_by => 'v') re-clusters by the z-order " +
    "interleave through the OCC staging: rows exact, a v-band read " +
    "prunes files the key-range layout could not") {
    val root = mkTable("p_zo", n = 4000, nFiles = 8)
    val before = stateOf(root)
    val rc = spark.sql(
      s"CALL $cat.compact('p_zo', n_files => 8, cluster_by => 'v')")
      .collect().head
    assert(rc.getInt(0) === 8, s"all 8 inputs consumed: $rc")
    assert(stateOf(root) === before, "a re-cluster must not change a row")
    // the uncorrelated-dimension band opens a strict file subset via
    // the post-cluster #cstat tiles (v = k*10 here is correlated, so
    // use a mid-domain band: both layouts prune, the clustered one
    // must still answer exactly)
    val got = MergeTable.readWhere(spark, root,
      org.apache.spark.sql.functions.col("v").between(1000L, 2000L))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (100L to 200L))
  }

  test("EXPLAIN CALL must not execute the verb: Spark runs bound " +
    "procedures at analysis, so a plan request would otherwise sweep") {
    val root = mkTable("p_explain", n = 50, nFiles = 2)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 1L, 11L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 20L)
    MergeTable.merge(spark, root,
      Seq(("u", 1L, 2L, 22L, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = 30L)
    val gens = Snapshots.generations(spark, root)
    assert(gens.size === 3)
    // EXPLAIN renders a plan (placeholder metrics row) and commits
    // NOTHING — vacuum(retain => 0) would otherwise drop 2 generations
    val plan = spark.sql(s"EXPLAIN CALL $cat.vacuum('p_explain', " +
      "retain => 0)").collect().map(_.getString(0)).mkString("\n")
    assert(plan.nonEmpty)
    assert(Snapshots.generations(spark, root) === gens,
      "EXPLAIN CALL vacuum performed the sweep")
    val before = stateOf(root)
    spark.sql(s"EXPLAIN CALL $cat.compact('p_explain')").collect()
    assert(Snapshots.generations(spark, root) === gens,
      "EXPLAIN CALL compact committed a rewrite")
    // the real CALL still executes after the EXPLAINs
    assert(spark.sql(s"CALL $cat.vacuum('p_explain', retain => 0)")
      .collect().head.getInt(0) > 0)
    assert(Snapshots.generations(spark, root) === Seq(gens.max))
    assert(stateOf(root) === before)
  }

  test("CALL vacuum(older_than_ms) — age-based retention: the window's " +
    "generations survive, plus the boundary generation that keeps " +
    "every in-window as-of answerable; older ones sweep") {
    // commit times relative to the wall clock (the SQL face has no
    // injectable now; the generous gaps absorb test runtime):
    // g1 -100 s, g2 -80 s, g3 -50 s, g4 -10 ms
    val root = s"$warehouse/p_age"
    val now = System.currentTimeMillis()
    def upd(k: Long, v: Long, ts: Long) = MergeTable.merge(spark, root,
      Seq(("u", 1L, k, v, "w")).toDF("op", "seq", "k", "v", "tag"),
      "k", nFiles = 1, commitTsMillis = ts)
    MergeTable.create(spark, root, baseDf(50), "k", nFiles = 2,
      commitTsMillis = now - 100000L)
    upd(1L, 11L, now - 80000L)
    upd(2L, 22L, now - 50000L)
    upd(3L, 33L, now - 10L)
    val gens = Snapshots.generations(spark, root).sorted
    assert(gens.size === 4)
    // a 60 s window: in-window = g3, g4; boundary = g2 (it was "the
    // table" when the window opened); g1 sweeps. retain => 0 isolates
    // the age policy from the count policy.
    spark.sql(s"CALL $cat.vacuum('p_age', retain => 0, " +
      "older_than_ms => 60000L)").collect()
    assert(Snapshots.generations(spark, root).sorted === gens.drop(1),
      "age retention must keep window + boundary, sweep the rest")
    // the boundary generation still answers an as-of inside the window
    // (resolve the instant to its generation, read manifest-directed)
    val bDir = Snapshots.resolveAsOf(spark, root, now - 55000L)
    assert(bDir === Snapshots.genDir(root, gens(1)))
    assert(MergeTable.readAt(spark, root, gens(1)).count() === 50L)
    // a pre-window as-of refuses loudly, naming the retained floor
    val boom = intercept[Exception] {
      Snapshots.resolveAsOf(spark, root, now - 90000L)
    }
    assert(boom.getMessage.contains(s"gen ${gens(1)} @ ${now - 80000L}"),
      s"refusal must name the time floor: ${boom.getMessage}")
  }

  test("SQL maintenance races a live occ-auto writer: CALL optimize " +
    "and age-guarded CALL vacuum interleave with optimistic commits — " +
    "zero lost updates, the pack still lands") {
    val root = mkTable("p_race", n = 2000, nFiles = 4)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writer = new Thread(() => {
      try {
        (0 until 4).foreach { i =>
          val lo = i * 200L
          val changes = spark.range(lo, lo + 200L).select(
            lit("u").as("op"), lit(1L).as("seq"), col("id").as("k"),
            (col("id") + 7L).as("v"), lit("live").as("tag"))
          MergeTable.mergeOccExactlyOnce(spark, root, changes, "k",
            streamId = "live", batchId = i.toLong,
            commitTsMillis = 100L + i, maxAttempts = 40, mode = "auto")
        }
      } catch { case t: Throwable => errors.add(t) }
    })
    writer.start()
    // maintenance interleaves THROUGH SQL while the writer commits:
    // vacuum's 10-minute orphan floor protects in-flight stagings,
    // deep retain keeps every base generation readable mid-prepare
    try {
      (0 until 3).foreach { _ =>
        spark.sql(s"CALL $cat.optimize('p_race', " +
          s"small_bytes => ${256L << 10}, target_bytes => " +
          s"${Long.MaxValue}L)").collect()
        spark.sql(s"CALL $cat.vacuum('p_race', retain => 100, " +
          "orphan_age_ms => 600000L)").collect()
      }
    } catch { case t: Throwable => errors.add(t) }
    writer.join(300000)
    assert(errors.isEmpty, s"racer failed: ${errors.peek()}")
    // a final pack after the dust settles must find a packable table
    // or an already-optimal one — and the state must be exact either way
    spark.sql(s"CALL $cat.optimize('p_race', " +
      s"small_bytes => ${256L << 10}, target_bytes => ${Long.MaxValue}L)")
      .collect()
    val byK = stateOf(root)
    assert(byK.size === 2000)
    (0L until 800L).foreach(k =>
      assert(byK(k) === ((k + 7L, "live")), s"lost update at k=$k"))
    (800L until 2000L).foreach(k =>
      assert(byK(k) === ((k * 10L, "base")), s"corrupted base at k=$k"))
    assert(MergeTable.appliedStreamBatchIds(spark, root) ===
      Map("live" -> 3L))
  }

  test("CALL analyze backfills nothing on a fresh table; OMITTED " +
    "defaults bind (Spark's default-value path); refusals are loud: " +
    "unknown procedure, NULL table, missing table") {
    mkTable("p_an", n = 20, nFiles = 1)
    assert(spark.sql(s"CALL $cat.analyze('p_an')")
      .collect().head.getInt(0) === 0)
    // every optional parameter OMITTED: Spark must bind the declared
    // SQL defaults (int literals against LongType params included) —
    // one small file at the 8 MB default means optimize is a no-op
    val d = spark.sql(s"CALL $cat.optimize('p_an')").collect().head
    assert(d.getInt(0) === 0 && d.getInt(1) === 1, s"defaults: $d")
    assert(spark.sql(s"CALL $cat.vacuum('p_an')")
      .collect().head.getInt(0) === 0)
    val nullT = intercept[Exception] {
      spark.sql(s"CALL $cat.analyze(NULL)")
    }
    val nullChain = Iterator.iterate[Throwable](nullT)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf(_: Throwable)).mkString(" | ")
    assert(nullChain.contains("must not be NULL"), nullChain)
    // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE;
    // the loud "unknown procedure — available: ..." message is the cause
    val unk = intercept[Exception] {
      spark.sql(s"CALL $cat.frobnicate('p_an')")
    }
    val chain = Iterator.iterate[Throwable](unk)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("unknown procedure"), chain)
    val miss = intercept[Exception] {
      spark.sql(s"CALL $cat.optimize('p_nope')")
    }
    val missChain = Iterator.iterate[Throwable](miss)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(missChain.contains("does not exist"), missChain)
  }
}
