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
