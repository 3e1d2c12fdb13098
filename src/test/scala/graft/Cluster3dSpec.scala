package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{MergeTable, Snapshots}

/** N-dimensional clustered compaction: the 3-d interleave serves a
  * THIRD-dimension band from fewer files than the 2-d (key, dim2)
  * layout can, reads stay exact through the re-cluster, and the
  * interleave primitive itself is bit-exact and loud out of budget. */
class Cluster3dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-c3d-$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "table").getAbsolutePath
  }

  /** Rows whose three dims are mutually UNCORRELATED: k sequential,
    * d2 = bit-reversed-ish hash, d3 = another mix — so no linear or 2-d
    * layout accidentally clusters d3. */
  private def baseDf(n: Long) =
    spark.range(n).select(col("id").as("k"),
      ((col("id") * 2654435761L) % n).as("d2"),
      ((col("id") * 40503L + 7L) % n).as("d3"),
      (col("id") % 97).as("v"))

  /** Candidate files for a d3 band, judged EXACTLY as pruneByCondition
    * does: a file survives iff its recorded #cstat d3 range intersects
    * the band (no recorded range = kept, unknown is unprunable). */
  private def candidates(root: String, lo: Long, hi: Long): Int = {
    val m = MergeTable.genMeta(spark, Snapshots.resolve(spark, root))
    val byFile = m.cstats.filter(_.col == "d3").map(s => s.file -> s).toMap
    m.entries.count(e => byFile.get(e.name)
      .forall(s => s.hi >= lo && s.lo <= hi))
  }

  test("a third-dimension band opens fewer files on the 3-d layout " +
    "than on the 2-d layout; both read exactly") {
    val n = 4000L
    val (lo, hi) = (100L, 300L) // a 5% d3 band
    val root2 = freshRoot("c2d")
    val root3 = freshRoot("c3d")
    Seq(root2 -> 2, root3 -> 3).foreach { case (root, dims) =>
      MergeTable.create(spark, root, baseDf(n), "k", nFiles = 16,
        commitTsMillis = 10L)
      if (dims == 2) MergeTable.compactZOrder(spark, root, "d2",
        nFiles = 16, commitTsMillis = 20L)
      else MergeTable.compactZOrderN(spark, root, Seq("d2", "d3"),
        nFiles = 16, commitTsMillis = 20L)
    }
    val c2 = candidates(root2, lo, hi)
    val c3 = candidates(root3, lo, hi)
    assert(c3 < c2,
      s"3-d layout should prune the d3 band harder: 3d=$c3 vs 2d=$c2")
    // exactness: the pruned read equals the full-scan filter on BOTH
    val expected = (0L until n)
      .map(i => (i, (i * 40503L + 7L) % n))
      .filter { case (_, d3) => d3 >= lo && d3 <= hi }
      .map(_._1).sorted
    Seq(root2, root3).foreach { root =>
      val got = MergeTable.readWhere(spark, root,
        col("d3").between(lo, hi))
        .select("k").collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"pruned read drifted under $root")
    }
    // the key still prunes too on the 3-d copy (tiles, not a d3 sort)
    val m3 = MergeTable.genMeta(spark, Snapshots.resolve(spark, root3))
    val keyBand = m3.entries.count(e => e.maxKey >= 0L && e.minKey <= n / 8)
    assert(keyBand < m3.entries.size,
      "the leading key must remain prunable on the 3-d layout")
  }

  test("normBitsAuto: order-preserving across a full-Long string-" +
    "embedding span (pre-shifted), exactly normBits on narrow spans, " +
    "all values inside the bit budget") {
    // embeddings deliberately spanning the WHOLE signed-Long domain
    // (empty string = Long.MinValue-side, 0xff-leading = the top)
    val strs = Seq("", "A", "Azzz", "a", "alpha", "beta", "zz",
      "ÿÿ", "m", "mzzzzzzzzz")
    val emb = strs.map(graft.functions.StringPrefix64.embed(_))
    val (lo, hi) = (emb.min, emb.max)
    val df = emb.toDF("e")
    val out = df.select(col("e"),
      graft.ops.Layout.normBitsAuto(col("e"), lo, hi, 16).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(n => n >= 0L && n <= 65535L))
    // monotone: embedding order ⇒ normalized order (ties allowed only
    // for equal embeddings — this span shifts by well under the
    // embeddings' discriminating bits)
    val sorted = emb.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(out(a) <= out(b), s"normBitsAuto broke order at ($a, $b)")
    }
    assert(out(lo) === 0L && out(hi) === 65535L)
    // narrow span: bit-identical to the unshifted normBits
    val narrow = spark.range(100).select(col("id").as("e"))
    val both = narrow.select(
      graft.ops.Layout.normBitsAuto(col("e"), 0L, 99L, 16).as("a"),
      graft.ops.Layout.normBits(col("e"), 0L, 99L, 16).as("b"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("compactZOrderN refusals: duplicate dims, empty dims; a STRING " +
    "dim clusters through its prefix embedding; DVs fold in through " +
    "the rewrite") {
    val root = freshRoot("refuse")
    MergeTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), (col("id") % 7).as("d2"),
        lit("s").as("s")), "k", nFiles = 2, commitTsMillis = 10L)
    // a string dim is legal since round 16: it interleaves via its
    // order-preserving prefix embedding (a constant column normalizes
    // to a degenerate all-zero dimension — still exact)
    MergeTable.compactZOrderN(spark, root, Seq("d2", "s"), nFiles = 2,
      commitTsMillis = 15L)
    assert(MergeTable.read(spark, root).count() === 100L)
    intercept[IllegalArgumentException] {
      MergeTable.compactZOrderN(spark, root, Seq("k", "d2"))
    }
    intercept[IllegalArgumentException] {
      MergeTable.compactZOrderN(spark, root, Seq.empty)
    }
    // DV fold-in: delete, re-cluster, deleted row must not resurrect
    MergeTable.deleteWhere(spark, root, col("k") === 50L,
      commitTsMillis = 20L, rewriteAboveFraction = 2.0)
    MergeTable.compactZOrderN(spark, root, Seq("d2"), nFiles = 2,
      commitTsMillis = 30L)
    val m = MergeTable.genMeta(spark, Snapshots.resolve(spark, root))
    assert(m.dvs.isEmpty, "the clustered rewrite folds DVs")
    assert(MergeTable.read(spark, root).count() === 99L)
  }

  test("interleave_n is bit-exact, order-preserving per dim, loud out " +
    "of budget; the codegen'd column face agrees with the static eval") {
    import graft.functions.InterleaveN
    // n=3 → 21 bits each; known small cases: bit j of dim i → bit 3j+i
    assert(InterleaveN.interleave(21, Array(1L, 0L, 0L)) === 1L)
    assert(InterleaveN.interleave(21, Array(0L, 1L, 0L)) === 2L)
    assert(InterleaveN.interleave(21, Array(0L, 0L, 1L)) === 4L)
    assert(InterleaveN.interleave(21, Array(2L, 0L, 0L)) === 8L)
    assert(InterleaveN.interleave(21, Array(1L, 1L, 1L)) === 7L)
    intercept[IllegalArgumentException] {
      InterleaveN.interleave(21, Array(1L << 21, 0L, 0L))
    }
    intercept[IllegalArgumentException] {
      InterleaveN.interleave(21, Array(-1L, 0L, 0L))
    }
    // column face (codegen path) ≡ static eval; NULL dim → NULL code
    val df = Seq((5L, 9L, 1023L), (0L, 0L, 0L)).toDF("a", "b", "c")
      .select(InterleaveN.interleaveN(
        Seq(col("a"), col("b"), col("c"))).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    assert(got === Seq(
      InterleaveN.interleave(21, Array(5L, 9L, 1023L)), 0L))
    val withNull = Seq((Some(1L), None: Option[Long]))
      .toDF("a", "b")
      .select(InterleaveN.interleaveN(Seq(col("a"), col("b"))).as("z"))
      .collect()
    assert(withNull.head.isNullAt(0), "NULL dim must yield NULL code")
  }
}
