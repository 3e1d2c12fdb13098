package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{Compaction, IncrementalPostings}

/** Compaction economics experiment (SURVEY §6): what does the LSM-like
  * batch fan-out of an incrementally-appended postings index cost a
  * term lookup, and what does one compaction buy back?
  *
  * The sf documents arrive as `nWaves` appends (each wave term-
  * clustered into `waveParts` files — the real ingest shape where every
  * micro-batch leaves its own file set). A term lookup must then open
  * one file set per batch that ever ran; after
  * [[graft.streaming.Compaction.compactPostings]] it opens the batch
  * build's file count. The experiment reports parquet file counts and
  * steady-state latencies (second run — first pays codegen/page-cache)
  * for keyword search and TF-IDF before and after, asserting result
  * equality before any number is reported.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CompactionBench
  * /root/testdata/sf0.1 40"`.
  */
object CompactionBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nWaves = if (args.length > 1) args(1).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[compaction] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    def steady(name: String)(f: => Any): Unit = { f; time(name)(f); () }
    def files(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(root))
    }

    val root = s"${sys.props("java.io.tmpdir")}/graft_compaction_bench/index"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_compaction_bench"))
    val docs = graft.Tables.documents(spark, srcDir)
      .select(col("doc_id"), col("text"))
    time(s"ingest ($nWaves waves)") {
      (0 until nWaves).foreach { i =>
        IncrementalPostings.appendBatch(root, partitions = 4)(
          docs.filter(col("doc_id") % nWaves === i), i.toLong)
      }
    }
    val terms = Seq("spark", "merge")
    val kwBefore = IncrementalPostings.keywordSearch(spark, root, terms)
      .collect().map(_.toSeq).toSeq
    // count inside the CURRENT snapshot: after a compaction the root
    // also retains the predecessor tree for in-flight readers
    // (Snapshots' retention-one), which is not what queries open
    def liveFiles(): Int =
      files(graft.streaming.Snapshots.resolve(spark, root))
    println(s"[compaction] files before: ${liveFiles()}")
    steady("keyword_search (fan-out)")(
      IncrementalPostings.keywordSearch(spark, root, terms).count())
    steady("tfidf (fan-out)")(
      IncrementalPostings.tfidf(spark, root).count())

    time("compact")(Compaction.compactPostings(spark, root, partitions = 8))

    val kwAfter = IncrementalPostings.keywordSearch(spark, root, terms)
      .collect().map(_.toSeq).toSeq
    require(kwAfter == kwBefore, "compaction changed results — invalid run")
    println(s"[compaction] files after: ${liveFiles()} " +
      s"(root incl. retained predecessor snapshot: ${files(root)})")
    steady("keyword_search (compacted)")(
      IncrementalPostings.keywordSearch(spark, root, terms).count())
    steady("tfidf (compacted)")(
      IncrementalPostings.tfidf(spark, root).count())
    spark.stop()
  }
}
