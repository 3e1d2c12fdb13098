package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Curation}
import graft.streaming.IncrementalCuration

/** Incremental-curation economics experiment (SURVEY §6): what does a
  * DECISION REFRESH cost when small document waves arrive into a large
  * existing corpus — the steady state of a crawl pipeline?
  *
  * Corpus: the sf documents replicated `factor`× (the ScaleBench
  * salting — replicas are true near-dups, so the substring stage has
  * real work). 90% bulk-loads first; the rest arrives as `nWaves` small
  * waves (~2% of the corpus each at the defaults). Per small wave:
  *
  *  - BATCH REBUILD: recompute [[Curation.funnelOf]] over the whole
  *    corpus-so-far — re-tokenizes and re-shuffles every doc seen so
  *    far, so the refresh cost is corpus-sized regardless of wave size;
  *  - INCREMENTAL: [[IncrementalCuration.appendBatch]] (stage relations
  *    of the WAVE only) + derive-on-read [[IncrementalCuration.funnel]]
  *    (aggregates of the maintained occurrence relation — corpus-sized
  *    but over compact pre-aggregated rows, never re-tokenized).
  *
  * Decision equality after the final wave is asserted before any number
  * is reported — a fast diverging decision is not a result.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CurationIngestBench
  * /root/testdata/sf0.1 20 5"` (100 k docs, five ~2% waves).
  */
object CurationIngestBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 20
    val nWaves = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime; val r = f
      (r, (System.nanoTime - t0) / 1e9)
    }
    def fmt(s: Double) = f"$s%.2f s"

    // ScaleBench's salted replication: replicas are near-dups
    val all = graft.Tables.documents(spark, srcDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(factor).toDF("r"))
      .withColumn("text",
        concat(col("text"), lit(" zz"), col("doc_id"), lit("x"), col("r")))
      .select((col("doc_id") * factor + col("r")).as("doc_id"), col("text"))
      .localCheckpoint(true, graft.ops.Pin.Level)
    val evalShingles = CorpusOps
      .benchmarkShinglesOf(
        all.filter(col("doc_id") % CorpusOps.EvalSliceMod === 0))
      .localCheckpoint(true, graft.ops.Pin.Level)
    val root = java.nio.file.Files
      .createTempDirectory("curation-ingest").toString

    val train = all.filter(col("doc_id") % CorpusOps.EvalSliceMod =!= 0)
    def bulk = train.filter(col("doc_id") % 10 =!= 0)
    def smallWave(w: Int) = train.filter(col("doc_id") % 10 === 0 &&
      (col("doc_id") / 10) % nWaves === w)
    def seenThrough(w: Int) = train.filter(col("doc_id") % 10 =!= 0 ||
      (col("doc_id") / 10) % nWaves <= w)

    println(s"== refresh cost per ~${100 / (10 * nWaves)}% wave " +
      s"(${factor}x $srcDir = ${all.count()} docs, 90% bulk-loaded) ==")
    val (_, tBulk) = time {
      IncrementalCuration.appendBatch(root, evalShingles)(bulk, -1L)
    }
    println(s"bulk ingest (90%): ${fmt(tBulk)}")
    println(f"${"wave"}%-6s${"batch rebuild"}%-16s${"incr append"}%-14s${"incr derive"}%-12s")
    var batchTotal, incrTotal = 0.0
    (0 until nWaves).foreach { w =>
      val (_, tBatch) = time {
        Curation.funnelOf(seenThrough(w), evalShingles).count()
      }
      val (_, tAppend) = time {
        IncrementalCuration.appendBatch(root, evalShingles)(smallWave(w), w.toLong)
      }
      val (_, tDerive) = time {
        IncrementalCuration.funnel(spark, root).count()
      }
      batchTotal += tBatch; incrTotal += tAppend + tDerive
      println(f"$w%-6d${fmt(tBatch)}%-16s${fmt(tAppend)}%-14s${fmt(tDerive)}%-12s")
    }
    // equality gate: the maintained decision IS the batch decision
    val want = Curation.funnelOf(train, evalShingles).collect().toSeq
    val got = IncrementalCuration.funnel(spark, root).collect().toSeq
    require(got == want,
      s"incremental decision diverged: ${got.size} vs ${want.size} rows")
    println(f"totals over $nWaves refreshes: batch-rebuild ${fmt(batchTotal)}, " +
      f"incremental ${fmt(incrTotal)} (decisions identical, ${want.size} docs)")

    // --- source-skew stress (round 10, SURVEY §6): real crawls are
    // source-skewed; x_source_profile's per-source aggregation is the
    // natural hot-key victim. One source carries 80% of the docs vs a
    // uniform 50-way spread over the SAME corpus and the SAME funnel
    // (checkpointed once, so only the join + per-source agg is timed).
    // Expected and measured: skewed ≈ uniform — the partial+final agg
    // pre-combines the hot source map-side, so the final exchange
    // carries ≤ sources × partitions rows either way (the mitigation;
    // PlanSpec pins the partial agg). SkewOps' two-phase salt stays for
    // large-per-group-state aggs, which this is not.
    val funnelDone = graft.operators.Curation
      .funnelOf(train, evalShingles).localCheckpoint(true, graft.ops.Pin.Level)
    def withSource(src: org.apache.spark.sql.Column) =
      train.withColumn("source", src)
    val uniform = withSource(
      concat(lit("src_"), (col("doc_id") % 50).cast("string")))
    val skewed = withSource(
      when(col("doc_id") % 10 < 8, lit("mega"))
        .otherwise(concat(lit("src_"), (col("doc_id") % 50).cast("string"))))
    def profile(docs: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.sourceProfileFrom(funnelDone, docs)
    profile(uniform).count() // codegen/broadcast warm-up
    val (nU, tUni) = time(profile(uniform).count())
    val (nS, tSkew) = time(profile(skewed).count())
    val mega = profile(skewed).filter(col("source") === "mega")
      .select(col("n_docs")).head().getLong(0)
    println(f"source-skew stress: uniform($nU%d sources) ${fmt(tUni)}, " +
      f"skewed($nS%d sources, mega=$mega%d docs ≈80%%) ${fmt(tSkew)} — " +
      f"ratio ${tSkew / tUni}%.2f (partial agg absorbs the hot source)")
    spark.stop()
  }
}
