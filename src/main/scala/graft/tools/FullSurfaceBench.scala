package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, Future, TimeoutException}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Full-surface scale run (SURVEY §6, round-10): EVERY
  * `SparkEntry.queries` entry executed once against a factor-N replica
  * of the sf0.1 corpus — the measurement the per-family benches
  * (Rel/Ann/Scale/CurationIngest/Compaction) cannot make, because a
  * bottleneck that is fixed-cost-masked at sf0.1 (index header reads,
  * driver-side candidate collects, a broadcast that silently grew) only
  * shows up when the whole surface runs at ~sf1 in one sitting.
  *
  * Corpus recipe (scale-true, not dup-saturating):
  *   - facts grow: orders/lineitem keep their join fan-out via the
  *     orderkey remap `key*factor+r`; events keeps user histories
  *     growing (user_id NOT remapped) like a real event log;
  *   - documents replicas are salted near-dups (ScaleBench's recipe:
  *     component structure grows like a crawl, Jaccard ≈ 0.9 within a
  *     replica group);
  *   - embeddings replicas are circularly shifted by r, so replicas are
  *     DISTINCT directions — replicating identical vectors would make
  *     every vector a 10-clique and benchmark the pair-proportional
  *     worst case instead of the corpus-linear path;
  *   - dims (region/nation/customer/supplier/part) copy unchanged: a
  *     warehouse grows facts-per-dim, and dims staying broadcastable at
  *     10× is exactly the property the plans rely on at 100 TB.
  *
  * Protocol: same as Bench (`agg(count(*))` ≡ `df.count()`) so numbers
  * compare across factors run through THIS tool; each query runs under
  * a watchdog (default 600 s, `cancelJobGroup` on expiry) so a
  * superlinear anchor cannot wedge the sweep; shuffle-write bytes are
  * read off each query's own executed plan (the cluster-relevant
  * number — local shuffles are memory copies, at 1000 executors they
  * are the network).
  *
  * Run (baseline then scale, separate JVMs so page-cache/catalog state
  * cannot leak between factors):
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.FullSurfaceBench /root/testdata/sf0.1 1"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.FullSurfaceBench /root/testdata/sf0.1 10"
  * Output: per-query lines + `target/fullsurface_f<factor>.json`.
  *
  * Memory-capped truth (round-11): the JSON records the JVM max heap and
  * PER-QUERY spill bytes ([[QueryMetricsListener]] — exact job-group
  * attribution, bus drained before each read), so "runs at factor 10"
  * can no longer silently mean "fits in a 128 GiB page-cached box": a
  * query whose working set exceeds the capped heap either spills
  * (recorded) or errors (recorded). build.sbt caps the forked JVM at
  * `SPARK_DRIVER_MEM` (default 8g — a cluster-executor-sized heap).
  *
  * Ratio bound-asserts (round-11): at factor > 1 the run compares every
  * query against `target/fullsurface_f1.json` and FAILS (exit 2, after
  * writing its artifact) if a declared scale path degrades superlinearly
  * — ratio > [[BoundFactorSlack]]×max(factor, output-rows growth) with
  * both walls above the jitter floor (the rows term: a pair-emitting
  * face whose RESULT legitimately outgrows the input — 44× rows at
  * factor 10 measured for the near-dup pair queries under the salted
  * replica corpus — is doing work proportional to what it must emit). The three declared exact quadratic anchors
  * (x_embed_near_dup, x_ngram_jaccard, x_dup_clusters) are exempt BY
  * NAME: they are oracle anchors for their LSH/index twins and scale
  * pair-proportionally by construction. This turns the round-10 judge
  * workflow (read the JSON, spot the 25×) into a loud regression gate.
  */
object FullSurfaceBench {

  /** Superlinear gate: a non-anchor query may cost at most this × factor
    * more wall than its factor-1 run. 1.2 leaves headroom for the
    * log-factors honest algorithms carry (sorts, index probes) and for
    * shuffle/spill constants emerging from a fixed-cost f1 baseline —
    * while still failing the class of regression round 10 caught by eye
    * (25×-33× at factor 10). */
  val BoundFactorSlack = 1.2

  /** Below this wall-clock (seconds) ratios are scheduler jitter, not
    * scaling — a 0.1 s query going to 0.5 s is noise on a loaded box. */
  val BoundMinSec = 1.0

  /** The f1 baseline is floored here before dividing: sub-half-second
    * f1 walls are dominated by fixed per-query Spark overhead, and a
    * raw ratio against them flags scheduler noise as "superlinear". */
  val BoundBaseFloor = 0.5

  /** Declared quadratic oracle anchors — exempt from the bound by name,
    * never silently. */
  val BoundExempt = Set("x_embed_near_dup", "x_ngram_jaccard", "x_dup_clusters")

  /** Pair-DRIVEN decision faces: their OUTPUT is doc-shaped (one row
    * per document, growth = factor) but their WORK driver is the
    * near-dup PAIR set of the named pair-source query. The replica
    * corpus densifies every cluster by `factor` (each doc gains
    * factor−1 salted near-dup twins), so TRUE pairs grow ~factor² —
    * measured 1053× at factor 10 (x_minhash_indexed rows 236→248 599)
    * — and work proportional to real pairs is the contract, not a
    * regression (the faces measure 7–16× wall under that 1053× driver).
    * Allowance = the driver's measured rows growth, CAPPED at factor²/2
    * so a switch to all-pairs candidate verification (≥factor² work,
    * ~100× wall at factor 10) still fails the gate. */
  val BoundDriver = Map(
    "x_dup_clusters_lsh" -> "x_minhash_indexed",
    "x_semantic_dedup" -> "x_embed_near_dup_lsh")

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val capSec = if (args.length > 2) args(2).toInt else 600
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions scale with the DATA, not the core count: a
    // partition's working set must fit the executor's memory share at
    // the target factor, so fewer cores must NOT mean fatter partitions.
    // (The first local-cluster run pinned partitions to 8 cores at
    // factor 10 — 4× the per-task working set of the 32-partition
    // single-JVM run — and the quadratic anchors OOM'd 4 GB executors.)
    // AQE coalesces the excess at small factors.
    val shufflePartitions = math.max(cpus.toInt, 16 * factor)
    // Scan splits must shrink with the factor too: shuffle.partitions
    // only sizes REDUCE-side tasks, but the partial (map-side) hash
    // aggregate runs at the SCAN's partitioning — 8 file splits of a
    // factor-10 corpus meant ~3M exploded shingles per task, hundreds of
    // spill files each, and Spark's merge phase opens a 1 MB read-ahead
    // buffer per spill file at once (HashAggregateExec.finishAggregate →
    // UnsafeSorterSpillReader), which OOM'd 4 GB executors. Splitting
    // the scan 10× finer keeps per-task spill counts flat as the corpus
    // grows — the knob a real cluster sizes to executor memory.
    val maxPartitionBytes = s"${math.max(8, 128 / factor)}m"
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", maxPartitionBytes)
      // spill-merge reads allocate 2 MB of read-ahead buffers PER SPILL
      // FILE, all open at once (UnsafeSorterSpillReader) — on a
      // memory-capped executor that un-accounted allocation is what tips
      // a many-spill quadratic-anchor task over the heap; trade merge
      // streaming speed for bounded memory
      .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qMetrics = new QueryMetricsListener
    spark.sparkContext.addSparkListener(qMetrics)
    val heapMaxMB = Runtime.getRuntime.maxMemory / 1e6
    println(f"[fullsurface] jvm max heap: $heapMaxMB%.0f MB")

    // ---- factor-N corpus (sig-gated: rebuilt only when source data or
    // factor changes) --------------------------------------------------
    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft_fullsurface$factor"
    val sig = s"fs${factor}_${graft.ops.Layout.dataSig(s"$srcDir/lineitem.parquet")}"
    graft.ops.Layout.ensureSigGated(scaleDir, sig) {
      val r = spark.range(factor).toDF("r")
      graft.Tables.orders(spark, srcDir).crossJoin(r)
        .withColumn("o_orderkey", col("o_orderkey") * factor + col("r"))
        .drop("r")
        .write.mode("overwrite").parquet(s"$scaleDir/orders.parquet")
      graft.Tables.lineitem(spark, srcDir).crossJoin(r)
        .withColumn("l_orderkey", col("l_orderkey") * factor + col("r"))
        .drop("r")
        .write.mode("overwrite").parquet(s"$scaleDir/lineitem.parquet")
      // events: remap event_id, keep everything else — per-user history
      // grows factor×. ts round-trips through Tables.events' normalized
      // TIMESTAMP form (written back as timestamp[us], which the reader
      // handles).
      graft.Tables.events(spark, srcDir).crossJoin(r)
        .withColumn("event_id", col("event_id") * factor + col("r"))
        .drop("r", "ts_ns")
        .write.mode("overwrite").parquet(s"$scaleDir/events.parquet")
      // documents: ScaleBench's salted near-dup replicas; n_chars must
      // match the salted text (queries read it as ground truth)
      graft.Tables.documents(spark, srcDir).crossJoin(r)
        .withColumn("text",
          concat(col("text"), lit(" zz"), col("doc_id"), lit("x"), col("r")))
        .select(
          (col("doc_id") * factor + col("r")).as("doc_id"),
          col("text"), col("lang"), col("source"),
          length(col("text")).cast("bigint").as("n_chars"))
        .write.mode("overwrite").parquet(s"$scaleDir/documents.parquet")
      // embeddings: circular shift by r — replicas become distinct
      // directions (same norm, same per-element distribution), keeping
      // near-dup density constant instead of saturating it
      graft.Tables.embeddings(spark, srcDir).crossJoin(r)
        .select(
          (col("vec_id") * factor + col("r")).as("vec_id"),
          when(col("r") === 0, col("embedding")).otherwise(
            concat(
              slice(col("embedding"), col("r") + 1,
                size(col("embedding")) - col("r")),
              slice(col("embedding"), lit(1), col("r")))).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$scaleDir/embeddings.parquet")
      Seq("region", "nation", "customer", "supplier", "part").foreach(t =>
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$scaleDir/$t.parquet"))
    }
    val nLi = spark.read.parquet(s"$scaleDir/lineitem.parquet").count()
    val nDoc = spark.read.parquet(s"$scaleDir/documents.parquet").count()
    println(s"[fullsurface] corpus: factor $factor, $nLi lineitem, $nDoc documents")

    // ---- one-time ETL/index builds (same set as Bench), timed --------
    def timeIt[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime; val v = f; ((System.nanoTime - t0) / 1e9, v)
    }
    val buildTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
    def build(name: String)(f: => Any): Unit =
      try { val (t, _) = timeIt(f); buildTimes(name) = t;
            println(f"[fullsurface] build/$name: $t%.1f s") }
      catch { case e: Throwable =>
        println(s"[fullsurface] build/$name FAILED: ${e.toString.take(200)}") }
    build("warmup") {
      spark.read.parquet(s"$scaleDir/lineitem.parquet").count()
      graft.Tables.events(spark, scaleDir).count()
      spark.sql("SHOW DATABASES").collect()
      spark.range(100).join(broadcast(spark.range(10)), "id").count()
    }
    build("bucketed_star")(graft.ops.Layout.ensureBucketedStar(spark, scaleDir))
    build("srp_index")(graft.operators.Similarity.ensureSrpIndex(spark, scaleDir))
    build("ivf_index")(graft.operators.Similarity.ensureIvfIndex(spark, scaleDir))
    build("ivfpq_index")(graft.operators.PQ.ensureIvfPqIndex(spark, scaleDir))
    build("pq_index")(graft.operators.PQ.ensurePqIndex(spark, scaleDir))
    build("media_layout")(graft.operators.Multimodal.ensureMediaLayout(spark, scaleDir))
    build("minhash_index")(graft.operators.Dedup.ensureMinhashIndex(spark, scaleDir))
    build("clusters_index")(graft.operators.Dedup.ensureClustersIndex(spark, scaleDir))
    build("postings_index")(graft.operators.Search.ensurePostingsIndex(spark, scaleDir))
    build("day_layout")(graft.ops.Layout.ensureDayLayout(spark, scaleDir))
    build("zorder_layout")(graft.ops.Layout.ensureZOrderLayout(spark, scaleDir))
    build("subword_vocab")(graft.operators.Subword.ensureVocab(spark, scaleDir))
    build("stats_catalog")(graft.ops.TableStats.ensureCatalog(spark, scaleDir,
      "customer", graft.ops.TableStats.CustomerStatCols))

    // ---- shuffle-write bytes off one executed plan -------------------
    def shuffleMB(df: DataFrame): Double = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val seen = scala.collection.mutable.Set[SparkPlan]()
      var bytes = 0L
      def walk(p: SparkPlan): Unit = if (seen.add(p)) {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case e: ShuffleExchangeLike =>
            bytes += e.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(df.queryExecution.executedPlan)
      bytes / 1e6
    }

    // ---- the sweep: every declared query, watchdogged ----------------
    // sec is wall-clock to the count result; rows/shufMB are None on
    // timeout/error. The watchdog cancels through the job group (set in
    // the submitting thread — job groups are thread-local) so a
    // superlinear anchor is recorded as "timeout" instead of wedging
    // the remaining queries.
    final case class R(name: String, sec: Double, rows: Option[Long],
                       shufMB: Option[Double], err: Option[String],
                       spillMemMB: Double = 0.0, spillDiskMB: Double = 0.0,
                       peakExecMB: Double = 0.0)
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime
        val fut = Future {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          val agg = fn(spark, scaleDir).agg(count(lit(1)).as("cnt"))
          val n = agg.collect()(0).getLong(0)
          (n, shuffleMB(agg))
        }
        val r0 =
          try {
            val (n, mb) = Await.result(fut, capSec.seconds)
            R(name, (System.nanoTime - t0) / 1e9, Some(n), Some(mb), None)
          } catch {
            case _: TimeoutException =>
              spark.sparkContext.cancelJobGroup(name)
              R(name, (System.nanoTime - t0) / 1e9, None, None, Some("timeout"))
            case e: Throwable =>
              R(name, (System.nanoTime - t0) / 1e9, None, None,
                Some(e.toString.take(200)))
          }
        // drain the async bus, then attribute spill to THIS query's group
        try org.apache.spark.graft.ListenerBusBridge
          .waitUntilEmpty(spark.sparkContext)
        catch { case _: java.util.concurrent.TimeoutException =>
          println(s"[fullsurface] WARN: listener bus drain timed out after $name") }
        val (sm, sd, pk) = qMetrics.of(name)
        val r = r0.copy(spillMemMB = sm, spillDiskMB = sd, peakExecMB = pk)
        val spillPart = if (sm > 0 || sd > 0)
          f"  SPILL mem=${sm}%.0f MB disk=${sd}%.0f MB" else ""
        println(f"[fullsurface] ${r.name}%-28s ${r.sec}%7.2f s  " +
          f"rows=${r.rows.getOrElse(-1L)}%-9d shuffle=${r.shufMB.getOrElse(0.0)}%.1f MB" +
          spillPart + r.err.map(e => s"  ERR=$e").getOrElse(""))
        r
    }

    val ok = results.filter(_.err.isEmpty)
    val total = ok.map(_.sec).sum
    println(f"[fullsurface] total: $total%.1f s over ${ok.size} ok / ${results.size} queries" +
      s" (errors: ${results.count(_.err.isDefined)})")
    println("[fullsurface] top 10 by time:")
    results.sortBy(-_.sec).take(10).foreach(r =>
      println(f"[fullsurface]   ${r.name}%-28s ${r.sec}%7.2f s  shuffle=${r.shufMB.getOrElse(0.0)}%.1f MB"))

    // ---- ratio bound-asserts vs the factor-1 artifact ----------------
    // Artifacts are per-execution-mode: a local-cluster f10 must be
    // compared against a local-cluster f1 (different fixed overheads,
    // different parallelism), so the filename carries an `lc_` prefix
    // in that mode and the single-JVM pair is left untouched.
    val modeTag =
      if (graft.Sessions.master(cpus).startsWith("local-cluster")) "lc_" else ""
    // f1 per-query (seconds, rows), parsed off our own writer's format
    val f1Secs: Map[String, (Double, Long)] =
      if (factor <= 1) Map.empty
      else {
        val p = java.nio.file.Paths.get(s"target/fullsurface_${modeTag}f1.json")
        if (!java.nio.file.Files.exists(p)) {
          println(s"[fullsurface] WARN: no target/fullsurface_${modeTag}f1.json — " +
            "bound-asserts skipped (run factor 1 first)")
          Map.empty
        } else {
          val txt = java.nio.file.Files.readString(p)
          val parsed =
            raw""""(\w+)":\{"sec":([0-9.]+),"rows":(-?[0-9]+)""".r
              .findAllMatchIn(txt)
              .map(m => m.group(1) -> (m.group(2).toDouble, m.group(3).toLong))
              .toMap
          // A present-but-unparseable f1 artifact must not silently
          // disarm the gate: fail loudly so the writer/reader formats
          // are kept in lockstep.
          if (parsed.isEmpty) {
            println("[fullsurface] ERROR: target/fullsurface_f1.json exists " +
              "but zero query entries parsed — writer/reader format drift; " +
              "bound gate would be a silent no-op")
            sys.exit(3)
          }
          parsed
        }
      }
    val violations = results.flatMap { r =>
      f1Secs.get(r.name) match {
        // Both walls must clear the jitter floor. A 0.2–0.3 s f1 wall is
        // mostly fixed Spark overhead, so instead of exempting fast-f1
        // queries (which would disarm the gate for most of the surface)
        // the baseline is FLOORED at [[BoundBaseFloor]]: a query at
        // 0.25 s f1 / 3.1 s f10 is scheduler noise (3.1 < 1.2·10·0.5),
        // while a genuine superlinear blow-up past 6 s still fails.
        // The allowance is slack × max(factor, OUTPUT-rows growth):
        // a pair-emitting face (near-dup pairs under the replicated
        // corpus) legitimately produces superlinear OUTPUT — measured
        // 44× rows at factor 10 for x_embed_near_dup_lsh — and work
        // proportional to what a query must EMIT is not a regression;
        // a query whose rows grow ≤ factor keeps the plain bound.
        case Some((base, baseRows)) if r.err.isEmpty && !BoundExempt(r.name) &&
            r.sec >= BoundMinSec && base > 0 && {
              val rowsRatio =
                r.rows.map(_.toDouble / math.max(baseRows, 1L)).getOrElse(1.0)
              // pair-driven faces: allowance follows the pair source's
              // measured rows growth, capped below the all-pairs
              // failure mode (see BoundDriver). The factor²/2 cap is
              // calibrated for factor ≥ 5: at factor 2–3 it sits BELOW
              // the genuine ~factor² pair growth and would flag a
              // correct run, so small-factor sweeps trust the measured
              // growth uncapped (an all-pairs regression still fails
              // the factor-10 gate, which is the one the driver runs).
              val driverRatio = BoundDriver.get(r.name).flatMap { dn =>
                for {
                  (_, dBase) <- f1Secs.get(dn)
                  dNow <- results.find(_.name == dn).flatMap(_.rows)
                } yield {
                  val measured = dNow.toDouble / math.max(dBase, 1L)
                  if (factor >= 5)
                    math.min(measured, factor.toDouble * factor / 2)
                  else measured
                }
              }.getOrElse(1.0)
              r.sec / math.max(base, BoundBaseFloor) >
                BoundFactorSlack *
                  math.max(factor.toDouble, math.max(rowsRatio, driverRatio))
            } =>
          Some((r.name, r.sec / math.max(base, BoundBaseFloor)))
        case _ => None
      }
    }
    violations.foreach { case (n, ratio) =>
      println(f"[fullsurface] BOUND VIOLATION: $n%-28s ${ratio}%.1f× at " +
        f"factor $factor (bound ${BoundFactorSlack * factor}%.1f× or " +
        "output-growth-scaled) — superlinear regression on a declared scale path")
    }

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { r =>
      // escape ALL control chars, not just backslash/quote: multi-line
      // Spark error messages (stage-failure reports) otherwise produce
      // an artifact json.load rejects
      def jesc(e: String): String = e.flatMap {
        case '\\' => "\\\\"
        case '"'  => "\\\""
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val err = r.err.map(e => s""","err":"${jesc(e)}"""").getOrElse("")
      val spill = if (r.spillMemMB > 0 || r.spillDiskMB > 0)
        s""","spill_mem_mb":${fmt(r.spillMemMB)},"spill_disk_mb":${fmt(r.spillDiskMB)}"""
      else ""
      val peak = if (r.peakExecMB > 0) s""","peak_exec_mb":${fmt(r.peakExecMB)}""" else ""
      s""""${r.name}":{"sec":${fmt(r.sec)},"rows":${r.rows.getOrElse(-1L)},"shuffle_mb":${fmt(r.shufMB.getOrElse(-1.0))}$spill$peak$err}"""
    }.mkString("{", ",", "}")
    val builds = buildTimes.map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val vio = violations.map { case (n, ratio) =>
      s"""{"query":"$n","ratio":${fmt(ratio)}}""" }.mkString("[", ",", "]")
    val totalSpill = results.map(r => r.spillMemMB + r.spillDiskMB).sum
    val line =
      s"""{"factor":$factor,"total_sec":${fmt(total)},"n_queries":${results.size},"n_errors":${results.count(_.err.isDefined)},"master":"${graft.Sessions.master(cpus)}","heap_max_mb":${fmt(heapMaxMB)},"spill_total_mb":${fmt(totalSpill)},"bound_violations":$vio,"builds":$builds,"queries":$qs}"""
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"target/fullsurface_${modeTag}f$factor.json"), line + "\n")
    println(s"[fullsurface] wrote target/fullsurface_${modeTag}f$factor.json")
    spark.stop()
    // fail AFTER the artifact is on disk: the gate is loud, the evidence
    // durable. SPARK_GRAFT_BOUNDS=off downgrades to the printed warning
    // (for diagnosing a violation interactively on a loaded box).
    if (violations.nonEmpty && !sys.env.get("SPARK_GRAFT_BOUNDS").contains("off")) {
      println(s"[fullsurface] FAILING: ${violations.size} bound violation(s)")
      sys.exit(2)
    }
  }
}
