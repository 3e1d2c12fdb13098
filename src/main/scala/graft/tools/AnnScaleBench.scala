package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN scale-separation experiment (SURVEY §6): replicate the sf0.1
  * embeddings (2 000 vectors) `factor`× — each replica slightly
  * perturbed so vectors are distinct — then time exact brute-force
  * top-k against the materialized SRP and IVF index paths. The SURVEY
  * §6 numbers use factor 500 (1 M vectors), where IVF crosses over 3×
  * (at toy scale the indexed forms lose to the scan; §6 records that
  * honestly — this experiment shows the crossover they exist for).
  *
  * Run (reproduces §6):
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AnnScaleBench /root/testdata/sf0.1 500"`.
  */
object AnnScaleBench {
  def main(args: Array[String]): Unit = {
    // flags may appear anywhere: positionals are the non-"--" args
    val positional = args.filterNot(_.startsWith("--"))
    val srcDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (positional.length > 1) positional(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // every timed entry lands in the artifact (round 12) — the crossover
    // claims below need recorded numbers, not scrollback. The artifact is
    // REWRITTEN after every entry: the large-Q faces run for many minutes
    // each, and an end-only write makes the whole sweep all-or-nothing
    // against a kill/OOM — measured walls must survive a partial run.
    val recorded = scala.collection.mutable.LinkedHashMap[String, Double]()
    // --resume: reload a prior (possibly partial) artifact and SKIP every
    // already-recorded entry — the crash-resume path. In local mode an
    // executor OOM (e.g. the broadcast serving face past its memory
    // cliff) kills the whole SparkContext, so entries after the cliff
    // never ran; resuming re-runs exactly those, keeping recorded
    // failures (-1) as the finding they are instead of re-dying on them.
    val artifactPath = java.nio.file.Paths.get(s"target/annscale_f$factor.json")
    if (args.contains("--resume") && java.nio.file.Files.exists(artifactPath)) {
      val txt = new String(java.nio.file.Files.readAllBytes(artifactPath))
      val entry = "\"([^\"]+)\":(-?\\d+\\.\\d+)".r
      val startAt = txt.indexOf("\"results\":")
      entry.findAllMatchIn(txt.substring(math.max(0, startAt))).foreach { m =>
        recorded(m.group(1)) = m.group(2).toDouble
      }
      println(s"[ann-scale] resume: ${recorded.size} recorded entries loaded, will skip them")
    }
    def fmtD(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    var corpusN = 0L
    def writeArtifact(factor: Int, complete: Boolean): Unit = {
      val rs = recorded.map { case (k, v) =>
        s""""${k.replace("\"", "'")}":${fmtD(v)}""" }.mkString("{", ",", "}")
      val line =
        s"""{"factor":$factor,"n_vectors":$corpusN,"master":"${graft.Sessions.master(cpus)}","heap_max_mb":${fmtD(Runtime.getRuntime.maxMemory / 1e6)},"complete":$complete,"results":$rs}"""
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"target/annscale_f$factor.json"), line + "\n")
    }
    def time[T](name: String)(f: => T): T = {
      if (recorded.contains(name)) {
        println(f"[ann-scale] $name: skipped (resume, recorded ${recorded(name)}%.2f)")
        return null.asInstanceOf[T]
      }
      val t0 = System.nanoTime; val r = f
      val dt = (System.nanoTime - t0) / 1e9
      recorded(name) = dt
      println(f"[ann-scale] $name: $dt%.2f s")
      writeArtifact(factor, complete = false); r
    }
    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft_ann_scale$factor"
    // the replica corpus is a deterministic function of (source, factor)
    // — but only while the SOURCE is unchanged, so --reuse-corpus is
    // gated on the recorded source signature, not mere existence (a
    // regenerated testdata dir must never be served stale replicas)
    val srcSig = graft.ops.Layout.dataSig(s"$srcDir/embeddings.parquet")
    val sigFile = new java.io.File(s"$scaleDir/_GRAFT_SRC_SIG")
    val reusable = args.contains("--reuse-corpus") &&
      new java.io.File(s"$scaleDir/embeddings.parquet").isDirectory &&
      sigFile.isFile &&
      new String(java.nio.file.Files.readAllBytes(sigFile.toPath)) == srcSig
    if (!reusable) {
      val emb = graft.Tables.embeddings(spark, srcDir)
      emb.crossJoin(spark.range(factor).toDF("r"))
        .select(
          (col("vec_id") * factor + col("r")).as("vec_id"),
          // perturb replicas so vectors are distinct but near the original
          transform(col("embedding"),
            x => x + col("r").cast("float") * lit(1e-4f)).as("embedding"),
          col("label"))
        .write.mode("overwrite").parquet(s"$scaleDir/embeddings.parquet")
      java.nio.file.Files.write(sigFile.toPath, srcSig.getBytes)
    }
    val n = spark.read.parquet(s"$scaleDir/embeddings.parquet").count()
    corpusN = n
    println(s"[ann-scale] corpus: $n vectors")

    // steady-state: run each query twice, report the second (first run
    // in a fresh JVM absorbs codegen + page-cache warm-up)
    def steady(name: String)(f: => Long): Unit = {
      if (recorded.contains(name)) {
        println(f"[ann-scale] $name: skipped (resume, recorded ${recorded(name)}%.2f)")
        return
      }
      f; time(name)(f); ()
    }
    steady("knn/brute_exact")(
      graft.operators.Similarity.knnCosine(spark, scaleDir).count())
    time("index/srp_build (once per corpus)")(
      graft.operators.Similarity.ensureSrpIndex(spark, scaleDir))
    steady("knn/srp_indexed")(
      graft.operators.Similarity.annKnnCosineIndexed(spark, scaleDir).count())
    time("index/ivf_build (once per corpus)")(
      graft.operators.Similarity.ensureIvfIndex(spark, scaleDir))
    steady("knn/ivf_indexed")(
      graft.operators.Similarity.ivfKnnCosineIndexed(spark, scaleDir).count())
    // IVF-PQ: the code scan is 32× narrower than the vectors AND pruned
    // to nprobe lists — the two reductions compose; refine touches only
    // `refine` true vectors. Build cost includes residual-PQ training
    // (8 subspace Lloyd chains over residuals) — once per corpus
    // snapshot.
    time("index/ivfpq_build (residual, once per corpus)")(
      graft.operators.PQ.ensureIvfPqIndex(spark, scaleDir))
    steady("knn/ivfpq_refined (residual)")(
      graft.operators.PQ.ivfpqTopK(spark, scaleDir).count())
    // recall@k at FIXED m: residual vs raw-vector composite, against the
    // exact brute-force truth. Measured at refine = k — the exact-refine
    // stage re-ranks but cannot add candidates, so this isolates the ADC
    // ranking quality, the thing residual encoding exists to improve
    // (with the default refine=50 both composites recover near-full
    // recall at toy scale and the gap is invisible).
    time("index/ivfpq_raw_build (comparison anchor)")(
      graft.operators.PQ.ensureIvfPqRawIndex(spark, scaleDir))
    val recallK = 20
    val truth = graft.operators.Similarity.knnCosine(spark, scaleDir, k = recallK)
      .collect().map(_.getLong(0)).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(_.getLong(0)).count(truth).toDouble / recallK
    val rRes = recallOf(graft.operators.PQ.ivfpqTopK(
      spark, scaleDir, k = recallK, refine = recallK))
    val rRaw = recallOf(graft.operators.PQ.ivfpqTopKRaw(
      spark, scaleDir, k = recallK, refine = recallK))
    println(f"[ann-scale] ivfpq recall@$recallK (fixed m, refine=k): " +
      f"residual=$rRes%.3f raw=$rRaw%.3f")
    // batch serving: 4 queries amortize one pass — the per-query cost
    // is the number to compare against knn/ivf_indexed
    steady("knn/ivf_batch (4 queries, one pass)")(
      graft.operators.Similarity.ivfKnnBatch(spark, scaleDir).count())
    // large-Q batch serving: above BatchDriverRankMax the probe ranking
    // runs DISTRIBUTED through the broadcast codebook — the round-9
    // driver loop (Q × nlist × dim driver flops) is out of the critical
    // path; per-query cost here is the scale-true serving number
    val bigQ = {
      val qn = 1000
      val step = math.max(1L, n / qn)
      (0 until qn).map(_ * step)
    }
    steady(s"knn/ivf_batch_distributed (Q=${bigQ.size}, one pass)")(
      graft.operators.Similarity.ivfKnnBatch(spark, scaleDir, bigQ).count())
    // the composite batch face (round 10): the same amortization over
    // the 32×-narrower code scan — per-query ADC tables ride as a
    // broadcast frame instead of plan literals, so Q scales without
    // the plan growing
    steady("knn/ivfpq_batch (4 queries, one pass)")(
      graft.operators.PQ.ivfpqBatch(spark, scaleDir).count())
    steady(s"knn/ivfpq_batch_distributed (Q=${bigQ.size}, one pass)")(
      graft.operators.PQ.ivfpqBatch(spark, scaleDir, bigQ).count())
    // large-Q serving faces (rounds 11-12): the per-query frames — probe
    // pairs, query vectors, IVF-PQ ADC tables — grow linearly with Q,
    // so above BatchBroadcastMax they switch from broadcast joins to
    // keyed shuffle joins. Round 11 measured only Q=10⁴ (below the
    // cutoff, broadcast's regime); this sweep runs BOTH physical faces
    // at Q = 10⁴ / 3×10⁴ / 10⁵ so the crossover — and the cutoff
    // constant — comes from measurements on both sides (the ADC frame
    // is ~4 KB/query: ≈40 MB, ≈120 MB, ≈400 MB broadcast respectively).
    // A broadcast-face failure at large Q is recorded as a result (the
    // cliff is a finding, not a crash); Q=10⁴ keeps the run-twice
    // steady-state discipline for continuity with the r11 numbers,
    // larger Qs run once (the JVM is warm by then).
    def qSet(qn: Int): Seq[Long] = {
      val step = math.max(1L, n / qn)
      (0 until qn).map(_ * step)
    }
    def faceAttempt(name: String)(f: => Long): Unit =
      try time(name)(f)
      catch { case e: Throwable =>
        recorded(name) = -1.0
        println(s"[ann-scale] $name: FAILED ${e.toString.take(160)}")
        writeArtifact(factor, complete = false)
      }
    for (qn <- Seq(10000, 30000, 100000)) {
      val qs = qSet(qn)
      val once = qn > 10000
      if (once) {
        faceAttempt(s"knn/ivfpq_batch_broadcast (Q=$qn)")(
          graft.operators.PQ.ivfpqBatch(spark, scaleDir, qs,
            broadcastMax = Int.MaxValue).count())
        faceAttempt(s"knn/ivfpq_batch_keyed (Q=$qn)")(
          graft.operators.PQ.ivfpqBatch(spark, scaleDir, qs,
            broadcastMax = 0).count())
      } else {
        steady(s"knn/ivfpq_batch_broadcast (Q=$qn)")(
          graft.operators.PQ.ivfpqBatch(spark, scaleDir, qs,
            broadcastMax = Int.MaxValue).count())
        steady(s"knn/ivfpq_batch_keyed (Q=$qn)")(
          graft.operators.PQ.ivfpqBatch(spark, scaleDir, qs,
            broadcastMax = 0).count())
        steady(s"knn/ivf_batch_broadcast (Q=$qn)")(
          graft.operators.Similarity.ivfKnnBatch(spark, scaleDir, qs,
            broadcastMax = Int.MaxValue).count())
        steady(s"knn/ivf_batch_keyed (Q=$qn)")(
          graft.operators.Similarity.ivfKnnBatch(spark, scaleDir, qs,
            broadcastMax = 0).count())
      }
    }

    // --- semantic dedup scale separation: within-cluster pairing vs
    // all-pairs at the same corpus size. The contract under test: with
    // cluster count scaled so membership stays bounded, the pair search
    // is ~N²/nlist comparisons instead of N²/2 — the reason SemDeDup
    // clusters at all. Since round 8 assignment rides the broadcast
    // codebook (data, not plan), so nlist scales with the corpus — the
    // round-7 ~O(100) literal-expression cap is gone; nlist=512 below
    // would have blown the planner under the old literal embedding.
    val nvec = n
    val nlist = if (factor >= 100) 512 else 64
    println(s"[ann-scale] semdedup: nlist=$nlist, " +
      s"all-pairs=${nvec * (nvec - 1) / 2}, " +
      s"~within-cluster=${nvec * nvec / (2 * nlist)} comparisons")
    time(s"semdedup/index_build nlist=$nlist (once per corpus)")(
      graft.operators.Similarity.ensureIvfIndex(spark, scaleDir, nlist))
    steady(s"semdedup/within_cluster (nlist=$nlist)")(
      graft.operators.Similarity.semanticDedup(spark, scaleDir, nlist)
        .filter(!col("kept")).count())
    if (factor <= 25 && !args.contains("--skip-all-pairs"))
      steady("semdedup/all_pairs ground truth (same τ)")(
        graft.operators.Similarity.embeddingNearDupPairs(spark, scaleDir)
          .count())
    else
      println("[ann-scale] semdedup/all_pairs: skipped (quadratic — " +
        "not runnable at this factor; that is the point)")

    // final artifact write flips the completeness flag
    writeArtifact(factor, complete = true)
    println(s"[ann-scale] wrote target/annscale_f$factor.json")
    spark.stop()
  }
}
