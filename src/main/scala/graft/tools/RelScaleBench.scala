package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Relational-side scale-separation experiment (SURVEY §6 — the
  * warehouse complement of ScaleBench's dedup story): replicate the
  * sf0.1 fact tables `factor`× (orderkeys remapped so the
  * lineitem⋈orders key structure is preserved — every order keeps its
  * lineitem fan-out) and measure, steady-state:
  *
  *  1. `j_multiway_star` (per-query shuffle of both fact sides) vs
  *     `j_star_bucketed` (shuffle paid once at write time, zero
  *     fact-side exchanges per query) — the bucketed plan's win must
  *     GROW with the factor, because the shuffle it removes grows
  *     linearly while the bucket-local join cost is the same work
  *     partitioned differently;
  *  2. `g_topk_agg` (typed bounded-heap Aggregator, shuffle carries
  *     ≤ k rows per group per partition) vs the window rank() form on a
  *     replicated events projection. Spark 4.1 plans the latter with
  *     WindowGroupLimit (map-side partial top-k), so BOTH forms are
  *     shuffle-bounded — the measured comparison is local sort cost
  *     (O(n log n) group-limit sort vs O(n log k) heap) plus the
  *     Aggregator's mergeable-partial property; see inline notes.
  *
  * Both comparisons assert result equality before timing: a fast wrong
  * plan is not a result.
  *
  * Run: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.RelScaleBench
  * /root/testdata/sf0.1 10"` (factor 10 ≈ sf1: 6 M lineitem rows).
  */
object RelScaleBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config(graft.Sessions.conf(cpus))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed tables live in the session catalog; Derby-backed so the
      // replica warehouse persists across runs like Bench/Verify's
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[relscale] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // shuffle-write bytes of one executed query, read from the SQL
    // metrics of its OWN physical plan: local wall-clock understates the
    // bucketed/heap plans' advantage (a local "shuffle" is a memory
    // copy; on a 1000-executor cluster it is the network), so the
    // cluster-relevant number is how many bytes each plan moves
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
    // pin a conf for the duration of one measurement, restoring after —
    // lets the same query be measured in the local regime (AQE broadcasts
    // a 24 MB orders side) and the cluster regime (at 100 TB no fact side
    // fits ANY broadcast threshold, so the planner must shuffle)
    def withConf(kvs: (String, String)*)(f: => Unit): Unit = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach { case (k, o) =>
        o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
    }
    val NoBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // steady-state discipline: first run of a plan in a fresh JVM pays
    // JIT + codegen + page-cache; report the second run. Each run gets a
    // FRESHLY-built frame: re-running an action on the same Dataset
    // object reuses its executed plan and its map outputs (stages skip),
    // which would measure only the reduce side. collect(), not count():
    // results here are ≤15 rows, and count() would execute a SEPARATE
    // count-optimized QueryExecution whose metrics (and work!) differ
    // from the query under test — collect() runs the frame's own plan,
    // which is also the one shuffleMB reads
    // median of 3 timed runs: single-run wall-clock on a shared box
    // swings 5-10× (measured); the shuffle-byte column is deterministic
    // and is the cluster-relevant number regardless
    def steady(name: String)(mk: => DataFrame): Unit = {
      mk.collect()
      val runs = (1 to 3).map { _ =>
        val fresh = mk
        val t0 = System.nanoTime
        fresh.collect()
        ((System.nanoTime - t0) / 1e9, shuffleMB(fresh))
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"[relscale] $name: $med%.2f s (median of 3: ${runs.map(r => f"${r._1}%.2f").mkString("/")})")
      println(f"[relscale] $name shuffle-write: ${runs.head._2}%.3f MB")
    }

    val scaleDir = s"${sys.props("java.io.tmpdir")}/graft_relscale$factor"
    // orderkey remap key*factor+r keeps per-order lineitem fan-out and
    // key density; o_custkey unchanged — each customer's order count
    // grows with the corpus, which is how a real warehouse grows
    val sig = s"f${factor}_${graft.ops.Layout.dataSig(s"$srcDir/lineitem.parquet")}"
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
      Seq("customer", "nation", "region").foreach(t =>
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$scaleDir/$t.parquet"))
      // slim events projection for the top-k comparison (the raw events
      // table is TIMESTAMP(NANOS); the comparison needs only these three)
      graft.Tables.events(spark, srcDir).crossJoin(r)
        .select((col("event_id") * factor + col("r")).as("event_id"),
          col("event_type"), col("value"))
        .write.mode("overwrite").parquet(s"$scaleDir/events_flat.parquet")
    }
    val nLi = spark.read.parquet(s"$scaleDir/lineitem.parquet").count()
    println(s"[relscale] corpus: factor $factor, $nLi lineitem rows")

    // --skew-only re-runs just the skewed-star section (its fixture and
    // measurements are self-contained; the earlier sections' numbers
    // are already on record)
    val skewOnly = args.contains("--skew-only")

    if (!skewOnly) {
    // --- star join: per-query shuffle vs bucketed ---------------------
    def shuffled = graft.ops.Joins.multiwayStar(spark, scaleDir)
    time(s"star/bucketed_build_etl (once per snapshot)")(
      graft.ops.Layout.ensureBucketedStar(spark, scaleDir))
    def bucketed = graft.ops.Joins.multiwayStarBucketed(spark, scaleDir)
    assert(shuffled.collect().toSeq == bucketed.collect().toSeq,
      "bucketed star must equal shuffled star")
    // local regime: AQE sees a 24 MB projected orders side and broadcasts
    // it, so the un-bucketed star barely shuffles HERE — that is itself a
    // scale finding (AQE rescues mid-size joins), but it evaporates at
    // 100 TB where no fact side can broadcast. The forced-SMJ run is the
    // cluster-regime measurement: every fact-fact join shuffles both
    // sides, which is exactly the per-query cost the bucketed layout
    // amortizes into its one-time ETL write.
    steady("star/shuffled AQE-default (local regime: dims+orders broadcast)")(shuffled)
    withConf(NoBroadcast: _*) {
      steady("star/shuffled forced-SMJ (cluster regime)")(shuffled)
      steady("star/bucketed forced-SMJ (cluster regime)")(bucketed)
    }
    steady("star/bucketed (j_star_bucketed plan)")(bucketed)

    // --- top-k per group: bounded heap vs window rank -----------------
    def events = spark.read.parquet(s"$scaleDir/events_flat.parquet")
    def heap = graft.ops.Aggregates.topKFromEvents(spark, events, k = 3)
    def windowed = {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value_cents").desc, col("event_id"))
      events
        .select(col("event_type"), col("event_id"),
          graft.functions.DetMath.cents(col("value")).as("value_cents"))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select(col("event_type"), col("rank"), col("event_id"),
          col("value_cents"))
        .orderBy(col("event_type"), col("rank"))
    }
    assert(heap.collect().toSeq == windowed.collect().toSeq,
      "heap top-k must equal window top-k")
    // Measured finding (factor 10): Spark 4.1's InferWindowGroupLimit
    // plans the rank()≤k filter as Sort → WindowGroupLimit(Partial)
    // BEFORE the exchange, so the window form ALSO shuffles only
    // k rows/group/partition — the optimizer closed the naive "window
    // shuffles every row" gap. Both plans' shuffle-write is ~KB at 1M
    // input rows (verified below). What the typed Aggregator still buys:
    // no per-partition FULL sort (heap is O(n log k) vs the group-limit's
    // O(n log n) local sort — it wins wall-clock below), and a mergeable
    // partial (TopKAggregator's merge law) that re-aggregates across
    // micro-batches, which no filtered-window plan offers.
    steady("topk/heap_aggregator (g_topk_agg plan)")(heap)
    steady("topk/window_rank (WindowGroupLimit plan)")(windowed)

    // --- event-sequence ops: running distinct + funnel at factor× -----
    // user_id is NOT remapped, so each user's history grows factor× —
    // the long-history regime where per-frame state policy decides
    // whether keyed windows survive (a 100 TB user timeline is long)
    val seqDir = s"$scaleDir-seq"
    graft.ops.Layout.ensureSigGated(seqDir, sig) {
      val r = spark.range(factor).toDF("r")
      graft.Tables.events(spark, srcDir).crossJoin(r)
        .select((col("event_id") * factor + col("r")).as("event_id"),
          col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .write.mode("overwrite").parquet(s"$seqDir/events_seq.parquet")
    }
    def eseq = spark.read.parquet(s"$seqDir/events_seq.parquet")
    // reduce the 1M-row window outputs to one checksum row so steady()
    // times the windows, not a driver collect
    def checksum(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt"), sum(col("n")).as("s1"),
        sum(col("n") * col("event_id")).as("s2"))
    def rdFlag(src: DataFrame, valueCol: String) = checksum {
      val wF = Window.partitionBy(col("user_id"), col(valueCol))
        .orderBy(col("ts_us"), col("event_id"))
      val wR = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.withColumn("f",
          when(row_number().over(wF) === 1, lit(1L)).otherwise(lit(0L)))
        .select(col("user_id"), col("event_id"),
          sum(col("f")).over(wR).as("n"))
    }
    def rdSet(src: DataFrame, valueCol: String) = checksum {
      // the naive per-frame-set form: collect_set over the running frame
      // holds every frame's distinct set in window state
      val wR = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      src.select(col("user_id"), col("event_id"),
        size(collect_set(col(valueCol)).over(wR)).cast(LongType).as("n"))
    }
    // regime 1 — LOW distinct cardinality (5 event types): the frame set
    // is bounded at 5, so the "naive" form is fine and saves the
    // flag-window's second shuffle. Honest finding: cardinality, not the
    // frame, decides.
    assert(rdFlag(eseq, "event_type").collect().toSeq ==
      rdSet(eseq, "event_type").collect().toSeq,
      "flag+cumsum running distinct must equal the collect_set form")
    steady("rdistinct_lowcard/flag_cumsum (w_running_distinct plan)")(
      rdFlag(eseq, "event_type"))
    steady("rdistinct_lowcard/collect_set_frame (naive per-frame set)")(
      rdSet(eseq, "event_type"))
    // regime 2 — HIGH distinct cardinality (synthetic item_id, ~5000
    // distinct per user at factor 10): each frame's collect_set holds
    // THOUSANDS of entries and every row materializes the set — this is
    // where the flag+cumsum rewrite (O(1) per frame) is the survival
    // property. A 100 TB running "distinct items touched" is this
    // regime, not the 5-type one.
    def eseqHi = eseq.withColumn("item_id", pmod(col("event_id"), lit(5000L)))
    assert(rdFlag(eseqHi, "item_id").collect().toSeq ==
      rdSet(eseqHi, "item_id").collect().toSeq,
      "high-card: flag+cumsum must equal the collect_set form")
    steady("rdistinct_hicard/flag_cumsum (w_running_distinct plan)")(
      rdFlag(eseqHi, "item_id"))
    steady("rdistinct_hicard/collect_set_frame (naive per-frame set)")(
      rdSet(eseqHi, "item_id"))
    def funnelChain = graft.ops.Aggregates.funnelFrom(
      eseq.select(col("user_id"), col("event_type"), col("ts_us")))
    steady("funnel/min_ts_chain (g_funnel plan)")(funnelChain)

    // --- x_lm_score: r6 per-occurrence string-keyed plan vs the r7
    // pre-aggregated hash-keyed plan ----------------------------------
    // doc_id remapped, text unchanged: occurrences grow factor×, the
    // bigram vocabulary does not — exactly how a crawl corpus grows
    val lmDir = s"$scaleDir-lm"
    graft.ops.Layout.ensureSigGated(lmDir, sig) {
      val r = spark.range(factor).toDF("r")
      graft.Tables.documents(spark, srcDir).crossJoin(r)
        .select((col("doc_id") * factor + col("r")).as("doc_id"),
          col("text"))
        .write.mode("overwrite").parquet(s"$lmDir/documents.parquet")
    }
    def ldocs = spark.read.parquet(s"$lmDir/documents.parquet")
    // the round-6 shape, reconstructed: every bigram OCCURRENCE joins
    // the counts on the raw bigram STRING, and the explode pipeline
    // feeds counts + final join un-checkpointed (runs twice)
    def lmOld = {
      import graft.functions.TextFunctions.shingles
      val big = ldocs.select(col("doc_id"),
        explode(shingles(col("text"), 2)).as("bg"))
      val bc = big.groupBy(col("bg")).agg(count(lit(1)).as("bc"))
        .withColumn("w1", substring_index(col("bg"), " ", 1))
      val uc = bc.groupBy(col("w1")).agg(sum(col("bc")).as("uc"))
      big.join(bc.join(uc, Seq("w1")).select(col("bg"), col("bc"), col("uc")),
          Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("bc")).as("sum_bc"),
          sum(col("uc")).as("sum_uc"), min(col("bc")).as("min_bc"))
    }
    // the r7 operator: timing face keeps its localCheckpoint; the
    // shuffle-byte face disables it so ALL exchanges sit in one plan
    // (a checkpoint hides the pre-agg exchange in a separate job)
    def lmNew = graft.operators.TextAnalysis.lmBigramStatsOf(ldocs)
    def lmNewPlan = graft.operators.TextAnalysis.lmBigramStatsOf(
      ldocs, checkpoint = false)
    def lmChecksum(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("cnt"), sum(col("sum_bc")).as("s1"),
        sum(col("sum_uc")).as("s2"), sum(col("n_bigrams")).as("s3"),
        sum(col("min_bc") * col("doc_id")).as("s4"))
    assert(lmChecksum(lmOld).collect().toSeq ==
      lmChecksum(lmNewPlan).collect().toSeq,
      "r7 lm plan must equal the r6 plan's results")
    steady("lm_score/old per-occurrence string-keyed (r6 plan)")(
      lmChecksum(lmOld))
    steady("lm_score/new pre-agg hash-keyed (x_lm_score plan)")(
      lmChecksum(lmNew))
    steady("lm_score/new no-checkpoint (shuffle-byte face)")(
      lmChecksum(lmNewPlan))
    } // end !skewOnly

    // --- skewed star: one zipf-hot fact key vs AQE skew-join, the
    // bucketed-scan trap, and the salted mitigation --------------------
    // 80% of the replicated lineitem rows collapse onto ONE orderkey
    // (orderkey 1's replica 0): the hot SMJ partition holds ~0.8·n rows
    // while its siblings hold n/(0.2·nkeys). The questions this fixture
    // answers: (1) does AQE's skew split absorb it in the SHUFFLED star;
    // (2) what happens in the BUCKETED star, whose scans have no
    // exchange for AQE to split (the known trap: OptimizeSkewedJoin
    // rewrites shuffle reads, bucketed SMJs read files directly);
    // (3) does the salted fact-fact join (SkewOps) recover it.
    val skewDir = s"$scaleDir-skew"
    graft.ops.Layout.ensureSigGated(skewDir, sig) {
      val r = spark.range(factor).toDF("r")
      graft.Tables.orders(spark, srcDir).crossJoin(r)
        .withColumn("o_orderkey", col("o_orderkey") * factor + col("r"))
        .drop("r")
        .write.mode("overwrite").parquet(s"$skewDir/orders.parquet")
      graft.Tables.lineitem(spark, srcDir).crossJoin(r)
        .withColumn("l_orderkey",
          when(pmod(col("l_orderkey") * factor + col("r"), lit(5)) < 4,
            lit(1L * factor)) // 80% hot: orderkey 1, replica 0
            .otherwise(col("l_orderkey") * factor + col("r")))
        .drop("r")
        .write.mode("overwrite").parquet(s"$skewDir/lineitem.parquet")
      Seq("customer", "nation", "region").foreach(t =>
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$skewDir/$t.parquet"))
    }
    val hotShare = spark.read.parquet(s"$skewDir/lineitem.parquet")
      .filter(col("l_orderkey") === 1L * factor).count().toDouble /
      spark.read.parquet(s"$skewDir/lineitem.parquet").count()
    println(f"[relscale] skew fixture: ${hotShare * 100}%.1f%% of lineitem on one orderkey")
    def skShuffled = graft.ops.Joins.multiwayStar(spark, skewDir)
    time("skewstar/bucketed_build_etl (once per snapshot)")(
      graft.ops.Layout.ensureBucketedStar(spark, skewDir))
    def skBucketed = graft.ops.Joins.multiwayStarBucketed(spark, skewDir)
    assert(skShuffled.collect().toSeq == skBucketed.collect().toSeq,
      "skewed star: bucketed must equal shuffled")
    // statistics-driven mitigation for the bucketed trap: MG detection
    // over the bucketed fact, hot key isolated to a broadcast branch,
    // cold buckets keep the exchange-free SMJ
    def skBucketedAuto =
      graft.ops.Joins.multiwayStarBucketedSkewAware(spark, skewDir)
    assert(skShuffled.collect().toSeq == skBucketedAuto.collect().toSeq,
      "skewed star: skew-aware bucketed must equal shuffled " +
        "(isolation is semantically invisible)")
    // salted mitigation: the fact-fact join spreads the hot key over 32
    // sub-keys; the star tail is unchanged (dims broadcast, same agg)
    def skSalted = {
      val li = graft.Tables.lineitem(spark, skewDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = graft.Tables.orders(spark, skewDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      graft.ops.SkewOps.saltedJoin(li, ord, "l_orderkey", factor = 32)
        .join(graft.Tables.customer(spark, skewDir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.Tables.nation(spark, skewDir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(graft.Tables.region(spark, skewDir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          graft.functions.DetMath.sumMoneyCents(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"))
    }
    assert(skShuffled.collect().toSeq == skSalted.collect().toSeq,
      "skewed star: salted must equal shuffled (salting is semantically invisible)")
    // hot-key ISOLATION — the fact⋈fact mitigation that scales: the one
    // hot key's build row broadcasts (1 row!), the cold 99.99% of keys
    // ride the normal SMJ with their skew gone by construction
    def skIsolated = {
      val li = graft.Tables.lineitem(spark, skewDir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val ord = graft.Tables.orders(spark, skewDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
      graft.ops.SkewOps.isolatedSkewJoin(li, ord, "l_orderkey",
          hotKeys = Seq(1L * factor))
        .join(graft.Tables.customer(spark, skewDir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(graft.Tables.nation(spark, skewDir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(graft.Tables.region(spark, skewDir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          graft.functions.DetMath.sumMoneyCents(
            col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"))
    }
    assert(skShuffled.collect().toSeq == skIsolated.collect().toSeq,
      "skewed star: isolated must equal shuffled (isolation is semantically invisible)")
    // thresholds: the hot partition is ~hundreds of MB here — below the
    // 256 MB default — so pin the skew trigger to the fixture's scale
    // the way a cluster job would tune it
    val SkewSplit = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m")
    withConf(NoBroadcast ++ SkewSplit: _*) {
      steady("skewstar/shuffled forced-SMJ, AQE skew split ON")(skShuffled)
      // record whether the split actually fired: AQEShuffleRead prints
      // "skewed" in the executed plan when OptimizeSkewedJoin rewrote it
      val df = skShuffled; df.collect()
      val planStr = df.queryExecution.executedPlan.toString
      println(s"[relscale] skewstar/shuffled AQE plan mentions skew: " +
        s"${planStr.toLowerCase.contains("skew")}")
    }
    withConf((NoBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false")): _*) {
      steady("skewstar/shuffled forced-SMJ, skew split OFF (unmitigated)")(skShuffled)
    }
    withConf(NoBroadcast ++ SkewSplit: _*) {
      steady("skewstar/bucketed (no exchange -> AQE cannot split the hot bucket)")(skBucketed)
    }
    withConf(NoBroadcast ++ SkewSplit: _*) {
      steady("skewstar/bucketed_auto (MG-detected hot key isolated; cold buckets exchange-free)")(skBucketedAuto)
    }
    // measured under NoBroadcast: unconstrained, the planner broadcast
    // the 32×-replicated orders side (5.2 GB build — the measurement
    // that exposed saltedJoin as the WRONG shape for fact⋈fact; it
    // belongs to large⋈small). Kept as the negative exhibit.
    withConf(NoBroadcast: _*) {
      steady("skewstar/salted 32-way fact join (wrong-shape exhibit)")(skSalted)
    }
    // the RIGHT fact⋈fact mitigation: hot-key isolation — broadcast is
    // |hotKeys| build rows, cold side's skew gone by construction
    withConf(NoBroadcast: _*) {
      steady("skewstar/isolated hot-key join (SkewOps.isolatedSkewJoin)")(skIsolated)
    }

    // --- MERGE INTO at factor: manifest-pruned copy-on-write vs the
    // full-rewrite baseline. Two identical tables from factor-scaled
    // lineitem (keyed uniquely), one narrow change batch (~0.5% of the
    // key space) applied to each — the pruned face must rewrite a small
    // fixed file subset while the baseline rewrites the corpus; results
    // pinned identical before timing -------------------------------
    {
      import graft.streaming.MergeTable
      val mergeBase = graft.Tables.lineitem(spark, srcDir)
        .crossJoin(spark.range(factor).toDF("rep"))
        .select((col("l_orderkey") * lit(1000L) + col("l_linenumber") * lit(100L)
          + col("rep")).as("k"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
      val maxK = 15000L * 1000L
      def buildTable(tag: String): String = {
        val root = new java.io.File(
          s"target/graft-index/mergebench_${tag}_f$factor").getAbsolutePath
        val rootDir = new java.io.File(root)
        if (rootDir.exists) org.apache.commons.io.FileUtils.deleteDirectory(rootDir)
        MergeTable.create(spark, root, mergeBase, "k",
          nFiles = 32, commitTsMillis = 1L)
        root
      }
      val nBase = mergeBase.count()
      val prunedRoot = time(s"mergebench/build table (pruned face), $nBase rows")(buildTable("pruned"))
      val fullRoot = buildTable("full")
      // narrow change batch: updates confined to one 0.5%-wide key band
      val changes = mergeBase
        .where(col("k") < lit(maxK / 200L))
        .select(lit("u").as("op"), col("k").as("seq"), col("k"),
          (col("qty") + 1.0).as("qty"), col("price"))
      val nChanges = changes.count()
      val (tP, cP) = time(s"mergebench/PRUNED merge of $nChanges changes") {
        MergeTable.merge(spark, prunedRoot, changes, "k", nFiles = 4)
      }
      println(s"[relscale] mergebench/pruned: touched=$tP carried=$cP")
      val (tF, cF) = time(s"mergebench/FULL-REWRITE merge of $nChanges changes") {
        MergeTable.merge(spark, fullRoot, changes, "k", nFiles = 32,
          pruneFiles = false)
      }
      println(s"[relscale] mergebench/full: touched=$tF carried=$cF")
      // same final table either way — a fast wrong merge is not a result
      val diff = MergeTable.read(spark, prunedRoot)
        .unionByName(MergeTable.read(spark, fullRoot))
        .groupBy("k", "qty", "price").count().where(col("count") =!= 2)
        .count()
      assert(diff == 0L, s"pruned vs full merge diverged on $diff rows")
    }

    // --- CBO star ordering: the catalog's most-selective-first order
    // vs the worst-first order, at factor — same filtered dimensions,
    // same per-edge broadcast decisions, same rows (order is
    // semantics-free); the measured gap is what the ANALYZE catalog
    // buys at plan time without reading a dimension ------------------
    val cboDir = s"$scaleDir-cbo"
    graft.ops.Layout.ensureSigGated(cboDir, sig) {
      val r = spark.range(factor).toDF("r")
      graft.Tables.lineitem(spark, srcDir).crossJoin(r).drop("r")
        .write.mode("overwrite").parquet(s"$cboDir/lineitem.parquet")
      Seq("part", "supplier", "orders").foreach(t =>
        spark.read.parquet(s"$srcDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$cboDir/$t.parquet"))
    }
    val cboEdges = graft.ops.TableStats.cboStarEdges(spark, cboDir)
    val cboBestOrder = graft.ops.TableStats.starOrder(cboEdges)
    val cboWorstOrder = cboBestOrder.reverse
    println(s"[relscale] cbo star: catalog order = " +
      cboBestOrder.map(e => f"${e.dim}(${e.survival}%.3f)").mkString(" -> "))
    def cboBest = graft.ops.TableStats.starJoinInOrder(spark, cboDir, cboBestOrder)
    def cboWorst = graft.ops.TableStats.starJoinInOrder(spark, cboDir, cboWorstOrder)
    assert(cboBest.collect().toSeq == cboWorst.collect().toSeq,
      "cbo star: join order must be semantics-free")
    // broadcast face: hints still apply under NoBroadcast (the catalog,
    // not the planner's size estimate, decides) — the gap is probe rows
    // reaching the later joins
    withConf(NoBroadcast: _*) {
      steady("cbostar/catalog order (most-selective-first, broadcast edges)")(cboBest)
      steady("cbostar/worst-first order (same broadcast edges)")(cboWorst)
    }
    // shuffle face: every edge forced to SMJ (threshold 0) — the gap is
    // the intermediate SHUFFLE volume between joins
    def cboBestS = graft.ops.TableStats.starJoinInOrder(spark, cboDir, cboBestOrder, 0L)
    def cboWorstS = graft.ops.TableStats.starJoinInOrder(spark, cboDir, cboWorstOrder, 0L)
    withConf(NoBroadcast: _*) {
      steady("cbostar/catalog order (all edges shuffled)")(cboBestS)
      steady("cbostar/worst-first order (all edges shuffled)")(cboWorstS)
    }

    spark.stop()
  }
}
