package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits — the 100 TB contract, asserted:
  * filters reach the parquet scan, small dims broadcast, top-k never
  * global-sorts, scans prune columns, hot expressions stay inside
  * WholeStageCodegen. A plan regression here is a scale bug even when
  * results stay correct. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.Sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("filters push down to the parquet scan") {
    val p = plan("f_compound_pred")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("o_totalprice"), p)
  }

  test("scans prune to the projected columns only") {
    val p = plan("s_scan_project_rename")
    assert(p.contains("ReadSchema"), p)
    // pruned: the 11-column lineitem scan reads only the 5 projected
    assert(!p.contains("l_extendedprice"), "unprojected column read:\n" + p)
  }

  test("dimension joins broadcast (no fact-side shuffle for dims)") {
    val p = plan("j_multiway_star")
    assert(p.contains("BroadcastHashJoin"), p)
    // customer/nation/region all broadcast at test scale (customer via
    // stats, nation/region via hint): 3+ broadcast exchanges
    assert("BroadcastExchange".r.findAllIn(p).size >= 3, p)
  }

  test("customer falls back to a shuffle join when stats say big; hinted dims stay broadcast") {
    // simulate the 100×-scale planner input: stats put customer above the
    // broadcast threshold. The un-hinted customer must NOT be forced into
    // a broadcast build (the r1 hard-coded hint was an executor OOM at
    // scale); nation/region keep their explicit hints regardless.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
      val p = plan("j_multiway_star")
      assert(p.contains("c_custkey"), p)
      // the two hinted dims still broadcast…
      assert("BroadcastExchange".r.findAllIn(p).size == 2, p)
      // …while customer (and lineitem⋈orders) join via shuffle
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed star query joins lineitem⋈orders with zero fact-side exchanges") {
    // force the shuffle-join regime (at warehouse scale neither fact side
    // broadcasts); hinted dims still broadcast. The big join must consume
    // co-located buckets: no hashpartitioning exchange on either join key.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("j_star_bucketed")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("SelectedBucketsCount"), "not a bucketed scan:\n" + p)
      assert(!p.contains("hashpartitioning(l_orderkey"),
        "lineitem side still shuffles:\n" + p)
      assert(!p.contains("hashpartitioning(o_orderkey"),
        "orders side still shuffles:\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("day-pruned events query reads exactly one day partition") {
    val p = plan("s_day_pruned")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("day#"), "no partition filter on day:\n" + p)
    assert(!p.contains("PushedFilters: [In(day") &&
      !p.contains("PushedFilters: [IsNotNull(day"),
      "day must prune partitions, not filter rows:\n" + p)
  }

  test("calendar-dim join dynamically prunes fact day partitions") {
    // the day values live only in the filtered dim, so the fact scan's
    // PartitionFilters must carry a runtime dynamicpruning subquery —
    // not a static In(day,…) and not a row-level pushed filter
    val p = plan("j_dpp")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("dynamicpruning"), "no DPP subquery on the fact scan:\n" + p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("indexed ANN probes prune to bucket partitions at the scan") {
    val p = plan("x_ann_indexed")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("bucket#"), "no partition filter on bucket:\n" + p)
    // the probe set is a partition filter, not a post-scan data filter
    assert(!p.contains("PushedFilters: [In(bucket"), p)
  }

  test("indexed IVF probes prune to list partitions at the scan") {
    val p = plan("x_ivf_indexed")
    assert(p.contains("PartitionFilters: ["), p)
    assert(p.contains("cid#"), "no partition filter on cid:\n" + p)
    assert(!p.contains("PushedFilters: [In(cid"), p)
  }

  test("IVF-PQ refine is an id lookup: pushed IN filter on the vector scan") {
    // the final plan (the refine) fetches the `refine` ADC winners by
    // id: the filter must reach the parquet scan so row-group min/max
    // skip everything else — not a join, not a post-scan filter only
    val p = plan("x_ivfpq_knn")
    assert(p.contains("PushedFilters: [In(vec_id"), p)
    // the candidate-cut stage itself prunes cid partitions — asserted
    // against the candidate subquery's own plan in DedupSimilaritySpec
    // (the refine plan no longer contains the code scan: the ADC cut
    // ran eagerly to produce the id list)
  }

  test("a selective dim filter injects a runtime bloom filter into the fact scan") {
    // the row-level runtime-pruning lever at warehouse scale: when a dim
    // side carries a selective predicate, Catalyst can build a bloom
    // filter of its join keys at runtime and apply it on the fact side
    // BEFORE the shuffle — at 100 TB that drops most of the shuffle
    // input. The size thresholds are tuned for real clusters; shrink
    // them to the test corpus to show the rewrite fires.
    import org.apache.spark.sql.functions.col
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1B",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val urgent = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, dir)
        .join(urgent, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        "no runtime bloom filter on the fact side:\n" + p)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("ORC warehouse round-trip preserves values and pushes filters to the scan") {
    // format breadth for the warehouse surface (A13's bulk load is not
    // parquet-specific): the columnar ORC path must carry the same
    // pushdown contract as parquet
    import org.apache.spark.sql.functions.col
    val dirOut = java.nio.file.Files.createTempDirectory("graft_orc").toFile
    dirOut.deleteOnExit()
    val src = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_shipdate"))
    src.write.mode("overwrite").orc(dirOut.getAbsolutePath)
    val back = spark.read.orc(dirOut.getAbsolutePath)
      .filter(col("l_quantity") > 25.0)
    val p = back.queryExecution.executedPlan.toString
    // anchor on the scan node's own format marker — a path substring
    // ("…/graft_orc…") must not be able to satisfy this assert
    assert(p.contains("FileScan orc") || p.contains("OrcScan"), p)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"), p)
    val expect = src.filter(col("l_quantity") > 25.0).count()
    assert(back.count() === expect && expect > 0)
    // deleteOnExit cannot remove a non-empty dir — clean up explicitly
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(); ()
    }
    rm(dirOut)
  }

  test("ORDER BY + LIMIT plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("o_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("group aggregation is partial+final hash agg") {
    val p = plan("g_group_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), "no map-side partial aggregation:\n" + p)
  }

  test("source profile aggregates partial+final: a hot source combines map-side") {
    // the skew mitigation for x_source_profile (round 10): an 80%-hot
    // source never skews the exchange because every map task pre-combines
    // to ≤ one row per source BEFORE shuffling — the partial HashAggregate
    // below the exchange IS the treatment (CurationIngestBench measures
    // skewed ≈ uniform under it; SkewOps two-phase stays for
    // large-per-group-state aggs, which these constant-size sums are not)
    val p = plan("x_source_profile")
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      "no map-side partial aggregation before the per-source exchange:\n" + p)
  }

  test("native vector_dot is planned in knn and compiles under WholeStageCodegen") {
    val knn = SparkEntry.queries("x_knn_cosine")(spark, dir)
    assert(knn.queryExecution.executedPlan.toString.contains("vector_dot"))
    assert(knn.count() > 0)
    // force the codegen path through a pure projection (the `*(n)` stage
    // marker proves the expression generated compilable Java, no fallback)
    import graft.functions.VectorFunctions.dot
    val proj = Tables.embeddings(spark, dir)
      .select(dot(org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
    val p = proj.queryExecution.executedPlan.toString
    assert(p.contains("*("), "vector_dot projection not codegen'd:\n" + p)
    assert(proj.count() > 0)
  }

  test("semi/anti joins ship only the key column") {
    val p = plan("j_anti")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("o_totalprice"), "anti join reads non-key columns:\n" + p)
  }

  test("full-outer reconcile joins on the aggs' own partitioning (3 exchanges total)") {
    val p = plan("j_full_outer")
    assert(p.contains("FullOuter"), p)
    // one shuffle per side's pre-aggregation + one for the output order —
    // an exchange BETWEEN a final HashAggregate and the join would mean
    // the join failed to reuse the agg partitioning (a 4th exchange)
    assert("Exchange".r.findAllIn(p).size === 3,
      "full-outer join must reuse the pre-agg partitioning:\n" + p)
  }

  test("running distinct plans two keyed windows, no per-frame distinct") {
    val p = plan("w_running_distinct")
    // flag window on (user, type), cumsum window on (user), output sort
    assert("Window".r.findAllIn(p).size === 2, p)
    assert("Exchange".r.findAllIn(p).size === 3, p)
  }

  test("bm25 broadcasts df and corpus totals; no cartesian product") {
    val p = plan("x_bm25")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"),
      "corpus totals must ride a broadcast, not a cartesian:\n" + p)
  }

  test("repetition stats shuffle hashed bigrams, never strings") {
    val p = plan("x_repetition")
    // the codegen'd token_window_hash emits 8-byte keys directly — no
    // bigram string exists anywhere in the plan…
    assert(p.contains("token_window_hash"), p)
    // …and both aggs are partial+final (map-side combine before each of
    // the two keyed exchanges; the third is the output range sort)
    assert("Exchange".r.findAllIn(p).size === 3, p)
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("decontamination broadcasts the benchmark side; corpus text never shuffles") {
    val p = plan("x_decontaminate")
    // benchmark shingles ride a broadcast into a left-outer probe of the
    // corpus side — the corpus explode feeds the join with no exchange
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("LeftOuter"), p)
    // shuffle exchanges: benchmark distinct (hashed shingles), per-doc
    // agg (3-long rows, post-combine), output range sort — never text;
    // plus the one benchmark-side broadcast
    assert("Exchange (hash|range)partitioning".r.findAllIn(p).size === 3, p)
    assert("BroadcastExchange".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("embedding decontamination broadcasts the benchmark; corpus vectors never shuffle") {
    val p = plan("x_embed_decontaminate")
    // the small benchmark side rides ONE broadcast into a nested-loop
    // probe of the corpus scan; the per-doc max collapses map-side
    // (partial_max), so the only exchanges are the narrow post-agg hash
    // and the output range sort — corpus embeddings never shuffle
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert("BroadcastExchange".r.findAllIn(p).size === 1, p)
    assert(p.contains("partial_max"), p)
    assert("Exchange (hash|range)partitioning".r.findAllIn(p).size === 2, p)
  }

  test("curation funnel composes stage plans without a cartesian; flag joins stay keyed") {
    val p = plan("x_curation_funnel")
    assert(!p.contains("CartesianProduct"), p)
    // repetition/substring/decontamination stages all hash n-grams via
    // the codegen'd expression — no n-gram string in any exchange
    assert(p.contains("token_window_hash"), p)
    // the substring occurrence relation is localCheckpoint'd: its two
    // consumers (document frequency + flag join) read the materialized
    // RDD, not a second documents scan
    assert(p.contains("Scan ExistingRDD"), p)
    // the benchmark shingle set rides a broadcast (decontamination stage)
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
