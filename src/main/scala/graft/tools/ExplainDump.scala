package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: dump `explain("formatted")` of the plan-representative
  * queries to PLANS.md — the reviewable record of the physical plans the
  * engine actually produces (pushdown, pruning, broadcast, partial agg,
  * TakeOrderedAndProject, codegen stage boundaries). Regenerate with:
  * `sbt "runMain graft.tools.ExplainDump"`. */
object ExplainDump {
  val Representative: Seq[(String, String)] = Seq(
    "f_compound_pred" -> "filter pushdown to the parquet scan (PushedFilters)",
    "s_scan_project_rename" -> "column pruning (ReadSchema carries only projected columns)",
    "j_multiway_star" -> "star join: one big-big SMJ/shuffled-hash + 3 broadcast dims, cents-sum partial agg",
    "o_sort_limit" -> "top-k as TakeOrderedAndProject (no global sort)",
    "g_group_agg" -> "partial+final hash aggregation (map-side combine)",
    "w_last_wins_dedup" -> "single shuffle on the window partition key",
    "x_knn_cosine" -> "native vector_dot expression + broadcast 1-row query vector + top-k",
    "x_minhash_near_dup" -> "explode + 64 min-aggs, band self-join, exchange reuse",
    "j_star_bucketed" -> "bucketed warehouse star: SMJ over co-located buckets, zero fact-side exchanges",
    "j_asof" -> "as-of join: tagged union + one key shuffle + running-last window (no range join)",
    "x_ann_indexed" -> "materialized SRP index: probe set as PartitionFilters (directory pruning)",
    "x_embed_near_dup_lsh" -> "multi-table SRP-LSH near-dup: one (tbl,bucket) shuffle, no cartesian",
    "t_tumbling_batch" -> "event-time window bucketing as hash agg",
    "x_minhash_indexed" -> "MinHash near-dup from the materialized signature index: banding + verify only, no corpus re-shingle",
    "x_keyword_search" -> "postings-index probe: pushed term filter (row-group skip), candidate-only aggregation",
    "x_hybrid_search" -> "lexical candidates (pushed term filter) + broadcast join + exact cosine re-rank",
    "x_phrase_search" -> "positional intersection: pushed per-term legs normalized to occurrence starts, (doc,start) equi-join chain",
    "x_collocations" -> "PMI collocations: pair counts + broadcast vocabulary-sized unigram joins, integer score, total-order top-k",
    "x_chunk_pack" -> "token-window chunking: one Generate + projection, zero shuffles",
    "o_unpivot" -> "long-format melt as a zero-shuffle Expand",
    "g_pivot" -> "explicit-value pivot: ONE partial+final hash aggregation",
    "w_scd2" -> "SCD2 validity intervals: one key shuffle + per-partition sort, lead() closes intervals",
    "g_grouping_sets" -> "non-hierarchical grouping sets: ONE Expand-fed aggregation",
    "g_hll_merge" -> "mergeable HLL sketches: daily partials unioned per type (re-agg without raw re-scan)",
    "t_gapfill_batch" -> "gap-fill: sequence()+explode dense axis + left join back to sparse counts",
    "x_media_dedup" -> "binary payload dedup: 16-byte digest shuffle over the kind-partitioned layout",
    "s_day_pruned" -> "day-partitioned layout: date predicate as PartitionFilters (one directory opened)",
    "j_range_band" -> "non-equi band join: broadcast tiny band table (no hash key exists)",
    "g_topk_agg" -> "typed bounded-heap Aggregator: partial agg carries <=k pairs per group per partition",
    "j_full_outer" -> "full-outer reconcile: both sides pre-aggregated, join reuses the agg partitioning (no re-exchange)",
    "w_running_distinct" -> "running distinct: two keyed windows (first-occurrence flag + cumsum), no per-frame state",
    "x_bm25" -> "BM25 from the postings index: broadcast df, keyed shuffle for per-doc length, broadcast corpus totals",
    "g_funnel" -> "conversion funnel: per-stage filter+join+min chain, every stage on the user_id partitioning",
    "x_dedup_keep_best" -> "keep-best dedup: materialized cluster index join + one quality-ranking window",
    "x_lm_score" -> "bigram LM stats: keyed count joins (vocabulary never broadcast) + per-doc aggregation",
    "w_rolling_median" -> "rolling exact median: bounded ROWS frame (O(frame) state), one user-key shuffle",
    "x_heavy_hitters" -> "distributed Misra-Gries: <=k rows shuffled per partition, order-free relational merge",
    "x_repetition" -> "repetition stats: codegen'd hashed bigrams, two aggs reusing one doc_id partitioning",
    "x_decontaminate" -> "benchmark decontamination: broadcast eval shingle set, corpus text never shuffled",
    "x_substring_dedup" -> "substring dedup: token_window_hash pre-agg + KEYED window-df join (window vocabulary never broadcast)",
    "x_semantic_dedup" -> "semantic dedup: IVF-index-served clustering, within-cluster pairs only (never all-pairs)",
    "x_ivf_indexed" -> "materialized IVF index: probe set as PartitionFilters over cid, codegen'd nearest_centroid at build",
    "x_image_decode" -> "real PPM decode: batched partition-local parse, integer stats projection, no shuffle before the sort",
    "x_curation_funnel" -> "curation funnel: narrow lang/quality projection + doc_id-keyed stage-flag joins, no cartesian",
    "x_pq_knn" -> "PQ ADC top-k: driver-computed lookup tables, 8-byte code scan, no shuffle before TakeOrdered",
    "x_ivfpq_knn" -> "IVF-PQ composite: probe set as PartitionFilters over the per-list code layout, ADC cut, broadcast exact refine",
    "x_ivf_batch" -> "batch ANN serve: one pruned index scan, broadcast (qid,cid) probe scoping, per-query windowed top-k",
    "s_zorder_pruned" -> "z-order clustered layout: 2-d predicate pruned by parquet min/max tile stats (PushedFilters on both dims)",
    "x_decontaminate_bloom" -> "bloom-prefiltered decontamination: might_contain probe inside the array prune, survivor-only verify join",
    "x_ivfpq_batch" -> "batch IVF-PQ serve: pruned code scan, broadcast per-query ADC tables, per-qid cut + refine windows",
    "x_video_frames" -> "real Y4M decode: batched container parse, per-frame Generate fan-out, no shuffle before the sort",
    "t_merge_read_pruned" -> "MergeTable predicate read: manifest-pruned path-list scan (strict file subset), residual filter pushed, DV anti-join broadcast",
    "t_delete_where" -> "post-DELETE state: manifest-directed scan through the deletion-vector anti-join (broadcast change-set-sized DV side)",
    "t_merge_evolve" -> "schema evolution read: explicit recorded #schema (old files null-fill the new column — no footer scan, no mergeSchema job)",
    "t_sql_read" -> "plain SQL over the registered lake table: FileSourceScan planned over the manifest-backed FileIndex (listing + file skipping + sizes all from manifest metadata)",
    "t_merge_read_str" -> "string manifest stats: band + status predicate pruned planner-side from the 8-byte-prefix embedded #cstat ranges, residual filter pushed to the scan",
    "t_hilbert_read" -> "hilbert-clustered lake read: price band pruned from post-compaction #cstat tiles (file subset decided with zero footer reads)",
    "t_sql_merge" -> "SQL MERGE INTO state read-back: the post-merge table through the registered name (the merge itself ran as one COW change batch)",
    "t_lake_agg_view" -> "lake aggregate view: node-sized partial relation folded per group — never a table scan (maintenance is drain-window-sized)",
    "t_merge_str_key" -> "string-keyed lake table: exact-string identity joins; manifest ranges prefix-embedded for pruning only",
    "t_merge_composite" -> "composite-key lake table: tuple-identity netting, leading-column manifest ranges + trailing-column #cstat residuals",
    "t_delete_auto" -> "stats-dispatched DELETE read-back: DV regime for the trickle, scoped COW for the bulk — both through the same manifest-directed scan",
    "t_cluster3d_read" -> "n-dim clustered read: a 2-of-3-dims band served from ~cubic tiles via #cstat ranges (zero footer reads to prune)",
    "t_sql_create" -> "catalog DDL lifecycle read-back: CREATE/INSERT/MERGE through the capability-less handle onto the manifest-pruned plan",
    "t_sql_alter" -> "post-ALTER read: metadata-only widened #schema — old files null-fill the added column with zero data movement",
    "t_stream_sink" -> "graft-merge sink end state: fenced micro-batch merges (auto-priced COW/MOR) read back manifest-directed",
    "t_merge_occ_mor" -> "optimistic MOR/auto dispatch: trickle writer's DV sidecar + bulk writer's COW rewrite arbitrated in one history, read through the DV anti-join",
    "t_cluster_str_read" -> "string-dim clustered read: (key band × status) box pruned from prefix-embedded #cstat tiles of the interleaved layout",
    "t_change_feed_cow" -> "CDF across a COW rewrite window: bag-EXCEPT netting over added/removed file sets — cost ∝ changed files, output = true change rows only",
    "t_change_feed_updates" -> "CDF update pairing: one key-partitioned window relabel over the change-set-sized feed (pre/post images — no second table scan)",
    "t_merge_read_in" -> "IN-list lookup: per-point candidate-set union + bloom refinement planner-side — the scan opens point files, never the points' hull")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "/root/repo/PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport() // see the warehouse tables Verify materialized
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append("Generated by `graft.tools.ExplainDump` (explain(\"formatted\"), ")
    sb.append(s"sf dir `$dir`). Each plan is the shape asserted in PlanSpec —\n")
    sb.append("the 100 TB contract: pushdown, pruning, broadcast, partial agg,\n")
    sb.append("top-k without global sort, codegen stage coverage.\n")
    Representative.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n$why\n\n```\n$formatted```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
