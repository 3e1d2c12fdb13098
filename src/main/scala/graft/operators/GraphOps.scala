package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics — the Pregel-shaped operator family
  * (message passing = one shuffle per superstep) the curation stack
  * needs for link-structure quality signals: crawl pipelines weigh
  * documents by the centrality of their hosts (PageRank / harmonic
  * centrality over the web graph — Page et al. 1999; Common Crawl
  * publishes exactly this ranking), and the engine already walks
  * graphs for dup-clusters (min-label propagation); this adds the
  * NUMERIC propagation face.
  *
  * Scale shape: one superstep = join(edges, ranks) on src + groupBy dst
  * — two hash shuffles over the edge list, no driver state beyond the
  * node count and the loop counter. The edge relation is materialized
  * once ([[org.apache.spark.sql.Dataset.localCheckpoint]]) so ten
  * supersteps read it ten times instead of re-deriving it; at web-graph
  * scale the same code runs with the edges bucketed by src so every
  * superstep's join is exchange-free on one side, and ranks
  * checkpointed every few supersteps to cut lineage. Nothing here is
  * quadratic: cost = O(iterations × |edges|).
  *
  * Determinism contract: ranks are FIXED-POINT Longs (SCALE = 10¹²) and
  * every division is integer truncation, so Spark's `div` and DuckDB's
  * `//` agree bit-for-bit and the oracle replays all ten supersteps
  * exactly — the same replay discipline as the k-means and GD oracles.
  */
object GraphOps {

  val Scale = 1000000000000L // 10^12 fixed-point
  val Damping = 85L          // ×/100 — the classic 0.85
  val Iterations = 10

  /** The bipartite supply graph, symmetrized: customer c and supplier s
    * are linked iff some lineitem of c's order was supplied by s. Node
    * ids disambiguate the two key domains by parity (custkey×2 even,
    * suppkey×2+1 odd).
    *
    * r19: the lineitem⋈orders edge derivation reads the BUCKETED star
    * layout (the same sig-gated tables j_star_bucketed serves from) —
    * both sides pre-bucketed+sorted by orderkey, so the join is an
    * exchange-free, sort-free bucket-to-bucket SMJ across all buckets
    * (guide §2.4/§6: the raw single-file parquet scans planned ONE
    * split each, so the former derivation ran the join on one core
    * behind a broadcast). Identical rows either way (the bucketed
    * tables are the sig-gated materialization of the same source). */
  /** The distinct (customer, supplier) pair derivation over the
    * bucketed star — pre-checkpoint, exposed so StagePlanProbe can dump
    * its plan (plans/r19/x_pagerank_pairs_after.txt). */
  private[graft] def pairsOf(spark: SparkSession, dir: String): DataFrame = {
    val (liT, ordT) = graft.ops.Layout.ensureBucketedStar(spark, dir)
    val li = spark.table(liT)
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = spark.table(ordT)
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"),
        (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
  }

  private[graft] def edges(spark: SparkSession, dir: String): DataFrame = {
    // materialize the distinct pair set ONCE (r19): the symmetrizing
    // union references it twice, and with the bucketed broadcast join
    // there is no Exchange for Catalyst to reuse — un-checkpointed,
    // the join+distinct subtree executed twice (visible as duplicate
    // scans in plans/r19/x_pagerank_edges_before.txt). Lazy: the
    // caller's edge-count job materializes it.
    val pairs = pairsOf(spark, dir).localCheckpoint(false, graft.ops.Pin.Level)
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Ten exact supersteps of damped PageRank over the supply graph
    * (`x_pagerank`): r'(v) = base + 0.85 · Σ_{u→v} ⌊r(u)/deg(u)⌋, all in
    * truncating fixed-point. The symmetric graph has no dangling nodes,
    * so no leak-redistribution term is needed (truncation dust is
    * deterministic and replayed by the oracle). */
  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankOf(edges(spark, dir), Iterations)

  /** Broadcast the per-superstep rank relation while the graph has at
    * most this many nodes; above it, co-partitioned keyed joins (the
    * same two-regime serving split as batch ANN's BatchBroadcastMax —
    * measured there as an executor-memory cliff, applied here to the
    * |nodes|-sized rank vector). 2²⁰ nodes × 16 bytes ≈ 16 MB broadcast
    * — comfortably under executor memory, far under the cliff. */
  val BroadcastMaxNodes: Long = 1L << 20

  /** The superstep loop over any (src, dst) edge list. Every node must
    * have out-degree ≥ 1 (symmetrize the graph first — a dangling node
    * would leak its mass silently, so the node set is DEFINED as the
    * sources). */
  def pagerankOf(edgeList: DataFrame, iterations: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes,
      checkpointEvery: Int = 5, epsilonFp: Long = 0L,
      singleTaskMaxEdges: Long = SingleTaskMaxEdges): DataFrame =
    pagerankConverged(edgeList, iterations, broadcastMaxNodes,
      checkpointEvery, epsilonFp, singleTaskMaxEdges)._1

  /** Run the WHOLE superstep loop in one task while the edge list fits
    * (≈128 MB of id pairs at the cap — the same one-task bound as
    * [[Dedup.UnionFindMaxEdges]], r19): below it, ten distributed
    * supersteps are ten broadcast-collect job launches over a graph
    * that fits one executor's memory with room to spare, so the loop's
    * cost was pure scheduling. The task replays the identical
    * truncating fixed-point recurrence over compacted arrays —
    * bit-equal output (spec-pinned against the distributed loop via
    * this injectable cutoff). Only the epsilonFp = 0 face (the oracled
    * exact-replay) takes this regime; convergence probing keeps the
    * one distributed implementation. Above the cutoff the
    * broadcast/keyed regimes stand unchanged. */
  val SingleTaskMaxEdges: Long = 1L << 23

  /** [[pagerankOf]] plus the superstep count actually executed (= the
    * convergence diagnostic a long-running job reports).
    *
    * LINEAGE: the rank relation is localCheckpoint'ed every
    * `checkpointEvery` supersteps — without the cut, iteration i's plan
    * nests i joins deep, so planning cost (and recovery re-computation)
    * grows with the iteration count; with it, per-superstep cost is
    * FLAT to 30+ iterations (GraphScaleBench pins this on the
    * factor-10 graph).
    *
    * CONVERGENCE (`epsilonFp` > 0, in the same 10⁻¹² fixed-point domain
    * as the ranks): one SINGLE-step max |Δr| is measured per checkpoint
    * block — the step right after each cut also materializes, and the
    * two adjacent materialized relations join node-sized (no extra
    * superstep is ever computed; the block's other steps pay nothing).
    * The loop stops early once maxΔ < epsilonFp. The delta is
    * single-step on purpose: with epsilonFp = 1 it means EXACT
    * fixed-point convergence — ranks are a deterministic function of
    * the previous ranks, so Δ = 0 over one step pins every later
    * iteration, and early stop ≡ running all requested iterations,
    * bit-for-bit (spec-pinned); a block-spanning delta could in
    * principle be fooled by a period-k orbit of the truncating map. The
    * default epsilonFp = 0 disables the check entirely: the ORACLED
    * face replays exactly `Iterations` supersteps, oracle unchanged. */
  def pagerankConverged(edgeList: DataFrame, iterations: Int,
      broadcastMaxNodes: Long = BroadcastMaxNodes,
      checkpointEvery: Int = 5, epsilonFp: Long = 0L,
      singleTaskMaxEdges: Long = SingleTaskMaxEdges): (DataFrame, Int) = {
    require(checkpointEvery >= 1,
      s"checkpointEvery must be ≥ 1: $checkpointEvery")
    // single-task regime (r19): with epsilonFp = 0 the executed
    // superstep count is `iterations` by definition, so the whole loop
    // can run as ONE task when the edge list fits (see
    // [[SingleTaskMaxEdges]]); the count below doubles as the lazy
    // checkpoint's materializing action
    if (epsilonFp == 0L) {
      val edgesCk = edgeList.localCheckpoint(false, graft.ops.Pin.Level)
      if (edgesCk.count() <= singleTaskMaxEdges)
        return (pagerankSingleTask(edgesCk, iterations)
          .orderBy(col("node_id")), iterations)
      return pagerankDistributed(edgesCk, iterations, broadcastMaxNodes,
        checkpointEvery, epsilonFp)
    }
    pagerankDistributed(edgeList.localCheckpoint(false, graft.ops.Pin.Level),
      iterations, broadcastMaxNodes, checkpointEvery, epsilonFp)
  }

  /** The distributed superstep loop (broadcast or keyed regime) over an
    * already-checkpointed edge list. */
  private def pagerankDistributed(edgesRaw: DataFrame, iterations: Int,
      broadcastMaxNodes: Long,
      checkpointEvery: Int, epsilonFp: Long): (DataFrame, Int) = {
    // Degrees as a NODE-sized aggregate of the in-memory edge copy.
    // (r18: this replaces the former count-over-window degree pass,
    // which sorted the full edge list by src — an edge-sized sort paid
    // for node-sized information.) r19: the checkpoint is LAZY, so the
    // node count below materializes it in one job instead of a
    // dedicated eager job + a count (guide §1.2).
    val deg = edgesRaw.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint(false, graft.ops.Pin.Level)
    // node set and count from the degree relation (out-degree ≥ 1 by
    // the symmetrize precondition, so nodes ≡ sources ≡ deg rows): one
    // scalar of driver state (the same bounded-metadata allowance as
    // the stats catalog)
    val n = deg.count()
    val base = Scale * 15L / 100L / n
    var ranks = deg.select(col("src").as("id"), lit(Scale / n).as("r"))
    // Two join regimes, split on the node count now in hand (the same
    // serving split as batch ANN's BatchBroadcastMax): while the
    // |nodes|-sized rank vector fits a broadcast, each superstep is one
    // broadcast join over the never-moving edges + the groupBy(dst)
    // message pass — and because the edges are checkpointed ALREADY
    // hash-partitioned by dst (AQE disabled during the build so the
    // LogicalRDD carries HashPartitioning instead of the
    // unrepresentable coalesced form), that aggregation needs NO
    // exchange either: a superstep is one mapper-only stage over the
    // pinned partitions (r18 — measured 22 Exchanges → 2 for the
    // 10-superstep plan; the former dst shuffle ran every superstep).
    // Above the cutoff the ranks must shuffle, so the edges pin src
    // partitioning instead, making the keyed join exchange-free and
    // sort-free on the edge side for all iterations.
    val bcast = n <= broadcastMaxNodes
    val edgesD = {
      val ss = edgesRaw.sparkSession
      val aqeKey = "spark.sql.adaptive.enabled"
      val prevAqe = ss.conf.get(aqeKey, "true")
      try {
        ss.conf.set(aqeKey, "false")
        if (bcast)
          edgesRaw.join(broadcast(deg), "src")
            .repartition(col("dst")).localCheckpoint()
        else
          edgesRaw.join(deg, "src").repartition(col("src"))
            .sortWithinPartitions(col("src")).localCheckpoint()
      } finally ss.conf.set(aqeKey, prevAqe)
    }
    var prevCk = ranks
    var i = 0
    var converged = false
    while (i < iterations && !converged) {
      i += 1
      val r = ranks.withColumnRenamed("id", "src")
      val contribs = edgesD
        .join(if (bcast) broadcast(r) else r, "src")
        .select(col("dst").as("id"), expr("r div d").as("c"))
      ranks = contribs.groupBy(col("id"))
        .agg((lit(base) + expr("(85 * sum(c)) div 100")).as("r"))
      val atCut = i % checkpointEvery == 0
      // the step AFTER a cut: both sides of a SINGLE-step delta are
      // materialized, so the convergence probe is one node-sized join
      val atProbe = epsilonFp > 0L && i > 1 &&
        (checkpointEvery == 1 || i % checkpointEvery == 1)
      if ((atCut || atProbe) && i < iterations) {
        // LAZY cut (r19): the logical plan is truncated immediately (the
        // point of the cut), materialization folds into the next
        // superstep's own job instead of a dedicated eager job per cut
        ranks = ranks.localCheckpoint(false, graft.ops.Pin.Level)
        if (atProbe) {
          val maxDelta = ranks.as("a")
            .join(prevCk.as("b"), col("a.id") === col("b.id"))
            .agg(max(abs(col("a.r") - col("b.r")))).head.getLong(0)
          if (maxDelta < epsilonFp) converged = true
        }
        prevCk = ranks
      }
    }
    (ranks.select(col("id").as("node_id"), col("r").as("pr"))
      .orderBy(col("node_id")), i)
  }

  /** The ≤[[SingleTaskMaxEdges]] regime: every superstep of the SAME
    * truncating fixed-point recurrence in one `mapPartitions` task over
    * compacted arrays. Semantics replicate the distributed loop
    * EXACTLY, including its inner-join domain rule on non-symmetrized
    * inputs: r₀ lives on the source set (n = |sources|, the base uses
    * this n every step); step i's domain is the dsts reachable from
    * step i−1's domain, and a contribution u→v counts only when u was
    * in the previous domain (the loop's edges⋈ranks inner join). For
    * the documented symmetric-input contract all domains are the full
    * node set and this is simply the textbook recurrence. */
  private def pagerankSingleTask(edgesRaw: DataFrame,
      iterations: Int): DataFrame = {
    val spark = edgesRaw.sparkSession
    import spark.implicits._
    edgesRaw
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .as[(Long, Long)]
      // coalesce, not repartition: a narrow one-task read of the
      // already-materialized checkpoint blocks (no shuffle stage)
      .coalesce(1).mapPartitions { it =>
        val es = it.toArray
        if (es.isEmpty) Iterator.empty
        else {
          // compact ids (order of first appearance — output carries the
          // original ids, so the mapping is semantics-free)
          val idx = new java.util.HashMap[Long, Integer]()
          val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
          def intern(x: Long): Int = {
            val got = idx.get(x)
            if (got != null) got.intValue
            else {
              val i = ids.length; idx.put(x, Integer.valueOf(i)); ids += x; i
            }
          }
          val srcs = new Array[Int](es.length)
          val dsts = new Array[Int](es.length)
          var e = 0
          while (e < es.length) {
            srcs(e) = intern(es(e)._1); dsts(e) = intern(es(e)._2); e += 1
          }
          val nAll = ids.length
          val deg = new Array[Long](nAll)
          val isSrc = new Array[Boolean](nAll)
          e = 0
          while (e < es.length) {
            deg(srcs(e)) += 1L; isSrc(srcs(e)) = true; e += 1
          }
          var n = 0L
          var v = 0
          while (v < nAll) { if (isSrc(v)) n += 1; v += 1 }
          val base = Scale * 15L / 100L / n
          val r0 = Scale / n
          var r = new Array[Long](nAll)
          val inDom = new Array[Boolean](nAll)
          v = 0
          while (v < nAll) {
            if (isSrc(v)) { r(v) = r0; inDom(v) = true }; v += 1
          }
          var i = 0
          while (i < iterations) {
            i += 1
            val nxt = new Array[Long](nAll)
            val nxtDom = new Array[Boolean](nAll)
            e = 0
            while (e < es.length) {
              val s = srcs(e)
              if (inDom(s)) {
                nxt(dsts(e)) += r(s) / deg(s); nxtDom(dsts(e)) = true
              }
              e += 1
            }
            v = 0
            while (v < nAll) {
              if (nxtDom(v)) nxt(v) = base + 85L * nxt(v) / 100L
              v += 1
            }
            r = nxt
            System.arraycopy(nxtDom, 0, inDom, 0, nAll)
          }
          Iterator.range(0, nAll).filter(inDom(_)).map(w => (ids(w), r(w)))
        }
      }.toDF("node_id", "pr")
  }

  /** The oracle: the same ten supersteps unrolled as chained CTEs (the
    * recursive-term aggregation standard SQL forbids, written out — the
    * iteration count is a compile-time constant, so unrolling is exact,
    * not an approximation). */
  def pagerankOracleSql: String = {
    val head =
      s"""WITH pairs AS (
         |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (
         |  SELECT a AS src, b AS dst FROM pairs
         |  UNION ALL
         |  SELECT b AS src, a AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
         |n AS (SELECT count(*) AS n FROM deg),
         |p0 AS (SELECT src AS id,
         |       CAST($Scale // (SELECT n FROM n) AS BIGINT) AS r FROM deg)""".stripMargin
    val steps = (1 to Iterations).map { i =>
      // CAST back to BIGINT: DuckDB widens sum(BIGINT) to HUGEINT, and
      // the intermediate genuinely fits (85 × total mass < 2^63)
      s"""p$i AS (
         |  SELECT e.dst AS id,
         |         CAST((${Scale * 15L / 100L} // (SELECT n FROM n))
         |           + ($Damping * sum(p.r // deg.d)) // 100 AS BIGINT) AS r
         |  FROM edges e
         |  JOIN p${i - 1} p ON p.id = e.src
         |  JOIN deg ON deg.src = e.src
         |  GROUP BY e.dst)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT id AS node_id, r AS pr FROM p$Iterations ORDER BY node_id"
  }
}
