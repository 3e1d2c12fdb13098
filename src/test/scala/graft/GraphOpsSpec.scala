package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Fixed-point PageRank: exact agreement with a scalar reference on a
  * hand-built graph, mass conservation up to deterministic truncation
  * dust, and the ranking property the score exists for (hubs above
  * leaves). The cross-engine exactness of the ten-superstep replay is
  * gated by the x_pagerank oracle. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Scalar reference: the same truncating fixed-point recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keys.toSeq.sorted
    val n = nodes.size.toLong
    val base = GraphOps.Scale * 15L / 100L / n
    var r = nodes.map(_ -> GraphOps.Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2)
      r = nodes.map { v =>
        val s = in.getOrElse(v, Seq.empty).iterator
          .map { case (u, _) => r(u) / out(u) }.sum
        v -> (base + 85L * s / 100L)
      }.toMap
    }
    r
  }

  // a small asymmetric-but-symmetrized graph: node 1 is a hub (linked
  // by everyone), node 5 hangs off one spoke
  private val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L))
  private val edges = pairs ++ pairs.map(_.swap)

  test("distributed supersteps ≡ the scalar fixed-point reference, " +
      "every iteration count") {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(1, 3, 10)) {
      val got = GraphOps.pagerankOf(df, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reference(edges, iters), s"diverged at $iters iterations")
    }
  }

  test("keyed (beyond-broadcast) face ≡ broadcast face ≡ reference") {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    // broadcastMaxNodes = 0 forces the co-partitioned keyed regime the
    // big-graph path uses; results must be identical bit-for-bit
    // (singleTaskMaxEdges = 0 forces past the one-task regime too)
    val keyed = GraphOps.pagerankOf(df, 10, broadcastMaxNodes = 0,
      singleTaskMaxEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed === reference(edges, 10))
  }

  test("single-task regime (r19) ≡ the distributed loop, every " +
      "iteration count — forced via the injectable cutoff") {
    import spark.implicits._
    val df = edges.toDF("src", "dst")
    for (iters <- Seq(0, 1, 3, 10)) {
      // default cutoff → the one-task regime
      val oneTask = GraphOps.pagerankOf(df, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // cutoff 0 → the distributed broadcast-regime loop
      val dist = GraphOps.pagerankOf(df, iters, singleTaskMaxEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(oneTask === dist, s"regimes diverged at $iters iterations")
      if (iters > 0) assert(oneTask === reference(edges, iters))
    }
  }

  test("epsilon-stop: a converged graph stops early with EXACTLY the " +
      "full-run ranks; eps=0 always runs every iteration; lineage cuts " +
      "change nothing") {
    import spark.implicits._
    // a 100-cycle, symmetrized: uniform ranks are an exact fixed point
    // of the truncating recurrence from step 0 (n divides Scale evenly,
    // per-node rank is even), so the single-step delta is 0 at the
    // first probe
    val n = 100
    val cyc = (0 until n).flatMap(i => Seq(
      (i.toLong, ((i + 1) % n).toLong), (((i + 1) % n).toLong, i.toLong)))
    val df = cyc.toDF("src", "dst")
    val (early, itEarly) = GraphOps.pagerankConverged(df, 30,
      checkpointEvery = 5, epsilonFp = 1L)
    assert(itEarly < 30, s"convergence must stop early, ran $itEarly")
    val full = GraphOps.pagerankOf(df, 30).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val earlyMap = early.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(earlyMap === full, "early stop must be bit-equal to the full run")
    assert(earlyMap.values.toSet === Set(GraphOps.Scale / n),
      "the cycle's fixed point is the uniform distribution")
    // eps=0 (the oracled face's setting): every iteration runs
    val (_, itAll) = GraphOps.pagerankConverged(df, 7, checkpointEvery = 2)
    assert(itAll === 7)
    // lineage cuts are pure mechanics: any cadence, same ranks — on the
    // NON-converged hub graph too
    val hub = edges.toDF("src", "dst")
    val ck1 = GraphOps.pagerankOf(hub, 10, checkpointEvery = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ck1 === reference(edges, 10),
      "per-step checkpointing must not alter the recurrence")
    // a probe on a NOT-yet-converged graph must not stop it
    val (_, itHub) = GraphOps.pagerankConverged(hub, 10,
      checkpointEvery = 2, epsilonFp = 1L)
    assert(itHub === 10, "the hub graph is not converged at eps=1")
  }

  test("mass is conserved up to truncation dust; hubs outrank leaves") {
    import spark.implicits._
    val got = GraphOps.pagerankOf(edges.toDF("src", "dst"), 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each division truncates < 1 unit of 10^-12 rank per node per step:
    // total loss over 10 steps is tiny relative to SCALE
    val total = got.values.sum
    assert(total <= GraphOps.Scale && total > GraphOps.Scale - 1000L,
      s"mass off: $total vs ${GraphOps.Scale}")
    // the degree-3 hub must outrank every degree-1 leaf
    assert(got(1L) > got(3L) && got(1L) > got(5L))
    assert(got(5L) < got(4L), "a leaf outranked its own spoke")
  }
}
