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
    val keyed = GraphOps.pagerankOf(df, 10, broadcastMaxNodes = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed === reference(edges, 10))
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
