package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregator — the UDAF face of the custom-function
  * surface (scalar = native Catalyst expressions like FloatArrayDot,
  * generator = built-in explode; this completes the matrix).
  *
  * Input rows are (group key, id, score-cents); the aggregator keeps the
  * k largest (score, id) pairs, ordered score DESC then id ASC
  * (deterministic tiebreak). Scores are exact integer cents (DetMath
  * domain) so the order is total and engine-stable.
  *
  * Scale story: a window row_number() ranks by SORTING every group's
  * rows (full shuffle + per-partition sort of the whole input); this
  * aggregator carries AT MOST k pairs per group per partition — partial
  * (map-side) aggregation bounds the shuffle to k·groups·partitions
  * rows regardless of input size, and merge is associative. At 100 TB
  * "top 3 per type" must not sort 100 TB.
  *
  * The buffer is a sorted Seq capped at k: insertion is O(k) — right
  * for dashboard-sized k, and the immutable product type keeps the
  * Encoder columnar (no kryo blobs). */
class TopKAggregator(k: Int)
    extends Aggregator[(String, Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  /** (score, id) ordering: score DESC, id ASC. */
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    if (buf.size >= k && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre :+ x) ++ post.take(k - pre.size - 1)
    }

  override def zero: Seq[(Long, Long)] = Seq.empty

  /** Input = (group key — ignored here, grouping is external —, id,
    * score-cents). */
  override def reduce(buf: Seq[(Long, Long)], in: (String, Long, Long)): Seq[(Long, Long)] =
    insert(buf, (in._3, in._2))

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
