package graft.functions

import scala.collection.mutable

/** Misra-Gries heavy-hitters summary — the FREQUENCY member of the
  * mergeable-sketch family (HLL = distinct, KLL = percentile; this
  * completes the triad). A k-counter MG summary undercounts every item
  * by at most n/(k+1) of the stream it saw, and summaries MERGE:
  * sum counters exactly (order-free), then subtract the (k+1)-th
  * largest counter once — which is what lets per-partition summaries
  * shuffle as ≤ k rows per partition instead of one row per token
  * occurrence. Classic bound (Misra & Gries 1982; merge per Agarwal et
  * al., "Mergeable Summaries", PODS'12). */
object HeavyHitters {

  /** One pass of Misra-Gries with k counters over a partition's items
    * (terms for the text query, join keys for skew statistics).
    * Deterministic for a given input order (Spark's parquet partition
    * row order is stable), O(k) space, amortized O(1) per item. */
  def mgSummary[T](it: Iterator[T], k: Int): Map[T, Long] = {
    require(k > 0, s"heavy-hitters needs k > 0, got $k")
    val counters = mutable.Map.empty[T, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters.update(t, c + 1)
        case None if counters.size < k => counters.update(t, 1L)
        case None =>
          // decrement-all step: every counter gives up 1; zeros drop.
          // This is the step that charges the undercount bound n/(k+1).
          val dead = mutable.ArrayBuffer.empty[T]
          counters.mapValuesInPlace { (_, c) => c - 1 }
          counters.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.foreach(counters.remove)
      }
    }
    counters.toMap
  }
}
