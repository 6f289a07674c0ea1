package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitter sketch: at most `k` counters over a
  * stream of items, with the classic guarantee that any item whose true
  * frequency exceeds n/(k+1) keeps a POSITIVE counter — so the kept key
  * set is a guaranteed SUPERSET of the heavy hitters at any threshold
  * above n/(k+1). w6 exploits that one-sidedness for an EXACT result in
  * bounded memory: sketch → candidate keys → exact recount of candidates
  * only (the same approximate-prune / exact-residual shape as q37's
  * bloom join), which is why it can be oracle-gated against the plain
  * GROUP BY ... HAVING even though the sketch itself is lossy.
  *
  * Mergeability (Agarwal et al., "Mergeable Summaries"): summing two
  * summaries' counters then decrementing all by the (k+1)-largest count
  * and dropping non-positive ones yields a valid k-counter summary whose
  * undercount error adds — total error stays <= n/(k+1) under any merge
  * tree, so partial aggregation ships <= k counters per map partition
  * (the whole point: the long tail never reaches the shuffle).
  *
  * The SKETCH's surviving key set depends on partitioning (which ties get
  * decremented first); w6's final answer does NOT, because the recount is
  * exact and the guarantee makes every true heavy hitter a candidate
  * under every partitioning (pinned by MisraGriesSpec).
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all step: drop keys reaching zero; the arriving item
        // is "cancelled" against one unit of every tracked key
        b.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-largest count from everything; <= k survive
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
