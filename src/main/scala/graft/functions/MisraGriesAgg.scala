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
    extends Aggregator[String, scala.collection.Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  import scala.collection.{mutable, Map => AnyMap}

  /** The buffer lives as a plain object between encoder boundaries
    * (ObjectHashAggregate serializes it only at the shuffle), so the hot
    * per-token path mutates a HashMap in place; a buffer arriving from
    * deserialization (immutable) is copied once on first touch. */
  private def mut(b: AnyMap[String, Long]): mutable.HashMap[String, Long] =
    b match {
      // erasure makes the element types uncheckable at runtime; the only
      // producers are `zero` and the encoder, both [String, Long], so the
      // explicit cast documents (rather than silently assumes) that invariant
      case m: mutable.HashMap[_, _] => m.asInstanceOf[mutable.HashMap[String, Long]]
      case other => mutable.HashMap.from(other)
    }

  override def zero: AnyMap[String, Long] = mutable.HashMap.empty

  override def reduce(b0: AnyMap[String, Long], x: String): AnyMap[String, Long] = {
    val b = mut(b0)
    b.get(x) match {
      case Some(c) => b.update(x, c + 1)
      case None if b.size < k => b.update(x, 1L)
      case None =>
        // decrement-all step: drop keys reaching zero; the arriving item
        // is "cancelled" against one unit of every tracked key
        val dead = List.newBuilder[String]
        b.foreach { case (key, c) =>
          if (c > 1) b.update(key, c - 1) else dead += key
        }
        dead.result().foreach(b.remove)
    }
    b
  }

  override def merge(a0: AnyMap[String, Long], b0: AnyMap[String, Long]): AnyMap[String, Long] = {
    val a = mut(a0)
    b0.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size <= k) a
    else {
      // subtract the (k+1)-largest count from everything; <= k survive
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val dead = List.newBuilder[String]
      a.foreach { case (key, c) =>
        if (c > cut) a.update(key, c - cut) else dead += key
      }
      dead.result().foreach(a.remove)
      a
    }
  }

  override def finish(b: AnyMap[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[AnyMap[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
