package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable bottom-k sketch: the k smallest values of a LongType column per
  * group, as a sorted ascending array — the partial-aggregable form of the
  * KMV distinct sketch (q36) and the shape SURVEY.md §7 reserves the typed
  * `Aggregator` surface for ("a custom mergeable sketch").
  *
  * Why it exists: a rank-k-per-group window first shuffles EVERY input row
  * of a group to one partition, then sorts — the whole group's distinct
  * hash set crosses the wire to find 64 values. This aggregate runs on the
  * ObjectHashAggregate path with partial aggregation: each map-side
  * partition reduces to at most k values per group, so the shuffle carries
  * min(k, |partition group|) longs per (partition, group) — at 100 TB the
  * difference between shuffling the distinct-user universe and shuffling
  * 64 longs per map task.
  *
  * Semantics notes, both load-bearing for the oracle gate:
  *  - Duplicates are KEPT (the multiset's k smallest, exactly what
  *    `row_number() OVER (ORDER BY v) <= k` selects — hash collisions in
  *    the KMV input must rank like the oracle's).
  *  - Bottom-k of a multiset is merge-order independent, so the result is
  *    deterministic under any partitioning (pinned by BottomKSpec).
  *
  * Buffer invariant: sorted ascending, length <= k. A saturated buffer
  * rejects x >= max in O(1) with no allocation — on hash-random input the
  * expected number of accepted inserts over n rows is ≈ k·ln(n/k), so the
  * O(k) copying insert is paid on a vanishing fraction of rows.
  */
final class BottomKAgg(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], x: Long): Array[Long] =
    if (b.length >= k && x >= b(b.length - 1)) b
    else {
      // binary search for the insertion point of x in the sorted buffer
      // (first index with b(i) > x, so equal values keep insertion stability)
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid) <= x) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(b.length + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(b, lo, out, lo + 1, outLen - lo - 1)
      out
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val outLen = math.min(a.length + b.length, k)
      val out = new Array[Long](outLen)
      var (i, j, o) = (0, 0, 0)
      while (o < outLen) {
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          out(o) = a(i); i += 1
        } else {
          out(o) = b(j); j += 1
        }
        o += 1
      }
      out
    }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
