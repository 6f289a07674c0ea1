package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: the (score, id) payload [[TopKAgg]] ranks. The
  * ordering is (score DESC, id ASC) — exactly what the retrieval family's
  * `row_number() OVER (ORDER BY score DESC, id)` windows select, so a
  * window→aggregate rewrite changes the PLAN, never the rows. */
final case class Scored(score: Double, id: Long)

/** Mergeable per-group top-k: the k best (score DESC, id ASC) payloads per
  * group, as an array in rank order — [[BottomKAgg]]'s merge discipline
  * with scored payload structs (VERDICT r15 item 1: the per-group ranking
  * primitive the whole retrieval family windowed around).
  *
  * Why it exists: `row_number().over(Window.partitionBy(query).orderBy
  * (score.desc, id))` first shuffles EVERY candidate row of a query to one
  * partition, then sorts it — for a lexical retrieval whose candidate set
  * is "every doc sharing a token with the query", that partition
  * approaches the corpus once stopwords enter the token stream (the exact
  * shape q76's discipline forbids). This aggregate runs on the
  * ObjectHashAggregate path with partial aggregation: each map-side
  * partition reduces to at most k payloads per group BEFORE the shuffle,
  * so the exchange carries min(k, |partition ∩ group|) structs per
  * (partition, group) — at 100 TB the difference between sorting a
  * corpus-sized partition per query and merging 10-element heaps.
  *
  * Semantics notes, both load-bearing for the oracle gate:
  *  - Duplicates are KEPT (the multiset's k best, exactly what the rank
  *    window selects).
  *  - Top-k of a multiset under a total order is merge-order independent,
  *    so the result is deterministic under any partitioning (pinned by
  *    TopKSpec). Callers must ensure (score, id) is a total order over
  *    their rows (id unique per group) — same contract the rank window
  *    already required for a deterministic gate.
  *  - NaN scores rank FIRST (before +Infinity), the ordering both Spark
  *    and DuckDB give a `score DESC` sort — so a NaN-scored candidate
  *    (e.g. the cosine of a zero-norm embedding) lands where the rank
  *    window it replaced would have put it instead of silently sinking
  *    (ADVICE r16). -0.0 and 0.0 stay EQUAL (primitive comparison), as
  *    in both engines' sorts — a cross-zero pair falls to the id
  *    tie-break, never to bit order.
  *
  * Cross-ENGINE exactness is a separate, stronger contract than the
  * determinism above: the gate hashes only when Spark and the oracle
  * compute bit-identical scores. The audited callers (lexTopK's integer
  * tf/idf overlaps < 2⁵³; bruteTopK/sq8TopK's cosines built from
  * IEEE-exact mul/add/sqrt folds spelled operand-for-operand in the
  * oracle) satisfy it; a caller feeding scores whose last ulp can differ
  * between engines (libm log/exp/pow outputs) is OUT of that contract —
  * it gets a deterministic Spark-side rank, not a hash-gateable one.
  *
  * Buffer invariant: sorted best-first (score DESC, id ASC), length <= k.
  * A saturated buffer rejects a candidate no better than its last element
  * in O(1) with no allocation — on score-random input the expected number
  * of accepted inserts over n rows is ≈ k·ln(n/k), so the O(k) copying
  * insert is paid on a vanishing fraction of rows.
  */
object TopKAgg {
  /** Registered-udaf form: `topK(k)(scoreCol, idCol)` — the call sites'
    * one-liner (DotProduct.dot's convention). `udaf` flattens the
    * [[Scored]] product encoder into two positional parameters:
    * score (double), id (long). */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      ExpressionEncoder[Scored]())
}

final class TopKAgg(k: Int)
    extends Aggregator[Scored, Array[Scored], Array[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  /** true iff a ranks strictly before b under (score DESC, id ASC), with
    * NaN ordered above +Infinity (Spark/DuckDB sort semantics — making
    * the order TOTAL under NaN, where raw `>`/`==` would leave a NaN
    * neither beating nor beaten) and -0.0 == 0.0 (primitive equality;
    * both engines' sorts agree). */
  @inline private def beats(a: Scored, b: Scored): Boolean = {
    val an = java.lang.Double.isNaN(a.score)
    val bn = java.lang.Double.isNaN(b.score)
    if (an || bn) (an && !bn) || (an == bn && a.id < b.id)
    else a.score > b.score || (a.score == b.score && a.id < b.id)
  }

  override def zero: Array[Scored] = Array.empty[Scored]

  override def reduce(b: Array[Scored], x: Scored): Array[Scored] =
    if (b.length >= k && !beats(x, b(b.length - 1))) b
    else {
      // binary search for x's insertion point (first index i with
      // x beating b(i); equal payloads keep insertion stability)
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (beats(x, b(mid))) hi = mid else lo = mid + 1
      }
      val outLen = math.min(b.length + 1, k)
      val out = new Array[Scored](outLen)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(b, lo, out, lo + 1, outLen - lo - 1)
      out
    }

  override def merge(a: Array[Scored], b: Array[Scored]): Array[Scored] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val outLen = math.min(a.length + b.length, k)
      val out = new Array[Scored](outLen)
      var (i, j, o) = (0, 0, 0)
      while (o < outLen) {
        if (j >= b.length || (i < a.length && !beats(b(j), a(i)))) {
          out(o) = a(i); i += 1
        } else {
          out(o) = b(j); j += 1
        }
        o += 1
      }
      out
    }

  override def finish(b: Array[Scored]): Array[Scored] = b

  override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
}
