package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One sampled observation: the (hash, value) pair [[QuantileSampleAgg]]
  * retains. Ordering is (hv ASC, value ASC) — a total order even under
  * hash collisions, so the retained SET is deterministic. */
final case class HashedValue(hv: Long, value: Double)

/** Mergeable quantile sketch over an UNBOUNDED value domain (VERDICT r15
  * item 3 — the sketch-family member q66/w20's exact-histogram trick
  * cannot cover): a bottom-k-BY-HASH uniform sample. Keep the k rows
  * whose (hv, value) pairs are smallest, where hv is a deterministic
  * per-row hash (md5 of a unique row id, the q36 KMV spelling); because
  * hash order is independent of value order, the retained rows are a
  * simple random sample of the group, and its empirical deciles estimate
  * the true ones with DKW rank error P(sup|F̂−F| > ε) ≤ 2·exp(−2kε²) —
  * k = 512 puts 5% rank error at ~10⁻¹¹ tail mass.
  *
  * Why not KLL/GK/t-digest: their compactions depend on arrival and
  * merge order, so two runs of the SAME data under different
  * partitionings emit different (all individually valid) cutpoints —
  * which can never hash-gate cross-engine, and silently breaks any
  * downstream diff between two materializations of the same pipeline.
  * The hash-sample's retained set is a pure function of the DATA
  * (bottom-k of a multiset under a total order — merge-order
  * independent, BottomKAgg's theorem), at the cost of O(1/√k) rank
  * error where KLL gives O(1/k): the right trade wherever results are
  * gated, diffed, or replayed. The oracle restates it as a rank window
  * over the same md5 order.
  *
  * Scale: partial+final on the ObjectHashAggregate path — each map
  * partition reduces to ≤ k pairs per group before the shuffle, so a
  * 100 TB group ships k·|map partitions| pairs, never its values.
  *
  * finish() returns the sample's VALUES sorted ascending — the
  * quantile-ready form: cutpoint q_i = element i·n_s of the array.
  * Duplicates are kept throughout (multiset semantics).
  *
  * Input contract (ADVICE r16): `value` must be NON-NULL — the
  * [[HashedValue]] encoder's field is a primitive Double, so a null
  * input row fails the encode step at runtime instead of being skipped.
  * Call sites over nullable columns (q79, x36's quantileLive, q80's
  * lattice) filter `value IS NOT NULL` before the groupBy, and their
  * oracles carry the same predicate, so both engines sketch the same
  * multiset. NaN values are accepted and order LAST (see before()),
  * matching both engines' ASC sorts.
  */
object QuantileSampleAgg {
  /** Registered-udaf form: `qsample(k)(hvCol, valueCol)`. */
  def qsample(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileSampleAgg(k),
      ExpressionEncoder[HashedValue]())

  /** The PAIR-preserving form (q80's rollup lattice): identical
    * retention, but finish() keeps the (hv, value) structs — the
    * sketch-as-a-COLUMN representation that stays re-mergeable. Feeding
    * a persisted level's exploded pairs back through qsample/qpairs at a
    * coarser grain yields EXACTLY the sketch a direct pass over the raw
    * rows would build (bottom-k of a union of bottom-ks is bottom-k of
    * the union — every dropped row was already outside its own level's
    * bottom-k), which is what makes day→month→year re-aggregation an
    * identity rather than an approximation-of-an-approximation.
    * qsample's value-sorted finish is deliberately NOT re-mergeable (it
    * drops hv) — it is the serving form, this is the storage form. */
  def qpairs(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileSamplePairsAgg(k),
      ExpressionEncoder[HashedValue]())
}

/** [[QuantileSampleAgg]] with the buffer emitted as-is — see
  * [[QuantileSampleAgg.qpairs]]. */
final class QuantileSamplePairsAgg(k: Int)
    extends Aggregator[HashedValue, Array[HashedValue], Array[HashedValue]] {
  private val inner = new QuantileSampleAgg(k)
  override def zero: Array[HashedValue] = inner.zero
  override def reduce(b: Array[HashedValue], x: HashedValue): Array[HashedValue] =
    inner.reduce(b, x)
  override def merge(a: Array[HashedValue], b: Array[HashedValue]): Array[HashedValue] =
    inner.merge(a, b)
  override def finish(b: Array[HashedValue]): Array[HashedValue] = b
  override def bufferEncoder: Encoder[Array[HashedValue]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[HashedValue]] = ExpressionEncoder()
}

final class QuantileSampleAgg(k: Int)
    extends Aggregator[HashedValue, Array[HashedValue], Array[Double]] {
  require(k > 0, s"k must be positive, got $k")

  /** true iff a orders strictly before b under (hv ASC, value ASC), with
    * NaN values ordered LAST (above +Infinity — Spark/DuckDB ASC sort
    * semantics, keeping the order total where raw `<` would strand a
    * NaN) and -0.0 == 0.0 (primitive comparison, as both engines sort). */
  @inline private def before(a: HashedValue, b: HashedValue): Boolean =
    a.hv < b.hv || (a.hv == b.hv && {
      val an = java.lang.Double.isNaN(a.value)
      val bn = java.lang.Double.isNaN(b.value)
      if (an || bn) !an && bn
      else a.value < b.value
    })

  override def zero: Array[HashedValue] = Array.empty[HashedValue]

  override def reduce(b: Array[HashedValue], x: HashedValue): Array[HashedValue] =
    if (b.length >= k && !before(x, b(b.length - 1))) b
    else {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (before(x, b(mid))) hi = mid else lo = mid + 1
      }
      val outLen = math.min(b.length + 1, k)
      val out = new Array[HashedValue](outLen)
      System.arraycopy(b, 0, out, 0, lo)
      out(lo) = x
      System.arraycopy(b, lo, out, lo + 1, outLen - lo - 1)
      out
    }

  override def merge(a: Array[HashedValue], b: Array[HashedValue]): Array[HashedValue] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val outLen = math.min(a.length + b.length, k)
      val out = new Array[HashedValue](outLen)
      var (i, j, o) = (0, 0, 0)
      while (o < outLen) {
        if (j >= b.length || (i < a.length && !before(b(j), a(i)))) {
          out(o) = a(i); i += 1
        } else {
          out(o) = b(j); j += 1
        }
        o += 1
      }
      out
    }

  override def finish(b: Array[HashedValue]): Array[Double] = {
    val vs = b.map(_.value)
    java.util.Arrays.sort(vs)
    vs
  }

  override def bufferEncoder: Encoder[Array[HashedValue]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}
