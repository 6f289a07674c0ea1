package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom-filter build aggregate: OR-fold the key set of a join's
  * build side into a fixed-size bitset (an Array[Long] of `numBits / 64`
  * words), for runtime semi-join reduction (q37).
  *
  * Input is a PACKED pair of 32-bit hash halves — `(h1 << 32) | h2`. The
  * aggregate is hash-family-agnostic: build and probe agree as long as
  * BOTH pack the same value for the same key, which the single shared
  * producer (Relational.bloomPacked — one xxhash64 per key, split into
  * halves) guarantees; never feed this from a second hash construction.
  * The k probe positions come from Kirsch-Mitzenstein double hashing:
  * `bit_i = (h1 + i*h2) mod numBits` (i in [0, k)), the standard trick
  * that gets k independent-enough probes from two hashes. The SAME
  * positions are computed on the probe side with built-in column
  * functions (Relational.bloomProbe).
  *
  * Why an Aggregator and not `collect_set` + broadcast join: the point of a
  * Bloom semi-join is that the build side's KEY SET is too big to broadcast
  * but its BITSET is not. This aggregate is mergeable (bitwise OR is
  * associative/commutative), so partial aggregation reduces every map
  * partition to one `numBits/64`-word array before the single-row final
  * merge — the filter costs one fixed-size array per partition on the wire,
  * regardless of build-side row count.
  *
  * False positives are expected and harmless — the residual join after the
  * probe filter removes them, so the final query result is EXACT (which is
  * why q37 can be oracle-gated against a plain join). False negatives are
  * impossible: every inserted key's probe bits are set (pinned by
  * BloomSpec).
  */
final class BloomAgg(numBits: Int, numHashFns: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  // >= 64, not just > 0: below one 64-bit word, words = numBits/64 = 0 and
  // every reduce() would index into an empty buffer
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  require(numHashFns > 0, s"numHashFns must be positive, got $numHashFns")

  private val words = numBits / 64
  private val mask = numBits - 1

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], packed: Long): Array[Long] = {
    val h1 = packed >>> 32
    val h2 = packed & 0xffffffffL
    var i = 0
    while (i < numHashFns) {
      val bit = ((h1 + i * h2) & mask).toInt
      b(bit >>> 6) |= 1L << (bit & 63)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
