package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashedValue, QuantileSampleAgg}

/** The mergeable quantile sketch (q79's aggregation) must retain exactly
  * the multiset's k smallest (hv, value) pairs — merge-order independent
  * under any partitioning (the property order-dependent sketches like
  * KLL/GK lack, and the reason this design can hash-gate) — and its
  * sample deciles must honor the DKW rank-error bound it claims. */
class QuantileSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaAggregator(xs: Seq[(Long, Double)], k: Int,
      parts: Int): Seq[Double] = {
    import spark.implicits._
    xs.toDF("hv", "value").repartition(parts)
      .agg(QuantileSampleAgg.qsample(k)(col("hv"), col("value")).as("s"))
      .collect()(0).getSeq[Double](0)
  }

  test("sample equals sequential bottom-k by (hv, value), any partitioning") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 1 + rnd.nextInt(300)
      // narrow hash range forces hv collisions (the value tiebreak's job)
      val xs = Seq.fill(n)((rnd.nextInt(64).toLong, rnd.nextInt(32).toDouble))
      val k = 1 + rnd.nextInt(48)
      val expected = xs.sorted.take(k).map(_._2).sorted
      assert(viaAggregator(xs, k, 1) == expected, s"trial $trial, 1 partition")
      assert(viaAggregator(xs, k, 7) == expected, s"trial $trial, 7 partitions")
    }
  }

  test("reduce/merge invariants hold directly (no Spark plan in the loop)") {
    val agg = new graft.functions.QuantileSampleAgg(3)
    val xs = Seq(HashedValue(9, 1.0), HashedValue(2, 5.0), HashedValue(2, 3.0),
      HashedValue(7, 0.0), HashedValue(2, 5.0))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    // hv ties order by value; the duplicate (2, 5.0) is a multiset member
    assert(b.toSeq == Seq(HashedValue(2, 3.0), HashedValue(2, 5.0),
      HashedValue(2, 5.0)))
    val other = Seq(HashedValue(1, 9.0), HashedValue(8, 4.0))
      .foldLeft(agg.zero)(agg.reduce)
    val ab = agg.merge(b, other).toSeq
    assert(ab == Seq(HashedValue(1, 9.0), HashedValue(2, 3.0),
      HashedValue(2, 5.0)))
    assert(agg.merge(other, b).toSeq == ab)
    assert(agg.merge(agg.zero, b).toSeq == b.toSeq)
    // finish sorts by VALUE (the quantile-ready form), not by hash
    assert(agg.finish(agg.merge(b, other)).toSeq == Seq(3.0, 5.0, 9.0))
  }

  test("NaN values order last on hv ties (ASC sort semantics of both engines)") {
    // ADVICE r16: raw < stranded NaN outside the total order; pinned to
    // Spark/DuckDB ASC semantics (NaN above +Infinity). Null values are
    // excluded UPSTREAM by the call sites' value IS NOT NULL filter (the
    // primitive-Double payload cannot carry them) — contract documented
    // in the aggregator's scaladoc and mirrored in the oracles.
    val agg = new graft.functions.QuantileSampleAgg(2)
    val xs = Seq(HashedValue(3, Double.NaN), HashedValue(3, 7.0),
      HashedValue(3, Double.PositiveInfinity))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b.toSeq == Seq(HashedValue(3, 7.0),
      HashedValue(3, Double.PositiveInfinity)))
    val (l, r) = xs.splitAt(1)
    assert(agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce)).toSeq == b.toSeq)
  }

  test("k=512 sample deciles stay within 8% rank error on a 20k corpus") {
    // pinned-seed stand-in for the DKW bound 2·exp(−2·512·0.08²) ≈ 3e-3:
    // hash values are independent of the skewed value distribution, so
    // the retained rows are a simple random sample of it
    val rnd = new scala.util.Random(7)
    val values = Array.fill(20000)(math.pow(rnd.nextDouble(), 3) * 1000.0)
    val xs = values.map(v => (rnd.nextLong(), v)).toSeq
    val sample = viaAggregator(xs, 512, 13)
    assert(sample.length == 512)
    val sortedAll = values.sorted
    for (i <- 1 to 9) {
      val cut = sample((i * sample.length + 9) / 10 - 1) // ceil, 0-based
      val trueRank = sortedAll.count(_ <= cut).toDouble / sortedAll.length
      assert(math.abs(trueRank - i / 10.0) <= 0.08,
        s"decile $i: cut $cut has true rank $trueRank")
    }
  }

  test("qpairs lattice: re-merging level sketches equals the direct sketch exactly") {
    // q80's identity: bottom-k of a union of per-bucket bottom-ks IS the
    // bottom-k of the union — every row outside its bucket's bottom-k is
    // also outside the union's. Crafted three "days" of 200 rows, k = 20.
    val rnd = new scala.util.Random(11)
    val days = Seq.fill(3)(Seq.fill(200)(
      HashedValue(rnd.nextLong(), rnd.nextInt(1000).toDouble)))
    val pairs = new graft.functions.QuantileSamplePairsAgg(20)
    val direct = new graft.functions.QuantileSampleAgg(20)
    val daySketches = days.map(_.foldLeft(pairs.zero)(pairs.reduce))
    // roll up by re-REDUCING the persisted pairs (what q80's explode +
    // re-aggregate does), not by the aggregator's own merge()
    val merged = daySketches.flatten.foldLeft(direct.zero)(direct.reduce)
    val fromRaw = days.flatten.foldLeft(direct.zero)(direct.reduce)
    assert(direct.finish(merged).toSeq == direct.finish(fromRaw).toSeq)
    // and qpairs retains exactly what qsample retains (same inner order)
    assert(daySketches.head.toSeq ==
      days.head.foldLeft(direct.zero)(direct.reduce).toSeq)
  }

  test("q79 plans the udaf on the ObjectHashAggregate path with no value window") {
    val p = graft.operators.Relational.defs("q79_quantile_sketch")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }
}
