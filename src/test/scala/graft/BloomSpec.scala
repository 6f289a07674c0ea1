package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomAgg

/** q37's Bloom semi-join reduction: no false negatives ever, OR-merge is
  * partition-order independent, the probe actually prunes, and the pruned
  * join's result is exactly the plain join's. */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def positions(packed: Long, bits: Int, k: Int): Seq[Int] = {
    val h1 = packed >>> 32
    val h2 = packed & 0xffffffffL
    (0 until k).map(i => ((h1 + i * h2) & (bits - 1)).toInt)
  }

  private def mightContain(bf: Array[Long], packed: Long, bits: Int, k: Int): Boolean =
    positions(packed, bits, k).forall(b => ((bf(b >>> 6) >> (b & 63)) & 1L) == 1L)

  test("no false negatives: every inserted key probes positive, any partitioning") {
    val bits = 1 << 10
    val k = 3
    val agg = new BloomAgg(bits, k)
    val rnd = new scala.util.Random(7)
    val keys = Seq.fill(200)(rnd.nextLong())
    val bf = keys.foldLeft(agg.zero)(agg.reduce)
    keys.foreach(x => assert(mightContain(bf, x, bits, k), s"false negative for $x"))
    // split-and-merge must give the identical bitset (OR is associative,
    // commutative, idempotent)
    val (l, r) = keys.splitAt(67)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged.toSeq == bf.toSeq)
    assert(agg.merge(
      r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      .toSeq == bf.toSeq)
  }

  test("false-positive rate is sane at the q37 sizing") {
    val bits = 1 << 16
    val k = 3
    val agg = new BloomAgg(bits, k)
    val rnd = new scala.util.Random(13)
    val in = Seq.fill(2000)(rnd.nextLong())
    val bf = in.foldLeft(agg.zero)(agg.reduce)
    val probes = Seq.fill(20000)(rnd.nextLong()).filterNot(in.toSet)
    val fp = probes.count(x => mightContain(bf, x, bits, k))
    // theory: (1 - exp(-k*n/m))^k ~ 0.0007 at n=2000, m=65536, k=3;
    // allow 10x headroom — the pin is "prunes almost everything", not
    // the exact constant
    assert(fp.toDouble / probes.size < 0.007, s"fp rate ${fp.toDouble / probes.size}")
  }

  test("q37 result is exactly the plain join's (bloom is pruning-only)") {
    val got = operators.Relational.defs("q37_bloom_join")(spark, dir)
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val want = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(Exprs.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q37 plans the bloom probe BELOW the residual join (filter-below-join)") {
    // the point of the reduction: non-matching fact rows die before the
    // join's shuffle/build. Find the o_orderkey join and assert some child
    // subtree contains the bloom probe filter (shiftright over bf).
    val plan0 = operators.Relational.defs("q37_bloom_join")(spark, dir)
      .queryExecution.executedPlan
    // AdaptiveSparkPlanExec does not expose the inner tree as children
    val plan = plan0 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.leftKeys.exists(_.toString.contains("orderkey")) => j
    }
    assert(joins.nonEmpty, s"expected the orderkey join\n$plan")
    // the probe may survive as a FilterExec or get fused into the
    // single-row bitset cross-join's condition — either way it must be a
    // DESCENDANT of the residual join's probe side
    val bloomBelowJoin = joins.exists(_.children.exists(c =>
      c.collect {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("shiftright") => f
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.condition.exists(_.toString.contains("shiftright")) => j
      }.nonEmpty))
    assert(bloomBelowJoin,
      s"the bloom probe filter must sit below the residual join\n$plan")
  }

  test("the probe filter prunes the fact side below the join") {
    // re-build the probe stage exactly as q37 does, and count survivors:
    // at sf0.001 the date filter keeps a small fraction of orders, so the
    // bloom must reject the large majority of lineitem rows before the join
    val bits = 1 << 16
    val k = 3
    val bloomAgg = udaf(new BloomAgg(bits, k))
    def packed(c: org.apache.spark.sql.Column) = xxhash64(c)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp"))
    val nMatchKeys = o.select("o_orderkey").distinct().count()
    val bloom = o.select(packed(col("o_orderkey")).as("pk"))
      .agg(bloomAgg(col("pk")).as("bf"))
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val total = l.count()
    val matching = l.join(o.select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val survivors = l.crossJoin(broadcast(bloom))
      .withColumn("ph1", shiftrightunsigned(xxhash64(col("l_orderkey")), 32))
      .withColumn("ph2", xxhash64(col("l_orderkey")).bitwiseAND(lit(0xffffffffL)))
      .filter((0 until k).map { i =>
        expr(s"""(shiftright(element_at(bf,
                 |    CAST(((ph1 + $i * ph2) % $bits) div 64 AS INT) + 1),
                 |  CAST(((ph1 + $i * ph2) % $bits) % 64 AS INT)) & 1) = 1"""
          .stripMargin)
      }.reduce(_ && _))
      .count()
    assert(survivors >= matching, "bloom dropped a matching row (false negative)")
    assert(nMatchKeys > 0 && matching > 0, "test premise: the date filter matches some orders")
    // pruning pin: survivors are close to the true matches, far below total
    assert(survivors < total / 2,
      s"bloom failed to prune: $survivors of $total survived ($matching true matches)")
  }
}
