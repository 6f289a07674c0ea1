package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BottomKAgg

/** The mergeable bottom-k sketch (q36's aggregation) must select exactly
  * the multiset's k smallest — duplicates counted, any partitioning. */
class BottomKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def viaAggregator(xs: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    val bk = udaf(new BottomKAgg(k))
    xs.toDF("v").repartition(parts)
      .agg(bk(col("v")).as("bot"))
      .collect()(0).getSeq[Long](0)
  }

  test("bottom-k equals sorted.take(k), duplicates counted, across partitionings") {
    val rnd = new scala.util.Random(42) // pinned seed, WordCountPropsSpec style
    for (trial <- 0 until 5) {
      val n = 1 + rnd.nextInt(200)
      // narrow value range forces duplicates into most trials
      val xs = Seq.fill(n)(rnd.nextInt(64).toLong)
      val k = 1 + rnd.nextInt(16)
      val expected = xs.sorted.take(k)
      assert(viaAggregator(xs, k, 1) == expected, s"trial $trial, 1 partition")
      assert(viaAggregator(xs, k, 5) == expected, s"trial $trial, 5 partitions")
    }
  }

  test("reduce/merge invariants hold directly (no Spark plan in the loop)") {
    val agg = new BottomKAgg(4)
    val b = Seq(9L, 1L, 5L, 5L, 2L, 8L, 0L).foldLeft(agg.zero)(agg.reduce)
    assert(b.toSeq == Seq(0L, 1L, 2L, 5L))
    val other = Seq(3L, 5L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, other).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(agg.merge(other, b).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(agg.merge(agg.zero, b).toSeq == b.toSeq)
  }

  test("q36 plans the udaf on the ObjectHashAggregate path with partial aggregation") {
    val p = graft.operators.Relational.defs("q36_kmv_sketch")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }
}
