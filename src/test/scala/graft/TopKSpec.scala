package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Scored, TopKAgg}

/** The mergeable top-k aggregate (s40/s41's lexical ranking) must select
  * exactly what the rank window it replaced selected — the multiset's k
  * best under (score DESC, id ASC) — duplicates counted, any
  * partitioning, and it must plan partial+final with NO window (the
  * VERDICT r15 item-1 scale pin: no per-query corpus-sized sort). */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def order(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def viaAggregator(xs: Seq[Scored], k: Int, parts: Int): Seq[Scored] = {
    import spark.implicits._
    xs.toDF("score", "id").repartition(parts)
      .agg(TopKAgg.topK(k)(col("score"), col("id")).as("tk"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => Scored(r.getDouble(0), r.getLong(1)))
  }

  test("top-k equals sortWith.take(k), duplicates counted, across partitionings") {
    val rnd = new scala.util.Random(42) // pinned seed, WordCountPropsSpec style
    for (trial <- 0 until 5) {
      val n = 1 + rnd.nextInt(200)
      // narrow score range forces score ties (the id tiebreak's job) and
      // occasional full-payload duplicates into most trials
      val xs = Seq.fill(n)(Scored(rnd.nextInt(16).toDouble, rnd.nextInt(32).toLong))
      val k = 1 + rnd.nextInt(12)
      val expected = xs.sortWith(order).take(k)
      assert(viaAggregator(xs, k, 1) == expected, s"trial $trial, 1 partition")
      assert(viaAggregator(xs, k, 7) == expected, s"trial $trial, 7 partitions")
    }
  }

  test("reduce/merge invariants hold directly (no Spark plan in the loop)") {
    val agg = new TopKAgg(3)
    val xs = Seq(Scored(1, 9), Scored(5, 2), Scored(5, 1), Scored(3, 7), Scored(5, 2))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    // ties rank id-ascending; the duplicate (5, 2) is kept as a multiset member
    assert(b.toSeq == Seq(Scored(5, 1), Scored(5, 2), Scored(5, 2)))
    val other = Seq(Scored(6, 4), Scored(0, 0)).foldLeft(agg.zero)(agg.reduce)
    val ab = agg.merge(b, other).toSeq
    assert(ab == Seq(Scored(6, 4), Scored(5, 1), Scored(5, 2)))
    assert(agg.merge(other, b).toSeq == ab) // merge is symmetric on content
    assert(agg.merge(agg.zero, b).toSeq == b.toSeq)
  }

  test("NaN scores rank first (window DESC semantics) and -0.0 ties 0.0 on id") {
    // ADVICE r16: raw >/== left NaN neither beating nor beaten — a NaN
    // candidate (zero-norm-embedding cosine) silently sank, while the
    // rank window this aggregate replaced sorts NaN before +Infinity in
    // both Spark and DuckDB. Pinned: the aggregate now agrees.
    val agg = new TopKAgg(3)
    val xs = Seq(Scored(5.0, 1), Scored(Double.NaN, 9), Scored(Double.NaN, 4),
      Scored(Double.PositiveInfinity, 2), Scored(7.0, 3))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b.map(_.id).toSeq == Seq(4, 9, 2)) // NaNs first (id ASC), then +Inf
    // merge path agrees with reduce path
    val (l, r) = xs.splitAt(2)
    val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(m.map(_.id).toSeq == Seq(4, 9, 2))
    // -0.0 == 0.0: the pair falls to the id tie-break, not to bit order
    val z = Seq(Scored(0.0, 7), Scored(-0.0, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(z.map(_.id).toSeq == Seq(2, 7))
    // and the Spark sort agrees end to end: NaN outranks +Inf under DESC
    import spark.implicits._
    val viaSpark = Seq((Double.NaN, 9L), (Double.PositiveInfinity, 2L), (5.0, 1L))
      .toDF("score", "id")
      .orderBy(col("score").desc, col("id")).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSpark == Seq(9, 2, 1))
  }

  test("lexTopK matches the rank-window spelling it replaced") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val scored = Seq.tabulate(500)(i =>
      (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(20).toLong))
      .toDF("query_id", "doc_id", "score")
    val viaAgg = graft.operators.Similarity.lexTopK(scored, 10)
      .orderBy("query_id", "rl").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    val viaWindow = scored.withColumn("rl", row_number().over(w))
      .filter(col("rl") <= 10).select("query_id", "doc_id", "rl")
      .orderBy("query_id", "rl").collect().toSeq
    assert(viaAgg.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))) ==
      viaWindow.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))))
  }

  test("s40's lexical path plans the udaf partial+final with no candidate-set window") {
    // the one remaining Window in s40's FULL plan is the fusion rank over
    // the ≤2k-row-per-query union; the lexical sub-frame itself must plan
    // with ObjectHashAggregate and zero windows
    import spark.implicits._
    val scored = Seq((0L, 1L, 2L)).toDF("query_id", "doc_id", "score")
    val p = graft.operators.Similarity.lexTopK(scored, 10)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window"), p)
  }
}
