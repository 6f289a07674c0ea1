package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** The Misra-Gries guarantee under adversarial partitionings, and w6's
  * exactness: the sketch's key set may vary with partitioning, the final
  * heavy-hitter answer may not. */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sketchOf(xs: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = udaf(new MisraGriesAgg(k))
    xs.toDF("w").repartition(parts)
      .agg(mg(col("w")).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
  }

  test("every item above n/(k+1) survives, counts undercount by at most n/(k+1)") {
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 5) {
      val k = 8
      // heavy items + a long random tail
      val heavy = Seq.fill(120)("alpha") ++ Seq.fill(90)("beta") ++ Seq.fill(60)("gamma")
      val tail = Seq.fill(300)(s"t${rnd.nextInt(200)}")
      val xs = rnd.shuffle(heavy ++ tail)
      val n = xs.size
      val trueCounts = xs.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      for (parts <- Seq(1, 3, 7)) {
        val sk = sketchOf(xs, k, parts)
        assert(sk.size <= k, s"trial $trial parts $parts: ${sk.size} counters")
        trueCounts.filter(_._2 > n / (k + 1)).keys.foreach { w =>
          assert(sk.contains(w),
            s"trial $trial parts $parts: heavy '$w' missing from $sk")
        }
        sk.foreach { case (w, c) =>
          val t = trueCounts(w)
          assert(c <= t && t - c <= n / (k + 1),
            s"trial $trial parts $parts: '$w' sketch=$c true=$t n=$n")
        }
      }
    }
  }

  test("merge invariants hold directly (no Spark plan in the loop)") {
    val agg = new MisraGriesAgg(3)
    val a = Seq("x", "x", "y", "z", "w").foldLeft(agg.zero)(agg.reduce)
    val b = Seq("x", "q", "q", "q").foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    assert(m.size <= 3)
    // x: 2+1 occurrences tracked across both summaries — must survive a
    // merge whose cut is the 4th-largest combined count
    assert(m.contains("x"))
    assert(agg.merge(agg.zero, a) == a)
  }

  test("w6 equals the plain frequent-token query exactly (sketch is pruning-only)") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.defs("w6_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val n = toks.count()
    val want = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 64 > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty, "test premise: the corpus has heavy tokens at n/64")
  }

  test("w7's grouped sketch keeps the per-group guarantee: equals per-lang exact counts") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.TextOps.defs("w7_lang_heavy_hitters")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
    val totals = toks.groupBy("lang").agg(count(lit(1)).as("n"))
    val want = toks.groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .join(totals, "lang")
      .filter(col("cnt") * 64 > col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(got == want)
    assert(got.map(_._1).distinct.size > 1,
      "test premise: heavy hitters found in more than one language")
  }

  test("w6 plans the sketch on ObjectHashAggregate and broadcasts the candidates") {
    val p = graft.operators.TextOps.defs("w6_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("w6 plans exactly two token passes: fused sketch+count broadcast and the recount probe") {
    // the sketch and the total count are ONE fused aggregate exploded into
    // ONE broadcast (single consumer — no third pass for the threshold),
    // so the plan holds exactly two parquet scans that overlap inside one
    // execution
    val p = graft.operators.TextOps.defs("w6_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans == 2, s"w6 must be exactly two token passes ($scans scans)\n$p")
  }
}
