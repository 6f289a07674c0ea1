package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Tables

/** q23 is deliberately oracle-less (sketch internals differ across engines),
  * so this spec is its correctness gate: the sketches must honor their
  * accuracy contracts against exact values on real data. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q23: approx_count_distinct within 5% and approx_median inside p45..p55") {
    val approx = Relational.defs("q23_approx_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val exact = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"),
        expr("percentile(value, 0.45)").as("p45"),
        expr("percentile(value, 0.55)").as("p55"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (et, (nd, p45, p55, n)) =>
      val (approxUsers, approxMedian, nEvents) = approx(et)
      // HLL++ default relative standard deviation is 0.05
      assert(math.abs(approxUsers - nd).toDouble / nd <= 0.05,
        s"$et: approx_count_distinct $approxUsers vs exact $nd")
      // percentile_approx(accuracy=1000) guarantees rank error <= n/1000,
      // far inside the p45..p55 exact band at any n
      assert(approxMedian >= p45 && approxMedian <= p55,
        s"$et: approx_median $approxMedian outside exact [$p45, $p55]")
      assert(nEvents == n)
    }
  }

  test("q36: KMV estimate within 10% of exact on the sketch path (sf0.01)") {
    // sf0.001 has 15 users/type — under k=64 q36 degenerates to the exact
    // path; sf0.01 (150 users) exercises the real (k-1)/u_k estimator. The
    // hash family is fixed, so this is a deterministic single draw: 3.4%
    // here (stderr for k=64 is 1/sqrt(k-2) ~= 12.7%; the bound pins THIS
    // family's draw, not a probabilistic contract).
    val rows = Relational.defs("q36_kmv_sketch")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (et, nExact, est) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(nExact > 64, s"$et: expected the sketch path, n_exact=$nExact")
      assert(math.abs(est - nExact) / nExact <= 0.10,
        s"$et: KMV est $est vs exact $nExact")
    }
  }
}
