package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Tables

/** q23 gates its sketches through bound booleans the driver oracle asserts;
  * this spec independently RE-DERIVES the bounds from raw sketch and exact
  * values, so a bound boolean that went true by construction (rather than
  * by sketch accuracy) would be caught here. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q23: bound booleans are all true and re-derive from raw sketch vs exact values") {
    val rows = Relational.defs("q23_approx_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))
      .toMap
    // independent recomputation of BOTH sides of each bound
    val raw = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("nd"),
        approx_count_distinct(col("user_id"), 0.02).as("au"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("am"),
        expr("percentile(value, 0.45D)").as("p45"),
        expr("percentile(value, 0.55D)").as("p55"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(rows.keySet == raw.keySet)
    raw.foreach { case (et, (n, nd, au, am, p45, p55)) =>
      val (nEvents, nUsers, usersOk, medianOk) = rows(et)
      assert(nEvents == n && nUsers == nd, s"$et: exact columns must be exact")
      // HLL at rsd=0.02 vs a 10% bound = 5 sigma; accuracy-1000 percentile
      // has rank error <= n/1000, far inside the exact p45..p55 band
      assert(usersOk == (math.abs(au - nd).toDouble / nd <= 0.10),
        s"$et: users_within_10pct must re-derive (au=$au nd=$nd)")
      assert(medianOk == (am >= p45 && am <= p55),
        s"$et: median_in_p45_p55 must re-derive (am=$am [$p45,$p55])")
      assert(usersOk && medianOk,
        s"$et: sketch broke its accuracy contract (au=$au nd=$nd am=$am [$p45,$p55])")
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

  test("q49 rolling KMV tracks q48's exact trailing-7-day counts within sketch error") {
    // sf0.01 so some windows saturate the 64-value sketch (sf0.001's
    // windows hold < 64 users and only exercise the exact path)
    val sf = "/root/testdata/sf0.01"
    val exact = Relational.defs("q48_rolling_active")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Relational.defs("q49_rolling_kmv")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet, "sketch and exact must cover the same days")
    val relErrs = exact.map { case (day, n) =>
      val e = est(day)
      if (n < 64) assert(e == n.toDouble,
        s"$day: an unsaturated sketch holds every hash — estimate must be exact ($e vs $n)")
      math.abs(e - n) / n
    }
    // k=64 → ~12.7% relative standard error; bound each window at 4σ and
    // the mean across windows well inside 1σ
    assert(relErrs.max <= 0.5, s"worst day off by ${relErrs.max}")
    assert(relErrs.sum / relErrs.size <= 0.12,
      s"mean relative error ${relErrs.sum / relErrs.size}")
    assert(exact.values.exists(_ >= 64), "test premise: some window saturates at sf0.01")
  }

  test("q51 union/intersection estimates land within KMV error of the exact values") {
    val sf = "/root/testdata/sf0.01"
    val rows = Relational.defs("q51_sketch_setops")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, exU, exI, estU, estI) =>
      // k=64 → ~12.7% RSE on the union; bound at 4σ
      assert(math.abs(estU - exU) / exU <= 0.5,
        s"($a,$b): union est $estU vs exact $exU")
      // the intersection inherits the union's scale error plus Jaccard
      // sampling noise (binomial over k) — bound absolutely vs the union
      assert(math.abs(estI - exI) <= 0.5 * exU + 4.0 * exU / 8.0,
        s"($a,$b): intersection est $estI vs exact $exI (union $exU)")
    }
    // estimator must actually discriminate: pair ordering by estimated
    // intersection should broadly track the exact ordering (rank corr > 0)
    val byEst = rows.sortBy(_._6).map(r => (r._1, r._2))
    val byExact = rows.sortBy(_._4.toDouble).map(r => (r._1, r._2))
    val pos = byExact.zipWithIndex.toMap
    val disc = byEst.zipWithIndex.count { case (p, i) => math.abs(pos(p) - i) > rows.length / 2 }
    assert(disc <= rows.length / 2,
      s"estimated intersection ordering is uncorrelated with exact: $rows")
  }

  test("q57: Poisson replicate means scatter around the exact mean, n_eff near n") {
    val exact = Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("m"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val reps = Relational.defs("q57_poisson_bootstrap")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(reps.length == exact.size * 16, "16 replicates per type")
    reps.foreach { case (et, _, nEff, meanB) =>
      val (n, m) = exact(et)
      // Poisson(1) weights: E[n_eff]=n, sd=√n → ±5σ; per-replicate mean
      // se ≈ sd(value)/√n, generously bounded at 25% of the mean here
      // (n per type ≈ 200 at sf0.001, value cv ≈ 1 → se ≈ 7%)
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n.toDouble) + 1,
        s"$et: n_eff $nEff vs n $n")
      assert(math.abs(meanB - m) / m <= 0.25,
        s"$et: replicate mean $meanB vs exact $m")
    }
    // the replicates must actually VARY (a degenerate all-weights-1
    // implementation would pass the bounds above)
    val spreads = reps.groupBy(_._1).values.map(g => g.map(_._4).distinct.size)
    assert(spreads.forall(_ >= 8), s"replicate means suspiciously constant")
  }
}
