package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: a join with one hot key must have its oversized
  * shuffle partition split at runtime (the mechanism that saves real skewed
  * joins at scale; thresholds lowered so a test-sized hot key triggers it). */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) carrying ~200k rows vs 99 cold keys
      val left = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("payload-"), col("id")).as("p"))
        .union(spark.range(990)
          .select((col("id") % 99 + 1).as("k"), lit("cold").as("p")))
      val right = spark.range(100).select(col("id").as("k"), col("id").as("v"))
      val joined = left.join(right, "k")
      // collect() executes THIS QueryExecution, so its adaptive plan is final
      // (count() would spawn a separate execution and leave this one unrun)
      assert(joined.collect().length == 200000 + 990)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
      assert(finalPlan.toLowerCase.contains("skewed"),
        s"expected a skew-split shuffle read in:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("manual salted join (q67): flooded key joins identically to the plain join") {
    // one hot key (0) with 20k fact rows vs 99 cold keys with ~10 each
    val fact = spark.range(20000)
      .select(col("id"), lit(0L).as("k"))
      .union(spark.range(990).select((col("id") + 100000).as("id"),
        (col("id") % 99 + 1).as("k")))
    val dim = spark.range(100).select(col("id").as("dk"),
      concat(lit("dim-"), col("id")).as("name"))
    val salted = graft.operators.Relational
      .saltedSkewJoin(fact, dim, "k", "dk", saltR = 8, factId = Seq(col("id")))
    val plain = fact.join(dim, col("k") === col("dk"))
    // identical result set: salting is a physical rewrite, not semantics
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().toSeq
      == plain.groupBy("k").count().orderBy("k").collect().toSeq)
    assert(salted.agg(sum(col("id"))).head.getLong(0)
      == plain.agg(sum(col("id"))).head.getLong(0))
    // structural pins: the cold path stays SMJ (merge hint) and the dim
    // side carries the hot-key replication explode
    salted.collect()
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("SortMergeJoin"), planStr.take(2000))
    assert(planStr.contains("Generate") || planStr.contains("explode"),
      planStr.take(2000))
    // the hot key's fact rows actually spread: >1 distinct salt among them
    val hotSalts = fact.filter(col("k") === 0L)
      .select(pmod(xxhash64(col("id")), lit(8L)).as("s"))
      .distinct().count()
    assert(hotSalts > 1, s"hot key salts collapsed to $hotSalts value(s)")
  }

  test("salted join degenerates cleanly when no key is hot") {
    val fact = spark.range(1000).select(col("id"), (col("id") % 50).as("k"))
    val dim = spark.range(50).select(col("id").as("dk"))
    val salted = graft.operators.Relational
      .saltedSkewJoin(fact, dim, "k", "dk", saltR = 8, factId = Seq(col("id")))
    assert(salted.count() == 1000)
  }

  test("skewJoinRecommend advisory: exactly the flooded key; empty on uniform data") {
    // the q66 → q67 bridge (VERDICT r10 item 7): recommend() and
    // saltedSkewJoin share ONE hot predicate spelling, so the advisory's
    // verdict is by construction the mitigation's salt set
    val flooded = spark.range(20000)
      .select(col("id"), lit(0L).as("k"))
      .union(spark.range(990).select((col("id") + 100000).as("id"),
        (col("id") % 99 + 1).as("k")))
    val hot = graft.operators.Relational.skewJoinRecommend(flooded, "k")
      .collect().map(_.getLong(0)).toSeq
    assert(hot == Seq(0L), s"expected exactly the flooded key, got $hot")
    val uniform = spark.range(1000).select(col("id"), (col("id") % 50).as("k"))
    assert(graft.operators.Relational.skewJoinRecommend(uniform, "k").isEmpty,
      "uniform keys must recommend the plain join (empty hot set)")
  }
}
