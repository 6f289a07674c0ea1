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
}
