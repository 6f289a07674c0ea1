package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Proves the bucketed co-located join: both sides written bucketed on the
  * join key → the join plans with zero Exchange operators. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("joining two tables bucketed on the key requires no shuffle") {
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force SMJ so the demo isn't hidden behind a broadcast at tiny sf
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(joined.count() > 0)

      // control: the same join on unbucketed inputs DOES shuffle
      val unbucketed = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .join(Tables.load(spark, dir, "lineitem")
          .withColumnRenamed("l_orderkey", "o_orderkey")
          .select("o_orderkey", "l_quantity"), "o_orderkey")
      val pu = unbucketed.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(pu.contains("Exchange"), pu)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
