package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** g1's degree-oriented triangle counting: exact counts on a known graph
  * (every triangle counted once, hubs generate no wedges) and the
  * no-quadratic-expansion plan shape. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** lineitem fixture whose co-order graph (support >= 2) is exactly:
    *  - K4 on parts 1-4 (two orders containing all four parts), and
    *  - a star: hub 10 joined to leaves 20-25 (each leaf pair-ordered with
    *    the hub twice, never with another leaf).
    * K4 has 4 triangles and, oriented, 4 wedges (all closed); the star's
    * leaves have out-degree 1, so it contributes ZERO wedges — the hub
    * never enumerates its neighborhood². */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-graph").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType)))
    val k4 = for (ok <- Seq(100L, 101L); pk <- Seq(1L, 2L, 3L, 4L))
      yield Row(ok, pk)
    val star = for {
      (leaf, i) <- (20L to 25L).zipWithIndex
      ok <- Seq(200L + 2 * i, 201L + 2 * i)
      pk <- Seq(10L, leaf)
    } yield Row(ok.toLong, pk)
    spark.createDataFrame(
        spark.sparkContext.parallelize(k4 ++ star, 3), schema)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("g1 counts the known graph exactly: K4's 4 triangles, star contributes none") {
    val r = Graph.defs("g1_triangle_count")(spark, dir).collect().head
    assert(r.getLong(0) == 11, s"nodes: $r")     // 4 K4 + hub + 6 leaves
    assert(r.getLong(1) == 12, s"edges: $r")     // 6 K4 + 6 star
    assert(r.getLong(2) == 4, s"wedges: $r")     // all from K4, all closed
    assert(r.getLong(3) == 4, s"triangles: $r")  // C(4,3)
    assert(r.getDouble(4) == 1.0, s"closed_frac: $r")
  }

  test("g1's star wedges vanish under orientation even when the hub dominates") {
    // a pure star (no K4): any wedge would mean the hub enumerated two
    // neighbors — orientation must make the count zero, not O(deg²)
    val d = Files.createTempDirectory("graft-star").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_partkey", LongType)))
    val rows = for {
      (leaf, i) <- (20L to 39L).zipWithIndex
      ok <- Seq(200L + 2 * i, 201L + 2 * i)
      pk <- Seq(10L, leaf)
    } yield Row(ok.toLong, pk)
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = Graph.defs("g1_triangle_count")(spark, d).collect().head
    assert(r.getLong(1) == 20 && r.getLong(2) == 0 && r.getLong(3) == 0,
      s"star must yield zero wedges: $r")
  }

  test("g1's graph-scale joins are equi-joins; only the single-row count merge is a cross") {
    val p = Graph.defs("g1_triangle_count")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the wedge build and closure probe must be hash/merge equi-joins; the
    // only nested-loop joins allowed are the three single-row agg crosses
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj <= 3, s"unexpected nested-loop join at graph scale ($nlj)\n$p")
    assert(p.contains("LeftSemi"), s"closure must be a semi-join\n$p")
  }
}
