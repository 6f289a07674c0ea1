package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The typed aggregation extension point (SURVEY.md §7: `Aggregator[IN,BUF,
  * OUT]` registered via `udaf` — "the designed extension point").
  *
  * The reference's only aggregate is SUM fused into count (hw4.cc:359-367);
  * Spark's built-ins cover that and far more, so a custom aggregate is only
  * warranted for semantics the function library lacks. This demonstrates the
  * machinery with a single-pass stats aggregate (count/sum/min/max in one
  * buffer — one shuffle where four built-in aggs would still be one shuffle,
  * but a custom sketch, e.g. a mergeable MinHash union, would use exactly
  * this shape). The buffer sum is exact BigDecimal so the DuckDB oracle
  * hash-matches (see graft.Exprs).
  *
  * Note: `udaf` aggregates run on the ObjectHashAggregate path (no codegen);
  * prefer built-ins in hot paths and reserve this surface for genuinely
  * custom mergeable state.
  */
object TypedAggs {

  final case class StatsBuf(n: Long, sum: java.math.BigDecimal,
      mn: Double, mx: Double)
  final case class StatsOut(n_rows: Long, sum_v: Double, min_v: Double,
      max_v: Double)

  /** Single-pass (count, exact sum, min, max) over a double column. */
  object DoubleStats extends Aggregator[Double, StatsBuf, StatsOut] {
    override def zero: StatsBuf =
      StatsBuf(0L, java.math.BigDecimal.ZERO,
        Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: StatsBuf, x: Double): StatsBuf =
      StatsBuf(b.n + 1, b.sum.add(new java.math.BigDecimal(x.toString)),
        math.min(b.mn, x), math.max(b.mx, x))
    override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.n + b.n, a.sum.add(b.sum),
        math.min(a.mn, b.mn), math.max(a.mx, b.mx))
    override def finish(b: StatsBuf): StatsOut =
      StatsOut(b.n, b.sum.doubleValue(), b.mn, b.mx)
    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[StatsOut] = Encoders.product[StatsOut]
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // Custom typed aggregate over lineitem quantity, grouped by return flag.
    "q21_typed_agg" -> { (s, dir) =>
      val stats = udaf(DoubleStats)
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(stats(col("l_quantity")).as("st"))
        .select(col("l_returnflag"), col("st.n_rows").as("n_rows"),
          col("st.sum_v").as("sum_qty"), col("st.min_v").as("min_qty"),
          col("st.max_v").as("max_qty"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q21_typed_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin
  )
}
