package graft.operators

import graft.GraftCkpt
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

import graft.Exprs._
import graft.sources.Tables

/** Relational operator surface, Spark-first.
  *
  * The reference (hw4.cc) has exactly one pipeline — scan → tokenize → map →
  * shuffle → sort → group → sum → sink (SURVEY.md §2.1) — and §2.2 records that
  * joins/windows/top-k/set-ops/etc. have NO reference implementation. This pack
  * is the §7 extension surface: every query is a declarative DataFrame plan so
  * Catalyst owns pushdown, join strategy (broadcast vs SMJ via AQE), partial
  * aggregation, and whole-stage codegen. Nothing here collects to the driver.
  *
  * Scale posture (100 TB): filters/projections sit directly on the scan
  * (parquet pushdown); small dims (region/nation/customer at TPC-H ratios) are
  * broadcast explicitly; aggregates are partial+final hash aggregation; top-k
  * uses TakeOrderedAndProject (no global sort materialization).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary: scan-level filter + hash aggregate.
    "q1_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    // Predicate + projection pushdown: only 5 columns reach the scan.
    "q2_filter_project" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType)
          && col("l_quantity") > 45 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
    },

    // TPC-H Q3-shaped: fact-fact join + broadcast dim, grouped revenue.
    "q3_order_revenue" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
    },

    // TPC-H Q5-shaped star join: two broadcast dims + customer/orders/lineitem.
    "q4_region_revenue" -> { (s, dir) =>
      val r = t(s, dir, "region")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Left-semi join (EXISTS): orders having any heavy lineitem.
    "q5_semi_join" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // Left-anti join (NOT EXISTS): parts never shipped in bulk.
    "q6_anti_join" -> { (s, dir) =>
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem").filter(col("l_quantity") > 40)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
    },

    // Window functions: rank + running sum over deterministic frames.
    "q7_window_rank" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val byPrice = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(byPrice).cast(LongType).as("price_rank"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(byDate)
            .cast(DoubleType).as("running_spend"))
        .filter(col("price_rank") <= 3)
    },

    // Top-k: TakeOrderedAndProject, deterministic tie-break on key.
    "q8_topk" -> { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    },

    // Multi-distinct aggregation. NOT countDistinct×3: Catalyst plans that
    // via an Expand node that replicates every input row 4× through one
    // shuffle — the single biggest scale hazard flagged in VERDICT r1. The
    // two-phase form below shuffles each key's *deduplicated* (flag, key)
    // pairs instead (map-side partial dedup), then joins three tiny per-flag
    // aggregates (AQE broadcasts them). Same result, no 4× amplification.
    "q9_distinct_agg" -> { (s, dir) =>
      val l = t(s, dir, "lineitem")
        .select("l_returnflag", "l_partkey", "l_suppkey", "l_orderkey")
      // countDistinct semantics preserved on nullable data: NULL keys are
      // excluded from the distinct counts (filter), and a NULL group key
      // survives the joins (null-safe <=> + left join + coalesce(0)).
      def dc(key: String, alias: String) =
        l.filter(col(key).isNotNull)
          .select(col("l_returnflag").as(s"${alias}_flag"), col(key)).distinct()
          .groupBy(s"${alias}_flag").agg(count(lit(1)).as(alias))
      val base = l.groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      Seq(("l_partkey", "n_parts"), ("l_suppkey", "n_supps"),
        ("l_orderkey", "n_orders"))
        .foldLeft(base) { case (acc, (key, alias)) =>
          acc.join(dc(key, alias),
              col("l_returnflag") <=> col(s"${alias}_flag"), "left")
            .drop(s"${alias}_flag")
        }
        .select(col("l_returnflag"),
          coalesce(col("n_parts"), lit(0L)).as("n_parts"),
          coalesce(col("n_supps"), lit(0L)).as("n_supps"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("n_rows"))
    },

    // Set operations: INTERSECT / EXCEPT / UNION ALL in one result.
    "q10_setops" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val richCust = c.filter(col("c_acctbal") > 5000).select(col("c_custkey").as("custkey"))
      val bigSpenders = o.filter(col("o_totalprice") > 400000).select(col("o_custkey").as("custkey"))
      val medSpenders = o.filter(col("o_totalprice") > 450000).select(col("o_custkey").as("custkey"))
      val allCust = c.select(col("c_custkey").as("custkey"))
      richCust.intersect(bigSpenders).withColumn("tag", lit("rich_and_big"))
        .unionAll(allCust.except(medSpenders).withColumn("tag", lit("no_450k_order")))
        .select("tag", "custkey")
    },

    // ROLLUP grouping sets with subtotal rows made null-free.
    "q11_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
    },

    // CUBE over order status x priority.
    "q12_cube" -> { (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("spend"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("spend"))
    },

    // HAVING: post-aggregation filter.
    "q13_having" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 12)
    },

    // Scalar subquery: orders above 1.5x the exact global mean.
    "q14_scalar_subquery" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val thr = o.agg((dsum(col("o_totalprice")) / count(lit(1)) * 1.5).as("thr"))
      o.join(broadcast(thr))
        .filter(col("o_totalprice") > col("thr"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // Time-bucketed aggregation over the events stream table (batch view).
    "q15_events_hourly" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value"), 6).as("sum_value"))
        .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
          col("event_type"), col("n_events"), col("sum_value"))
    },

    // Sessionization: 30-minute inactivity gap, via lag + running sum windows.
    "q16_sessionize" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          unix_millis(col("ts")).as("ms"))
      val byTs = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      val brk = when(col("ms") - lag(col("ms"), 1).over(byTs) > 30L * 60 * 1000, 1L)
        .otherwise(when(lag(col("ms"), 1).over(byTs).isNull, 1L).otherwise(0L))
      e.withColumn("brk", brk)
        .withColumn("session_id", sum(col("brk")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), min(col("ms")).as("start_ms"),
          max(col("ms")).as("end_ms"), dsum(col("value"), 6).as("sum_value"))
    },

    // Semi-structured: JSON field extraction from the props column.
    "q17_json_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .filter(col("k") > 50)
    },

    // Scalar string function pack.
    "q18_string_funcs" -> { (s, dir) =>
      t(s, dir, "part")
        .filter(col("p_name").like("%a%"))
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          lower(col("p_type")).as("type_l"),
          substring(col("p_name"), 1, 8).as("name8"),
          length(col("p_name")).cast(LongType).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"))
    },

    // Date-part bucketing.
    "q19_date_buckets" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
    },

    // Conditional aggregation (pivot-style counts without a shuffle per case).
    "q20_conditional_agg" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          lsum(when(col("l_quantity") > 25, 1).otherwise(0)).as("n_big_qty"),
          lsum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_discounted"),
          lsum(when(col("l_tax") > 0.04, 1).otherwise(0)).as("n_taxed"),
          count(lit(1)).as("n"))
    },

    // Salted two-phase aggregation: the skew-mitigation pattern for hot
    // group keys at scale. Phase 1 aggregates on (key, salt) — a hot key's
    // rows spread over 16 reducers; phase 2 merges the ≤16 partials per key.
    // Partial sums stay DECIMAL so the merged result is bit-identical to a
    // single-phase sum (decimal addition is associative).
    "q22_salted_agg" -> { (s, dir) =>
      t(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(col("value").cast(DecimalType(18, 6))).as("ps"))
        .groupBy("event_type")
        .agg(sum("pn").cast(LongType).as("n_events"),
          sum("ps").cast(DoubleType).as("sum_value"))
    },

    // Approximate sketches: HLL distinct + approximate percentile. Sketch
    // VALUES can't be oracle-compared (internals differ across engines), so
    // the query emits the exact statistics alongside BOUND BOOLEANS — the
    // sketch's accuracy contract evaluated against the exact values — and
    // the oracle recomputes the exact columns and asserts the bounds hold.
    // HLL at rsd=0.02 against a 10% bound (5 sigma) and accuracy-1000
    // percentile against the exact p45..p55 band: both have astronomically
    // small violation odds on any data, so the gate is stable across SFs
    // (ApproxSpec additionally re-derives the bounds from raw exacts).
    // The exact columns here exist to GATE the sketch; at 100 TB production
    // keeps only the sketch side — that is the point of the sketch.
    "q23_approx_stats" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users_exact"),
          approx_count_distinct(col("user_id"), 0.02).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("am"),
          expr("percentile(value, 0.45D)").as("p45"),
          expr("percentile(value, 0.55D)").as("p55"))
        .select(col("event_type"), col("n_events"), col("n_users_exact"),
          (abs(col("au") - col("n_users_exact")).cast(DoubleType)
            / col("n_users_exact") <= 0.10).as("users_within_10pct"),
          col("am").between(col("p45"), col("p55")).as("median_in_p45_p55"))
    },

    // As-of join — an operator Spark has no native primitive for (the brief's
    // canonical example), composed from built-ins: each 'click' is joined to
    // the user's most recent prior-or-same-time 'view' by carrying the last
    // seen view forward in one event-time window. ONE shuffle on user_id —
    // the range-join-free as-of pattern; a naive inequality join would be a
    // per-user cross product.
    "q24_asof_join" -> { (s, dir) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("last_view_id",
          last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true)
            .over(w))
        .withColumn("last_view_ms",
          last(when(col("event_type") === "view", col("ms")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "click" && col("last_view_id").isNotNull)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("last_view_id"), (col("ms") - col("last_view_ms")).as("ms_since_view"))
    },

    // SQL API + correlated subquery: the one dialect-common SQL string runs
    // verbatim in spark.sql AND as the DuckDB oracle. Catalyst decorrelates
    // the EXISTS into a left-semi join (same plan family as q5's DSL form).
    "q25_correlated_exists" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(correlatedExistsSql)
    },

    // RANGE window frame: per-customer 7-day trailing spend — the
    // value-range frame (rangeBetween over a time axis), complementing
    // q7's row-count frame. One shuffle on the partition key.
    "q27_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("d"))
        .rangeBetween(-6, 0) // d is epoch DAYS: 6 preceding + current = 7-day window
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)").as("d"),
          col("o_totalprice"))
        .withColumn("trailing_7d_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType))
        .select("o_orderkey", "o_custkey", "trailing_7d_spend")
    },

    // Pivot: event counts reshaped to one column per event type. Compiles to
    // the same conditional-aggregation plan the oracle states explicitly —
    // pivot is API sugar, not a new physical operator.
    "q28_pivot" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("error"), lit(0L)).as("n_error"))
    },

    // Explicit GROUPING SETS with grouping_id — finer than rollup/cube
    // (q11/q12); dialect-common SQL shared verbatim with the oracle.
    "q29_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(groupingSetsSql)
    },

    // Supplier-dimension rollup: fact scan + two broadcast dims (supplier,
    // nation), shipped volume per supplier nation.
    "q26_supplier_share" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Ranking-window suite: ntile / percent_rank / cume_dist / lead — the
    // remaining window shapes q7/q16/q27 don't cover. One shuffle on the
    // partition key; the ORDER BY carries a unique tiebreak (o_orderkey) so
    // every function is deterministic. percent_rank/cume_dist are exact
    // small-integer ratios — bit-identical across engines.
    "q30_window_suite" -> { (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
    },

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL keep duplicates — the
    // bag semantics q10's distinct-set forms don't exercise. Customers'
    // per-order key multisets, so multiplicity matters.
    "q31_setops_all" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val big = o.filter(col("o_totalprice") > 350000).select(col("o_custkey").as("custkey"))
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
      big.intersectAll(urgent).withColumn("tag", lit("big_and_urgent"))
        .unionAll(big.exceptAll(urgent).withColumn("tag", lit("big_not_urgent")))
        .select("tag", "custkey")
    },

    // Full outer join: both unmatched sides preserved — the one join type
    // q3-q6 don't cover. Sides are filtered to force all three match cases;
    // the dimension side is small but a FULL join cannot broadcast (both
    // sides must see all unmatched rows), so Spark correctly plans SMJ.
    "q32_full_outer" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 500000)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_acctbal"), col("o_orderkey"), col("o_totalprice"))
    },

    // EXACT percentiles per group — the complement to q23's sketches (which
    // are rows-only checked because sketches aren't cross-engine
    // reproducible). Spark's `percentile` and DuckDB's `quantile_cont` both
    // implement type-7 linear interpolation at index p·(n-1); the inputs
    // are the same doubles, so the interpolated values hash-match. Exact
    // percentile is a full-sort-per-group aggregate — fine keyed by a
    // low-cardinality group, the sketch (q23) is the scale path for
    // high-cardinality keys.
    "q33_exact_percentile" -> { (s, dir) =>
      // array-percentile form: ONE value buffer per column instead of one
      // per requested quantile (exact percentile buffers the group's full
      // multiset — the buffer, not the interpolation, is the cost)
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.5D, 0.9D))").as("qp"),
          expr("percentile(l_extendedprice, array(0.25D, 0.75D))").as("pp"))
        .select(col("l_returnflag"),
          col("qp").getItem(0).as("qty_p50"),
          col("qp").getItem(1).as("qty_p90"),
          col("pp").getItem(0).as("price_p25"),
          col("pp").getItem(1).as("price_p75"))
    },

    // UNPIVOT/melt — the inverse of q28's pivot: wide per-group measure
    // columns back to long (group, metric, value) rows. Spark's native
    // `unpivot` is a zero-shuffle Expand over the aggregated frame (3 rows
    // out per row in, no extra exchange); the oracle spells it as the
    // portable UNION ALL. All measures share one type (the dsum double),
    // which is what makes the melt well-typed.
    "q34_unpivot" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
    },

    // Batch time-interval (range) join — the BINNED equi-join form of the
    // range join x3 runs stream-stream: each click matched to the same
    // user's views in the preceding 30 minutes. A raw theta join
    // (`user AND range`) sort-merge-joins on user_id alone and applies the
    // range as a post-join filter, so a power user's full click×view
    // history crosses the join before any row is dropped. Binning both
    // sides to 30-minute buckets turns the range into part of the JOIN KEY:
    // a qualifying view can only sit in the click's bin or the one before,
    // so the click side probes (bin, bin-1) — a fixed 2× fan-out — and the
    // exact range predicate filters the residue. Per-key join cardinality
    // is a user's 30-MINUTE activity, never their lifetime history; each
    // matched pair is produced exactly once (a view has one bin, the probe
    // bins are distinct). This is the generic recipe for any band/interval
    // join Spark lacks a native operator for.
    "q35_range_join" -> { (s, dir) =>
      val binMs = 1800000L // = the interval width; wider bins trade probe
                           // count for residual-filter selectivity
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ms").as("v_ms"), expr(s"ms div $binMs").as("bin"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ms").as("c_ms"),
          explode(array(expr(s"ms div $binMs"), expr(s"ms div $binMs - 1")))
            .as("bin"))
      clicks.join(views, Seq("user_id", "bin"))
        .filter(col("c_ms") >= col("v_ms") && col("c_ms") <= col("v_ms") + binMs)
        .select(col("click_id"), col("user_id"), col("view_id"),
          (col("c_ms") - col("v_ms")).as("ms_gap"))
    },

    // KMV (k-minimum-values) distinct sketch — the ENGINE-PORTABLE
    // alternative to q23's opaque HLL: hash every key with md5, keep the k
    // smallest hash values per group, estimate |distinct| = (k-1)/u_k where
    // u_k is the k-th smallest hash normalized to [0,1) (Bar-Yossef et al.,
    // "Counting distinct elements in a data stream"). Because the hash and
    // the selection are deterministic, two engines agree BIT-FOR-BIT on the
    // estimate — which is why this query is oracle-gated while q23 cannot
    // be. Plan: two-phase distinct on (event_type, user_id) — the q9 shape,
    // shuffle carries deduplicated pairs — then the custom MERGEABLE
    // bottom-k aggregate (functions/BottomKAgg, the typed-Aggregator
    // extension point): partial aggregation reduces each map-side partition
    // to <= k longs per group BEFORE the shuffle, where the rank-window
    // form would shuffle the group's whole distinct hash set to one
    // partition and sort it to find 64 values. The multiset's k smallest
    // is merge-order independent, so the result — and the DuckDB oracle,
    // which spells it as the rank window — is unchanged.
    "q36_kmv_sketch" -> { (s, dir) =>
      val k = 64
      val bottomK = udaf(new graft.functions.BottomKAgg(k))
      t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"),
          graft.functions.HexPrefixToLong
            .hex8(md5(col("user_id").cast(StringType))).as("hv"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_exact"), bottomK(col("hv")).as("bot"))
        .select(col("event_type"), col("n_exact"),
          when(size(col("bot")) === k,
            lit((k - 1).toDouble * 4294967296.0) /
              element_at(col("bot"), k).cast(DoubleType))
            .otherwise(col("n_exact").cast(DoubleType)).as("est_users"))
    },

    // Runtime Bloom-filter semi-join reduction — the missing piece between
    // "broadcast the small side" (impossible when the build side is merely
    // SMALLER, not SMALL) and "shuffle both sides" (pays full freight for
    // fact rows that can never match). The filtered orders' KEY SET is
    // OR-folded into a 64 Kbit bitset by the mergeable BloomAgg (partial
    // aggregation ships one 1024-word array per map partition, never the
    // keys), the single-row bitset is BROADCAST into the lineitem scan, and
    // k=3 double-hashed probes (Kirsch-Mitzenstein: bit_i = h1 + i*h2 mod m)
    // drop non-matching fact rows BEFORE the join shuffle. False positives
    // survive the probe but die in the residual equi-join, so the result is
    // EXACT — the oracle is the plain join — while the shuffle carries only
    // matching-or-FP rows. At 100 TB this is the difference between
    // shuffling the whole fact table and shuffling the ~selectivity
    // fraction that can match (Spark's own runtime row-group filters apply
    // below the exchange; this is the same idea as an explicit, pinnable
    // operator). No-false-negatives and partition-order-independent merge
    // are pinned by BloomSpec.
    "q37_bloom_join" -> { (s, dir) =>
      val bits = 1 << 16
      val k = 3
      val bloomAgg = udaf(new graft.functions.BloomAgg(bits, k))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1998-06-01").cast(TimestampType))
        .select(col("o_orderkey"), col("o_orderpriority"))
      val bloom = o
        .select(bloomPacked(col("o_orderkey")).as("pk"))
        .agg(bloomAgg(col("pk")).as("bf"))
      val probeCond = (0 until k).map { i =>
        expr(s"""(shiftright(element_at(bf,
                 |    CAST(((ph1 + $i * ph2) % $bits) div 64 AS INT) + 1),
                 |  CAST(((ph1 + $i * ph2) % $bits) % 64 AS INT)) & 1) = 1"""
          .stripMargin)
      }.reduce(_ && _)
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      bloomProbe(l, col("l_orderkey"), bloom)
        .filter(probeCond)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // Z-order (Morton) layout keys — the multi-dimensional data-layout
    // primitive: interleaving the bits of two columns makes rows close in
    // BOTH dimensions close in sort order, so parquet min/max zone maps
    // prune 2-D box predicates where a linear sort prunes only its leading
    // column (the construction behind OPTIMIZE ZORDER BY in public
    // lakehouse engines). The native codegen'd `morton16` expression
    // (functions/MortonCode) computes the interleave in one static call.
    // This query aggregates lineitem into 4096-key z-cells and reports each
    // cell's (partkey, suppkey) bounding box — the per-cell min/max IS the
    // zone-map a writer would get from range-partitioning by zkey: every
    // cell bounds a <= 64x64 box of the key space (the locality property;
    // pinned quantitatively in ZorderSpec, where z-range files touch ~4x
    // fewer files than a linear sort for a 2-D box probe). One scan, one
    // equi-keyed shuffle on the cell id.
    "q38_zorder_cells" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          graft.functions.MortonCode
            .morton16(col("l_partkey"), col("l_suppkey")).as("zkey"))
        .groupBy(expr("zkey div 4096").as("zcell"))
        .agg(count(lit(1)).as("n"),
          min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
          min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
    },

    // Equi-width value histogram — the distribution readout behind every
    // monitoring dashboard: 10 bins over the global [min, max] value
    // range, counted per event type. The range comes from a ONE-ROW
    // aggregate broadcast back into the scan (t11's
    // threshold-from-the-distribution shape), binning is a narrow
    // projection inside the scan stage, and the count is one partial+
    // final hash agg on (type, bin) — |types|·10 rows out whatever the
    // corpus. The bin arithmetic is float but DETERMINISTIC (identical
    // IEEE ops both engines, same operand order), and the max value
    // clamps into bin 9 so the histogram partitions exactly.
    "q52_value_histogram" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val mm = ev.agg(min("value").as("lo"), max("value").as("hi"))
      ev.crossJoin(broadcast(mm))
        .withColumn("bin",
          least(floor((col("value") - col("lo")) * 10.0 / (col("hi") - col("lo"))),
            lit(9.0)).cast(LongType))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
    },

    // TPC-H Q10-shaped returned-item customer ranking — the canonical
    // "who cost us money last quarter" multi-join: returned lineitems ⋈
    // half-year orders ⋈ customer ⋈ nation, revenue-ranked top 20. The
    // plan to want at 100 TB: both fact filters (returnflag, date range)
    // sit ON the scans so only the qualifying slice shuffles, nation is
    // broadcast, and the top-20 is TakeOrderedAndProject — per-partition
    // heaps of 20 rows to the driver, never a global sort. The rank
    // tie-breaks on custkey so the cut at 20 is deterministic across
    // engines (revenue ties would otherwise make the boundary row
    // engine-dependent).
    "q53_customer_returns" -> { (s, dir) =>
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType)
          && col("o_orderdate") < lit("1997-07-01").cast(TimestampType))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Robust outlier detection via median absolute deviation — the
    // monitoring-grade alternative to mean±3σ (which outliers themselves
    // corrupt): per event type, med = exact p50, MAD = exact p50 of
    // |value − med|, outlier ⇔ |value − med| > 3·MAD. Two grouped
    // percentile passes (q33's one-buffer-per-group machinery) with the
    // per-type medians BROADCAST back into the scan between them — the
    // group count is dashboard-sized, so the second pass is a narrow
    // projection + hash agg, never a re-shuffle of the fact. All derived
    // arithmetic is IEEE-identical in both engines (subtraction, abs,
    // compare — no reordered float sums), so the counts hash-gate.
    // Degenerate-case caveat (ADVICE r9): when over half a type's values
    // are identical, MAD = 0 and `adev > 3·MAD` flags EVERY non-median
    // value — the standard MAD collapse, deterministic and engine-
    // consistent. The `mad` column is emitted precisely so consumers can
    // discount mad = 0 groups; an epsilon floor would trade a documented
    // readout for a float constant that breaks the hash-gate discipline.
    "q54_mad_outliers" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5D)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          max(col("med")).as("med"),
          max(col("mad")).as("mad"),
          sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // TPC-H Q8-shaped market share — the two-level share-of-total readout:
    // ASIA customers' revenue per (order year, customer nation), each
    // nation's share of its year. The share denominator comes from a
    // WINDOW over the |years|·|nations| aggregate (never a second pass
    // over the fact), and — the decimal discipline's window case — the
    // year total is summed as DECIMAL inside the window too: a double
    // window-sum adds in partition row order, which no engine pair
    // replays identically. Both sums stay exact until the final
    // double-cast; the share is then ONE IEEE division. Region/nation
    // broadcast; one fact shuffle for the (year, nation) agg.
    "q55_market_share" -> { (s, dir) =>
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val yearW = Window.partitionBy("o_year")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).as("rev_dec"))
        .withColumn("tot_dec", sum(col("rev_dec")).over(yearW))
        .select(col("o_year"), col("n_name"),
          col("rev_dec").cast(DoubleType).as("revenue"),
          (col("rev_dec").cast(DoubleType) / col("tot_dec").cast(DoubleType))
            .as("share"))
    },

    // Equi-DEPTH histogram — q52's equi-width twin, binned by the
    // distribution instead of the range: decile CUTPOINTS from one
    // grouped exact-percentile aggregate (q33's one-buffer machinery)
    // broadcast back into the scan, bin = how many cutpoints the value
    // has reached (9-element in-row fold — never a per-group ntile,
    // whose global per-type sort is the textbook skew hazard at corpus
    // scale). Ties straddling a cutpoint land LEFT-inclusive in both
    // engines (>= on bit-identical interpolated doubles — q33 proved the
    // interpolation matches), so bucket counts near-equalize rather than
    // exactly equalize: that is the honest cutpoint-histogram semantics,
    // and the lo/hi columns expose it.
    "q56_equidepth_hist" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val cuts = ev.groupBy("event_type")
        .agg(expr("percentile(value, array(0.1D, 0.2D, 0.3D, 0.4D, 0.5D," +
          " 0.6D, 0.7D, 0.8D, 0.9D))").as("cuts"))
      ev.join(broadcast(cuts), "event_type")
        .withColumn("bin",
          expr("CAST(size(filter(cuts, c -> value >= c)) AS BIGINT)"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
    },

    // Fulfillment-span analysis — the order-lifecycle readout: per order,
    // the first→last lineitem ship-date span, then span statistics per
    // order priority (the ops dashboard: do urgent orders actually ship
    // tighter?). Two stacked aggregations — a per-order min/max collapse
    // (partial+final on the join key it already shares with orders) and a
    // |priorities|-row rollup with exact integer day spans + one exact
    // percentile per group. The fact joins orders AFTER collapsing to one
    // row per order — joining first would carry every lineitem through
    // the join for no reason.
    "q61_fulfillment_span" -> { (s, dir) =>
      val spans = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(datediff(max("l_shipdate"), min("l_shipdate")).cast(LongType)
          .as("span_days"))
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .join(spans, "o_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          graft.Exprs.lsum(col("span_days")).as("total_span_days"),
          max("span_days").as("max_span_days"),
          expr("percentile(span_days, 0.5D)").as("median_span_days"))
    },

    // Type-2 SCD MERGE — the slowly-changing-dimension apply every
    // warehouse runs nightly and the pack's one missing write-side
    // relational op: a change batch upserts into a versioned dimension,
    // closing the prior row (valid_to set, no longer current) and opening
    // a new current row, while untouched keys pass through. The change
    // batch here is deterministic — customers whose md5(custkey) residue
    // is below 1/8 get a re-segmented record (t23's split idiom, so both
    // engines derive the identical batch) — and the merge is ONE narrow
    // pass: broadcast the (dimension-key-sized) change batch, then each
    // dimension row explodes to its 1-or-2 output versions in-row — no
    // shuffle at all, which is the point: an SCD apply is a map over the
    // dimension however large it is, never a re-aggregation. At 100 TB
    // the dimension write is partitioned by key range and the change
    // batch stays broadcast-sized (a day's dimension churn). Validity
    // columns are string literals (cross-engine date hashing is a
    // formatting trap the pack avoids); is_current is 0/1.
    "q62_scd2_merge" -> { (s, dir) =>
      val asOf = "2024-01-15"
      val opened = "2023-01-01"
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val changes = cust
        .filter(substring(md5(col("c_custkey").cast(StringType)), 1, 1) < "2")
        .select(col("c_custkey"),
          concat(lit("SEG_"), col("c_mktsegment")).as("new_segment"))
      cust.join(broadcast(changes), Seq("c_custkey"), "left")
        .select(col("c_custkey"), explode(
          when(col("new_segment").isNotNull, array(
            struct(col("c_mktsegment").as("segment"),
              lit(opened).as("valid_from"), lit(asOf).as("valid_to"),
              lit(0L).as("is_current")),
            struct(col("new_segment").as("segment"),
              lit(asOf).as("valid_from"),
              lit(null).cast(StringType).as("valid_to"),
              lit(1L).as("is_current"))))
            .otherwise(array(
              struct(col("c_mktsegment").as("segment"),
                lit(opened).as("valid_from"),
                lit(null).cast(StringType).as("valid_to"),
                lit(1L).as("is_current")))))
          .as("r"))
        .select(col("c_custkey"), col("r.segment").as("segment"),
          col("r.valid_from").as("valid_from"),
          col("r.valid_to").as("valid_to"),
          col("r.is_current").as("is_current"))
    },

    // POINT-IN-TIME (temporal) join — the query side of the SCD story
    // q45/q62 build: each event joins the dimension VERSION that was
    // valid at its timestamp (the "what segment was this customer in
    // when they clicked" question; joining the current row back-dates
    // attributes and silently corrupts history). The join is EQUI on the
    // customer key with the validity range as a residual predicate —
    // fan-out is bounded by versions-per-key (≤ 2 here; dimension churn
    // in general), never a range-join cross product. Validity compares
    // are ISO date STRINGS (lexicographic == chronological), the
    // open-ended current row closes with a '9999-12-31' sentinel, and
    // the rollup keeps the output (segment × type)-sized. At 100 TB the
    // dimension shuffles once on its key opposite the fact — the
    // standard warehouse temporal-join plan.
    "q64_temporal_join" -> { (s, dir) =>
      val dim = defs("q62_scd2_merge")(s, dir)
        .select(col("c_custkey"), col("segment"), col("valid_from"),
          coalesce(col("valid_to"), lit("9999-12-31")).as("valid_to"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"),
          date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .join(dim, col("user_id") === col("c_custkey")
          && col("d") >= col("valid_from") && col("d") < col("valid_to"))
        .groupBy("segment", "event_type")
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"))
    },

    // TIME-WEIGHTED average — the monitoring/finance aggregate where a
    // value HOLDS until the next observation of the same series: per
    // event_type, twa = Σ value·hold / Σ hold over the step function the
    // events trace (a plain AVG over-weights bursts; TWA weights each
    // observation by how long it was current). The naive spelling is ONE
    // window partitioned by type — |types| partitions, a 100 TB skew
    // cliff. Decomposed (q46's carry discipline): successor lookup runs
    // in (type, hour) window partitions — corpus-scale work rides
    // |types|·|hours| partitions — and the cross-hour link is the
    // per-(type, hour) FIRST-observation table, |types|·|hours| rows,
    // lead-chained per type and broadcast back. Arithmetic is exact to
    // the last step: value in integer micros (q59's discipline), holds
    // in integer ms, per-element products < 2^63 (value_micro ≤ ~6e8,
    // hold ≤ one month ≈ 2.6e9 ms), sums in DECIMAL(38,0)/HUGEINT; the
    // only float ops are the final divisions, IEEE-deterministic in both
    // engines. Each series' last observation has no successor and is
    // excluded (its hold is open-ended; a dashboard clamps it to `now`).
    "q65_time_weighted_avg" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ms"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
            .as("value_micro"))
        .withColumn("h", expr("ms div 3600000"))
        .graftCkpt() // two consumers: hold rows + per-hour firsts
      val inHour = Window.partitionBy("event_type", "h")
        .orderBy(col("ms"), col("event_id"))
      val firsts = e.groupBy("event_type", "h").agg(min(col("ms")).as("first_ms"))
      val link = firsts
        .withColumn("next_first_ms",
          lead(col("first_ms"), 1).over(Window.partitionBy("event_type").orderBy("h")))
        .select("event_type", "h", "next_first_ms")
      e.withColumn("next_in_hour", lead(col("ms"), 1).over(inHour))
        .join(broadcast(link), Seq("event_type", "h"))
        .withColumn("hold_ms",
          coalesce(col("next_in_hour"), col("next_first_ms")) - col("ms"))
        .filter(col("hold_ms").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_holds"),
          sum(col("hold_ms")).cast(LongType).as("total_hold_ms"),
          sum(expr("CAST(value_micro * hold_ms AS DECIMAL(38,0))")).as("wsum"))
        .select(col("event_type"), col("n_holds"), col("total_hold_ms"),
          (col("wsum").cast(DoubleType) /
            expr("CAST(nullif(total_hold_ms, 0) AS DOUBLE)") / lit(1e6)).as("twa"))
    },

    // JOIN-SKEW audit — the diagnostic a planner (human or automated)
    // runs BEFORE shipping a shuffle join at 100 TB: per candidate join
    // key, row/key counts, the heaviest key's row share (the salting
    // trigger q22 exists for), and exact p50/p90/p99 group sizes. The
    // scale discipline is the whole point: group sizes reduce to a
    // SIZE HISTOGRAM first (|distinct sizes| rows — thousands at any
    // corpus volume), so the percentile scan and its single-partition
    // cumulative window run over the tiny histogram, never a corpus-wide
    // sort (the q46/t16 tiny-table-window rule). Percentile rank is the
    // integer ceiling ceil(q·n_keys) picked as the smallest size whose
    // cumulative key count reaches it — exact longs end to end, no
    // interpolation (cross-engine float quantile semantics never
    // hash-gate). Two fact keys audited; each is one partial+final agg,
    // one tiny histogram agg, one broadcast of a 1-row total.
    "q66_join_skew_audit" -> { (s, dir) =>
      def audit(df: DataFrame, keyCol: String): DataFrame = {
        val h = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("sz"))
          .groupBy("sz").agg(count(lit(1)).as("nk"))
          .graftCkpt() // totals + cumulative both read it
        val tot = h.agg(sum(col("nk")).cast(LongType).as("n_keys"),
          sum(col("sz") * col("nk")).cast(LongType).as("n_rows"))
        h.withColumn("cum", sum(col("nk")).over(Window.orderBy("sz")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .agg(min(col("n_rows")).as("n_rows"), min(col("n_keys")).as("n_keys"),
            max(col("sz")).as("max_group"),
            min(when(expr("cum >= (n_keys * 50 + 99) div 100"), col("sz")))
              .as("p50_group"),
            min(when(expr("cum >= (n_keys * 90 + 99) div 100"), col("sz")))
              .as("p90_group"),
            min(when(expr("cum >= (n_keys * 99 + 99) div 100"), col("sz")))
              .as("p99_group"))
          .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_group"), expr("max_group * 1000000 div n_rows")
              .as("max_share_ppm"),
            col("p50_group"), col("p90_group"), col("p99_group"))
      }
      audit(t(s, dir, "orders"), "o_custkey")
        .unionAll(audit(t(s, dir, "lineitem"), "l_partkey"))
    },

    // Distribution DRIFT monitor — q52's histogram compared across two
    // time periods (first vs second half of the month): the check a
    // production pipeline runs before trusting that yesterday's model
    // assumptions still hold. Bins come from the GLOBAL range (one-row
    // broadcast, so both periods bin identically — per-period ranges
    // would make the comparison meaningless), counts are conditional
    // aggregates in ONE pass, and the per-bin drift is |p_A − p_B| with
    // each share a single division of exact longs — one subtraction,
    // deterministic. |types|·10 rows out whatever the corpus. A type with
    // ZERO rows in one period has no defined share there (0/0): Spark's
    // non-ANSI division yields NULL where DuckDB's IEEE mode yields NaN,
    // so both spellings route the denominator through nullif(total, 0) —
    // drift is NULL for such types (the readout for "new/vanished type",
    // distinct from drift 0.0) and the spellings agree bit-for-bit
    // (ADVICE r9).
    "q60_distribution_drift" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .withColumn("period",
          when(col("ts") < lit("2024-01-16").cast(TimestampType), "a")
            .otherwise("b"))
      val mm = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val binned = ev.crossJoin(broadcast(mm))
        .withColumn("bin",
          least(floor((col("value") - col("lo")) * 10.0 / (col("hi") - col("lo"))),
            lit(9.0)).cast(LongType))
      val tots = binned.groupBy("event_type")
        .agg(sum(when(col("period") === "a", 1L).otherwise(0L)).as("ta"),
          sum(when(col("period") === "b", 1L).otherwise(0L)).as("tb"))
      binned.groupBy("event_type", "bin")
        .agg(sum(when(col("period") === "a", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("period") === "b", 1L).otherwise(0L)).as("n_b"))
        .join(broadcast(tots), "event_type")
        .select(col("event_type"), col("bin"),
          col("n_a").cast(LongType).as("n_a"),
          col("n_b").cast(LongType).as("n_b"),
          abs(col("n_a").cast(DoubleType) / nullif(col("ta"), lit(0L))
            - col("n_b").cast(DoubleType) / nullif(col("tb"), lit(0L)))
            .as("drift"))
    },

    // Event-type CORRELATION matrix — which metrics co-move hourly, the
    // readout an ops dashboard uses to find redundant alerts and leading
    // indicators. The corpus-scale work is ONE (hour, type) hash count;
    // everything after runs on the |hours|·|types| grid (dashboard-sized
    // at any corpus volume — the q46/t16 discipline), zero-filled via a
    // cross join of the GENERATED min..max hour sequence with the distinct
    // type set, so every calendar hour in the observed span counts as 0
    // for every type that did not fire — including hours where NO type
    // fired at all (computing corr only over active hours is the classic
    // bias; ADVICE r10 caught that a present-hours axis still had it).
    // Pearson r follows g9's exact-arithmetic recipe: all five power
    // sums are DECIMAL(38,0)-exact, the numerator and both variance
    // terms are exact decimal cross-products, and r is ONE double
    // division over two IEEE sqrts — bit-portable. A constant series
    // (variance 0) has no defined correlation: guarded to NULL in both
    // engines (the q60 lesson).
    "q63_type_correlation" -> { (s, dir) =>
      val dec = DecimalType(38, 0)
      val hc = t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .graftCkpt()
      val axis = hc.agg(min("h").as("lo"), max("h").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
      val grid = axis
        .crossJoin(broadcast(hc.select("event_type").distinct()))
        .join(hc, Seq("h", "event_type"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
      val a = grid.select(col("h"), col("event_type").as("t1"),
        col("n").cast(dec).as("x"))
      val b = grid.select(col("h"), col("event_type").as("t2"),
        col("n").cast(dec).as("y"))
      val agg = a.join(b, Seq("h")).filter(col("t1") < col("t2"))
        .groupBy("t1", "t2")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val dx = col("n_hours") * col("sxx") - col("sx") * col("sx")
      val dy = col("n_hours") * col("syy") - col("sy") * col("sy")
      val num = col("n_hours") * col("sxy") - col("sx") * col("sy")
      agg.select(col("t1"), col("t2"), col("n_hours"),
        when(dx <= 0 || dy <= 0, lit(null).cast(DoubleType))
          .otherwise(num.cast(DoubleType)
            / (sqrt(dx.cast(DoubleType)) * sqrt(dy.cast(DoubleType))))
          .as("r"))
    },

    // Multi-touch ATTRIBUTION — each purchase's value split equally
    // across the same user's views in the preceding 2 hours: q42 credits
    // the FIRST touch; this is the linear model ad-tech actually
    // reconciles revenue against. The lookback join is q35's binned
    // equi-join (2-hour bins, purchases probe (bin, bin-1) — fixed 2×
    // fan-out, never a per-user history cross product); the equal split
    // is integer MICRO-UNITS (decimal-exact value × 1e6, floor-divided
    // by the view count) so per-user credit sums are exact longs — a
    // float value/n allocation summed per user is partition-order-
    // dependent and never hash-gates. Reconciliation is EXACT (ADVICE
    // r9): the div remainder (≤ nv−1 micro-units per purchase) goes to
    // the LATEST qualifying view (ties broken by view event_id — a total
    // order, so the assignment hash-gates), and purchases with NO
    // qualifying view roll up into one sentinel row (user_id = −1) —
    // Σ credit_micro over the whole result equals Σ value_micro over ALL
    // purchases, the invariant an ad-revenue reconciler audits.
    // PRECONDITION (ADVICE r10): the sentinel shares the user_id key
    // domain, so real user ids must be non-negative — true of the
    // testdata generator and of every TPC-H-ish surrogate key here; on a
    // dataset where −1 is a legal user_id, move the sentinel to a
    // separate boolean column instead of overloading the key.
    "q59_attribution" -> { (s, dir) =>
      val W = 7200000L
      val ev = t(s, dir, "events")
      // p and matched each feed TWO consumers (the attributed rollup and
      // the anti-join sentinel branch) — checkpointed so the events scan
      // and the bin-explode view join run once, not once per branch
      // (code-review r10; the hs0/sk/hc multi-consumer discipline)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_millis(col("ts")).as("p_ms"),
          expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
            .as("value_micro"),
          expr(s"unix_millis(ts) div $W").as("bin"))
        .graftCkpt()
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"),
          unix_millis(col("ts")).as("v_ms"),
          expr(s"unix_millis(ts) div $W").as("vbin"))
      val matched = p
        .withColumn("vbin", explode(array(col("bin"), col("bin") - 1)))
        .join(v, Seq("user_id", "vbin"))
        .filter(col("v_ms") <= col("p_ms") && col("v_ms") > col("p_ms") - W)
        .graftCkpt()
      val attributed = matched
        .withColumn("nv", count(lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("rn", row_number().over(Window.partitionBy("p_id")
          .orderBy(col("v_ms").desc, col("v_id").desc)))
        .withColumn("credit_micro",
          expr("value_micro div nv" +
            " + CASE WHEN rn = 1" +
            " THEN value_micro - (value_micro div nv) * nv ELSE 0 END"))
        .groupBy("user_id")
        .agg(countDistinct("p_id").as("n_purchases"),
          count(lit(1)).as("n_view_credits"),
          sum("credit_micro").cast(LongType).as("credit_micro"))
      // q50's audit discipline: the dropped rows become a counted row.
      // groupBy on the sentinel key ⇒ the row exists only when
      // unattributed purchases do (zero input rows → zero groups).
      val unattributed = p
        .join(matched.select("p_id"), Seq("p_id"), "left_anti")
        .groupBy(lit(-1L).as("user_id"))
        .agg(countDistinct("p_id").as("n_purchases"),
          lit(0L).as("n_view_credits"),
          sum("value_micro").cast(LongType).as("credit_micro"))
      attributed.unionAll(unattributed)
    },

    // POISSON BOOTSTRAP — the distributed-resampling primitive (Chamandy
    // et al., "Estimating Uncertainty for Massive Data Streams"): classic
    // bootstrap resamples n-of-n WITH replacement, which requires global
    // coordination; the Poisson approximation gives every row an
    // independent Poisson(1) weight per replicate, so 16 resampled means
    // come out of ONE scan as conditional aggregates — no shuffle ever
    // carries a resample. The weights are DETERMINISTIC Poisson draws:
    // u = md5(event_id, replicate) as a 32-bit uniform, inverted through
    // the exact cumulative-P(1) thresholds (literal doubles, identical
    // comparisons in both engines — rand() would never replay). Output is
    // the (type, replicate) mean table — 16·|types| rows; the caller reads
    // the spread as the standard error of the mean. The 16× explode lives
    // inside the scan stage; partial aggregation collapses it before the
    // one (type, replicate) shuffle.
    "q57_poisson_bootstrap" -> { (s, dir) =>
      // cumulative Poisson(1): e^-1 · Σ 1/k!
      val p = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
      val reps = t(s, dir, "events")
        .select(col("event_type"), col("value"), col("event_id"),
          explode(expr("sequence(0, 15)")).as("b"))
        .withColumn("u", graft.functions.HexPrefixToLong.hex8(
          md5(concat(col("event_id").cast(StringType), lit("_"),
            col("b").cast(StringType)))).cast(DoubleType) / lit(4294967296.0))
        .withColumn("w",
          p.zipWithIndex.foldRight(lit(6): Column) { case ((t0, k), e) =>
            when(col("u") < t0, lit(k)).otherwise(e)
          })
      reps.groupBy(col("event_type"), col("b").cast(LongType).as("b"))
        .agg(sum("w").cast(LongType).as("n_eff"),
          (sum((col("w") * col("value")).cast(DecimalType(18, 6)))
            .cast(DoubleType) / sum("w").cast(DoubleType)).as("mean_b"))
    },

    // Key-set CHECKSUM audit — the snapshot-equality primitive behind
    // replication checks and migration sign-offs: an order-independent
    // aggregate hash per table (sum of 32-bit md5 prefixes over the key
    // columns) that two sites compare WITHOUT moving data. Sums are
    // order-free so partial aggregation and any partitioning give the
    // same checksum; DECIMAL(38) accumulation holds corpus-scale sums
    // exactly. One narrow pass per table; keys only (q50's discipline) —
    // value-column checksums would need cross-engine float/timestamp
    // formatting parity the key columns don't.
    "q58_key_checksums" -> { (s, dir) =>
      def ck(name: String, keyExpr: String) =
        t(s, dir, name)
          .select(graft.functions.HexPrefixToLong.hex8(md5(expr(keyExpr)))
            .as("h"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("h").cast(DecimalType(38, 0))).cast(LongType).as("checksum"))
          .select(lit(name).as("table_name"), col("n_rows"), col("checksum"))
      ck("lineitem",
          "concat(CAST(l_orderkey AS STRING), '_', CAST(l_partkey AS STRING)," +
            " '_', CAST(l_suppkey AS STRING))")
        .unionAll(ck("orders", "CAST(o_orderkey AS STRING)"))
        .unionAll(ck("customer", "CAST(c_custkey AS STRING)"))
        .unionAll(ck("part", "CAST(p_partkey AS STRING)"))
    },

    // KMV sketch SET ALGEBRA — the reason mergeable sketches beat exact
    // distinct at scale is not the single count (q36) but the algebra:
    // union/intersection cardinalities between every audience pair
    // (which event types share users?) from k-sized sketches, where the
    // exact answer joins complete user sets per pair. Union sketch =
    // bottom-k of the deduplicated union of the two bottom-ks (exactly
    // the window-merge identity q49 relies on); intersection via the
    // KMV Jaccard estimator — any union-bottom-k element belonging to A
    // is necessarily in A's bottom-k, so membership tests run on the
    // SKETCHES, never the corpus. Deterministic md5 ranks make every
    // estimate itself hash-gate (q36's property), and the exact
    // counterparts ride along so the gate verifies the estimator AND the
    // caller sees its error. Corpus-scale work: ONE distinct collapse +
    // one per-type sketch agg + one user-keyed pair join for the exact
    // intersections; everything pairwise runs on |types|² sketch rows.
    "q51_sketch_setops" -> { (s, dir) =>
      val k = 64
      val bottomK = udaf(new graft.functions.BottomKAgg(k))
      val du = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
        .select(col("event_type"), col("user_id"),
          graft.functions.HexPrefixToLong
            .hex8(md5(col("user_id").cast(StringType))).as("hv"))
        .graftCkpt() // consumers: sketches, per-type counts, pair join
      val sk = du.select(col("event_type"), col("hv")).distinct()
        .groupBy("event_type").agg(bottomK(col("hv")).as("bot"))
      val nT = du.groupBy("event_type").agg(count(lit(1)).as("n"))
      val ei = du.as("x").join(du.as("y"),
          col("x.user_id") === col("y.user_id")
            && col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("ei"))
      val pairs = sk.as("a").join(sk.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.bot").as("ba"), col("b.bot").as("bb"))
        .withColumn("usk",
          expr(s"slice(array_sort(array_distinct(concat(ba, bb))), 1, $k)"))
        .withColumn("usz", size(col("usk")))
        .withColumn("est_union",
          when(col("usz") === k,
            lit((k - 1).toDouble * 4294967296.0) /
              element_at(col("usk"), k).cast(DoubleType))
            .otherwise(col("usz").cast(DoubleType)))
        .withColumn("cnt_both",
          size(expr("array_intersect(array_intersect(usk, ba), bb)")))
        .withColumn("est_inter",
          (col("cnt_both").cast(DoubleType) / col("usz")) * col("est_union"))
      pairs
        .join(nT.select(col("event_type").as("type_a"), col("n").as("na")), "type_a")
        .join(nT.select(col("event_type").as("type_b"), col("n").as("nb")), "type_b")
        .join(ei, Seq("type_a", "type_b"), "left")
        .select(col("type_a"), col("type_b"),
          (col("na") + col("nb") - coalesce(col("ei"), lit(0L)))
            .cast(LongType).as("exact_union"),
          coalesce(col("ei"), lit(0L)).cast(LongType).as("exact_inter"),
          col("est_union"), col("est_inter"))
    },

    // Referential-integrity audit — the data-quality sweep a warehouse
    // runs before trusting a snapshot: for every foreign-key edge of the
    // star schema, how many child rows point at a missing parent (orphans),
    // plus the reverse childless-parent probe on the fact spine. Each check
    // is ONE key-only anti-join aggregated to a single row — the join
    // carries just the key column (ReadSchema prunes the rest), dims
    // broadcast, fact-fact pairs sort-merge on the key — and the 7-row
    // union is trivially cheap. At 100 TB each check is the minimal
    // shuffle that can answer it; checks share nothing by design so a
    // scheduler can run them as independent jobs. All-zero counts on a
    // consistent snapshot are the expected (and asserted) result — the
    // operator's value is the guarantee, not the rows.
    "q50_orphan_audit" -> { (s, dir) =>
      def chk(name: String, child: DataFrame, ck: String,
              parent: DataFrame, pk: String): DataFrame =
        child.select(col(ck))
          .join(parent.select(col(pk).as(ck)), Seq(ck), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("chk"), col("n_violations"))
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      Seq(
        chk("lineitem_orphan_order", li, "l_orderkey", o, "o_orderkey"),
        chk("lineitem_orphan_part", li, "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        chk("lineitem_orphan_supplier", li, "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        chk("orders_orphan_customer", o, "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        chk("orders_childless", o, "o_orderkey", li, "l_orderkey"),
        chk("customer_orphan_nation", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"),
        chk("nation_orphan_region", t(s, dir, "nation"), "n_regionkey",
          t(s, dir, "region"), "r_regionkey")
      ).reduce(_ unionAll _)
    },

    // Recursive CTE (Spark ≥ 4.0, executed as UnionLoopExec) — iterative
    // queries INSIDE the SQL surface, where pre-4.0 engines needed driver
    // loops (the Components.scala pattern remains the 100 TB path for
    // GRAPH closure: a recursive CTE unions every iteration's frontier,
    // so its state grows with path count, while hook-contract components
    // shrink the graph each round). The hierarchy here is the digit-tree
    // over part keys (parent = ⌊key/10⌋) — a BOM-style rollup walking each
    // part to its single-digit root: depth-bounded (≤6 levels at any SF),
    // dialect-common, and shared VERBATIM with the DuckDB oracle. Each
    // iteration is one narrow projection of the previous frontier (no
    // shuffle inside the loop; rows leave the loop through the a<10
    // filter).
    "q39_recursive_cte" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(recursiveWalkSql)
    },

    // Correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders per
    // customer spelled the way SQL users write it. Catalyst DECORRELATES
    // it (DecorrelateInnerQuery): the per-row subquery becomes one join +
    // rank window over orders grouped by o_custkey — no per-customer
    // re-execution, the same physical shape as q8's explicit window top-k
    // (pinned: the plan contains a Window and equi-join, never a per-row
    // loop). Shared VERBATIM with the DuckDB oracle.
    "q40_lateral_topk" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(lateralTopkSql)
    },

    // VARIANT path (Spark ≥ 4.0): q17's semantics on the shredded binary
    // JSON type — `parse_json` parses ONCE into Variant and typed
    // `variant_get` extracts without re-walking the string, where q17's
    // `get_json_object` re-parses the JSON text at every call site. At
    // 100 TB of semi-structured props, parse-once (and, with a Variant
    // parquet column, shredded storage the scan can push into) is the
    // difference between string-parsing the corpus per extracted field and
    // per ingest. Same rows as q17; the oracle spells it as plain JSON
    // extraction.
    "q41_variant_extract" -> { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .filter(col("k") > 50)
    },

    // First-touch conversion funnel with a 24 h attribution window per
    // stage: per user, the first view, the first click strictly after that
    // view (within 24 h), and the first purchase strictly after that click
    // (within 24 h) — order-dependent chaining a plain conditional groupBy
    // cannot express. Plan: ONE shuffle on user_id; the three dependent
    // stage timestamps are whole-partition window minima sharing that
    // partitioning (and the per-user collapse reuses it — no second
    // exchange), then a single-row global rollup. All outputs are exact
    // integers (counts + millisecond sums), so the row hash-gates
    // cross-engine. At 100 TB: per-user state is three longs, the window
    // frames are unbounded-but-agg-only (no sort-dependent frame), and the
    // final rollup is a partial+final agg of one row per user.
    "q42_funnel" -> { (s, dir) =>
      val day = 86400000L
      val w = Window.partitionBy("user_id")
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ms"))).over(w))
        .withColumn("fc",
          min(when(col("event_type") === "click" && col("ms") > col("fv")
            && col("ms") <= col("fv") + day, col("ms"))).over(w))
        .withColumn("fp",
          min(when(col("event_type") === "purchase" && col("ms") > col("fc")
            && col("ms") <= col("fc") + day, col("ms"))).over(w))
      e.groupBy("user_id")
        .agg(max(col("fv")).as("fv"), max(col("fc")).as("fc"),
          max(col("fp")).as("fp"))
        .agg(count(lit(1)).as("n_users"),
          count(col("fv")).as("n_view"),
          count(col("fc")).as("n_view_click"),
          count(col("fp")).as("n_full_funnel"),
          coalesce(sum(col("fc") - col("fv")), lit(0L)).as("sum_v2c_ms"),
          coalesce(sum(col("fp") - col("fc")), lit(0L)).as("sum_c2p_ms"))
    },

    // Weekly retention cohorts: users grouped by first-active week, counted
    // in each subsequent week they return — the activation/retention matrix
    // behind every growth dashboard. The (user, week) distinct pass bounds
    // everything downstream at active-users × weeks (events collapse before
    // any join); cohort assignment is a user-keyed equi-join back onto that
    // collapsed table; both week columns are Monday-truncated so the
    // day-difference is an exact multiple of 7 (integer div, no rounding
    // ambiguity). Cohort sizes broadcast (weeks × users is dashboard-sized
    // relative to the event stream). All outputs exact.
    "q43_retention_cohorts" -> { (s, dir) =>
      val uw = t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .distinct()
      val first = uw.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      uw.join(first, "user_id")
        .select(col("cohort"),
          expr("CAST(datediff(wk, cohort) div 7 AS BIGINT)").as("week_offset"))
        .groupBy("cohort", "week_offset").agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_active"), col("cohort_size"))
    },

    // Higher-order array functions — the nested-collection surface
    // (transform / filter / aggregate / slice over an array column) on a
    // per-order quantity basket. collect_list is ONLY deterministic once
    // sorted, so array_sort runs before anything reads the array; every
    // scalar out is an exact BIGINT (quantities are integral doubles,
    // verified, cast before collection), so fold order can't matter and
    // the lambda results hash-compare. Plan: one shuffle (the groupBy);
    // the basket stays bounded by the order's line count (~4 — the g1
    // collect_set argument), so the aggregation buffer is order-sized,
    // never corpus-sized; all lambdas run inside the post-agg projection.
    "q44_array_hof" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast(LongType).as("q"))
        .groupBy("l_orderkey")
        .agg(array_sort(collect_list(col("q"))).as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).cast(LongType).as("n_items"),
          expr("aggregate(qs, 0L, (acc, x) -> acc + x)").as("total_qty"),
          size(expr("filter(qs, x -> x >= 30)")).cast(LongType).as("n_big"),
          expr("aggregate(slice(reverse(qs), 1, 3), 0L, (acc, x) -> acc + x)")
            .as("top3_qty"),
          element_at(col("qs"), -1).as("max_qty"),
          element_at(col("qs"), 1).as("min_qty"))
    },

    // Type-2 slowly-changing dimension build — the warehouse history table
    // every CDC pipeline materializes: per user, each event_type CHANGE
    // opens a new version row carrying [valid_from, valid_to) in exact
    // epoch-ms longs, open-ended (NULL + is_current) on the latest. Two
    // window passes over ONE user_id exchange (lag to collapse runs of the
    // same status into their first row, then lead/row_number on the same
    // partitioning for validity and version — the filter between them
    // preserves partitioning AND sort order, so Catalyst plans a single
    // Exchange and a single Sort, pinned). 100 TB posture: per-user state
    // inside a window frame is one row (lag-1/lead-1); output is bounded
    // by CHANGE rows, not events; everything downstream of the one shuffle
    // is narrow. Deterministic under ts ties via the event_id tiebreak.
    "q45_scd2" -> { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          col("event_type").as("status"), unix_millis(col("ts")).as("ms"))
        .withColumn("prev", lag(col("status"), 1).over(w))
        .filter(col("prev").isNull || col("status") =!= col("prev"))
        .select(col("user_id"), col("status"),
          col("ms").as("valid_from_ms"),
          lead(col("ms"), 1).over(w).as("valid_to_ms"),
          row_number().over(w).cast(LongType).as("version"))
        .withColumn("is_current", col("valid_to_ms").isNull)
    },

    // Distributed sweep-line: max concurrent sessions per hour — the
    // capacity-planning query over q16's sessions. The classic sweep
    // (+1 at session start, −1 past its end, running sum) needs a GLOBAL
    // prefix order, which a distributed engine must decompose: boundary
    // events partition by HOUR (corpus-scale work rides a per-hour
    // window, state = one running long per partition), while the
    // cross-hour carry is a prefix sum over the |hours|-row per-hour
    // delta rollup — a single-partition window over a TINY aggregate,
    // the t16 |langs|-window discipline, never over the events. Tie rule
    // (−1 before +1 at equal ms, delta ASC) makes max_concurrent
    // deterministic: within equal (ms, delta) runs the running max is
    // order-invariant (+1 runs peak at their end, −1 runs at their
    // start). All integer, hash-gateable.
    "q46_session_concurrency" -> { (s, dir) =>
      val byTs = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      val brk = when(lag(col("ms"), 1).over(byTs).isNull, 1L)
        .otherwise(when(col("ms") - lag(col("ms"), 1).over(byTs) > 1800000L, 1L)
          .otherwise(0L))
      val sess = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ms"))
        .withColumn("brk", brk)
        .withColumn("session_id", sum(col("brk")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
      val bounds = sess.select(col("start_ms").as("ms"), lit(1L).as("delta"))
        .unionAll(sess.select((col("end_ms") + 1).as("ms"), lit(-1L).as("delta")))
        .withColumn("h", expr("ms div 3600000"))
      val hourly = bounds.groupBy("h").agg(sum(col("delta")).as("d"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("delta") === -1, 1L).otherwise(0L)).as("n_ends"))
      val carry = hourly.withColumn("carry_in",
        coalesce(sum(col("d")).over(Window.orderBy("h")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val inHour = Window.partitionBy("h").orderBy(col("ms"), col("delta"))
      val mx = bounds.withColumn("rd", sum(col("delta")).over(
          inHour.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("h").agg(max(col("rd")).as("mx"))
      carry.join(mx, "h")
        .select(col("h"), col("carry_in"), col("n_starts"), col("n_ends"),
          (col("carry_in") + col("mx")).as("max_concurrent"))
    },

    // Incremental view maintenance — the nightly-ETL posture on the
    // relational axis (d18/x12's persisted-index discipline): a per-user
    // stats view (count, exact decimal sum, last-seen) is maintained as a
    // PERSISTED user_id-bucketed table built from the historical 80% of
    // events ONCE per (session, dir), and each refresh merges only the
    // 20% delta — one delta aggregate, one full-outer merge join against
    // the bucketed base (no Exchange on the base side), and ZERO rescans
    // of historical events (pinned). Mergeability is by construction:
    // counts add, DECIMAL(18,6) partial sums add exactly (cast to double
    // only after the merge — the dsum discipline split across batches),
    // last-seen is a null-skipping greatest. The oracle recomputes the
    // view from scratch over ALL events — equality proves the merge
    // reconstructs the full aggregate exactly.
    "q47_incremental_agg" -> { (s, dir) =>
      val baseT = s"graft_q47_base_${dir.hashCode.toLong & 0xffffffffL}"
      if (!s.catalog.tableExists(baseT)) {
        // the in-memory catalog dies with the JVM but the warehouse files
        // do not; clear any stale directory before CREATE (d18's guard)
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val p = new org.apache.hadoop.fs.Path(wh, baseT)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        val base = t(s, dir, "events").filter(col("event_id") % 10 < 8)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 6))).as("sum_dec"),
            max(unix_millis(col("ts"))).as("last_ms"))
        graft.sources.Bucketing.writeBucketed(base, baseT, "user_id", 8)
      }
      val delta = t(s, dir, "events").filter(col("event_id") % 10 >= 8)
        .groupBy("user_id")
        .agg(count(lit(1)).as("dn"),
          sum(col("value").cast(DecimalType(18, 6))).as("dsum"),
          max(unix_millis(col("ts"))).as("dlast"))
      s.table(baseT).join(delta, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          (coalesce(col("n_events"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_events"),
          (coalesce(col("sum_dec"), lit(BigDecimal(0)).cast(DecimalType(18, 6)))
            + coalesce(col("dsum"), lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .cast(DoubleType).as("sum_value"),
          greatest(col("last_ms"), col("dlast")).as("last_ms"))
    },

    // Trailing-7-day distinct active users per day (rolling MAU's little
    // sibling) — the sliding-window COUNT DISTINCT that naive SQL writes as
    // a correlated range join (each day re-scanning a week of events) and
    // that cannot be window-framed because distinct does not decompose over
    // frames. The scalable spelling is interval-cover decomposition: each
    // user's distinct active day COVERS the 7 report days it contributes
    // to, so (user, day) distinct → explode 7 cover days → distinct again →
    // per-day count. Three hash shuffles, all equi-keyed; the 7× expansion
    // applies to the (user, day) collapse (already tiny vs raw events),
    // never to the event stream itself. Report days are restricted to days
    // that actually had activity (the observed-day join, broadcast-sized).
    "q48_rolling_active" -> { (s, dir) =>
      // checkpointed: the (user, day) collapse feeds both the cover
      // explosion and the observed-day probe — uncheckpointed, each
      // consumer re-scans and re-distincts the event stream
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
        .graftCkpt()
      val cover = ud
        .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("i"),
          col("d"))
        .select(col("user_id"), date_add(col("d"), col("i")).as("cd"))
        .distinct()
      val obs = ud.select(col("d")).distinct()
      cover.join(broadcast(obs), cover("cd") === obs("d"))
        .groupBy(col("d").as("day"))
        .agg(count(lit(1)).as("active_users_7d"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active_users_7d"))
    },

    // q48's sketch twin: trailing-7-day distinct users from MERGEABLE
    // per-day KMV sketches (q36's deterministic md5 bottom-64 as the
    // mergeable unit). Where q48's exact form explodes the (user, day)
    // collapse 7×, the sketch form explodes 64 longs per day 7× — the
    // window merge is O(k) per day REGARDLESS of daily actives, the
    // rolling-distinct recipe that survives billion-user days. The merge
    // is exact sketch math: bottom-k of the deduplicated union of per-day
    // bottom-ks IS the window's bottom-k (any hash in the window's true
    // bottom-64 is within its own day's bottom-64), so the estimate is
    // identical to sketching the window directly — and deterministic, so
    // it hash-gates where HLL (q23) cannot. Windows with < k distinct
    // hashes report exactly.
    "q49_rolling_kmv" -> { (s, dir) =>
      val k = 64
      val bottomK = udaf(new graft.functions.BottomKAgg(k))
      val daily = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
        .select(col("d"), graft.functions.HexPrefixToLong
          .hex8(md5(col("user_id").cast(StringType))).as("hv"))
        .groupBy("d").agg(bottomK(col("hv")).as("bot"))
        .graftCkpt()
      val cover = daily
        .select(col("d"), explode(sequence(lit(0), lit(6))).as("i"), col("bot"))
        .select(date_add(col("d"), col("i")).as("day"), explode(col("bot")).as("hv"))
        .distinct()
      val obs = daily.select(col("d").as("day"))
      cover.join(broadcast(obs), Seq("day"))
        .groupBy("day").agg(bottomK(col("hv")).as("bot"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          when(size(col("bot")) === k,
            lit((k - 1).toDouble * 4294967296.0) /
              element_at(col("bot"), k).cast(DoubleType))
            .otherwise(size(col("bot")).cast(DoubleType)).as("est_users_7d"))
    },

    // Hybrid SALTED skew join — the mitigation q66's audit triggers, as a
    // plan. A hot join key floods one shuffle partition however many
    // partitions exist; AQE's skew-join split only rescues the SORT-MERGE
    // path (it re-splits oversized partitions at runtime) and cannot help
    // when the hot side must co-group with stateful ops or when a single
    // KEY (not partition) is the flood. The manual form: detect hot keys,
    // replicate ONLY their dim rows R ways, and spread their fact rows
    // across the R replicas with a DETERMINISTIC salt (hash of the fact
    // row's unique id, never rand() — retries/re-plans must re-derive the
    // same salt). Cold keys pay salt 0 and join exactly as before, so the
    // dim blow-up is |hot| · R rows, not |dim| · R. One pass over the
    // fact; the join result is IDENTICAL to the unsalted join (the oracle
    // is the plain join — salting is a physical rewrite, not semantics).
    // Hot = group size > 3× the mean, compared in exact longs
    // (c · n_keys > 3 · n_rows); production would feed the threshold from
    // a sampled sketch or q66's histogram, exact counts here keep the
    // gate deterministic. The merge hint pins the cold path to SMJ so the
    // demonstrated plan is the 100 TB shape (dim too big to broadcast);
    // uniform TPC-H data legitimately yields zero hot keys — SkewJoinSpec
    // pins the hot branch on a flooded fixture instead.
    "q67_salted_join" -> { (s, dir) =>
      saltedSkewJoin(t(s, dir, "lineitem"), t(s, dir, "part"),
          "l_partkey", "p_partkey", saltR = 8,
          factId = Seq(col("l_orderkey"), col("l_linenumber")))
        .groupBy("p_brand")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          count(lit(1)).as("n_items"),
          countDistinct(col("l_partkey")).as("n_parts"))
    },

    // GAPS-AND-ISLANDS — the interval-merge readout the window family
    // still lacked (q16 sessionizes POINT events by gap; q46 counts
    // concurrent INTERVALS; neither merges intervals into maximal covered
    // runs): per customer, each order spans [o_orderdate, last ship date]
    // and overlapping/touching spans coalesce into "activity islands" —
    // the engagement-continuity readout (how many distinct active
    // stretches, how much calendar is covered vs idle). Classic spelling:
    // an order OPENS a new island iff its start lies strictly after the
    // running max end of all earlier intervals — computed over the
    // (start, end, orderkey) TOTAL order so the ROWS frame is
    // deterministic under start ties — and island id is the running sum
    // of open flags. Scale: the per-order collapse shuffles by orderkey
    // (the key lineitem already groups by), then windows and both
    // stacked aggs all partition by o_custkey — ONE customer-key shuffle
    // reused across four operators, per-key work bounded by that
    // customer's order count, nothing global ever sorts. Day arithmetic
    // is exact integers (datediff), islands count days inclusively, and
    // gap_days = observed extent − covered days (disjointness of islands
    // makes that subtraction exact). Orders with no lineitem rows have
    // no ship evidence and drop via the inner join (both engines).
    "q68_interval_islands" -> { (s, dir) =>
      val iv = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("end0"))
      val spans = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("start"))
        .join(iv, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("start"),
          greatest(col("start"), col("end0")).as("end"))
      val ord = Window.partitionBy("o_custkey")
        .orderBy(col("start"), col("end"), col("o_orderkey"))
      val prevMax = max(col("end"))
        .over(ord.rowsBetween(Window.unboundedPreceding, -1))
      val islands = spans
        .withColumn("opens",
          when(prevMax.isNull || col("start") > prevMax, 1L).otherwise(0L))
        .withColumn("island",
          sum(col("opens")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("o_custkey", "island")
        .agg(min("start").as("i_start"), max("end").as("i_end"),
          count(lit(1)).as("i_orders"))
      islands
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_islands"),
          lsum(col("i_orders")).as("n_orders"),
          lsum(datediff(col("i_end"), col("i_start")).cast(LongType) + 1L)
            .as("covered_days"),
          min("i_start").as("s0"), max("i_end").as("e0"))
        .select(col("custkey"), col("n_islands"), col("n_orders"),
          col("covered_days"),
          (datediff(col("e0"), col("s0")).cast(LongType) + 1L
            - col("covered_days")).as("gap_days"))
    },

    // GAP-FILL (LOCF) — the time-series completion every downstream
    // consumer of q15's hourly rollup actually wants: a dense per-type
    // hourly series where silent hours carry the LAST observed hourly
    // mean forward (last-observation-carried-forward, the standard
    // step-interpolation; q65 integrates the same step function, this
    // MATERIALIZES it). The axis is q63's generated min..max hour grid
    // (every calendar hour appears, observed or not); the fill is one
    // running last-non-null window per type. Hours before a type's first
    // observation stay honestly NULL — inventing a value there is the
    // classic backfill bug. Exactness: the hourly mean is integer micros
    // floor-divided (sum div count; both engines truncate toward zero
    // and value ≥ 0 here, so the floors agree — the prStepSql caveat),
    // never a float avg. Scale: the corpus-sized work is ONE (type,
    // hour) partial+final agg; the grid, windows, and fill all run on
    // |hours|·|types| rows — dashboard-sized at any corpus volume.
    "q69_gap_fill" -> { (s, dir) =>
      locfGrid(s, dir)
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("filled_micro"),
          col("mean_micro").isNotNull.cast(LongType).as("was_observed"))
    },

    // CUMULATIVE UNIQUES — "total distinct users to date" per day, the
    // growth curve every dashboard tops with. The naive spelling
    // (count-distinct over an expanding window) is quadratic and
    // unmergeable; the exact distributed spelling is the FIRST-EVENT
    // trick: cumulative distinct users at day d ≡ users whose FIRST
    // active day ≤ d, so one user-keyed min + a per-day new-user count
    // + a running sum over the dashboard-sized day axis computes it
    // exactly at any scale. Zero-filled day grid (q69's axis
    // discipline): a day with events but no new users shows its traffic
    // and a flat curve; a day with no events at all still carries the
    // running total. The single-partition cumulative window runs over
    // |days| rows — q66's histogram argument.
    "q74_cumulative_uniques" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      val daily = ev.groupBy("d").agg(count(lit(1)).as("n_events"))
        .graftCkpt() // feeds the axis bounds AND the grid join
      val firsts = ev.groupBy("user_id").agg(min("d").as("fd"))
        .groupBy(col("fd").as("d")).agg(count(lit(1)).as("n_new"))
      val axis = daily.agg(min("d").as("lo"), max("d").as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
      val cw = Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      axis
        .join(daily, Seq("d"), "left")
        .join(firsts, Seq("d"), "left")
        .select(col("d"), coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("n_new"), lit(0L)).as("n_new_users"))
        .withColumn("cum_unique_users", sum(col("n_new_users")).over(cw))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n_events"), col("n_new_users"), col("cum_unique_users"))
    },

    // NEAREST-AS-OF JOIN — the bidirectional twin of q64's backward PIT
    // join (pandas merge_asof direction='nearest'; the sensor-fusion /
    // clickstream-reconciliation primitive): each purchase matches the
    // SAME USER's nearest click within ±30 min, either direction, under
    // the (|gap| ASC, c_ms ASC, c_id ASC) total order — ties at equal
    // distance go to the EARLIER (backward) click, then to the smaller
    // id, so the match is deterministic and hash-gates. The range join
    // is q59's binned equi-join with a symmetric probe: purchases
    // explode to bins {b−1, b, b+1} (fixed 3× fan-out — never a per-user
    // history cross product), clicks key by their own bin, the |gap| ≤ W
    // residual prunes the corners. Unmatched purchases keep a NULL match
    // (the full asof contract — silently dropping them hides exactly the
    // rows a reconciler needs to see). Scale: the fan-out is a constant
    // 3×, the join shuffles on (user, bin) — time-partitioned like the
    // production layout — and the per-purchase rank window runs over the
    // few candidates inside one ±30 min window, never a user's history.
    "q75_asof_nearest" -> { (s, dir) =>
      val W = 1800000L
      val ev = t(s, dir, "events")
      // feeds the probe join AND the final left join (q59's checkpoint
      // discipline: two consumers, one events scan)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_millis(col("ts")).as("p_ms"),
          expr(s"unix_millis(ts) div $W").as("bin"))
        .graftCkpt()
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          unix_millis(col("ts")).as("c_ms"),
          expr(s"unix_millis(ts) div $W").as("cbin"))
      val best = p
        .withColumn("cbin",
          explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
        .join(c, Seq("user_id", "cbin"))
        .filter(abs(col("c_ms") - col("p_ms")) <= W)
        .withColumn("rn", row_number().over(Window.partitionBy("p_id")
          .orderBy(abs(col("c_ms") - col("p_ms")), col("c_ms"), col("c_id"))))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("c_id"), (col("c_ms") - col("p_ms")).as("gap_ms"))
      p.select(col("p_id"), col("user_id"))
        .join(best, Seq("p_id"), "left")
        .select(col("p_id"), col("user_id"), col("c_id"), col("gap_ms"))
    },

    // 2-D SKYLINE (Pareto frontier) — the dominance query (Börzsönyi et
    // al., ICDE'01): parts no other part beats on BOTH axes (price lower-
    // or-equal, size higher-or-equal, one strict) — the "efficient
    // frontier" readout behind any cost/quality trade (cheapest part at
    // each capability level). The textbook spelling is a running max over
    // ONE GLOBAL ORDER (price ASC, size DESC, key ASC) — a single-
    // partition window, the q66-class scale-killer. This is the TWO-PHASE
    // form: rows bin by integer price range; per-bin max sizes (tiny agg)
    // feed a |bins|-row prefix-max window (dashboard-sized — the
    // histogram-window discipline); each row then checks against
    // max(prior-bin prefix, within-bin running max) in a BIN-PARTITIONED
    // window. Bins respect the global order (bin is monotone in price and
    // ties stay in-bin), so the two-phase result is IDENTICAL to the
    // global sweep the oracle states — same frontier, one bounded window
    // per bin instead of one unbounded window per corpus. Bin width is
    // the scale knob (here 100 price units; at corpus scale pick width so
    // |bins| stays dashboard-sized while bins stay partition-sized).
    // DUPLICATE-POINT SEMANTICS (deliberate, ADVICE r13): rows with equal
    // (price, size) do not dominate each other under strict dominance, so
    // the textbook frontier would keep ALL of them; this operator collapses
    // each duplicate point to its lowest p_partkey (the within-bin running
    // max uses `>`, so a later equal point sees its twin's size and fails
    // the strict test). The oracle states the same collapsed variant — the
    // frontier as a SET OF POINTS with one representative row each, the
    // readout a cost/quality dashboard wants (rank-with-ties is the
    // alternative spelling if every tied row must surface).
    "q76_skyline" -> { (s, dir) =>
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast(LongType).as("p_size"))
        .withColumn("bin",
          expr("CAST(floor(p_retailprice) AS BIGINT) div 100"))
        .graftCkpt() // feeds the bin maxes AND the final filter
      val binMax = p.groupBy("bin").agg(max("p_size").as("bmax"))
      val wpre = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
      val prefix = binMax
        .withColumn("pmax", max("bmax").over(wpre))
        .select(col("bin"), col("pmax"))
      val wbin = Window.partitionBy("bin")
        .orderBy(col("p_retailprice").asc, col("p_size").desc, col("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      p.join(broadcast(prefix), "bin")
        .withColumn("rmax",
          greatest(coalesce(max("p_size").over(wbin), lit(-1L)),
            coalesce(col("pmax"), lit(-1L))))
        .filter(col("p_size") > col("rmax"))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    },

    // SEQUENCE PATTERN MATCH — MATCH_RECOGNIZE's core (row-pattern
    // matching over ordered event streams; SQL:2016, Flink CEP's batch
    // twin) without the single-partition ORDER the standard implies: per
    // user, the event-type sequence under the (ms, event_id) total order
    // becomes one compact string of type initials (all five types start
    // with distinct letters), and the pattern — view, any clicks, then
    // purchase with nothing between: `vc*p` — is counted by
    // leftmost-non-overlapping regex scan, identical semantics in Java
    // regex and RE2 for an alternation-free pattern. q42's funnel counts
    // STAGES reached; this counts strict CONTIGUOUS conversions, the
    // signal an attribution model wants uncontaminated by interleaved
    // noise events. Plan: ONE user-key exchange carrying a row_number
    // window (spill-safe external sort) AND the journey agg on the same
    // clustering; the per-user journey buffer is CAPPED at
    // [[seqMatchCap]] events (VERDICT r14 item 2 — an uncapped
    // collect_list is the classic hot-key OOM at 100×: one user with
    // millions of events materializes them all in ONE in-memory agg
    // buffer). The cap is semantic, not silent: the journey/n_conv are
    // computed over the user's FIRST seqMatchCap events under the total
    // order (collect_list skips the `when`'s nulls past the cap), while
    // n_events keeps the user's FULL event count, so truncation is
    // visible to the consumer; the oracle restates the identical prefix
    // rule. At every gate SF the busiest user sits far under the cap, so
    // gate results equal the uncapped spelling; RelationalSpec pins the
    // flood fixture (one user with >> cap events completes with the
    // prefix semantics).
    "q78_sequence_match" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"),
          struct(unix_millis(col("ts")).as("ms"), col("event_id"),
            substring(col("event_type"), 1, 1).as("i")).as("o"))
      seqMatch(e)
    },

    // CDC APPLY — the change-log compaction every lakehouse MERGE
    // materializes (Delta/Hudi/Iceberg "latest snapshot"): fold an
    // ordered per-key change stream into final table state under
    // LAST-WRITER-WINS with DELETE TOMBSTONES. The events stream is read
    // as the log: every event upserts the user's row to its value;
    // 'error' is the tombstone (the row is GONE from the final state, not
    // NULLed — the semantic difference between a delete and an update the
    // compactor must preserve). The (ms, event_id) total order makes the
    // winner deterministic under timestamp ties. Plan: ONE user-key
    // exchange carries both windows (last-change rank + change count —
    // same clustering, no re-shuffle); at corpus scale this is the
    // nightly compaction shape: shuffle on the primary key, window depth
    // = that key's change count, never a global sort.
    "q77_cdc_apply" -> { (s, dir) =>
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ms"), col("event_type"), col("value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ms").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w))
        .withColumn("n_changes",
          count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("value").as("last_value"),
          col("ms").as("last_ms"), col("n_changes"))
    },

    // EXPONENTIAL SMOOTHING over the LOCF series — the monitoring
    // transform q69's raw fill feeds (alerting on a smoothed level, not
    // single-hour noise). A true recursive EWMA never hash-gates (float
    // recursion) and never distributes (unbounded serial fold), so this
    // is the FINITE-window form: 8 terms with halving weights
    // 128,64,…,1 over the filled hourly means, Σ term·w div 255 in exact
    // integer micros — both engines compute identical longs, and the
    // 8-lag unroll is a plain frame the optimizer fuses into ONE window
    // pass. Hours with fewer than 8 filled predecessors (the type's
    // first 7 observed-era hours, and everything before its first
    // observation) emit nothing — no invented warm-up. Scale: the
    // corpus-scale work is q69's (type, hour) agg; the lags run on the
    // |types|×|hours| grid (dashboard-sized at any corpus — the q69/q66
    // argument).
    "q72_ewma_hourly" -> { (s, dir) =>
      val w = Window.partitionBy("event_type").orderBy("h")
      val num = (0 until 8).map(i =>
        lag(col("filled_micro"), i).over(w) * lit(1L << (7 - i)))
        .reduce(_ + _)
      locfGrid(s, dir)
        .withColumn("num", num)
        .filter(col("num").isNotNull)
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          expr("num div 255").as("ewma_micro"))
    },

    // SESSION PATH transitions — the behavioral readout q16 (session
    // stats) and q42 (fixed funnel) both stop short of: the empirical
    // first-order Markov matrix of WITHIN-session event-type transitions
    // (which step actually follows which, and with what share — how a
    // product team discovers the funnels worth defining). Sessions are
    // q16's exact break rule (gap > 30 min over the (ms, event_id) total
    // order — one spelling, or the two sessionizers drift); transitions
    // are one lead() inside the (user, session) sub-partition of the SAME
    // user-key shuffle, so the whole query is q16's one exchange plus a
    // |types|²-row rollup. share_ppm is the exact integer row-conditional
    // share (outgoing transitions per from_type), the matrix a path
    // analysis actually reads. Scale: windows never leave the user key;
    // the transition matrix is |types|² whatever the corpus.
    "q70_session_paths" -> { (s, dir) =>
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ms"))
      val byTs = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      val brk = when(col("ms") - lag(col("ms"), 1).over(byTs) > 30L * 60 * 1000, 1L)
        .otherwise(when(lag(col("ms"), 1).over(byTs).isNull, 1L).otherwise(0L))
      val bySess = Window.partitionBy("user_id", "session_id")
        .orderBy(col("ms"), col("event_id"))
      val trans = e.withColumn("brk", brk)
        .withColumn("session_id", sum(col("brk")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("to_type", lead(col("event_type"), 1).over(bySess))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
      trans
        .withColumn("tot",
          sum("n_transitions").over(Window.partitionBy("from_type")))
        .select(col("from_type"), col("to_type"), col("n_transitions"),
          expr("n_transitions * 1000000 div tot").as("share_ppm"))
    },

    // ROLLUP RECONCILIATION — the aggregate-lattice integrity audit a
    // warehouse runs after building day/week/month/year materializations
    // of the same measure: every grain's bucket totals must re-sum to the
    // same grand total, or a grain dropped rows (a bad partition filter,
    // a late-data window, a timezone bug at a bucket boundary). The
    // measure is integer MICROS (the decimal-cast-then-scale discipline
    // — exact, associative, order-independent), so the reconciliation is
    // long equality, not float tolerance, and a single lost row trips
    // it. ONE fact scan (checkpointed) feeds all four grains + the grand
    // total; each grain is a two-stage agg (bucket, then bucket-total
    // re-sum — deliberately the same partial/final shape a
    // materialization pipeline runs); week buckets are ISO Monday in
    // both engines.
    "q71_rollup_reconciliation" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(to_date(col("l_shipdate")).as("d"),
          expr("CAST(CAST(l_extendedprice * (1 - l_discount)" +
            " AS DECIMAL(18,6)) * 1000000 AS BIGINT)").as("rev_micro"))
        .graftCkpt()
      val grand = li.agg(sum("rev_micro").cast(LongType).as("grand"))
      def grain(name: String, bucket: Column): DataFrame =
        li.groupBy(bucket.as("b"))
          .agg(sum("rev_micro").cast(LongType).as("bt"))
          .agg(count(lit(1)).as("n_buckets"),
            sum("bt").cast(LongType).as("total_micro"))
          .select(lit(name).as("grain"), col("n_buckets"), col("total_micro"))
      Seq(
        grain("day", col("d")),
        grain("week", date_trunc("week", col("d"))),
        grain("month", date_trunc("month", col("d"))),
        grain("year", date_trunc("year", col("d"))))
        .reduce(_.unionAll(_))
        .crossJoin(broadcast(grand))
        .select(col("grain"), col("n_buckets"), col("total_micro"),
          (col("total_micro") === col("grand")).cast(LongType).as("reconciles"))
    },

    // MERGEABLE QUANTILE SKETCH + its rank-error audit (VERDICT r15 item
    // 3) — percentiles over an UNBOUNDED value domain, where the exact
    // paths can't go at corpus scale: q33/q56's percentile() buffers
    // every group value, and q66/w20's exact-histogram trick needs a
    // bounded key domain. The sketch is QuantileSampleAgg's bottom-512-
    // by-md5-hash uniform sample (the q36 KMV discipline turned on the
    // VALUE axis): deterministic, merge-order independent — the property
    // KLL/GK structurally lack, and the reason an order-dependent sketch
    // can never hash-gate — and partial+final, ≤512 pairs per (map
    // partition, type) crossing the wire. Decile cutpoints read from the
    // sorted sample at ceil(i·n_s/10) in pure integers; the AUDIT then
    // scores each cutpoint against the corpus — true_rank via one
    // broadcast-cuts pass (q56's in-row fold shape) and err_ppm =
    // |floor(true_rank·10⁶/N) − i·10⁵| in exact integer arithmetic, so
    // the claimed DKW bound (~1.6% expected at k=512) is MEASURED in the
    // gated output, not asserted. At 100 TB the sketch pass is the
    // product; the audit is the evaluator a pipeline runs at onboarding.
    "q79_quantile_sketch" -> { (s, dir) =>
      val k = 512
      val ev = t(s, dir, "events")
      // null values can't ride the sketch's primitive-Double payload
      // (QuantileSampleAgg's input contract, ADVICE r16) — filtered here
      // and in the oracle's h CTE, one predicate both engines share; the
      // AUDIT below still counts every event (a null is never <= a cut
      // in either engine, so the rank fold needs no filter)
      val smp = ev.filter(col("value").isNotNull)
        .select(col("event_type"), col("value"),
          graft.functions.HexPrefixToLong
            .hex8(md5(col("event_id").cast(StringType))).as("hv"))
        .groupBy("event_type")
        .agg(graft.functions.QuantileSampleAgg.qsample(k)(
          col("hv"), col("value")).as("smp"))
      val cuts = smp.select(col("event_type"),
        size(col("smp")).as("ns"),
        expr("transform(sequence(1, 9), i -> element_at(smp," +
          " greatest(1, CAST((i * size(smp) + 9) div 10 AS INT))))")
          .as("cuts"))
      ev.join(broadcast(cuts), "event_type")
        .groupBy("event_type", "ns", "cuts")
        .agg(count(lit(1)).as("n_events"),
          (1 to 9).map(i => sum(when(
            col("value") <= element_at(col("cuts"), i), 1L).otherwise(0L))
            .as(s"r$i")): _*)
        .select(col("event_type"), col("ns"), col("n_events"),
          array((1 to 9).map(i => col(s"r$i")): _*).as("rks"),
          posexplode(col("cuts")))
        .select(col("event_type"),
          (col("pos") + 1).cast(LongType).as("decile"),
          col("col").as("cut_value"),
          col("ns").cast(LongType).as("sample_n"),
          element_at(col("rks"), (col("pos") + 1).cast(IntegerType))
            .as("true_rank"),
          col("n_events"),
          expr("CAST(abs(element_at(rks, CAST(pos + 1 AS INT)) * 1000000" +
            " div n_events - (pos + 1) * 100000) AS BIGINT)").as("err_ppm"))
    },

    // SKETCH ROLLUP LATTICE (VERDICT r16 item 3) — the operation that
    // justifies STORING q79's sketch as a column: per-(type, day)
    // samples persisted in the pair-preserving form (qpairs — hv rides
    // with value, the storage form), then re-aggregated day→month with
    // qpairs and month→year with the SAME aggregator, never re-reading
    // the raw rows. Because the retained set is bottom-k of a multiset
    // under a total order, bottom-k of a union of bottom-ks IS bottom-k
    // of the union — so merged-sketch cutpoints are IDENTICAL to the
    // cutpoints a direct corpus pass at that grain computes, and the
    // gate pins the identity per bucket (merged_equals_direct compares
    // the full 512-value samples, not just the 9 cuts; q71's lattice
    // reconciliation discipline turned on the sketch axis). KLL/GK
    // rollups cannot make this claim — merging their day sketches gives
    // a DIFFERENT (valid but incomparable) summary than sketching the
    // month directly, which is exactly why order-dependent sketches
    // can't hash-gate a lattice. Scale: the day pass is q79's one
    // corpus-linear scan; every rollup above it reads ≤512·|buckets|
    // sketch rows — month and year summaries of a 100 TB year never
    // touch the raw events again. The direct paths here are the
    // EVALUATOR (they re-scan the corpus to prove the identity), not
    // the product.
    "q80_sketch_rollup" -> { (s, dir) =>
      val k = 512
      val qp = graft.functions.QuantileSampleAgg.qpairs(k)
      val qs = graft.functions.QuantileSampleAgg.qsample(k)
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("value"),
          graft.functions.HexPrefixToLong
            .hex8(md5(col("event_id").cast(StringType))).as("hv"))
      // level 0: the persisted per-(type, day) sketch column
      val daySk = ev.groupBy("event_type", "day")
        .agg(qp(col("hv"), col("value")).as("smp"))
        .graftCkpt() // the storage boundary: rollups read ONLY this
      val dayPairs = daySk
        .select(col("event_type"), col("day"), explode(col("smp")).as("p"))
        .select(col("event_type"), col("day"),
          col("p.hv").as("hv"), col("p.value").as("value"))
      // level 1: month sketches merged from day sketches (still pairs —
      // re-mergeable), level 2: year merged from MONTH sketches (the
      // two-hop chain is the point)
      val monthSk = dayPairs
        .groupBy(col("event_type"), date_trunc("month", col("day")).as("bucket"))
        .agg(qp(col("hv"), col("value")).as("smp"))
        .graftCkpt() // feeds both the month readout and the year hop
      val monthPairs = monthSk
        .select(col("event_type"), col("bucket"), explode(col("smp")).as("p"))
        .select(col("event_type"), col("bucket"),
          col("p.hv").as("hv"), col("p.value").as("value"))
      val mergedMonth = monthSk.select(col("event_type"), col("bucket"),
        expr("array_sort(transform(smp, p -> p.value))").as("ms"))
      val mergedYear = monthPairs
        .groupBy(col("event_type"), date_trunc("year", col("bucket")).as("bucket"))
        .agg(qs(col("hv"), col("value")).as("ms"))
      def direct(unit: String) = ev
        .groupBy(col("event_type"), date_trunc(unit, col("day")).as("bucket"))
        .agg(qs(col("hv"), col("value")).as("ds"))
      def emit(grain: String, merged: DataFrame, dir0: DataFrame) =
        merged.join(dir0, Seq("event_type", "bucket"))
          .select(lit(grain).as("grain"), col("event_type"), col("bucket"),
            size(col("ms")).cast(LongType).as("sample_n"),
            (col("ms") === col("ds")).cast(LongType).as("merged_equals_direct"),
            posexplode(expr("transform(sequence(1, 9), i -> element_at(ms," +
              " greatest(1, CAST((i * size(ms) + 9) div 10 AS INT))))")))
          .select(col("grain"), col("event_type"), col("bucket"),
            (col("pos") + 1).cast(LongType).as("decile"),
            col("col").as("cut_value"),
            col("sample_n"), col("merged_equals_direct"))
      emit("month", mergedMonth, direct("month"))
        .unionAll(emit("year", mergedYear, direct("year")))
    }
  )

  /** q69's LOCF-filled hourly grid, factored so q72's smoothing reads the
    * IDENTICAL fill (one spelling — the fill and its consumer cannot
    * drift): the zero-filled min..max hour axis × observed types, hourly
    * integer-micro means attached, and `filled_micro` = running
    * last-non-null per type. Columns: event_type, h (timestamp),
    * mean_micro (nullable), filled_micro (nullable before first obs). */
  private def locfGrid(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        expr("CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)")
          .as("vm"))
    val hc = ev.groupBy("event_type", "h")
      .agg(expr("sum(vm) div count(1)").as("mean_micro"))
      .graftCkpt() // feeds the axis bounds + type set + grid join
    val axis = hc.agg(min("h").as("lo"), max("h").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    axis
      .crossJoin(broadcast(hc.select("event_type").distinct()))
      .join(hc, Seq("event_type", "h"), "left")
      .withColumn("filled_micro",
        last(col("mean_micro"), ignoreNulls = true).over(w))
  }

  /** q78's per-user journey buffer bound: the journey/regex analysis
    * runs over each user's first `seqMatchCap` events under the
    * (ms, event_id) total order. 4096 is ≥ 40× the busiest gate-SF user
    * and orders of magnitude above any real contiguous view→clicks→
    * purchase funnel (the pattern being counted), so truncation only
    * engages on pathological hot keys — where it is exactly the bounded-
    * buffer contract that keeps the aggregation from OOMing (VERDICT r14
    * item 2); n_events still reports the FULL count so a consumer can
    * see the prefix rule engaged. */
  private[graft] val seqMatchCap = 4096

  /** q78's pipeline, factored so RelationalSpec can drive the flood pin
    * over a synthetic single-hot-user frame: rank events per user under
    * the total order (external-sort window — spillable), then ONE
    * object-hash agg on the SAME clustering builds the capped journey
    * (collect_list skips the `when`'s nulls past the cap, so the buffer
    * holds ≤ [[seqMatchCap]] structs however hot the key) beside the
    * full event count. Input: (user_id, o struct<ms,event_id,i>). */
  private[graft] def seqMatch(e: DataFrame): DataFrame = {
    // the journey symbol `i` joins the ORDER BY (ADVICE r15): the cap's
    // prefix rule needs a TOTAL order, and on a frame where (ms,
    // event_id) can tie, rows tying on all three struct fields are
    // identical — whichever copies land inside the cap, the kept
    // multiset (and so the journey string) is the same, making rn's
    // residual arbitrariness unobservable
    val w = Window.partitionBy("user_id")
      .orderBy(col("o.ms"), col("o.event_id"), col("o.i"))
    e.withColumn("rn", row_number().over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(when(col("rn") <= seqMatchCap, col("o"))))
          .as("arr"))
      .select(col("user_id"), col("n_events"),
        concat_ws("", expr("transform(arr, x -> x.i)")).as("j"))
      .select(col("user_id"), col("n_events"),
        // idx=0 (the whole match): Spark defaults to group 1, DuckDB to 0
        expr("CAST(size(regexp_extract_all(j, 'vc*p', 0)) AS BIGINT)")
          .as("n_conv"))
  }

  /** The q66 → q67 ADVISORY (VERDICT r10 item 7): the exact hot-key set
    * [[saltedSkewJoin]] would salt, as a standalone one-column (`hk`)
    * frame — keys whose fact group exceeds `hotFactor`× the mean group
    * size. Empty result = the key distribution is uniform enough that the
    * plain join is the right plan; non-empty = pass the same
    * (key, hotFactor) to [[saltedSkewJoin]], which derives the identical
    * set (one predicate spelling — q66's audit, this advisory, and q67's
    * mitigation can never disagree on what "hot" means). Cost: one
    * map-side-combined count pass over the fact, the same pass q66's
    * histogram already takes. */
  private[graft] def skewJoinRecommend(fact: DataFrame, factKey: String,
      hotFactor: Long = 3L): DataFrame = {
    val counts = fact.groupBy(col(factKey).as("hk"))
      .agg(count(lit(1)).as("c"))
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("c")).cast(LongType).as("n_rows"))
    counts.crossJoin(broadcast(tot))
      .filter(col("c") * col("n_keys") > lit(hotFactor) * col("n_rows"))
      .select(col("hk"))
  }

  /** Hot-key salted join (q67): fact ⋈ dim on `factKey = dimKey`, with keys
    * whose fact group size exceeds `hotFactor`× the mean spread over `saltR`
    * deterministic salt replicas. Returns the joined frame (all columns of
    * both inputs minus the helper salt columns). */
  private[graft] def saltedSkewJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, saltR: Int,
      factId: Seq[Column], hotFactor: Long = 3L): DataFrame = {
    // tiny by construction (≤ n_keys / hotFactor rows); checkpointed once,
    // probed from both sides of the join
    val hotKeys = skewJoinRecommend(fact, factKey, hotFactor)
      .graftCkpt()
    val saltedFact = fact
      .join(broadcast(hotKeys), col(factKey) === col("hk"), "left")
      .withColumn("fact_salt",
        when(col("hk").isNotNull,
          pmod(xxhash64(factId: _*), lit(saltR.toLong)).cast(IntegerType))
          .otherwise(lit(0)))
      .drop("hk")
    val saltedDim = dim
      .join(broadcast(hotKeys), col(dimKey) === col("hk"), "left")
      .withColumn("dim_salt", explode(
        sequence(lit(0),
          when(col("hk").isNotNull, lit(saltR - 1)).otherwise(lit(0)))))
      .drop("hk")
    saltedFact.hint("merge")
      .join(saltedDim, col(factKey) === col(dimKey)
        && col("fact_salt") === col("dim_salt"))
      .drop("fact_salt", "dim_salt")
  }

  /** The funnel stage-chaining CTEs (first view → first click within 24 h
    * strictly after it → first purchase within 24 h strictly after that),
    * shared between q42's oracle and the streaming x11 oracle
    * (StreamingSessionize) so the attribution rule is spelled once. */
  /** q79/x36's shared oracle prefix — hash → rank-512 (hv, value)
    * retention → sorted-sample decile cutpoints (CTEs h/r/smp/ns/sv/
    * cuts) — one spelling so the batch sketch and its streaming twin
    * can never drift. */
  /** DuckDB spelling of HexPrefixToLong.hex8 over a hex string column
    * `m` — shared by the q79/x36 prefix and q80's lattice so the hash
    * axis is spelled once. */
  private[graft] val md5HexFoldSql: String = (0 until 8).map { i =>
    s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
  }.mkString(" + ")

  private[graft] val quantileCutsSql: String = {
    val hexToInt = md5HexFoldSql
    s"""h AS (SELECT event_type, value, $hexToInt AS hv
       |  FROM (SELECT event_type, value,
       |          md5(CAST(event_id AS VARCHAR)) AS m FROM events
       |        WHERE value IS NOT NULL) t),
       |r AS (SELECT event_type, value,
       |        row_number() OVER (PARTITION BY event_type
       |          ORDER BY hv, value) AS rn
       |      FROM h),
       |smp AS (SELECT event_type, value FROM r WHERE rn <= 512),
       |ns AS (SELECT event_type, count(*) AS ns FROM smp GROUP BY 1),
       |sv AS (SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |           ORDER BY value) AS vr
       |       FROM smp),
       |cuts AS (SELECT sv.event_type, d.i AS decile, sv.value AS cut_value,
       |           ns.ns
       |         FROM sv JOIN ns ON sv.event_type = ns.event_type
       |         JOIN (SELECT unnest(generate_series(1, 9)) AS i) d
       |           ON sv.vr = greatest(1, (d.i * ns.ns + 9) // 10))""".stripMargin
  }

  private[graft] val funnelChainSql: String =
    """e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
      |w1 AS (SELECT user_id, event_type, ms,
      |         min(CASE WHEN event_type = 'view' THEN ms END)
      |           OVER (PARTITION BY user_id) AS fv FROM e),
      |w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ms > fv
      |                          AND ms <= fv + 86400000 THEN ms END)
      |         OVER (PARTITION BY user_id) AS fc FROM w1),
      |w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ms > fc
      |                          AND ms <= fc + 86400000 THEN ms END)
      |         OVER (PARTITION BY user_id) AS fp FROM w2)""".stripMargin

  /** Shared verbatim between spark.sql and the DuckDB oracle. */
  private val lateralTopkSql: String =
    """SELECT c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin

  /** Shared verbatim between spark.sql and the DuckDB oracle. floor(a/10)
    * (not a/10 cast) because int/int division is DOUBLE in both dialects
    * but bare double→bigint CAST truncates in Spark and rounds in DuckDB —
    * floor first makes both exact. */
  private val recursiveWalkSql: String =
    """WITH RECURSIVE walk(p, a, d) AS (
      |  SELECT p_partkey, p_partkey, 0 FROM part
      |  UNION ALL
      |  SELECT p, CAST(floor(a / 10) AS BIGINT), d + 1 FROM walk WHERE a >= 10
      |)
      |SELECT p AS p_partkey, a AS root_key, CAST(d AS BIGINT) AS depth
      |FROM walk WHERE a < 10""".stripMargin

  /** One xxhash64 of the key → two 32-bit halves packed as `(h1 << 32) | h2`
    * — the input contract of [[graft.functions.BloomAgg]] and of the probe
    * side, so build and probe positions agree by construction. Unlike the
    * oracle-visible hashes (md5-based so DuckDB replays them), the bloom
    * hash never reaches the result — the residual join erases false
    * positives — so it uses Spark's fastest codegen'd hash: one xxhash64
    * per fact row instead of a digest (measured ~2x on the probe scan). */
  private def bloomPacked(key: Column): Column = xxhash64(key)

  private def bloomHalves(packed: Column): (Column, Column) =
    (shiftrightunsigned(packed, 32), packed.bitwiseAND(lit(0xffffffffL)))

  /** Attach the broadcast single-row bloom bitset plus the probe hashes
    * (`bf`, `ph1`, `ph2`) to the fact side. */
  private def bloomProbe(fact: DataFrame, key: Column, bloom: DataFrame): DataFrame = {
    val (h1, h2) = bloomHalves(bloomPacked(key))
    fact.crossJoin(broadcast(bloom))
      .withColumn("ph1", h1)
      .withColumn("ph2", h2)
  }

  /** Shared verbatim between spark.sql and the DuckDB oracle. */
  private val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""".stripMargin

  /** Shared verbatim between spark.sql and the DuckDB oracle. */
  private val correlatedExistsSql: String =
    """SELECT p_partkey, p_brand FROM part p
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)""".stripMargin

  /** q62's versioned-dimension SQL — factored so q64's temporal join can
    * consume the identical merge as a CTE. */
  private val scd2MergeSql: String =
    """WITH ch AS (
      |  SELECT c_custkey, 'SEG_' || c_mktsegment AS new_segment
      |  FROM customer
      |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < '2')
      |SELECT c.c_custkey, c.c_mktsegment AS segment,
      |  '2023-01-01' AS valid_from, '2024-01-15' AS valid_to,
      |  CAST(0 AS BIGINT) AS is_current
      |FROM customer c JOIN ch ON c.c_custkey = ch.c_custkey
      |UNION ALL
      |SELECT c.c_custkey,
      |  coalesce(ch.new_segment, c.c_mktsegment) AS segment,
      |  CASE WHEN ch.c_custkey IS NULL THEN '2023-01-01'
      |       ELSE '2024-01-15' END AS valid_from,
      |  CAST(NULL AS VARCHAR) AS valid_to,
      |  CAST(1 AS BIGINT) AS is_current
      |FROM customer c LEFT JOIN ch ON c.c_custkey = ch.c_custkey""".stripMargin

  private val q1Sums =
    s"""${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  (${dsumSql("l_quantity")} / count(*)) AS avg_qty,
       |  count(*) AS count_order""".stripMargin

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $q1Sums
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_quantity > 45 AND l_discount <= 0.02""".stripMargin,

    "q3_order_revenue" ->
      s"""SELECT l_orderkey,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin,

    "q4_region_revenue" ->
      s"""SELECT r_name, n_name,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM region, nation, customer, orders, lineitem
         |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
         |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
         |GROUP BY r_name, n_name""".stripMargin,

    "q5_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)""".stripMargin,

    "q6_anti_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 40)""".stripMargin,

    "q7_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders) w
        |WHERE price_rank <= 3""".stripMargin,

    "q8_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q9_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q10_setops" ->
      """SELECT 'rich_and_big' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |  INTERSECT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000)
        |UNION ALL
        |SELECT 'no_450k_order' AS tag, custkey FROM (
        |  SELECT c_custkey AS custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000)""".stripMargin,

    "q11_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
         |  count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q12_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n, ${dsumSql("o_totalprice")} AS spend
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q13_having" ->
      s"""SELECT o_custkey, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS spend
         |FROM orders GROUP BY o_custkey HAVING count(*) >= 12""".stripMargin,

    "q14_scalar_subquery" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE o_totalprice > (SELECT ${dsumSql("o_totalprice")} / count(*) * 1.5 FROM orders)""".stripMargin,

    "q15_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
         |  event_type, count(*) AS n_events, ${dsumSql("value", 6)} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q16_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events
         |), b AS (
         |  SELECT user_id, event_id, value, ms,
         |    CASE WHEN lag(ms) OVER w IS NULL THEN 1
         |         WHEN ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
         |), sn AS (
         |  SELECT user_id, value, ms,
         |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM b)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ms) AS start_ms, max(ms) AS end_ms, ${dsumSql("value", 6)} AS sum_value
         |FROM sn GROUP BY user_id, session_id""".stripMargin,

    "q17_json_extract" ->
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin,

    "q18_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l,
        |  substring(p_name, 1, 8) AS name8, CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_snake
        |FROM part WHERE p_name LIKE '%a%'""".stripMargin,

    "q19_date_buckets" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
         |  count(*) AS n_orders, ${dsumSql("o_totalprice")} AS spend
         |FROM orders GROUP BY 1, 2""".stripMargin,

    "q20_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_qty,
        |  CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_discounted,
        |  CAST(sum(CASE WHEN l_tax > 0.04 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // q22: salting is invisible to the result — the oracle is the plain
    // single-phase aggregate.
    "q22_salted_agg" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${dsumSql("value", 6)} AS sum_value
         |FROM events GROUP BY 1""".stripMargin,

    // q23: sketch values differ by engine, so the oracle recomputes the
    // EXACT columns and asserts the bound booleans — the Spark side computes
    // them against its own exacts (which hash-match these), so a red row
    // here means the sketch broke its accuracy contract.
    "q23_approx_stats" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users_exact,
        |  TRUE AS users_within_10pct,
        |  TRUE AS median_in_p45_p55
        |FROM events GROUP BY event_type""".stripMargin,

    "q24_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
        |), c AS (
        |  SELECT event_id, user_id, event_type, ms,
        |    last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
        |      OVER w AS last_view_id,
        |    last_value(CASE WHEN event_type = 'view' THEN ms END IGNORE NULLS)
        |      OVER w AS last_view_ms
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id AS click_id, user_id, last_view_id,
        |  ms - last_view_ms AS ms_since_view
        |FROM c WHERE event_type = 'click' AND last_view_id IS NOT NULL""".stripMargin,

    "q25_correlated_exists" -> correlatedExistsSql,

    "q28_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "q29_grouping_sets" -> groupingSetsSql,

    "q27_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY d
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d_spend
        |FROM (SELECT o_orderkey, o_custkey,
        |        epoch_ms(o_orderdate) // 1000 // 86400 AS d, o_totalprice
        |      FROM orders) t""".stripMargin,

    "q26_supplier_share" ->
      s"""SELECT n_name, ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,

    "q30_window_suite" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WHERE o_totalprice > 400000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q31_setops_all" ->
      """SELECT 'big_and_urgent' AS tag, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
        |  INTERSECT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'big_not_urgent' AS tag, custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
        |  EXCEPT ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    "q32_full_outer" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  c_acctbal, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN
        |     (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |      WHERE o_totalprice > 500000) o
        |  ON c_custkey = o_custkey""".stripMargin,

    "q33_exact_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS qty_p50,
        |  quantile_cont(l_quantity, 0.9) AS qty_p90,
        |  quantile_cont(l_extendedprice, 0.25) AS price_p25,
        |  quantile_cont(l_extendedprice, 0.75) AS price_p75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q34_unpivot" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |    ${dsumSql("l_quantity")} AS sum_qty,
         |    ${dsumSql("l_extendedprice")} AS sum_price,
         |    ${dsumSql("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS val FROM a""".stripMargin,

    // q35: the binning is invisible to the result — the oracle is the plain
    // theta join (same SQL as the x3 stream-stream gate).
    "q35_range_join" ->
      """SELECT c.event_id AS click_id, c.user_id, v.event_id AS view_id,
        |  epoch_ms(c.ts) - epoch_ms(v.ts) AS ms_gap
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '30 minutes'""".stripMargin,

    // q36: the deterministic sketch replays exactly in any engine — same
    // md5, same hex fold (Dedup's instr chain), same rank-k selection,
    // same two exact double operands with one rounded division.
    "q36_kmv_sketch" -> {
      val hexToInt = (0 until 8).map { i =>
        s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type, $hexToInt AS hv
         |      FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS m FROM d) t),
         |r AS (SELECT event_type, hv,
         |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |      FROM h)
         |SELECT event_type, count(*) AS n_exact,
         |  coalesce(63.0 * 4294967296.0 / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE),
         |           CAST(count(*) AS DOUBLE)) AS est_users
         |FROM r GROUP BY event_type""".stripMargin
    },

    // The bloom probe is pure pruning: the residual join makes the result
    // exactly the plain join's, which is what the oracle spells.
    "q37_bloom_join" ->
      s"""SELECT o_orderpriority,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_orderdate >= TIMESTAMP '1998-06-01'
         |GROUP BY o_orderpriority""".stripMargin,

    // the 32-term bit sum is generated from the same construction the
    // native expression implements; `//` is DuckDB integer division
    "q38_zorder_cells" ->
      s"""SELECT (zk // 4096) AS zcell, count(*) AS n,
         |  min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
         |  min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk
         |FROM (SELECT l_partkey, l_suppkey,
         |        ${graft.functions.MortonCode.mortonSql("l_partkey", "l_suppkey")} AS zk
         |      FROM lineitem) t
         |GROUP BY 1""".stripMargin,

    // same one-row range, same clamped float binning (operand order
    // mirrored)
    "q52_value_histogram" ->
      """WITH mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
        |SELECT event_type,
        |  CAST(least(floor((value - lo) * 10.0 / (hi - lo)), 9.0) AS BIGINT) AS bin,
        |  count(*) AS n
        |FROM events, mm
        |GROUP BY 1, 2""".stripMargin,

    // same joins, same dsum revenue; the ORDER BY tie-breaks on custkey
    // so the 20-row cut is the same set in both engines
    "q53_customer_returns" ->
      s"""SELECT c.c_custkey, c.c_name, n.n_name,
         |  ${dsumSql("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o.o_orderdate < TIMESTAMP '1997-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c.c_custkey
         |LIMIT 20""".stripMargin,

    // exact medians via quantile_cont (q33-verified equal to Spark's
    // percentile); |v − med| and the 3·MAD compare are single IEEE ops
    "q54_mad_outliers" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |             FROM events GROUP BY event_type),
        |dev AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
        |        FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |        FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n_events,
        |  max(d.med) AS med, max(x.mad) AS mad,
        |  CAST(sum(CASE WHEN d.adev > 3.0 * x.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad x ON d.event_type = x.event_type
        |GROUP BY d.event_type""".stripMargin,

    // same decimal-to-the-end window sum, same single final division
    "q55_market_share" ->
      """WITH a AS (
        |  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, n.n_name,
        |    sum(CAST(l.l_extendedprice * (1.0 - l.l_discount)
        |      AS DECIMAL(18,6))) AS rev_dec
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA'
        |  GROUP BY 1, 2)
        |SELECT o_year, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(rev_dec AS DOUBLE)
        |    / CAST(sum(rev_dec) OVER (PARTITION BY o_year) AS DOUBLE) AS share
        |FROM a""".stripMargin,

    // quantile_cont == Spark percentile (q33); same >= fold over the
    // same 9 interpolated cutpoints
    "q56_equidepth_hist" ->
      """WITH cuts AS (
        |  SELECT event_type,
        |    quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
        |      AS cuts
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  CAST(len(list_filter(c.cuts, x -> e.value >= x)) AS BIGINT) AS bin,
        |  count(*) AS n, min(e.value) AS lo, max(e.value) AS hi
        |FROM events e JOIN cuts c ON e.event_type = c.event_type
        |GROUP BY 1, 2""".stripMargin,

    // q79: the sketch replays exactly — same md5 hex fold (q36's chain),
    // same (hv, value) rank-512 retention spelled as a window, same
    // ceil(i·ns/10) integer cut index, same integer err_ppm; the
    // correlated count is the rank audit (DuckDB-side spelling of the
    // broadcast-cuts fold)
    "q79_quantile_sketch" ->
      s"""WITH $quantileCutsSql,
         |n AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1),
         |tr AS (SELECT c.event_type, c.decile, c.cut_value, c.ns,
         |         (SELECT count(*) FROM events e
         |          WHERE e.event_type = c.event_type
         |            AND e.value <= c.cut_value) AS true_rank
         |       FROM cuts c)
         |SELECT tr.event_type, CAST(tr.decile AS BIGINT) AS decile,
         |  tr.cut_value, CAST(tr.ns AS BIGINT) AS sample_n, tr.true_rank,
         |  n.n_events,
         |  CAST(abs(tr.true_rank * 1000000 // n.n_events
         |    - tr.decile * 100000) AS BIGINT) AS err_ppm
         |FROM tr JOIN n ON tr.event_type = n.event_type""".stripMargin,

    // q80: the lattice replays as stacked rank-512 windows — day
    // retention from the raw rows, month retention from the DAY
    // survivors, year retention from the MONTH survivors (the same
    // two-hop chain), direct month/year retention from the raw rows,
    // full-sample list equality as the identity flag, and the same
    // ceil(i·ns/10) cut index read by 1-based list indexing
    "q80_sketch_rollup" ->
      s"""WITH base AS (SELECT event_type, date_trunc('day', ts) AS day,
         |    value, $md5HexFoldSql AS hv
         |  FROM (SELECT event_type, ts, value,
         |          md5(CAST(event_id AS VARCHAR)) AS m FROM events
         |        WHERE value IS NOT NULL) t),
         |dsmp AS MATERIALIZED (SELECT event_type, day, hv, value FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type, day
         |        ORDER BY hv, value) AS rn FROM base) t WHERE rn <= 512),
         |msmp AS MATERIALIZED (SELECT event_type,
         |    date_trunc('month', day) AS bucket, hv, value FROM (
         |    SELECT *, row_number() OVER (
         |        PARTITION BY event_type, date_trunc('month', day)
         |        ORDER BY hv, value) AS rn FROM dsmp) t WHERE rn <= 512),
         |ysmp AS (SELECT event_type, date_trunc('year', bucket) AS bucket,
         |    hv, value FROM (
         |    SELECT *, row_number() OVER (
         |        PARTITION BY event_type, date_trunc('year', bucket)
         |        ORDER BY hv, value) AS rn FROM msmp) t WHERE rn <= 512),
         |dm AS (SELECT event_type, date_trunc('month', day) AS bucket,
         |    hv, value FROM (
         |    SELECT *, row_number() OVER (
         |        PARTITION BY event_type, date_trunc('month', day)
         |        ORDER BY hv, value) AS rn FROM base) t WHERE rn <= 512),
         |dy AS (SELECT event_type, date_trunc('year', day) AS bucket,
         |    hv, value FROM (
         |    SELECT *, row_number() OVER (
         |        PARTITION BY event_type, date_trunc('year', day)
         |        ORDER BY hv, value) AS rn FROM base) t WHERE rn <= 512),
         |lm AS (SELECT event_type, bucket, list(value ORDER BY value) AS vs,
         |         count(*) AS ns FROM msmp GROUP BY 1, 2),
         |ly AS (SELECT event_type, bucket, list(value ORDER BY value) AS vs,
         |         count(*) AS ns FROM ysmp GROUP BY 1, 2),
         |ldm AS (SELECT event_type, bucket, list(value ORDER BY value) AS vs
         |        FROM dm GROUP BY 1, 2),
         |ldy AS (SELECT event_type, bucket, list(value ORDER BY value) AS vs
         |        FROM dy GROUP BY 1, 2),
         |u AS (SELECT 'month' AS grain, l.event_type, l.bucket, l.ns,
         |        CASE WHEN l.vs = d.vs THEN 1 ELSE 0 END AS eq, l.vs
         |      FROM lm l JOIN ldm d
         |        ON l.event_type = d.event_type AND l.bucket = d.bucket
         |      UNION ALL
         |      SELECT 'year', l.event_type, l.bucket, l.ns,
         |        CASE WHEN l.vs = d.vs THEN 1 ELSE 0 END, l.vs
         |      FROM ly l JOIN ldy d
         |        ON l.event_type = d.event_type AND l.bucket = d.bucket)
         |SELECT grain, event_type, bucket, CAST(d.i AS BIGINT) AS decile,
         |  vs[greatest(1, (d.i * ns + 9) // 10)] AS cut_value,
         |  CAST(ns AS BIGINT) AS sample_n,
         |  CAST(eq AS BIGINT) AS merged_equals_direct
         |FROM u JOIN (SELECT unnest(generate_series(1, 9)) AS i) d ON true""".stripMargin,

    // date_diff('day') == Spark datediff on date-truncated timestamps;
    // quantile_cont == percentile (q33)
    "q61_fulfillment_span" ->
      """WITH s AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    CAST(date_diff('day', min(l_shipdate), max(l_shipdate)) AS BIGINT)
        |      AS span_days
        |  FROM lineitem GROUP BY 1)
        |SELECT o.o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(s.span_days) AS BIGINT) AS total_span_days,
        |  max(s.span_days) AS max_span_days,
        |  quantile_cont(s.span_days, 0.5) AS median_span_days
        |FROM orders o JOIN s ON o.o_orderkey = s.o_orderkey
        |GROUP BY 1""".stripMargin,

    // same md5-residue change batch, same two-or-one row versioning —
    // spelled as the closed-rows UNION the current-rows (the relational
    // twin of the Spark side's in-row explode)
    "q62_scd2_merge" -> scd2MergeSql,

    // same versioned dimension (the factored q62 SQL as a CTE), same
    // ISO-string validity compare (lexicographic == chronological),
    // same open-interval sentinel
    "q64_temporal_join" ->
      s"""WITH dim AS ($scd2MergeSql),
         |e AS (SELECT user_id, event_type, value,
         |        strftime(ts, '%Y-%m-%d') AS d FROM events)
         |SELECT dim.segment, e.event_type, count(*) AS n_events,
         |  ${dsumSql("e.value")} AS sum_value
         |FROM e JOIN dim ON e.user_id = dim.c_custkey
         |  AND e.d >= dim.valid_from
         |  AND e.d < coalesce(dim.valid_to, '9999-12-31')
         |GROUP BY 1, 2""".stripMargin,

    // the oracle spells the GLOBAL per-type successor directly (one
    // window); the Spark side's (type, hour) decomposition + cross-hour
    // link reconstructs the identical successor because hour is a
    // monotone function of ms — equality proves the decomposition exact.
    // Same integer micros, same HUGEINT product sums, same final-division
    // float discipline (NULLIF guards the all-holds-zero 0/0).
    "q65_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT event_type, event_id, epoch_ms(ts) AS ms,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS value_micro
        |  FROM events),
        |x AS (
        |  SELECT event_type, value_micro,
        |    lead(ms) OVER (PARTITION BY event_type ORDER BY ms, event_id) - ms
        |      AS hold_ms
        |  FROM e)
        |SELECT event_type, count(*) AS n_holds,
        |  CAST(sum(hold_ms) AS BIGINT) AS total_hold_ms,
        |  CAST(sum(CAST(value_micro * hold_ms AS HUGEINT)) AS DOUBLE)
        |    / CAST(NULLIF(CAST(sum(hold_ms) AS BIGINT), 0) AS DOUBLE) / 1e6
        |    AS twa
        |FROM x WHERE hold_ms IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // same size-histogram reduction, same ceiling ranks picked off the
    // cumulative, same ppm floor
    "q66_join_skew_audit" -> {
      def auditSql(table: String, keyCol: String): String =
        s"""SELECT '$keyCol' AS key_col, min(n_rows) AS n_rows,
           |  min(n_keys) AS n_keys, CAST(max(sz) AS BIGINT) AS max_group,
           |  CAST(max(sz) AS BIGINT) * 1000000 // min(n_rows) AS max_share_ppm,
           |  CAST(min(CASE WHEN cum >= (n_keys * 50 + 99) // 100 THEN sz END)
           |    AS BIGINT) AS p50_group,
           |  CAST(min(CASE WHEN cum >= (n_keys * 90 + 99) // 100 THEN sz END)
           |    AS BIGINT) AS p90_group,
           |  CAST(min(CASE WHEN cum >= (n_keys * 99 + 99) // 100 THEN sz END)
           |    AS BIGINT) AS p99_group
           |FROM (
           |  SELECT sz, nk, sum(nk) OVER (ORDER BY sz) AS cum,
           |    CAST(sum(nk) OVER () AS BIGINT) AS n_keys,
           |    CAST(sum(sz * nk) OVER () AS BIGINT) AS n_rows
           |  FROM (SELECT sz, count(*) AS nk FROM
           |          (SELECT count(*) AS sz FROM $table GROUP BY $keyCol) g
           |        GROUP BY sz) h) c""".stripMargin
      s"""${auditSql("orders", "o_custkey")}
         |UNION ALL
         |${auditSql("lineitem", "l_partkey")}""".stripMargin
    },

    // same global bins, same conditional counts, same single-subtraction
    // drift; NULLIF guards the 0/0 share exactly as the Spark side does
    // (Spark non-ANSI /0 → NULL vs DuckDB IEEE → NaN would otherwise
    // diverge on a period-empty type)
    "q60_distribution_drift" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'a' ELSE 'b' END AS period
        |  FROM events),
        |mm AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
        |b AS (SELECT event_type, period,
        |        CAST(least(floor((value - lo) * 10.0 / (hi - lo)), 9.0) AS BIGINT) AS bin
        |      FROM e, mm),
        |tots AS (SELECT event_type,
        |           CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
        |           CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS tb
        |         FROM b GROUP BY event_type),
        |c AS (SELECT event_type, bin,
        |        CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM b GROUP BY 1, 2)
        |SELECT c.event_type, c.bin, c.n_a, c.n_b,
        |  abs(CAST(c.n_a AS DOUBLE) / NULLIF(t.ta, 0)
        |    - CAST(c.n_b AS DOUBLE) / NULLIF(t.tb, 0)) AS drift
        |FROM c JOIN tots t ON c.event_type = t.event_type""".stripMargin,

    // same zero-filled grid over the same generated min..max hour axis
    // (generate_series/sequence are both stop-inclusive), HUGEINT power
    // sums mirroring the decimal exactness, same single division over
    // two sqrts, same variance-0 NULL guard
    "q63_type_correlation" ->
      """WITH hc AS (SELECT date_trunc('hour', ts) AS h, event_type,
        |              count(*) AS n
        |            FROM events GROUP BY 1, 2),
        |grid AS (SELECT hours.h, types.event_type, coalesce(hc.n, 0) AS n
        |         FROM (SELECT unnest(generate_series(lo, hi,
        |                 INTERVAL 1 HOUR)) AS h
        |               FROM (SELECT min(h) AS lo, max(h) AS hi FROM hc)) hours
        |         CROSS JOIN (SELECT DISTINCT event_type FROM hc) types
        |         LEFT JOIN hc ON hc.h = hours.h
        |           AND hc.event_type = types.event_type),
        |p AS (SELECT a.h, a.event_type AS t1, b.event_type AS t2,
        |        CAST(a.n AS HUGEINT) AS x, CAST(b.n AS HUGEINT) AS y
        |      FROM grid a JOIN grid b ON a.h = b.h
        |        AND a.event_type < b.event_type),
        |agg AS (SELECT t1, t2, CAST(count(*) AS HUGEINT) AS nh,
        |          sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
        |          sum(x*x) AS sxx, sum(y*y) AS syy
        |        FROM p GROUP BY 1, 2)
        |SELECT t1, t2, CAST(nh AS BIGINT) AS n_hours,
        |  CASE WHEN nh*sxx - sx*sx <= 0 OR nh*syy - sy*sy <= 0 THEN NULL
        |       ELSE CAST(nh*sxy - sx*sy AS DOUBLE)
        |         / (sqrt(CAST(nh*sxx - sx*sx AS DOUBLE))
        |            * sqrt(CAST(nh*syy - sy*sy AS DOUBLE))) END AS r
        |FROM agg""".stripMargin,

    // plain range join (the binned cover is exact over the 2 h window),
    // same integer micro-unit floors, same latest-view remainder rule
    // (row_number over the identical (v_ms DESC, v_id DESC) total order),
    // same sentinel rollup for view-less purchases (NOT EXISTS = the
    // left_anti; GROUP BY the constant key so the row vanishes when the
    // anti-join is empty, exactly as Spark's grouped agg does)
    "q59_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_ms(ts) AS p_ms,
        |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |      AS value_micro
        |  FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, epoch_ms(ts) AS v_ms
        |      FROM events WHERE event_type = 'view'),
        |m AS (SELECT p.p_id, p.user_id, p.value_micro, v.v_ms, v.v_id
        |      FROM p JOIN v ON p.user_id = v.user_id
        |        AND v.v_ms <= p.p_ms AND v.v_ms > p.p_ms - 7200000),
        |c AS (SELECT *, count(*) OVER (PARTITION BY p_id) AS nv,
        |        row_number() OVER (PARTITION BY p_id
        |          ORDER BY v_ms DESC, v_id DESC) AS rn
        |      FROM m),
        |cr AS (SELECT user_id, p_id,
        |         value_micro // nv
        |           + CASE WHEN rn = 1
        |             THEN value_micro - (value_micro // nv) * nv
        |             ELSE 0 END AS credit
        |       FROM c),
        |att AS (SELECT user_id, count(DISTINCT p_id) AS n_purchases,
        |          count(*) AS n_view_credits,
        |          CAST(sum(credit) AS BIGINT) AS credit_micro
        |        FROM cr GROUP BY user_id),
        |un AS (SELECT CAST(-1 AS BIGINT) AS user_id,
        |         count(DISTINCT p_id) AS n_purchases,
        |         CAST(0 AS BIGINT) AS n_view_credits,
        |         CAST(sum(value_micro) AS BIGINT) AS credit_micro
        |       FROM p
        |       WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.p_id = p.p_id)
        |       GROUP BY 1)
        |SELECT * FROM att UNION ALL SELECT * FROM un""".stripMargin,

    // the same symmetric window, rank order, and NULL-keeping left join;
    // the oracle skips the bin decomposition (a pure candidate-pruning
    // device — the |gap| residual defines the match set on both sides)
    "q75_asof_nearest" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_ms(ts) AS p_ms
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS c_id, epoch_ms(ts) AS c_ms
        |      FROM events WHERE event_type = 'click'),
        |m AS (SELECT p.p_id, c.c_id, c.c_ms - p.p_ms AS gap_ms,
        |        row_number() OVER (PARTITION BY p.p_id
        |          ORDER BY abs(c.c_ms - p.p_ms), c.c_ms, c.c_id) AS rn
        |      FROM p JOIN c ON p.user_id = c.user_id
        |        AND abs(c.c_ms - p.p_ms) <= 1800000)
        |SELECT p.p_id, p.user_id, m.c_id, m.gap_ms
        |FROM p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.p_id = p.p_id""".stripMargin,

    // the textbook single-sweep spelling: one global running max over
    // (price ASC, size DESC, key ASC) — provably identical to the Spark
    // side's two-phase binned form because bins are monotone in price
    "q76_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size FROM (
        |  SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size,
        |    max(CAST(p_size AS BIGINT)) OVER (
        |      ORDER BY p_retailprice ASC, p_size DESC, p_partkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rmax
        |  FROM part) t
        |WHERE p_size > coalesce(rmax, -1)""".stripMargin,

    // the same (ms DESC, event_id DESC) winner and per-key change count;
    // tombstoned keys are absent, not NULLed
    "q77_cdc_apply" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |             event_type, value
        |           FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY user_id
        |          ORDER BY ms DESC, event_id DESC) AS rn,
        |        count(*) OVER (PARTITION BY user_id) AS n_changes
        |      FROM e)
        |SELECT user_id, value AS last_value, ms AS last_ms, n_changes
        |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    // the journey restated as an ordered string_agg over the SAME
    // first-seqMatchCap prefix rule (string_agg skips the CASE's nulls
    // past the cap — the aggregate-skips-nulls idiom both engines share);
    // n_events is the full count; leftmost non-overlapping regex counting
    // is engine-identical for an alternation-free pattern
    "q78_sequence_match" ->
      s"""WITH e AS (SELECT user_id, substr(event_type, 1, 1) AS i,
        |             epoch_ms(ts) AS ms, event_id,
        |             row_number() OVER (PARTITION BY user_id
        |               ORDER BY epoch_ms(ts), event_id, substr(event_type, 1, 1)) AS rn
        |           FROM events),
        |j AS (SELECT user_id, count(*) AS n_events,
        |        string_agg(CASE WHEN rn <= $seqMatchCap THEN i END, ''
        |          ORDER BY ms, event_id, i) AS j
        |      FROM e GROUP BY user_id)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(len(regexp_extract_all(j, 'vc*p')) AS BIGINT) AS n_conv
        |FROM j""".stripMargin,

    // same md5 uniforms, same literal thresholds, same decimal means
    "q57_poisson_bootstrap" -> {
      val hexToInt = (0 until 8).map { i =>
        s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH r AS (
         |  SELECT event_type, value, event_id, b.b
         |  FROM events, (SELECT unnest(generate_series(0, 15)) AS b) b),
         |u AS (SELECT event_type, value, b,
         |        CAST($hexToInt AS DOUBLE) / 4294967296.0 AS u
         |      FROM (SELECT event_type, value, b,
         |              md5(CAST(event_id AS VARCHAR) || '_' || CAST(b AS VARCHAR)) AS m
         |            FROM r) t),
         |w AS (SELECT event_type, value, b,
         |        CASE WHEN u < 0.36787944117144233 THEN 0
         |             WHEN u < 0.7357588823428847 THEN 1
         |             WHEN u < 0.9196986029286058 THEN 2
         |             WHEN u < 0.9810118431238462 THEN 3
         |             WHEN u < 0.9963401531726563 THEN 4
         |             WHEN u < 0.9994058151824183 THEN 5
         |             ELSE 6 END AS w
         |      FROM u)
         |SELECT event_type, b, CAST(sum(w) AS BIGINT) AS n_eff,
         |  ${dsumSql("w * value")} / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
         |    AS mean_b
         |FROM w GROUP BY 1, 2""".stripMargin
    },

    // same keys, same 32-bit md5 prefixes, order-free sums
    "q58_key_checksums" -> {
      val hexToInt = (0 until 8).map { i =>
        s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
      }.mkString(" + ")
      def ck(name: String, keyExpr: String) =
        s"""SELECT '$name' AS table_name, count(*) AS n_rows,
           |  CAST(sum($hexToInt) AS BIGINT) AS checksum
           |FROM (SELECT md5($keyExpr) AS m FROM $name) t""".stripMargin
      Seq(
        ck("lineitem",
          "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_partkey AS VARCHAR)" +
            " || '_' || CAST(l_suppkey AS VARCHAR)"),
        ck("orders", "CAST(o_orderkey AS VARCHAR)"),
        ck("customer", "CAST(c_custkey AS VARCHAR)"),
        ck("part", "CAST(p_partkey AS VARCHAR)")).mkString("\nUNION ALL\n")
    },

    // the union sketch is the distinct-merge rank window; membership runs
    // against each type's bottom-64 rows; every double op mirrors the
    // Spark operand order
    "q51_sketch_setops" -> {
      val hexToInt = (0 until 8).map { i =>
        s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT DISTINCT event_type, $hexToInt AS hv
         |      FROM (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS m FROM d) t),
         |rk AS (SELECT event_type, hv,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
         |       FROM h),
         |bot AS (SELECT event_type, hv FROM rk WHERE rn <= 64),
         |ty AS (SELECT DISTINCT event_type FROM d),
         |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
         |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
         |ub AS (SELECT pr.type_a, pr.type_b, bot.hv
         |       FROM pr JOIN bot ON bot.event_type IN (pr.type_a, pr.type_b)
         |       GROUP BY 1, 2, 3),
         |ur AS (SELECT type_a, type_b, hv,
         |         row_number() OVER (PARTITION BY type_a, type_b ORDER BY hv) AS rn
         |       FROM ub),
         |usk AS (SELECT ur.type_a, ur.type_b, ur.hv, ur.rn,
         |          (ia.hv IS NOT NULL AND ib.hv IS NOT NULL) AS in_both
         |        FROM ur
         |        LEFT JOIN bot ia ON ia.event_type = ur.type_a AND ia.hv = ur.hv
         |        LEFT JOIN bot ib ON ib.event_type = ur.type_b AND ib.hv = ur.hv
         |        WHERE ur.rn <= 64),
         |um AS (SELECT type_a, type_b, count(*) AS usz,
         |         max(CASE WHEN rn = 64 THEN hv END) AS uk,
         |         CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS cnt_both
         |       FROM usk GROUP BY 1, 2),
         |est AS (SELECT type_a, type_b,
         |          CASE WHEN usz = 64
         |               THEN 63.0 * 4294967296.0 / CAST(uk AS DOUBLE)
         |               ELSE CAST(usz AS DOUBLE) END AS est_union, usz, cnt_both
         |        FROM um),
         |na AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type),
         |ei AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
         |         count(*) AS ei
         |       FROM d x JOIN d y ON x.user_id = y.user_id
         |                        AND x.event_type < y.event_type
         |       GROUP BY 1, 2)
         |SELECT est.type_a, est.type_b,
         |  CAST(a.n + b.n - coalesce(ei.ei, 0) AS BIGINT) AS exact_union,
         |  CAST(coalesce(ei.ei, 0) AS BIGINT) AS exact_inter,
         |  est.est_union,
         |  (CAST(cnt_both AS DOUBLE) / usz) * est_union AS est_inter
         |FROM est
         |JOIN na a ON a.event_type = est.type_a
         |JOIN na b ON b.event_type = est.type_b
         |LEFT JOIN ei ON ei.type_a = est.type_a AND ei.type_b = est.type_b"""
        .stripMargin
    },

    // each check spelled as NOT EXISTS — the anti-join's semantics
    "q50_orphan_audit" ->
      """SELECT 'lineitem_orphan_order' AS chk, count(*) AS n_violations
        |FROM lineitem WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'lineitem_orphan_part', count(*) FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        |UNION ALL
        |SELECT 'lineitem_orphan_supplier', count(*) FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)
        |UNION ALL
        |SELECT 'orders_orphan_customer', count(*) FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL
        |SELECT 'orders_childless', count(*) FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |UNION ALL
        |SELECT 'customer_orphan_nation', count(*) FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
        |UNION ALL
        |SELECT 'nation_orphan_region', count(*) FROM nation
        |WHERE NOT EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey)""".stripMargin,

    "q39_recursive_cte" -> recursiveWalkSql,

    "q40_lateral_topk" -> lateralTopkSql,

    "q41_variant_extract" ->
      """SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) > 50""".stripMargin,

    "q42_funnel" ->
      s"""WITH $funnelChainSql,
        |u AS (SELECT user_id, max(fv) AS fv, max(fc) AS fc, max(fp) AS fp
        |      FROM w3 GROUP BY user_id)
        |SELECT count(*) AS n_users, count(fv) AS n_view,
        |       count(fc) AS n_view_click, count(fp) AS n_full_funnel,
        |       CAST(coalesce(sum(fc - fv), 0) AS BIGINT) AS sum_v2c_ms,
        |       CAST(coalesce(sum(fp - fc), 0) AS BIGINT) AS sum_c2p_ms
        |FROM u""".stripMargin,

    "q43_retention_cohorts" ->
      """WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id),
        |sz AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY cohort),
        |r AS (SELECT f.cohort,
        |        CAST(date_diff('day', f.cohort, uw.wk) // 7 AS BIGINT) AS week_offset,
        |        count(*) AS n_active
        |      FROM uw JOIN f ON uw.user_id = f.user_id
        |      GROUP BY f.cohort, 2)
        |SELECT strftime(r.cohort, '%Y-%m-%d') AS cohort_week, week_offset,
        |       n_active, cohort_size
        |FROM r JOIN sz ON r.cohort = sz.cohort""".stripMargin,

    // same sorted basket; DuckDB's list lambdas mirror Spark's HOFs
    // one-for-one (list_filter/filter, list_aggregate 'sum'/aggregate,
    // list_reverse + slice / reverse + slice)
    "q44_array_hof" ->
      """WITH a AS (
        |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(qs) AS BIGINT) AS n_items,
        |  CAST(list_aggregate(qs, 'sum') AS BIGINT) AS total_qty,
        |  CAST(len(list_filter(qs, x -> x >= 30)) AS BIGINT) AS n_big,
        |  CAST(list_aggregate(list_reverse(qs)[1:3], 'sum') AS BIGINT) AS top3_qty,
        |  qs[-1] AS max_qty,
        |  qs[1] AS min_qty
        |FROM a""".stripMargin,

    // identical window spellings; ms longs keep every boundary exact
    "q45_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS status,
        |                  epoch_ms(ts) AS ms FROM events),
        |ch AS (SELECT *, lag(status) OVER
        |         (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, status, ms FROM ch
        |      WHERE prev IS NULL OR status <> prev)
        |SELECT user_id, status, ms AS valid_from_ms,
        |  lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS valid_to_ms,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS BIGINT) AS version,
        |  lead(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL AS is_current
        |FROM f""".stripMargin,

    // q16's session CTEs, then the same hour-decomposed sweep: per-hour
    // running sums + a prefix carry over the per-hour rollup; the −1
    // before +1 tie rule is the same ORDER BY ms, delta
    "q46_session_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |b AS (SELECT user_id, event_id, ms,
        |        CASE WHEN lag(ms) OVER w IS NULL THEN 1
        |             WHEN ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
        |sn AS (SELECT user_id, ms,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |       FROM b),
        |sess AS (SELECT user_id, sid, min(ms) AS start_ms, max(ms) AS end_ms
        |         FROM sn GROUP BY 1, 2),
        |bounds AS (SELECT start_ms AS ms, 1 AS delta FROM sess
        |           UNION ALL SELECT end_ms + 1, -1 FROM sess),
        |hb AS (SELECT ms, delta, ms // 3600000 AS h FROM bounds),
        |hourly AS (SELECT h, sum(delta) AS d,
        |             sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS n_starts,
        |             sum(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS n_ends
        |           FROM hb GROUP BY h),
        |carry AS (SELECT h, n_starts, n_ends,
        |            coalesce(sum(d) OVER (ORDER BY h
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry_in
        |          FROM hourly),
        |run AS (SELECT h, sum(delta) OVER (PARTITION BY h ORDER BY ms, delta
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rd FROM hb),
        |mx AS (SELECT h, max(rd) AS mx FROM run GROUP BY h)
        |SELECT carry.h, CAST(carry_in AS BIGINT) AS carry_in,
        |  CAST(n_starts AS BIGINT) AS n_starts, CAST(n_ends AS BIGINT) AS n_ends,
        |  CAST(carry_in + mx AS BIGINT) AS max_concurrent
        |FROM carry JOIN mx USING (h)""".stripMargin,

    // from-scratch recompute over ALL events: equality proves the
    // base+delta merge reconstructs the full view exactly
    "q47_incremental_agg" ->
      s"""SELECT user_id, count(*) AS n_events,
         |  ${graft.Exprs.dsumSql("value", 6)} AS sum_value,
         |  max(epoch_ms(ts)) AS last_ms
         |FROM events GROUP BY user_id""".stripMargin,

    "q48_rolling_active" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |cov AS (SELECT DISTINCT user_id, d + CAST(i AS INTEGER) AS cd
        |        FROM ud, LATERAL unnest(generate_series(0, 6)) AS u(i)),
        |obs AS (SELECT DISTINCT d FROM ud)
        |SELECT strftime(obs.d, '%Y-%m-%d') AS day, count(*) AS active_users_7d
        |FROM cov JOIN obs ON cov.cd = obs.d
        |GROUP BY 1""".stripMargin,

    // q49: q36's rank-k spelling per day, deduplicated union across the
    // 7-day cover, rank-k again — deterministic, so the sketch itself gates
    "q49_rolling_kmv" -> {
      val hexToInt = (0 until 8).map { i =>
        s"(instr('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * CAST(${1L << (4 * (7 - i))} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |h AS (SELECT d, $hexToInt AS hv
         |      FROM (SELECT d, md5(CAST(user_id AS VARCHAR)) AS m FROM ud) t),
         |daily AS (SELECT d, hv FROM (
         |    SELECT d, hv, row_number() OVER (PARTITION BY d ORDER BY hv) AS rn
         |    FROM h) r WHERE rn <= 64),
         |cov AS (SELECT DISTINCT d + CAST(i AS INTEGER) AS day, hv
         |        FROM daily, LATERAL unnest(generate_series(0, 6)) AS u(i)),
         |obs AS (SELECT DISTINCT d AS day FROM ud),
         |m AS (SELECT day, hv FROM (
         |    SELECT cov.day, cov.hv,
         |      row_number() OVER (PARTITION BY cov.day ORDER BY cov.hv) AS rn
         |    FROM cov JOIN obs USING (day)) r WHERE rn <= 64)
         |SELECT strftime(day, '%Y-%m-%d') AS day,
         |  CASE WHEN count(*) = 64
         |       THEN 63.0 * 4294967296.0 / CAST(max(hv) AS DOUBLE)
         |       ELSE CAST(count(*) AS DOUBLE) END AS est_users_7d
         |FROM m GROUP BY 1""".stripMargin
    },

    // q67: salting is a physical rewrite — the oracle is the PLAIN join
    "q67_salted_join" ->
      s"""SELECT p_brand,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS revenue,
         |  count(*) AS n_items,
         |  count(DISTINCT l_partkey) AS n_parts
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,

    // same (start, end, orderkey) total order under both windows, same
    // strict-after island break, same inclusive day counts; start/end
    // spelled strt/en (DuckDB keywords)
    "q68_interval_islands" ->
      """WITH iv AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS end0
        |            FROM lineitem GROUP BY 1),
        |o AS (SELECT o.o_custkey, o.o_orderkey,
        |        CAST(o.o_orderdate AS DATE) AS strt,
        |        greatest(CAST(o.o_orderdate AS DATE), iv.end0) AS en
        |      FROM orders o JOIN iv ON o.o_orderkey = iv.l_orderkey),
        |f AS (SELECT *, CASE WHEN pm IS NULL OR strt > pm THEN 1 ELSE 0 END
        |        AS opens
        |      FROM (SELECT *, max(en) OVER (PARTITION BY o_custkey
        |              ORDER BY strt, en, o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |            FROM o) t),
        |g AS (SELECT *, sum(opens) OVER (PARTITION BY o_custkey
        |        ORDER BY strt, en, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |      FROM f),
        |i AS (SELECT o_custkey, island, min(strt) AS i_start,
        |        max(en) AS i_end, count(*) AS i_orders
        |      FROM g GROUP BY 1, 2)
        |SELECT o_custkey AS custkey, count(*) AS n_islands,
        |  CAST(sum(i_orders) AS BIGINT) AS n_orders,
        |  CAST(sum(date_diff('day', i_start, i_end) + 1) AS BIGINT)
        |    AS covered_days,
        |  CAST(date_diff('day', min(i_start), max(i_end)) + 1
        |    - sum(date_diff('day', i_start, i_end) + 1) AS BIGINT) AS gap_days
        |FROM i GROUP BY 1""".stripMargin,

    // same generated hour axis, same integer-micros floored mean (// and
    // div both truncate toward zero; vm >= 0), same IGNORE NULLS running
    // fill, NULL before first observation
    "q69_gap_fill" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |               AS vm
        |           FROM events),
        |hc AS (SELECT event_type, h,
        |         CAST(sum(vm) // count(*) AS BIGINT) AS mean_micro
        |       FROM e GROUP BY 1, 2),
        |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |         FROM (SELECT min(h) AS lo, max(h) AS hi FROM hc)),
        |grid AS (SELECT t.event_type, axis.h, hc.mean_micro
        |         FROM axis
        |         CROSS JOIN (SELECT DISTINCT event_type FROM hc) t
        |         LEFT JOIN hc ON hc.event_type = t.event_type
        |           AND hc.h = axis.h)
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  last_value(mean_micro IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_micro,
        |  CAST(mean_micro IS NOT NULL AS BIGINT) AS was_observed
        |FROM grid""".stripMargin,

    // the same first-event trick: cumulative distinct ≡ running sum of
    // per-day first-appearance counts over the zero-filled day grid
    "q74_cumulative_uniques" ->
      """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS d FROM events),
        |daily AS (SELECT d, count(*) AS n_events FROM ev GROUP BY 1),
        |firsts AS (SELECT fd AS d, count(*) AS n_new FROM
        |             (SELECT user_id, min(d) AS fd FROM ev GROUP BY 1) t
        |           GROUP BY 1),
        |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        |         FROM (SELECT min(d) AS lo, max(d) AS hi FROM daily))
        |SELECT strftime(axis.d, '%Y-%m-%d') AS day,
        |  CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
        |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new_users,
        |  CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY axis.d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_unique_users
        |FROM axis
        |LEFT JOIN daily ON axis.d = daily.d
        |LEFT JOIN firsts ON axis.d = firsts.d""".stripMargin,

    // q69's grid + fill restated, then the same 8-term halving-weight
    // integer sum; num is NULL until 8 filled predecessors exist, and the
    // // floor matches Spark's div on the non-negative operands
    "q72_ewma_hourly" ->
      """WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |             CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)
        |               AS vm
        |           FROM events),
        |hc AS (SELECT event_type, h,
        |         CAST(sum(vm) // count(*) AS BIGINT) AS mean_micro
        |       FROM e GROUP BY 1, 2),
        |axis AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |         FROM (SELECT min(h) AS lo, max(h) AS hi FROM hc)),
        |grid AS (SELECT t.event_type, axis.h, hc.mean_micro
        |         FROM axis
        |         CROSS JOIN (SELECT DISTINCT event_type FROM hc) t
        |         LEFT JOIN hc ON hc.event_type = t.event_type
        |           AND hc.h = axis.h),
        |f AS (SELECT event_type, h,
        |        last_value(mean_micro IGNORE NULLS) OVER (PARTITION BY
        |          event_type ORDER BY h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS filled
        |      FROM grid),
        |s AS (SELECT event_type, h,
        |        128 * lag(filled, 0) OVER w + 64 * lag(filled, 1) OVER w
        |      + 32 * lag(filled, 2) OVER w + 16 * lag(filled, 3) OVER w
        |      + 8 * lag(filled, 4) OVER w + 4 * lag(filled, 5) OVER w
        |      + 2 * lag(filled, 6) OVER w + lag(filled, 7) OVER w AS num
        |      FROM f
        |      WINDOW w AS (PARTITION BY event_type ORDER BY h))
        |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
        |  CAST(num // 255 AS BIGINT) AS ewma_micro
        |FROM s WHERE num IS NOT NULL""".stripMargin,

    // q16's exact break rule (gap > 30 min, (ms, event_id) total order),
    // one lead() in the (user, session) sub-partition, integer-ppm
    // row-conditional shares
    "q70_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms
        |           FROM events),
        |b AS (SELECT *, CASE WHEN pms IS NULL OR ms - pms > 1800000
        |                     THEN 1 ELSE 0 END AS brk
        |      FROM (SELECT *, lag(ms) OVER (PARTITION BY user_id
        |              ORDER BY ms, event_id) AS pms FROM e) t),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY ms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS session_id
        |      FROM b),
        |x AS (SELECT event_type AS from_type,
        |        lead(event_type) OVER (PARTITION BY user_id, session_id
        |          ORDER BY ms, event_id) AS to_type
        |      FROM s),
        |c AS (SELECT from_type, to_type, count(*) AS n_transitions
        |      FROM x WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  CAST(n_transitions * 1000000
        |    // (sum(n_transitions) OVER (PARTITION BY from_type))
        |    AS BIGINT) AS share_ppm
        |FROM c""".stripMargin,

    // same integer micros, same two-stage per-grain shape, same ISO
    // Monday weeks, long-equality reconciliation
    "q71_rollup_reconciliation" ->
      """WITH li AS (SELECT CAST(l_shipdate AS DATE) AS d,
        |    CAST(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS rev_micro
        |  FROM lineitem),
        |g AS (SELECT CAST(sum(rev_micro) AS BIGINT) AS grand FROM li),
        |dy AS (SELECT 'day' AS grain, count(*) AS n_buckets,
        |         CAST(sum(bt) AS BIGINT) AS total_micro
        |       FROM (SELECT d, CAST(sum(rev_micro) AS BIGINT) AS bt
        |             FROM li GROUP BY d) t),
        |wk AS (SELECT 'week', count(*),
        |         CAST(sum(bt) AS BIGINT)
        |       FROM (SELECT date_trunc('week', d) AS b,
        |               CAST(sum(rev_micro) AS BIGINT) AS bt
        |             FROM li GROUP BY 1) t),
        |mo AS (SELECT 'month', count(*),
        |         CAST(sum(bt) AS BIGINT)
        |       FROM (SELECT date_trunc('month', d) AS b,
        |               CAST(sum(rev_micro) AS BIGINT) AS bt
        |             FROM li GROUP BY 1) t),
        |yr AS (SELECT 'year', count(*),
        |         CAST(sum(bt) AS BIGINT)
        |       FROM (SELECT date_trunc('year', d) AS b,
        |               CAST(sum(rev_micro) AS BIGINT) AS bt
        |             FROM li GROUP BY 1) t),
        |u AS (SELECT * FROM dy UNION ALL SELECT * FROM wk
        |      UNION ALL SELECT * FROM mo UNION ALL SELECT * FROM yr)
        |SELECT grain, n_buckets, total_micro,
        |  CAST(total_micro = g.grand AS BIGINT) AS reconciles
        |FROM u, g""".stripMargin
  )
}
