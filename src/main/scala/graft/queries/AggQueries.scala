package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Aggregation operators (extensions — the reference has NONE in the
  * query path, SURVEY §2.4; its only aggregation is driver-side benchmark
  * stats, JoinSimulation.java:34-70, which [[graft.stats]] mirrors).
  *
  * Oracle-parity design: double sums are accumulated as DECIMAL(_,2/4)
  * (exact, order-independent) and exported as doubles; averages are
  * double(decimal sum)/count so both engines perform the identical single
  * division. Partial (map-side) aggregation stays available to Spark
  * because everything is a plain `groupBy().agg` — at 100 TB these
  * aggregate mostly map-side and shuffle only one row per group.
  */
object AggQueries {

  private val dec = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(
    // TPC-H Q1-shaped scan-heavy aggregate: the canonical "does partial
    // aggregation + column pruning happen" probe.
    QueryDef(
      "agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },
    // exact distinct aggregation
    QueryDef(
      "agg_distinct",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    },
    // order statistics — the reference's mean/median/max task-time stats
    // (JoinSimulation.java:34-70) as a first-class grouped aggregate.
    // percentile (Spark) and quantile_cont (DuckDB) share the same
    // linear-interpolation definition; round(6) absorbs last-ulp noise.
    QueryDef(
      "agg_stats",
      """SELECT event_type, count(*) AS n,
        |  round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_v,
        |  round(quantile_cont(value, 0.5), 6) AS median_v
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.table(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(min(col("value")), 6).as("min_v"),
          round(max(col("value")), 6).as("max_v"),
          (sum(col("value").cast(dec)).cast("double") / count(lit(1))).as("mean_v"),
          round(percentile(col("value"), lit(0.5)), 6).as("median_v"))
    },
    // multi-dimensional aggregates: ROLLUP (extension; DuckDB-parity on
    // the NULL super-aggregate rows)
    QueryDef(
      "agg_rollup",
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
    },
    QueryDef(
      "agg_cube",
      """SELECT c_mktsegment, c_nationkey, count(*) AS n
        |FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
    },
    // explicit GROUPING SETS (not derivable from rollup/cube) with
    // grouping() markers to disambiguate real NULLs from super-
    // aggregate rows — the third multi-dimensional grouping surface
    QueryDef(
      "agg_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast("bigint").as("g_status"),
          grouping(col("o_orderpriority")).cast("bigint").as("g_priority"))
    },
    // join + aggregate: revenue per nation (classic star-schema shape —
    // broadcast dims, partial agg on the fact side)
    QueryDef(
      "agg_join_revenue",
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
      val c = Tables.table(s, d, "customer")
      val n = Tables.table(s, d, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
    },
    // approximate distinct (HLL sketch). The sketches differ across
    // engines, so the raw estimate can never hash-match — instead each
    // engine checks ITS OWN sketch against ITS OWN exact count and emits
    // the verdict. The projection is integer-only (approx*100 vs
    // exact*95/105), so the exported (group, n_exact, within_5pct) rows
    // are exact and hash-comparable; QueriesSpec keeps the tighter ±5%
    // numeric assertion on the Spark side.
    QueryDef(
      "agg_approx_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_exact,
        |  approx_count_distinct(l_orderkey) * 100
        |    BETWEEN count(DISTINCT l_orderkey) * 95 AND count(DISTINCT l_orderkey) * 105
        |    AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
        .select(
          col("l_returnflag"), col("n_exact"),
          (col("approx_orders") * 100)
            .between(col("n_exact") * 95, col("n_exact") * 105).as("within_5pct"))
    },
    // exact order statistics + deterministic mode. percentile_disc picks
    // an actual element (SQL-standard: first value with cume_dist >= p)
    // — exact cross-engine, unlike interpolating percentile_cont whose
    // double interpolation isn't bit-stable. Mode is tie-broken to the
    // SMALLEST value (both engines spell the tie-break explicitly;
    // builtin mode() is nondeterministic on ties in both).
    QueryDef(
      "agg_percentile_mode",
      """WITH f AS (SELECT l_returnflag, l_quantity FROM lineitem),
        |m AS (SELECT l_returnflag, l_quantity AS qty, count(*) AS c FROM f GROUP BY 1, 2),
        |md AS (SELECT l_returnflag, qty FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, qty) AS rn
        |  FROM m) WHERE rn = 1)
        |SELECT f.l_returnflag, quantile_disc(l_quantity, 0.5) AS p50,
        |  quantile_disc(l_quantity, 0.9) AS p90,
        |  min(md.qty) AS mode_qty, count(*) AS n
        |FROM f JOIN md ON md.l_returnflag = f.l_returnflag
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val f = Tables.table(s, d, "lineitem").select(col("l_returnflag"), col("l_quantity"))
      val mode = f.groupBy(col("l_returnflag"), col("l_quantity").as("qty"))
        .agg(count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(max_by(col("qty"), struct(col("c"), -col("qty"))).as("mode_qty"))
      f.join(broadcast(mode), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"),
          min(col("mode_qty")).as("mode_qty"),
          count(lit(1)).as("n"))
    },
    // sketch percentile with an in-engine accuracy envelope (same
    // pattern as agg_approx_distinct): the GK sketch's rank error at
    // accuracy 10000 is ≤ n/10000 ranks — far inside 1% of the exact
    // value here — so the exported boolean is deterministically true
    // and the oracle asserts the same envelope over the exact quantile
    QueryDef(
      "agg_approx_percentile",
      """SELECT l_returnflag,
        |  quantile_disc(l_extendedprice, 0.5) AS exact_p50,
        |  true AS within_1pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("exact_p50"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_p50"))
        .select(col("l_returnflag"), col("exact_p50"),
          (abs(col("approx_p50") - col("exact_p50")) <= col("exact_p50") * 0.01)
            .as("within_1pct"))
    },
    // exact distinct count under extreme key skew (3 keys ⇒ 3 final
    // reducers in the direct plan): two-phase value-hash bucketing
    // (operators.Aggregates) — identical result, bounded per-reducer
    // distinct sets
    QueryDef(
      "agg_distinct_salted",
      """SELECT l_returnflag AS k, count(DISTINCT l_orderkey) AS n_distinct
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, d) =>
      graft.operators.Aggregates.saltedDistinctCount(
        Tables.table(s, d, "lineitem"), col("l_returnflag"), col("l_orderkey"))
    },
    // exact WEIGHTED median (smallest x with cumweight(≤x) ≥ W/2):
    // the value domain pre-aggregates to |distinct quantities| rows per
    // group, so the cumulative window runs over a tiny table — never
    // the raw fact rows; weights accumulate in exact DECIMAL and the
    // half test cross-multiplies (cw·2 ≥ W), no division at all
    QueryDef(
      "agg_weighted_median",
      """WITH q AS (SELECT l_returnflag AS k, CAST(l_quantity AS BIGINT) AS x,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT k, x,
        |    sum(w) OVER (PARTITION BY k ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY k) AS tw
        |  FROM q)
        |SELECT k, min(x) AS wmedian FROM c WHERE cw * 2 >= tw GROUP BY k""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val q = Tables.table(s, d, "lineitem")
        .groupBy(col("l_returnflag").as("k"), col("l_quantity").cast("long").as("x"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("w"))
      val byK = Window.partitionBy(col("k"))
      val cum = byK.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      q.withColumn("cw", sum(col("w")).over(cum))
        .withColumn("tw", sum(col("w")).over(byK))
        .where(col("cw") * 2 >= col("tw"))
        .groupBy("k").agg(min(col("x")).as("wmedian"))
    },
    // skewness + excess kurtosis from EXACT raw power sums: v..v⁴
    // accumulate in explicitly-sized decimals (every product fits its
    // declared precision, so both engines sum the identical rationals;
    // the v₂² operand is pre-widened to DECIMAL(19,4) — 18-digit
    // decimal multiplication would otherwise overflow the narrow
    // engine path), then ONE conversion to double feeds the same
    // moment-formula expression tree in both engines. The builtin
    // skewness/kurtosis aggregates stream float partials whose
    // reduce order drifts — this shape is order-independent.
    QueryDef(
      "agg_moments",
      """WITH v AS (SELECT event_type, CAST(value AS DECIMAL(9,2)) AS v FROM events),
        |p AS (SELECT event_type, v, CAST(v * v AS DECIMAL(18,4)) AS v2 FROM v),
        |q AS (SELECT event_type, v, v2,
        |    CAST(v2 * v AS DECIMAL(27,6)) AS v3,
        |    CAST(CAST(v2 AS DECIMAL(19,4)) * v2 AS DECIMAL(36,8)) AS v4 FROM p),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    sum(v) AS s1, sum(v2) AS s2, sum(v3) AS s3, sum(v4) AS s4
        |  FROM q GROUP BY 1),
        |d AS (SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
        |    CAST(s3 AS DOUBLE) / n AS m3, CAST(s4 AS DOUBLE) / n AS m4
        |  FROM s)
        |SELECT event_type, n,
        |  round(m1, 6) AS mean,
        |  round(m2 - m1 * m1, 6) AS variance,
        |  round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / pow(m2 - m1 * m1, 1.5), 6) AS skewness,
        |  round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) / pow(m2 - m1 * m1, 2) - 3, 6) AS kurtosis_excess
        |FROM d""".stripMargin) { (s, d) =>
      val v = col("value").cast("decimal(9,2)")
      val base = Tables.table(s, d, "events")
        .select(col("event_type"), v.as("v"))
        .withColumn("v2", (col("v") * col("v")).cast("decimal(18,4)"))
        .withColumn("v3", (col("v2") * col("v")).cast("decimal(27,6)"))
        .withColumn("v4",
          (col("v2").cast("decimal(19,4)") * col("v2")).cast("decimal(36,8)"))
      val sums = base.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"), sum(col("v2")).as("s2"),
        sum(col("v3")).as("s3"), sum(col("v4")).as("s4"))
      val m = sums.select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n")).as("m1"),
        (col("s2").cast("double") / col("n")).as("m2"),
        (col("s3").cast("double") / col("n")).as("m3"),
        (col("s4").cast("double") / col("n")).as("m4"))
      m.select(col("event_type"), col("n"),
        round(col("m1"), 6).as("mean"),
        round(col("m2") - col("m1") * col("m1"), 6).as("variance"),
        round((col("m3") - lit(3) * col("m1") * col("m2")
            + lit(2) * col("m1") * col("m1") * col("m1"))
          / pow(col("m2") - col("m1") * col("m1"), 1.5), 6).as("skewness"),
        round((col("m4") - lit(4) * col("m1") * col("m3")
            + lit(6) * col("m1") * col("m1") * col("m2")
            - lit(3) * col("m1") * col("m1") * col("m1") * col("m1"))
          / pow(col("m2") - col("m1") * col("m1"), 2) - lit(3), 6)
          .as("kurtosis_excess"))
    }
  )
}
