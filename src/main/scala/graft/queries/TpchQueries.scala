package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The rest of the TPC-H-shaped battery expressible on the driver's
  * reduced star schema (no partsupp, no commit/receipt dates, no
  * shipmode — Q2/Q11/Q16/Q20/Q21 need those and are out of scope;
  * Q1/Q3/Q5/Q9/Q10 live in AggQueries/AdvancedQueries).
  *
  * Each query targets one optimizer capability the engine must keep at
  * 100 TB: EXISTS decorrelation to a semi join (q4), full scan-level
  * predicate pushdown (q6), self-joined broadcast dims with a
  * disjunctive cross-dim filter (q7), conditional aggregation over an
  * 8-table join (q8), outer-join-with-ON-filter + re-aggregation (q13),
  * two-sum ratio in one pass (q14), exact-decimal scalar-subquery max
  * (q15), correlated per-group average threshold (q17), windowless
  * having-semi-join (q18), multi-range disjunctive join filter (q19),
  * scalar-average gate + anti join (q22).
  *
  * All money arithmetic follows the module-wide decimal contract
  * (AggQueries): DECIMAL(18,2) exact accumulation, single final CAST to
  * DOUBLE on both engines.
  */
object TpchQueries {

  private val dec = "decimal(18,2)"
  private def disc(li: org.apache.spark.sql.DataFrame) =
    li("l_extendedprice").cast(dec) * (lit(1) - li("l_discount").cast(dec))

  val all: Seq[QueryDef] = Seq(
    // Q4-shaped: order-priority census of orders with >=1 returned line.
    // EXISTS decorrelates to a LEFT SEMI join; the returnflag filter is
    // pushed below it so the build side is the small survivor set.
    QueryDef(
      "q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
      val ret = Tables.table(s, d, "lineitem")
        .filter(col("l_returnflag") === "R").select(col("l_orderkey"))
      o.join(ret, o("o_orderkey") === ret("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    // Q6-shaped forecast-revenue: pure scan+filter+agg — the canonical
    // "does every predicate reach the parquet reader" probe; at scale
    // this is a single map-side pass with a 1-row shuffle.
    QueryDef(
      "q6_forecast_revenue",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum(col("l_extendedprice").cast(dec) * col("l_discount").cast(dec))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    },
    // Q7-shaped volume shipping: nation joined TWICE (supplier side +
    // customer side) with a symmetric two-nation disjunction that can
    // only be evaluated above both joins — both dim copies broadcast,
    // the fact chain shuffles once per equi-key.
    QueryDef(
      "q7_volume_shipping",
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = s_nationkey
        |JOIN nation n2 ON n2.n_nationkey = c_nationkey
        |WHERE ((n1.n_name = 'NATION_13' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_13'))
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val sup = Tables.table(s, d, "supplier")
      val o = Tables.table(s, d, "orders")
      val c = Tables.table(s, d, "customer")
      // two independent scans of nation: each side of the pair filter
      // needs its own join; pre-filtering each copy to the two named
      // nations keeps the broadcast minimal and lets the disjunction
      // above prune the asymmetric combinations
      // this pair has traffic in BOTH directions at every sf (incl. the
      // sf0.001 smoke slice — NATION_1/2 were empty there)
      val pair = Seq("NATION_13", "NATION_19")
      val n1 = Tables.table(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.table(s, d, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      li.join(broadcast(sup), sup("s_suppkey") === li("l_suppkey"))
        .join(o, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .join(broadcast(n1), col("n1_key") === sup("s_nationkey"))
        .join(broadcast(n2), col("n2_key") === c("c_nationkey"))
        .filter((col("supp_nation") === "NATION_13" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_13"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(li("l_shipdate")).as("l_year"))
        .agg(sum(disc(li)).cast("double").as("revenue"), count(lit(1)).as("n"))
    },
    // Q8-shaped market share: the widest join in the battery (7 tables,
    // nation twice) feeding a conditional-sum ratio; both sums accumulate
    // exact decimal in ONE aggregation pass, the division happens once on
    // the final 7 rows.
    QueryDef(
      "q8_market_share",
      """SELECT year(o_orderdate) AS o_year,
        |  CAST(sum(CASE WHEN n2.n_name = 'NATION_5' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation n1 ON n1.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n1.n_regionkey
        |JOIN nation n2 ON n2.n_nationkey = s_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val p = Tables.table(s, d, "part").filter(col("p_type") === "ECONOMY")
      val sup = Tables.table(s, d, "supplier")
      val o = Tables.table(s, d, "orders")
      val c = Tables.table(s, d, "customer")
      val n1 = Tables.table(s, d, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_rk"))
      val r = Tables.table(s, d, "region").filter(col("r_name") === "ASIA")
      val n2 = Tables.table(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_name"))
      li.join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .join(broadcast(sup), sup("s_suppkey") === li("l_suppkey"))
        .join(o, o("o_orderkey") === li("l_orderkey"))
        .join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .join(broadcast(n1), col("n1_key") === c("c_nationkey"))
        .join(broadcast(r), r("r_regionkey") === col("n1_rk"))
        .join(broadcast(n2), col("n2_key") === sup("s_nationkey"))
        .groupBy(year(o("o_orderdate")).as("o_year"))
        .agg((sum(when(col("supp_name") === "NATION_5", disc(li))
            .otherwise(lit(0).cast(dec))).cast("double")
          / sum(disc(li)).cast("double")).as("mkt_share"))
    },
    // Q13-shaped customer distribution: LEFT OUTER with the extra
    // predicate in the JOIN condition (not WHERE — null-extended rows
    // must survive), then a re-aggregation of the per-customer counts.
    QueryDef(
      "q13_customer_distribution",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer")
      val o = Tables.table(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    // Q14-shaped promo revenue: two-sum ratio computed in a single
    // aggregation pass (no self-join, no second scan).
    QueryDef(
      "q14_promo_revenue",
      """SELECT CAST(100 AS DOUBLE) * CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
      val p = Tables.table(s, d, "part")
      li.join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .agg(
          (lit(100.0) * sum(when(p("p_type") === "PROMO", disc(li))
              .otherwise(lit(0).cast(dec))).cast("double")
            / sum(disc(li)).cast("double")).as("promo_revenue"),
          count(lit(1)).as("n"))
    },
    // Q15-shaped top supplier: the quarter's per-supplier revenue kept
    // in EXACT decimal so the scalar-subquery max comparison is
    // bit-reliable (a double max would make the winning row
    // platform-dependent); double only on output.
    QueryDef(
      "q15_top_supplier",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
      val rev = li.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(disc(li)).as("total_rev"))
      val top = rev.agg(max(col("total_rev")).as("max_rev"))
      val sup = Tables.table(s, d, "supplier")
      rev.join(broadcast(top), col("total_rev") === col("max_rev"))
        .join(broadcast(sup), sup("s_suppkey") === col("supplier_no"))
        .select(sup("s_suppkey"), sup("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    },
    // Q17-shaped small-quantity orders: correlated per-part average
    // threshold — decorrelated into ONE per-part aggregate joined back
    // on the part key (never a per-row re-scan).
    QueryDef(
      "q17_small_quantity",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#1'
        |AND l_quantity < 0.2 * (SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val p = Tables.table(s, d, "part").filter(col("p_brand") === "Brand#1")
      // per-part mean quantity, decimal-exact sum / count — the
      // decorrelated form of the scalar subquery (one aggregate, one
      // equi-join; part-key-sized, so Catalyst may broadcast it)
      val thr = li.groupBy(col("l_partkey").as("t_pk"))
        .agg((sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"))
      li.join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .join(thr, col("t_pk") === li("l_partkey"))
        .filter(li("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          (sum(li("l_extendedprice").cast(dec)).cast("double") / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n"))
    },
    // Q18-shaped large-volume customers: HAVING-filtered aggregate used
    // as a semi-join gate, then the full detail re-aggregated. The gate
    // output is orderkey-sized-after-filter (tiny), so it broadcasts.
    QueryDef(
      "q18_large_volume",
      """SELECT c_name, c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      // independent scan for the gate: reusing `li` would be a
      // self-join on the same Dataset instance (ambiguous attributes)
      val big = Tables.table(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("big_ok"))
        .agg(sum(col("l_quantity").cast(dec)).as("oq"))
        .filter(col("oq") > 250).select(col("big_ok"))
      val o = Tables.table(s, d, "orders")
      val c = Tables.table(s, d, "customer")
      o.join(big, o("o_orderkey") === col("big_ok"), "left_semi")
        .join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .groupBy(c("c_name"), c("c_custkey"), o("o_orderkey"), o("o_totalprice"))
        .agg(sum(li("l_quantity").cast(dec)).cast("double").as("sum_qty"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
    },
    // Q19-shaped disjunctive brand/size/quantity predicate: three
    // band-specific conjunctions OR'd across the join — Catalyst splits
    // the common p_partkey equi-key out and keeps the disjunction as a
    // post-join filter; the brand IN-superset is pushed to the part scan.
    QueryDef(
      "q19_disjunctive_brand",
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val p = Tables.table(s, d, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
      li.join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .filter(
          (p("p_brand") === "Brand#1" && p("p_size").between(1, 15) &&
            li("l_quantity").between(1, 11)) ||
          (p("p_brand") === "Brand#2" && p("p_size").between(1, 25) &&
            li("l_quantity").between(10, 20)) ||
          (p("p_brand") === "Brand#3" && p("p_size").between(1, 35) &&
            li("l_quantity").between(20, 30)))
        .agg(sum(disc(li)).cast("double").as("revenue"), count(lit(1)).as("n"))
    },
    // Q22-shaped dormant wealthy customers: global-average scalar gate
    // (1-row broadcast) + anti join against recent orders, per-segment
    // rollup. The anti join's build side is date-pruned first.
    QueryDef(
      "q22_dormant_customers",
      """SELECT c_mktsegment AS segment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer c2 WHERE c2.c_acctbal > 0)
        |AND NOT EXISTS (SELECT 1 FROM orders
        |                WHERE o_custkey = c_custkey AND o_orderdate >= DATE '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast(dec)).cast("double") / count(lit(1))).as("avg_bal"))
      val recent = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("date"))
        .select(col("o_custkey"))
      c.join(broadcast(avgBal), c("c_acctbal") > col("avg_bal"))
        .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(dec)).cast("double").as("totacctbal"))
    }
  )
}
