package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The full TPC-H-shaped battery on the driver's reduced star schema.
  * Q1/Q3/Q5/Q9/Q10 live in AggQueries/AdvancedQueries. The schema has
  * no partsupp, no commit/receipt dates, no shipmode, so Q2/Q11/Q12/
  * Q16/Q20/Q21 cannot be reproduced literally — instead each is carried
  * as a `*-shaped` analogue that preserves the query's OPTIMIZER SHAPE
  * (the thing the engine must execute well at 100 TB) on the columns
  * that do exist: lineitem stands in for partsupp as the part↔supplier
  * bridge, l_returnflag='R' stands in for "receipt late" in q21.
  *
  * Each query targets one optimizer capability the engine must keep at
  * 100 TB: correlated per-group MIN decorrelated to agg + join-back
  * (q2), EXISTS decorrelation to a semi join (q4), full scan-level
  * predicate pushdown (q6), self-joined broadcast dims with a
  * disjunctive cross-dim filter (q7), conditional aggregation over an
  * 8-table join (q8), group-HAVING against a fraction of a global
  * scalar aggregate (q11), conditional bucket counts over a fact-fact
  * join (q12), outer-join-with-ON-filter + re-aggregation (q13),
  * two-sum ratio in one pass (q14), exact-decimal scalar-subquery max
  * (q15), distinct-count with a NOT-IN exclusion anti join (q16),
  * correlated per-group average threshold (q17), windowless
  * having-semi-join (q18), multi-range disjunctive join filter (q19),
  * nested agg→agg→semi→semi chain (q20), double-correlated
  * EXISTS/NOT-EXISTS with a non-equi correlation conjunct (q21),
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
    },
    // Q2-shaped min-cost supplier: the classic correlated scalar MIN
    // subquery (per part: "the supplier matching that part's minimum
    // price"), decorrelated into ONE part-keyed min aggregate joined
    // back on (part, exact-decimal price) — never a per-row re-scan.
    // lineitem is the part↔supplier bridge (no partsupp in this
    // schema); the region-filtered supplier dim broadcasts, and the
    // min-aggregate is part-key-sized so AQE may broadcast it too.
    // Ties (several suppliers hitting the min) are all returned, as in
    // TPC-H Q2; DISTINCT collapses multiple min-priced lineitems of
    // the same supplier.
    QueryDef(
      "q2_min_cost_supplier",
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  WHERE r_name = 'EUROPE'),
        |px AS (
        |  SELECT l_partkey AS pk, s_suppkey, s_name, s_acctbal, n_name,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN eu ON s_suppkey = l_suppkey),
        |mn AS (SELECT pk, min(price) AS min_price FROM px GROUP BY pk)
        |SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
        |FROM part
        |JOIN px ON px.pk = p_partkey
        |JOIN mn ON mn.pk = px.pk AND px.price = mn.min_price
        |WHERE p_size = 10""".stripMargin) { (s, d) =>
      val sup = Tables.table(s, d, "supplier")
      val n = Tables.table(s, d, "nation")
      val r = Tables.table(s, d, "region").filter(col("r_name") === "EUROPE")
      val eu = sup.join(broadcast(n), n("n_nationkey") === sup("s_nationkey"))
        .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
        .select(sup("s_suppkey"), sup("s_name"), sup("s_acctbal"), n("n_name"))
      val li = Tables.table(s, d, "lineitem")
      val px = li.join(broadcast(eu), col("s_suppkey") === li("l_suppkey"))
        .select(li("l_partkey").as("pk"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"),
          li("l_extendedprice").cast(dec).as("price"))
      val mn = px.groupBy(col("pk").as("m_pk"))
        .agg(min(col("price")).as("min_price"))
      val p = Tables.table(s, d, "part").filter(col("p_size") === 10)
      px.join(mn, col("m_pk") === col("pk") && col("price") === col("min_price"))
        .join(broadcast(p), p("p_partkey") === col("pk"))
        .select(p("p_partkey"), p("p_name"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"))
        .distinct()
    },
    // Q11-shaped important parts: per-part value restricted to one
    // nation's suppliers, kept when it exceeds a FRACTION of the global
    // scalar total over the same aggregate — the total is a 1-row
    // broadcast over the already-aggregated (part-key-sized) relation,
    // never over raw lineitem. val×1000 > total keeps the comparison in
    // exact decimal (no 0.001 float literal on either engine).
    QueryDef(
      "q11_important_parts",
      """WITH v AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS pval
        |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_13'
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS partkey, CAST(pval AS DOUBLE) AS value
        |FROM v WHERE pval * 1000 > (SELECT sum(pval) FROM v)""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val sup = Tables.table(s, d, "supplier")
      val nat = Tables.table(s, d, "nation").filter(col("n_name") === "NATION_13")
      val v = li
        .join(broadcast(sup), sup("s_suppkey") === li("l_suppkey"))
        .join(broadcast(nat), nat("n_nationkey") === sup("s_nationkey"))
        .groupBy(li("l_partkey"))
        .agg(sum(li("l_extendedprice").cast(dec)).as("pval"))
      val tot = v.agg(sum(col("pval")).as("tot"))
      v.join(broadcast(tot), col("pval") * 1000 > col("tot"))
        .select(col("l_partkey").as("partkey"),
          col("pval").cast("double").as("value"))
    },
    // Q12-shaped shipping-priority census: fact-fact equi join feeding
    // two conditional counts per group (l_linestatus stands in for
    // l_shipmode). count(CASE…) on both engines — BIGINT, never
    // DuckDB's HUGEINT sum.
    QueryDef(
      "q12_priority_class",
      """SELECT l_linestatus AS linestatus,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
      val o = Tables.table(s, d, "orders")
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(li("l_linestatus").as("linestatus"))
        .agg(
          count(when(urgent, 1)).as("high_line_count"),
          count(when(!urgent, 1)).as("low_line_count"))
    },
    // Q16-shaped supplier census: count(DISTINCT supplier) per part
    // descriptor, minus a NOT-IN exclusion list — the exclusion becomes
    // a broadcast ANTI join against the (tiny) flagged-supplier set; at
    // scale the distinct-count shuffles once on the (brand, type, size)
    // group key after partial aggregation.
    QueryDef(
      "q16_supplier_census",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#3' AND p_size IN (1, 10, 20, 25, 30, 40, 45, 50)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val excl = Tables.table(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("x_sk"))
      val p = Tables.table(s, d, "part")
        .filter(col("p_brand") =!= "Brand#3" &&
          col("p_size").isin(1, 10, 20, 25, 30, 40, 45, 50))
      li.join(broadcast(excl), col("x_sk") === li("l_suppkey"), "left_anti")
        .join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .groupBy(p("p_brand"), p("p_type"), p("p_size"))
        .agg(countDistinct(li("l_suppkey")).as("supplier_cnt"))
    },
    // Q20-shaped excess suppliers: the nested agg→agg→semi→semi chain —
    // per-(part,supplier) shipped quantity vs 30% of the part's total
    // (both exact decimal, compared via integer-scaled products), gated
    // to name-filtered parts, then the surviving supplier keys semi-join
    // the nation-filtered supplier dim. Both aggregates are
    // part-key-sized; raw lineitem is scanned ONCE.
    QueryDef(
      "q20_excess_suppliers",
      """WITH pq AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  GROUP BY 1, 2),
        |pt AS (SELECT pk, sum(sq) AS tq FROM pq GROUP BY pk),
        |cand AS (
        |  SELECT DISTINCT sk FROM pq
        |  JOIN pt USING (pk)
        |  JOIN part ON p_partkey = pk
        |  WHERE p_name LIKE 'red%' AND sq * 10 > tq * 3)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_2','NATION_7','NATION_12','NATION_17','NATION_22')
        |  AND s_suppkey IN (SELECT sk FROM cand)""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date"))
      val pq = li.groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .agg(sum(col("l_quantity").cast(dec)).as("sq"))
      val pt = pq.groupBy(col("pk").as("t_pk")).agg(sum(col("sq")).as("tq"))
      val pRed = Tables.table(s, d, "part")
        .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      val cand = pq.join(pt, col("t_pk") === col("pk"))
        .join(broadcast(pRed), col("p_partkey") === col("pk"), "left_semi")
        .filter(col("sq") * 10 > col("tq") * 3)
        .select(col("sk")).distinct()
      val asia = Tables.table(s, d, "nation").filter(col("n_name").isin(
        "NATION_2", "NATION_7", "NATION_12", "NATION_17", "NATION_22"))
      val sup = Tables.table(s, d, "supplier")
      sup.join(broadcast(asia), col("n_nationkey") === sup("s_nationkey"), "left_semi")
        .join(cand, col("sk") === sup("s_suppkey"), "left_semi")
        .select(sup("s_suppkey"), sup("s_name"))
    },
    // Q21-shaped waiting suppliers: the battery's hardest decorrelation
    // — per fact row, EXISTS a sibling from ANOTHER supplier in the
    // same order, and NOT EXISTS a returned sibling from another
    // supplier. Both correlations carry a NON-EQUI conjunct
    // (l2.suppkey <> l1.suppkey) on top of the orderkey equi-key, so
    // they plan as a semi + anti join pair with mixed predicates;
    // l_returnflag='R' stands in for TPC-H's receipt-after-commit
    // lateness. The nation-filtered supplier dim broadcasts FIRST so
    // the fact side is pruned before either correlation join.
    QueryDef(
      "q21_waiting_suppliers",
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND n_name = 'NATION_12'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name""".stripMargin) { (s, d) =>
      val l1 = Tables.table(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val o = Tables.table(s, d, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      // NATION_12 (not TPC-H's SAUDI ARABIA analogue slot) because it is
      // the nation with waiting suppliers at BOTH sf0.001 (smoke) and
      // sf0.01 (oracle gate) in the driver's fixtures
      val nat = Tables.table(s, d, "nation").filter(col("n_name") === "NATION_12")
      val sup = Tables.table(s, d, "supplier")
        .join(broadcast(nat), col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      // independent scans for the two correlations (same-Dataset reuse
      // would alias attributes across the self-joins)
      val l2 = Tables.table(s, d, "lineitem")
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val l3 = Tables.table(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      l1.join(broadcast(sup), col("s_suppkey") === l1("l_suppkey"))
        .join(o, o("o_orderkey") === l1("l_orderkey"), "left_semi")
        .join(l2, col("ok2") === l1("l_orderkey") &&
          col("sk2") =!= l1("l_suppkey"), "left_semi")
        .join(l3, col("ok3") === l1("l_orderkey") &&
          col("sk3") =!= l1("l_suppkey"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
    }
  )
}
