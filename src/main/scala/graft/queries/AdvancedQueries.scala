package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced relational surface: multi-join analytics, subqueries, JSON
  * extraction, pivot, null-safe equality, and an as-of join (the classic
  * event-time operator Spark lacks as a builtin — composed here from an
  * inequality join + per-key rank, the (a)-tier strategy from the
  * build guidance: compose existing ops when semantics allow).
  */
object AdvancedQueries {

  private val dec = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(
    // TPC-H Q3-shaped 3-way join + filter + agg + deterministic top-k
    QueryDef(
      "q3_shipping_priority",
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.table(s, d, "orders")
      val li = Tables.table(s, d, "lineitem")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderkey"))
        .agg(
          sum(li("l_extendedprice").cast(dec) * (lit(1) - li("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },
    // TPC-H Q5-shaped SIX-way join: two broadcastable dims (region,
    // nation) + the local-supplier equi-chain across customer/orders/
    // lineitem/supplier — the canonical join-order + multi-broadcast
    // probe (Catalyst pushes the region filter through nation, and the
    // fact chain shuffles only on its join keys)
    QueryDef(
      "q5_local_supplier",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer")
      val o = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1997-01-01").cast("date"))
      val li = Tables.table(s, d, "lineitem")
      val sup = Tables.table(s, d, "supplier")
      val n = Tables.table(s, d, "nation")
      val r = Tables.table(s, d, "region").filter(col("r_name") === "ASIA")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(li, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup),
          li("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(n("n_name"))
        .agg(
          sum(li("l_extendedprice").cast(dec) * (lit(1) - li("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    // TPC-H Q9-shaped product-type profit: part-filtered lineitem fact
    // chain to (nation, year) — the classic join-order probe with a
    // LIKE-filtered dim (part is filtered BEFORE the join, so Catalyst
    // broadcasts the 13% survivor set and the fact chain shuffles only
    // on l_orderkey); profit accumulates in exact decimal
    QueryDef(
      "q9_product_profit",
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE p_name LIKE '%re%'
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      val p = Tables.table(s, d, "part").filter(col("p_name").like("%re%"))
      val sup = Tables.table(s, d, "supplier")
      val o = Tables.table(s, d, "orders")
      val n = Tables.table(s, d, "nation")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation"), year(o("o_orderdate")).as("o_year"))
        .agg(
          sum(li("l_extendedprice").cast(dec) * (lit(1) - li("l_discount").cast(dec)))
            .cast("double").as("profit"),
          count(lit(1)).as("n_lines"))
    },
    // TPC-H Q10-shaped returned-item report: date-windowed orders ⋈
    // returnflag-filtered lineitem ⋈ customer ⋈ broadcast nation, wide
    // GROUP BY, deterministic top-20 (TakeOrderedAndProject — no global
    // sort at scale)
    QueryDef(
      "q10_returned_items",
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  round(c_acctbal, 2) AS acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer")
      val o = Tables.table(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-04-01").cast("date"))
      val li = Tables.table(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables.table(s, d, "nation")
      o.join(li, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_acctbal"), n("n_name"))
        .agg(sum(li("l_extendedprice").cast(dec) * (lit(1) - li("l_discount").cast(dec)))
          .cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    // correlated LATERAL subquery with per-group ORDER BY + LIMIT — the
    // SQL surface for top-n-per-group; Catalyst decorrelates it (there
    // is no per-nation re-execution: the inner query becomes a single
    // distributed rank-limit over customer)
    QueryDef(
      "join_lateral_topn",
      """SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal
        |FROM nation, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin) { (s, d) =>
      graft.Graft.registerViews(s, d)
      s.sql(
        """SELECT n_name, c_name, round(c_acctbal, 2) AS acctbal
          |FROM nation, LATERAL (
          |  SELECT c_name, c_acctbal FROM customer
          |  WHERE c_nationkey = n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
    },
    // correlated scalar subquery: customers above their nation's mean
    QueryDef(
      "subquery_above_nation_avg",
      """SELECT c_custkey FROM customer c
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, d) =>
      val c = Tables.table(s, d, "customer")
      val means = c.groupBy(col("c_nationkey").as("nk"))
        .agg((sum(col("c_acctbal").cast(dec)).cast("double") / count(lit(1))).as("mean_bal"))
      c.join(broadcast(means), c("c_nationkey") === means("nk"))
        .filter(c("c_acctbal") > col("mean_bal"))
        .select(c("c_custkey"))
    },
    // IN-subquery + HAVING
    QueryDef(
      "subquery_in_having",
      """SELECT o_custkey, count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |GROUP BY o_custkey HAVING count(*) > 10""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
      val rich = Tables.table(s, d, "customer")
        .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 10)
    },
    // JSON extraction from the events props column
    QueryDef(
      "json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin) { (s, d) =>
      Tables.table(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    },
    // pivot/crosstab: per-user counts per event type (fixed column set —
    // deterministic schema, expressed as conditional aggregation in SQL)
    QueryDef(
      "pivot_event_counts",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Tables.table(s, d, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },
    // null-safe equality join (<=> / IS NOT DISTINCT FROM)
    QueryDef(
      "join_null_safe",
      """WITH l AS (SELECT o_orderkey, CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |    ELSE o_orderkey % 5 END AS grp FROM orders),
        |r AS (SELECT i AS grp FROM range(5) t(i) UNION ALL SELECT NULL)
        |SELECT l.o_orderkey, l.grp FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp""".stripMargin) { (s, d) =>
      val l = Tables.table(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_orderkey") % 5).as("grp"))
      val r = s.range(5).select(col("id").as("rgrp"))
        .union(s.range(1).select(lit(null).cast("long").as("rgrp")))
      l.join(r, l("grp") <=> r("rgrp"))
        .select(col("o_orderkey"), col("grp"))
    },
    // as-of join: for each event, the user's most recent order at or
    // before the event time — inequality join + per-row rank (Spark has
    // no builtin as-of; composition is the (a)-tier strategy)
    QueryDef(
      "join_asof",
      """WITH pairs AS (
        |  SELECT e.event_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts))
        |SELECT event_id, o_orderkey AS asof_orderkey FROM pairs WHERE rn = 1""".stripMargin) { (s, d) =>
      val e = Tables.table(s, d, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("eus"))
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          // o_orderdate is TIMESTAMP_NTZ; under the UTC session the cast
          // is wall-clock identity, matching DuckDB's epoch_us
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      // union-merge as-of: interleave both streams sorted by (user,
      // time), carry the latest order forward with last(... ignoreNulls)
      // — ONE shuffle by user + ONE per-partition sort, and never a
      // (event × earlier-order) pair set. The round-1 inequality-join +
      // argmax form materialized every such pair before aggregating:
      // quadratic per user history at 100×. Sort keys encode the oracle
      // semantics exactly: kind 0 < 1 puts same-instant orders before
      // events (ous <= eus is inclusive), okey DESC within a tied
      // instant makes the SMALLEST orderkey the one carried forward
      // (the oracle's row_number tie-break).
      val stream = o.select(col("o_custkey").as("uid"), col("ous").as("t"),
          lit(0).as("kind"), col("o_orderkey").as("okey"),
          lit(null).cast("long").as("event_id"))
        .unionByName(e.select(col("user_id").as("uid"), col("eus").as("t"),
          lit(1).as("kind"), lit(null).cast("long").as("okey"), col("event_id")))
      val w = Window.partitionBy(col("uid"))
        .orderBy(col("t"), col("kind"), col("okey").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stream.withColumn("asof", last(col("okey"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("asof").isNotNull)
        .select(col("event_id"), col("asof").as("asof_orderkey"))
    },
    // as-of with a STALENESS TOLERANCE (feature-store TTL semantics):
    // the most recent order within the trailing 7 days of each event,
    // LEFT — every event emits, null when the carried match is older
    // than the window (or absent). Same union-merge dataflow as
    // join_asof with the matched TIME carried alongside the key (the
    // two `last`s pick from the same row, so the pair is consistent);
    // the tolerance is a post-filter on the carried time, never a
    // third join predicate — the pair set stays linear
    QueryDef(
      "join_asof_tolerance",
      """WITH pairs AS (
        |  SELECT e.event_id, o.o_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
        |    AND epoch_us(o.o_orderdate) >= epoch_us(e.ts) - 604800000000)
        |SELECT e.event_id, p.o_orderkey AS asof_orderkey
        |FROM events e LEFT JOIN (SELECT event_id, o_orderkey FROM pairs WHERE rn = 1) p
        |  USING (event_id)""".stripMargin) { (s, d) =>
      val tolUs = 604800000000L // 7 days
      val e = Tables.table(s, d, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("eus"))
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      val stream = o.select(col("o_custkey").as("uid"), col("ous").as("t"),
          lit(0).as("kind"), col("o_orderkey").as("okey"),
          lit(null).cast("long").as("event_id"))
        .unionByName(e.select(col("user_id").as("uid"), col("eus").as("t"),
          lit(1).as("kind"), lit(null).cast("long").as("okey"), col("event_id")))
      val w = Window.partitionBy(col("uid"))
        .orderBy(col("t"), col("kind"), col("okey").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stream
        .withColumn("asof", last(col("okey"), ignoreNulls = true).over(w))
        .withColumn("asof_t",
          last(when(col("kind") === 0, col("t")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"),
          when(col("asof_t") >= col("t") - tolUs, col("asof"))
            .as("asof_orderkey"))
    },
    // FORWARD as-of: for each ORDER, the customer's EARLIEST event at
    // or after the order date ("next session after purchase") — the
    // same union-merge, scanned in descending time order so the
    // carried-forward row is always the nearest future one. Same
    // single-shuffle/no-pair-set shape as the backward form; kind 0
    // before 1 at a tied instant keeps >= inclusive, event_id DESC
    // makes the smallest event win the same-instant tie
    QueryDef(
      "join_asof_forward",
      """WITH pairs AS (
        |  SELECT o.o_orderkey, e.event_id,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY epoch_us(e.ts) ASC, e.event_id) AS rn
        |  FROM orders o JOIN events e
        |    ON e.user_id = o.o_custkey AND epoch_us(e.ts) >= epoch_us(o.o_orderdate))
        |SELECT o_orderkey, event_id AS next_event_id FROM pairs WHERE rn = 1""".stripMargin) { (s, d) =>
      val e = Tables.table(s, d, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("eus"))
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      val stream = e.select(col("user_id").as("uid"), col("eus").as("t"),
          lit(0).as("kind"), col("event_id").as("ekey"),
          lit(null).cast("long").as("o_orderkey"))
        .unionByName(o.select(col("o_custkey").as("uid"), col("ous").as("t"),
          lit(1).as("kind"), lit(null).cast("long").as("ekey"), col("o_orderkey")))
      val w = Window.partitionBy(col("uid"))
        .orderBy(col("t").desc, col("kind"), col("ekey").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      stream.withColumn("nxt", last(col("ekey"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("nxt").isNotNull)
        .select(col("o_orderkey"), col("nxt").as("next_event_id"))
    },
    // nearest-in-time as-of (either direction): per order, the user's
    // event minimizing |Δt|, ties → backward side then smallest
    // event_id. TWO window passes over ONE union-merge stream (the
    // exchange by user is shared; only the sort differs) — still no
    // (order × event) pair set, unlike the oracle's all-pairs argmin.
    QueryDef(
      "join_asof_nearest",
      """WITH pairs AS (
        |  SELECT o.o_orderkey, e.event_id,
        |    epoch_us(e.ts) - epoch_us(o.o_orderdate) AS dt,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)),
        |        CASE WHEN epoch_us(e.ts) <= epoch_us(o.o_orderdate) THEN 0 ELSE 1 END,
        |        e.event_id) AS rn
        |  FROM orders o JOIN events e ON e.user_id = o.o_custkey)
        |SELECT o_orderkey, event_id AS nearest_event_id, dt AS dt_us
        |FROM pairs WHERE rn = 1""".stripMargin) { (s, d) =>
      val e = Tables.table(s, d, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("eus"))
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ous"))
      graft.operators.Joins.asofNearest(
          o, col("o_orderkey"), col("o_custkey"), col("ous"),
          e, col("event_id"), col("user_id"), col("eus"))
        .select(col("probe_id").as("o_orderkey"),
          col("nearest_id").as("nearest_event_id"),
          col("dt").as("dt_us"))
    }
  )
}
