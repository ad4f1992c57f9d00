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
      // argmax composition instead of a window: max of (time, -key) is a
      // lexicographic struct max — partial-aggregatable map-side, no
      // global sort of the pair set (the window form cost ~7 s at sf0.1;
      // the oracle's row_number spells the same latest-order-first,
      // smallest-key-tie-break semantics)
      e.join(o, o("o_custkey") === e("user_id") && o("ous") <= e("eus"))
        .groupBy(col("event_id"))
        .agg(max(struct(col("ous"), (-col("o_orderkey")).as("nok"))).as("m"))
        .select(col("event_id"), (-col("m.nok")).as("asof_orderkey"))
    }
  )
}
