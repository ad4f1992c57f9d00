package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second window/set-operation batch: value-position window functions,
  * distribution ranks, bag semantics set-ops, pagination, and ordered
  * string aggregation — rounding out the analytic surface.
  */
object WindowSetQueries2 {

  val all: Seq[QueryDef] = Seq(
    // first/last/nth with explicit full frame (default frame would stop
    // at CURRENT ROW for last_value — classic trap, pinned explicitly)
    QueryDef(
      "window_value_position",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER w AS last_ok,
        |  nth_value(o_orderkey, 2) OVER w AS second_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.table(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        last(col("o_orderkey")).over(w).as("last_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
    },
    // distribution ranks — pure rank arithmetic, identical formulas
    QueryDef(
      "window_distribution",
      """SELECT c_custkey,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)""".stripMargin) { (s, d) =>
      val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.table(s, d, "customer").select(
        col("c_custkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
    },
    // bag (multiset) set operations — duplicates preserved
    QueryDef(
      "setop_except_all",
      """SELECT l_suppkey AS sk FROM lineitem WHERE l_linenumber = 1
        |EXCEPT ALL SELECT l_suppkey AS sk FROM lineitem WHERE l_linenumber = 2""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      li.filter(col("l_linenumber") === 1).select(col("l_suppkey").as("sk"))
        .exceptAll(li.filter(col("l_linenumber") === 2).select(col("l_suppkey").as("sk")))
    },
    QueryDef(
      "setop_intersect_all",
      """SELECT l_suppkey AS sk FROM lineitem WHERE l_linenumber = 1
        |INTERSECT ALL SELECT l_suppkey AS sk FROM lineitem WHERE l_linenumber = 2""".stripMargin) { (s, d) =>
      val li = Tables.table(s, d, "lineitem")
      li.filter(col("l_linenumber") === 1).select(col("l_suppkey").as("sk"))
        .intersectAll(li.filter(col("l_linenumber") === 2).select(col("l_suppkey").as("sk")))
    },
    // pagination under a total order
    QueryDef(
      "sort_limit_offset",
      """SELECT o_orderkey FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 100""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(100).limit(50)
        .select(col("o_orderkey"))
    },
    // ordered string aggregation
    QueryDef(
      "agg_string_concat",
      """SELECT c_nationkey, string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
        |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
        |GROUP BY c_nationkey""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer")
        .select(col("c_nationkey"), col("c_mktsegment")).distinct()
        .groupBy("c_nationkey")
        .agg(array_join(sort_array(collect_list(col("c_mktsegment"))), ",").as("segs"))
    }
  )
}
