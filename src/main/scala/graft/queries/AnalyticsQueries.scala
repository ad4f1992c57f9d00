package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Event/feature analytics extensions: ordered funnel conversion,
  * quantile feature binning, and dynamic partition pruning — the three
  * analysis shapes a corpus/telemetry pipeline runs constantly.
  */
object AnalyticsQueries {

  val all: Seq[QueryDef] = Seq(
    // ordered funnel: first-view → first-click-after-view →
    // first-purchase-after-click per user; one groupBy(user) with
    // conditional min aggregates — no window, no self-join, fully
    // partial-aggregating (the 100 TB funnel shape)
    QueryDef(
      "funnel_conversion",
      """WITH s AS (SELECT user_id,
        |  min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
        |  min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
        |  min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
        |FROM events GROUP BY user_id)
        |SELECT CASE
        |    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
        |      AND t_click > t_view AND t_purchase > t_click THEN 3
        |    WHEN t_view IS NOT NULL AND t_click IS NOT NULL AND t_click > t_view THEN 2
        |    WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS stage,
        |  count(*) AS n_users
        |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
      val tus = expr("ts div 1000")
      Tables.table(s, d, "events")
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "view", tus)).as("t_view"),
          min(when(col("event_type") === "click", tus)).as("t_click"),
          min(when(col("event_type") === "purchase", tus)).as("t_purchase"))
        .select(
          when(col("t_view").isNotNull && col("t_click").isNotNull &&
              col("t_purchase").isNotNull &&
              col("t_click") > col("t_view") && col("t_purchase") > col("t_click"), 3)
            .when(col("t_view").isNotNull && col("t_click").isNotNull &&
              col("t_click") > col("t_view"), 2)
            .when(col("t_view").isNotNull, 1)
            .otherwise(0).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
    },
    // quantile feature binning: percentile_disc boundaries (actual data
    // values — exact-deterministic on both engines, no interpolation)
    // broadcast against the fact rows; one pass + a 1-row broadcast
    QueryDef(
      "feature_binning",
      """WITH b AS (SELECT quantile_disc(o_totalprice, 0.25) AS q1,
        |  quantile_disc(o_totalprice, 0.5) AS q2,
        |  quantile_disc(o_totalprice, 0.75) AS q3 FROM orders)
        |SELECT 1 + CAST(o_totalprice > q1 AS INT) + CAST(o_totalprice > q2 AS INT)
        |    + CAST(o_totalprice > q3 AS INT) AS bin,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders, b GROUP BY 1""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
      val b = o.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)").as("q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("q2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)").as("q3"))
      o.join(broadcast(b), lit(true))
        .select((lit(1) + (col("o_totalprice") > col("q1")).cast("int")
          + (col("o_totalprice") > col("q2")).cast("int")
          + (col("o_totalprice") > col("q3")).cast("int")).as("bin"),
          col("o_totalprice"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    },
    // dynamic partition pruning: year-partitioned fact joined to a
    // selectively-filtered dim — Catalyst injects the dim's year set as
    // a runtime partition filter on the fact scan, so only 1997's
    // directories are read (plan-asserted in ScaleSpec); at 100 TB this
    // is the difference between scanning one partition and all of them
    QueryDef(
      "join_dpp",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE year(o_orderdate) IN (
        |  SELECT year(l_shipdate) FROM lineitem GROUP BY 1 HAVING min(l_orderkey) % 2 = 0)
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val tmp = Tables.scratchDir("graft_dpp_rt")
      Tables.table(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(tmp)
      val fact = s.read.parquet(tmp)
      // the dim's year set is AGGREGATE-derived (years whose min order
      // key is even) — deliberately not constant-foldable, so the
      // optimizer cannot turn it into a static partition filter and
      // must inject a DYNAMIC pruning subquery on the fact scan
      val dim = Tables.table(s, d, "lineitem")
        .groupBy(year(col("l_shipdate")).as("y"))
        .agg(min(col("l_orderkey")).as("mk"))
        .filter(col("mk") % 2 === 0)
        .select("y")
      fact.join(dim, fact("o_year") === dim("y"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    }
  )
}
