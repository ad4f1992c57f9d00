package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.5: the reference's entire scalar
  * vocabulary is split/cast/concat — P1/P2 projections — plus whatever a
  * complete engine needs: string/date/math batteries) and set operations
  * (absent from the reference; Spark natives exposed as extensions).
  */
object ScalarSetQueries {

  val all: Seq[QueryDef] = Seq(
    // P1/P2 key-extraction projection (KeyExtractor.java:12-26): build
    // the reference's CSV line shape, split it, extract by index, cast.
    // DuckDB lists are 1-based, Spark getItem is 0-based — indices align
    // accordingly.
    QueryDef(
      "proj_extract_key",
      """WITH lines AS (
        |  SELECT concat_ws(',', c_custkey, c_nationkey, c_mktsegment) AS line FROM customer)
        |SELECT CAST(string_split(line, ',')[1] AS BIGINT) AS key,
        |  string_split(line, ',')[3] AS attr, line AS value
        |FROM lines""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer")
        .select(concat_ws(",", col("c_custkey"), col("c_nationkey"), col("c_mktsegment")).as("line"))
        .select(
          split(col("line"), ",").getItem(0).cast("long").as("key"),
          split(col("line"), ",").getItem(2).as("attr"),
          col("line").as("value"))
    },
    // string battery
    QueryDef(
      "func_string",
      """SELECT p_partkey, upper(p_brand) AS ubrand, lower(p_type) AS ltype,
        |  length(p_name) AS name_len, substr(p_name, 1, 8) AS name_pfx,
        |  replace(p_type, ' ', '_') AS type_us,
        |  concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
        |  trim(p_name) AS name_trim, reverse(p_brand) AS brand_rev,
        |  contains(p_type, 'BRASS') AS has_brass
        |FROM part""".stripMargin) { (s, d) =>
      Tables.table(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("ubrand"),
        lower(col("p_type")).as("ltype"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_pfx"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        concat(col("p_brand"), lit(":"), col("p_size").cast("string")).as("brand_size"),
        trim(col("p_name")).as("name_trim"),
        reverse(col("p_brand")).as("brand_rev"),
        col("p_type").contains("BRASS").as("has_brass"))
    },
    // date/time battery over the millis-timestamp column
    QueryDef(
      "func_date",
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
        |  datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"))
    },
    // math battery — IEEE-exact ops unrounded; libm-backed ops round(6)
    QueryDef(
      "func_math",
      """SELECT s_suppkey, abs(s_acctbal) AS abal, round(sqrt(abs(s_acctbal)), 6) AS sq,
        |  round(ln(abs(s_acctbal) + 1), 6) AS lg, s_acctbal * s_acctbal AS sqr,
        |  CAST(floor(s_acctbal) AS BIGINT) AS fl, CAST(ceil(s_acctbal) AS BIGINT) AS ce,
        |  CAST(s_suppkey % 7 AS BIGINT) AS m7
        |FROM supplier""".stripMargin) { (s, d) =>
      Tables.table(s, d, "supplier").select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("abal"),
        round(sqrt(abs(col("s_acctbal"))), 6).as("sq"),
        round(log(abs(col("s_acctbal")) + 1), 6).as("lg"),
        (col("s_acctbal") * col("s_acctbal")).as("sqr"),
        floor(col("s_acctbal")).as("fl"),
        ceil(col("s_acctbal")).as("ce"),
        (col("s_suppkey") % 7).cast("long").as("m7"))
    },
    // conditional / null-handling battery
    QueryDef(
      "func_case_null",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |  (c_acctbal IS NULL) AS is_null_bal
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("rich").as("band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        col("c_acctbal").isNull.as("is_null_bal"))
    },
    // set operations (extensions; SURVEY §2.5 — none in the reference)
    QueryDef(
      "setop_union",
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(Tables.table(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct()
    },
    QueryDef(
      "setop_intersect",
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(Tables.table(s, d, "supplier").select(col("s_nationkey").as("nk")))
    },
    QueryDef(
      "setop_except",
      """SELECT n_nationkey AS nk FROM nation
        |EXCEPT SELECT s_nationkey AS nk FROM supplier""".stripMargin) { (s, d) =>
      Tables.table(s, d, "nation").select(col("n_nationkey").as("nk"))
        .except(Tables.table(s, d, "supplier").select(col("s_nationkey").as("nk")))
    },
    // filter pushdown probe: predicate + projection that must reach the
    // parquet scan (asserted in PlanSpec)
    QueryDef(
      "filter_pushdown",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_quantity > 45 AND l_returnflag = 'R'""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"))
    },
    // native unpivot (melt) — the wide→long reshape, Dataset.unpivot:
    // three measure columns to (measure, value) rows aggregated per
    // measure with exact decimal totals
    QueryDef(
      "unpivot_measures",
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
        |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem)
        |SELECT measure, count(*) AS n, CAST(sum(v) AS DOUBLE) AS total
        |FROM m GROUP BY measure""".stripMargin) { (s, d) =>
      Tables.table(s, d, "lineitem")
        .select(col("l_orderkey"),
          col("l_quantity").cast("decimal(18,2)").as("l_quantity"),
          col("l_extendedprice").cast("decimal(18,2)").as("l_extendedprice"),
          col("l_discount").cast("decimal(18,2)").as("l_discount"))
        .unpivot(Array(col("l_orderkey")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "v")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("total"))
    }
  )
}
