package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Array aggregation, exact second-moment statistics, and string
  * distance — completing the scalar/aggregate surface.
  *
  * Variance/correlation note: streaming `var_samp`/`corr` accumulate
  * doubles in partition order (non-reproducible across engines), so
  * these compute the closed forms from DECIMAL-exact power sums — the
  * double arithmetic on top is a fixed sequence of ops, bit-identical
  * cross-engine.
  */
object ArrayStatQueries {

  private val dec = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(
    // array aggregation with deterministic order + element ops.
    // Array-valued columns are projected through array_join /
    // array_to_string: the driver's pandas comparator cannot sort or
    // hash raw ARRAY columns (numpy.ndarray is unhashable — the round-1
    // red), and a CSV rendering of a deterministically-sorted list
    // carries the same information. `size()` is cast to BIGINT to match
    // DuckDB's len().
    QueryDef(
      "array_functions",
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS okeys_csv,
        |  len(list(o_orderkey ORDER BY o_orderkey)) AS n_orders,
        |  list(o_orderkey ORDER BY o_orderkey)[1] AS first_key,
        |  list_contains(list(o_orderkey ORDER BY o_orderkey), o_custkey * 4) AS has_x4,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey)[1:3], ',') AS first3_csv
        |FROM orders GROUP BY o_custkey""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders")
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(col("o_orderkey"))).as("okeys"))
        .select(
          col("o_custkey"),
          array_join(expr("transform(okeys, x -> cast(x AS string))"), ",").as("okeys_csv"),
          size(col("okeys")).cast("bigint").as("n_orders"),
          element_at(col("okeys"), 1).as("first_key"),
          array_contains(col("okeys"), col("o_custkey") * 4).as("has_x4"),
          array_join(expr("transform(slice(okeys, 1, 3), x -> cast(x AS string))"), ",")
            .as("first3_csv"))
    },
    // exact-decimal variance / stddev / correlation
    QueryDef(
      "agg_variance_corr",
      """WITH s AS (SELECT l_returnflag,
        |    count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS std_qty,
        |  round((sxy - sx * sy / n) /
        |        (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
        |FROM s""".stripMargin) { (s, d) =>
      val q = col("l_quantity").cast(dec)
      val p = col("l_extendedprice").cast(dec)
      val base = Tables.table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sxx"),
          sum(p).cast("double").as("sy"),
          sum(p * p).cast("double").as("syy"),
          sum(q * p).cast("double").as("sxy"))
      base.select(
        col("l_returnflag"), col("n"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 6).as("var_qty"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6).as("std_qty"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
    },
    // MAP-typed columns: build lang→count maps per source
    // (map_from_entries over grouped structs), then read them back out
    // through explode — the map round-trip IS the operator under test;
    // the exploded output is plain columns so the driver's comparator
    // can hash it (same rationale as array_functions' CSV rendering).
    // Map iteration order = collect order (nondeterministic), but the
    // exploded ROW SET is order-free and keys are unique per group.
    QueryDef(
      "func_map",
      """SELECT source, lang, count(*) AS n
        |FROM documents GROUP BY source, lang""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(map_from_entries(collect_list(struct(col("lang"), col("n")))).as("m"))
        .select(col("source"), explode(col("m")).as(Seq("lang", "n")))
    },
    // higher-order array functions: filter/exists/forall/aggregate/
    // zip_with/transform over the tokenized part name — every lambda
    // shape Spark offers, each reproduced by DuckDB's list lambdas.
    // Counts/sums surface as BIGINT on both engines (list_sum returns
    // HUGEINT in DuckDB, aggregate's accumulator is a long here).
    QueryDef(
      "func_higher_order",
      """WITH w AS (SELECT p_partkey, str_split(p_name, ' ') AS ws FROM part)
        |SELECT p_partkey,
        |  CAST(len(list_filter(ws, w -> length(w) > 5)) AS BIGINT) AS n_long,
        |  (len(list_filter(ws, w -> NOT regexp_matches(w, '^[a-z]+$'))) = 0) AS all_alpha,
        |  (len(list_filter(ws, w -> starts_with(w, 'b'))) > 0) AS any_b,
        |  CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS total_len,
        |  CAST(list_sum(list_transform(range(1, len(ws) + 1), i -> i * length(ws[i]))) AS BIGINT) AS idx_weighted,
        |  array_to_string(list_transform(ws, w -> upper(w)), '_') AS caps
        |FROM w""".stripMargin) { (s, d) =>
      val ws = split(col("p_name"), " ")
      Tables.table(s, d, "part").select(
        col("p_partkey"),
        size(filter(ws, w => length(w) > 5)).cast("long").as("n_long"),
        forall(ws, w => w.rlike("^[a-z]+$")).as("all_alpha"),
        exists(ws, w => w.startsWith("b")).as("any_b"),
        aggregate(ws, lit(0L), (a, w) => a + length(w)).as("total_len"),
        aggregate(
          zip_with(ws, sequence(lit(1), size(ws)), (w, i) => (i * length(w)).cast("long")),
          lit(0L), (a, x) => a + x).as("idx_weighted"),
        concat_ws("_", transform(ws, w => upper(w))).as("caps"))
    },
    // higher-order MAP functions: map_from_arrays → transform_values →
    // map_filter → explode back to plain columns (same hashability
    // rationale as func_map). Keys deduplicated first — Spark throws on
    // duplicate map keys by design.
    QueryDef(
      "func_map_hof",
      """WITH w AS (SELECT p_partkey, unnest(list_distinct(str_split(p_name, ' '))) AS word
        |  FROM part)
        |SELECT p_partkey, word, CAST(2 * length(word) AS BIGINT) AS dlen
        |FROM w WHERE 2 * length(word) > 8""".stripMargin) { (s, d) =>
      val wd = array_distinct(split(col("p_name"), " "))
      val m = map_from_arrays(wd, transform(wd, w => length(w).cast("long")))
      Tables.table(s, d, "part")
        .select(col("p_partkey"),
          explode(map_filter(transform_values(m, (_, v) => v * 2), (_, v) => v > 8))
            .as(Seq("word", "dlen")))
    },
    // string edit distance (identical definition in both engines)
    QueryDef(
      "string_distance",
      """SELECT p_partkey, p_brand, levenshtein(p_brand, 'Brand#33') AS dist
        |FROM part WHERE levenshtein(p_brand, 'Brand#33') <= 2""".stripMargin) { (s, d) =>
      Tables.table(s, d, "part")
        .withColumn("dist", levenshtein(col("p_brand"), lit("Brand#33")))
        .filter(col("dist") <= 2)
        .select(col("p_partkey"), col("p_brand"), col("dist"))
    }
  )
}
