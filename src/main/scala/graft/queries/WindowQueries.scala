package graft.queries

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, sorts and top-k (extensions — absent from the
  * reference, SURVEY §2.5; its only sort is the total-order sort inside
  * MergeJoin, covered by Joins.presort).
  *
  * Determinism: every window/order has a total order (unique id as final
  * tie-break); running sums accumulate DECIMAL and use explicit ROWS
  * frames so Spark and DuckDB agree on frame semantics.
  * Type parity: DuckDB `sum(INTEGER/BIGINT)` widens to HUGEINT, which
  * pandas renders as float64 — any integer sum that SURFACES as an
  * output column must be `CAST(... AS BIGINT)` in the oracle SQL or the
  * hash gate sees 3.0 vs 3 (the round-1 `window_sessionize` red).
  * Scale: windows partition by high-cardinality keys (custkey/user_id) —
  * no single-partition global window anywhere except the bounded top-k,
  * which Spark executes as a per-partition TakeOrdered + driver merge.
  */
object WindowQueries {

  private val dec = "decimal(18,2)"

  val all: Seq[QueryDef] = Seq(
    // first event per user, written in the row_number top-1 window idiom
    // — the injected plans.ArgmaxRewrite optimizer rule plans it as a
    // min_by aggregation (map-side partial agg, no WindowExec, no
    // per-group sort); ArgmaxRewriteSpec pins the plan shape and the
    // rule-off equality, this entry pins end-to-end semantics vs DuckDB
    QueryDef(
      "window_top1_rewrite",
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      graft.plans.ArgmaxRewrite.install(s)
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      Tables.table(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts div 1000").as("tus"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .drop("rn")
    },
    // ranking trio over a deterministic total order
    QueryDef(
      "window_rank",
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.table(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"), rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
    },
    // running aggregate with explicit ROWS frame + exact decimal sum
    QueryDef(
      "window_running_sum",
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("running_total"))
    },
    // RANGE frame (value-based, not row-based): 30-day rolling spend
    // per customer. RANGE frames are order-tie-safe by definition (the
    // frame depends on ORDER BY VALUES, so peers always share a
    // result) — the deterministic way to window event-time without a
    // unique tie-break column. Day grain keeps the bound integral.
    QueryDef(
      "window_range_frame",
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_30d
        |FROM orders""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        // o_orderdate is TIMESTAMP_NTZ; the UTC session tz makes the
        // cast's epoch identical to DuckDB's epoch_us of the naive value
        .orderBy((unix_micros(col("o_orderdate").cast("timestamp")) / 86400000000L).cast("long"))
        .rangeBetween(-30, Window.currentRow)
      Tables.table(s, d, "orders").select(
        col("o_orderkey"),
        sum(col("o_totalprice").cast(dec)).over(w).cast("double").as("rolling_30d"))
    },
    // lag/lead — event-time deltas in integer MICROS. ts is epoch-nanos
    // long (nanosAsLong); DuckDB reads the same parquet as a µs-truncated
    // TIMESTAMP, so µs (`ts div 1000` ≡ epoch_us) is the common grain.
    // Integer `div`, never double division: epoch-nanos > 2^53 loses
    // precision in floats.
    QueryDef(
      "window_lag_delta",
      """SELECT user_id, event_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us,
        |  lead(event_id) OVER w AS next_event
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)""".stripMargin) { (s, d) =>
      val tus = expr("ts div 1000")
      val w = Window.partitionBy(col("user_id")).orderBy(tus, col("event_id"))
      Tables.table(s, d, "events").select(
        col("user_id"), col("event_id"),
        (tus - lag(tus, 1).over(w)).as("delta_us"),
        lead(col("event_id"), 1).over(w).as("next_event"))
    },
    // sessionization — gaps-and-islands with a 30-minute gap, all in
    // exact integer arithmetic (the batch twin of the streaming
    // mapGroupsWithState sessionizer)
    QueryDef(
      "window_sessionize",
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT user_id, event_id,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM flagged""".stripMargin) { (s, d) =>
      val byTime = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.table(s, d, "events")
        .select(col("user_id"), col("event_id"), expr("ts div 1000").as("tus"))
        .withColumn("is_new",
          when(col("tus") - lag(col("tus"), 1).over(byTime) > gapUs
            || lag(col("tus"), 1).over(byTime).isNull, 1).otherwise(0))
        .select(col("user_id"), col("event_id"),
          sum(col("is_new")).over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_id"))
    },
    // global top-k under a total deterministic order — Spark plans
    // TakeOrderedAndProject (per-partition heap + driver merge), the
    // scale-correct physical top-k
    QueryDef(
      "sort_topk",
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
    },
    // ntile bucketing (extension)
    QueryDef(
      "window_ntile",
      """SELECT c_custkey, ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer").select(
        col("c_custkey"),
        ntile(10).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).as("decile"))
    }
  )
}
