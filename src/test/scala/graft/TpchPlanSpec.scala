package graft

import graft.queries.TpchQueries
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan

/** Plan pins for the TPC-H battery: each query was chosen to probe one
  * optimizer capability — these tests fail if a refactor quietly loses
  * it (the output would still be correct, just wrong at 100 TB). */
class TpchPlanSpec extends SparkSpec {

  private def run(name: String): SparkPlan = {
    val df = TpchQueries.all.find(_.name == name).get.fn(spark, sf)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // NOTE: materialized AQE plans hide stage contents from
  // SparkPlan.collect (QueryStageExec children are not `children`), so
  // these pins read the RENDERED tree, which prints the full stages.
  private def render(plan: SparkPlan): String = plan.toString

  test("q6: every predicate reaches the lineitem scan and aggregation is partial") {
    // formatted explain keeps scan metadata (PushedFilters/ReadSchema)
    // that simpleString truncates
    val df = TpchQueries.all.find(_.name == "q6_forecast_revenue").get.fn(spark, sf)
    df.collect()
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(s).getOrElse("")
    assert(pushed.contains("l_discount") && pushed.contains("l_quantity"),
      s"filters not pushed: $pushed")
    // column pruning: the scan must not read unused lineitem columns
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(s).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"),
      s"scan reads pruned columns: $readSchema")
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "expected partial + final aggregation")
  }

  test("q4: EXISTS decorrelates to a semi join, never a per-row subquery") {
    val plan = run("q4_order_priority")
    val s = plan.toString
    assert(s.contains("LeftSemi"), "EXISTS must become a LeftSemi join")
  }

  test("q8: all six dims broadcast; no cartesian product") {
    val s = render(run("q8_market_share"))
    val bcasts = "BroadcastHashJoin".r.findAllIn(s).size
    assert(bcasts >= 5, s"expected >=5 broadcast joins, got $bcasts")
    assert(!s.contains("CartesianProduct"))
  }

  test("q13: outer join keeps null-extended customers (count preserved)") {
    val df = TpchQueries.all.find(_.name == "q13_customer_distribution").get.fn(spark, sf)
    val total = df.agg(org.apache.spark.sql.functions.sum("custdist")).head().getLong(0)
    val customers = graft.sources.Tables.table(spark, sf, "customer").count()
    assert(total == customers, "every customer must appear in exactly one c_count bucket")
  }

  test("q18: the HAVING gate stays a pre-aggregated semi join") {
    val s = render(run("q18_large_volume"))
    assert(s.contains("LeftSemi"), "IN-subquery must become a semi join")
    assert("HashAggregate".r.findAllIn(s).size >= 3,
      "gate aggregation must survive (not re-joined raw)")
  }

  // decorrelation SHAPE is a logical property — assert on the optimized
  // plan (AQE's rendered physical tree hides joins that ran in early,
  // already-materialized stages)
  private def optimized(name: String): String = {
    val df = TpchQueries.all.find(_.name == name).get.fn(spark, sf)
    df.queryExecution.optimizedPlan.toString
  }

  test("q21: both correlations become one semi + one anti join (never per-row rescans)") {
    val s = optimized("q21_waiting_suppliers")
    assert("LeftSemi".r.findAllIn(s).size >= 2,
      "orders gate + EXISTS correlation must both be semi joins")
    assert(s.contains("LeftAnti"), "NOT EXISTS must become an anti join")
    // the non-equi correlation conjunct (other-supplier) must survive
    // INSIDE the join conditions, not as a filter over a pair blow-up
    assert(s.contains("NOT (sk2") || s.contains("NOT (l_suppkey"),
      s"non-equi conjunct missing from join conditions:\n$s")
    assert(!render(run("q21_waiting_suppliers")).contains("CartesianProduct"))
  }

  test("q2: the correlated MIN decorrelates to a part-keyed aggregate joined back") {
    val s = render(run("q2_min_cost_supplier"))
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "expected partial + final min aggregation")
    assert(!s.contains("CartesianProduct"))
  }

  test("q16: the NOT-IN exclusion is an anti join; distinct-count aggregates partially") {
    assert(optimized("q16_supplier_census").contains("LeftAnti"),
      "NOT IN must become an anti join")
    val s = render(run("q16_supplier_census"))
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "count(distinct) must keep partial aggregation")
  }

  test("q20: agg→agg→semi→semi chain survives (one lineitem scan, two semi joins)") {
    val s = render(run("q20_excess_suppliers"))
    assert("LeftSemi".r.findAllIn(s).size >= 2,
      "part-name gate and supplier gate must both be semi joins")
    assert("HashAggregate".r.findAllIn(s).size >= 4,
      "both quantity aggregates must keep partial aggregation")
  }

  test("q15: exact-decimal max — no double compare anywhere in the plan") {
    val df = TpchQueries.all.find(_.name == "q15_top_supplier").get.fn(spark, sf)
    // the revenue/max comparison runs in DecimalType; only the final
    // output column is double
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("(total_rev = cast(max_rev as double))"),
      "max filter must compare decimals, not doubles")
    assert(df.schema("total_revenue").dataType.typeName == "double")
  }

  test("battery shuffles stay bounded: q7 executes with <= 4 exchanges") {
    val plan = run("q7_volume_shipping")
    val ex = plan.collect { case e: ShuffleExchangeExec => e }
    assert(ex.size <= 4, s"q7 shuffled ${ex.size} times; dims must broadcast")
  }
}
