package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Cross-cutting checks over the full query registry plus physical-plan
  * assertions — the "is this the plan you'd want at 100 TB" gate. */
class QueriesSpec extends SparkSpec {

  test("every registry query runs and yields rows at sf0.001") {
    val empty = SparkEntry.registry.filter { q =>
      q.fn(spark, sf).limit(1).count() == 0
    }
    // join_anti may legitimately be empty at tiny SF, and the 10×
    // sparser sf0.001 graph has no 5-core (graph_kcore peels to
    // nothing — correct, and its sf0.01 oracle row is non-empty);
    // nothing else may be empty
    assert(empty.map(_.name).forall(Set("join_anti", "graph_kcore")),
      s"empty: ${empty.map(_.name)}")
  }

  test("query names are unique and every oracle has a query") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }

  test("filter and projection are pushed to the parquet scan") {
    val df = SparkEntry.queries("filter_pushdown")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(scan.contains("GreaterThan(l_quantity"), s"quantity filter not pushed")
    // pruned read schema: only the needed columns reach the scan
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("l_extendedprice"), "column pruning failed — scan reads unused columns")
  }

  test("aggregation plans use partial (map-side) aggregation") {
    val df = SparkEntry.queries("agg_pricing_summary")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    // two HashAggregate ops (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no partial aggregation")
  }

  test("global top-k plans as TakeOrderedAndProject, not a full sort") {
    val df = SparkEntry.queries("sort_topk")(spark, sf)
    assert(df.queryExecution.executedPlan.toString().contains("TakeOrderedAndProject"))
  }

  test("binned range join plans an equi-join, never a nested loop") {
    val df = SparkEntry.queries("join_range_binned")(spark, sf)
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      "binned range join fell back to a nested loop")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      "no equi-join operator in the binned plan")
    // and it returns exactly what the theta form returns
    val theta = SparkEntry.queries("join_theta_range")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == theta)
  }

  test("approx_count_distinct within 5% of exact") {
    // the query itself carries the ±5% check as the in-engine
    // `within_5pct` boolean (exact integer arithmetic — hash-comparable
    // with DuckDB's own sketch-vs-exact verdict); here we assert it holds
    // for every group and that n_exact really is the exact count
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.table(spark, sf, "lineitem")
      .groupBy(col("l_returnflag")).agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: sketch outside 5% of exact=${r.getLong(1)}")
      assert(r.getLong(1) == exact(r.getString(0)))
    }
  }

  test("outputs are partitioning-invariant for order-sensitive queries") {
    // determinism contract: the queries whose algorithms are most
    // exposed to partition/merge order (window running sums, LSH
    // banding, sketch merges, union-merge as-of, generated tables)
    // must produce identical row sets under different shuffle layouts
    val names = Seq("window_sessionize", "dedup_minhash_lsh", "dedup_simhash",
      "join_asof", "datagen_zipf_table", "datagen_heavy_hitters",
      "text_unigram_logprob", "pipeline_pack_bins")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try names.map(n => n -> SparkEntry.queries(n)(spark, sf)
        .collect().map(_.toSeq).toSet).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = run("3")
    val b = run("17")
    names.foreach(n => assert(a(n) == b(n), s"$n differs across partitionings"))
  }

  test("sessionization assigns increasing session ids per user") {
    val rows = SparkEntry.queries("window_sessionize")(spark, sf)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("m"), count(lit(1)).as("n"))
      .collect()
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(2)))
  }
}
