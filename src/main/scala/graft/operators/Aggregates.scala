package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-robust aggregation shapes.
  *
  * Plain algebraic aggregates (sum/count/avg) don't need salting on
  * Spark: hash partial aggregation combines map-side, so each reducer
  * receives one row per (key, map-partition) regardless of skew. The
  * genuinely skew-fragile aggregate is COUNT(DISTINCT v): Spark plans
  * it as an Expand + two exchanges KEYED BY (key, v), and every
  * pre-aggregated (key, v) pair of a hot key still lands on the hot
  * key's final reducer; worse, the intermediate distinct-set per key is
  * held whole. [[saltedDistinctCount]] is the classic two-phase fix.
  */
object Aggregates {

  /** Exact COUNT(DISTINCT value) per key for skew-heavy keys, in two
    * bounded phases: values are deterministically bucketed by their own
    * hash (`pmod(xxhash64(v), buckets)`), phase 1 counts distinct
    * values within each (key, bucket) — correct because a given value
    * always lands in exactly one bucket, so buckets partition the
    * distinct set — and phase 2 sums the per-bucket counts. A key with
    * 10⁹ distinct values fans out over `buckets` reducers instead of
    * serializing through one; both exchanges carry pre-aggregated rows.
    * The result is identical to the direct form for any `buckets` ≥ 1.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    df.select(key.as("k"), value.as("v"))
      .withColumn("__b", pmod(xxhash64(col("v")), lit(buckets.toLong)))
      .groupBy(col("k"), col("__b"))
      .agg(count_distinct(col("v")).as("__pc"))
      .groupBy(col("k"))
      .agg(sum(col("__pc")).as("n_distinct"))
  }
}
