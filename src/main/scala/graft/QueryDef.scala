package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query over the driver's parquet
  * testdata plus (when SQL-expressible) an equivalent DuckDB oracle
  * query. The driver hash-compares both results after sorting columns by
  * name — so every computed column must carry the SAME alias in the Spark
  * plan and the SQL text.
  *
  * Determinism rules (so hashes can match at all):
  *  - double aggregates go through DECIMAL(_,2) exact accumulation, then
  *    CAST(... AS DOUBLE) — bit-identical on both engines;
  *  - timestamps are exported as epoch microseconds (unix_micros /
  *    epoch_us), never as formatted text;
  *  - any top-k has a total deterministic order (score, then unique id).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object QueryDef {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), fn)
  /** rows-only check (non-SQL-expressible operator). */
  def unverified(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}
