package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The full operator surface lives in [[registry]]; `queries`/`oracleSql`
  * are its two driver-facing views.
  */
object SparkEntry {

  /** Every verifiable operator, grouped by module. */
  def registry: Seq[QueryDef] =
    JoinQueries.all ++ AggQueries.all ++ WindowQueries.all ++ ScalarSetQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      DataGenQueries.all ++ StreamingQueries.all ++ AdvancedQueries.all ++
      SourceQueries.all ++ ArrayStatQueries.all ++ PipelineQueries.all ++
      WindowSetQueries2.all ++ ChangelogQueries.all ++ LayoutQueries.all ++
      GraphQueries.all ++ AnalyticsQueries.all ++ TpchQueries.all ++
      CurationQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_shuffle")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
