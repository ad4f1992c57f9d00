package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 moved the conversion into
  * `private[sql]` classic helpers (Column wraps a ColumnNode, not an
  * Expression); extension libraries conventionally expose them through a
  * small shim in the sql package namespace. This is the only file
  * outside the graft package.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** DataFrame over an RDD[InternalRow] (SparkSession.
    * internalCreateDataFrame is private[sql]). Iterative operators
    * (connected components, PageRank) re-materialize a small state
    * vector every round via `localCheckpoint`; going through the public
    * `df.rdd`/`createDataFrame` pair would convert
    * InternalRow→Row→InternalRow on every round's full scan. This stays
    * at the Tungsten representation — callers MUST pass rows that are
    * safe to retain (i.e. `.map(_.copy())` before caching, same rule
    * `Dataset.checkpoint` itself follows). */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** DataFrame over a checkpointed RDD that PRESERVES the origin plan's
    * output partitioning and ordering — `LogicalRDD.fromDataset`, the
    * exact helper `Dataset.checkpoint` uses internally. [[internalDf]]
    * drops both (its LogicalRDD defaults to UnknownPartitioning), so
    * every downstream join/aggregate/window keyed like the checkpointed
    * frame re-shuffled rows that were already placed — one avoidable
    * Exchange per iteration round in the fixed-point operators
    * (PageRank, connected components, beam walks). The origin Dataset
    * must already be EXECUTED (queryExecution.toRdd forces AQE's final
    * plan, so the captured partitioning is the one the rows actually
    * have). */
  /** Whether `df` is already a materialized leaf (LogicalRDD — e.g. a
    * frame [[checkpointedDf]]/localCheckpoint produced): re-scanning it
    * is cheap, so operators that checkpoint shared subtrees can skip
    * re-checkpointing one. */
  def isMaterializedLeaf(df: DataFrame): Boolean =
    df.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]

  def checkpointedDf(origin: DataFrame,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]): DataFrame = {
    val ds = origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ofRows(origin.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(rdd, ds, isStreaming = false))
  }
}
