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
    import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, Expression, SortOrder}
    import org.apache.spark.sql.catalyst.plans.physical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val ds = origin.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val base = LogicalRDD.fromDataset(rdd, ds, isStreaming = false)
    // Under AQE the executed plan is an AdaptiveSparkPlanExec wrapper
    // whose outputPartitioning is ALWAYS UnknownPartitioning(0), so
    // fromDataset silently drops the partitioning/ordering for every
    // adaptively-planned frame — exactly the frames the iterative
    // operators checkpoint (r13; the r12 change only helped plans that
    // never went through AQE). Unwrap to the FINAL physical plan and
    // rewrite its hash/range partitioning onto the checkpoint leaf's
    // output attributes; anything not provably rewritable stays
    // Unknown (fail-soft — a wrong partitioning claim would corrupt
    // joins, a missing one only costs an Exchange).
    val fixed = ds.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec
          if base.outputPartitioning.isInstanceOf[UnknownPartitioning] =>
        val phys = a.finalPhysicalPlan
        def firstLeaf(p: Partitioning): Partitioning = p match {
          case c: PartitioningCollection => firstLeaf(c.partitionings.head)
          case o => o
        }
        // physical output exprIds match the optimized plan's (Spark's
        // planning invariant); fromDataset's own assoc helper maps
        // those onto the logical output the LogicalRDD advertises
        LogicalRDD.buildOutputAssocForRewrite(
            ds.queryExecution.optimizedPlan.output, ds.logicalPlan.output) match {
          case Some(assoc) =>
            val byId: Map[ExprId, Attribute] =
              assoc.map { case (k, v) => k.exprId -> v }
            def rewrite[E <: Expression](e: E): Option[Expression] = {
              var ok = true
              val r = e.transformUp { case attr: Attribute =>
                byId.get(attr.exprId) match {
                  case Some(na) => na
                  case None => ok = false; attr
                }
              }
              if (ok) Some(r) else None
            }
            val np = firstLeaf(phys.outputPartitioning) match {
              case h: HashPartitioning =>
                rewrite(h).map(_.asInstanceOf[Partitioning])
                  .getOrElse(UnknownPartitioning(0))
              case r: RangePartitioning =>
                rewrite(r).map(_.asInstanceOf[Partitioning])
                  .getOrElse(UnknownPartitioning(0))
              case SinglePartition => SinglePartition
              case _ => UnknownPartitioning(0) // coalesced/skew-split etc.
            }
            val no = phys.outputOrdering.map(so => rewrite(so))
            val ordering: Seq[SortOrder] =
              if (no.nonEmpty && no.forall(_.isDefined))
                no.map(_.get.asInstanceOf[SortOrder])
              else Nil
            val (stats, constraints) = LogicalRDD.rewriteStatsAndConstraints(
              ds.logicalPlan, ds.queryExecution.optimizedPlan)
            LogicalRDD(base.output, rdd, np, ordering, isStreaming = false)(
              ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
              stats, constraints)
          case None => base
        }
      case _ => base
    }
    ofRows(origin.sparkSession, fixed)
  }
}
