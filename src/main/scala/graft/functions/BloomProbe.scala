package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a broadcast [[BloomFilter]] — the runtime
  * pre-shuffle row filter for selective fact⋈dim joins (the explicit
  * form of Spark's own `spark.sql.optimizer.runtime.bloomFilter`
  * injection, which only fires inside one query's plan: building the
  * sketch ONCE and probing it from an expression lets a pipeline reuse
  * the same dim-key filter across many queries, exactly like the
  * reference reused its distributed-cache side file across jobs,
  * BroadcastJoin.java:40).
  *
  * No false negatives (every true match passes), ≤ fpp false positives
  * — so callers MUST follow with an exact join; the probe's only job is
  * to keep non-matching fact rows out of the join exchange.
  *
  * Codegen (NOT CodegenFallback): the probe runs once per fact row —
  * the hottest possible path — so the generated code calls
  * `mightContainLong` on a per-instance field initialized once from the
  * broadcast, keeping the whole scan→filter pipeline inside
  * WholeStageCodegen. Key type is pinned to LONG: `mightContainLong`
  * is the same hash path `DataFrameStatFunctions.bloomFilter` feeds
  * integral build keys through, so probe and build agree bit-for-bit.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${t.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bloom.value

  override def nullSafeEval(key: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfClass = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom, classOf[Broadcast[_]].getName)
    // resolved once per generated-class instance (task), not per row
    val f = ctx.addMutableState(bfClass, "graftBloom",
      v => s"$v = ($bfClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, key => s"${ev.value} = $f.mightContainLong($key);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomProbe {
  def mightContain(bloom: Broadcast[BloomFilter], key: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(key), bloom))
}
