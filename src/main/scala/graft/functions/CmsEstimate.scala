package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized `count_min_sketch(...)` aggregate —
  * the probe half Spark ships without (the builtin produces the BINARY
  * sketch; nothing reads it back in SQL).
  *
  * Sketch+probe is the 100 TB frequency-monitoring shape: the aggregate
  * is O(w·d) memory per group, merges associatively across partitions,
  * and the probe side joins the (small) sketch table against whatever
  * keys need counts — no second corpus pass, unlike the exact recount
  * in [[graft.operators.HeavyHitters]] (which trades one more scan for
  * exact answers; this trades ≤ εN overcount for none).
  *
  * Interpreted eval (CodegenFallback) is deliberate: probes run on
  * group-count-sized rows, never corpus rows. Deserialization is cached
  * per sketch REFERENCE, so a broadcast sketch column deserializes once
  * per task, not once per row. Item type is LONG — `CountMinSketch`
  * hashes boxed `java.lang.Long` through the same `addLong` path the
  * builtin aggregate uses, so estimates are consistent with the build
  * side. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, bigint item), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  // per-task deserialization cache keyed by the byte-array reference
  // (broadcast sketches are the same object for every probe row)
  @transient private var lastBytes: AnyRef = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    if (!(sketchBytes.asInstanceOf[AnyRef] eq lastBytes)) {
      lastBytes = sketchBytes.asInstanceOf[AnyRef]
      lastSketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    }
    lastSketch.estimateCount(item.asInstanceOf[java.lang.Long])
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

object CmsEstimate {
  def estimate(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(item)))
}
