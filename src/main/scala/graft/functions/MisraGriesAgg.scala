package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra–Gries heavy-hitter summary over a bigint stream: at most `k`
  * (item, weight) counters; any item with true frequency > n/k is
  * GUARANTEED present in the final summary (Misra & Gries 1982; merge
  * with trim-to-k keeps the εn = n/(k+1) undercount bound — the
  * mergeable-summaries result of Agarwal et al., PODS'12, so partial
  * aggregation and shuffle-merge are sound).
  *
  * The summary CONTENTS (candidate set and residual weights) depend on
  * merge order, so the aggregate's raw output is never exposed to an
  * oracle directly — [[graft.queries.TextQueries]] recounts the
  * candidates exactly and filters freq·k > n, which the superset
  * guarantee makes equal to the exact heavy-hitter set regardless of
  * order. The summary is O(k) memory per partition and shuffles k rows
  * instead of the full item cardinality — the 100 TB shape for hot-key
  * detection.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries"

  override def createAggregationBuffer(): scala.collection.mutable.LongMap[Long] =
    scala.collection.mutable.LongMap.empty[Long]

  /** Decrement-all by the (k+1)-th largest weight, drop <= 0 — restores
    * |summary| <= k after an insert/merge overshoot. */
  private def trim(buf: scala.collection.mutable.LongMap[Long]): Unit =
    if (buf.size > k) {
      val weights = buf.values.toArray
      java.util.Arrays.sort(weights)
      val cut = weights(weights.length - k - 1) // (k+1)-th largest
      val keys = buf.keys.toArray
      keys.foreach { key =>
        val w = buf(key) - cut
        if (w <= 0) buf.remove(key) else buf.update(key, w)
      }
    }

  override def update(buf: scala.collection.mutable.LongMap[Long],
      input: InternalRow): scala.collection.mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buf.update(item, buf.getOrElse(item, 0L) + 1)
      trim(buf)
    }
    buf
  }

  override def merge(a: scala.collection.mutable.LongMap[Long],
      b: scala.collection.mutable.LongMap[Long]): scala.collection.mutable.LongMap[Long] = {
    b.foreach { case (item, w) =>
      a.update(item, a.getOrElse(item, 0L) + w)
    }
    trim(a)
    a
  }

  /** Candidate items, ascending (deterministic rendering of the set). */
  override def eval(buf: scala.collection.mutable.LongMap[Long]): Any = {
    val items = buf.keys.toArray
    java.util.Arrays.sort(items)
    new GenericArrayData(items)
  }

  override def serialize(buf: scala.collection.mutable.LongMap[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (item, w) => bb.putLong(item); bb.putLong(w) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.LongMap[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object MisraGriesAgg {
  /** misra_gries(item, k): array<bigint> of heavy-hitter candidates —
    * a guaranteed superset of every item with frequency > n/k. */
  def misra_gries(item: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(item), k).toAggregateExpression())
}
