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

/** KMV (k-minimum-values) distinct-count sketch over a bigint stream:
  * the k smallest DISTINCT values, ascending (Bar-Yossef et al.,
  * RANDOM'02; Beyer et al., SIGMOD'07 unbiased estimator). Fed a
  * uniform hash of the tracked items, the k-th smallest value U₍ₖ₎
  * estimates distinct count as (k−1)·M/U₍ₖ₎ for hash range [0, M);
  * when fewer than k distinct values exist the sketch IS the exact
  * distinct set. The estimate arithmetic stays in the query layer —
  * the aggregate is just "k smallest distinct bigints", reusable as a
  * bottom-k sample.
  *
  * Unlike the CMS/HLL entries (whose sketch internals aren't
  * reproducible cross-engine, so their oracles assert error
  * envelopes), KMV over an md5-derived hash is a PURE function of the
  * input set — the DuckDB oracle replays the identical estimate and
  * the result hash-matches exactly.
  *
  * Scale shape: O(k) state per partition (a sorted set with its max
  * evicted on insert), k rows shuffled per group at merge — same
  * mergeable-summary contract as [[MisraGriesAgg]]; min-wise
  * summaries merge exactly (union then trim), so partial aggregation
  * is lossless, not just bounded.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a bigint input")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(item): Unit
      else if (item < buf.last) { buf.add(item); if (buf.size > k) buf.pollLast(): Unit }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long],
      b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    a.addAll(b): Unit
    while (a.size > k) a.pollLast(): Unit
    a
  }

  /** The ≤ k smallest distinct values, ascending. */
  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val items = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { items(i) = it.next(); i += 1 }
    new GenericArrayData(items)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next()): Unit
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong): Unit; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvAgg =
    copy(child = c)
}

object KmvAgg {
  /** kmv(item, k): array<bigint> of the k smallest distinct values. */
  def kmv(item: Column, k: Int): Column =
    Bridge.column(KmvAgg(Bridge.expression(item), k).toAggregateExpression())
}
