package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: folds (tokenHash: long, weight: long) rows
  * into the 64-bit fingerprint in ONE aggregate — replacing the
  * 64-conditional-sum formulation (64 aggregate expressions each
  * re-testing a bit per row; this buffer does all 64 bits in one pass
  * per row and packs on eval). The custom-aggregate tier of the
  * Catalyst toolbox (TypedImperativeAggregate = mutable buffer, like
  * HLL/sketch aggregates).
  *
  * Buffer: long[64] of signed bit sums. eval: bit i set iff sum > 0 —
  * identical semantics to Dedup.simhash's column formulation
  * (spec-asserted equal).
  */
case class SimHashAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (bigint, bigint) inputs")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = left.eval(input)
    val w = right.eval(input)
    if (h != null && w != null) {
      val hv = h.asInstanceOf[Long]
      val wv = w.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        if (((hv >>> i) & 1L) == 1L) buf(i) += wv else buf(i) -= wv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashAgg =
    copy(left = l, right = r)
}

object SimHashAgg {
  /** simhash_agg(tokenHash, weight) as an aggregate Column. */
  def simhash_agg(hash: Column, weight: Column): Column =
    Bridge.column(
      SimHashAgg(Bridge.expression(hash), Bridge.expression(weight))
        .toAggregateExpression())

  /** simhash_agg_wide(array(h0..h{w-1}), weight) — multi-word (64·w bit)
    * fingerprint as array<bigint>. */
  def simhash_agg_wide(hashes: Column, weight: Column, words: Int): Column =
    Bridge.column(
      SimHashAggWide(Bridge.expression(hashes), Bridge.expression(weight), words)
        .toAggregateExpression())
}

/** Multi-word SimHash aggregate: same signed-bit-sum fold as
  * [[SimHashAgg]] widened to `words`·64 bits. Input is an array of
  * `words` independent 64-bit feature hashes (e.g. xxhash64 under
  * distinct salts); output is the packed fingerprint as array<bigint>.
  * Wider fingerprints halve the RELATIVE banding radius at equal band
  * width (128-bit: 32 bands of 4 bits guarantee hamming ≤ 31 ≙ the same
  * 64-bit 16-band/≤15 fraction) — worth the 2× aggregate cost only when
  * the corpus needs finer angular resolution than 64 planes give. */
case class SimHashAggWide(
    left: Expression,
    right: Expression,
    words: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private val bits = words * 64

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) if right.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<bigint>, bigint) inputs")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash_agg_wide"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = left.eval(input)
    val w = right.eval(input)
    if (h != null && w != null) {
      val hs = h.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val wv = w.asInstanceOf[Long]
      var word = 0
      while (word < words) {
        val hv = hs.getLong(word)
        var i = 0
        while (i < 64) {
          val k = word * 64 + i
          if (((hv >>> i) & 1L) == 1L) buf(k) += wv else buf(k) -= wv
          i += 1
        }
        word += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](words)
    var word = 0
    while (word < words) {
      var v = 0L
      var i = 0
      while (i < 64) {
        if (buf(word * 64 + i) > 0) v |= (1L << i)
        i += 1
      }
      out(word) = v
      word += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAggWide =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAggWide =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashAggWide =
    copy(left = l, right = r)
}
