package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Join-size estimation from two `count_min_sketch(...)` aggregates —
  * the Cormode–Muthukrishnan inner-product estimator (ICDT 2003 §4.2):
  * for sketches of the two join-key multisets built with the SAME
  * (eps, confidence, seed), `min over rows d of Σ_w A[d][w]·B[d][w]`
  * never undercounts `|A ⋈ B| = Σ_k f_A(k)·f_B(k)` and overshoots by at
  * most ε·N_A·N_B with probability ≥ 1−δ — the sketch-based cardinality
  * statistic a cost-based planner (or [[graft.operators.Joins
  * .adviseStrategy]]) wants BEFORE committing to a shuffle: two O(w·d)
  * sketches replace a full co-grouping of both key columns.
  *
  * Spark's sketch object exposes probes but not its table, so this
  * expression reads the documented V1 serialization the builtin
  * aggregate emits (version, totalCount, depth, width, hashA[depth],
  * table[depth][width] — all big-endian from DataOutputStream); the
  * row-sum invariant (every row totals `totalCount`) is spec-asserted
  * so a format drift fails loudly, and mismatched geometry or seeds
  * raise rather than mis-estimate. CodegenFallback like [[CmsEstimate]]:
  * inner products run on group-count-sized rows, never corpus rows.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary sketch, binary sketch), got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_inner_product"

  override def nullSafeEval(aBytes: Any, bBytes: Any): Any = {
    val a = CmsInnerProduct.parse(aBytes.asInstanceOf[Array[Byte]])
    val b = CmsInnerProduct.parse(bBytes.asInstanceOf[Array[Byte]])
    require(a.depth == b.depth && a.width == b.width &&
      java.util.Arrays.equals(a.hashA, b.hashA),
      s"$prettyName: sketches built with different (eps, confidence, seed)")
    var best = Long.MaxValue
    var d = 0
    while (d < a.depth) {
      var s = 0L
      var w = 0
      while (w < a.width) { s += a.table(d)(w) * b.table(d)(w); w += 1 }
      if (s < best) best = s
      d += 1
    }
    best
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsInnerProduct =
    copy(left = l, right = r)
}

object CmsInnerProduct {

  /** Parsed V1 count-min sketch. */
  final case class Parsed(totalCount: Long, depth: Int, width: Int,
      hashA: Array[Long], table: Array[Array[Long]])

  def parse(bytes: Array[Byte]): Parsed = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1, s"unsupported count_min_sketch version $version")
    val totalCount = in.readLong()
    val depth = in.readInt()
    val width = in.readInt()
    val hashA = Array.fill(depth)(in.readLong())
    val table = Array.fill(depth)(Array.fill(width)(in.readLong()))
    Parsed(totalCount, depth, width, hashA, table)
  }

  def innerProduct(a: Column, b: Column): Column =
    Bridge.column(CmsInnerProduct(Bridge.expression(a), Bridge.expression(b)))
}
