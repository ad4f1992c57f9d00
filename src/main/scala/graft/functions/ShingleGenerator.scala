package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingle generator — the custom-Generator tier of the Catalyst
  * toolbox (rows-out counterpart of the scalar RollingHash / aggregate
  * SimHashAgg tiers). Emits one row per k-gram of whitespace tokens,
  * fusing tokenize → k-gram → explode into a single pass.
  *
  * The composed-builtin twin it replaces
  * (`explode(transform(sequence(0, size(w)-k), i -> concat_ws(' ',
  * w[i..i+k-1])))`, kept as [[graft.operators.Dedup.shinglesHof]] and
  * spec-pinned equal) allocates a token array, an index array, and a
  * per-element struct walk per row, all through CodegenFallback HOFs —
  * the hot path of every shingle-based dedup query. This generator
  * allocates only the token split and reuses one row buffer.
  *
  * Semantics match `split(trim(text), "\s+")` exactly: Spark's split
  * keeps Java's limit -1 behavior, so an empty trimmed string yields
  * one empty token and (like any doc with fewer than k tokens) no
  * shingles; null text yields no rows.
  */
case class ShingleGenerator(child: Expression, k: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def elementSchema: StructType =
    StructType(StructField("s", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
      if (toks.length < k || (toks.length == 1 && toks(0).isEmpty)) Iterator.empty
      else {
        val sb = new java.lang.StringBuilder
        Iterator.range(0, toks.length - k + 1).map { i =>
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          // fresh row per shingle: downstream Generate consumers may
          // buffer without copying
          new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)
}

object ShingleGenerator {
  /** shingles(text, k) as a generator Column (use in select like
    * explode). */
  def shingles(text: Column, k: Int): Column =
    Bridge.column(ShingleGenerator(Bridge.expression(text), k))
}
