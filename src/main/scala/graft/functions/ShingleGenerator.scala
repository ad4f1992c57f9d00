package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
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
  * Semantics match `split(trim(text), "\s+")` EXACTLY, which requires
  * two deliberate divergences from the obvious Java spelling (round-2
  * ADVICE): Spark/DuckDB `trim` strips ONLY space characters (Java's
  * `String.trim` strips every char ≤ U+0020, so leading/trailing
  * tabs/newlines would silently diverge), and Spark `split` uses
  * limit -1 (keeps trailing empty tokens, which Java's default limit 0
  * drops). So `"\ta b"` tokenizes to `["", "a", "b"]` and `"a b\t"` to
  * `["a", "b", ""]` on both paths; an empty trimmed string yields one
  * empty token and (like any doc with fewer than k tokens, k ≥ 2) no
  * shingles; null text yields no rows.
  */
case class ShingleGenerator(child: Expression, k: Int, withPos: Boolean = false)
  extends UnaryExpression with Generator with CodegenFallback {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def elementSchema: StructType =
    if (withPos)
      StructType(StructField("pos", IntegerType, nullable = false)
        :: StructField("s", StringType, nullable = false) :: Nil)
    else StructType(StructField("s", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val str = v.asInstanceOf[UTF8String].toString
      // Spark trim semantics: strip ' ' only (NOT Java String.trim)
      var st = 0
      var en = str.length
      while (st < en && str.charAt(st) == ' ') st += 1
      while (en > st && str.charAt(en - 1) == ' ') en -= 1
      // Spark split semantics: limit -1 keeps trailing empty tokens
      val toks = str.substring(st, en).split("\\s+", -1)
      if (toks.length < k) Iterator.empty
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
          val s = UTF8String.fromString(sb.toString)
          if (withPos) new GenericInternalRow(Array[Any](i, s))
          else new GenericInternalRow(Array[Any](s))
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

  /** (pos, s) rows — the positional form the exact-substring span
    * detector needs (pos = 0-based start-token index of the k-gram). */
  def shinglesWithPos(text: Column, k: Int): Column =
    Bridge.column(ShingleGenerator(Bridge.expression(text), k, withPos = true))
}
