package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: rolling polynomial hash
  * `h = fold(h*31 + codeUnit) mod m` over a string — the document
  * fingerprint primitive (see TextAnalysis.fingerprintHof for the
  * composed-builtin twin it must agree with, and which the DuckDB oracle
  * mirrors via list_reduce).
  *
  * Why a custom Expression (SURVEY §7's "optional Catalyst work" slot):
  * the HOF formulation materializes a per-char array per row
  * (split → aggregate); this one is a single fused loop with full
  * whole-stage codegen, no intermediate allocation — the preferred shape
  * for a 100 TB corpus scan. Semantics: UTF-16 code units, which equal
  * codepoints for the ASCII output of TextAnalysis.normalized.
  */
case class RollingHash(child: Expression, mod: Long = 1000000007L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31L + s.charAt(i)) % mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $s = $c.toString();
         |long $h = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $h = ($h * 31L + $s.charAt($i)) % ${mod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Column-level and SQL-level entry points for graft's custom
  * expressions. */
object GraftFunctions {

  def rolling_hash(c: Column): Column =
    Bridge.column(RollingHash(Bridge.expression(c)))

  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** Register SQL names for every custom expression/aggregate, so the
    * plain-SQL surface (`Graft.registerViews` + `spark.sql`) reaches
    * them too:
    * `graft_rolling_hash(str)`, `graft_nfc(str)`, `graft_dot(arr, arr)`,
    * `graft_simhash(hash, weight)`,
    * `graft_misra_gries(item, k)` (k a foldable int literal),
    * `graft_kmv(item, k)` (bottom-k distinct bigints, same k contract),
    * `graft_cms_estimate(sketch, item)` (probe for the builtin
    * `count_min_sketch` aggregate's binary output),
    * `graft_cms_inner_product(sketch, sketch)` (join-size estimator
    * over two same-seed sketches),
    * `graft_wordpiece(str[, vocab])` (greedy subword tokenization;
    * vocab a foldable array<string>, default WordPiece.demoVocab). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cms_estimate", exprs => CmsEstimate(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cms_inner_product",
      exprs => CmsInnerProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashAgg(exprs(0), exprs(1)).toAggregateExpression(), "built-in")
    // graft_wordpiece(str[, vocab_array_literal]) — greedy subword
    // tokenization; the optional second arg must fold to an array of
    // strings (defaults to WordPiece.demoVocab)
    reg.createOrReplaceTempFunction(
      "graft_wordpiece",
      exprs => {
        val vocab = exprs.lift(1).map { ve =>
          if (!ve.foldable)
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "NON_FOLDABLE_ARGUMENT",
              messageParameters = Map(
                "funcName" -> "`graft_wordpiece`",
                "paramName" -> "`vocab`",
                "paramType" -> "\"ARRAY<STRING>\""))
          ve.eval(null) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData =>
              a.toObjectArray(org.apache.spark.sql.types.StringType)
                .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
            case _ => throw new org.apache.spark.sql.AnalysisException(
              errorClass = "NON_FOLDABLE_ARGUMENT",
              messageParameters = Map(
                "funcName" -> "`graft_wordpiece`",
                "paramName" -> "`vocab`",
                "paramType" -> "\"ARRAY<STRING>\""))
          }
        }.getOrElse(WordPiece.demoVocab)
        WordPieceEncode(exprs.head, vocab)
      }, "built-in")
    reg.createOrReplaceTempFunction(
      "graft_misra_gries",
      exprs => {
        // typed analysis errors, not an opaque ClassCastException/NPE at
        // resolution time: k must be a FOLDABLE integer expression
        // (literals and constant arithmetic both qualify) in [1, 2³¹)
        val kExpr = exprs(1)
        if (!kExpr.foldable)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`graft_misra_gries`",
              "paramName" -> "`k`",
              "paramType" -> "\"INT\""))
        val k = kExpr.eval(null) match {
          case i: Int => i.toLong
          case l: Long => l
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`graft_misra_gries`",
              "paramName" -> "`k`",
              "paramType" -> "\"INT\""))
        }
        if (k < 1 || k > Int.MaxValue)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INVALID_NUMERIC_LITERAL_RANGE",
            messageParameters = Map(
              "rawStrippedQualifier" -> k.toString,
              "typeName" -> "graft_misra_gries parameter k",
              "minValue" -> "1",
              "maxValue" -> Int.MaxValue.toString))
        MisraGriesAgg(exprs(0), k.toInt).toAggregateExpression()
      }, "built-in")
    // graft_kmv(item, k): bottom-k distinct bigints (KMV sketch) — the
    // same foldable-k typing contract as graft_misra_gries
    reg.createOrReplaceTempFunction(
      "graft_kmv",
      exprs => {
        val kExpr = exprs(1)
        if (!kExpr.foldable)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`graft_kmv`",
              "paramName" -> "`k`",
              "paramType" -> "\"INT\""))
        val k = kExpr.eval(null) match {
          case i: Int => i.toLong
          case l: Long => l
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`graft_kmv`",
              "paramName" -> "`k`",
              "paramType" -> "\"INT\""))
        }
        if (k < 1 || k > Int.MaxValue)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "INVALID_NUMERIC_LITERAL_RANGE",
            messageParameters = Map(
              "rawStrippedQualifier" -> k.toString,
              "typeName" -> "graft_kmv parameter k",
              "minValue" -> "1",
              "maxValue" -> Int.MaxValue.toString))
        KmvAgg(exprs(0), k.toInt).toAggregateExpression()
      }, "built-in")
  }
}
