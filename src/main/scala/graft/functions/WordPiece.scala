package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (WordPiece-style maximal
  * munch) against a fixed vocabulary — APPLYING a subword vocab to a
  * corpus, the step downstream of the `text_bpe_merge` pair-counting
  * that TRAINS one. Per word: repeatedly emit the longest vocabulary
  * piece that prefixes the remaining suffix; if none matches, emit
  * `[UNK]` and advance one character (per-char fallback, so one bad
  * byte costs one piece, not the whole word).
  *
  * An iterative per-word cursor loop is exactly what composed HOF
  * built-ins cannot express without a quadratic prefix blowup — the
  * scalar-Expression tier is the right tool. Tokenization of the
  * surrounding text matches `split(trim(text), "\s+")` (the
  * [[ShingleGenerator]] semantics: ' '-only trim, limit -1); empty
  * words yield no pieces; null text yields null.
  *
  * Greedy choice is unambiguous: two distinct vocab entries of equal
  * length cannot both prefix the same suffix, so "longest match" needs
  * no tiebreak — the DuckDB oracle's `ORDER BY len(p) DESC LIMIT 1`
  * and this loop provably pick the same piece.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
  extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.distinct.length == vocab.length, "vocab must be distinct")
  require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece"

  // first-char buckets sorted longest-first: the greedy probe touches
  // only pieces that can possibly match at the cursor, and the first
  // startsWith hit IS the longest match
  @transient private lazy val byFirst: Map[Char, Array[String]] =
    vocab.groupBy(_.head).view.mapValues(_.sortBy(v => (-v.length, v)).toArray).toMap
  @transient private lazy val unkPiece = UTF8String.fromString("[UNK]")
  @transient private lazy val interned: Map[String, UTF8String] =
    vocab.iterator.map(v => v -> UTF8String.fromString(v)).toMap

  override def nullSafeEval(v: Any): Any = {
    val str = v.asInstanceOf[UTF8String].toString
    // Spark trim/split semantics — see ShingleGenerator: ' '-only trim,
    // split limit -1
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val words = str.substring(st, en).split("\\s+", -1)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var pos = 0
      while (pos < w.length) {
        val cands = byFirst.getOrElse(w.charAt(pos), null)
        var best: String = null
        if (cands != null) {
          var i = 0
          while (i < cands.length && best == null) {
            if (w.startsWith(cands(i), pos)) best = cands(i)
            i += 1
          }
        }
        if (best == null) { out += unkPiece; pos += 1 }
        else { out += interned(best); pos += best.length }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}

object WordPiece {
  /** Demo vocabulary for the registry query: the corpus's domain words
    * plus common digrams plus every lowercase letter (full coverage of
    * the synthetic corpus — `[UNK]` stays reachable for anything else).
    * The oracle SQL inlines THIS list verbatim, so there is one source
    * of truth for both engines. */
  val demoVocab: Seq[String] =
    Seq("table", "query", "value", "part", "key", "scan", "sort", "row",
      "fast", "agg", "join", "the",
      "er", "st", "ta", "qu", "an", "or", "in", "ch", "am", "le", "ar",
      "ow", "ue") ++ ('a' to 'z').map(_.toString)

  /** pieces(text) as an array<string> Column. */
  def encode(text: Column, vocab: Seq[String] = demoVocab): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(text), vocab))
}
