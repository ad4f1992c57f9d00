package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation against a
  * fixed scored vocabulary — the third tokenizer family next to BPE
  * ([[graft.operators.CorpusOps.bpeTrain]]) and greedy WordPiece
  * ([[WordPieceEncode]]): instead of merge order or maximal munch, each
  * word is segmented to MAXIMIZE the sum of piece log-probabilities
  * (integer micros), the Viterbi decode of Kudo '18.
  *
  * Per word the DP reports `"best:count"` — the optimal score and the
  * NUMBER of optimal segmentations. Reporting the count instead of one
  * argmax path makes the output tie-proof: two segmentations of equal
  * score (e.g. "a|aa" vs "aa|a" over vocab {a, aa}) have no canonical
  * winner, and any local tie-break rule is unportable to a relational
  * replay — whereas (max, count-of-max) is a pure function of the edge
  * DAG that the oracle reproduces by full path enumeration.
  *
  * Unknown characters: a position contributes an [UNK] edge (one char,
  * `unkMicros`) ONLY where no single-character vocab piece covers it —
  * the SentencePiece posture. This also bounds the oracle's path count:
  * an unconditional per-char edge would double the segmentation count
  * at every covered position. Every position keeps at least one
  * incoming edge (vocab single or UNK), so the DP never strands.
  *
  * Word tokenization matches [[WordPieceEncode]]: ' '-only trim, then
  * `\s+` split, limit −1; an empty word reports "0:1" (the empty
  * segmentation). Null text → null.
  */
case class UnigramViterbi(child: Expression, vocab: Seq[(String, Long)],
    unkMicros: Long) extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.map(_._1).distinct.length == vocab.length, "vocab pieces must be distinct")
  require(vocab.forall(_._1.nonEmpty), "vocab pieces must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_viterbi"

  @transient private lazy val pieces: Array[(String, Long)] = vocab.toArray
  @transient private lazy val singleCovered: Set[Char] =
    vocab.iterator.map(_._1).filter(_.length == 1).map(_.head).toSet

  override def nullSafeEval(v: Any): Any = {
    val str = v.asInstanceOf[UTF8String].toString
    var st = 0
    var en = str.length
    while (st < en && str.charAt(st) == ' ') st += 1
    while (en > st && str.charAt(en - 1) == ' ') en -= 1
    val words = str.substring(st, en).split("\\s+", -1)
    val out = new Array[Any](words.length)
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      val n = w.length
      val best = Array.fill(n + 1)(Long.MinValue)
      val cnt = new Array[Long](n + 1)
      best(0) = 0L; cnt(0) = 1L
      var i = 1
      while (i <= n) {
        var pi = 0
        while (pi < pieces.length) {
          val (p, sc) = pieces(pi)
          val s0 = i - p.length
          if (s0 >= 0 && best(s0) != Long.MinValue && w.startsWith(p, s0)) {
            val cand = best(s0) + sc
            if (cand > best(i)) { best(i) = cand; cnt(i) = cnt(s0) }
            else if (cand == best(i)) cnt(i) += cnt(s0)
          }
          pi += 1
        }
        if (!singleCovered(w.charAt(i - 1)) && best(i - 1) != Long.MinValue) {
          val cand = best(i - 1) + unkMicros
          if (cand > best(i)) { best(i) = cand; cnt(i) = cnt(i - 1) }
          else if (cand == best(i)) cnt(i) += cnt(i - 1)
        }
        i += 1
      }
      out(wi) = UTF8String.fromString(s"${best(n)}:${cnt(n)}")
      wi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbi =
    copy(child = newChild)
}

object UnigramViterbi {
  /** Per-word "best:count" strings in word order. */
  def segment(text: Column, vocab: Seq[(String, Long)], unkMicros: Long): Column =
    Bridge.column(UnigramViterbi(Bridge.expression(text), vocab, unkMicros))
}

/** The E-step of the Viterbi-EM unigram trainer
  * ([[graft.operators.CorpusOps.unigramEmTrain]]): for ONE word, the
  * number of tied-optimal segmentations `n` and, per vocab piece, the
  * total number of occurrences of that piece across ALL n optimal
  * paths — exact integers, so the E-step is hash-replayable (the
  * full-lattice posterior of Kudo '18's EM is a float surface no
  * relational replay can pin; restricting expectations to the argmax
  * set is the hard-EM variant, documented at the trainer).
  *
  * Computed without enumeration: forward (best prefix score, count of
  * optimal prefixes) and backward (best suffix score, count of optimal
  * suffixes) DPs over the same edge DAG [[UnigramViterbi]] decodes —
  * an edge (st, en, piece) lies on an optimal path iff
  * fwdBest(st) + score + bwdBest(en) equals the word's best, and then
  * exactly fwdCnt(st) · bwdCnt(en) optimal paths cross it. [UNK] edges
  * (chars no single-char vocab piece covers) contribute to scores but
  * never to the returned counts — UNK is not a trainable piece.
  *
  * Returns struct(n BIGINT, cnt MAP<STRING, BIGINT>); null input →
  * null. The child is a single WORD (the trainer explodes the corpus
  * to its vocabulary-sized distinct-word table first). */
case class UnigramEmCounts(child: Expression, vocab: Seq[(String, Long)],
    unkMicros: Long) extends UnaryExpression with CodegenFallback {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.map(_._1).distinct.length == vocab.length, "vocab pieces must be distinct")
  require(vocab.forall(_._1.nonEmpty), "vocab pieces must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cnt",
      org.apache.spark.sql.types.MapType(StringType,
        org.apache.spark.sql.types.LongType, valueContainsNull = false),
      nullable = false)))
  override def prettyName: String = "graft_unigram_em_counts"

  @transient private lazy val pieces: Array[(String, Long)] = vocab.toArray
  @transient private lazy val singleCovered: Set[Char] =
    vocab.iterator.map(_._1).filter(_.length == 1).map(_.head).toSet

  override def nullSafeEval(v: Any): Any = {
    val w = v.asInstanceOf[UTF8String].toString
    val n = w.length
    val MinV = Long.MinValue
    val fBest = Array.fill(n + 1)(MinV); val fCnt = new Array[Long](n + 1)
    fBest(0) = 0L; fCnt(0) = 1L
    var i = 1
    while (i <= n) {
      var pi = 0
      while (pi < pieces.length) {
        val (p, sc) = pieces(pi)
        val s0 = i - p.length
        if (s0 >= 0 && fBest(s0) != MinV && w.startsWith(p, s0)) {
          val cand = fBest(s0) + sc
          if (cand > fBest(i)) { fBest(i) = cand; fCnt(i) = fCnt(s0) }
          else if (cand == fBest(i)) fCnt(i) += fCnt(s0)
        }
        pi += 1
      }
      if (!singleCovered(w.charAt(i - 1)) && fBest(i - 1) != MinV) {
        val cand = fBest(i - 1) + unkMicros
        if (cand > fBest(i)) { fBest(i) = cand; fCnt(i) = fCnt(i - 1) }
        else if (cand == fBest(i)) fCnt(i) += fCnt(i - 1)
      }
      i += 1
    }
    val bBest = Array.fill(n + 1)(MinV); val bCnt = new Array[Long](n + 1)
    bBest(n) = 0L; bCnt(n) = 1L
    i = n - 1
    while (i >= 0) {
      var pi = 0
      while (pi < pieces.length) {
        val (p, sc) = pieces(pi)
        val en = i + p.length
        if (en <= n && bBest(en) != MinV && w.startsWith(p, i)) {
          val cand = sc + bBest(en)
          if (cand > bBest(i)) { bBest(i) = cand; bCnt(i) = bCnt(en) }
          else if (cand == bBest(i)) bCnt(i) += bCnt(en)
        }
        pi += 1
      }
      if (!singleCovered(w.charAt(i)) && bBest(i + 1) != MinV) {
        val cand = unkMicros + bBest(i + 1)
        if (cand > bBest(i)) { bBest(i) = cand; bCnt(i) = bCnt(i + 1) }
        else if (cand == bBest(i)) bCnt(i) += bCnt(i + 1)
      }
      i -= 1
    }
    val total = fBest(n)
    val cnt = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    if (total != MinV) {
      var st = 0
      while (st < n) {
        if (fBest(st) != MinV) {
          var pi = 0
          while (pi < pieces.length) {
            val (p, sc) = pieces(pi)
            val en = st + p.length
            if (en <= n && bBest(en) != MinV && w.startsWith(p, st) &&
                fBest(st) + sc + bBest(en) == total)
              cnt.update(p, cnt.getOrElse(p, 0L) + fCnt(st) * bCnt(en))
            pi += 1
          }
        }
        st += 1
      }
    }
    val ks = new Array[Any](cnt.size); val vs = new Array[Any](cnt.size)
    var j = 0
    cnt.foreach { case (k, c) =>
      ks(j) = UTF8String.fromString(k); vs(j) = c; j += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      if (total == MinV) 0L else fCnt(n),
      org.apache.spark.sql.catalyst.util.ArrayBasedMapData(ks, vs))
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEmCounts =
    copy(child = newChild)
}

object UnigramEmCounts {
  def of(word: Column, vocab: Seq[(String, Long)], unkMicros: Long): Column =
    Bridge.column(UnigramEmCounts(Bridge.expression(word), vocab, unkMicros))
}
