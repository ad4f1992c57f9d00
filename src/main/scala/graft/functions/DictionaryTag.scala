package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern dictionary tagging (Aho–Corasick '75): per document,
  * the occurrence count of EVERY dictionary phrase — including
  * overlapping occurrences — in ONE pass over the text. This is the
  * blocklist/keyword-tagging primitive of corpus curation (C4's
  * badwords filter, policy-term audits, PII keyword sweeps): the
  * dictionary is thousands of phrases, and the per-phrase alternative
  * (|dict| regexp passes over a 100 TB corpus, each missing overlaps)
  * is |dict|× the scan cost. A single automaton pass is O(bytes +
  * matches) regardless of dictionary size.
  *
  * Output is SPARSE — one `"idx:count"` string per MATCHED phrase
  * (1-based index into the constructor's phrase order, ascending) — so
  * the per-row cost stays O(bytes + matches) end to end. The first
  * (dense-array) version of this operator emitted |dict| counts per
  * row and measured LINEAR in dictionary size at 1 M docs (2.0 s at 64
  * phrases → 20.6 s at 5 000) purely from output materialization; the
  * sparse form is the shape that holds at a 100 k-phrase blocklist.
  * The per-task count scratch is dense but REUSED across rows, with
  * only touched slots reset — no O(|dict|) per-row work anywhere.
  *
  * Matching is exact-byte (case-sensitive) over the UTF-8 encoding;
  * ASCII phrases can never false-positive inside multi-byte sequences
  * (UTF-8 continuation bytes have the high bit set), so byte counts
  * equal character-semantics counts for ASCII dictionaries — the
  * property the DuckDB oracle's per-position substring replay relies
  * on. Null text → null.
  */
case class DictionaryTagCounts(child: Expression, phrases: Seq[String])
  extends UnaryExpression with CodegenFallback {

  require(phrases.nonEmpty, "phrase dictionary must not be empty")
  require(phrases.distinct.length == phrases.length, "phrases must be distinct")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_dict_tag"

  // Aho–Corasick automaton, built once per task from the phrase bytes:
  // dense per-state byte→state maps, fail links by BFS, and each
  // state's AGGREGATED hit list (its own terminal phrases plus every
  // terminal reachable via fail links) precomputed so the scan never
  // walks fail chains per position.
  @transient private lazy val automaton: (Array[java.util.HashMap[Byte, Integer]], Array[Int], Array[Array[Int]]) = {
    val pats = phrases.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val next = scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Byte, Integer]())
    val term = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { b =>
        val t = next(s).get(b)
        if (t != null) s = t
        else {
          next += new java.util.HashMap[Byte, Integer]()
          term += Nil
          next(s).put(b, next.size - 1)
          s = next.size - 1
        }
      }
      term(s) ::= pi
    }
    val fail = Array.fill(next.size)(0)
    val hits = Array.fill(next.size)(List.empty[Int])
    val bfs = scala.collection.mutable.Queue.empty[Int]
    next(0).forEach { (_, t) => bfs.enqueue(t) }
    hits(0) = term(0)
    while (bfs.nonEmpty) {
      val s = bfs.dequeue()
      hits(s) = term(s) ::: hits(fail(s))
      next(s).forEach { (b, t) =>
        var f = fail(s)
        var hop = next(f).get(b)
        while (hop == null && f != 0) { f = fail(f); hop = next(f).get(b) }
        fail(t) = if (hop != null && hop != t) hop else 0
        bfs.enqueue(t)
      }
    }
    (next.toArray, fail, hits.map(_.toArray).toArray)
  }

  // per-THREAD scratch: dense counts + the touched-slot list that lets
  // each row reset only what it wrote. ThreadLocal, not a plain field —
  // generated code references the ONE expression instance from every
  // concurrent task in the JVM, so instance fields would race.
  @transient private lazy val scratchTL: ThreadLocal[(Array[Long], Array[Int])] =
    ThreadLocal.withInitial(() =>
      (new Array[Long](phrases.length), new Array[Int](phrases.length)))

  override def nullSafeEval(v: Any): Any = {
    val (next, fail, hits) = automaton
    val (counts, touched) = scratchTL.get()
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var nTouched = 0
    var s = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      var t = next(s).get(b)
      while (t == null && s != 0) { s = fail(s); t = next(s).get(b) }
      s = if (t != null) t else 0
      val h = hits(s)
      var j = 0
      while (j < h.length) {
        val pi = h(j)
        if (counts(pi) == 0L) { touched(nTouched) = pi; nTouched += 1 }
        counts(pi) += 1L
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(touched, 0, nTouched) // ascending phrase idx
    val out = new Array[Any](nTouched)
    var o = 0
    while (o < nTouched) {
      val pi = touched(o)
      out(o) = UTF8String.fromString(s"${pi + 1}:${counts(pi)}")
      counts(pi) = 0L
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): DictionaryTagCounts =
    copy(child = newChild)
}

object DictionaryTagCounts {
  /** Sparse `"idx:count"` tags (1-based phrase index, ascending). */
  def tags(text: Column, phrases: Seq[String]): Column =
    Bridge.column(DictionaryTagCounts(Bridge.expression(text), phrases))
}
