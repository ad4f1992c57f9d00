package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extensions beyond the reference surface; BASELINE.json:6):
  * language-ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything here is a pure Column expression built from codegen'd
  * built-ins (no UDFs): whole-stage codegen keeps these in one fused
  * pass over the corpus, and every function has an exact DuckDB twin for
  * the oracle (same tokenization regex, same integer/double arithmetic).
  */
object TextAnalysis {

  /** Whitespace tokenization — `\s+` on the trimmed text, the common
    * grain shared with DuckDB's regexp_split_to_array. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish token estimate: alpha runs, digit runs, and single
    * non-alnum marks — the standard cheap proxy for subword token count
    * when no tokenizer model is shipped. */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Stopword hit count over a token array (codegen'd array filter, no
    * shuffle, no UDF). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*)))

  // tiny per-language stopword lexicons for the heuristic language-ID
  // (en/de/es/fr by stopword votes, zh by CJK codepoints)
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  /** CJK-codepoint count — decides zh before the stopword vote. */
  def cjkCount(text: Column): Column = regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]"))

  /** Language-ID: per-language stopword scores + deterministic argmax
    * (fixed priority en > de > es > fr on ties; zh wins on any CJK hit).
    * The oracle mirrors the identical CASE chain. */
  def withLangId(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(lower(text))
    val scored = lexicons.foldLeft(df) { case (acc, (lang, words)) =>
      acc.withColumn(s"s_$lang", stopwordHits(toks, words))
    }.withColumn("s_zh", cjkCount(text))
    scored.withColumn(
      "pred_lang",
      when(col("s_zh") > 0, "zh")
        .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
  }

  /** Normalization for fingerprinting: lowercase, strip everything
    * outside [a-z0-9 ] — guarantees ASCII so per-char codepoints agree
    * across engines. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** Rolling polynomial fingerprint h = fold(h*31 + code) mod 1e9+7 over
    * the normalized text — a deterministic document fingerprint whose
    * DuckDB twin is a list_reduce over unicode codepoints. Pure
    * higher-order-function form stays inside whole-stage codegen.
    * (See [[graft.functions.RollingHash]] for the single-pass custom
    * Expression used in the hot path — same result, no char-array
    * materialization.) */
  def fingerprintHof(text: Column): Column =
    aggregate(
      split(normalized(text), ""),
      lit(0L),
      (h, c) => (h * 31 + ascii(c)) % 1000000007L)

  /** Content hash for exact dedup / integrity: md5 hex (lowercase) of
    * the raw text — identical in DuckDB. */
  def contentMd5(text: Column): Column = md5(text)

  /** Exact phrase search via a positional inverted index: every
    * occurrence of the n-token `phrase` as `(doc_id, start_pos)` rows
    * (token-grain positions, overlapping matches included — the
    * distributed grep a corpus pipeline runs for contamination
    * forensics and boilerplate hunting).
    *
    * Scale shape: the token stream is FILTERED to the phrase's words
    * before anything joins (predicate reaches the scan — the posting
    * lists of n words, not the corpus), then n−1 equi-joins on
    * `(doc_id, aligned position)` assemble occurrences. Cost is the
    * phrase words' posting mass, not corpus × phrase — the inverted-
    * index contract; a LIKE scan reads everything, this reads matches.
    * Self-overlapping phrases (repeated words) fall out naturally:
    * each join aligns positions arithmetically, so "x x" in "x x x"
    * yields starts 0 and 1. */
  def phrasePositions(docs: DataFrame, text: Column, id: Column,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val toks = docs
      .select(id.as("doc_id"), posexplode(tokens(text)).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    val first = toks.filter(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos").as("start_pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      val ti = toks.filter(col("tok") === w)
        .select(col("doc_id").as(s"__d$i"), (col("pos") - i).as(s"__p$i"))
      acc.join(ti,
          col("doc_id") === col(s"__d$i") && col("start_pos") === col(s"__p$i"))
        .select(col("doc_id"), col("start_pos"))
    }
  }

  /** Quality metrics. All ratios are integer counts promoted to double
    * with a single division — bit-identical cross-engine. Divisors are
    * nullif-guarded: ANSI mode (Spark 4 default) turns empty-text
    * division into a runtime error, and a corpus WILL contain empty
    * documents. */
  def qualityProjection(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nTok = nullif(size(toks).cast("long"), lit(0L))
    val nChar = length(text)
    val punct = regexp_count(text, lit("[.,!?;:]"))
    val stop = stopwordHits(transform(toks, lower(_)), lexicons.head._2)
    Seq(
      nChar.as("n_chars_calc"),
      size(toks).as("n_tokens"),
      (punct.cast("double") / nullif(nChar.cast("long"), lit(0L))).as("punct_ratio"),
      (stop.cast("double") / nTok).as("stopword_ratio"),
      ((nChar - size(toks) + 1).cast("double") / nTok).as("mean_token_len"))
  }
}
