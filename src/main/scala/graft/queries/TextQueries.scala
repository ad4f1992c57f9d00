package graft.queries

import graft.QueryDef
import graft.functions.GraftFunctions
import graft.operators.{CorpusOps, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Text-analysis queries over the documents corpus. Tokenization grain
  * shared with the oracle: `\s+` split of trimmed text (DuckDB
  * regexp_split_to_array). Ratios are single double divisions of exact
  * integer counts.
  */
object TextQueries {

  /** Winnowing fingerprint CTE block (k=3, w=4), ending in
    * `fps(doc_id, pos, fp)` — shared by text_winnowing and
    * dedup_winnowing's overlap-join oracle. Normalization, hash fold,
    * window slices, and the rightmost-tie rule mirror
    * `CorpusOps.winnowingFingerprints` exactly. */
  private[queries] val winnowingCtes: String =
    """t0 AS (SELECT doc_id,
      |    regexp_split_to_array(trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), '\s+') AS w
      |  FROM documents),
      |sh AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> {'pos': i - 1, 's': w[i] || ' ' || w[i+1] || ' ' || w[i+2]})) AS e
      |  FROM t0 WHERE len(w) >= 3),
      |hh AS (SELECT doc_id, e.pos AS pos,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(e.s) + 1), c -> CAST(unicode(e.s[c]) AS BIGINT))),
      |      (h, c) -> (h * 31 + c) % 1000000007) AS h
      |  FROM sh),
      |hl AS (SELECT doc_id, list(h ORDER BY pos) AS H FROM hh GROUP BY doc_id),
      |win AS (SELECT doc_id, H, unnest(range(0, greatest(len(H) - 4, 0) + 1)) AS t FROM hl),
      |sel AS (SELECT doc_id, t, H[t+1:t+4] AS sub FROM win),
      |fps AS (SELECT DISTINCT doc_id,
      |  t + len(sub) - list_position(list_reverse(sub), list_min(sub)) AS pos,
      |  list_min(sub) AS fp
      |FROM sel)""".stripMargin

  /** Doubled-separator BPE encode chain — shared by the text_bpe_encode
    * query (both engines) and TextSpec's canonical-walk pin (oracle
    * parity structurally cannot catch a tokenization that is wrong the
    * same way in both engines, so the walk itself is spec-asserted). */
  private[graft] val bpeDemoMerges = Seq("t" -> "h", "th" -> "e", "a" -> "n",
    "an" -> "d", "i" -> "n", "e" -> "r")
  private[graft] val BpeSep = "chr(1)" // U+0001 in BOTH engines
  private[graft] def bpeChainSql(seed: String): String =
    bpeDemoMerges.foldLeft(seed) { case (acc, (l, r)) =>
      s"replace($acc, $BpeSep||'$l'||$BpeSep||$BpeSep||'$r'||$BpeSep, $BpeSep||'$l$r'||$BpeSep)" }
  private[graft] def bpeDisplaySql(sym: String): String =
    s"replace(trim(BOTH $BpeSep FROM $sym), $BpeSep||$BpeSep, ' ')"
  /** Spark-side encode of a word column (name `word`) to display pieces. */
  private[graft] def bpeEncodeSparkSql(word: String): String =
    bpeDisplaySql(bpeChainSql(
      s"$BpeSep||$BpeSep||array_join(split($word, ''), $BpeSep||$BpeSep)||$BpeSep||$BpeSep"))

  /** Shared oracle for text_bpe_encode and text_bpe_apply_stored: the
    * stored-model apply must produce byte-identical pieces to the
    * in-code chain on the shared demo vocabulary. */
  private val bpeEncodeOracle: String =
    s"""WITH t AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)+1), i -> {'wi': i, 'w': ws[i]})) AS u
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
       |w AS (SELECT doc_id, u.wi AS wi, u.w AS w FROM t),
       |enc AS (SELECT doc_id, wi, ${bpeDisplaySql(bpeChainSql(
          s"$BpeSep||$BpeSep||array_to_string(regexp_split_to_array(w, ''), $BpeSep||$BpeSep)||$BpeSep||$BpeSep"))} AS pieces FROM w)
       |SELECT doc_id,
       |  CAST(sum(len(regexp_split_to_array(pieces, ' '))) AS BIGINT) AS n_pieces,
       |  md5(string_agg(pieces, '|' ORDER BY wi)) AS pieces_md5
       |FROM enc GROUP BY doc_id""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // token counting: whitespace tokens + BPE-ish subword estimate
    QueryDef(
      "text_tokens",
      """SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents").select(
        col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"),
        TextAnalysis.bpeishCount(col("text")).as("n_bpeish"))
    },
    // tokenizer fertility by source: sub-word pieces per whitespace
    // word (the tokenizer-eval report that flags sources a vocabulary
    // serves badly — code/URL-heavy domains fragment), in exact
    // integer ppm off the same two counts text_tokens verifies per-doc
    QueryDef(
      "text_fertility_by_source",
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_pieces,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_words,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) * 1000000
        |    // sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS fertility_ppm
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.bpeishCount(col("text"))).as("n_pieces"),
          sum(size(TextAnalysis.tokens(col("text"))).cast("long")).as("n_words"))
        .select(col("source"), col("n_docs"), col("n_pieces"), col("n_words"),
          expr("n_pieces * 1000000 div n_words").as("fertility_ppm"))
    },
    // quality scoring
    QueryDef(
      "text_quality",
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_chars_calc,
        |  len(toks) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE) / nullif(length(text), 0) AS punct_ratio,
        |  CAST(len(list_filter(list_transform(toks, x -> lower(x)),
        |       x -> x IN ('the','a','of','and','to','is','in'))) AS DOUBLE) / nullif(len(toks), 0) AS stopword_ratio,
        |  CAST(length(text) - len(toks) + 1 AS DOUBLE) / nullif(len(toks), 0) AS mean_token_len
        |FROM t""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id") +: TextAnalysis.qualityProjection(col("text")): _*)
    },
    // hashed-feature linear classifier inference (the fastText-shaped
    // quality-filter step): tokens hash to 2^16 buckets via the
    // md5-prefix integer, buckets look up integer-micro weights
    // (hash-derived demo table — a deployment passes trained weights),
    // score = mean weight via the BIGINT half-away division. No float
    // until the final display division, so portable by construction.
    QueryDef(
      "quality_classifier_score",
      """WITH w AS (SELECT i AS bucket,
        |    CAST((i * 2654435761) % 4294967296 % 1000001 - 500000 AS BIGINT) AS wm
        |  FROM range(65536) t(i)),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents),
        |b AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 65536 AS bucket FROM tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(CASE WHEN sum(wm) >= 0 THEN (2 * sum(wm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(wm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0 AS score
        |FROM b JOIN w USING (bucket) GROUP BY doc_id""".stripMargin) { (s, d) =>
      CorpusOps.classifierScore(Tables.table(s, d, "documents"), col("text"),
        col("doc_id"), CorpusOps.hashWeights(s, 65536L), 65536L)
    },
    // inter-rater agreement between two INDEPENDENT quality raters —
    // the Gopher rule battery (pass_all) and the hashed linear
    // classifier (score >= 0): Cohen's kappa from the exact 2x2
    // contingency counts, as a pure BIGINT rational in ppm with a
    // sign-split truncating division (DuckDB // floors while Spark div
    // truncates — they agree only on nonnegative operands, so the sign
    // is factored out first; same discipline as the classifier score).
    // The calibration report a curation stack runs before swapping one
    // filter for another: kappa near 0 means the cheap rule battery
    // and the trained filter are deciding on DIFFERENT signals.
    QueryDef(
      "quality_cohens_kappa",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |tf  AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
        |base AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(max(c) AS BIGINT) AS max_tok, CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(coalesce(sum(c) FILTER (WHERE lower(tk) IN ('the','a','of','and','to','is','in')), 0) AS BIGINT) AS n_stop,
        |    CAST(sum(c * length(tk)) AS BIGINT) AS wc
        |  FROM tf GROUP BY doc_id),
        |ra AS (SELECT doc_id,
        |  ((n_tokens >= 10 AND n_tokens <= 100000)
        |    AND (wc >= 3 * n_tokens AND wc <= 10 * n_tokens)
        |    AND (50 * n_stop >= 3 * n_tokens)
        |    AND (5 * n_distinct >= n_tokens)
        |    AND (5 * max_tok <= n_tokens)) AS a
        |  FROM base),
        |w AS (SELECT i AS bucket,
        |    CAST((i * 2654435761) % 4294967296 % 1000001 - 500000 AS BIGINT) AS wm
        |  FROM range(65536) t(i)),
        |bk AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 8))::BIGINT % 65536 AS bucket FROM tok),
        |rb AS (SELECT doc_id,
        |  (CAST(CASE WHEN sum(wm) >= 0 THEN (2 * sum(wm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(wm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0) >= 0 AS b
        |  FROM bk JOIN w USING (bucket) GROUP BY doc_id),
        |j AS (SELECT ra.a, rb.b FROM ra JOIN rb USING (doc_id)),
        |cts AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(CASE WHEN a AND b THEN 1 END), 0) AS BIGINT) AS n11,
        |  CAST(coalesce(sum(CASE WHEN a AND NOT b THEN 1 END), 0) AS BIGINT) AS n10,
        |  CAST(coalesce(sum(CASE WHEN NOT a AND b THEN 1 END), 0) AS BIGINT) AS n01,
        |  CAST(coalesce(sum(CASE WHEN NOT a AND NOT b THEN 1 END), 0) AS BIGINT) AS n00
        |  FROM j)
        |SELECT n, n11, n10, n01, n00,
        |  CASE WHEN n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) = 0 THEN NULL
        |    WHEN n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) >= 0
        |    THEN CAST((n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) * 1000000
        |      // (n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) AS BIGINT)
        |    ELSE CAST(-((-(n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))) * 1000000
        |      // (n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))) AS BIGINT)
        |  END AS kappa_ppm
        |FROM cts""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      val ra = CorpusOps.gopherRules(docs, col("text"), col("doc_id"))
        .select(col("doc_id"), col("pass_all").as("a"))
      val rb = CorpusOps.classifierScore(docs, col("text"), col("doc_id"),
          CorpusOps.hashWeights(s, 65536L), 65536L)
        .select(col("doc_id"), (col("score") >= 0).as("b"))
      ra.join(rb, Seq("doc_id"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("a") && col("b"), 1L)), lit(0L)).as("n11"),
          coalesce(sum(when(col("a") && !col("b"), 1L)), lit(0L)).as("n10"),
          coalesce(sum(when(!col("a") && col("b"), 1L)), lit(0L)).as("n01"),
          coalesce(sum(when(!col("a") && !col("b"), 1L)), lit(0L)).as("n00"))
        .withColumn("kappa_ppm", expr(
          """CASE WHEN n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) = 0 THEN NULL
            |  WHEN n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) >= 0
            |  THEN (n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))) * 1000000
            |    div (n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))
            |  ELSE -((-(n * (n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)))) * 1000000
            |    div (n * n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00))))
            |END""".stripMargin))
    },
    // heuristic language-ID with deterministic tie-break chain
    QueryDef(
      "text_langid",
      """WITH t AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('the','a','of','and','to','is','in'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('el','la','de','y','es','un'))) AS s_es,
        |  len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) AS s_fr,
        |  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
        |  FROM t)
        |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE WHEN s_zh > 0 THEN 'zh'
        |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |       WHEN s_es >= s_fr THEN 'es'
        |       ELSE 'fr' END AS pred_lang
        |FROM s""".stripMargin) { (s, d) =>
      TextAnalysis
        .withLangId(Tables.table(s, d, "documents"), col("text"))
        .select(col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
          col("s_zh"), col("pred_lang"))
    },
    // top-3 TF-IDF keywords per document (CorpusOps.tfidfTopK):
    // deterministic keyword extraction — scores rounded before ranking,
    // token tie-break, WindowGroupLimit keeps ~3 rows per doc
    QueryDef(
      "text_tfidf_topk",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, t,
        |    round(CAST(tf AS DOUBLE) * log10(CAST(n.n AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN dfreq USING (t), n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, t) AS rnk
        |  FROM s)
        |SELECT doc_id, t AS keyword, rnk, score FROM r WHERE rnk <= 3""".stripMargin) { (s, d) =>
      graft.operators.CorpusOps.tfidfTopK(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"), k = 3)
        .withColumnRenamed("rank", "rnk")
    },
    // token co-occurrence PMI over the 20 most frequent tokens
    // (CorpusOps.cooccurrencePmi): collocation detection with the pair
    // space bounded by the broadcast vocabulary cut, never the corpus
    QueryDef(
      "text_cooccurrence_pmi",
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |top AS (SELECT t, count(*) AS c FROM tok GROUP BY t ORDER BY c DESC, t LIMIT 20),
        |ft AS (SELECT tok.doc_id, tok.t, top.c FROM tok JOIN top USING (t)),
        |p AS (SELECT a.t AS ta, b.t AS tb, count(*) AS c_ab,
        |    min(a.c) AS ca, min(b.c) AS cb
        |  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.t < b.t
        |  GROUP BY a.t, b.t)
        |SELECT ta, tb, c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * nd.nd / (CAST(ca AS DOUBLE) * cb)), 6) AS pmi
        |FROM p, nd""".stripMargin) { (s, d) =>
      graft.operators.CorpusOps.cooccurrencePmi(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"), vocab = 20)
    },
    // BM25 retrieval for a fixed query (CorpusOps.bm25TopK): the RAG
    // ranking stage. Token stream filtered to query terms before the
    // (doc, term) shuffle; ln rounded per the corpus-LM recipe; scores
    // decimal-summed per doc so the top-10 order is total and exact
    QueryDef(
      "text_bm25_topk",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |  WHERE t IN ('join', 'merge', 'vector', 'stream') GROUP BY 1, 2),
        |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |sc AS (SELECT tf.doc_id,
        |    round(round(ln((st.n - df + 0.5) / (df + 0.5) + 1), 6)
        |      * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)), 6) AS s
        |  FROM tf JOIN dfreq USING (t) JOIN dl ON tf.doc_id = dl.doc_id, st)
        |SELECT doc_id, round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        |FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      graft.operators.CorpusOps.bm25TopK(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"),
        query = Seq("join", "merge", "vector", "stream"), k = 10)
    },
    // RM3 pseudo-relevance-feedback expansion (CorpusOps.rm3Bm25TopK):
    // BM25 top-5 feedback docs -> rank-discounted integer term mass ->
    // top-8 expansion terms -> α=0.6-interpolated weighted re-retrieval.
    // Every stage integer or 6dp-pinned; the oracle replays the full
    // two-pass pipeline including the expansion-term selection the
    // engine does driver-side (config-bounded collect, the centroid
    // posture).
    QueryDef(
      "search_rm3_expansion",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |tf0 AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |  WHERE t IN ('join', 'merge', 'vector', 'stream') GROUP BY 1, 2),
        |df0 AS (SELECT t, count(*) AS df FROM tf0 GROUP BY t),
        |sc0 AS (SELECT tf0.doc_id,
        |    round(round(ln((st.n - df + 0.5) / (df + 0.5) + 1), 6)
        |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6) AS s
        |  FROM tf0 JOIN df0 USING (t) JOIN dl ON tf0.doc_id = dl.doc_id, st),
        |base AS (SELECT doc_id, round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        |  FROM sc0 GROUP BY doc_id),
        |fb AS (SELECT doc_id, rnk FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM base) WHERE rnk <= 5),
        |fbtf AS (SELECT tok.doc_id, tok.t, count(*) AS tf, any_value(fb.rnk) AS rnk
        |  FROM tok JOIN fb USING (doc_id) GROUP BY 1, 2),
        |rm0 AS (SELECT t, sum((tf * 1000000 // dl.dl) // rnk) AS rm
        |  FROM fbtf JOIN dl USING (doc_id)
        |  WHERE t NOT IN ('join', 'merge', 'vector', 'stream') GROUP BY t),
        |ex AS (SELECT t, rm FROM (
        |  SELECT t, rm, row_number() OVER (ORDER BY rm DESC, t) AS er FROM rm0 WHERE rm > 0) WHERE er <= 8),
        |rmtot AS (SELECT sum(rm) AS tot FROM ex),
        |w AS (SELECT t, CAST(600000 // 4 AS BIGINT) AS wt
        |    FROM (VALUES ('join'), ('merge'), ('vector'), ('stream')) qv(t)
        |  UNION ALL SELECT ex.t, CAST((1000000 - 600000) * rm // tot AS BIGINT) FROM ex, rmtot),
        |tf1 AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |  WHERE t IN (SELECT t FROM w) GROUP BY 1, 2),
        |df1 AS (SELECT t, count(*) AS df FROM tf1 GROUP BY t),
        |sc1 AS (SELECT tf1.doc_id,
        |    CAST(round(round(round(ln((st.n - df + 0.5) / (df + 0.5) + 1), 6)
        |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6) * w.wt, 0) AS BIGINT) AS s
        |  FROM tf1 JOIN df1 USING (t) JOIN dl ON tf1.doc_id = dl.doc_id JOIN w USING (t), st)
        |SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micros
        |FROM sc1 GROUP BY doc_id ORDER BY score_micros DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      CorpusOps.rm3Bm25TopK(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"),
        query = Seq("join", "merge", "vector", "stream"), k = 10,
        fbDocs = 5, fbTerms = 8, alphaPpm = 600000L)
    },
    // hybrid retrieval: BM25 top-20 and Dirichlet query-likelihood
    // top-20 for the same query, fused by reciprocal-rank fusion
    // (1e6/(60+rank) micros, exact BIGINT sums) — the calibration-free
    // ranker ensemble every lexical+dense stack uses; here the two
    // classic probabilistic rankers stand in as the ensemble arms.
    QueryDef(
      "search_hybrid_rrf",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |st AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
        |  WHERE t IN ('join', 'merge', 'vector', 'stream') GROUP BY 1, 2),
        |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |bsc AS (SELECT tf.doc_id,
        |    round(round(ln((st.n - df + 0.5) / (df + 0.5) + 1), 6)
        |      * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)), 6) AS s
        |  FROM tf JOIN dfreq USING (t) JOIN dl ON tf.doc_id = dl.doc_id, st),
        |bms AS (SELECT doc_id, round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        |  FROM bsc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM bms),
        |ctot AS (SELECT count(*) AS c FROM tok),
        |cf AS (SELECT t, count(*) AS cf FROM tok
        |  WHERE t IN ('join', 'merge', 'vector', 'stream') GROUP BY t),
        |qsc AS (SELECT dl.doc_id,
        |    round(ln((coalesce(tf.tf, 0) + CAST(2000 AS DOUBLE) * (CAST(cf.cf AS DOUBLE) / ctot.c))
        |          / (dl.dl + CAST(2000 AS DOUBLE))), 6) AS s
        |  FROM dl CROSS JOIN cf
        |  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.t = cf.t
        |  CROSS JOIN ctot),
        |qls AS (SELECT doc_id, round(CAST(sum(CAST(s AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
        |  FROM qsc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20),
        |qlr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk FROM qls),
        |u AS (SELECT doc_id, CAST(round(1000000 / (60 + rnk), 0) AS BIGINT) AS c FROM bmr
        |  UNION ALL
        |  SELECT doc_id, CAST(round(1000000 / (60 + rnk), 0) AS BIGINT) AS c FROM qlr)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micros, CAST(count(*) AS BIGINT) AS n_lists
        |FROM u GROUP BY doc_id ORDER BY rrf_micros DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.table(s, d, "documents")
      val terms = Seq("join", "merge", "vector", "stream")
      val w = Window.orderBy(col("score").desc, col("doc_id"))
      // the ranked lists are ≤ 20 rows each — the global window is a
      // deliberate tiny-frame rank, not a scale hazard
      val bm = CorpusOps.bm25TopK(docs, col("text"), col("doc_id"), terms, k = 20)
        .withColumn("rnk", row_number().over(w))
      val ql = CorpusOps.qlDirichletTopK(docs, col("text"), col("doc_id"), terms, k = 20)
        .withColumn("rnk", row_number().over(w))
      CorpusOps.rrfFuse(Seq(bm, ql), k = 10)
    },
    // PII-style scrubbing: redact digit runs and @-handles (the
    // pattern class a curation pipeline masks before training), with
    // per-doc redaction accounting. Patterns stay in the regex subset
    // Java and RE2 agree on.
    QueryDef(
      "text_scrub",
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[0-9]+')) + len(regexp_extract_all(text, '@[A-Za-z0-9_]+')) AS n_redactions,
        |  md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
        |                     '@[A-Za-z0-9_]+', '<USER>', 'g')) AS scrubbed_md5
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents").select(
        col("doc_id"),
        (regexp_count(col("text"), lit("[0-9]+")) +
          regexp_count(col("text"), lit("@[A-Za-z0-9_]+"))).as("n_redactions"),
        md5(regexp_replace(regexp_replace(col("text"), "[0-9]+", "<NUM>"),
          "@[A-Za-z0-9_]+", "<USER>")).as("scrubbed_md5"))
    },
    // intra-document repetition score — the standard LLM-corpus quality
    // signal for boilerplate/looping text: 1 − distinct/total shingles.
    // NON-distinct shingling (the generator without the dedup distinct),
    // one groupBy — docs with < 3 tokens have no shingles and no row,
    // identically in both engines.
    QueryDef(
      "text_repetition",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM t WHERE len(w) >= 3)
        |SELECT doc_id, count(*) AS n_shingles, count(DISTINCT s) AS n_distinct,
        |  round(1 - CAST(count(DISTINCT s) AS DOUBLE) / count(*), 6) AS rep_ratio
        |FROM sh GROUP BY doc_id""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id"),
          graft.functions.ShingleGenerator.shingles(col("text"), 3).as("s"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), countDistinct(col("s")).as("n_distinct"))
        .withColumn("rep_ratio",
          round(lit(1) - col("n_distinct").cast("double") / col("n_shingles"), 6))
    },
    // per-source distribution drift: KL(source ‖ corpus) over token
    // unigrams (CorpusOps.sourceDrift — one corpus tokenize, decimal-
    // stable scoring; the pipeline's source-health monitor)
    QueryDef(
      "text_source_drift",
      """WITH tok AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |cs AS (SELECT source, t, count(*) AS c FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, sum(c) AS n FROM cs GROUP BY 1),
        |ct AS (SELECT t, sum(c) AS c_all FROM cs GROUP BY 1),
        |nt AS (SELECT sum(c_all) AS n_all FROM ct)
        |SELECT cs.source,
        |  CAST(CAST(sum(CAST(cs.c AS DECIMAL(18,0)) *
        |      CAST(round(log10((cs.c * nt.n_all)::DOUBLE / (ct.c_all * ns.n)::DOUBLE), 6)
        |        AS DECIMAL(18,6))) AS DOUBLE) / ns.n AS DOUBLE) AS kl,
        |  CAST(ns.n AS BIGINT) AS n_tokens
        |FROM cs JOIN ct USING (t) JOIN ns USING (source), nt
        |GROUP BY cs.source, ns.n""".stripMargin) { (s, d) =>
      CorpusOps.sourceDrift(Tables.table(s, d, "documents"), col("text"), col("source"))
    },
    // document fingerprinting: custom codegen'd rolling hash (the
    // Catalyst Expression) + md5 content hash. The oracle reproduces the
    // rolling hash with a sequential list_reduce over codepoints.
    QueryDef(
      "text_fingerprint",
      """WITH n AS (SELECT doc_id, text,
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS norm FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, length(norm) + 1),
        |                     i -> CAST(unicode(norm[i]) AS BIGINT))),
        |    (h, c) -> (h * 31 + c) % 1000000007) AS fp,
        |  md5(text) AS content_md5
        |FROM n""".stripMargin) { (s, d) =>
      GraftFunctions.register(s)
      Tables.table(s, d, "documents").select(
        col("doc_id"),
        GraftFunctions.rolling_hash(TextAnalysis.normalized(col("text"))).as("fp"),
        TextAnalysis.contentMd5(col("text")).as("content_md5"))
    },
    // winnowing fingerprints (Schleimer et al., SIGMOD'03 / MOSS):
    // 3-token shingle hashes over normalized text, window-of-4 minima
    // with the paper's rightmost-tie rule, selections deduplicated —
    // the guaranteed-detection local sampler (any shared run of w+k-1
    // tokens shares a fingerprint) at ~2/(w+1) the shingle-index size.
    // Oracle: identical hash fold per shingle, windows as list slices,
    // rightmost min via list_position over the reversed window.
    QueryDef(
      "text_winnowing",
      s"""WITH $winnowingCtes
        |SELECT doc_id, pos, fp FROM fps""".stripMargin) { (s, d) =>
      CorpusOps.winnowingFingerprints(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"), k = 3, w = 4)
    },
    // vocabulary coverage / OOV rate against the corpus top-500 vocab
    // (frequency ties at the boundary break by token text): the
    // tokenizer-fit diagnostic. Exact integer ppm.
    QueryDef(
      "text_vocab_coverage",
      """WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS s FROM documents),
        |v AS (SELECT s FROM (SELECT s, count(*) AS c FROM t GROUP BY s ORDER BY c DESC, s LIMIT 500)),
        |j AS (SELECT t.doc_id, v.s AS vs FROM t LEFT JOIN v ON t.s = v.s)
        |SELECT doc_id, count(*) AS n_tokens,
        |  ((count(*) - count(vs)) * 1000000) // count(*) AS oov_ppm
        |FROM j GROUP BY doc_id""".stripMargin) { (s, d) =>
      CorpusOps.vocabCoverage(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"), 500)
    },
    // first-occurrence novelty in doc_id (crawl) order: ppm of each
    // doc's distinct 3-shingles not present in any earlier doc — the
    // sub-document diversity signal (a re-crawl scores 0)
    QueryDef(
      "text_novelty",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM t WHERE len(w) >= 3),
        |f AS (SELECT s, min(doc_id) AS fd FROM sh GROUP BY s)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |  (CAST(sum(CASE WHEN sh.doc_id = f.fd THEN 1 ELSE 0 END) AS BIGINT) * 1000000) // count(*) AS novel_ppm
        |FROM sh JOIN f ON sh.s = f.s GROUP BY sh.doc_id""".stripMargin) { (s, d) =>
      CorpusOps.noveltyScore(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"))
    },
    // Zipf-exponent recovery from the corpus token distribution — the
    // measurement dual of datagen G3 (which SYNTHESIZES at a chosen s).
    // Exact-decimal least squares on round-6 log10 values.
    QueryDef(
      "text_zipf_exponent",
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS s FROM documents),
        |fr AS (SELECT s, count(*) AS f FROM t GROUP BY s ORDER BY f DESC, s LIMIT 2000),
        |r AS (SELECT f, row_number() OVER (ORDER BY f DESC, s) AS r FROM fr),
        |d AS (SELECT CAST(round(log10(CAST(r AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
        |             CAST(round(log10(CAST(f AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y FROM r),
        |a AS (SELECT count(*) AS n, CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |             CAST(sum(x * y) AS DOUBLE) AS sxy, CAST(sum(x * x) AS DOUBLE) AS sxx FROM d)
        |SELECT n AS n_ranks,
        |  round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 6) AS zipf_exponent
        |FROM a""".stripMargin) { (s, d) =>
      CorpusOps.zipfFit(Tables.table(s, d, "documents"), col("text"))
    },
    // BPE merge-candidate counting (CorpusOps.bpePairCounts): the
    // tokenizer-training inner loop — adjacent char pairs weighted by
    // word frequency, counted over the VOCABULARY-sized word table
    QueryDef(
      "text_bpe_merge",
      """WITH w AS (SELECT s AS w, count(*) AS c FROM
        |    (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS s FROM documents)
        |  GROUP BY 1),
        |p AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, c FROM
        |  (SELECT w, c, unnest(generate_series(1, length(w) - 1)) AS i
        |   FROM w WHERE length(w) >= 2))
        |SELECT pair, CAST(sum(c) AS BIGINT) AS n
        |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin) { (s, d) =>
      CorpusOps.bpePairCounts(Tables.table(s, d, "documents"), col("text"), 20)
    },
    // full iterative BPE TRAINING (CorpusOps.bpeTrain): 6 merges
    // learned round by round — later rounds fuse LEARNED symbols (at
    // sf0.01 step 6 merges 'm'+'er', a symbol step 1 created). The
    // oracle UNROLLS the identical run: both engines hold each word
    // with DOUBLED chr(1) boundaries (the pattern eats one separator
    // per side, the replacement restores it, so back-to-back merges in
    // a run still fire — canonical BPE's leftmost-first walk), and
    // both `replace` scans are left-to-right non-overlapping — so
    // every round's argmax (ties by (lhs, rhs)) and count is replayed
    // step for step.
    QueryDef("text_bpe_train", {
      val n = 6
      val steps = (1 to n).map { k =>
        s"""p$k AS (SELECT u.l AS l, u.r AS r, CAST(sum(c) AS BIGINT) AS n FROM (
           |  SELECT unnest(list_transform(range(1, len(a)), i -> {'l': a[i], 'r': a[i+1]})) AS u, c FROM (
           |    SELECT string_split(trim(w, chr(1)), chr(1)||chr(1)) AS a, c FROM w${k - 1}) WHERE len(a) >= 2) GROUP BY u.l, u.r),
           |m$k AS (SELECT l, r, n FROM p$k ORDER BY n DESC, l, r LIMIT 1),
           |w$k AS (SELECT replace(w.w, chr(1)||m.l||chr(1)||chr(1)||m.r||chr(1), chr(1)||m.l||m.r||chr(1)) AS w, w.c FROM w${k - 1} w, m$k m)""".stripMargin
      }.mkString(",\n")
      val out = (1 to n)
        .map(k => s"SELECT $k AS step, l AS lhs, r AS rhs, n FROM m$k")
        .mkString("\nUNION ALL ")
      s"""WITH words AS (SELECT s AS t, count(*) AS c FROM
         |    (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS s FROM documents) GROUP BY 1),
         |w0 AS (SELECT chr(1)||chr(1) || regexp_replace(t, '(.)', '\\1' || chr(1) || chr(1), 'g') AS w, c FROM words),
         |$steps
         |$out""".stripMargin
    }) { (s, d) =>
      CorpusOps.bpeTrain(Tables.table(s, d, "documents"), col("text"), nMerges = 6)
    },
    // Unicode NFC canonicalization (custom codegen Expression
    // functions.NfcNormalize vs DuckDB's utf8proc nfc_normalize): each
    // doc gets a decomposed "e"+U+0301 suffix appended, so the
    // normalizer provably composes (length shrinks by 1) and the md5
    // pins byte-exact agreement of the full normalized text
    QueryDef(
      "text_nfc_normalize",
      """SELECT doc_id,
        |  length(nfc_normalize(text || 'e' || chr(769))) AS n_norm,
        |  md5(nfc_normalize(text || 'e' || chr(769))) AS h
        |FROM documents""".stripMargin) { (s, d) =>
      // NB: Spark's chr() is ASCII-mod-256, NOT a codepoint constructor
      // (chr(769) would be U+0001) — the combining acute U+0301 is a
      // direct literal here; the DuckDB side uses its codepoint chr(769)
      val norm = GraftFunctions.nfc_normalize(
        concat(col("text"), lit("e\u0301")))
      Tables.table(s, d, "documents").select(
        col("doc_id"), length(norm).as("n_norm"), md5(norm.cast("binary")).as("h"))
    },
    // subword tokenization: greedy longest-match (WordPiece maximal
    // munch) against a fixed vocab — APPLYING a vocab, the step after
    // text_bpe_merge trains one. The custom cursor-loop Expression is
    // the Spark side; the oracle re-derives the same greedy walk as a
    // recursive CTE (one scalar probe per emitted piece), with the SAME
    // vocab literal inlined from WordPiece.demoVocab — one source of
    // truth. Output: per doc, piece count, [UNK] count, and the md5 of
    // the '|'-joined piece sequence (pins every piece and its order).
    QueryDef(
      "text_wordpiece",
      s"""WITH RECURSIVE vocab(p) AS (SELECT unnest(['${graft.functions.WordPiece.demoVocab.mkString("','")}'])),
         |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |words AS (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1),
         |    i -> {'wi': i, 'wd': w[i]})) AS u FROM t),
         |wf AS (SELECT doc_id, u.wi AS wi, u.wd AS wd FROM words),
         |step(doc_id, wi, rest, acc, np, nu) AS (
         |  SELECT doc_id, wi, wd, '', 0, 0 FROM wf
         |  UNION ALL
         |  SELECT doc_id, wi, substr(rest, 1 + coalesce(len(best), 1)),
         |    CASE WHEN acc = '' THEN coalesce(best, '[UNK]')
         |         ELSE acc || '|' || coalesce(best, '[UNK]') END,
         |    np + 1, nu + CASE WHEN best IS NULL THEN 1 ELSE 0 END
         |  FROM (SELECT s.*, (SELECT v.p FROM vocab v WHERE starts_with(s.rest, v.p)
         |                     ORDER BY len(v.p) DESC LIMIT 1) AS best
         |        FROM step s WHERE s.rest <> '') x),
         |fin AS (SELECT doc_id, wi, acc, np, nu FROM step WHERE rest = '')
         |SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces,
         |  CAST(sum(nu) AS BIGINT) AS n_unk,
         |  md5(coalesce(string_agg(acc, '|' ORDER BY wi) FILTER (WHERE acc <> ''), '')) AS pieces_md5
         |FROM fin GROUP BY doc_id""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id"), graft.functions.WordPiece.encode(col("text")).as("pieces"))
        .select(col("doc_id"),
          size(col("pieces")).cast("long").as("n_pieces"),
          size(filter(col("pieces"), p => p === "[UNK]")).cast("long").as("n_unk"),
          md5(concat_ws("|", col("pieces")).cast("binary")).as("pieces_md5"))
    },
    // character-level Shannon entropy (gibberish/encoded-blob
    // detection: natural text sits ~4 bits/char, base64 and
    // hex dumps higher, repeated padding lower). Per-char terms
    // −(k/n)·log₂(k/n) round to integer NANOS — integral values, so
    // the per-doc sum is exact BIGINT and order-independent (the raw
    // double sum would drift under Spark's reduce order)
    QueryDef(
      "text_entropy",
      """WITH ch AS (SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c FROM documents),
        |cf AS (SELECT doc_id, c, CAST(count(*) AS BIGINT) AS k FROM ch GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM cf GROUP BY 1),
        |term AS (SELECT cf.doc_id,
        |    CAST(round(-(CAST(k AS DOUBLE) / n.n) * log2(CAST(k AS DOUBLE) / n.n) * 1000000000, 0) AS BIGINT) AS t
        |  FROM cf JOIN n USING (doc_id))
        |SELECT doc_id, CAST(sum(t) AS BIGINT) AS entropy_nanos, count(*) AS n_distinct_chars
        |FROM term GROUP BY doc_id""".stripMargin) { (s, d) =>
      val cf = Tables.table(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
        .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
      val n = cf.groupBy("doc_id").agg(sum(col("k")).as("n"))
      val p = col("k").cast("double") / col("n")
      cf.join(n, "doc_id")
        .select(col("doc_id"),
          round(-p * log2(p) * 1000000000, 0).cast("long").as("t"))
        .groupBy("doc_id")
        .agg(sum(col("t")).as("entropy_nanos"),
          count(lit(1)).as("n_distinct_chars"))
    },
    // BPE APPLICATION — the inference twin of text_bpe_train: each word
    // becomes a DOUBLED-SEPARATOR symbol string (SS+c+SS+…+SS with
    // SEP = chr(1), exactly bpeTrain's representation) and the fixed
    // merge list applies IN ORDER as replace(SEP+l+SS+r+SEP →
    // SEP+lr+SEP): the pattern consumes one boundary separator each
    // side and restores it, so merges can never span a symbol boundary
    // (ADVICE r5: the old single-separator chain merged 'the'+'r'
    // through the trailing 'e' — not canonical BPE) and back-to-back
    // runs still fuse leftmost-first. The merge table is a deployment
    // artifact, so a FIXED demo list is the honest contract (same
    // stance as WordPiece.demoVocab); both engines build their replace
    // chain from the same Scala value.
    QueryDef("text_bpe_encode", bpeEncodeOracle) { (s, d) =>
      val words = Tables.table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("wi", "w")))
      words
        .select(col("doc_id"), col("wi"),
          expr(bpeEncodeSparkSql("w")).as("pieces"))
        .groupBy("doc_id")
        .agg(
          sum(size(split(col("pieces"), " "))).as("n_pieces"),
          md5(concat_ws("|",
            transform(
              array_sort(collect_list(struct(col("wi"), col("pieces")))),
              x => x.getField("pieces"))).cast("binary")).as("pieces_md5"))
    },
    // stored tokenizer artifact ROUND-TRIP (CorpusOps.writeBpeModel →
    // readBpeModel → bpeEncodeWith): the merge table is persisted as a
    // parquet serving artifact and the encode chain is rebuilt from
    // the STORED rows — completing train→store→apply exactly as the
    // dedup/ANN tiers do (VERDICT r6: text_bpe_encode applied an
    // in-code table; a deployed tokenizer reads its model). Shares
    // text_bpe_encode's oracle: byte-identical pieces on the shared
    // vocabulary IS the round-trip proof.
    QueryDef("text_bpe_apply_stored", bpeEncodeOracle) { (s, d) =>
      import s.implicits._
      val path = Tables.scratchDir("graft_bpe_model")
      CorpusOps.writeBpeModel(
        bpeDemoMerges.zipWithIndex
          .map { case ((l, r), i) => (i + 1, l, r) }
          .toDF("step", "lhs", "rhs"),
        path)
      val stored = CorpusOps.readBpeModel(s, path)
      Tables.table(s, d, "documents")
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("wi", "w")))
        .select(col("doc_id"), col("wi"),
          CorpusOps.bpeEncodeWith(col("w"), stored).as("pieces"))
        .groupBy("doc_id")
        .agg(
          sum(size(split(col("pieces"), " "))).as("n_pieces"),
          md5(concat_ws("|",
            transform(
              array_sort(collect_list(struct(col("wi"), col("pieces")))),
              x => x.getField("pieces"))).cast("binary")).as("pieces_md5"))
    },
    // C4-style boilerplate segment removal (CorpusOps.segmentDedup):
    // 5-token segments occurring in ≥3 distinct docs are cut from every
    // doc, survivors re-join in order — sub-document dedup composing
    // with the document-level Dedup family
    QueryDef(
      "text_segment_dedup",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks FROM documents),
        |seg AS (
        |  SELECT doc_id, CAST(u.i AS BIGINT) AS seg_idx,
        |    array_to_string(toks[(u.i*5+1):(u.i*5+5)], ' ') AS seg
        |  FROM t, unnest(range((len(toks)+4)//5)) AS u(i)),
        |cnt AS (SELECT seg, count(DISTINCT doc_id) AS nd FROM seg GROUP BY seg)
        |SELECT s.doc_id,
        |  count(*) AS n_segments,
        |  count(*) FILTER (WHERE c.nd >= 3) AS n_dropped,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx) FILTER (WHERE c.nd < 3), '') AS kept_text
        |FROM seg s JOIN cnt c USING (seg) GROUP BY s.doc_id""".stripMargin) { (s, d) =>
      CorpusOps.segmentDedup(Tables.table(s, d, "documents"),
        col("text"), col("doc_id"), segTokens = 5, maxDocs = 3)
    },
    // Gopher-style quality rules (CorpusOps.gopherRules): pass/fail
    // flags from exact cross-multiplied integer comparisons — the
    // composed rule battery a pretraining filter actually applies
    QueryDef(
      "text_gopher_rules",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
        |tf  AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
        |base AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(max(c) AS BIGINT) AS max_tok, CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(coalesce(sum(c) FILTER (WHERE lower(tk) IN ('the','a','of','and','to','is','in')), 0) AS BIGINT) AS n_stop,
        |    CAST(sum(c * length(tk)) AS BIGINT) AS wc
        |  FROM tf GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct, n_stop, max_tok,
        |  (n_tokens >= 10 AND n_tokens <= 100000) AS pass_len,
        |  (wc >= 3 * n_tokens AND wc <= 10 * n_tokens) AS pass_wordlen,
        |  (50 * n_stop >= 3 * n_tokens) AS pass_stop,
        |  (5 * n_distinct >= n_tokens) AS pass_distinct,
        |  (5 * max_tok <= n_tokens) AS pass_dominance,
        |  ((n_tokens >= 10 AND n_tokens <= 100000)
        |    AND (wc >= 3 * n_tokens AND wc <= 10 * n_tokens)
        |    AND (50 * n_stop >= 3 * n_tokens)
        |    AND (5 * n_distinct >= n_tokens)
        |    AND (5 * max_tok <= n_tokens)) AS pass_all
        |FROM base""".stripMargin) { (s, d) =>
      CorpusOps.gopherRules(Tables.table(s, d, "documents"),
        col("text"), col("doc_id"))
    },
    // exact phrase search over a positional inverted index
    // (TextAnalysis.phrasePositions): every occurrence of the 2-token
    // phrase "table table" as (doc_id, start_pos) — the token stream is
    // filtered to the phrase's words BEFORE any join (posting-list
    // mass, not corpus mass), then aligned-position equi-joins
    // assemble occurrences, overlapping matches included. The oracle
    // replays the identical positional logic; a LIKE scan would read
    // everything, this reads matches.
    QueryDef(
      "text_phrase_positions",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
        |  FROM documents),
        |p AS (SELECT doc_id, i AS start_pos
        |  FROM t, LATERAL unnest(generate_series(0, len(a) - 2)) u(i)
        |  WHERE a[i + 1] = 'table' AND a[i + 2] = 'table')
        |SELECT doc_id, start_pos FROM p""".stripMargin) { (s, d) =>
      TextAnalysis.phrasePositions(Tables.table(s, d, "documents"),
        col("text"), col("doc_id"), Seq("table", "table"))
    },
    // classifier calibration bins (the reliability diagram behind
    // quality-filter threshold picking): hashed-classifier scores
    // bucketed into 10 equal-width bins over [-0.5, 0.5], per-bin mean
    // score from exact micro-integer sums next to the empirical
    // positive rate (lang = 'en' as the demo label) — a calibrated
    // filter has rate tracking score
    QueryDef(
      "quality_calibration_bins",
      """WITH w AS (SELECT i AS bucket,
        |    CAST((i * 2654435761) % 4294967296 % 1000001 - 500000 AS BIGINT) AS wm
        |  FROM range(65536) t(i)),
        |tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t FROM documents),
        |b AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT % 65536 AS bucket FROM tok),
        |sc AS (SELECT doc_id,
        |    CAST(CASE WHEN sum(wm) >= 0 THEN (2 * sum(wm) + count(*)) // (2 * count(*))
        |         ELSE -((2 * (-sum(wm)) + count(*)) // (2 * count(*))) END AS BIGINT) AS sm
        |  FROM b JOIN w USING (bucket) GROUP BY doc_id),
        |lab AS (SELECT s.doc_id, s.sm, (d.lang = 'en') AS pos
        |  FROM sc s JOIN documents d USING (doc_id))
        |SELECT least(CAST(floor((CAST(sm AS DOUBLE) / 1000000.0 + 0.5) * 10) AS BIGINT), 9) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(sm) AS DOUBLE) / 1000000.0 / count(*), 6) AS mean_score,
        |  round(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM lab GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      val scored = CorpusOps.classifierScore(docs, col("text"), col("doc_id"),
          CorpusOps.hashWeights(s, 65536L), 65536L)
        // score is micros/1e6 — recover the exact micro integer so the
        // per-bin mean sums BIGINTs, not floats
        .select(col("doc_id"),
          round(col("score") * 1000000d).cast("long").as("sm"))
      scored.join(docs.select(col("doc_id"), (col("lang") === "en").as("pos")),
          Seq("doc_id"))
        .groupBy(least(floor((col("sm").cast("double") / 1000000.0 + 0.5) * 10)
          .cast("long"), lit(9L)).as("bin"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("sm")).cast("double") / 1000000.0 / count(lit(1)), 6)
            .as("mean_score"),
          round(sum(when(col("pos"), 1).otherwise(0)).cast("double")
            / count(lit(1)), 6).as("pos_rate"))
    },
    // unigram-LM Viterbi segmentation (functions.UnigramViterbi): the
    // third tokenizer family next to BPE (merge order) and WordPiece
    // (maximal munch) — each word segmented to MAXIMIZE the sum of
    // integer-micro piece log-probs (Kudo '18). The DP reports
    // (best, count-of-optimal-segmentations) per word — tie-PROOF where
    // any argmax path would need an unportable tie-break ("a|aa" vs
    // "aa|a" tie exactly) — and the oracle reproduces both by full path
    // enumeration over the edge DAG + a final argmax/count. [UNK]
    // edges exist only at chars no single-char piece covers, which is
    // what keeps that enumeration polynomial.
    QueryDef(
      "text_unigram_segment",
      s"""WITH RECURSIVE vocab(p, sc) AS (VALUES ${TextQueries.unigramVocab
            .map { case (p, sc) => s"('$p', CAST($sc AS BIGINT))" }.mkString(", ")}),
         |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |words AS (SELECT doc_id, u.wi AS wi, u.wd AS wd FROM
         |  (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1), i -> {'wi': i, 'wd': w[i]})) AS u FROM t)),
         |pos AS (SELECT doc_id, wi, wd, unnest(range(1, len(wd) + 1)) AS i FROM words),
         |ve AS (SELECT pos.doc_id, pos.wi, i AS st, i + len(v.p) AS en, v.sc
         |  FROM pos JOIN vocab v ON substr(pos.wd, pos.i, len(v.p)) = v.p),
         |ue AS (SELECT doc_id, wi, i AS st, i + 1 AS en, CAST(${TextQueries.unigramUnkMicros} AS BIGINT) AS sc
         |  FROM pos WHERE NOT EXISTS (SELECT 1 FROM vocab v WHERE len(v.p) = 1 AND v.p = substr(pos.wd, pos.i, 1))),
         |edges AS (SELECT * FROM ve UNION ALL SELECT * FROM ue),
         |paths(doc_id, wi, lim, pp, sc) AS (
         |  SELECT doc_id, wi, len(wd) + 1, 1, CAST(0 AS BIGINT) FROM words
         |  UNION ALL
         |  SELECT p.doc_id, p.wi, p.lim, e.en, p.sc + e.sc
         |  FROM paths p JOIN edges e ON e.doc_id = p.doc_id AND e.wi = p.wi AND e.st = p.pp
         |  WHERE p.pp < p.lim),
         |fin AS (SELECT doc_id, wi, sc FROM paths WHERE pp = lim),
         |agg AS (SELECT doc_id, wi, max(sc) AS best FROM fin GROUP BY 1, 2),
         |cnt AS (SELECT f.doc_id, f.wi, a.best, count(*) AS n
         |  FROM fin f JOIN agg a ON a.doc_id = f.doc_id AND a.wi = f.wi AND f.sc = a.best
         |  GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(best) AS BIGINT) AS score_micros,
         |  md5(string_agg(best || ':' || n, '|' ORDER BY wi)) AS dp_md5
         |FROM cnt GROUP BY doc_id""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id"), graft.functions.UnigramViterbi.segment(
          col("text"), TextQueries.unigramVocab, TextQueries.unigramUnkMicros).as("seg"))
        .select(col("doc_id"),
          size(col("seg")).cast("long").as("n_words"),
          aggregate(transform(col("seg"),
              x => element_at(split(x, ":"), 1).cast("long")),
            lit(0L), (a, x) => a + x).as("score_micros"),
          md5(array_join(col("seg"), "|").cast("binary")).as("dp_md5"))
    },
    // unigram-LM tokenizer TRAINING (CorpusOps.unigramEmTrain —
    // VERDICT r7 #2): 2 rounds of Viterbi-EM from the demo seed —
    // E-step = exact-integer expected piece counts over each distinct
    // word's tied-optimal segmentations, M-step = keep-set-renormalized
    // round(log10·1e6) scores, bottom-20%-of-multis pruning per round.
    // The oracle enumerates every segmentation path ONCE (the DAG is
    // static — single-char pieces never prune), then replays both
    // rounds by re-scoring the path table — so the TRAINER itself is
    // oracle-verified, not just the apply stage.
    QueryDef("text_unigram_train", TextQueries.unigramTrainOracle) { (s, d) =>
      val vocab = CorpusOps.unigramEmTrain(
        Tables.table(s, d, "documents"), col("text"),
        TextQueries.unigramVocab, TextQueries.unigramUnkMicros, rounds = 2)
      s.createDataFrame(vocab).toDF("p", "score_micros")
    },
    // the trained artifact APPLIED FROM STORAGE — train → store
    // (CorpusOps.writeUnigramModel) → read → segment, completing the
    // third tokenizer family's lifecycle exactly as text_bpe_apply_stored
    // completes BPE's. The oracle composes the unrolled-EM vocabulary
    // with the text_unigram_segment path-enumeration replay, so the
    // end-to-end (trained scores → DP decode) chain is pinned.
    QueryDef("text_unigram_apply_stored",
        TextQueries.unigramApplyStoredOracle) { (s, d) =>
      val vocab = CorpusOps.unigramEmTrain(
        Tables.table(s, d, "documents"), col("text"),
        TextQueries.unigramVocab, TextQueries.unigramUnkMicros, rounds = 2)
      val path = Tables.scratchDir("graft_unigram_model")
      CorpusOps.writeUnigramModel(s, vocab, path)
      val stored = CorpusOps.readUnigramModel(s, path)
      Tables.table(s, d, "documents")
        .select(col("doc_id"), graft.functions.UnigramViterbi.segment(
          col("text"), stored, TextQueries.unigramUnkMicros).as("seg"))
        .select(col("doc_id"),
          size(col("seg")).cast("long").as("n_words"),
          aggregate(transform(col("seg"),
              x => element_at(split(x, ":"), 1).cast("long")),
            lit(0L), (a, x) => a + x).as("score_micros"),
          md5(array_join(col("seg"), "|").cast("binary")).as("dp_md5"))
    }
  )

  /** Scored demo vocabulary for text_unigram_segment (micros = scaled
    * log-probs; values only need to be FIXED, the DP is exact either
    * way) — defs, not vals: `all` above initializes first. */
  private[queries] def unigramVocab: Seq[(String, Long)] = Seq(
    "a" -> -2800000L, "e" -> -2600000L, "t" -> -2500000L, "b" -> -3400000L,
    "l" -> -3000000L, "s" -> -2700000L, "c" -> -3200000L, "n" -> -2900000L,
    "r" -> -3100000L, "o" -> -3300000L,
    "ta" -> -4100000L, "ble" -> -5200000L, "tab" -> -5600000L,
    "le" -> -4300000L, "an" -> -4200000L, "sc" -> -4900000L,
    "scan" -> -7100000L, "ab" -> -4600000L, "row" -> -6200000L,
    "ort" -> -5900000L, "er" -> -4400000L, "in" -> -4500000L,
    "st" -> -4700000L)

  private[queries] def unigramUnkMicros: Long = -7777777L

  /** The Viterbi-EM unroll shared by text_unigram_train and
    * text_unigram_apply_stored: the CTE chain from `documents` to the
    * final trained vocabulary `v2(p, sc)`.
    *
    * Paths are enumerated ONCE over the SEED edge DAG (vocab edges +
    * [UNK] single-char edges where no single-char piece covers; the
    * DAG can only SHRINK across rounds because single-char pieces
    * never prune), each path identified by `pid` and carried as its
    * in-order piece list. Per round r: re-score every path against the
    * current vocabulary (a path using a pruned multi-char piece goes
    * invalid — `bad > 0`), take per-word max + the tied-optimal set,
    * count piece occurrences across that set (c) and its size (n),
    * weight `c·10⁶ // n` by word frequency, prune the bottom 20 % of
    * multi-char pieces by (E asc, p asc), renormalize over the keep
    * set: sc = round(log10(E/ΣE)·10⁶), zero-expectation pieces at the
    * −2·10⁷ floor — `CorpusOps.unigramEmTrain`'s arithmetic verbatim. */
  private[queries] def unigramEmCtes: String = {
    val seedVals = unigramVocab
      .map { case (p, sc) => s"('$p', CAST($sc AS BIGINT))" }.mkString(", ")
    def round(r: Int, vocab: String): String =
      // every multiply-referenced CTE is MATERIALIZED: DuckDB otherwise
      // INLINES each reference, and v1's four round-2 references times
      // k/f/e's internal fan-out re-plans the whole upstream chain
      // multiplicatively — measured minutes-and-fd-exhaustion on 59
      // paths where the materialized form runs in 0.1 s
      s"""ps$r AS MATERIALIZED (SELECT x.pid, x.wd,
         |    sum(CASE WHEN v.p IS NOT NULL THEN v.sc
         |             WHEN len(x.pc) = 1 THEN CAST($unigramUnkMicros AS BIGINT) END) AS sc,
         |    count(*) FILTER (WHERE v.p IS NULL AND len(x.pc) > 1) AS bad
         |  FROM px x LEFT JOIN $vocab v ON v.p = x.pc GROUP BY x.pid, x.wd),
         |b$r AS MATERIALIZED (SELECT wd, max(sc) AS best FROM ps$r WHERE bad = 0 GROUP BY wd),
         |opt$r AS MATERIALIZED (SELECT s.pid, s.wd FROM ps$r s
         |  JOIN b$r b ON b.wd = s.wd AND s.bad = 0 AND s.sc = b.best),
         |n$r AS MATERIALIZED (SELECT wd, count(*) AS n FROM opt$r GROUP BY wd),
         |c$r AS MATERIALIZED (SELECT x.wd, x.pc, count(*) AS c
         |  FROM px x JOIN opt$r o ON o.pid = x.pid JOIN $vocab v ON v.p = x.pc
         |  GROUP BY x.wd, x.pc),
         |e$r AS MATERIALIZED (SELECT c$r.pc AS p, sum(w.freq * ((c$r.c * 1000000) // n$r.n)) AS e
         |  FROM c$r JOIN n$r ON n$r.wd = c$r.wd JOIN words w ON w.wd = c$r.wd
         |  GROUP BY c$r.pc),
         |f$r AS MATERIALIZED (SELECT s.p, coalesce(e$r.e, 0) AS e
         |  FROM $vocab s LEFT JOIN e$r ON e$r.p = s.p),
         |r$r AS MATERIALIZED (SELECT p, e, row_number() OVER (ORDER BY e, p) AS rk
         |  FROM f$r WHERE len(p) > 1),
         |d$r AS MATERIALIZED (SELECT p FROM r$r
         |  WHERE rk <= ((SELECT count(*) FROM r$r) * 200000) // 1000000),
         |k$r AS MATERIALIZED (SELECT p, e FROM f$r WHERE p NOT IN (SELECT p FROM d$r)),
         |v$r AS MATERIALIZED (SELECT p, CASE WHEN e > 0 AND (SELECT sum(e) FROM k$r) > 0
         |    THEN CAST(round(log10(CAST(e AS DOUBLE) / (SELECT sum(e) FROM k$r)) * 1000000, 0) AS BIGINT)
         |    ELSE CAST(-20000000 AS BIGINT) END AS sc FROM k$r)""".stripMargin
    s"""seed(p, sc) AS MATERIALIZED (VALUES $seedVals),
       |t0 AS (SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |w0 AS (SELECT unnest(w) AS wd FROM t0),
       |words AS MATERIALIZED (SELECT wd, count(*) AS freq FROM w0 WHERE wd <> '' GROUP BY wd),
       |pos AS (SELECT wd, unnest(range(1, len(wd) + 1)) AS i FROM words),
       |vedge AS (SELECT pos.wd, pos.i AS st, pos.i + len(v.p) AS en, v.p AS pc
       |  FROM pos JOIN seed v ON substr(pos.wd, pos.i, len(v.p)) = v.p),
       |uedge AS (SELECT wd, i AS st, i + 1 AS en, substr(wd, i, 1) AS pc
       |  FROM pos WHERE NOT EXISTS (SELECT 1 FROM seed v
       |    WHERE len(v.p) = 1 AND v.p = substr(pos.wd, pos.i, 1))),
       |edges AS (SELECT * FROM vedge UNION ALL SELECT * FROM uedge),
       |paths(wd, lim, pp, pcs) AS (
       |  SELECT wd, len(wd) + 1, 1, CAST([] AS VARCHAR[]) FROM words
       |  UNION ALL
       |  SELECT p.wd, p.lim, e.en, list_append(p.pcs, e.pc)
       |  FROM paths p JOIN edges e ON e.wd = p.wd AND e.st = p.pp
       |  WHERE p.pp < p.lim),
       |fin AS MATERIALIZED (SELECT row_number() OVER () AS pid, wd, pcs
       |  FROM paths WHERE pp = lim),
       |px AS MATERIALIZED (SELECT pid, wd, unnest(pcs) AS pc FROM fin),
       |${round(1, "seed")},
       |${round(2, "v1")}""".stripMargin
  }

  private[queries] def unigramTrainOracle: String =
    s"""WITH RECURSIVE $unigramEmCtes
       |SELECT p, sc AS score_micros FROM v2""".stripMargin

  /** Trained vocabulary composed with the text_unigram_segment
    * path-enumeration replay (CTEs prefixed `s` to avoid collision). */
  private[queries] def unigramApplyStoredOracle: String =
    s"""WITH RECURSIVE $unigramEmCtes,
       |st AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
       |swords AS (SELECT doc_id, u.wi AS wi, u.wd AS wd FROM
       |  (SELECT doc_id, unnest(list_transform(range(1, len(w) + 1), i -> {'wi': i, 'wd': w[i]})) AS u FROM st)),
       |spos AS (SELECT doc_id, wi, wd, unnest(range(1, len(wd) + 1)) AS i FROM swords),
       |sve AS (SELECT spos.doc_id, spos.wi, i AS st, i + len(v.p) AS en, v.sc
       |  FROM spos JOIN v2 v ON substr(spos.wd, spos.i, len(v.p)) = v.p),
       |sue AS (SELECT doc_id, wi, i AS st, i + 1 AS en, CAST($unigramUnkMicros AS BIGINT) AS sc
       |  FROM spos WHERE NOT EXISTS (SELECT 1 FROM v2 v WHERE len(v.p) = 1 AND v.p = substr(spos.wd, spos.i, 1))),
       |sedges AS (SELECT * FROM sve UNION ALL SELECT * FROM sue),
       |spaths(doc_id, wi, lim, pp, sc) AS (
       |  SELECT doc_id, wi, len(wd) + 1, 1, CAST(0 AS BIGINT) FROM swords
       |  UNION ALL
       |  SELECT p.doc_id, p.wi, p.lim, e.en, p.sc + e.sc
       |  FROM spaths p JOIN sedges e ON e.doc_id = p.doc_id AND e.wi = p.wi AND e.st = p.pp
       |  WHERE p.pp < p.lim),
       |sfin AS (SELECT doc_id, wi, sc FROM spaths WHERE pp = lim),
       |sagg AS (SELECT doc_id, wi, max(sc) AS best FROM sfin GROUP BY 1, 2),
       |scnt AS (SELECT f.doc_id, f.wi, a.best, count(*) AS n
       |  FROM sfin f JOIN sagg a ON a.doc_id = f.doc_id AND a.wi = f.wi AND f.sc = a.best
       |  GROUP BY 1, 2, 3)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(best) AS BIGINT) AS score_micros,
       |  md5(string_agg(best || ':' || n, '|' ORDER BY wi)) AS dp_md5
       |FROM scnt GROUP BY doc_id""".stripMargin
}
