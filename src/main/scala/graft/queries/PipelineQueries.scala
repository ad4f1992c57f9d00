package graft.queries

import graft.QueryDef
import graft.operators.{CorpusOps, Dedup, EmbeddingAnalytics, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Composed pipeline queries — the operators working together the way a
  * real corpus-preparation job uses them.
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(
    // upper-triangle Gramian of the embedding matrix (the distributed
    // half of PCA); chained-generator pipeline on the Spark side, flat
    // unnest join on the oracle side, decimal-exact sums on both
    QueryDef(
      "embedding_gram",
      """WITH flat AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
        |  FROM embeddings)
        |SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
        |  CAST(sum(CAST(floor(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE) * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS g
        |FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      EmbeddingAnalytics.gramian(
        Tables.table(s, d, "embeddings"), col("embedding"))
    },
    // per-dimension int8 quantization (vector-index compression):
    // float→double widening is exact and the scale arithmetic is
    // IEEE-exact-rounded, so both engines floor the identical double
    QueryDef(
      "embedding_quantize",
      """WITH e AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS pos
        |  FROM embeddings),
        |st AS (SELECT pos, min(v) AS lo, max(v) AS hi FROM e GROUP BY pos)
        |SELECT e.vec_id, CAST(e.pos AS INT) AS pos,
        |  CAST(CASE WHEN hi = lo THEN 0
        |    ELSE least(255, floor((e.v - lo) / (hi - lo) * 255)) END AS BIGINT) AS q
        |FROM e JOIN st ON e.pos = st.pos""".stripMargin) { (s, d) =>
      EmbeddingAnalytics.quantizeInt8(
        Tables.table(s, d, "embeddings"), col("vec_id"), col("embedding"))
    },
    // embedding-cluster cohesion monitoring
    QueryDef(
      "embedding_label_cohesion",
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dims AS (SELECT label,
        |    unnest(range(1, len(v) + 1)) AS dim,
        |    unnest(list_transform(range(1, len(v) + 1), i -> v[i])) AS x
        |  FROM e),
        |cent0 AS (SELECT label, dim,
        |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        |  FROM dims GROUP BY label, dim),
        |cent AS (SELECT label, list(c ORDER BY dim) AS centroid FROM cent0 GROUP BY label),
        |j AS (SELECT e.vec_id, e.label, e.v, cent.centroid FROM e JOIN cent USING (label)),
        |sc AS (SELECT label,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * centroid[i])), (a, b) -> a + b) /
        |    (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (a, b) -> a + b)) *
        |     sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(centroid) + 1), i -> centroid[i] * centroid[i])), (a, b) -> a + b))) AS cos
        |  FROM j)
        |SELECT label, count(*) AS n,
        |  round(CAST(sum(CAST(cos AS DECIMAL(28,12))) AS DOUBLE) / count(*), 6) AS mean_cos
        |FROM sc GROUP BY label""".stripMargin) { (s, d) =>
      EmbeddingAnalytics.labelCohesion(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"), col("label"))
    },
    // per-label centroid drift vs the global corpus centroid — the
    // companion dashboard row to cohesion (is cluster k wandering away
    // from the population?); same decimal-centroid + ordered-fold-dot
    // exactness contract (EmbeddingAnalytics.centroidDrift)
    QueryDef(
      "embedding_centroid_drift",
      """WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |dims AS (SELECT label,
        |    unnest(range(1, len(v) + 1)) AS dim,
        |    unnest(list_transform(range(1, len(v) + 1), i -> v[i])) AS x
        |  FROM e),
        |cent0 AS (SELECT label, dim,
        |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS c
        |  FROM dims GROUP BY label, dim),
        |cent AS (SELECT label, list(c ORDER BY dim) AS centroid FROM cent0 GROUP BY label),
        |g0 AS (SELECT dim,
        |    CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS g
        |  FROM dims GROUP BY dim),
        |g AS (SELECT list(g ORDER BY dim) AS gcent FROM g0)
        |SELECT label,
        |  round(
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(centroid) + 1), i -> centroid[i] * gcent[i])), (a, b) -> a + b) /
        |    (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(centroid) + 1), i -> centroid[i] * centroid[i])), (a, b) -> a + b)) *
        |     sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(gcent) + 1), i -> gcent[i] * gcent[i])), (a, b) -> a + b))), 6) AS drift_cos
        |FROM cent, g""".stripMargin) { (s, d) =>
      EmbeddingAnalytics.centroidDrift(
        Tables.table(s, d, "embeddings"), col("embedding"), col("label"))
    },
    // weighted interleave: even-indexed sources get 3× the sampling
    // density of odd-indexed ones; the emitted prefix (pos ≤ 4.0 in
    // ×10⁶ fixed-point) therefore mixes sources at exactly 3:1 without
    // any global sort (CorpusOps.interleave)
    QueryDef(
      "pipeline_interleave",
      """WITH r AS (SELECT doc_id, source,
        |    CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 3 ELSE 1 END AS w,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source, CAST(((2 * rn - 1) * 1000000) // (2 * w) AS BIGINT) AS pos
        |FROM r WHERE ((2 * rn - 1) * 1000000) // (2 * w) <= 4000000""".stripMargin) { (s, d) =>
      CorpusOps.interleave(
          Tables.table(s, d, "documents"),
          col("source"), col("doc_id"),
          when(substring(col("source"), 4, 10).cast("int") % 2 === 0, 3).otherwise(1))
        .filter(col("pos") <= 4000000L)
        .select(col("doc_id"), col("source"), col("pos"))
    },
    // temperature-smoothed source mixing (p_s ∝ n_s^(1/T), T=2):
    // per-source integer densities relative to the largest source,
    // then the deterministic interleave (CorpusOps.temperatureMix)
    QueryDef(
      "pipeline_temperature_mix",
      """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        |p AS (SELECT source, round(pow(n, 1.0 / 2.0), 6) AS p FROM c),
        |w AS (SELECT source,
        |    greatest(1, CAST(floor(p * 1000 / (SELECT max(p) FROM p)) AS BIGINT)) AS w
        |  FROM p),
        |r AS (SELECT d.doc_id, d.source, w.w,
        |    row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id) AS rn
        |  FROM documents d JOIN w USING (source))
        |SELECT doc_id, source,
        |  CAST(((2 * rn - 1) * 1000000) // (2 * w) AS BIGINT) AS pos
        |FROM r""".stripMargin) { (s, d) =>
      CorpusOps.temperatureMix(
          Tables.table(s, d, "documents"), col("source"), col("doc_id"),
          temperature = 2.0)
        .select(col("doc_id"), col("source"), col("pos"))
    },
    // stratified sampling: per-source rates via deterministic hash
    // buckets (reproducible corpus builds; CorpusOps.stratifiedSample)
    QueryDef(
      "pipeline_stratified_sample",
      """SELECT doc_id, source FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 % 100 <
        |  CASE WHEN source IN ('src0', 'src1', 'src2') THEN 80 ELSE 20 END""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      CorpusOps.stratifiedSample(docs, col("doc_id"),
          when(col("source").isin("src0", "src1", "src2"), 80).otherwise(20))
        .select(col("doc_id"), col("source"))
    },
    // weighted sampling without replacement (Efraimidis–Spirakis keys
    // from md5-deterministic uniforms — longer docs proportionally more
    // likely): one scan + TakeOrdered(k), no corpus shuffle
    QueryDef(
      "pipeline_weighted_sample",
      """WITH keyed AS (
        |  SELECT doc_id, n_chars,
        |    pow(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0,
        |        1.0 / n_chars) AS k
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, n_chars FROM keyed ORDER BY k DESC, doc_id LIMIT 50""".stripMargin) { (s, d) =>
      CorpusOps.weightedTopKSample(
        Tables.table(s, d, "documents").filter(col("n_chars") > 0)
          .select(col("doc_id"), col("n_chars")),
        col("doc_id"), col("n_chars"), 50)
    },
    // quota mixing: top-N per source under a total quality order
    QueryDef(
      "pipeline_quota_mix",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 10""".stripMargin) { (s, d) =>
      CorpusOps.quotaMix(Tables.table(s, d, "documents"), col("source"), 10,
          Seq(col("n_chars").desc, col("doc_id")))
        .select(col("doc_id"), col("source"))
    },
    // context-window packing: concatenate-then-chunk bin assignment
    // (cum sums cast to BIGINT in the oracle — DuckDB widens window
    // sums to HUGEINT, which the driver's pandas comparator floats)
    QueryDef(
      "pipeline_pack_bins",
      """WITH t AS (SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS ntok FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(sum(ntok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ntok AS BIGINT) AS cum
        |  FROM t)
        |SELECT doc_id, cum // 4096 AS bin_id, cum % 4096 AS bin_offset FROM c""".stripMargin) { (s, d) =>
      CorpusOps.packBins(Tables.table(s, d, "documents"), col("doc_id"),
          size(TextAnalysis.tokens(col("text"))).cast("long"), capacity = 4096)
        .select(col("doc_id"), col("bin_id"), col("bin_offset"))
    },
    // corpus-unigram LM scoring: mean log10 token frequency per doc
    // (logs rounded before the DECIMAL sum — order/engine independent)
    QueryDef(
      "text_unigram_logprob",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM tok),
        |f AS (SELECT t, CAST(round(log10(CAST(count(*) AS DOUBLE) / max(n.n)) * 1000000, 0) AS BIGINT) AS lpm
        |  FROM tok, n GROUP BY t)
        |SELECT tok.doc_id, count(*) AS n_tokens,
        |  CAST(CASE WHEN sum(lpm) >= 0 THEN (2 * sum(lpm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(lpm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0 AS mean_logp
        |FROM tok JOIN f USING (t) GROUP BY tok.doc_id""".stripMargin) { (s, d) =>
      CorpusOps.unigramLogProb(Tables.table(s, d, "documents"), col("text"), col("doc_id"))
    },
    // CCNet-style perplexity bucketing: docs split into LM-score
    // quartiles (percentile_disc cutpoints broadcast — the ntile-free
    // feature_binning pattern, no single-task global sort) — the
    // keep-the-fluent-quartiles selection step. Scores are the unigram
    // LM's portable integer-micros means, so cutpoints and compares
    // are exact in both engines.
    QueryDef(
      "quality_perplexity_bucket",
      """WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM tok),
        |f AS (SELECT t, CAST(round(log10(CAST(count(*) AS DOUBLE) / max(n.n)) * 1000000, 0) AS BIGINT) AS lpm
        |  FROM tok, n GROUP BY t),
        |sc AS (SELECT tok.doc_id, count(*) AS n_tokens,
        |    CAST(CASE WHEN sum(lpm) >= 0 THEN (2 * sum(lpm) + count(*)) // (2 * count(*))
        |         ELSE -((2 * (-sum(lpm)) + count(*)) // (2 * count(*))) END AS BIGINT) AS s_micros
        |  FROM tok JOIN f USING (t) GROUP BY tok.doc_id),
        |b AS (SELECT quantile_disc(s_micros, 0.25) AS q1,
        |    quantile_disc(s_micros, 0.5) AS q2,
        |    quantile_disc(s_micros, 0.75) AS q3 FROM sc)
        |SELECT 1 + CAST(s_micros > q1 AS INT) + CAST(s_micros > q2 AS INT)
        |    + CAST(s_micros > q3 AS INT) AS bucket,
        |  count(*) AS n_docs, min(s_micros) AS lo, max(s_micros) AS hi
        |FROM sc, b GROUP BY 1""".stripMargin) { (s, d) =>
      val sc = CorpusOps.unigramScoreMicros(
          Tables.table(s, d, "documents"), col("text"), col("doc_id"))
        .select(col("doc_id"), col("s_micros"))
      val b = sc.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY s_micros)").as("q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s_micros)").as("q2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY s_micros)").as("q3"))
      sc.join(broadcast(b), lit(true))
        .select((lit(1) + (col("s_micros") > col("q1")).cast("int")
          + (col("s_micros") > col("q2")).cast("int")
          + (col("s_micros") > col("q3")).cast("int")).as("bucket"),
          col("s_micros"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("s_micros")).as("lo"), max(col("s_micros")).as("hi"))
    },
    // end-to-end corpus selection: quality gates + language filter +
    // near-dup removal (keep the lower doc_id of each pair)
    QueryDef(
      "pipeline_corpus_select",
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS ltoks FROM documents),
        |q AS (SELECT doc_id, toks, ltoks, len(toks) AS n_tokens,
        |    CAST(len(list_filter(list_transform(toks, x -> lower(x)),
        |         x -> x IN ('the','a','of','and','to','is','in'))) AS DOUBLE) / len(toks) AS swr
        |  FROM t),
        |lang AS (SELECT doc_id,
        |    len(list_filter(ltoks, x -> x IN ('the','a','of','and','to','is','in'))) AS s_en,
        |    len(list_filter(ltoks, x -> x IN ('der','die','das','und','ist','ein'))) AS s_de,
        |    len(list_filter(ltoks, x -> x IN ('el','la','de','y','es','un'))) AS s_es,
        |    len(list_filter(ltoks, x -> x IN ('le','la','les','et','est','un'))) AS s_fr
        |  FROM q),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(toks) - 1),
        |                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM t WHERE len(toks) >= 3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |dups AS (SELECT db AS doc_id FROM inter
        |  JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8)
        |SELECT q.doc_id FROM q
        |JOIN lang ON lang.doc_id = q.doc_id
        |WHERE q.n_tokens BETWEEN 20 AND 1000 AND q.swr >= 0.02
        |  AND lang.s_en >= lang.s_de AND lang.s_en >= lang.s_es AND lang.s_en >= lang.s_fr
        |  AND q.doc_id NOT IN (SELECT doc_id FROM dups)""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      // quality + language gates are independent per-row projections of
      // the SAME rows, so they fuse into one scan with the predicates
      // ANDed — provably equal to the round-2 semi-join of two scans,
      // one corpus pass cheaper
      val gated = TextAnalysis.withLangId(docs, col("text"))
        .select(Seq(col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr")) ++
          TextAnalysis.qualityProjection(col("text")): _*)
        .filter(col("n_tokens").between(20, 1000) && col("stopword_ratio") >= 0.02 &&
          col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"))
      // near-dup removal: drop the higher id of each verified pair
      val dups = Dedup.ngramJaccard(docs, col("text"), col("doc_id"))
        .select(col("doc_b").as("dup_id")).distinct()
      gated.join(dups, col("doc_id") === col("dup_id"), "left_anti")
        .select(col("doc_id"))
    },
    // second-order LM scoring: mean corpus-bigram conditional logprob
    // per doc (CorpusOps.bigramLogProb) — head counts derived from the
    // pair table, one corpus tokenize for the model build
    QueryDef(
      "text_bigram_logprob",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS u
        |  FROM t WHERE len(w) >= 2)),
        |pc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |hc AS (SELECT w1, sum(cb) AS ch FROM pc GROUP BY 1),
        |pr AS (SELECT w1, w2, CAST(round(log10(CAST(cb AS DOUBLE) / ch) * 1000000, 0) AS BIGINT) AS lpm
        |  FROM pc JOIN hc USING (w1))
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(CASE WHEN sum(lpm) >= 0 THEN (2 * sum(lpm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(lpm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0 AS mean_logp
        |FROM bg JOIN pr USING (w1, w2) GROUP BY 1""".stripMargin) { (s, d) =>
      CorpusOps.bigramLogProb(Tables.table(s, d, "documents"), col("text"), col("doc_id"))
    },
    // interpolated Kneser-Ney bigram scoring (D = 0.75): discounted MLE
    // plus continuation mass over DISTINCT CONTEXTS — the standard
    // smoothed LM for perplexity-style quality filtering. Every count
    // is integral; each bigram evaluates one fixed-shape double
    // expression, so the engines agree bit-for-bit before the
    // micros-round (see knBigramLogProb's determinism note).
    QueryDef(
      "text_kn_bigram",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS u
        |  FROM t WHERE len(w) >= 2)),
        |pc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |hc AS (SELECT w1, sum(cb) AS ch, count(*) AS n1w1 FROM pc GROUP BY 1),
        |cc AS (SELECT w2, count(*) AS n1w2 FROM pc GROUP BY 1),
        |nt AS (SELECT count(*) AS n1tot FROM pc),
        |pr AS (SELECT w1, w2, CAST(round(log10(
        |    greatest(CAST(cb AS DOUBLE) - 0.75, 0.0) / ch +
        |    (0.75 * n1w1 / ch) * (CAST(n1w2 AS DOUBLE) / n1tot)
        |  ) * 1000000, 0) AS BIGINT) AS lpm
        |  FROM pc JOIN hc USING (w1) JOIN cc USING (w2), nt)
        |SELECT bg.doc_id, count(*) AS n_bigrams,
        |  CAST(CASE WHEN sum(lpm) >= 0 THEN (2 * sum(lpm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(lpm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0 AS mean_logp
        |FROM bg JOIN pr USING (w1, w2) GROUP BY 1""".stripMargin) { (s, d) =>
      CorpusOps.knBigramLogProb(Tables.table(s, d, "documents"), col("text"), col("doc_id"))
    },
    // FROZEN-LM scoring lifecycle (CorpusOps.writeKnModel /
    // scoreWithKnModel): train the KN bigram LM on the corpus
    // four-fifths, STORE the probability table, score the delta fifth
    // against the stored artifact — the CCNet posture (every crawl
    // batch scores against one fixed pretrained LM so scores stay
    // comparable across batches). Unseen bigrams take the -7.0 log10
    // floor and are counted (n_oov = the drift/retrain signal).
    QueryDef(
      "text_kn_stored",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE doc_id % 5 <> 0),
        |bg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS u
        |  FROM t WHERE len(w) >= 2)),
        |pc AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
        |hc AS (SELECT w1, sum(cb) AS ch, count(*) AS n1w1 FROM pc GROUP BY 1),
        |cc AS (SELECT w2, count(*) AS n1w2 FROM pc GROUP BY 1),
        |nt AS (SELECT count(*) AS n1tot FROM pc),
        |pr AS (SELECT w1, w2, CAST(round(log10(
        |    greatest(CAST(cb AS DOUBLE) - 0.75, 0.0) / ch +
        |    (0.75 * n1w1 / ch) * (CAST(n1w2 AS DOUBLE) / n1tot)
        |  ) * 1000000, 0) AS BIGINT) AS lpm
        |  FROM pc JOIN hc USING (w1) JOIN cc USING (w2), nt),
        |dt AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents WHERE doc_id % 5 = 0),
        |dbg AS (SELECT doc_id, u.w1 AS w1, u.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'w1': w[i], 'w2': w[i+1]})) AS u
        |  FROM dt WHERE len(w) >= 2)),
        |sc AS (SELECT dbg.doc_id, coalesce(pr.lpm, -7000000) AS lpm,
        |    CASE WHEN pr.lpm IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM dbg LEFT JOIN pr USING (w1, w2))
        |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST(CASE WHEN sum(lpm) >= 0 THEN (2 * sum(lpm) + count(*)) // (2 * count(*))
        |       ELSE -((2 * (-sum(lpm)) + count(*)) // (2 * count(*))) END AS DOUBLE) / 1000000.0 AS mean_logp
        |FROM sc GROUP BY 1""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      val path = graft.sources.Tables.scratchDir("graft_kn_model")
      CorpusOps.writeKnModel(
        docs.filter(col("doc_id") % 5 =!= 0), col("text"), path)
      CorpusOps.scoreWithKnModel(s, path,
        docs.filter(col("doc_id") % 5 === 0), col("text"), col("doc_id"))
    },
    // deterministic epoch shuffle: reproducible global permutation via
    // multiplicative hashing + a distributed two-pass rank (no global
    // single-task window, no rand()) — the oracle computes the same
    // rank with a plain window over the identical integer key
    QueryDef(
      "pipeline_shuffle",
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) - 1
        |    AS shuffle_pos
        |FROM documents""".stripMargin) { (s, d) =>
      CorpusOps.deterministicShuffle(Tables.table(s, d, "documents"), col("doc_id"))
        .select(col("doc_id"), col("shuffle_pos"))
    },
    // single-pass pipeline accounting via Dataset.observe: input volume
    // and post-filter survivors are collected AS THE PIPELINE RUNS
    // (CollectMetricsExec accumulators piggyback on the one scan) — at
    // 100 TB the alternative is a second full pass per audit counter.
    // The observed exact integers/decimals become a 1-row DataFrame;
    // the oracle recomputes them relationally with FILTER aggregates.
    QueryDef(
      "pipeline_observed_metrics",
      """SELECT count(*) AS n_in,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_in,
        |  count(*) FILTER (WHERE l_quantity > 45) AS n_kept
        |FROM lineitem""".stripMargin) { (s, d) =>
      import s.implicits._
      val oIn = org.apache.spark.sql.Observation()
      val oOut = org.apache.spark.sql.Observation()
      Tables.table(s, d, "lineitem")
        .select(col("l_quantity")) // scan prunes to the audited column
        .observe(oIn, count(lit(1)).as("n_in"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty_in"))
        .filter(col("l_quantity") > 45)
        .observe(oOut, count(lit(1)).as("n_kept"))
        .foreach(_ => ()) // one full pass; both observation points fire
      Seq((
        oIn.get("n_in").asInstanceOf[Long],
        oIn.get("qty_in").asInstanceOf[java.math.BigDecimal].doubleValue,
        oOut.get("n_kept").asInstanceOf[Long]))
        .toDF("n_in", "qty_in", "n_kept")
    },
    // Poisson(1) bootstrap (CorpusOps.poissonBootstrap): 5 replicates
    // of the per-source corpus totals without materializing a single
    // resampled corpus — replicate counts from fixed inverse-CDF
    // integer thresholds over 48-bit md5 uniforms, bit-portable
    QueryDef(
      "pipeline_bootstrap",
      """WITH rep AS (SELECT doc_id, source, n_chars, CAST(u.r AS BIGINT) AS replicate
        |  FROM documents, unnest(range(5)) AS u(r)),
        |k AS (SELECT replicate, source, n_chars,
        |    CASE WHEN uu < 103548857136060 THEN 0
        |         WHEN uu < 207097714272121 THEN 1
        |         WHEN uu < 258872142840152 THEN 2
        |         WHEN uu < 276130285696162 THEN 3
        |         WHEN uu < 280444821410164 THEN 4
        |         WHEN uu < 281307728552965 THEN 5
        |         WHEN uu < 281451546410098 THEN 6
        |         ELSE 7 END AS k
        |  FROM (SELECT *,
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(replicate AS VARCHAR)), 1, 12))::BIGINT AS uu
        |    FROM rep) t)
        |SELECT replicate, source, CAST(sum(k) AS BIGINT) AS n_rows,
        |  count(*) FILTER (WHERE k > 0) AS n_docs,
        |  CAST(sum(k * n_chars) AS BIGINT) AS sum_chars
        |FROM k GROUP BY 1, 2""".stripMargin) { (s, d) =>
      CorpusOps.poissonBootstrap(Tables.table(s, d, "documents"),
          col("doc_id"), col("source"), col("n_chars"), replicates = 5)
        .withColumnRenamed("stratum", "source")
        .withColumnRenamed("sum_measure", "sum_chars")
    },
    // domain-mixture reweighting (CorpusOps.domainReweight): exact-ppm
    // downsampling rates that reshape the 20-source corpus to a uniform
    // 50000-ppm-per-source target — the scarcest source caps the
    // achievable total, everything else downsamples proportionally
    QueryDef(
      "pipeline_domain_reweight",
      """WITH tok AS (SELECT source, CAST(50000 AS BIGINT) AS target_ppm,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tt AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM tok),
        |t AS (SELECT tok.*, tokens * 1000000 // total AS current_ppm FROM tok, tt),
        |lim AS (SELECT CAST(min(tokens * 1000000 // target_ppm) AS BIGINT) AS tstar FROM t)
        |SELECT source, tokens, CAST(current_ppm AS BIGINT) AS current_ppm, target_ppm,
        |  CAST(least(1000000, tstar * target_ppm // tokens) AS BIGINT) AS rate_ppm,
        |  CAST(least(1000000, tstar * target_ppm // tokens) * tokens // 1000000 AS BIGINT) AS kept_tokens
        |FROM t, lim""".stripMargin) { (s, d) =>
      CorpusOps.domainReweight(Tables.table(s, d, "documents"),
          col("text"), col("source"), lit(50000L))
        .withColumnRenamed("stratum", "source")
    },
    // data-repetition schedule — the UPSAMPLING twin of
    // pipeline_domain_reweight (Muennighoff et al., arXiv:2305.16264:
    // repeating data beats nothing when the budget exceeds the
    // corpus): given a token budget (2× the corpus here) and target
    // shares, each source's rate_ppm = budget·target div tokens may
    // exceed 10⁶ — full passes + a fractional-pass ppm, all exact
    // BIGINT, the reproducible epoch plan a trainer consumes
    QueryDef(
      "pipeline_repetition_schedule",
      """WITH tok AS (SELECT source, CAST(50000 AS BIGINT) AS target_ppm,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |tt AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM tok),
        |r AS (SELECT tok.source, tok.tokens, tok.target_ppm,
        |    (2 * tt.total * tok.target_ppm) // tok.tokens AS rate_ppm
        |  FROM tok, tt)
        |SELECT source, tokens, target_ppm,
        |  CAST(rate_ppm AS BIGINT) AS rate_ppm,
        |  CAST(rate_ppm // 1000000 AS BIGINT) AS full_epochs,
        |  CAST(rate_ppm % 1000000 AS BIGINT) AS frac_ppm
        |FROM r""".stripMargin) { (s, d) =>
      val tok = Tables.table(s, d, "documents")
        .select(col("source"), lit(50000L).as("target_ppm"),
          size(graft.operators.TextAnalysis.tokens(col("text"))).cast("long").as("__ntok"))
        .groupBy("source", "target_ppm").agg(sum(col("__ntok")).as("tokens"))
      val tt = tok.agg(sum(col("tokens")).as("total"))
      tok.crossJoin(broadcast(tt))
        .withColumn("rate_ppm", expr("2 * total * target_ppm div tokens"))
        .select(col("source"), col("tokens"), col("target_ppm"), col("rate_ppm"),
          expr("rate_ppm div 1000000").as("full_epochs"),
          expr("rate_ppm % 1000000").as("frac_ppm"))
    }
  )
}
