package graft.queries

import graft.QueryDef
import graft.operators.{Curation, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Corpus-curation queries — benchmark decontamination, RAG chunking,
  * reproducible splits/samples, distribution profiling, and the skew
  * diagnostic that generalizes the reference thesis's §6.4 failure
  * analysis into a reusable operator.
  */
object CurationQueries {

  val all: Seq[QueryDef] = Seq(
    // benchmark decontamination: src0 plays the eval set; every other
    // source is corpus. A doc is contaminated if it shares any word
    // 3-shingle with the eval set; n_shared counts its distinct shared
    // shingles (triage order for manual review).
    QueryDef(
      "pipeline_decontaminate",
      """WITH t AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, source,
        |    unnest(list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM t WHERE len(w) >= 3),
        |bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0')
        |SELECT c.doc_id, count(*) AS n_shared
        |FROM sh c JOIN bench USING (s) WHERE c.source <> 'src0'
        |GROUP BY c.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      Curation.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        col("text"), col("doc_id"))
    },
    // SEMANTIC decontamination (Similarity.decontaminateSemantic): the
    // embedding-space complement of the shingle overlap above — flags
    // corpus docs whose embedding cosine to ANY src0 (eval) embedding
    // reaches 0.35, catching paraphrase-class contamination 3-gram
    // overlap misses. Eval side broadcasts whole (a benchmark is
    // bounded); the corpus never shuffles. Oracle is the same all-pairs
    // max the engine computes, spelled as the fold.
    QueryDef(
      "pipeline_decontaminate_semantic",
      """WITH n AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |    sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))), (x, y) -> x + y)) AS nrm
        |  FROM embeddings),
        |j AS (SELECT n.vec_id, n.v, n.nrm, d.source FROM n JOIN documents d ON n.vec_id = d.doc_id),
        |ev AS (SELECT v, nrm FROM j WHERE source = 'src0'),
        |co AS (SELECT vec_id, v, nrm FROM j WHERE source <> 'src0'),
        |p AS (SELECT co.vec_id AS doc_id,
        |    max(list_reduce(list_prepend(0.0, list_transform(range(1, len(co.v) + 1), i -> co.v[i] * ev.v[i])), (x, y) -> x + y) / (co.nrm * ev.nrm)) AS mx
        |  FROM co CROSS JOIN ev GROUP BY 1)
        |SELECT doc_id, round(mx, 6) AS max_eval_cos,
        |  CASE WHEN mx < 0.35 THEN 1 ELSE 0 END AS kept FROM p""".stripMargin) { (s, d) =>
      import graft.operators.Similarity
      val emb = Tables.table(s, d, "embeddings")
      val srcs = Tables.table(s, d, "documents").select(col("doc_id"), col("source"))
      val j = emb.join(srcs, col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"), col("source"))
      Similarity.decontaminateSemantic(
        j.filter(col("source") =!= "src0"), j.filter(col("source") === "src0"),
        col("embedding"), col("vec_id"), threshold = 0.35)
    },
    // overlapping token chunks (window 32, stride 24 ⇒ 8-token overlap)
    QueryDef(
      "text_chunk_overlap",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id, w, len(w) AS n,
        |    1 + (greatest(0, len(w) - 32) + 23) // 24 AS nc FROM t),
        |e AS (SELECT doc_id, n, unnest(range(0, nc)) AS i FROM c)
        |SELECT e.doc_id, CAST(e.i AS BIGINT) AS chunk_idx,
        |  least(32, e.n - e.i * 24) AS n_tok,
        |  array_to_string(list_slice(c.w, e.i * 24 + 1, least(e.i * 24 + 32, e.n)), ' ') AS chunk_text
        |FROM e JOIN c ON e.doc_id = c.doc_id""".stripMargin) { (s, d) =>
      Curation.chunkOverlap(
        Tables.table(s, d, "documents"), col("text"), col("doc_id"),
        window = 32, stride = 24)
    },
    // sorted-token-multiset dedup (catches word-order shuffles that
    // byte-exact dedup misses)
    QueryDef(
      "dedup_bow",
      """SELECT md5(array_to_string(list_sort(regexp_split_to_array(trim(text), '\s+')), ' ')) AS bow_md5,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin) { (s, d) =>
      Curation.bagOfWords(Tables.table(s, d, "documents"), col("text"), col("doc_id"))
    },
    // stateless reproducible train/val/test assignment (80/10/10)
    QueryDef(
      "pipeline_train_split",
      """SELECT doc_id,
        |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin) { (s, d) =>
      Curation.trainSplit(Tables.table(s, d, "documents"), col("doc_id"))
        .select(col("doc_id"), col("split"))
    },
    // weighted Bernoulli sample: keep probability n_chars/1000 (capped)
    QueryDef(
      "sample_weighted",
      """SELECT doc_id, n_chars FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 % 1000000 < least(n_chars, 1000) * 1000""".stripMargin) { (s, d) =>
      Curation.weightedSample(
        Tables.table(s, d, "documents"), col("doc_id"), col("n_chars"),
        maxWeight = 1000, perWeightPpm = 1000)
        .select(col("doc_id"), col("n_chars"))
    },
    // robust per-source length profile: median, MAD, count outside 3·MAD
    QueryDef(
      "quality_mad_outliers",
      """WITH m AS (SELECT source AS grp, median(n_chars) AS med FROM documents GROUP BY source),
        |d AS (SELECT m.grp, dd.n_chars, m.med, abs(dd.n_chars - m.med) AS dev
        |  FROM documents dd JOIN m ON dd.source = m.grp),
        |a AS (SELECT grp, median(dev) AS mad FROM d GROUP BY grp)
        |SELECT d.grp, count(*) AS n, min(d.med) AS med, min(a.mad) AS mad,
        |  count(CASE WHEN abs(d.n_chars - d.med) > 3 * a.mad THEN 1 END) AS n_outliers
        |FROM d JOIN a ON d.grp = a.grp
        |GROUP BY d.grp""".stripMargin) { (s, d) =>
      Curation.madOutliers(
        Tables.table(s, d, "documents"), col("source"), col("n_chars"))
    },
    // key-distribution skew diagnostic over the join key the reference
    // benchmarks on (thesis §6.4: sort-merge died at Zipf s≈1.0 — this
    // one-row profile is the advance warning)
    QueryDef(
      "datagen_skew_profile",
      """WITH f AS (SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |h AS (SELECT c, count(*) AS m FROM f GROUP BY c),
        |h2 AS (SELECT c, m,
        |    COALESCE(sum(m) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
        |  FROM h),
        |s AS (SELECT CAST(sum(m) AS HUGEINT) AS nk, CAST(sum(c * m) AS HUGEINT) AS nr,
        |    max(c) AS maxf,
        |    CAST(sum(CAST(c AS HUGEINT) * (m * start + (m * (m + 1)) // 2)) AS HUGEINT) AS s1
        |  FROM h2)
        |SELECT CAST(nk AS BIGINT) AS n_keys, CAST(nr AS BIGINT) AS n_rows, maxf AS max_freq,
        |  CAST(CAST(maxf AS HUGEINT) * 1000000 // nr AS BIGINT) AS top1_ppm,
        |  CAST((2 * s1 - (nk + 1) * nr) * 1000000 // (nk * nr) AS BIGINT) AS gini_ppm
        |FROM s""".stripMargin) { (s, d) =>
      Curation.skewProfile(Tables.table(s, d, "lineitem"), col("l_orderkey"))
    },
    // dataset-card rollup: the per-(source, lang) composition block a
    // corpus release documents — counts, volume, exact-decimal mean
    // length, corpus share in integer ppm, and exact distinct texts.
    // ONE corpus pass: the total for share_ppm comes from a window sum
    // over the tiny grouped result, not a second scan.
    QueryDef(
      "pipeline_dataset_card",
      """WITH g AS (SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean_chars,
        |    count(DISTINCT md5(text)) AS n_unique
        |  FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, total_chars, mean_chars,
        |  CAST(n_docs * 1000000 // sum(n_docs) OVER () AS BIGINT) AS share_ppm,
        |  n_unique
        |FROM g""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          (sum(col("n_chars").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("mean_chars"),
          count_distinct(md5(col("text"))).as("n_unique"))
        .withColumn("share_ppm",
          expr("CAST(n_docs * 1000000 div sum(n_docs) OVER () AS BIGINT)"))
        .select(col("source"), col("lang"), col("n_docs"), col("total_chars"),
          col("mean_chars"), col("share_ppm"), col("n_unique"))
    },
    // per-source quantile normalization: a doc's length mapped to its
    // within-source percentile — the calibration that makes quality
    // thresholds comparable across sources with different length
    // distributions. percent_rank over a doc_id-tie-broken order is
    // deterministic and dyadic-exact in both engines.
    QueryDef(
      "quality_quantile_normalize",
      """SELECT doc_id, source, n_chars,
        |  percent_rank() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS qn
        |FROM documents""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          percent_rank().over(
            Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id")))
            .as("qn"))
    },
    // one-pass dataset-card column profile over lineitem's key/measure
    // columns (single aggregation job for all columns)
    QueryDef(
      "profile_columns", {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount")
        cols.map(c =>
          s"""SELECT '$c' AS col_name,
             |  count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
             |  count(DISTINCT $c) AS n_distinct,
             |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v
             |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
      }) { (s, d) =>
      Curation.profileColumns(
        Tables.table(s, d, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_discount"))
    },
    // referential-integrity audit over the star schema's FK constraints
    // (Curation.referentialAudit): orphans measured BEFORE any join
    // silently drops them. Expected orphan_rows = 0 on this testdata —
    // the totals/distincts carry the information content.
    QueryDef(
      "audit_referential", {
        val constraints = Seq(
          ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
          ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"))
        constraints.map { case (name, child, ck, parent, pk) =>
          s"""SELECT '$name' AS constraint_name,
             |  count(*) AS child_rows, count(DISTINCT $ck) AS distinct_keys,
             |  count(CASE WHEN $ck IS NULL THEN 1 END) AS null_keys,
             |  count(CASE WHEN $ck IS NOT NULL AND p.$pk IS NULL THEN 1 END) AS orphan_rows
             |FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p ON c.$ck = p.$pk""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (s, d) =>
      def t(n: String) = Tables.table(s, d, n)
      Curation.referentialAudit(Seq(
        ("lineitem.l_orderkey->orders", t("lineitem"), col("l_orderkey"),
          t("orders"), col("o_orderkey")),
        ("lineitem.l_partkey->part", t("lineitem"), col("l_partkey"),
          t("part"), col("p_partkey")),
        ("lineitem.l_suppkey->supplier", t("lineitem"), col("l_suppkey"),
          t("supplier"), col("s_suppkey")),
        ("orders.o_custkey->customer", t("orders"), col("o_custkey"),
          t("customer"), col("c_custkey")),
        ("customer.c_nationkey->nation", t("customer"), col("c_nationkey"),
          t("nation"), col("n_nationkey"))))
    },
    // chi-square independence of (source, lang): the composition-drift
    // significance test behind the dataset card (Curation.chiSquare) —
    // exact-decimal term accumulation, one |A|x|B|-cell aggregate
    QueryDef(
      "stats_chi_square",
      """WITH c AS (SELECT source AS a, lang AS b, count(*) AS o FROM documents GROUP BY 1, 2),
        |m AS (SELECT a, b, o,
        |    sum(o) OVER (PARTITION BY a) AS ra,
        |    sum(o) OVER (PARTITION BY b) AS cb,
        |    sum(o) OVER () AS n FROM c),
        |t AS (SELECT a, b,
        |    CAST(round((CAST(o AS DOUBLE) - CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE) - CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE))
        |      / (CAST(ra * cb AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS DECIMAL(28,6)) AS term
        |  FROM m)
        |SELECT (count(DISTINCT a) - 1) * (count(DISTINCT b) - 1) AS dof,
        |  CAST(sum(term) AS DOUBLE) AS chi2
        |FROM t""".stripMargin) { (s, d) =>
      Curation.chiSquare(
        Tables.table(s, d, "documents"), col("source"), col("lang"))
    },
    // equi-width numeric histogram (20 bins) — the distribution profile
    // behind every data-quality dashboard. min/max join in as a
    // broadcast scalar; bin assignment is identical IEEE arithmetic in
    // both engines ((v-lo)*20.0/(hi-lo), floored, top edge clamped), so
    // exact counts and per-bin extrema hash-match. One scan + one
    // bounded (≤20-row) aggregation — the 100 TB profile shape.
    QueryDef(
      "profile_histogram",
      """WITH mm AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem)
        |SELECT CASE WHEN hi = lo THEN 0
        |    ELSE least(CAST(floor((l_extendedprice - lo) * 20.0 / (hi - lo)) AS BIGINT), 19)
        |    END AS bin,
        |  count(*) AS n, min(l_extendedprice) AS bin_min, max(l_extendedprice) AS bin_max
        |FROM lineitem, mm GROUP BY 1""".stripMargin) { (s, d) =>
      Curation.histogram(
        Tables.table(s, d, "lineitem"), col("l_extendedprice"), bins = 20)
    },
    // leakage-safe train/val/test split: assignment is keyed by the
    // near-dup CLUSTER representative, so near-copies can never land on
    // opposite sides of an eval boundary (the dedup-aware split rule
    // serious eval hygiene requires; singletons key by themselves)
    QueryDef(
      "pipeline_leakage_safe_split",
      s"""WITH RECURSIVE ${DedupQueries.clusterCtes},
         |cc AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
         |SELECT d.doc_id, coalesce(cc.rep, d.doc_id) AS rep,
         |  CASE WHEN (coalesce(cc.rep, d.doc_id) * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
         |       WHEN (coalesce(cc.rep, d.doc_id) * 2654435761) % 4294967296 % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.node""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      val cc = Dedup.dedupClusters(
        Dedup.ngramJaccard(docs, col("text"), col("doc_id")))
      val keyed = docs.join(cc, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          coalesce(col("cluster_rep"), col("doc_id")).as("rep"))
      Curation.trainSplit(keyed, col("rep")).select(col("doc_id"), col("rep"), col("split"))
    },
    // two-sample KS drift per source vs the rest of the corpus on doc
    // length — exact integer ppm, cross-multiplied CDFs (no float div)
    QueryDef(
      "quality_ks_drift",
      """WITH b AS (SELECT source AS g, n_chars AS x FROM documents),
        |c AS (SELECT g, x, count(*) AS c FROM b GROUP BY g, x),
        |xs AS (SELECT DISTINCT x FROM c),
        |gs AS (SELECT DISTINCT g FROM c),
        |f AS (SELECT gs.g, xs.x, coalesce(c.c, 0) AS c
        |  FROM gs CROSS JOIN xs LEFT JOIN c ON gs.g = c.g AND xs.x = c.x),
        |cum AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum FROM f),
        |ca AS (SELECT x, sum(c) AS ca FROM c GROUP BY x),
        |call AS (SELECT x, sum(ca) OVER (ORDER BY x) AS cumall FROM ca),
        |tot AS (SELECT g, sum(c) AS s FROM c GROUP BY g),
        |n AS (SELECT sum(c) AS nn FROM c),
        |d AS (SELECT cum.g, tot.s, n.nn,
        |    abs(CAST(cum.cum AS HUGEINT) * (n.nn - tot.s)
        |      - CAST(call.cumall - cum.cum AS HUGEINT) * tot.s) AS diff
        |  FROM cum JOIN call USING (x) JOIN tot ON cum.g = tot.g, n)
        |SELECT g, CAST(min(s) AS BIGINT) AS n_rows,
        |  CAST(max(diff) * 1000000 // (CAST(min(s) AS HUGEINT) * (min(nn) - min(s))) AS BIGINT) AS ks_ppm
        |FROM d GROUP BY g""".stripMargin) { (s, d) =>
      Curation.ksDrift(Tables.table(s, d, "documents"), col("source"), col("n_chars"))
    },
    // DSIR importance weights (Xie et al. 2023): src0 plays the target
    // domain, everything else is the raw pool; per-doc weight = summed
    // smoothed log-likelihood ratio of its unigram+bigram features
    QueryDef(
      "pipeline_importance_weights",
      s"""WITH $importanceWeightCtes
         |SELECT feat.doc_id, count(*) AS n_feat,
         |  round(CAST(sum(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS logw
         |FROM feat JOIN r USING (f)
         |WHERE feat.source <> 'src0'
         |GROUP BY feat.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      Curation.importanceWeights(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        col("text"), col("doc_id"))
    },
    // hashed-feature DSIR (B = 2²⁰ buckets): the 100 TB configuration.
    // xxhash64 bucketing has no DuckDB twin, so the query fn
    // materializes the Spark-computed feature→bucket mapping as a
    // per-run fixture table and the oracle REPLAYS the bucketed DSIR
    // arithmetic over it — the weights are hash-checked end-to-end,
    // with only the per-feature hash evaluation taken from Spark.
    // (Bucket = pmod(xxhash64(f), B) is a pure function of f, so
    // fixtures from different scale factors are mutually-consistent
    // supersets; the oracle globs them all and dedups by feature.)
    QueryDef(
      "pipeline_importance_hashed",
      s"""WITH $importanceWeightCtes,
         |bmap AS (SELECT f, min(fb) AS fb
         |  FROM read_parquet('$dsirBucketMapDir/*/*.parquet') GROUP BY f),
         |featb AS (SELECT feat.doc_id, feat.source, bmap.fb AS f
         |  FROM feat JOIN bmap USING (f)),
         |tfb AS (SELECT f, count(*) AS tc FROM featb WHERE source = 'src0' GROUP BY f),
         |rfb AS (SELECT f, count(*) AS rc FROM featb WHERE source <> 'src0' GROUP BY f),
         |vocabb AS (SELECT DISTINCT f FROM featb),
         |vb AS (SELECT count(*) AS v FROM vocabb),
         |tnb AS (SELECT sum(tc) AS tnn FROM tfb),
         |rnb AS (SELECT sum(rc) AS rnn FROM rfb),
         |rb AS (SELECT vocabb.f,
         |    round(log10((coalesce(tfb.tc, 0) + 1.0) / (tnb.tnn + vb.v))
         |        - log10((coalesce(rfb.rc, 0) + 1.0) / (rnb.rnn + vb.v)), 6) AS lr
         |  FROM vocabb LEFT JOIN tfb USING (f) LEFT JOIN rfb USING (f), tnb, rnb, vb)
         |SELECT featb.doc_id, count(*) AS n_feat,
         |  round(CAST(sum(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS logw
         |FROM featb JOIN rb USING (f)
         |WHERE featb.source <> 'src0'
         |GROUP BY featb.doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      // fixture write is an eager side effect of the query fn — Verify
      // runs every fn before dumping oracle_sql.json, so the mapping is
      // always on disk by the time DuckDB replays it
      Curation.dsirBucketMap(docs, col("text"), col("doc_id"), buckets = 1 << 20)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dsirBucketMapDir/${new java.io.File(d).getName}")
      Curation.importanceWeightsHashed(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        col("text"), col("doc_id"), buckets = 1 << 20)
    },
    // DSIR selection: Gumbel-top-k over the weights (sampling ∝ exp(w)
    // without replacement), md5-deterministic noise
    QueryDef(
      "pipeline_importance_resample",
      s"""WITH $importanceWeightCtes,
         |wts AS (
         |  SELECT feat.doc_id, count(*) AS n_feat,
         |    round(CAST(sum(CAST(lr AS DECIMAL(28,12))) AS DOUBLE), 6) AS logw
         |  FROM feat JOIN r USING (f)
         |  WHERE feat.source <> 'src0'
         |  GROUP BY feat.doc_id),
         |g AS (SELECT doc_id, n_feat, logw,
         |    round(-ln(-ln(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         |                  / 4294967296.0)), 6) AS gumbel
         |  FROM wts)
         |SELECT doc_id, n_feat, logw, gumbel
         |FROM g ORDER BY logw + gumbel DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
      val docs = Tables.table(s, d, "documents")
      Curation.importanceResample(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        col("text"), col("doc_id"), k = 100)
    },
    // k-anonymity audit over quasi-identifiers (nation, market
    // segment): equivalence-class sizes with a below-k flag — the
    // suppression/generalization work list a release pipeline consumes
    // (Sweeney 2002). One aggregate, exact integers.
    QueryDef(
      "privacy_k_anonymity",
      """WITH g AS (SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey, c_mktsegment, n, (n < 10) AS below_k
        |FROM g""".stripMargin) { (s, d) =>
      Tables.table(s, d, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          (col("n") < 10).as("below_k"))
    },
    // Laplace-mechanism noisy counts (ε = 0.5, sensitivity 1, so
    // b = 2): the DP release shape for per-category counts. The noise
    // draw inverts the Laplace CDF over a 48-bit md5 uniform of the
    // category — SEEDED, so the release is reproducible and the
    // oracle replays it exactly; a production ε-DP release swaps the
    // seeded uniform for true randomness, everything else unchanged.
    // Integer-micros output, no float in the stored result.
    QueryDef(
      "privacy_dp_counts",
      """WITH g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |u AS (SELECT event_type, n,
        |    ('0x' || substr(md5(event_type), 1, 12))::BIGINT / 281474976710656.0 AS u
        |  FROM g)
        |SELECT event_type, n,
        |  CAST(round((CASE WHEN u >= 0.5 THEN -ln(2 * (1 - u)) ELSE ln(2 * u) END) * 2.0 * 1000000, 0) AS BIGINT) AS noise_micros,
        |  CAST(n * 1000000 + CAST(round((CASE WHEN u >= 0.5 THEN -ln(2 * (1 - u)) ELSE ln(2 * u) END) * 2.0 * 1000000, 0) AS BIGINT) AS BIGINT) AS noisy_micros
        |FROM u""".stripMargin) { (s, d) =>
      val g = Tables.table(s, d, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      val u = conv(substring(md5(col("event_type")), 1, 12), 16, 10)
        .cast("long").cast("double") / 281474976710656.0
      val lap = when(u >= 0.5, -log(lit(2) * (lit(1) - u)))
        .otherwise(log(lit(2) * u)) * 2.0
      g.select(col("event_type"), col("n"),
          round(lap * 1000000, 0).cast("long").as("noise_micros"))
        .withColumn("noisy_micros",
          col("n") * 1000000L + col("noise_micros"))
    },
    // blocklist tagging (functions.DictionaryTagCounts): one
    // Aho-Corasick pass counts every phrase of the dictionary —
    // INCLUDING overlapping occurrences ("table table table" hits
    // "table table" twice) — where the per-phrase regexp alternative
    // is |dict| scans each missing overlaps. Output is SPARSE
    // "idx:count" tags so per-row cost is O(bytes + matches), flat in
    // dictionary size (the dense form measured linear in |dict| at 1 M
    // docs — see EXPERIMENTS.md). The oracle replays the definition per
    // phrase as a per-position substring probe, then sparsifies the
    // same way; the dictionary literal is shared from
    // CurationQueries.demoBlocklist, one source of truth.
    QueryDef(
      "text_blocklist_tags",
      s"""WITH c AS (SELECT doc_id, list_transform(range(1, len(ph) + 1),
         |      i -> {'i': i, 'c': CAST(len(list_filter(range(1, len(text) - len(ph[i]) + 2),
         |                                 p -> substr(text, p, len(ph[i])) = ph[i])) AS BIGINT)}) AS dc
         |  FROM (SELECT doc_id, text,
         |          [${CurationQueries.demoBlocklist.map("'" + _ + "'").mkString(", ")}] AS ph
         |        FROM documents)),
         |s AS (SELECT doc_id, dc,
         |    list_transform(list_filter(dc, x -> x.c > 0), x -> x.i || ':' || x.c) AS sp
         |  FROM c)
         |SELECT doc_id,
         |  CAST(coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(dc, x -> x.c)), (a, b) -> a + b), 0) AS BIGINT) AS n_hits,
         |  CAST(len(sp) AS BIGINT) AS n_phrases,
         |  md5(coalesce(array_to_string(sp, '|'), '')) AS tags_md5
         |FROM s""".stripMargin) { (s, d) =>
      Tables.table(s, d, "documents")
        .select(col("doc_id"), graft.functions.DictionaryTagCounts.tags(
          col("text"), CurationQueries.demoBlocklist).as("tags"))
        .select(col("doc_id"),
          aggregate(transform(col("tags"),
              x => element_at(split(x, ":"), 2).cast("long")),
            lit(0L), (a, x) => a + x).as("n_hits"),
          size(col("tags")).cast("long").as("n_phrases"),
          md5(array_join(col("tags"), "|").cast("binary")).as("tags_md5"))
    }
  )

  /** The demo blocklist the text_blocklist_tags query tags — phrases
    * over the synthetic corpus vocabulary, chosen so self-overlapping
    * runs ("table table", "scan scan") exercise the overlap semantics
    * regexp-based counting gets wrong. A def, not a val: `all` above
    * initializes first and would read null from a val defined below. */
  private[queries] def demoBlocklist: Seq[String] =
    Seq("slow scan", "table table", "big data", "scan scan", "fast merge")

  /** Where the hashed-DSIR query materializes its feature→bucket
    * mapping for the oracle (one subdir per scale factor, overwritten
    * per run). A fixed path: the oracle SQL is static text, and the
    * mapping is a pure function of the feature string, so stale subdirs
    * from other scale factors can only ADD consistent rows. */
  // a def, not a val: `all` above is initialized first (same trap as
  // importanceWeightCtes below)
  private def dsirBucketMapDir =
    new java.io.File(sys.props("java.io.tmpdir"), "graft_fixtures/dsir_bucket_map").getPath

  /** Shared CTE block of the two DSIR queries: the n-gram feature
    * multiset (unigrams + adjacent bigrams, target = src0), both
    * smoothed distributions, and the per-feature 6dp log ratio. */
  // a def, not a val: `all` above is initialized first and would read
  // null from a val defined below it
  private def importanceWeightCtes =
    """t AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |uni AS (SELECT doc_id, source, unnest(w) AS f FROM t),
      |bi AS (SELECT doc_id, source,
      |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS f
      |  FROM t WHERE len(w) >= 2),
      |feat AS (SELECT doc_id, source, f FROM uni UNION ALL SELECT doc_id, source, f FROM bi),
      |tf AS (SELECT f, count(*) AS tc FROM feat WHERE source = 'src0' GROUP BY f),
      |rf AS (SELECT f, count(*) AS rc FROM feat WHERE source <> 'src0' GROUP BY f),
      |vocab AS (SELECT DISTINCT f FROM feat),
      |v AS (SELECT count(*) AS v FROM vocab),
      |tn AS (SELECT sum(tc) AS tnn FROM tf),
      |rn AS (SELECT sum(rc) AS rnn FROM rf),
      |r AS (SELECT vocab.f,
      |    round(log10((coalesce(tf.tc, 0) + 1.0) / (tn.tnn + v.v))
      |        - log10((coalesce(rf.rc, 0) + 1.0) / (rn.rnn + v.v)), 6) AS lr
      |  FROM vocab LEFT JOIN tf USING (f) LEFT JOIN rf USING (f), tn, rn, v)""".stripMargin
}
