package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the remaining steps of a large-scale
  * training-data build that [[CorpusOps]]/[[Dedup]]/[[TextAnalysis]]
  * don't cover: benchmark decontamination, retrieval chunking,
  * reproducible splits/samples, distribution profiling and skew
  * diagnostics (the thesis's §6.4 concern, generalized into a reusable
  * operator: `/root/reference/thesis.pdf` studies join failure under
  * Zipf skew; `skewProfile` is the measurement that predicts it).
  *
  * Everything is codegen'd Column arithmetic with an exact DuckDB twin;
  * integer math is kept in ranges both engines compute identically
  * (products bounded before division, floor-division only on
  * nonnegative operands).
  */
object Curation {

  /** Benchmark decontamination — flag corpus documents sharing any word
    * k-shingle with a benchmark/eval set (the overlap check every
    * training-data pipeline runs before a model sees the corpus;
    * Brown et al. 2020 §4 style n-gram matching).
    *
    * Scale shape: the benchmark side is SMALL by construction (eval
    * sets are thousands of docs), so its distinct shingle set is
    * broadcast — the 100 TB corpus is scanned once, shingled by the
    * fused [[graft.functions.ShingleGenerator]], hash-probed against
    * the broadcast set, and partially aggregated map-side. No shuffle
    * ever carries corpus shingles; the exchange moves one row per
    * contaminated (doc, matched-count) pair.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      text: Column, id: Column, k: Int = 3): DataFrame = {
    // corpus shingles are NOT pre-deduplicated: Dedup.shingles ends in
    // a distinct() whose exchange would carry every corpus (doc,
    // shingle) pair — the exact shuffle this operator exists to avoid.
    // Instead the raw generator output probes the broadcast set first,
    // and count_distinct dedupes ONLY the matched pairs (partial
    // aggregation starts map-side, so the one exchange carries
    // contaminated pairs alone).
    val corpusSh = corpus.select(id.as("doc_id"),
      graft.functions.ShingleGenerator.shingles(text, k).as("s"))
    val benchSh = Dedup.shingles(benchmark, text, id, k)
      .select(col("s")).distinct()
    corpusSh.join(broadcast(benchSh), Seq("s"))
      .groupBy("doc_id")
      .agg(count_distinct(col("s")).as("n_shared"))
  }

  /** Retrieval/context chunking: overlapping token windows of `window`
    * tokens every `stride` tokens (stride < window ⇒ overlap), the
    * standard RAG / long-context preprocessing step. Every token is
    * covered; the final chunk is the only short one. Pure per-row
    * generator arithmetic — embarrassingly parallel, no shuffle.
    *
    * Chunk count = 1 + ceil(max(0, n−window)/stride), computed as
    * `(greatest(0, n−window) + stride−1) div stride` so the floor
    * division only ever sees nonnegative operands (Spark `div`
    * truncates toward zero, DuckDB `//` floors — equal only at ≥ 0).
    */
  def chunkOverlap(docs: DataFrame, text: Column, id: Column,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window")
    docs
      .select(id.as("doc_id"), TextAnalysis.tokens(text).as("w"))
      // null text → no chunks (same contract as the shingle generator);
      // without this, greatest/least IGNORE the null token count and a
      // phantom empty chunk appears
      .filter(col("w").isNotNull)
      .withColumn("n", size(col("w")))
      .select(col("doc_id"), col("w"), col("n"),
        explode(expr(
          s"sequence(0, (greatest(0, n - $window) + ${stride - 1}) div $stride)")).as("i"))
      .select(
        col("doc_id"),
        col("i").cast("long").as("chunk_idx"),
        least(lit(window), col("n") - col("i") * stride).cast("long").as("n_tok"),
        concat_ws(" ", slice(col("w"), col("i") * stride + 1, lit(window))).as("chunk_text"))
  }

  /** Bag-of-words dedup: exact dedup on the SORTED token multiset —
    * catches reordered/shuffled copies that byte-level
    * [[Dedup.exact]] misses while staying a single hash aggregation
    * (one shuffle keyed by content hash, same scale shape as exact
    * dedup; sort_array is per-row CPU, not a shuffle).
    */
  def bagOfWords(docs: DataFrame, text: Column, id: Column): DataFrame =
    // null-guarded: concat_ws SKIPS a null array, which would silently
    // merge null-text docs into the empty-string bag; the oracle's
    // md5(NULL) = NULL keeps them a separate (null-keyed) group
    docs.groupBy(
        when(text.isNotNull,
          md5(concat_ws(" ", sort_array(TextAnalysis.tokens(text))))).as("bow_md5"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Reproducible train/val/test assignment from the id alone —
    * [[CorpusOps.sampleBucket]]'s multiplicative hash, split on fixed
    * bucket thresholds. Stateless and deterministic: any worker, any
    * partitioning, any engine assigns the same row the same split
    * (the property that makes a split auditable at 100 TB — no stored
    * assignment table, no RNG seed coordination).
    */
  def trainSplit(df: DataFrame, id: Column,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val b = CorpusOps.sampleBucket(id)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Weighted Bernoulli sampling: keep a row with probability
    * proportional to a bounded integer weight (here: up-weight longer
    * documents, capped). The coin is the id's multiplicative hash
    * reduced mod 10⁶ against an integer threshold — exact, stateless,
    * reproducible, one filter over one scan (the deterministic
    * counterpart of A-Res weighted sampling for the common case where
    * a rate, not an exact sample size, is specified).
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      maxWeight: Int, perWeightPpm: Int): DataFrame =
    df.filter(
      CorpusOps.hash32(id) % 1000000L <
        least(weight, lit(maxWeight)).cast("long") * perWeightPpm)

  /** Robust per-group outlier profile: median + MAD (median absolute
    * deviation) of a numeric column per group, plus the count outside
    * median ± 3·MAD — the quality-filter statistic that, unlike
    * mean/stddev, a few garbage documents cannot drag. Two grouped
    * median aggregations + one count, all shuffled by the (bounded-
    * cardinality) group key; medians over integers interpolate to
    * dyadic rationals, bit-exact in both engines.
    */
  def madOutliers(df: DataFrame, group: Column, x: Column): DataFrame = {
    val g = df.select(group.as("g"), x.cast("double").as("x"))
    val med = g.groupBy("g").agg(median(col("x")).as("med"))
    val dev = g.join(med, Seq("g"))
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = dev.groupBy("g")
      .agg(first(col("med")).as("med"), median(col("dev")).as("mad"))
    dev.drop("med").join(mad, Seq("g"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        count(when(abs(col("x") - col("med")) > lit(3) * col("mad"), 1)).as("n_outliers"))
      .withColumnRenamed("g", "grp")
  }

  /** Key-distribution skew profile: key count, row count, hottest-key
    * frequency and share (ppm), and the exact Gini coefficient (ppm) of
    * the key-frequency distribution — the one-row diagnostic that says
    * whether a join/aggregation on this key needs salting or AQE skew
    * handling before you run it (the reference's sort-merge join died
    * at Zipf s≈1.0, thesis §6.4; this operator is how you see that
    * coming).
    *
    * Distributed shape: one aggregation keys→frequencies, then the
    * rank-sum Σ i·cᵢ collapses through the FREQUENCY HISTOGRAM — tied
    * frequencies occupy a contiguous rank block whose rank-sum is
    * closed-form (v·(m·start + m(m+1)/2)) — so the only ordered pass
    * runs over distinct frequency VALUES (≤ a few thousand even at
    * 100 TB; frequencies collide massively), never over the key set.
    * Sums run in DECIMAL(38,0): Σ i·cᵢ reaches n_keys²-scale and long
    * overflow at ~10⁹ keys would throw under ANSI mode.
    */
  def skewProfile(df: DataFrame, key: Column): DataFrame = {
    val f = df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
    val h = f.groupBy("c").agg(count(lit(1)).as("m"))
    val h2 = h.withColumn("start",
      coalesce(
        sum(col("m")).over(
          Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // rank-sum of a tied block in DECIMAL(38,0) throughout: m·start and
    // the triangular number m(m+1)/2 both reach n_keys² scale, far past
    // long; the triangular term picks whichever of m, m+1 is even to
    // halve BEFORE multiplying so no step ever needs a fractional scale
    h2.agg(
        sum(col("m")).cast("decimal(38,0)").as("nk"),
        sum(col("c").cast("decimal(38,0)") * col("m")).cast("decimal(38,0)").as("nr"),
        max(col("c")).as("maxf"),
        sum(expr(
          """CAST(c AS DECIMAL(38,0)) * (
            |  CAST(m AS DECIMAL(38,0)) * start +
            |  CASE WHEN m % 2 = 0 THEN CAST(m div 2 AS DECIMAL(38,0)) * (m + 1)
            |       ELSE CAST(m AS DECIMAL(38,0)) * ((m + 1) div 2) END)""".stripMargin))
          .as("s1"))
      .select(
        col("nk").cast("long").as("n_keys"),
        col("nr").cast("long").as("n_rows"),
        col("maxf").as("max_freq"),
        expr("CAST(CAST(maxf AS DECIMAL(38,0)) * 1000000 div nr AS BIGINT)").as("top1_ppm"),
        expr("CAST((2 * s1 - (nk + 1) * nr) * 1000000 div (nk * nr) AS BIGINT)").as("gini_ppm"))
  }

  /** One-pass multi-column profile: null count, exact distinct count,
    * min and max for each requested column, unpivoted to one row per
    * column — the dataset-card statistics block. All columns profile in
    * a SINGLE aggregation job (Spark plans the multi-distinct via one
    * Expand), so profiling cost is one scan regardless of column count,
    * not one job per column.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c =>
        struct(
          lit(c).as("col_name"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_v"),
          col(s"${c}__max").as("max_v"))): _*)).as("p"))
      .select("p.*")
  }

  /** Pearson chi-square test of independence between two categorical
    * columns — the composition-drift detector ("is language distribution
    * independent of source?"). Output: one row, `(dof, chi2)`; compare
    * chi2 against the chi-square quantile at dof degrees of freedom.
    *
    * Determinism recipe (the [[CorpusOps.unigramLogProb]] pattern):
    * observed/expected and each cell's (o−e)²/e term are IEEE double
    * expressions over exact integers — identical in any engine — and
    * the per-cell terms are rounded to 6 dp and accumulated in DECIMAL,
    * so the final statistic is order-independent. Scale shape: one
    * count aggregation to |A|×|B| cells; margins are windows over that
    * TINY table (bounded by category cardinalities, not data), and the
    * grand total joins in as a broadcast scalar rather than an
    * unpartitioned window (no single-partition stage, even a tiny one). */
  def chiSquare(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b")).agg(count(lit(1)).as("o"))
    val wa = Window.partitionBy(col("__a"))
    val wb = Window.partitionBy(col("__b"))
    cells
      .withColumn("__ra", sum(col("o")).over(wa))
      .withColumn("__cb", sum(col("o")).over(wb))
      .crossJoin(broadcast(cells.agg(sum(col("o")).as("__n"))))
      .withColumn("__e",
        (col("__ra") * col("__cb")).cast("double") / col("__n").cast("double"))
      .withColumn("__t", round(
        (col("o").cast("double") - col("__e")) * (col("o").cast("double") - col("__e")) /
          col("__e"), 6).cast("decimal(28,6)"))
      .agg(
        ((count_distinct(col("__a")) - 1) * (count_distinct(col("__b")) - 1)).as("dof"),
        sum(col("__t")).cast("double").as("chi2"))
  }

  /** Equi-width numeric histogram — the distribution profile behind
    * every data-quality dashboard. min/max join in as a broadcast
    * scalar; bin assignment is identical IEEE arithmetic in any engine
    * ((v−lo)·bins/(hi−lo), floored, top edge clamped), so exact counts
    * and per-bin extrema hash-match. A constant column (hi = lo) maps
    * every row to bin 0 instead of dividing by zero. One scan + one
    * ≤`bins`-row aggregation — the 100 TB profile shape. */
  def histogram(df: DataFrame, v: Column, bins: Int): DataFrame = {
    val vals = df.select(v.as("__v"))
    val mm = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    vals.crossJoin(broadcast(mm))
      .groupBy(
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(
            floor((col("__v") - col("__lo")) * lit(bins.toDouble) /
              (col("__hi") - col("__lo"))),
            lit(bins - 1L))).as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("__v")).as("bin_min"), max(col("__v")).as("bin_max"))
  }

  /** Referential-integrity audit: one row per declared FK constraint —
    * child row count, distinct child keys, null child keys, and orphan
    * rows (non-null child key with no matching parent). The pre-join
    * sanity gate of any multi-table pipeline: a join executed on data
    * with orphans silently DROPS those rows (inner) or fabricates
    * nulls (outer) — this measures the damage before it happens.
    *
    * Scale shape: per constraint, one equi-join of the child key stream
    * against the DISTINCT parent key set (Catalyst broadcasts the
    * parent side when it fits, shuffles otherwise) feeding a single-row
    * partial aggregation — map-side combine leaves one row per task on
    * the wire. Constraints are independent single-row plans unioned at
    * the end; null keys never match the join (SQL equality), so orphan
    * and null counts are disjoint by construction. */
  def referentialAudit(
      constraints: Seq[(String, DataFrame, Column, DataFrame, Column)]): DataFrame =
    constraints.map { case (name, child, childKey, parent, parentKey) =>
      val parents = parent.select(parentKey.as("__pk")).distinct()
      child.select(childKey.as("__ck"))
        .join(parents, col("__ck") === col("__pk"), "left_outer")
        .agg(
          count(lit(1)).as("child_rows"),
          count_distinct(col("__ck")).as("distinct_keys"),
          sum(when(col("__ck").isNull, 1L).otherwise(0L)).as("null_keys"),
          sum(when(col("__ck").isNotNull && col("__pk").isNull, 1L)
            .otherwise(0L)).as("orphan_rows"))
        .select(lit(name).as("constraint_name"), col("child_rows"),
          col("distinct_keys"), col("null_keys"), col("orphan_rows"))
    }.reduce(_ unionByName _)

  /** Two-sample Kolmogorov–Smirnov drift per group: for each group g,
    * the KS statistic between the distribution of `x` within g and in
    * the REST of the corpus — `max_x |CDF_g(x) − CDF_rest(x)|`, reported
    * in exact integer ppm. The distribution-shift monitor a corpus
    * pipeline runs per source/snapshot before a source is ingested.
    *
    * Exact and engine-reproducible: CDFs are integer cumulative counts
    * on the merged value grid, the difference is cross-multiplied
    * (`|cum_g·R − cum_rest·S|`) in DECIMAL(38,0) so no float division
    * ever happens, and the final ppm is a floor division. Needs ≥ 2
    * groups (R = 0 otherwise).
    *
    * Scale shape: everything after the first aggregation lives on the
    * BOUNDED (groups × distinct-values) grid — document-length-style
    * measures have thousands of distinct values, not corpus-many. The
    * per-group windows run on that grid, and the corpus itself is
    * touched by exactly one partial-aggregated groupBy. */
  def ksDrift(df: DataFrame, group: Column, x: Column): DataFrame = {
    val base = df.select(group.as("g"), x.as("x"))
    val counts = base.groupBy("g", "x").agg(count(lit(1)).as("c"))
    // dense grid: every group needs a row at every grid value for its
    // step CDF to be comparable at all candidate-max points
    val xs = counts.select(col("x")).distinct()
    val gs = counts.select(col("g")).distinct()
    val filled = xs.crossJoin(broadcast(gs))
      .join(counts, Seq("g", "x"), "left_outer")
      .select(col("g"), col("x"), coalesce(col("c"), lit(0L)).as("c"))
    val wg = Window.partitionBy(col("g")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = filled.withColumn("cum", sum(col("c")).over(wg))
    val wAll = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // global step CDF on the same grid (distinct-value-sized window)
    val cumAll = counts.groupBy("x").agg(sum(col("c")).as("ca"))
      .withColumn("cumall", sum(col("ca")).over(wAll))
      .select(col("x"), col("cumall"))
    val totals = counts.groupBy("g").agg(sum(col("c")).as("s"))
    val n = counts.agg(sum(col("c")).as("nn"))
    cum.join(cumAll, Seq("x"))
      .join(broadcast(totals), Seq("g"))
      .join(broadcast(n), lit(true))
      .withColumn("diff", expr(
        "abs(CAST(cum AS DECIMAL(38,0)) * (nn - s) - CAST(cumall - cum AS DECIMAL(38,0)) * s)"))
      .groupBy("g")
      .agg(min(col("s")).as("n_rows"), min(col("nn")).as("__n"), max(col("diff")).as("__d"))
      .select(col("g"), col("n_rows"),
        expr("CAST(__d * 1000000 div (CAST(n_rows AS DECIMAL(38,0)) * (__n - n_rows)) AS BIGINT)")
          .as("ks_ppm"))
  }

  /** Per-doc n-gram feature stream (unigrams + adjacent word bigrams,
    * as a MULTISET — occurrence counts matter, matching the
    * bag-of-ngrams model of Xie et al. 2023 §3, "Data Selection for
    * Language Models via Importance Resampling"). Both gram orders come
    * from the fused [[graft.functions.ShingleGenerator]] (k=1 tokens,
    * k=2 bigrams) — one pass each, no HOF array allocation. */
  private def ngramFeatures(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val uni = docs.select(id.as("doc_id"),
      graft.functions.ShingleGenerator.shingles(text, 1).as("f"))
    val bi = docs.select(id.as("doc_id"),
      graft.functions.ShingleGenerator.shingles(text, 2).as("f"))
    uni.unionAll(bi)
  }

  /** DSIR-style importance weights (Xie et al. 2023): score every RAW
    * document by how much more likely its n-gram features are under the
    * TARGET distribution than under the raw distribution —
    * `logw(d) = Σ_f∈d log10 p̂_target(f) − log10 p̂_raw(f)` with add-1
    * smoothing over the shared vocabulary. High `logw` = looks like the
    * target domain; [[importanceResample]] turns the weights into a
    * sampled subcorpus. Per-feature log ratios are rounded to 6 dp
    * BEFORE the per-doc DECIMAL sum, so the result is
    * order-independent and engine-reproducible (the module contract).
    *
    * Scale shape: the two frequency tables and the vocabulary are
    * feature-space-sized AGGREGATES (vocabulary-sized here; B hash
    * buckets under [[hashedNgramFeature]] at 100 TB — DSIR's own trick
    * for bounding them), broadcast back onto the one corpus feature
    * scan; partial aggregation runs map-side, so the only corpus-sized
    * exchange carries one row per (doc, weight). Nothing quadratic,
    * nothing driver-side. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      text: Column, id: Column): DataFrame =
    weightsCore(ngramFeatures(raw, text, id), ngramFeatures(target, text, id))

  /** The 100 TB configuration of [[importanceWeights]] — DSIR's own
    * hashed-ngram trick: features are bucketed by `pmod(xxhash64(f), B)`
    * immediately after generation, so BOTH distribution tables, the
    * vocabulary, and the broadcast ratio table are bounded by B
    * regardless of corpus vocabulary (an open web corpus has billions
    * of distinct bigrams; B = 2²⁰–2²⁴ is the published operating
    * range). Collisions merge features on BOTH sides of the ratio
    * identically — the importance estimate degrades gracefully
    * (spec-pinned: with B large enough to be injective on the corpus,
    * the weights are bit-equal to the exact form). */
  def importanceWeightsHashed(raw: DataFrame, target: DataFrame,
      text: Column, id: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    def bucketed(df: DataFrame) = df.select(col("doc_id"),
      pmod(xxhash64(col("f")), lit(buckets.toLong)).as("f"))
    weightsCore(bucketed(ngramFeatures(raw, text, id)),
      bucketed(ngramFeatures(target, text, id)))
  }

  /** The corpus-vocabulary slice of [[importanceWeightsHashed]]'s
    * feature→bucket function: every distinct n-gram feature of `docs`
    * with its `pmod(xxhash64(f), buckets)` bucket. xxhash64 has no
    * DuckDB twin, but the MAPPING is a plain table — materialized as a
    * per-run fixture, the oracle can replay the bucketed DSIR
    * arithmetic over it and hash-check the hashed path's weights
    * end-to-end (only the hash evaluation itself is taken from Spark —
    * a pure per-feature function, so a fixture from a larger corpus is
    * a harmless superset). */
  def dsirBucketMap(docs: DataFrame, text: Column, id: Column,
      buckets: Int): DataFrame =
    ngramFeatures(docs, text, id).select(col("f")).distinct()
      .select(col("f"), pmod(xxhash64(col("f")), lit(buckets.toLong)).as("fb"))

  private def weightsCore(rawF: DataFrame, tgtF: DataFrame): DataFrame = {
    // vocabulary = distinct features of the UNION; V joins in as a
    // broadcast 1-row aggregate over the same subtree (ReuseExchange
    // collapses the two instances, the unigramLogProb pattern)
    val vocabCounts = tgtF.select(col("f")).unionAll(rawF.select(col("f")))
      .groupBy("f").agg(count(lit(1)).as("__ignored"))
    val v = vocabCounts.agg(count(lit(1)).as("v"))
    val tf = tgtF.groupBy("f").agg(count(lit(1)).as("tc"))
    val rf = rawF.groupBy("f").agg(count(lit(1)).as("rc"))
    val tn = tf.agg(sum(col("tc")).as("tnn"))
    val rn = rf.agg(sum(col("rc")).as("rnn"))
    // identical double arithmetic on both engines: each smoothed log is
    // computed separately (log10(a/b) ≠ log10 a − log10 b in floats)
    val ratios = vocabCounts.select(col("f"))
      .join(tf, Seq("f"), "left_outer")
      .join(rf, Seq("f"), "left_outer")
      .join(broadcast(tn), lit(true))
      .join(broadcast(rn), lit(true))
      .join(broadcast(v), lit(true))
      .select(col("f"), round(
        log10((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("tnn") + col("v"))) -
          log10((coalesce(col("rc"), lit(0L)) + lit(1.0)) / (col("rnn") + col("v"))),
        6).as("lr"))
    rawF.join(broadcast(ratios), Seq("f"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_feat"),
        round(sum(col("lr").cast("decimal(28,12)")).cast("double"), 6).as("logw"))
  }

  /** DSIR selection: Gumbel-top-k resampling over [[importanceWeights]]
    * — sampling k docs without replacement with probability ∝ exp(w) is
    * exactly taking the top k of `w + Gumbel(0,1)` (Xie et al. 2023
    * §3.3). The Gumbel draw is md5-deterministic (`−ln(−ln u)`, u from
    * the first 8 md5 hex chars of the doc id — the module's standard
    * reproducible uniform), so the sample is stable across runs,
    * partitionings, and engines. One TakeOrdered(k) heap merge — the
    * corpus is never globally sorted. */
  def importanceResample(raw: DataFrame, target: DataFrame,
      text: Column, id: Column, k: Int): DataFrame = {
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0
    importanceWeights(raw, target, text, id)
      .withColumn("gumbel", round(-log(-log(u)), 6))
      .orderBy((col("logw") + col("gumbel")).desc, col("doc_id"))
      .limit(k)
  }
}
