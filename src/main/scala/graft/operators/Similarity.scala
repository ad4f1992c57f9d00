package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension; BASELINE.json:6).
  *
  * Two tiers, same output contract (query_id, neighbor_id, rank, cos):
  *  - [[topKBruteForce]]: exact baseline — broadcast the (small) query
  *    set against the full corpus; one scan, per-query top-k via
  *    window rank. Scales linearly in corpus size — the right shape
  *    when queries ≪ corpus.
  *  - [[topKIvf]]: IVF (inverted-file) — assign every vector to its
  *    nearest centroid (bucketing the corpus), probe only the nprobe
  *    closest clusters per query. Deterministic centroid choice (the
  *    first nCentroids vectors by id) keeps the whole operator
  *    SQL-reproducible; swap in k-means centroids at production scale
  *    without changing the dataflow.
  *
  * All cosine math uses Dedup.dot's sequential fold — bit-identical to
  * the DuckDB oracle.
  */
/** Staleness counters of a [[Similarity.writeTfidfIndex]] layout —
  * cumulative since the last build/refresh, maintained O(delta) by
  * [[Similarity.appendToTfidfIndex]] (one tiny row per batch in
  * `staleness/`; nothing is ever recounted from the corpus). The
  * counters are exactly the two frozen-statistics error sources the
  * append contract names: corpus growth (bounds idf drift) and
  * out-of-vocabulary term mass (what the frozen vocabulary refused to
  * index). [[Similarity.refreshTfidfIndexIfStale]] turns them into the
  * refresh trigger. */
final case class TfidfStaleness(appendedDocs: Long, statN: Long,
    oovTf: Long, totalTf: Long) {
  /** Appended docs per million base docs — the growth budget knob. */
  def growthPpm: Long =
    if (statN == 0L) Long.MaxValue else appendedDocs * 1000000L / statN
  /** Delta term occurrences skipped as OOV, per million. */
  def oovMassPpm: Long =
    if (totalTf == 0L) 0L else oovTf * 1000000L / totalTf
  /** The per-term idf drift bound appendToTfidfIndex states:
    * ≤ log10((n + d) / n). */
  def idfDriftBound: Double =
    math.log10((statN + appendedDocs).toDouble / math.max(1L, statN).toDouble)
}

// Serializable: the task-local seed/walk tiers close over the scalar
// helpers ([[dotD]]/[[microsOf]]) — method references on the singleton
// put it in the closure's captured args, and executors deserialize the
// (stateless) marker
object Similarity extends Serializable {
  /** One-time (per path, per process) stderr note when a staleness
    * probe hits a pre-counter index layout (ADVICE r11): the recount
    * is a full distinct-count over the stored corpus on EVERY probe
    * until the repair verb persists the counter — an operator should
    * see that O(n)-per-probe mode named, not discover it in a profile. */
  /** Scalar twins of the Column hot path, bit-identical by
    * construction (used by the task-local seed/walk tiers):
    * left-to-right dot fold from 0.0 ≡ [[graft.functions.DotProduct]]
    * ≡ the oracle's list_reduce; HALF_UP micros through
    * BigDecimal.decimal ≡ Spark round() on doubles ≡ DuckDB round. */
  private[graft] def dotD(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private[graft] def microsOf(c: Double): Long = BigDecimal.decimal(c * 1e6)
    .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  private val legacyRecountWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def warnLegacyRecount(path: String, family: String,
      repairVerb: String): Unit =
    if (legacyRecountWarned.add(s"$family|$path"))
      System.err.println(s"[graft] $family index at $path predates the " +
        s"persisted staleness counter — this probe (and every later one) " +
        s"recounts the stored corpus, O(n) per probe; run $repairVerb once " +
        "to persist the counter and restore O(1) staleness reads")

  import Dedup.{dot, withNorm}

  /** Exact top-k: every query against every corpus vector. Norms are
    * precomputed per vector; the cosine denominator multiplies
    * query-norm × corpus-norm in that order to match the oracle. */
  def topKBruteForce(emb: DataFrame, vec: Column, id: Column,
      isQuery: Column, k: Int): DataFrame = {
    val e = withNorm(emb, vec, id)
    val q = withNorm(emb.filter(isQuery), vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("vid") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Nearest-centroid assignment — `(vid, payload..., cid)` with cid =
    * argmax over centroids of cosine, ties to the smallest cid (the
    * same (ccos DESC, cid ASC) order the oracle's row_number uses).
    *
    * Implemented as `groupBy(vid).agg(max_by(...))`, NOT a row_number
    * window: the scored relation is corpus×k rows, and a window
    * partitioned by vid must SHUFFLE all of them before ranking, while
    * max_by partial-aggregates map-side so the exchange carries one row
    * per corpus vector — k× less shuffle volume. At k=1024 on a 100 TB
    * corpus that is the difference between a feasible and an infeasible
    * job; the outputs are identical (same floats, same tie-break). */
  def assignNearest(e: DataFrame, cents: DataFrame, payload: Seq[String]): DataFrame = {
    val scored = e.join(broadcast(cents), lit(true))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
    val carried = struct((("cid" +: payload).map(col)): _*)
    scored.groupBy("vid")
      .agg(max_by(carried, struct(col("ccos"), -col("cid"))).as("best"))
      .select(col("vid") +: ("cid" +: payload).map(f => col(s"best.$f").as(f)): _*)
  }

  /** Seed centroids: the first nCentroids vectors by id — deterministic
    * and SQL-reproducible (the ann_ivf oracle's definition). */
  def firstNCentroids(emb: DataFrame, vec: Column, id: Column,
      nCentroids: Int): DataFrame =
    withNorm(emb.filter(id < nCentroids), vec, id)
      .select(col("vid").as("cid"), col("v").as("cv"), col("nrm").as("cn"))

  /** Spherical k-means (Lloyd) centroid training — the production
    * upgrade over [[firstNCentroids]]: same (cid, cv, cn) contract, so
    * [[topKIvfWith]] keeps the identical dataflow, only recall changes.
    *
    * Deterministic by construction: init = first-N-by-id, assignment
    * tie-break by cid, per-(cluster, dim) means accumulate
    * DECIMAL(28,12) before one double division (order-independent),
    * fixed iteration count. A cluster that loses every point keeps its
    * previous center. Per iteration: one broadcast-assign pass + one
    * (cid, dim)-grouped mean — two shuffles, linear in corpus size; the
    * centers themselves (k × dim doubles) are collected to the driver
    * between iterations, which is the correct scale shape: centroids
    * are small BY DEFINITION (k ≪ corpus), and a flat per-iteration
    * plan avoids the exponential lineage a fully-lazy loop builds. */
  def kmeansCentroids(emb: DataFrame, vec: Column, id: Column,
      nCentroids: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = withNorm(emb, vec, id).cache()
    var cents: Map[Long, Seq[Double]] =
      firstNCentroids(emb, vec, id, nCentroids)
        .select(col("cid"), col("cv")).as[(Long, Seq[Double])].collect().toMap
    for (_ <- 0 until iters) {
      val cdf = cents.toSeq.sortBy(_._1).toDF("cid", "cv")
        .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
      val assigned = assignNearest(e, cdf, Seq("v")).select(col("cid"), col("v"))
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg((sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), expr("transform(dm, p -> p.m)").as("cv"))
        .as[(Long, Seq[Double])].collect().toMap
      cents = cents ++ means // empty clusters keep their previous center
    }
    e.unpersist()
    cents.toSeq.sortBy(_._1).toDF("cid", "cv")
      .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
  }

  /** IVF top-k with deterministic seed centroids (vec_id < nCentroids)
    * and nprobe-cluster probing — the SQL-reproducible configuration
    * the driver oracle checks. */
  def topKIvf(emb: DataFrame, vec: Column, id: Column, isQuery: Column,
      k: Int, nCentroids: Int, nProbe: Int): DataFrame =
    topKIvfWith(emb, vec, id, isQuery, k, nProbe,
      firstNCentroids(emb, vec, id, nCentroids))

  /** IVF top-k against an explicit centroid table ((cid, cv, cn) —
    * [[firstNCentroids]] or [[kmeansCentroids]]). Candidate set =
    * vectors whose assigned centroid is among the query's nprobe
    * nearest centroids. */
  def topKIvfWith(emb: DataFrame, vec: Column, id: Column, isQuery: Column,
      k: Int, nProbe: Int, centroids: DataFrame): DataFrame = {
    val e = withNorm(emb, vec, id)
    val cents = centroids

    // assignment: nearest centroid per corpus vector (broadcast the
    // centroid table — it is tiny by construction; max_by partial
    // aggregation, not a corpus×k window — see [[assignNearest]])
    val assigned = assignNearest(e, cents, Seq("v", "nrm"))
      .select(col("vid"), col("v"), col("nrm"), col("cid"))

    // probe lists: nprobe nearest centroids per query
    val q = withNorm(emb.filter(isQuery), vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("qcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))

    // candidates: probed clusters only, then exact top-k within them
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    probes.join(assigned, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Storage layout for IVF SERVING — the ANN counterpart of
    * [[Dedup.writeIncrementalIndex]]: corpus vectors (with norms)
    * written PARTITIONED BY their assigned centroid id, plus the
    * centroid table itself, so query batches probe the index from
    * storage with partition pruning instead of holding the corpus
    * resident. At 100 TB the inverted lists ARE the index artifact a
    * vector-search pipeline maintains; a query batch reads only its
    * probed nprobe·|queries| (≤ nCentroids distinct) partitions. */
  def writeIvfIndex(emb: DataFrame, vec: Column, id: Column,
      centroids: DataFrame, path: String): Unit = {
    val e = withNorm(emb, vec, id)
    assignNearest(e, centroids, Seq("v", "nrm"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/vectors")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Fold a delta batch of vectors into a [[writeIvfIndex]] layout —
    * the index-maintenance step that completes the ANN serving
    * lifecycle (build once → serve → append new vectors → later
    * queries see them), the vector twin of
    * [[Dedup.appendToIncrementalIndex]]. Assignment uses the STORED
    * centroid table, never a retrain: the coarse quantizer is the
    * index's contract, and re-deriving it from delta data would
    * silently re-bucket the existing lists. Parquet `append` into the
    * same `partitionBy(cid)` dirs keeps partition pruning intact and
    * per-append cost O(delta); centroid drift from a long append
    * stream is a REBUILD decision (monitor via
    * `EmbeddingAnalytics.centroidDrift`), not an append-path concern —
    * the standard IVF posture (FAISS indexes add against fixed
    * quantizers the same way). Small-file buildup per list is
    * [[Layout]]'s compact operator applied per partition. */
  def appendToIvfIndex(path: String, delta: DataFrame, vec: Column,
      id: Column): Unit = {
    val cents = delta.sparkSession.read.parquet(s"$path/centroids")
    assignNearest(withNorm(delta, vec, id), cents, Seq("v", "nrm"))
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid").parquet(s"$path/vectors")
  }

  /** [[topKIvfWith]] served from a [[writeIvfIndex]] layout: probe
    * lists come from the stored (tiny) centroid table, the probed
    * centroid ids are collected driver-side (≤ nCentroids literals —
    * bounded by CONFIGURATION, not data) and partition-prune the
    * vector scan, then the exact per-query ranking runs over probed
    * lists only. Output is value-identical to the in-memory form
    * (ScaleSpec pins equality + the pruned scan).
    *
    * `keep` (VERDICT r9 #3 — filtered serving for the quantization
    * tiers, the production-common predicate+ANN stack): a predicate
    * over the candidate id column `vid`, applied to the probed lists'
    * candidates BEFORE the top-k rank — the result is the exact top-k
    * among MATCHING vectors of the probed lists, and partition pruning
    * is untouched (the filter composes after the cid pruning; ScaleSpec
    * pins both). Under selective predicates, over-fetch by raising
    * `nProbe` — each extra list adds matching candidates at one more
    * partition read; a query whose probed lists hold fewer than k
    * matches returns exactly those (the filtered-graph shortfall
    * contract). */
  def topKIvfStored(path: String, queries: DataFrame, vec: Column, id: Column,
      k: Int, nProbe: Int, keep: Column = lit(true)): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read.parquet(s"$path/centroids")
    val q = withNorm(queries, vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("qcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    val probedCids = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val vecs = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isin(probedCids: _*))
      .select(col("vid"), col("v"), col("nrm"), col("cid").cast("long").as("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    probes.join(vecs.filter(keep), Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** IVF with int8 scalar-quantization re-rank — the memory shape of a
    * production vector index (FAISS "IVF,SQ8"): the index stores 8-bit
    * codes (4× smaller than float32, so 4× more corpus per executor),
    * queries score candidates ASYMMETRICALLY (exact query × dequantized
    * code — ADC in the PQ literature), and only the top `m` approximate
    * hits per query are re-scored against the exact vectors. At 100 TB
    * the exact vectors live in cold storage and only m·queries of them
    * are ever fetched; here both live in the same table and the plan
    * shows the same dataflow.
    *
    * Quantization is [[EmbeddingAnalytics.quantizeInt8]]'s per-dim
    * affine grid ((x−lo)/(hi−lo)·255, floored, top edge clamped), with
    * the (lo, hi) range table folded into ONE broadcast row of arrays.
    * Every arithmetic step is IEEE-identical in the DuckDB oracle, so
    * approximate scores — not just the final ranking — hash-match.
    *
    * Output adds `approx_cos` next to the exact `cos`: the observable
    * quantization error (|cos − approx_cos|) is the recall-debugging
    * signal an ANN operator should surface, not hide. */
  def topKIvfRerank(emb: DataFrame, vec: Column, id: Column, isQuery: Column,
      k: Int, nCentroids: Int, nProbe: Int, m: Int): DataFrame = {
    require(m >= k, "re-rank pool m must be >= k")
    val e = withNorm(emb, vec, id)

    // per-dim (lo, hi) over the full vector set, folded to one row of
    // dim-ordered arrays — broadcast-joined, never re-aggregated per use
    val ranges = emb
      .select(posexplode(Dedup.asDouble(vec)).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .agg(array_sort(collect_list(struct(col("pos"), col("lo"), col("hi")))).as("plh"))
      .select(expr("transform(plh, p -> p.lo)").as("loa"),
        expr("transform(plh, p -> p.hi)").as("hia"))

    // dequantized code vector dv = what the index actually stores,
    // reconstructed: lo + q·(hi−lo)/255 with q the int8 code. Spark
    // lambda index i and array subscript are both 0-based (the oracle's
    // 1-based range/list pair lines up element-for-element).
    val deq = e.join(broadcast(ranges), lit(true))
      .withColumn("dv", expr(
        """transform(v, (x, i) -> CASE WHEN hia[i] = loa[i] THEN loa[i]
          |  ELSE loa[i] + least(255, floor((x - loa[i]) / (hia[i] - loa[i]) * 255))
          |       * (hia[i] - loa[i]) / 255.0 END)""".stripMargin))
      .withColumn("dn", sqrt(dot(col("dv"), col("dv"))))
      .drop("loa", "hia")

    // IVF assignment carries both representations: codes for the wide
    // approximate pass, exact vectors for the narrow re-rank
    val cents = firstNCentroids(emb, vec, id, nCentroids)
    val assigned = assignNearest(deq, cents, Seq("v", "nrm", "dv", "dn"))

    val q = withNorm(emb.filter(isQuery), vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q.join(broadcast(cents), lit(true))
      .withColumn("qcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))

    // approximate pass scores CODES only; windows here rank per-query
    // CANDIDATE sets (nprobe buckets), never a corpus×k relation
    val wA = Window.partitionBy(col("qid")).orderBy(col("acos").desc, col("vid"))
    val pruned = probes.join(assigned, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .withColumn("acos", dot(col("qv"), col("dv")) / (col("qn") * col("dn")))
      .withColumn("arn", row_number().over(wA))
      .filter(col("arn") <= m)

    val wE = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    pruned
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"),
        round(col("acos"), 6).as("approx_cos"))
  }

  /** Matryoshka truncation evaluation (Kusupati et al., NeurIPS'22):
    * recall@k of brute-force search over the FIRST `d` dimensions
    * against full-dimension ground truth, per candidate prefix length
    * — the measurement that decides how far MRL-style embeddings can
    * be truncated for cheap first-stage retrieval before recall
    * collapses. Exact integer ppm (Σ hits ·10⁶ div (k·|queries|));
    * each arm is one [[topKBruteForce]] over sliced vectors, joined to
    * the full-dim top-k on (query, neighbor). */
  def matryoshkaRecall(emb: DataFrame, vec: Column, id: Column,
      isQuery: Column, k: Int, dims: Seq[Int]): DataFrame = {
    val full = topKBruteForce(emb, vec, id, isQuery, k)
      .select(col("query_id"), col("neighbor_id"))
    val nq = full.select(col("query_id")).distinct().count()
    dims.map { d =>
      val hits = topKBruteForce(
          emb.withColumn("__tv", slice(Dedup.asDouble(vec), 1, d)),
          col("__tv"), id, isQuery, k)
        .select(col("query_id"), col("neighbor_id"))
        .join(full, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"))
      hits.select(lit(d).as("dims"),
        expr(s"hits * 1000000 div ${k.toLong * nq}").as("recall_ppm"),
        lit(nq).as("n_queries"))
    }.reduce(_.unionAll(_))
  }

  /** Hard-negative mining for embedding-model training: per query, the
    * top-k most similar corpus vectors with a DIFFERENT label — the
    * closest impostors, which contrastive training wants as negatives
    * precisely because they are hard. Brute-force baseline shape (the
    * declared exact form, like [[topKBruteForce]]); at corpus scale the
    * same label-exclusion filter drops into the IVF probe of
    * [[topKIvfWith]] unchanged, since the filter commutes with
    * candidate generation. */
  def hardNegatives(emb: DataFrame, vec: Column, id: Column, label: Column,
      isQuery: Column, k: Int): DataFrame = {
    val e = emb.select(id.as("vid"), Dedup.asDouble(vec).as("v"), label.as("lbl"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val q = emb.filter(isQuery)
      .select(id.as("qid"), Dedup.asDouble(vec).as("qv"), label.as("qlbl"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    e.join(broadcast(q), col("vid") =!= col("qid") && col("lbl") =!= col("qlbl"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("lbl").as("neg_label"), col("rank"), round(col("cos"), 6).as("cos"))
  }

  /** Sparse TF-IDF cosine similarity join — the SPARSE counterpart of
    * [[Dedup.embeddingCosinePairs]]: document pairs whose tf-idf unit
    * vectors have cosine ≥ threshold, computed EXACTLY through an
    * inverted-index equi-join (non-shared terms contribute 0, so the
    * per-pair sum over shared terms IS the full dot product — no
    * verify pass needed, unlike the LSH families). Input is a
    * pre-tokenized `(doc_id, t)` term MULTISET (term frequency counts),
    * so callers pick the term granularity — word shingles from the
    * fused generator in the registry query.
    *
    * Determinism contract: unit weights are rounded to 6 dp, per-pair
    * products are rounded to 6 dp, and BOTH the norm accumulation and
    * the pair accumulation run in exact integer MICROS (bit-identical
    * to the DECIMAL(28,12) form they replaced: every 6 dp-rounded term
    * ·10⁶ is integral, the BIGINT sum is exactly 10⁶ × the decimal
    * sum, and /10⁶ correctly rounds the same exact rational) —
    * order-independent, so the DuckDB oracle hash-matches
    * float-for-float.
    *
    * Scale shape: one corpus scan → (doc, term, tf) partial aggregate;
    * df and N are vocabulary-sized/scalar broadcasts. The pair
    * computation is STRATEGY-SELECTED, because the two honest regimes
    * want opposite dataflows (measured on this box):
    *
    *  - `direct` — the inverted-index product join (u ⋈ u on term,
    *    products hash-aggregated straight into per-pair sums). Cost is
    *    Σ_t df_t² product ROWS through one exchange — optimal while
    *    that sum is moderate (6.6 s cold / 4.8 s best-of-2 at sf0.1,
    *    where the prefix path's candidate materialization + re-join
    *    took 49–60 s: its 1 M candidate pairs for 256 outputs each
    *    re-joined full term lists).
    *  - `prefix` — candidate generation from a PREFIX-FILTERED index
    *    (Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search",
    *    WWW'07): terms globally ordered rarest-first (idf desc), each
    *    doc indexes only its leading terms while the remaining squared
    *    mass could still reach `threshold`; by Cauchy–Schwarz a pair
    *    with every shared term outside a member's prefix is under
    *    threshold, so probing full vectors against the prefix index
    *    misses nothing. Candidates cost Σ_t pdf_t·df_t ≪ Σ_t df_t²
    *    exactly when hot terms dominate — the stopword regime where
    *    `direct` is quadratic (a term at df = n/2 contributes n²/4
    *    rows). Verification then joins each candidate pair to the two
    *    doc VECTOR MAPS and computes the dot per pair in integer
    *    micro-units (order-free, O(|doc| ) lookups) — no per-term
    *    re-join, no explode.
    *
    * `auto` picks: Σ df² (one vocabulary-sized aggregate over the
    * already-persisted index) ≤ `directRowBudget` → direct, else
    * prefix. That is an AQE-style stats decision, not a heuristic on
    * the query text; both paths produce value-identical results
    * (ScaleSpec pins equality on the stopword fixture) and the oracle
    * replays the unfiltered SQL.
    *
    * `maxDfPpm` bounds the kept VOCABULARY (terms in more than that
    * fraction of docs are dropped from norms and products alike — the
    * contract the oracle replays); it is not what bounds the join.
    *
    * Cache lifecycle: the posting/unit-vector indexes are persisted
    * MEMORY_AND_DISK (eviction degrades to disk read, never a corpus
    * re-tokenize) and stay registered after the call — CALLERS running
    * many corpora through one session own the lifecycle and must
    * `spark.catalog.clearCache()` between corpora (Bench/Verify do). */
  def tfidfCosinePairs(terms: DataFrame, threshold: Double,
      maxDfPpm: Long = 500000L, strategy: String = "auto",
      directRowBudget: Long = 200000000L): DataFrame = {
    val u = tfidfIndex(terms, maxDfPpm)
    pairsFromPostings(u.select(col("doc_id"), col("t"), col("u")),
      withRem(u), docVectors(u.select(col("doc_id"), col("t"), col("u"))),
      threshold, strategy, directRowBudget)
  }

  /** The strategy core shared by the in-memory and storage-served
    * forms: direct posting-join accumulation under the Σ df² budget,
    * prefix-filtered candidates + exact verify above it. `remDf` and
    * `vecs` are by-name — the direct path never evaluates them (the
    * stored form would otherwise always scan its vectors/ layout). */
  private def pairsFromPostings(uu: DataFrame, remDf: => DataFrame,
      vecs: => DataFrame, threshold: Double, strategy: String,
      directRowBudget: Long): DataFrame = {
    require(Set("auto", "direct", "prefix")(strategy), s"bad strategy: $strategy")
    val pick =
      if (strategy != "auto") strategy
      else {
        // Σ df² from the posting index — a vocabulary-sized
        // aggregate collapsing to one row; the cost model's only input
        val sumDf2 = uu.groupBy("t").agg(count(lit(1)).as("df"))
          .agg(sum(col("df") * col("df"))).head().getLong(0)
        if (sumDf2 <= directRowBudget) "direct" else "prefix"
      }
    if (pick == "direct") {
      // accumulate in integer MICROS, not DECIMAL(28,12) (optimization
      // r13, guide §2.3 narrower shuffle types / §4 cheaper per-row
      // work): each shared-term product is 6 dp-rounded, so p·10⁶ is
      // integral, the long sum is exactly 10⁶ × the decimal sum, and
      // round(sum/10⁶, 6) is bit-identical (division by 10⁶ and
      // DECIMAL→DOUBLE both correctly round the same exact rational;
      // the micro sum stays far under 2⁵³) — the established
      // [[verifyCandidatePairs]] equivalence, applied to the direct
      // strategy's (much larger) Σ df² aggregation
      uu.alias("a").join(uu.alias("b"),
          col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          expr("CAST(round(round(a.u * b.u, 6) * 1000000, 0) AS BIGINT)").as("p"))
        .groupBy("doc_a", "doc_b")
        .agg(round(sum(col("p")) / 1000000d, 6).as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      verifyCandidatePairs(candidatesFromRem(remDf, threshold), vecs, threshold)
    }
  }

  /** Per-doc sparse vectors as maps: dimension-shaped (one row per
    * doc), so Catalyst broadcasts them at small scale and shuffle-joins
    * at large — never a per-term explode. */
  private def docVectors(uu: DataFrame): DataFrame =
    uu.groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("t"), col("u")))).as("vec"))

  /** Exact-cosine verify over candidate pairs against (doc_id, vec)
    * sparse-map vectors — shared by the in-memory prefix path and the
    * storage-served form (one definition, so the two can never drift).
    *
    * The dot runs in integer micro-units: each shared-term product is
    * the SAME 6 dp-rounded value the direct path feeds DECIMAL
    * accumulation (round(p,6)·10⁶ is integral, so the long sum is
    * exactly 10⁶ × the decimal sum and the final rounded double is
    * bit-identical); missing keys contribute 0 like non-shared terms. */
  private def verifyCandidatePairs(cand: DataFrame, vecs: DataFrame,
      threshold: Double): DataFrame = {
    val micro = aggregate(map_entries(col("va")), lit(0L),
      (acc, e) => acc + coalesce(
        round(round(e.getField("value") * element_at(col("vb"), e.getField("key")), 6)
          * 1000000d).cast("long"),
        lit(0L)))
    cand
      .join(vecs.select(col("doc_id").as("doc_a"), col("vec").as("va")), "doc_a")
      .join(vecs.select(col("doc_id").as("doc_b"), col("vec").as("vb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(micro / 1000000d, 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The candidate-pair set the prefix strategy verifies — exposed so
    * ScaleSpec can pin the prefix filter's selectivity (candidates ≪
    * Σ df² on a stopword-heavy corpus). */
  private[graft] def tfidfCosineCandidates(terms: DataFrame, threshold: Double,
      maxDfPpm: Long = 500000L): DataFrame =
    prefixCandidates(tfidfIndex(terms, maxDfPpm), threshold)

  /** Suffix mass is compared against `threshold − PrefixSlack`, not the
    * raw threshold: the verified cosine is accumulated from 6 dp-rounded
    * per-term products, so it can exceed the real-arithmetic value the
    * Cauchy–Schwarz bound speaks about by ≤ 5e-7 per shared term (plus
    * ~1e-3 for rounded unit vectors' norms straying from exactly 1).
    * 5e-3 keeps the filter conservative for docs up to ~8 000 shared
    * terms — far past this corpus — at the cost of slightly longer
    * prefixes. */
  private val PrefixSlack = 5e-3

  /** Raw per-(doc, term) frequencies — the append-only base relation
    * every tf-idf derivative (df, idf, norms, unit vectors) is a pure
    * function of. Split out so the stored-index lifecycle can persist
    * THIS (and re-derive statistics without ever re-tokenizing). */
  private def tfTable(terms: DataFrame): DataFrame =
    terms.select(col("doc_id"), col("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))

  /** (idf table `(t, idf)`, unit-vector postings `(doc_id, t, idf, u)`)
    * from a persisted raw-tf relation: corpus size n → document
    * frequencies under the `maxDfPpm` vocabulary cap → idf → the
    * shared [[unitVectors]] tail. */
  private def derivedFromTf(tok: DataFrame, maxDfPpm: Long,
      nDocs0: Option[Long] = None): (DataFrame, DataFrame) = {
    // build/refresh callers already count the corpus for meta's stat_n —
    // passing it in drops the embedded distinct-count aggregate (and its
    // broadcast join) from the df/idf subtree (optimization r13)
    val n = nDocs0 match {
      case Some(v) => tok.sparkSession.range(1).select(lit(v).as("n"))
      case None => tok.select(col("doc_id")).distinct().agg(count(lit(1)).as("n"))
    }
    val df = tok.groupBy("t").agg(count(lit(1)).as("df"))
      .join(broadcast(n), lit(true))
      .filter(col("df") * 1000000L <= col("n") * maxDfPpm)
      .select(col("t"), round(log10(col("n").cast("double") / col("df")), 6).as("idf"))
    (df, unitVectors(tok, df))
  }

  /** Unit vectors `(doc_id, t, idf, u)` from raw tf under a GIVEN
    * `(t, idf)` table — the weight → norm → normalize tail shared by
    * the full build/refresh (fresh idf) and the frozen-idf delta
    * append (stored idf). Terms outside the idf vocabulary drop out in
    * the inner join; a doc with no in-vocabulary term vanishes
    * entirely (it can contribute to no pair). Returned persisted: the
    * postings feed the prefix index, the probe side and both verify
    * sides — uncached, the upstream joins would re-run per consumer
    * (measured ~2.5× on the whole query at sf0.1).
    *
    * `broadcastSide`: the build/refresh path broadcasts the derived
    * idf under corpus-sized tok (avoids shuffling the corpus); the
    * APPEND path broadcasts TOK instead — there tok is delta-sized
    * while the vocabulary is corpus-scale in the worst case
    * (random-shingle probe: ~29 M distinct terms at 500 k docs;
    * force-broadcasting it was measured at 4× the whole append, and
    * leaving the join unhinted planned a 10 s SMJ on a tiny delta —
    * TfidfScale / bench-phase, docs/EXPERIMENTS.md round 17). */
  private def unitVectors(tok: DataFrame, idf: DataFrame,
      broadcastSide: String = "idf"): DataFrame = {
    val w = (if (broadcastSide == "tok") broadcast(tok) else tok)
      .join(if (broadcastSide == "idf") broadcast(idf) else idf, Seq("t"))
      .select(col("doc_id"), col("t"), col("idf"),
        round(col("tf") * col("idf"), 6).as("w"))
    // norm + normalize in ONE pass over w via a whole-partition window
    // (optimization r12, guide §2.4): the groupBy(doc_id) + join form
    // evaluated the tok ⋈ idf join TWICE (once under the aggregate,
    // once as the join probe) and paid two exchanges — measured 2.4 s
    // → 1.6 s on the sf0.1 corpus build. Value-identical: the window
    // sums the same 6 dp-rounded terms per doc in exact integer MICROS
    // (r13 — round(w², 6)·10⁶ is integral, the BIGINT sum is exactly
    // 10⁶ × the old DECIMAL(28,12) sum, and dividing by 10⁶ correctly
    // rounds the same exact rational the DECIMAL→DOUBLE cast did), and
    // each row's u is the same round(w / nrm, 6).
    val whole = Window.partitionBy(col("doc_id"))
    w.withColumn("nrm",
        sqrt(sum(expr("CAST(round(round(w * w, 6) * 1000000, 0) AS BIGINT)")).over(whole)
          / 1000000d))
      .select(col("doc_id"), col("t"), col("idf"),
        round(col("w") / col("nrm"), 6).as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** The tf-idf unit-vector index `(doc_id, t, idf, u)`, persisted
    * ([[tfTable]] → [[derivedFromTf]]). */
  private def tfidfIndex(terms: DataFrame, maxDfPpm: Long): DataFrame = {
    val tok = tfTable(terms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    derivedFromTf(tok, maxDfPpm)._2
  }

  /** rem_j = Σ_{i ≥ j} u_i² in the global (idf desc, t) order: the
    * squared mass this doc still holds from term j onward. Term j is
    * indexed iff √rem_j could still reach the (slack-adjusted)
    * threshold — once it can't, every remaining (hotter) term stays
    * out of the index. rem_1 ≈ 1, so every doc indexes ≥ 1 term.
    * Computed as whole-doc total MINUS the running prefix sum: both
    * frames are O(terms) per document, where the direct
    * currentRow→unboundedFollowing suffix frame is re-aggregated per
    * row by the engine — O(terms²) per doc (a measured 10+ s of the
    * old 59.7 s at sf0.1). The subtraction's float error (~1e-12
    * relative) is absorbed by PrefixSlack; candidates are verified
    * exactly, so borderline prefix membership never changes output.
    *
    * rem is threshold-INDEPENDENT, so [[writeTfidfIndex]] computes it
    * once at build time and any query threshold filters the stored
    * value. */
  private def withRem(u: DataFrame): DataFrame = {
    val ordered = Window.partitionBy(col("doc_id"))
      .orderBy(col("idf").desc, col("t"))
    val upToPrev = ordered.rowsBetween(Window.unboundedPreceding, -1)
    val whole = Window.partitionBy(col("doc_id"))
    val uSq = col("u") * col("u")
    u.withColumn("rem",
      sum(uSq).over(whole) - coalesce(sum(uSq).over(upToPrev), lit(0.0)))
  }

  /** Prefix-filtered candidate pairs over a [[tfidfIndex]] table. */
  private def prefixCandidates(u: DataFrame, threshold: Double): DataFrame =
    candidatesFromRem(withRem(u), threshold)

  /** Candidate generation over postings that already carry `rem` —
    * shared by the in-memory path (fresh [[withRem]]) and the stored
    * index (rem materialized at build time). */
  private def candidatesFromRem(uRem: DataFrame, threshold: Double): DataFrame = {
    val uu = uRem.select(col("doc_id"), col("t"), col("u"))
    val pref = uRem.filter(sqrt(col("rem")) >= threshold - PrefixSlack)
      .select(col("doc_id"), col("t"), col("u"))
    pref.alias("a").join(uu.alias("b"),
        col("a.t") === col("b.t") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
  }

  /** Storage layout for tf-idf similarity SERVING — the sparse-vector
    * counterpart of [[writeIvfIndex]]/[[Dedup.writeIncrementalIndex]]:
    * the expensive corpus pass (tokenize → tf → df → idf → norms →
    * unit vectors → suffix mass) runs ONCE at build time and lands as
    *
    *  - `postings/` — (doc_id, t, idf, u, rem), dir-partitioned by
    *    `tb = pmod(xxhash64(t), termBuckets)`: the candidate self-join
    *    reads the whole layout, but a DELTA probe (decontamination, an
    *    ingest gate joining arriving docs against the corpus index)
    *    touches only its own terms' buckets — partition pruning, the
    *    [[Dedup.incrementalDedupStored]] shape;
    *  - `vectors/` — (doc_id, vec sparse map), dir-partitioned by
    *    `db = pmod(xxhash64(doc_id), docBuckets)`: the verify stage of
    *    a delta probe reads candidate docs' buckets only;
    *  - `meta/` — (max_df_ppm, term_buckets, doc_buckets), so serving
    *    can never drift from the stored contract.
    *
    * `rem` (see [[withRem]]) is threshold-independent and stored, so
    * serving skips both corpus windows as well as the aggregations. At
    * 100 TB the posting index is the artifact a sparse-similarity
    * pipeline maintains incrementally; rebuilding it per query — what
    * the in-memory form must do — is the measured 2/3 of
    * `join_tfidf_cosine`'s cost at sf0.1.
    *
    * Bucket counts auto-size from the corpus doc count exactly like
    * the dedup index (≤ 0 → nDocs/2000 clamped to [1, 256]/[1, 512]) —
    * fixed large counts make small corpora pay a metadata storm. */
  def writeTfidfIndex(terms: DataFrame, path: String, maxDfPpm: Long = 500000L,
      termBuckets0: Int = 0, docBuckets0: Int = 0): Unit = {
    val tok = tfTable(terms)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // always counted: stat_n (docs the frozen statistics cover) is
    // the denominator of the staleness budget, stored in meta — and
    // passed into the idf derivation so its subtree skips a second
    // distinct-count aggregate
    val nDocs = tok.select(col("doc_id")).distinct().count()
    val (idf, u) = derivedFromTf(tok, maxDfPpm, Some(nDocs))
    try {
      val termBuckets = if (termBuckets0 > 0) termBuckets0
        else math.max(1L, math.min(256L, nDocs / 2000L)).toInt
      val docBuckets = if (docBuckets0 > 0) docBuckets0
        else math.max(1L, math.min(512L, nDocs / 2000L)).toInt
      // the raw-tf base relation (ALL terms — the maxDfPpm cut is a
      // statistic, not data, so refresh can revisit it as df drifts)
      tok
        .withColumn("tb", pmod(xxhash64(col("t")), lit(termBuckets.toLong)))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/tf")
      writeTfidfDerived(u, idf, path, termBuckets, docBuckets)
      terms.sparkSession.range(1).select(
          lit(maxDfPpm).as("max_df_ppm"), lit(termBuckets).as("term_buckets"),
          lit(docBuckets).as("doc_buckets"), lit(nDocs).as("stat_n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      graft.sources.Tables.deleteRecursive(s"$path/staleness")
    } finally { u.unpersist(); tok.unpersist(): Unit }
  }

  /** The derived serving tier of a [[writeTfidfIndex]] layout:
    * rem-carrying postings, sparse doc vectors, and the `(t, idf)`
    * statistics table serving/append freeze against. */
  private def writeTfidfDerived(u: DataFrame, idf: DataFrame, path: String,
      termBuckets: Int, docBuckets: Int): Unit =
    // three independent stores off the shared (persisted) unit-vector
    // relation — submit the write jobs concurrently (guide §2.6): their
    // wall is dominated by per-job fixed latency, not data volume
    Par.unit(
      () => withRem(u)
        .withColumn("tb", pmod(xxhash64(col("t")), lit(termBuckets.toLong)))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings"),
      () => docVectors(u.select(col("doc_id"), col("t"), col("u")))
        .withColumn("db", pmod(xxhash64(col("doc_id")), lit(docBuckets.toLong)))
        .repartition(col("db"))
        .write.mode("overwrite").partitionBy("db").parquet(s"$path/vectors"),
      () => idf
        .withColumn("tb", pmod(xxhash64(col("t")), lit(termBuckets.toLong)))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$path/idf"))

  /** Fold a delta batch of term streams into a [[writeTfidfIndex]]
    * layout in O(delta) — the ingest verb the other serving indexes
    * already have ([[Dedup.appendToIncrementalIndex]],
    * [[appendToIvfIndex]]). Raw tf rows append into their `tb`
    * partitions; the delta's unit vectors and suffix masses are
    * computed under the STORED `(t, idf)` table — collection
    * statistics FROZEN at the last build/refresh, the standard serving
    * posture (search engines score against stale collection stats
    * between refreshes; a per-append global idf rewrite would touch
    * every stored posting, O(corpus) by definition). Consequences the
    * frozen contract makes explicit, both mirrored by the
    * `join_tfidf_append_frozen` oracle and bounded by construction:
    *  - delta terms outside the frozen vocabulary are not indexed
    *    (they can only match other post-freeze docs);
    *  - idf drift after appending d docs to n is ≤ log10((n+d)/n)
    *    per term — a 10% corpus growth moves any idf by < 0.0414.
    * [[refreshTfidfIndex]] is the bounded-staleness repair: it
    * re-derives exact statistics from the stored raw tf without
    * re-tokenizing. rem stays valid across batches — it is a per-doc
    * suffix mass in the (idf DESC, t) order, and every doc (old or
    * new) is weighted under the same frozen idf table.
    *
    * Returns the CUMULATIVE [[TfidfStaleness]] after this batch — the
    * drift counters [[refreshTfidfIndexIfStale]] budgets on.
    *
    * Durability: the raw-tf base relation appends FIRST; the three
    * derived stores (postings, vectors, staleness) then land in any
    * order (submitted concurrently). A crash leaving any subset (torn
    * append) or a blind full retry (double-applied batch) is repaired
    * exactly by [[repairTfidfIndex]] — tf's `(doc_id, t)` uniqueness
    * makes the single-applied state recoverable by construction, and
    * the repair re-derives every other store from tf alone. */
  def appendToTfidfIndex(path: String, delta: DataFrame): TfidfStaleness = {
    val spark = delta.sparkSession
    val m = spark.read.parquet(s"$path/meta").head()
    val termBuckets = m.getAs[Int]("term_buckets")
    val docBuckets = m.getAs[Int]("doc_buckets")
    val tok = tfTable(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // partition-prune the frozen-idf lookup to the delta's touched
    // term buckets (≤ termBuckets DISTINCT values however large the
    // delta — the incrementalDedupStored collect pattern), and join
    // WITHOUT a broadcast hint: the vocabulary can be corpus-scale in
    // the worst case (see unitVectors' doc) while tok is delta-sized
    val tbs = tok
      .select(pmod(xxhash64(col("t")), lit(termBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val idf = spark.read.parquet(s"$path/idf")
      .filter(col("tb").cast("long").isin(tbs: _*))
      .select(col("t"), col("idf"))
    val u = unitVectors(tok, idf, broadcastSide = "tok")
    try {
      // tf lands FIRST (the raw base relation repair re-derives from),
      // then the three derived appends go out concurrently (guide
      // §2.6): any subset of them landing repairs exactly like the old
      // fixed postings → vectors → staleness order did —
      // [[repairTfidfIndex]] distinct-rewrites tf and re-derives every
      // serving store from it, so the recoverable state depends only
      // on tf's contents
      tok
        .withColumn("tb", pmod(xxhash64(col("t")), lit(termBuckets.toLong)))
        .repartition(col("tb"))
        .write.mode("append").partitionBy("tb").parquet(s"$path/tf")
      Par.unit(
        () => withRem(u)
          .withColumn("tb", pmod(xxhash64(col("t")), lit(termBuckets.toLong)))
          .repartition(col("tb"))
          .write.mode("append").partitionBy("tb").parquet(s"$path/postings"),
        () => docVectors(u.select(col("doc_id"), col("t"), col("u")))
          .withColumn("db", pmod(xxhash64(col("doc_id")), lit(docBuckets.toLong)))
          .repartition(col("db"))
          .write.mode("append").partitionBy("db").parquet(s"$path/vectors"),
        () => {
          // batch staleness counters in ONE delta-sized aggregate: docs
          // this batch adds, and the term mass the frozen vocabulary
          // refuses (OOV — exactly the rows the unitVectors inner join
          // drops). These land as one tiny staleness/ row per batch, so
          // the cumulative drift is always readable without recounting
          // anything corpus-sized. Runs inside the concurrent batch —
          // it scans only the persisted delta tf and the pruned idf.
          val sRow = tok
            .join(idf.select(col("t"), lit(1).as("__inv")), Seq("t"), "left")
            .agg(countDistinct(col("doc_id")).as("n_docs"),
              coalesce(sum(when(col("__inv").isNull, col("tf"))), lit(0L)).as("oov_tf"),
              coalesce(sum(col("tf")), lit(0L)).as("total_tf"))
            .head()
          spark.range(1).select(lit(sRow.getAs[Long]("n_docs")).as("n_docs"),
              lit(sRow.getAs[Long]("oov_tf")).as("oov_tf"),
              lit(sRow.getAs[Long]("total_tf")).as("total_tf"))
            .coalesce(1).write.mode("append").parquet(s"$path/staleness")
        })
      tfidfStaleness(spark, path)
    } finally { u.unpersist(); tok.unpersist(): Unit }
  }

  /** Cumulative staleness of a [[writeTfidfIndex]] layout since its
    * last build/[[refreshTfidfIndex]] — a sum over the per-batch
    * `staleness/` rows (one tiny row per append) against `stat_n`
    * from meta. O(#batches), never a corpus scan. */
  def tfidfStaleness(spark: org.apache.spark.sql.SparkSession,
      path: String): TfidfStaleness = {
    val meta = spark.read.parquet(s"$path/meta")
    // pre-stat_n format (ADVICE r9/r10): an index written before the
    // staleness counters has no stat_n column — recount it from the
    // stored raw tf (the exact value a build would have recorded)
    // WITHOUT persisting anything: staleness is a READ and must stay
    // pure (two concurrent readers racing a delete-then-write meta
    // overwrite, or a read-only mount, were the r10 failure modes).
    // The recount is re-paid per probe on an old-format index; the
    // PERSISTED upgrade is [[repairTfidfIndex]]'s job (its refresh
    // rewrites meta with stat_n) — run the repair verb once to make
    // later staleness reads O(1) again.
    val statN =
      if (meta.schema.fieldNames.contains("stat_n"))
        meta.head().getAs[Long]("stat_n")
      else {
        warnLegacyRecount(path, "tfidf", "repairTfidfIndex")
        spark.read.parquet(s"$path/tf")
          .select(col("doc_id")).distinct().count()
      }
    if (!new java.io.File(s"$path/staleness").exists())
      return TfidfStaleness(0L, statN, 0L, 0L)
    val r = spark.read.parquet(s"$path/staleness")
      .agg(coalesce(sum(col("n_docs")), lit(0L)),
        coalesce(sum(col("oov_tf")), lit(0L)),
        coalesce(sum(col("total_tf")), lit(0L))).head()
    TfidfStaleness(r.getLong(0), statN, r.getLong(1), r.getLong(2))
  }

  /** The refresh TRIGGER closing the drift loop (VERDICT r8 #3):
    * [[refreshTfidfIndex]] runs only when the cumulative staleness
    * trips the budget — corpus growth past `maxGrowthPpm` (which
    * bounds per-term idf drift at log10(1 + growth)) or OOV term mass
    * past `maxOovPpm` (drift the growth bound cannot see: mass the
    * frozen vocabulary isn't indexing at all). Below budget the append
    * posture stands — serving stays frozen-stats, the bounded-error
    * contract `join_tfidf_append_frozen` pins. Returns whether a
    * refresh ran. */
  def refreshTfidfIndexIfStale(spark: org.apache.spark.sql.SparkSession,
      path: String, maxGrowthPpm: Long = 100000L,
      maxOovPpm: Long = 50000L,
      st0: Option[TfidfStaleness] = None): Boolean = {
    // `st0`: callers that just appended already hold the cumulative
    // staleness the append returned — re-probing the store would re-pay
    // two (tiny) read jobs for the identical value
    val st = st0.getOrElse(tfidfStaleness(spark, path))
    val stale = st.growthPpm > maxGrowthPpm || st.oovMassPpm > maxOovPpm
    if (stale) refreshTfidfIndex(spark, path)
    stale
  }

  /** Torn/replayed-append RECOVERY for a [[writeTfidfIndex]] layout
    * (ADVICE r8). The append sequence writes tf → postings → vectors →
    * staleness; a crash mid-sequence leaves the derived stores behind
    * the raw tf, and a blind retry of the whole batch lands tf rows
    * twice. Both states repair to the exact single-applied result
    * because `(doc_id, t)` is unique in tf by construction
    * ([[tfTable]] aggregates per pair): distinct-rewrite tf, then
    * [[refreshTfidfIndex]] re-derives every serving store (and the
    * statistics clock) from it. Full rewrite — the rare recovery
    * path; routine drift repair is the refresh alone. Repair doubles
    * as the explicit FORMAT-UPGRADE verb (ADVICE r10): the refresh
    * rewrites meta with a fresh stat_n, so staleness reads on a
    * pre-stat_n layout stay pure and become O(1) after one repair. */
  def repairTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    Layout.distinctRewrite(spark, s"$path/tf", "tb")
    refreshTfidfIndex(spark, path)
  }

  /** Torn/replayed-insert RECOVERY for a [[writeKnnGraphIndex]] layout
    * (ADVICE r8): a replayed [[appendToKnnGraphIndex]] batch lands its
    * edge and vector rows twice — duplicate `(qid, vid)` beam
    * candidates would then hold two beam slots and surface as
    * duplicate result rows. Both stores are duplicate-free by
    * construction, so distinct-rewrite restores the single-applied
    * state; a following [[pruneKnnGraphIndex]] (which also collapses
    * duplicates in the partitions it rewrites) re-caps degrees if the
    * replay pushed nodes past the bound. Repair is also the explicit
    * FORMAT-UPGRADE verb (ADVICE r10): a pre-base_nodes meta is
    * rewritten here with the recounted node total, so staleness reads
    * ([[knnGraphStaleness]]) stay pure and O(1) afterwards. */
  def repairKnnGraphIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    Layout.distinctRewrite(spark, s"$path/adj", "sb")
    Layout.distinctRewrite(spark, s"$path/vectors", "db")
    val meta = spark.read.parquet(s"$path/meta")
    if (!meta.schema.fieldNames.contains("base_nodes")) {
      val mm = meta.head()
      val n = spark.read.parquet(s"$path/vectors").count()
      spark.range(1).select(
          lit(mm.getAs[Int]("src_buckets")).as("src_buckets"),
          lit(mm.getAs[Int]("doc_buckets")).as("doc_buckets"),
          lit(n).as("base_nodes"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    }
  }

  /** Delta INGEST-GATE probe against a [[writeTfidfIndex]] layout —
    * the tf-idf-space twin of [[Dedup.incrementalDedupStored]]: score
    * an arriving batch's documents against the STORED corpus without
    * appending them, returning (new_doc, dup_of, cos ≥ threshold)
    * cross pairs. The delta embeds under the FROZEN stored idf
    * (exactly [[appendToTfidfIndex]]'s weighting, so gate-then-append
    * is consistent), and the probe reads ONLY the delta's touched term
    * buckets from both the idf and postings stores — partition
    * pruning makes the gate O(delta terms' bucket rows), never a
    * corpus posting scan, and the join is delta×corpus restricted to
    * shared terms (the direct-strategy accumulation, exact DECIMAL). */
  def tfidfDeltaProbe(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, threshold: Double): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    val termBuckets = m.getAs[Int]("term_buckets")
    val tok = tfTable(delta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tbs = tok
        .select(pmod(xxhash64(col("t")), lit(termBuckets.toLong)).as("b"))
        .distinct().collect().map(_.getLong(0)).toSeq
      val idf = spark.read.parquet(s"$path/idf")
        .filter(col("tb").cast("long").isin(tbs: _*))
        .select(col("t"), col("idf"))
      val u = unitVectors(tok, idf, broadcastSide = "tok")
      try {
        val posts = spark.read.parquet(s"$path/postings")
          .filter(col("tb").cast("long").isin(tbs: _*))
          .select(col("doc_id").as("dup_of"), col("t"), col("u").as("bu"))
        u.select(col("doc_id").as("new_doc"), col("t"), col("u").as("au"))
          .join(posts, Seq("t"))
          .select(col("new_doc"), col("dup_of"),
            // integer-micros accumulation — the same bit-identical
            // DECIMAL→BIGINT rewrite as the direct strategy (see
            // pairsFromPostings)
            expr("CAST(round(round(au * bu, 6) * 1000000, 0) AS BIGINT)").as("p"))
          .groupBy("new_doc", "dup_of")
          .agg(round(sum(col("p")) / 1000000d, 6).as("cos"))
          .filter(col("cos") >= threshold)
          .localCheckpoint(true)
      } finally u.unpersist(): Unit
    } finally tok.unpersist(): Unit
  }

  /** Re-derive the serving tier from the stored raw tf — the
    * statistics-repair verb closing the frozen-idf drift
    * [[appendToTfidfIndex]] accrues: fresh n/df/idf over the FULL
    * stored corpus (the maxDfPpm vocabulary cut re-evaluated, so terms
    * that crossed the cap in either direction come and go exactly as a
    * from-scratch build would have them), then postings/vectors/idf
    * overwritten. After a refresh the served pairs are value-identical
    * to a full rebuild on the grown corpus (the join_tfidf_append
    * oracle pins this) — but the corpus re-TOKENIZE, the dominant cost
    * of a rebuild, never happens: the input is the compact raw-tf
    * relation. Amortized maintenance, like compaction — run it on a
    * drift budget, not per delta. */
  def refreshTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val m = spark.read.parquet(s"$path/meta").head()
    val maxDfPpm = m.getAs[Long]("max_df_ppm")
    val termBuckets = m.getAs[Int]("term_buckets")
    val docBuckets = m.getAs[Int]("doc_buckets")
    val tok = spark.read.parquet(s"$path/tf")
      .select(col("doc_id"), col("t"), col("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the refreshed statistics cover the FULL stored corpus: count it
    // once, up front — stat_n for the meta rewrite AND the literal n
    // the idf derivation embeds (one distinct-count aggregate, not two)
    val nDocs = tok.select(col("doc_id")).distinct().count()
    val (idf, u) = derivedFromTf(tok, maxDfPpm, Some(nDocs))
    try {
      writeTfidfDerived(u, idf, path, termBuckets, docBuckets)
      spark.range(1).select(
          lit(maxDfPpm).as("max_df_ppm"), lit(termBuckets).as("term_buckets"),
          lit(docBuckets).as("doc_buckets"), lit(nDocs).as("stat_n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      graft.sources.Tables.deleteRecursive(s"$path/staleness")
    } finally { u.unpersist(); tok.unpersist(): Unit }
  }

  /** LSM compaction for a [[writeTfidfIndex]] layout after appends —
    * [[Layout.compactPartitioned]] over the three partitioned stores
    * (`idf/` is overwrite-only and never fragments). Returns the
    * number of partitions rewritten. */
  def compactTfidfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, maxFilesPerPartition: Int = 1): Int =
    // independent stores — compact all three concurrently (guide §2.6)
    Par.run[Int](Seq(
      () => Layout.compactPartitioned(spark, s"$path/tf", Seq("tb"),
        maxFilesPerPartition),
      () => Layout.compactPartitioned(spark, s"$path/postings", Seq("tb"),
        maxFilesPerPartition),
      () => Layout.compactPartitioned(spark, s"$path/vectors", Seq("db"),
        maxFilesPerPartition))).sum

  /** [[tfidfCosinePairs]] served from a [[writeTfidfIndex]] layout:
    * the SAME auto strategy (direct under the Σ df² budget, prefix +
    * verify above it) with candidates drawn from the stored
    * rem-carrying postings and verification against the stored sparse
    * vectors — output value-identical to the in-memory form under
    * either strategy (ScaleSpec pins both). */
  def tfidfCosinePairsStored(spark: org.apache.spark.sql.SparkSession,
      path: String, threshold: Double, strategy: String = "auto",
      directRowBudget: Long = 200000000L): DataFrame = {
    val posts = spark.read.parquet(s"$path/postings")
      .select(col("doc_id"), col("t"), col("u"), col("rem"))
    pairsFromPostings(posts.select(col("doc_id"), col("t"), col("u")),
      posts,
      spark.read.parquet(s"$path/vectors").select(col("doc_id"), col("vec")),
      threshold, strategy, directRowBudget)
  }

  /** Product-quantization ADC top-k (Jégou et al., TPAMI'11): the
    * vector space splits into `m` subspaces of `subDim` dims; each
    * subspace gets a `nCodes`-entry codebook (deterministic anchors:
    * the sub-vectors of the first `nCodes` vectors by id — the PQ
    * analogue of [[firstNCentroids]]; swap in per-subspace k-means for
    * production recall, same contract). Corpus vectors ENCODE once to
    * m code ids (nearest code by L2², ties to the smallest cid); each
    * query builds an m×nCodes lookup table of sub-space inner products
    * in integer MICROS, and a candidate's approximate score is the
    * exact BIGINT sum of its m table cells — asymmetric distance
    * computation with zero float accumulation, so the scores are
    * bit-portable and the oracle hash-matches.
    *
    * Scale shape: the codebook is m·nCodes rows (broadcast); encoding
    * is one broadcast join + a map-side argmin aggregate, m rows per
    * corpus vector on the wire, codes are m bytes per vector — the
    * memory-bandwidth win that makes PQ the billion-vector serving
    * format. The ADC scan is linear in |corpus|·|queries| by design
    * (each probe is m integer adds, 8–64× cheaper than a full-dim
    * float dot); at corpus scale it composes with IVF — partition the
    * codes by [[assignNearest]] cid and scan only probed lists. */
  def topKPqAdc(emb: DataFrame, vec: Column, id: Column, isQuery: Column,
      m: Int, subDim: Int, nCodes: Int, k: Int): DataFrame = {
    val e = emb.select(id.as("vec_id"), Dedup.asDouble(vec).as("v"), isQuery.as("isq"))
    // (vec_id, m, sv): the per-subspace slice rows
    val sub = e.select(col("vec_id"), col("isq"), explode(expr(
        s"""transform(sequence(0, ${m - 1}),
           |  mi -> struct(cast(mi as bigint) as m, slice(v, mi * $subDim + 1, $subDim) as sv))"""
          .stripMargin)).as("s"))
      .select(col("vec_id"), col("isq"), col("s.m").as("m"), col("s.sv").as("sv"))
    val cb = broadcast(sub.where(col("vec_id") < nCodes)
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cv")))
    // encode: nearest code per (vector, subspace) — max_by over the
    // packed (−l2, −cid) order = (l2 ASC, cid ASC), map-side partial
    val enc = sub.join(cb, Seq("m"))
      .withColumn("diff", zip_with(col("sv"), col("cv"), (a, b) => a - b))
      .withColumn("l2", dot(col("diff"), col("diff")))
      .groupBy("vec_id", "m")
      .agg(max_by(col("cid"), struct(-col("l2"), -col("cid"))).as("cid"))
    // per-query LUT: subspace inner products in integer micros
    val lut = sub.where(col("isq"))
      .select(col("vec_id").as("qid"), col("m"), col("sv").as("qv"))
      .join(cb, Seq("m"))
      .select(col("qid"), col("m"), col("cid"),
        round(dot(col("qv"), col("cv")) * 1e6, 0).cast("long").as("dm"))
    // ADC: candidate score = Σ_m LUT[m, code(x, m)] — exact BIGINT
    val scored = enc.join(broadcast(lut), Seq("m", "cid"))
      .where(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id")
      .agg(sum(col("dm")).as("score_micros"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micros").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("score_micros"))
  }

  /** Storage layout for IVF+PQ SERVING — the production
    * billion-vector index shape (FAISS "IVF…,PQ…" with an exact
    * re-rank tier): corpus vectors assigned to coarse centroids and
    * written PARTITIONED BY centroid id, each row carrying its m-byte
    * PQ code array NEXT TO the exact vector (the re-rank tier; codes
    * alone are the scan tier), plus the tiny centroid/codebook/meta
    * tables. A query batch partition-prunes to its probed lists, ADC-
    * scans the CODES (m integer adds per candidate), and re-ranks only
    * the shortlist against the exact vectors. Codebooks are the
    * deterministic first-`nCodes` anchors ([[topKPqAdc]]'s contract —
    * swap per-subspace k-means in production, same layout). */
  def writeIvfPqIndex(emb: DataFrame, vec: Column, id: Column,
      centroids: DataFrame, path: String,
      m: Int = 8, subDim: Int = 8, nCodes: Int = 8): Unit = {
    val spark = emb.sparkSession
    val e = withNorm(emb, vec, id)
    val sub = e.select(col("vid"), explode(expr(
        s"""transform(sequence(0, ${m - 1}),
           |  mi -> struct(cast(mi as bigint) as m, slice(v, mi * $subDim + 1, $subDim) as sv))"""
          .stripMargin)).as("s"))
      .select(col("vid"), col("s.m").as("m"), col("s.sv").as("sv"))
    val cb = sub.where(col("vid") < nCodes)
      .select(col("m"), col("vid").as("code"), col("sv").as("cv"))
    // encode: nearest sub-code per (vector, subspace), ties to the
    // smallest code — map-side max_by, then the m codes fold into one
    // ordered array per vector
    val codes = sub.join(broadcast(cb), Seq("m"))
      .withColumn("diff", zip_with(col("sv"), col("cv"), (a, b) => a - b))
      .withColumn("l2", dot(col("diff"), col("diff")))
      .groupBy("vid", "m")
      .agg(max_by(col("code"), struct(-col("l2"), -col("code"))).as("code"))
      .groupBy("vid")
      .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("mc"))
      .select(col("vid"), expr("transform(mc, p -> p.code)").as("codes"))
    assignNearest(e, centroids, Seq("v", "nrm"))
      .join(codes, Seq("vid"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/vectors")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    cb.write.mode("overwrite").parquet(s"$path/codebooks")
    spark.range(1).select(lit(m).as("m"), lit(subDim).as("sub_dim"),
        lit(nCodes).as("n_codes"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Serve top-k from a [[writeIvfPqIndex]] layout: probe lists from
    * the stored centroids, driver-side bounded cid literals prune the
    * vector scan to the probed partitions, the ADC pass scores CODES
    * against per-query integer-micro LUTs (exact BIGINT sums — zero
    * float accumulation, bit-portable), and only the per-query
    * `shortlist` deepest ADC candidates pay the exact-cosine re-rank.
    * Identical ranking semantics to composing [[topKIvfWith]]'s probe
    * restriction with [[topKPqAdc]]'s scores and an exact re-rank.
    *
    * `keep` (VERDICT r9 #3): candidate predicate over `vid`, applied
    * to the probed lists BEFORE the ADC scan — non-matching candidates
    * never pay even the m integer adds, the shortlist ranks matching
    * candidates only, and the result is the exact pipeline output over
    * the matching subset. Over-fetch `nProbe`/`shortlist` under
    * selective predicates; fewer-than-k matches return as-is. */
  def topKIvfPqStored(path: String, queries: DataFrame, vec: Column,
      id: Column, k: Int, nProbe: Int, shortlist: Int,
      keep: Column = lit(true)): DataFrame = {
    val spark = queries.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (m, subDim) = (meta.getAs[Int]("m"), meta.getAs[Int]("sub_dim"))
    val cents = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    val q2 = withNorm(queries, vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    val probes = q2.join(broadcast(cents), lit(true))
      .withColumn("qcos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("qrn", row_number().over(wProbe))
      .filter(col("qrn") <= nProbe)
      .select(col("qid"), col("qv"), col("qn"), col("cid"))
    val probedCids = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val vecs = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isin(probedCids: _*))
      .filter(keep)
      .select(col("vid"), col("v"), col("nrm"), col("codes"),
        col("cid").cast("long").as("cid"))
    // per-query LUT in integer micros (qid, m, code) -> dm
    val qsub = q2.select(col("qid"), explode(expr(
        s"""transform(sequence(0, ${m - 1}),
           |  mi -> struct(cast(mi as bigint) as m, slice(qv, mi * $subDim + 1, $subDim) as sv))"""
          .stripMargin)).as("s"))
      .select(col("qid"), col("s.m").as("m"), col("s.sv").as("qsv"))
    val lut = qsub.join(broadcast(cb), Seq("m"))
      .select(col("qid"), col("m"), col("code"),
        round(dot(col("qsv"), col("cv")) * 1e6, 0).cast("long").as("dm"))
    // ADC over probed lists: explode each candidate's code array back
    // to (m, code) rows, join the LUT, exact BIGINT sum — the same
    // inverted shape topKPqAdc scans, restricted to probed partitions
    val adc = probes.join(vecs, Seq("cid"))
      .filter(col("vid") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qn"), col("vid"), col("v"),
        col("nrm"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(lut), Seq("qid", "m", "code"))
      .groupBy(col("qid"), col("vid"))
      .agg(first(col("qv")).as("qv"), first(col("qn")).as("qn"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        sum(col("dm")).as("score_micros"))
    val wSl = Window.partitionBy(col("qid"))
      .orderBy(col("score_micros").desc, col("vid"))
    val wK = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    adc.withColumn("srn", row_number().over(wSl))
      .filter(col("srn") <= shortlist)
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cos"), col("score_micros"))
  }

  /** Sign-bit (binary) quantization: bit i of the code is `v[i] >= 0`,
    * packed into 32-bit words (MSB-first fold, so the word value stays
    * < 2³² — no 64-bit sign-overflow under ANSI arithmetic). `dims` is
    * static, so the fold unrolls into a PLAIN expression tree —
    * whole-stage-codegen'd, no CodegenFallback lambda in the plan. */
  def signCode(v: Column, dims: Int): Column = {
    require(dims > 0, "dims must be positive")
    val words = (0 until dims by 32).map { w0 =>
      (w0 until math.min(w0 + 32, dims)).foldLeft(lit(0L)) { (acc, i) =>
        acc * 2 + when(element_at(v, i + 1) >= 0, 1L).otherwise(0L)
      }
    }
    array(words: _*)
  }

  /** Hamming distance between two packed sign codes: popcount of the
    * per-word XOR, summed. Unrolled over the static word count — the
    * whole distance is one codegen'd integer expression (the reason to
    * pack at all: the pair scan touches 4·⌈d/32⌉ bytes, not 8·d). */
  def hammingDist(a: Column, b: Column, dims: Int): Column =
    (0 until (dims + 31) / 32)
      .map(w => bit_count(element_at(a, w + 1).bitwiseXOR(element_at(b, w + 1))))
      .reduce(_ + _).cast("long")

  /** ANN via binary sign-bit codes + exact re-rank: the Hamming pass
    * scores packed codes only (queries broadcast; per-pair work is a
    * handful of XOR+POPCNT instructions on 8–32 bytes — at 100 TB of
    * fp32 vectors the code table is 1/64th the size and the scan is
    * compute-trivial), keeps the `shortlist` nearest per query by
    * (hamming, vid), then re-ranks ONLY the shortlist against full
    * vectors with the shared sequential-fold cosine. Output contract
    * matches the other ANN tiers: (query_id, neighbor_id, rnk, cos).
    *
    * Deterministic end-to-end: Hamming is integral (ties broken by
    * vid), so the shortlist is exactly reproducible in SQL without
    * replicating the bit-packing — popcount(xor(codes)) ≡ the count of
    * sign mismatches, which is what the oracle counts directly. */
  def topKHammingRerank(emb: DataFrame, vec: Column, id: Column,
      isQuery: Column, k: Int, shortlist: Int, dims: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val e = withNorm(emb, vec, id).withColumn("code", signCode(col("v"), dims))
    val q = withNorm(emb.filter(isQuery), vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .withColumn("qcode", signCode(col("qv"), dims))
    // wide pass: codes only — the full vectors never reach this join,
    // and the shuffled window payload is (qid, vid, ham): 24 bytes/row
    val ham = e.select(col("vid"), col("code"))
      .join(broadcast(q.select(col("qid"), col("qcode"))),
        col("vid") =!= col("qid"))
      .withColumn("ham", hammingDist(col("code"), col("qcode"), dims))
    val hw = Window.partitionBy(col("qid")).orderBy(col("ham"), col("vid"))
    val sl = ham.withColumn("hrnk", row_number().over(hw))
      .filter(col("hrnk") <= shortlist)
      .select(col("qid").as("s_qid"), col("vid").as("s_vid"))
    // narrow pass: shortlist × full vectors only (shortlist·|q| rows)
    val rer = sl
      .join(e.select(col("vid"), col("v"), col("nrm")), col("vid") === col("s_vid"))
      .join(broadcast(q.select(col("qid"), col("qv"), col("qn"))),
        col("qid") === col("s_qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid"))
    rer.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"), round(col("cos"), 6).as("cos"))
  }

  /** Blocked exact k-NN graph: top-k cosine neighbors per vector WITHIN
    * its block (label/shard/cluster key) — the candidate generator is a
    * plain equi-join on the block key, so the pair count is
    * Σ_b |b|² instead of n², and the shuffle co-locates each block.
    * This is the kNN-graph construction step of graph-based dedup /
    * semantic clustering pipelines; at corpus scale the block key comes
    * from a coarse quantizer (IVF centroid id) instead of a label, same
    * dataflow. Exact within blocks, deterministic (cos desc, dst). */
  def knnGraphBlocked(emb: DataFrame, vec: Column, id: Column,
      block: Column, k: Int): DataFrame = {
    def side(p: String) = emb
      .select(id.as(p + "id"), block.as(p + "lbl"), Dedup.asDouble(vec).as(p + "v"))
      .withColumn(p + "nrm", sqrt(dot(col(p + "v"), col(p + "v"))))
    val a = side("a_")
    val b = side("b_")
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    a.join(b, col("a_lbl") === col("b_lbl") && col("a_id") =!= col("b_id"))
      .withColumn("cos", dot(col("a_v"), col("b_v")) / (col("a_nrm") * col("b_nrm")))
      .select(col("a_id").as("src"), col("b_id").as("dst"),
        col("a_lbl").as("label"), col("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("src"), col("dst"), col("label"), col("rnk"),
        round(col("cos"), 6).as("cos"))
  }

  /** (vid, cid) nearest-centroid assignments under the deterministic
    * first-N quantizer — the region key the graph-ANN entry tier
    * derives its per-region entry points from. */
  def ivfAssignments(emb: DataFrame, vec: Column, id: Column,
      nCentroids: Int): DataFrame =
    assignNearest(withNorm(emb, vec, id),
      firstNCentroids(emb, vec, id, nCentroids), Seq.empty)
      .select(col("vid"), col("cid"))

  /** MULTI-probe assignments: each vector indexed in its `nProbe`
    * nearest quantizer cells ((ccos DESC, cid) order — the
    * [[topKIvfWith]] probe rule applied to the corpus side). This is
    * the SPANN/multi-assignment closure for blocked graph
    * construction: single-assignment blocks are disjoint, so a
    * blocked kNN graph has ZERO cross-block edges and is CLOSED under
    * neighbor-of-neighbor refinement ([[refineKnnGraphIndex]]'s
    * documented precondition); overlapping blocks put boundary
    * vectors in both cells, giving every refinement round cross-cell
    * material to propagate. */
  def ivfAssignmentsMulti(emb: DataFrame, vec: Column, id: Column,
      nCentroids: Int, nProbe: Int): DataFrame = {
    val e = withNorm(emb, vec, id)
    val cents = firstNCentroids(emb, vec, id, nCentroids)
    val w = Window.partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid"))
    e.join(broadcast(cents), lit(true))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= nProbe)
      .select(col("vid"), col("cid"))
  }

  /** [[knnGraphBlocked]] over EXPLICIT (possibly multi-probe)
    * assignments: candidate pairs share at least one cell (DISTINCT —
    * a pair sharing both its cells must not hold two rank slots),
    * scored exactly, top-k per src in the construction order. The
    * corpus-scale blocked builder: Σ_cell |cell|² pair work, each cell
    * co-located by the equi-join on cid; with [[ivfAssignmentsMulti]]
    * the blocks overlap and the graph carries the cross-cell edges
    * one [[refineKnnGraphIndex]] round then spreads. */
  def knnGraphBlockedMulti(emb: DataFrame, vec: Column, id: Column,
      asg: DataFrame, k: Int): DataFrame = {
    val e = withNorm(emb, vec, id)
    def side(p: String) = asg.join(e, Seq("vid"))
      .select(col("vid").as(p + "id"), col("cid"),
        col("v").as(p + "v"), col("nrm").as(p + "n"))
    // score INLINE in the cid join (each side shuffles n·probe rows
    // once; the pair rows live only inside the join tasks), then
    // collapse pairs shared by BOTH cells through a slim map-side
    // (src, dst) aggregate — the duplicate carries an identical score,
    // so max ≡ either copy. A first cut that materialized DISTINCT id
    // pairs and re-fetched vectors through two more joins measured 25×
    // the single-probe builder at 100 k (the pair set crossed the wire
    // twice more); this shape adds ONE slim exchange to it.
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    side("a_").join(side("b_").withColumnRenamed("cid", "b_cid"),
        col("cid") === col("b_cid") && col("a_id") =!= col("b_id"))
      .select(col("a_id").as("src"), col("b_id").as("dst"),
        (dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))).as("cos"))
      .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("src"), col("dst"))
  }

  /** Exact GLOBAL top-k neighbor graph — the adjacency-construction
    * baseline (one all-pairs scoring pass, the [[topKBruteForce]]
    * shape applied corpus×corpus). Declared demo/ground-truth tier:
    * at corpus scale the same (src, dst) edge list comes from
    * [[knnGraphBlocked]] over quantizer blocks or any approximate
    * builder (NN-descent et al.) — [[writeKnnGraphIndex]] stores
    * whatever edge list it is given, and the beam SERVING tier is
    * construction-agnostic. (On structureless random vectors — this
    * testdata, graph ANN's published worst case — blocked/descent
    * construction measures near-chance recall, so the demo pins the
    * serving tier against the exact graph instead.) */
  def knnGraphExact(emb: DataFrame, vec: Column, id: Column, k: Int): DataFrame = {
    val e = withNorm(emb, vec, id)
    val a = e.select(col("vid").as("src"), col("v").as("av"), col("nrm").as("an"))
    val b = e.select(col("vid").as("dst"), col("v").as("bv"), col("nrm").as("bn"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
    a.join(b, col("src") =!= col("dst"))
      .withColumn("cos", dot(col("av"), col("bv")) / (col("an") * col("bn")))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("src"), col("dst"))
  }

  /** Storage layout for GRAPH-based ANN serving — the stored-adjacency
    * small-world tier (the HNSW/DiskANN-class serving shape) beside
    * the quantization tiers ([[writeIvfIndex]], [[writeIvfPqIndex]]):
    *
    *  - `adj/` — a (src, dst) neighbor-graph edge list (from
    *    [[knnGraphExact]], [[knnGraphBlocked]], or any external
    *    builder), dir-partitioned by `sb = pmod(xxhash64(src),
    *    srcBuckets)`: a beam expansion reads ONLY its frontier's
    *    buckets (partition pruning — the expansion is
    *    frontier-bounded, never a graph scan);
    *  - `vectors/` — (vid, v, nrm) partitioned by `db` for
    *    candidate-bounded exact scoring;
    *  - `entry/` — the given entry-point ids with their vectors
    *    (typically one per quantizer region via [[ivfAssignments]]:
    *    the SPANN/IVF-HNSW hybrid posture — probe the best regions'
    *    entries, then WALK);
    *  - `meta/` — bucket counts.
    *
    * Bucket counts auto-size from the corpus like every stored index
    * here (≤ 0 → n/100 clamped to [1, 64]). */
  /** MULTI-ENTRY tier for a [[writeKnnGraphIndex]] layout (VERDICT r10
    * #1 — the SPANN answer to walk-budget-bound serve recall): per
    * quantizer region, the `perRegion` member nodes with the smallest
    * ids instead of one min-id representative. The measured 1 M
    * failure mode this fixes: with ONE entry per region, the nProbe
    * best seeds land in nProbe DIFFERENT regions — at most one seed
    * starts inside the query's true region, and a w32/r3 walk
    * (≲ 800 scored candidates) cannot cross a ~4 000-member region
    * from a single far entry (docs/EXPERIMENTS.md, round 19/20). With
    * E entries per region the seed scoring picks the nProbe nearest of
    * E×regions sampled points, so several seeds start NEAR the query
    * inside its own region and the fixed walk budget is spent
    * polishing, not traversing.
    *
    * Entry choice is smallest-ids-per-region: ids carry no geometry
    * (any deterministic sample is as good as any other), and this rule
    * replays in one SQL window (`row_number() OVER (PARTITION BY cid
    * ORDER BY vid) <= E`) so oracles can rebuild the entry relation
    * relationally. One window pass over the assignment relation — a
    * single shuffle on cid at build time, negligible next to the
    * Σ|block|² adjacency construction.
    *
    * Scale posture: the walk broadcast-scores ALL stored entries per
    * query, so the entry tier must stay broadcast-sized —
    * regions × perRegion is build config, bounded like every other
    * collect in this family (e.g. 1 M vectors / 1 024 regions × 16
    * entries = 16 384 rows ≈ 8 MB at 64-d; at 1 B vectors size regions
    * to postings and keep the tier ≤ a few hundred MB). Past that the
    * next tier is a coarse entry GRAPH walked first (the HNSW upper
    * layer) — not needed at the measured scales. */
  def regionEntryPoints(asg: DataFrame, perRegion: Int): DataFrame = {
    require(perRegion >= 1, s"perRegion must be >= 1: $perRegion")
    val w = Window.partitionBy(col("cid")).orderBy(col("vid"))
    asg.select(col("vid"), col("cid"))
      .withColumn("er", row_number().over(w))
      .filter(col("er") <= perRegion)
      .select(col("vid"))
  }

  /** EPOCH-AWARE entry sample — [[regionEntryPoints]]' refresh-tier
    * twin: per region, the ⌈E/2⌉ SMALLEST plus ⌊E/2⌋ LARGEST member
    * ids (deduplicated when a region is smaller than E). On a fresh
    * build ids carry no geometry and this is just another arbitrary
    * deterministic sample; under an APPEND workload ids carry arrival
    * epoch, so the all-smallest rule is structurally append-blind — a
    * region holding any base members re-elects them on every refresh,
    * and freshly-ingested mass (e.g. a distribution shift: new content
    * clusters landing in an old region) never gains an entry. The
    * largest-id half automatically covers the newest epoch. Replays
    * as two SQL windows (row_number ASC/DESC) unioned DISTINCT. */
  def regionEntryPointsEpochAware(asg: DataFrame, perRegion: Int): DataFrame = {
    require(perRegion >= 1, s"perRegion must be >= 1: $perRegion")
    val lo = (perRegion + 1) / 2
    val hi = perRegion / 2
    val wAsc = Window.partitionBy(col("cid")).orderBy(col("vid"))
    val wDesc = Window.partitionBy(col("cid")).orderBy(col("vid").desc)
    asg.select(col("vid"), col("cid"))
      .withColumn("ra", row_number().over(wAsc))
      .withColumn("rd", row_number().over(wDesc))
      .filter(col("ra") <= lo || col("rd") <= hi)
      .select(col("vid")).distinct()
  }

  def writeKnnGraphIndex(adjacency: DataFrame, emb: DataFrame, vec: Column,
      id: Column, entryIds: DataFrame, path: String,
      srcBuckets0: Int = 0, docBuckets0: Int = 0,
      centroids: DataFrame = null): Unit = {
    val spark = emb.sparkSession
    // always counted: base_nodes denominates the insert-volume
    // staleness budget ([[knnGraphStaleness]]), stored in meta
    val n = emb.count()
    val srcBuckets = if (srcBuckets0 > 0) srcBuckets0
      else math.max(1L, math.min(64L, n / 100L)).toInt
    val docBuckets = if (docBuckets0 > 0) docBuckets0
      else math.max(1L, math.min(64L, n / 100L)).toInt
    adjacency.select(col("src"), col("dst"))
      .withColumn("sb", pmod(xxhash64(col("src")), lit(srcBuckets.toLong)))
      .repartition(col("sb"))
      .write.mode("overwrite").partitionBy("sb").parquet(s"$path/adj")
    val e = withNorm(emb, vec, id)
    e.withColumn("db", pmod(xxhash64(col("vid")), lit(docBuckets.toLong)))
      .repartition(col("db"))
      .write.mode("overwrite").partitionBy("db").parquet(s"$path/vectors")
    entryIds.select(col("vid"))
      .join(e, Seq("vid"))
      .select(col("vid"), col("v"), col("nrm"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/entry")
    // optional stored quantizer ((cid, cv, cn) — the centroid table the
    // build's region assignment used): with it persisted, INSERTION
    // walks seed from the delta's OWN region's entries instead of
    // broadcast-scoring every stored entry (VERDICT r11 #1 — the
    // |delta| × |entries| ingest term), and the entry tier becomes
    // refreshable after appends shift region membership. Centroids are
    // corpus members by construction ([[firstNCentroids]]), so every
    // centroid's region holds at least the centroid itself and a
    // region-restricted seed can never come up empty. Legacy layouts
    // without `centroids/` keep the all-entries seed.
    if (centroids != null) {
      centroids.select(col("cid"), col("cv"), col("cn"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
      // entry clock epoch ([[knnGraphEntryStaleness]]): the node count
      // the entry sample was drawn from
      spark.range(1).select(lit(n).as("entry_built_n"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/entry_meta")
    }
    spark.range(1).select(
        lit(srcBuckets).as("src_buckets"), lit(docBuckets).as("doc_buckets"),
        lit(n).as("base_nodes"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    graft.sources.Tables.deleteRecursive(s"$path/staleness")
  }

  /** Batch INSERT into a [[writeKnnGraphIndex]] layout — the HNSW-class
    * incremental-graph maintenance verb: every delta vector
    * beam-searches the PRISTINE stored graph for its `kGraph` nearest
    * reachable neighbors (batch semantics — no delta node sees
    * another, so insertion is order-free and the oracle replays each
    * walk independently), then
    *
    *  - forward edges (delta → found) land in the delta nodes' `sb`
    *    partitions,
    *  - REVERSE edges (found → delta) land in the found nodes'
    *    partitions — what makes the inserted vectors REACHABLE by
    *    later queries (HNSW's bidirectional link step),
    *  - the delta's (vid, v, nrm) rows append into `vectors/`.
    *
    * All writes are parquet appends into existing partition dirs —
    * O(delta·kGraph) rows, no stored file rewritten (the
    * GraphIndexSpec snapshot pin). Per batch a corpus node gains at
    * most one reverse edge per inserted neighbor, so degree drift is
    * bounded by the ingest volume; [[pruneKnnGraphIndex]] is the
    * refresh-tier verb that re-truncates to the degree bound (HNSW's
    * neighbor-selection prune), orthogonal exactly as statistics
    * refresh is to the tf-idf append. A torn or blindly-retried batch
    * is recovered by [[repairKnnGraphIndex]] (ADVICE r8). Returns the
    * number of inserted vectors. */
  def appendToKnnGraphIndex(path: String, delta: DataFrame, vec: Column,
      id: Column, kGraph: Int, nProbe: Int, beamWidth: Int,
      rounds: Int): Long = {
    require(beamWidth >= kGraph, s"beamWidth ($beamWidth) must be >= kGraph ($kGraph)")
    val spark = delta.sparkSession
    val m = spark.read.parquet(s"$path/meta").head()
    val srcBuckets = m.getAs[Int]("src_buckets")
    val docBuckets = m.getAs[Int]("doc_buckets")
    // materialize the insertion walks BEFORE any write: the beam reads
    // the same stores the appends below mutate. With a stored
    // quantizer the walk is REGION-seeded (VERDICT r11 #1): each delta
    // seeds from its own region's entries — |delta| × E seed scores
    // instead of |delta| × regions × E, the measured ingest dominator
    // at 1 M. Legacy layouts (no centroids/) keep the all-entries seed.
    val (edges, _, nEdges) = Iterate.ckpt(
      beamWalkKnnStored(path, delta, vec, id, k = kGraph, nProbe,
          beamWidth, rounds, keep = None, widenCap = 1,
          regionSeed = new java.io.File(s"$path/centroids").exists())
        .select(col("query_id").as("d"), col("neighbor_id").as("nb")))
    require(nEdges > 0L, "insertion beam found no neighbors — empty index?")
    val e = withNorm(delta, vec, id)
    // adj (from the checkpointed walk edges) and vectors (from the
    // delta) are independent appends — submit both at once (guide
    // §2.6); the repair contract (distinct-rewrite both stores) covers
    // any subset landing, exactly as it covered the old fixed order
    Par.unit(
      () => edges.select(col("d").as("src"), col("nb").as("dst"))
        .unionByName(edges.select(col("nb").as("src"), col("d").as("dst")))
        .withColumn("sb", pmod(xxhash64(col("src")), lit(srcBuckets.toLong)))
        .repartition(col("sb"))
        .write.mode("append").partitionBy("sb").parquet(s"$path/adj"),
      () => e.withColumn("db", pmod(xxhash64(col("vid")), lit(docBuckets.toLong)))
        .repartition(col("db"))
        .write.mode("append").partitionBy("db").parquet(s"$path/vectors"))
    val inserted = e.select(count(lit(1))).head().getLong(0)
    // one tiny staleness row per batch — the insert-volume counter the
    // prune trigger budgets on (degree drift is bounded by ingest
    // volume, the contract above), O(#batches) to read back
    spark.range(1).select(lit(inserted).as("n_inserted"))
      .coalesce(1).write.mode("append").parquet(s"$path/staleness")
    inserted
  }

  /** Cumulative insert volume of a [[writeKnnGraphIndex]] layout since
    * its last build/[[pruneKnnGraphIndex]] — (insertedNodes, baseNodes,
    * insertedPpm). A sum over the per-batch `staleness/` rows against
    * `base_nodes` from meta; never an edge scan (per-node degree drift
    * is BOUNDED by this volume — each inserted neighbor hands a stored
    * node at most one reverse edge — so the O(1) counter is the honest
    * budget proxy, and the prune itself re-checks actual degrees for
    * free before rewriting anything). */
  def knnGraphStaleness(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long, Long) = {
    val meta = spark.read.parquet(s"$path/meta")
    // pre-base_nodes format (ADVICE r9/r10): recount from the stored
    // vectors (the value a fresh build records) WITHOUT persisting —
    // staleness is a READ and must stay pure (concurrent readers race
    // a delete-then-write meta overwrite; read-only mounts fail it
    // outright). The recount is re-paid per probe on an old-format
    // index; [[repairKnnGraphIndex]] persists the upgrade explicitly.
    val base =
      if (meta.schema.fieldNames.contains("base_nodes"))
        meta.head().getAs[Long]("base_nodes")
      else {
        warnLegacyRecount(path, "knn-graph", "repairKnnGraphIndex")
        spark.read.parquet(s"$path/vectors").count()
      }
    val ins =
      if (!new java.io.File(s"$path/staleness").exists()) 0L
      else spark.read.parquet(s"$path/staleness")
        .agg(coalesce(sum(col("n_inserted")), lit(0L))).head().getLong(0)
    val ppm = if (base == 0L) Long.MaxValue else ins * 1000000L / base
    (ins, base, ppm)
  }

  /** The prune TRIGGER closing the graph index's drift loop — the
    * [[refreshTfidfIndexIfStale]] of this family: run
    * [[pruneKnnGraphIndex]] only when cumulative insert volume since
    * the last prune exceeds `maxInsertedPpm` of the base. On a prune
    * the staleness clock resets and `base_nodes` advances to the grown
    * node count (the pruned graph IS the new base the next budget
    * measures against). Returns whether a prune ran. */
  def pruneKnnGraphIndexIfStale(spark: org.apache.spark.sql.SparkSession,
      path: String, degreeCap: Int,
      maxInsertedPpm: Long = 100000L): Boolean = {
    val (ins, base, ppm) = knnGraphStaleness(spark, path)
    val stale = ppm > maxInsertedPpm
    if (stale) {
      pruneKnnGraphIndex(spark, path, degreeCap)
      val m = spark.read.parquet(s"$path/meta").head()
      spark.range(1).select(
          lit(m.getAs[Int]("src_buckets")).as("src_buckets"),
          lit(m.getAs[Int]("doc_buckets")).as("doc_buckets"),
          lit(base + ins).as("base_nodes"))
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      graft.sources.Tables.deleteRecursive(s"$path/staleness")
    }
    stale
  }

  /** ENTRY-TIER staleness of a [[writeKnnGraphIndex]] layout —
    * (insertedSinceEntryBuild, nodesAtEntryBuild, ppm). The entry tier
    * is a fixed sample of region members taken at build time
    * ([[regionEntryPoints]]); appended vectors shift region membership
    * but can never become entries until [[refreshKnnGraphEntries]]
    * re-samples, so serve walks near append-dense regions seed from an
    * ever-staler snapshot. This clock is INDEPENDENT of the prune
    * clock ([[knnGraphStaleness]]): a prune re-caps degrees without
    * touching entries, and both derive the current node count as
    * `base_nodes + Σ staleness` so neither resets the other. Layouts
    * written before `entry_meta/` fall back to `base_nodes` as the
    * entry epoch — O(1); exact before the first prune, and after one
    * it UNDERCOUNTS entry staleness (base_nodes advanced past the
    * entry build), so legacy layouts should refresh entries once and
    * gain the real clock. */
  def knnGraphEntryStaleness(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long, Long) = {
    val m = spark.read.parquet(s"$path/meta").head()
    val base = m.getAs[Long]("base_nodes")
    val ins =
      if (!new java.io.File(s"$path/staleness").exists()) 0L
      else spark.read.parquet(s"$path/staleness")
        .agg(coalesce(sum(col("n_inserted")), lit(0L))).head().getLong(0)
    val current = base + ins
    val builtN =
      if (new java.io.File(s"$path/entry_meta").exists())
        spark.read.parquet(s"$path/entry_meta").head()
          .getAs[Long]("entry_built_n")
      else base
    val since = math.max(0L, current - builtN)
    val ppm = if (builtN == 0L) Long.MaxValue else since * 1000000L / builtN
    (since, builtN, ppm)
  }

  /** REBUILD the entry tier over the CURRENT stored corpus — the
    * entry tier's refresh verb (VERDICT r11 #2), completing the
    * lifecycle triple every other stored tier already has (append
    * drifts → staleness counts → budgeted refresh). Requires the
    * stored quantizer (`centroids/`): every stored vector (base AND
    * appended) is re-assigned to its region and [[regionEntryPoints]]'
    * smallest-ids rule re-samples `perRegion` entries per region, so
    * freshly-appended vectors become seedable entry points. The
    * sample rule is [[regionEntryPointsEpochAware]] (smallest+largest
    * ids per region), NOT the build's all-smallest rule: measured at
    * 1 M, re-sampling by smallest ids re-elected the same base
    * entries in every region that held any base member — an
    * append-blind refresh (docs/EXPERIMENTS.md round 21, the
    * stationary counter-finding) — while the largest-id half covers
    * the newest epoch and recovers the shifted-distribution decay.
    * One corpus pass (broadcast assignment + windows on cid) + a
    * broadcast-sized overwrite of `entry/` — the same budget class as
    * [[refreshTfidfIndex]]. Resets the entry clock (`entry_meta/`).
    * Returns the entry count. */
  def refreshKnnGraphEntries(spark: org.apache.spark.sql.SparkSession,
      path: String, perRegion: Int): Long = {
    require(new java.io.File(s"$path/centroids").exists(),
      s"entry refresh needs the stored quantizer: $path/centroids " +
        "(write the index with writeKnnGraphIndex(..., centroids = ...))")
    val cents = spark.read.parquet(s"$path/centroids")
    val vecs = spark.read.parquet(s"$path/vectors")
      .select(col("vid"), col("v"), col("nrm"))
    val asg = assignNearest(vecs, cents, Seq.empty)
    val entries = regionEntryPointsEpochAware(asg, perRegion)
      .join(vecs, Seq("vid"))
      .select(col("vid"), col("v"), col("nrm"))
    entries.coalesce(1).write.mode("overwrite").parquet(s"$path/entry")
    val n = spark.read.parquet(s"$path/entry").count()
    val m = spark.read.parquet(s"$path/meta").head()
    val insNow =
      if (!new java.io.File(s"$path/staleness").exists()) 0L
      else spark.read.parquet(s"$path/staleness")
        .agg(coalesce(sum(col("n_inserted")), lit(0L))).head().getLong(0)
    spark.range(1).select(
        lit(m.getAs[Long]("base_nodes") + insNow).as("entry_built_n"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/entry_meta")
    n
  }

  /** The entry tier's budgeted refresh TRIGGER —
    * [[refreshTfidfIndexIfStale]]'s shape applied to entries: refresh
    * only when insert volume since the last entry (re)build exceeds
    * `maxInsertedPpm` of the nodes it sampled from. Returns whether a
    * refresh ran. */
  def refreshKnnGraphEntriesIfStale(spark: org.apache.spark.sql.SparkSession,
      path: String, perRegion: Int, maxInsertedPpm: Long = 100000L): Boolean = {
    val (_, _, ppm) = knnGraphEntryStaleness(spark, path)
    val stale = ppm > maxInsertedPpm
    if (stale) refreshKnnGraphEntries(spark, path, perRegion): Unit
    stale
  }

  /** Degree-bound PRUNE of a [[writeKnnGraphIndex]] layout — the
    * refresh-tier verb closing the graph-index lifecycle (build →
    * [[appendToKnnGraphIndex]] → prune, the tf-idf index's
    * append → [[refreshTfidfIndex]] pattern): each insert batch can
    * hand every stored node one reverse edge per inserted neighbor, so
    * per-node degree drifts up with ingest volume and every later beam
    * round expands ever more candidates. This applies HNSW's
    * neighbor-selection step as maintenance: for every node whose
    * degree exceeds `degreeCap`, keep only the `degreeCap`
    * best-scoring neighbors by EXACT cosine over the stored vectors
    * (cos DESC, dst — the [[knnGraphExact]] construction order, so a
    * pruned node's adjacency is exactly what a fresh bounded build
    * would give it from the same edge pool); under-cap nodes keep
    * their adjacency bit-identical.
    *
    * Scale shape: one aggregate over the edge list finds the over-cap
    * nodes, then ONLY the `sb` partitions holding at least one such
    * node are read, re-scored and swapped in
    * ([[Layout.swapPartitionLeaves]] — metadata renames, cold
    * partitions never touched); the driver-side bucket list is bounded
    * by the configured src_buckets. Re-scoring joins the hot buckets'
    * edges against `vectors/` on both endpoints — O(hot edges), an
    * equi-join, never pairs × corpus.
    *
    * (src, dst) duplicates inside hot partitions collapse before the
    * re-score, so a double-applied insert batch — the blind retry of a
    * torn multi-store append (ADVICE r8) — is repaired by the next
    * prune rather than double-counted forever.
    *
    * Returns the number of over-cap nodes re-truncated (0 ⇒ nothing
    * rewritten — the gate a drift-budget caller checks for free). */
  def pruneKnnGraphIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, degreeCap: Int): Long = {
    require(degreeCap >= 1, s"degreeCap must be >= 1: $degreeCap")
    // MEMORY-RESIDENT prune tier (optimization r12): under the same
    // broadcast-class budget the walk tier uses, the degree scan, the
    // hot-bucket re-score and the top-cap keep run driver-locally over
    // one collect of the stores — the distributed form below paid a
    // degree aggregate + two vector joins + a window (≈6 exchanges) on
    // an index that fits in memory by contract. The kept edges are
    // IDENTICAL: same (cos DESC, dst) order on the same doubles
    // ([[dotD]] ≡ the Column dot), same per-(sb, src) over-cap count
    // returned (LocalWalkSpec pins tier equality); only hot buckets
    // are rewritten either way. Past the budget the distributed form
    // is unchanged.
    if (localWalkEligible(spark, path)) {
      import spark.implicits._
      val adjRows = spark.read.parquet(s"$path/adj")
        .select(col("src"), col("dst"), col("sb").cast("long"))
        .as[(Long, Long, Long)].collect()
      val degs = new java.util.HashMap[Long, Int](adjRows.length * 2)
      adjRows.foreach { case (s, _, _) =>
        degs.merge(s, 1, (a, b) => a + b): Unit }
      val overSrcs = {
        val it = degs.entrySet().iterator()
        val b = scala.collection.mutable.HashSet.empty[Long]
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue > degreeCap) b += e.getKey
        }
        b
      }
      if (overSrcs.isEmpty) return 0L
      val hot = adjRows.iterator.filter(r => overSrcs(r._1)).map(_._3).toSet
      val aff = adjRows.filter(r => hot(r._3)).distinct
      val vm: Map[Long, (Array[Double], Double)] =
        spark.read.parquet(s"$path/vectors")
          .select(col("vid"), col("v"), col("nrm"))
          .as[(Long, Array[Double], Double)].collect()
          .map(e => e._1 -> ((e._2, e._3))).toMap
      // inner-join semantics on both vector lookups, exactly the
      // distributed form: an endpoint missing from vectors/ drops the
      // edge from the re-score (and so from the kept set)
      val kept = aff.groupBy(_._1).iterator.flatMap { case (s, es) =>
        vm.get(s).iterator.flatMap { case (sv, sn) =>
          es.iterator.flatMap { case (_, d, sb) =>
            vm.get(d).map { case (dv, dn) =>
              (dotD(sv, dv) / (sn * dn), s, d, sb)
            }
          }.toVector.sortBy { case (cos, _, d, _) => (-cos, d) }
            .take(degreeCap)
            .map { case (_, s2, d, sb) => (s2, d, sb) }
        }
      }.toSeq
      val tmp = s"$path/adj.__prune"
      graft.sources.Tables.deleteRecursive(tmp)
      spark.sparkContext.parallelize(kept,
          math.max(1, math.min(hot.size, kept.length)))
        .toDF("src", "dst", "sb")
        .repartition(col("sb"))
        .write.mode("overwrite").partitionBy("sb").parquet(tmp)
      Layout.swapPartitionLeaves(s"$path/adj", tmp, 1)
      graft.sources.Tables.deleteRecursive(tmp)
      return overSrcs.size.toLong
    }
    val adj = spark.read.parquet(s"$path/adj")
    val over = adj.groupBy(col("sb"), col("src"))
      .agg(count(lit(1)).as("deg")).filter(col("deg") > degreeCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nOver = over.count()
      if (nOver == 0L) return 0L
      // hot src buckets — ≤ src_buckets DISTINCT values (config-bounded
      // collect, the beamSearchKnnStored pattern)
      val hot = over.select(col("sb").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq
      val aff = adj.filter(col("sb").cast("long").isin(hot: _*))
        .select(col("src"), col("dst"), col("sb")).distinct()
      val v = spark.read.parquet(s"$path/vectors")
        .select(col("vid"), col("v"), col("nrm"))
      val scored = aff
        .join(v.select(col("vid").as("src"), col("v").as("sv"),
          col("nrm").as("sn")), Seq("src"))
        .join(v.select(col("vid").as("dst"), col("v").as("dv"),
          col("nrm").as("dn")), Seq("dst"))
        .withColumn("cos", dot(col("sv"), col("dv")) / (col("sn") * col("dn")))
      val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
      val kept = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= degreeCap)
        .select(col("src"), col("dst"), col("sb"))
      val tmp = s"$path/adj.__prune"
      graft.sources.Tables.deleteRecursive(tmp)
      kept.repartition(col("sb"))
        .write.mode("overwrite").partitionBy("sb").parquet(tmp)
      Layout.swapPartitionLeaves(s"$path/adj", tmp, 1)
      graft.sources.Tables.deleteRecursive(tmp)
      nOver
    } finally over.unpersist(): Unit
  }

  /** NN-DESCENT refinement round(s) over a [[writeKnnGraphIndex]]
    * layout (VERDICT r9 #1; Dong, Moses & Li, "Efficient k-nearest
    * neighbor graph construction for generic similarity measures",
    * WWW'11): the scalable blocked builder ([[knnGraphBlocked]] over
    * quantizer blocks) finds NO cross-block edges, so the stored graph
    * under-connects and serve recall sinks (measured 0.334@1M vs 0.78
    * exact-built, docs/EXPERIMENTS.md). NN-Descent's local join closes
    * the gap: a neighbor's neighbor is likely a neighbor, so each
    * round proposes candidate edges (u, w) from u → v → w over the
    * SYMMETRIZED stored adjacency (in- and out-edges both count — the
    * reverse direction is what carries information ACROSS blocks),
    * scores them by exact cosine against the stored vectors, and keeps
    * each node's `kGraph` best edges from (existing ∪ candidates) in
    * the construction order (cos DESC, dst). Per-node edge quality is
    * MONOTONE (the kept set is the top-k of a superset of the old
    * edges), and an exact-built graph is a fixed point (no candidate
    * can beat a global top-k edge) — both BeamSearchSpec pins.
    *
    * PRECONDITION the closure property imposes: neighbor-of-neighbor
    * over a strictly block-partitioned graph is CLOSED per block — it
    * can spread cross-block edges but never create the FIRST one. Feed
    * it a graph that carries seed cross-block edges: multi-probe
    * blocked construction ([[knnGraphBlockedMulti]] over
    * [[ivfAssignmentsMulti]] — overlapping cells), or a graph grown by
    * [[appendToKnnGraphIndex]] (insertion walks traverse entry points
    * across regions, so their edges cross blocks by construction).
    *
    * `diversify` switches the keep rule from pure top-k to the
    * HNSW/Vamana neighbor-selection heuristic (keep a candidate only
    * if no already-kept neighbor α-occludes it — Vamana RobustPrune,
    * α·d(kept, cand) < d(node, cand); backfill best-first): top-k
    * maximizes EDGE recall but packs a node's slots into one tight
    * direction; the diversified keep spends occluded slots on
    * longer-range links, which is what the beam walk's SERVE recall
    * needs in large regions (measured in docs/EXPERIMENTS.md — the two
    * keeps move different metrics). `alpha` > 1 relaxes occlusion
    * (VERDICT r10 #5): the strict α = 1 rule bought its 1 M lifecycle
    * gain by trading top-k serve recall at 100 k (0.78 → 0.70); at the
    * published Vamana default α ≈ 1.2 a kept neighbor must be
    * decisively closer before it occludes, recovering the near-top
    * edges while keeping the long-range ones. Diversify REQUIRES
    * `bridge` ≥ 1: the keep rule buffers each node's candidate fan-in
    * (with vectors) in one group, and only the bridge cap bounds the
    * symmetrized in-degree feeding it (ADVICE r10).
    *
    * Scale shape: one adjacency self-join per round — candidates ≤
    * n·(2·deg)² rows of bare (src, dst) ids, vectors fetched once per
    * SURVIVING distinct candidate through two equi-joins against the
    * doc-bucketed vector store. `bridge` > 0 caps the symmetrized
    * per-node degree used on BOTH sides of the local join
    * (NN-Descent's sample rate ρ): the deterministic
    * xxhash64(src, dst)-ordered top-`bridge` edges stand in for
    * Dong et al.'s random sample, bounding candidates to n·bridge²
    * regardless of degree drift. The adjacency is rewritten through
    * the same tmp-dir + [[Layout.swapPartitionLeaves]] swap the prune
    * verb uses. Serving is construction-agnostic, so the walk contract
    * is unchanged. */
  def refineKnnGraphIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, kGraph: Int, rounds: Int = 1, bridge: Int = 0,
      diversify: Boolean = false, alpha: Double = 1.2): Unit = {
    require(kGraph >= 1 && rounds >= 1, "kGraph and rounds must be >= 1")
    // the diversified keep buffers each node's full candidate fan-in
    // (vectors included) in one flatMapGroups group; only the
    // bridge cap bounds that fan-in — symmetrized in-degree is
    // unbounded on a drifted graph, so an uncapped diversify pass can
    // OOM an executor on a hot node (ADVICE r10)
    require(!diversify || bridge >= 1,
      s"diversify needs bridge >= 1 to bound the per-node candidate " +
        s"fan-in buffered by the keep rule (got bridge = $bridge)")
    require(alpha >= 1.0, s"alpha must be >= 1: $alpha")
    import spark.implicits._
    val srcBuckets = spark.read.parquet(s"$path/meta").head()
      .getAs[Int]("src_buckets")
    val v = spark.read.parquet(s"$path/vectors")
      .select(col("vid"), col("v"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      for (_ <- 0 until rounds) {
        // materialize this round's adjacency BEFORE the rewrite below
        // mutates the store it reads
        val (adj, _, _) = Iterate.ckpt(
          spark.read.parquet(s"$path/adj")
            .select(col("src"), col("dst")).distinct())
        val sym0 = adj
          .unionByName(adj.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        val sym =
          if (bridge <= 0) sym0
          else {
            val wB = Window.partitionBy(col("src"))
              .orderBy(xxhash64(col("src"), col("dst")), col("dst"))
            sym0.withColumn("bb", row_number().over(wB))
              .filter(col("bb") <= bridge).drop("bb")
          }
        val (symC, _, _) = Iterate.ckpt(sym)
        val non = symC.alias("a")
          .join(symC.alias("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"))
          .filter(col("src") =!= col("dst"))
        val scored = adj.unionByName(non).distinct()
          .join(v.select(col("vid").as("src"), col("v").as("sv"),
            col("nrm").as("sn")), Seq("src"))
          .join(v.select(col("vid").as("dst"), col("v").as("dv"),
            col("nrm").as("dn")), Seq("dst"))
          .withColumn("cos", dot(col("sv"), col("dv")) / (col("sn") * col("dn")))
        val kept0 =
          if (!diversify) {
            // pure top-k keep: best kGraph by (cos DESC, dst) — the
            // construction order, maximal edge recall
            val wK = Window.partitionBy(col("src"))
              .orderBy(col("cos").desc, col("dst"))
            scored.withColumn("rk", row_number().over(wK))
              .filter(col("rk") <= kGraph)
              .select(col("src"), col("dst"))
          } else {
            // DIVERSIFIED keep — the HNSW neighbor-selection heuristic
            // / Vamana RNG rule: scanning candidates best-first, keep
            // c only if it is closer to the node than to every
            // already-kept neighbor (cos(src,c) > cos(s,c) ∀ kept s),
            // then fill remaining slots best-first. Pure top-k packs a
            // node's edges into one tight direction; occluded slots
            // become LONG-RANGE links instead, which is what the beam
            // walk needs to navigate large regions (serve recall, not
            // edge recall, is the metric this keep rule moves). The
            // per-node scan is the documented per-group imperative
            // case (the mmrSelect precedent): candidates per node are
            // bounded by kGraph + the bridge-capped NoN fan-in, so one
            // flatMapGroups with in-memory pairwise cosines is the
            // right shape — k unrolled DataFrame stages are not.
            scored
              .select(col("src"), col("dst"), col("cos"), col("dv"), col("dn"))
              .as[(Long, Long, Double, Seq[Double], Double)]
              .groupByKey(_._1)
              .flatMapGroups { (srcId, it) =>
                val cands = it.toArray.sortBy(t => (-t._3, t._2))
                val vecs = cands.map(_._4.toArray)
                val nrms = cands.map(_._5)
                def cosTo(i: Int, j: Int): Double = {
                  val a = vecs(i); val b = vecs(j)
                  var acc = 0.0; var d = 0
                  val len = math.min(a.length, b.length)
                  while (d < len) { acc += a(d) * b(d); d += 1 }
                  acc / (nrms(i) * nrms(j))
                }
                val kept = new scala.collection.mutable.ArrayBuffer[Int](kGraph)
                // Vamana's α-relaxed occlusion (RobustPrune, α ≥ 1):
                // candidate c is occluded when some kept s satisfies
                // α·d(s,c) < d(src,c); on normalized vectors
                // d² = 2(1−cos), so the test is α²·(1−cos(s,c)) <
                // (1−cos(src,c)). α = 1 reduces to the strict HNSW rule
                // (cos(s,c) > cos(src,c)); α > 1 makes occlusion
                // HARDER, keeping more near-top edges — the measured
                // fix for the α=1 keep trading top-k serve recall for
                // its long-range links (VERDICT r10 #5)
                val a2 = alpha * alpha
                var i = 0
                while (i < cands.length && kept.size < kGraph) {
                  val occluded =
                    kept.exists(s => a2 * (1.0 - cosTo(i, s)) < 1.0 - cands(i)._3)
                  if (!occluded) kept += i
                  i += 1
                }
                // backfill best-first (HNSW keepPrunedConnections)
                var j = 0
                while (j < cands.length && kept.size < kGraph) {
                  if (!kept.contains(j)) kept += j
                  j += 1
                }
                kept.map(x => (srcId, cands(x)._2)).iterator
              }
              .toDF("src", "dst")
          }
        val kept = kept0
          .withColumn("sb", pmod(xxhash64(col("src")), lit(srcBuckets.toLong)))
        val tmp = s"$path/adj.__refine"
        graft.sources.Tables.deleteRecursive(tmp)
        kept.repartition(col("sb"))
          .write.mode("overwrite").partitionBy("sb").parquet(tmp)
        Layout.swapPartitionLeaves(s"$path/adj", tmp, 1)
        graft.sources.Tables.deleteRecursive(tmp)
      }
    } finally v.unpersist(): Unit
  }

  /** Best-first BEAM SEARCH over a [[writeKnnGraphIndex]] layout — the
    * query-time walk of graph ANN: seed each query's beam with its
    * `nProbe` best entry points, then `rounds` rounds of expand
    * (frontier ⋈ stored adjacency), exact-score the NEW candidates
    * (integer micros — round(cos·10⁶), the MMR recipe, so every beam
    * decision is BIGINT-exact and the oracle replays the walk verbatim
    * as unrolled rounds), keep the best `beamWidth` per query. Fixed
    * round count with an early convergence exit — an empty expansion
    * leaves every later round a no-op, in the oracle's unrolled replay
    * too, so skipping them is value-identical. Monotone beam (scored
    * nodes never re-score: a left-anti join drops already-beamed
    * candidates before the vector fetch).
    *
    * Scale shape: per round the adjacency scan partition-prunes to the
    * frontier's src buckets and the vector fetch to the candidates'
    * doc buckets — both driver-side bucket-id collects bounded by the
    * CONFIGURED bucket counts (the [[Dedup.incrementalDedupStored]]
    * pattern), so a round touches O(|queries|·beam·kGraph) rows of a
    * billion-vector index. The beam state itself is
    * queries × beamWidth rows, localCheckpoint-ed per round
    * ([[Iterate.ckpt]]) to keep lineage O(1). */
  /** PRECONDITION (shared with [[beamSearchKnnStoredFiltered]]): query
    * ids must be DISTINCT — one row per qid. The exchange-free seed
    * selects its per-query top-nProbe inside the task holding the
    * query row; duplicate qids split across partitions would each earn
    * their own nProbe seeds (up to partitions × nProbe per qid) where
    * the old global-window path capped at nProbe. Every engine caller
    * passes a keyed relation (vec_id-filtered corpus, delta batches),
    * and BeamSearchSpec asserts the distinctness contract. */
  def beamSearchKnnStored(path: String, queries: DataFrame, vec: Column,
      id: Column, k: Int, nProbe: Int, beamWidth: Int,
      rounds: Int): DataFrame =
    beamWalkKnnStored(path, queries, vec, id, k, nProbe, beamWidth, rounds,
      keep = None, widenCap = 1)

  /** COARSE ENTRY-GRAPH tier over a [[writeKnnGraphIndex]] layout —
    * the HNSW upper layer the flat entry tier defers to past its
    * broadcast bound (docs/EXPERIMENTS.md: at 1 B vectors the entry
    * tier outgrows per-query exhaustive scoring; and ALREADY at bulk
    * query batches, queries × entries seed scoring is the dominant
    * term — the measured 6.5 B-dot arm at E=64). Builds the exact
    * kNN graph AMONG THE STORED ENTRIES ([[knnGraphExact]]'s
    * (cos DESC, dst) rule — entries are broadcast-sized by contract,
    * so Σ|E|² pair work is bounded build config) into `entry_adj/`.
    * [[beamSearchKnnStoredHier]] then replaces exhaustive entry
    * scoring with a walk over this graph. Returns the edge count. */
  def buildKnnEntryGraph(spark: org.apache.spark.sql.SparkSession,
      path: String, kEntry: Int): Long = {
    require(kEntry >= 1, s"kEntry must be >= 1: $kEntry")
    val entries = spark.read.parquet(s"$path/entry")
    // kNN edges + a vid-ordered CHAIN backbone (consecutive entry ids,
    // both directions): a plain kNN graph over a multi-entry tier is
    // CLIQUE-PARTITIONED by region (an entry's k nearest are its
    // region-mates — measured at 1 M: hier recall 0.03, the walk never
    // leaves the roots' components), and the chain guarantees ONE
    // component at 2 edges/entry. It is an escape hatch, not a
    // navigation structure — see docs/EXPERIMENTS.md round 21 for the
    // measured budget this costs and the named next step
    // (cross-region/diversified entry edges).
    val w = Window.orderBy(col("vid"))
    val chain0 = entries.select(col("vid"))
      .withColumn("nxt", lead(col("vid"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val chain = chain0.select(col("vid").as("src"), col("nxt").as("dst"))
      .unionByName(chain0.select(col("nxt").as("src"), col("vid").as("dst")))
    val eadj = knnGraphExact(entries, col("v"), col("vid"), kEntry)
      .unionByName(chain).distinct()
    eadj.coalesce(1).write.mode("overwrite").parquet(s"$path/entry_adj")
    spark.range(1).select(lit(kEntry).as("k_entry"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/entry_graph_meta")
    spark.read.parquet(s"$path/entry_adj").count()
  }

  /** HIERARCHICAL beam serve — [[beamSearchKnnStored]] with the seed
    * tier computed by walking the COARSE ENTRY GRAPH
    * ([[buildKnnEntryGraph]]) instead of scoring every stored entry:
    * per query, `nRoots` smallest-id entries seed a task-local
    * best-first walk (round semantics EXACTLY the stored walk's:
    * candidates = unvisited neighbors of the current beam, beam =
    * top-`entryBeam` of beam ∪ scored by (micros DESC, vid),
    * `entryRounds` rounds), and the final beam's top-`nProbe` become
    * the main walk's seeds. Per query the seed cost falls from
    * |entries| to ~nRoots + entryRounds · entryBeam · kEntry scored
    * entries — the bulk-batch and beyond-broadcast-entry-tier regime.
    * The entry tier itself is still collected/broadcast here (its
    * size contract); past THAT bound the same walk runs distributed
    * over a bucket-partitioned entry store — the main walk's own
    * shape one level up. All scalar arithmetic is the bit-exact
    * Column twin ([[dotD]]/[[microsOf]]), so an oracle replays the
    * entry walk unrolled exactly like the main one. With a COMPLETE
    * entry graph (kEntry ≥ |entries|−1) and entryBeam ≥ nProbe this
    * is VALUE-IDENTICAL to the flat all-entries seed — the
    * BeamSearchSpec equivalence pin. */
  def beamSearchKnnStoredHier(path: String, queries: DataFrame, vec: Column,
      id: Column, k: Int, nProbe: Int, beamWidth: Int, rounds: Int,
      nRoots: Int, entryBeam: Int, entryRounds: Int): DataFrame = {
    require(nRoots >= 1 && entryBeam >= nProbe && entryRounds >= 1,
      s"need nRoots >= 1, entryBeam >= nProbe, entryRounds >= 1: $nRoots/$entryBeam/$entryRounds")
    val spark = queries.sparkSession
    import spark.implicits._
    val entries = spark.read.parquet(s"$path/entry")
      .select(col("vid"), col("v"), col("nrm"))
      .as[(Long, Array[Double], Double)].collect()
    require(entries.nonEmpty, s"empty entry tier: $path/entry")
    val vecMap = entries.map(e => e._1 -> ((e._2, e._3))).toMap
    val adjMap = spark.read.parquet(s"$path/entry_adj")
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2) }
    val roots = entries.map(_._1).sorted.take(nRoots)
    val bc = spark.sparkContext.broadcast((vecMap, adjMap, roots))
    val q = withNorm(queries, vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val seeds = q.as[(Long, Array[Double], Double)].mapPartitions { it =>
      val (vm, am, rts) = bc.value
      it.flatMap { case (qid, qv, qn) =>
        def smOf(vid: Long): (Long, Long) = {
          val (v, nrm) = vm(vid)
          (microsOf(dotD(qv, v) / (qn * nrm)), vid)
        }
        // qid may appear in the ENTRY beam as a waypoint (a corpus
        // member serving as an entry — excluding it from the walk
        // strands a query whose own id is the only root); it is
        // filtered from the emitted SEEDS, matching the flat seed's
        // vid ≠ qid contract
        var ef = rts.map(smOf).toVector
          .sortBy { case (sm, vid) => (-sm, vid) }
        var r = 0
        var done = ef.isEmpty
        while (r < entryRounds && !done) {
          r += 1
          val inBeam = ef.map(_._2).toSet
          val cand = ef.iterator
            .flatMap(e => am.getOrElse(e._2, Array.empty[Long]))
            .filter(d => !inBeam.contains(d))
            .toArray.distinct
          if (cand.isEmpty) done = true
          else ef = (ef ++ cand.map(smOf))
            .sortBy { case (sm, vid) => (-sm, vid) }.take(entryBeam)
        }
        ef.filter(_._2 != qid).take(nProbe)
          .map { case (sm, vid) => (qid, vid, sm) }
      }
    }.toDF("qid", "vid", "sm")
    beamWalkKnnStored(path, queries, vec, id, k, nProbe, beamWidth, rounds,
      keep = None, widenCap = 1, seedOverride = Some(seeds))
  }

  /** Recursive on-disk size of a stored relation — the eligibility
    * input for the memory-resident walk tier (local java.io paths, the
    * layout contract every store-verb here already assumes). */
  private def dirBytes(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else {
      val c = f.listFiles()
      if (c == null) 0L else c.foldLeft(0L)((a, x) => a + dirBytes(x))
    }

  /** Budget for serving a stored graph MEMORY-RESIDENT (adj + vectors
    * on-disk bytes): at or below it the beam walk runs task-locally
    * over a broadcast of the index — the HNSW posture, and the same
    * budget class as the entry tier's existing broadcast contract.
    * `spark.graft.ann.localWalkIndexBytes` overrides (0 disables);
    * default 64 MB — parquet double arrays are near-incompressible, so
    * the broadcast is ~1-2× this, comfortably inside executor memory
    * at any deployment size, while a 100 TB corpus index exceeds it by
    * six orders of magnitude and keeps the distributed walk. */
  private[graft] def localWalkEligible(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val budget = spark.conf.getOption("spark.graft.ann.localWalkIndexBytes")
      .map(_.toLong).getOrElse(64L << 20)
    // fail CLOSED on anything that is not a readable local directory
    // (hdfs://, s3://, missing stores): an unsizable index must take the
    // distributed walk, never be collected to the driver on a 0-byte
    // misread (VERDICT r12 #2)
    val adj = new java.io.File(s"$path/adj")
    val vecs = new java.io.File(s"$path/vectors")
    budget > 0L &&
      adj.isDirectory && adj.canRead && vecs.isDirectory && vecs.canRead &&
      dirBytes(adj) + dirBytes(vecs) <= budget
  }

  /** The plain/insertion beam walk executed TASK-LOCALLY over a
    * broadcast of the stored graph — value-identical to the
    * distributed rounds of [[beamWalkKnnStored]] by construction:
    *
    *  - seed: top-nProbe entry scores per query by (micros DESC, vid),
    *    vid ≠ qid — all-entries or region-restricted exactly as the
    *    distributed seeds ([[dotD]]/[[microsOf]] are the bit-exact
    *    Column twins, the regionSeedDf precedent);
    *  - per round: candidates = distinct adjacency expansions of the
    *    beam minus the beam and the query itself; scored candidates
    *    join the beam; beam = top-beamWidth by (micros DESC, vid) —
    *    the wBeam rank. A round with no candidates converges; a round
    *    whose candidates all miss `vectors/` leaves the beam unchanged
    *    (the distributed inner join drops them), which can never
    *    change again, so converging there early is output-identical;
    *  - result: top-k of the final beam, (query_id, neighbor_id, rnk,
    *    score_micros).
    *
    * The index is snapshotted by the driver-side collect BEFORE the
    * caller mutates any store (the appendToKnnGraphIndex read-then-
    * append ordering), queries stream through one mapPartitions (never
    * collected — bulk insertion batches stay distributed), and the
    * walk runs zero jobs per round instead of two. */
  private def localBeamWalkKnnStored(path: String, queries: DataFrame,
      vec: Column, id: Column, k: Int, nProbe: Int, beamWidth: Int,
      rounds: Int, regionSeed: Boolean): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val adjMap: Map[Long, Array[Long]] = spark.read.parquet(s"$path/adj")
      .select(col("src"), col("dst")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, a) => s -> a.map(_._2) }
    val vecMap: Map[Long, (Array[Double], Double)] =
      spark.read.parquet(s"$path/vectors")
        .select(col("vid"), col("v"), col("nrm"))
        .as[(Long, Array[Double], Double)].collect()
        .map(e => e._1 -> ((e._2, e._3))).toMap
    val entries: Array[(Long, Array[Double], Double)] =
      spark.read.parquet(s"$path/entry")
        .select(col("vid"), col("v"), col("nrm"))
        .as[(Long, Array[Double], Double)].collect()
    val cents: Array[(Long, Array[Double], Double)] =
      if (!regionSeed) Array.empty
      else spark.read.parquet(s"$path/centroids")
        .select(col("cid"), col("cv"), col("cn"))
        .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
    require(!regionSeed || cents.nonEmpty,
      s"region seeding needs a non-empty quantizer: $path/centroids")
    val bc = spark.sparkContext.broadcast((adjMap, vecMap, entries, cents))
    val q = withNorm(queries, vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    q.as[(Long, Array[Double], Double)].mapPartitions { it =>
      val (am, vm, ent, cs) = bc.value
      def nearestCid(v: Array[Double], nrm: Double): Long = {
        var bestCid = cs(0)._1
        var bestCos = Double.NegativeInfinity
        var i = 0
        while (i < cs.length) {
          val c = cs(i)
          val cos = dotD(v, c._2) / (nrm * c._3)
          if (cos > bestCos) { bestCos = cos; bestCid = c._1 } // ties keep the smaller cid (ascending scan)
          i += 1
        }
        bestCid
      }
      // region-seeded mode: entries grouped by region once per task —
      // assignNearest's rule, identical to regionSeedDf's entByCid
      lazy val entByCid: Map[Long, Array[(Long, Array[Double], Double)]] =
        ent.map(e => (nearestCid(e._2, e._3), e)).groupBy(_._1)
          .map { case (cid, a) => cid -> a.map(_._2) }
      it.flatMap { case (qid, qv, qn) =>
        val seedPool =
          if (regionSeed) entByCid.getOrElse(nearestCid(qv, qn),
            Array.empty[(Long, Array[Double], Double)])
          else ent
        // top-nProbe seed by (sm DESC, vid) — the allEntriesSeed rank
        val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)](nProbe + 1)
        seedPool.foreach { case (vid, v, nrm) =>
          if (vid != qid) {
            val sm = microsOf(dotD(qv, v) / (qn * nrm))
            var i = 0
            while (i < buf.length &&
              (buf(i)._1 > sm || (buf(i)._1 == sm && buf(i)._2 < vid))) i += 1
            if (i < nProbe) {
              buf.insert(i, (sm, vid))
              if (buf.length > nProbe) buf.remove(nProbe): Unit
            }
          }
        }
        var frontier = buf.toVector // sorted (sm DESC, vid) by construction
        var r = 0
        var done = frontier.isEmpty
        while (r < rounds && !done) {
          r += 1
          val inF = frontier.iterator.map(_._2).toSet
          val cand = frontier.iterator
            .flatMap(e => am.getOrElse(e._2, Array.empty[Long]))
            .filter(d => d != qid && !inF.contains(d))
            .toArray.distinct
          if (cand.isEmpty) done = true
          else {
            val scored = cand.iterator.flatMap { vid =>
              vm.get(vid).map { case (v, nrm) =>
                (microsOf(dotD(qv, v) / (qn * nrm)), vid)
              }
            }.toVector
            // candidates all absent from vectors/: beam unchanged —
            // every later round recomputes the same empty expansion,
            // so exiting now is output-identical
            if (scored.isEmpty) done = true
            else frontier = (frontier ++ scored)
              .sortBy { case (sm, vid) => (-sm, vid) }.take(beamWidth)
          }
        }
        frontier.iterator.take(k).zipWithIndex.map {
          case ((sm, vid), i) => (qid, vid, i + 1, sm)
        }
      }
    }.toDF("query_id", "neighbor_id", "rnk", "score_micros")
  }

  /** The shared walk core of [[beamSearchKnnStored]] and
    * [[beamSearchKnnStoredFiltered]] — exactly ONE implementation of
    * seeding, per-round expansion, scoring, convergence exit and beam
    * truncation (ADVICE r9: the filtered twin previously duplicated
    * the whole loop, and the "identical rounds, scores, frontier"
    * contract would silently break the first time a fix landed on one
    * copy only). `keep = None` is the plain walk (top-k from the final
    * beam); `Some(pred)` navigates IDENTICALLY while a results
    * accumulator keeps every scored node passing `pred` (de-duplicated
    * once at the end — value-identical to per-round de-duplication,
    * and exactly the oracle's UNION).
    *
    * Job-count shape (VERDICT r9 #5 — the per-round driver collects
    * were the latency floor of the graph lifecycle queries): the
    * stored adjacency/vector relations resolve ONCE outside the loop,
    * and each round runs exactly TWO jobs instead of the previous
    * four —
    *  - materialize the expansion + collect its DISTINCT doc buckets
    *    in the same action; an EMPTY bucket list IS the convergence
    *    signal, so the separate count job is gone;
    *  - materialize the next frontier + collect ITS src buckets for
    *    the next round's adjacency pruning, replacing the old
    *    start-of-round collect job.
    * Both collects stay bounded by the CONFIGURED bucket counts.
    * Per-round state goes through LAZY local checkpoints
    * ([[Iterate.ckptLazy]] — the bucket collect is the materializing
    * action), keeping the plan a LogicalRDD leaf per round: a
    * persist()-only variant was measured driver-bound, its plan
    * growing ~3× per round.
    *
    * `widenCap` > 1 enables ACORN-style adaptive beam widening for
    * filtered serving: the effective beam width is
    * `beamWidth · min(widenCap, ceil(entries / matchingEntries))`,
    * estimated from the entry-scored sample (one tiny aggregate; zero
    * matching entries ⇒ the full cap). Selective predicates thin the
    * accumulator — a fixed-width beam under a 5% filter scores ~ w/20
    * matches per round — so the walk widens in proportion to the
    * estimated inverse selectivity, capped. Integer arithmetic on two
    * counts, so an oracle replays the widened width exactly. */
  private def beamWalkKnnStored(path: String, queries: DataFrame,
      vec: Column, id: Column, k: Int, nProbe: Int, beamWidth: Int,
      rounds: Int, keep: Option[Column], widenCap: Int,
      regionSeed: Boolean = false,
      seedOverride: Option[DataFrame] = None): DataFrame = {
    require(beamWidth >= k, s"beamWidth ($beamWidth) must be >= k ($k)")
    require(nProbe >= 1 && rounds >= 1, "nProbe and rounds must be >= 1")
    require(widenCap >= 1, s"widenCap must be >= 1: $widenCap")
    require(widenCap == 1 || keep.nonEmpty,
      "adaptive widening needs a filter to estimate selectivity from")
    require(!regionSeed || (keep.isEmpty && widenCap == 1),
      "region seeding is the insertion-walk mode — filtered serving keeps the all-entries seed")
    require(seedOverride.isEmpty || (keep.isEmpty && widenCap == 1 && !regionSeed),
      "an external seed ((qid, vid, sm) micros rows) composes only with the plain walk")
    val spark = queries.sparkSession
    // MEMORY-RESIDENT serve tier (optimization r12, guide §1.2 "the
    // distributed algorithm" + §2.4 "remove shuffles outright"): when
    // the WHOLE stored graph fits the same broadcast-class budget the
    // entry tier already lives under, walk it task-locally — the HNSW
    // serving posture (graph resident per node, queries streamed), and
    // exactly the mechanism [[beamSearchKnnStoredHier]]'s entry walk
    // already runs one level up. Rounds, scoring, eviction and
    // tie-breaks are the bit-exact scalar twins of the Column path
    // ([[dotD]]/[[microsOf]] — the regionSeedDf/hier precedent), so
    // results are VALUE-IDENTICAL (LocalWalkSpec pins it; the shared
    // oracle hash-checks it per query). Past the budget — the 100 TB
    // regime — the bucket-pruned distributed walk below is unchanged.
    // The filtered/widened serving modes keep the distributed walk
    // (their `keep` predicate is an arbitrary Column).
    if (keep.isEmpty && widenCap == 1 && seedOverride.isEmpty &&
        localWalkEligible(spark, path))
      return localBeamWalkKnnStored(path, queries, vec, id, k, nProbe,
        beamWidth, rounds, regionSeed)
    val m = spark.read.parquet(s"$path/meta").head()
    val srcBuckets = m.getAs[Int]("src_buckets")
    val docBuckets = m.getAs[Int]("doc_buckets")
    val adjAll = spark.read.parquet(s"$path/adj")
    val vecAll = spark.read.parquet(s"$path/vectors")
    val entries = spark.read.parquet(s"$path/entry")
    val q = withNorm(queries, vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val micros = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6, 0)
      .cast("long")
    val wBeam = Window.partitionBy(col("qid"))
      .orderBy(col("sm").desc, col("vid"))
    def srcB(df: DataFrame): Seq[Long] = df
      .select(pmod(xxhash64(col("vid")), lit(srcBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toIndexedSeq
    // every lazy checkpoint's RDD handle is tracked so its blocks can
    // be FREED — superseded rounds eagerly (the walk's peak block
    // residency stays O(1) rounds instead of O(rounds): a 100 k-query
    // insertion walk pins ~3 M rows per round otherwise), and
    // everything at the end once the bounded result materializes.
    // DataFrame.localCheckpoint has no unpersist path, which made
    // every beam walk leak its round frames into the block manager
    // for the session's lifetime (measured: the stream_ann_graph
    // ingest drain's residue inflated the NEXT streaming queries'
    // walls 1.6-2.4× in the bench run — round 20).
    val handles = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]]
    def lazyCkH(df: DataFrame): (DataFrame,
        org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
      val p = Iterate.ckptLazy(df)
      handles += p._2
      p
    }
    def lazyCk(df: DataFrame): DataFrame = lazyCkH(df)._1
    // entry scoring: one broadcast pass, queries × entries rows
    // produced TASK-LOCALLY and never materialized whole. A bulk
    // insertion walk scores |delta| × |entries| rows — 1.6 B at the
    // measured 1 M corpus / 16-entries-per-region / 100 k-delta config
    // — and the previous seed path (localCheckpoint of the scored
    // relation + a window exchange over it) OOMed exactly there; each
    // consumer below streams this join instead.
    def entScored: DataFrame =
      q.join(broadcast(entries), col("vid") =!= col("qid"))
        .select(col("qid"), col("vid"), micros.as("sm"))
    val width: Long =
      if (widenCap == 1) beamWidth.toLong
      else {
        // widening estimate: a streaming two-count aggregate (map-side
        // partials), only ever run for filtered SERVING query sets
        val c = entScored.agg(count(lit(1)).as("t"),
          count(when(keep.get, lit(1))).as("mm")).head()
        val (t, mm) = (c.getLong(0), c.getLong(1))
        val factor = if (mm == 0L) widenCap.toLong
          else math.min(widenCap.toLong, (t + mm - 1L) / mm)
        beamWidth.toLong * factor
      }
    // per-query top-nProbe seed WITHOUT an exchange: the broadcast
    // join emits ALL of a query's entry scores inside the task that
    // holds the query row (qid is unique), so a bounded per-partition
    // selection — (sm DESC, vid) order, exactly the beam rank — is
    // value-identical to the global window while shuffling nothing
    // and keeping only queries × nProbe rows
    import spark.implicits._
    val allEntriesSeed = entScored.as[(Long, Long, Long)].mapPartitions { it =>
      val best = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Long)]]
      it.foreach { case (qid, vid, sm) =>
        val buf = best.getOrElseUpdate(qid,
          new scala.collection.mutable.ArrayBuffer[(Long, Long)](nProbe + 1))
        var i = 0
        while (i < buf.length &&
          (buf(i)._1 > sm || (buf(i)._1 == sm && buf(i)._2 < vid))) i += 1
        if (i < nProbe) {
          buf.insert(i, (sm, vid))
          if (buf.length > nProbe) buf.remove(nProbe): Unit
        }
      }
      best.iterator.flatMap { case (qid, buf) =>
        buf.map { case (sm, vid) => (qid, vid, sm) }
      }
    }.toDF("qid", "vid", "sm")
    // REGION-seeded insertion seed (VERDICT r11 #1): one fused
    // task-local pass — each delta scores the broadcast quantizer
    // (argmax ccos, tie to smaller cid — assignNearest's rule), then
    // only its OWN region's entries: |delta| × (|centroids| + E) work
    // instead of the |delta| × regions × E term that dominated 1 M
    // ingest (~120 s per 100 k batch at E=16). Zero exchanges; the one
    // extra job is the entry-tier assignment collect, bounded by the
    // entry tier's broadcast-size contract. Scalar arithmetic mirrors
    // the Column path bit-for-bit: left-to-right dot fold from 0.0
    // (DotProduct's loop ≡ DuckDB list_reduce) and HALF_UP micros
    // (Spark round() on doubles goes through BigDecimal.decimal).
    def regionSeedDf: DataFrame = {
      val cents0 = spark.read.parquet(s"$path/centroids")
        .select(col("cid"), col("cv"), col("cn"))
        .as[(Long, Array[Double], Double)].collect().sortBy(_._1)
      require(cents0.nonEmpty, s"region seeding needs a non-empty quantizer: $path/centroids")
      val bcCents = spark.sparkContext.broadcast(cents0)
      def nearestCid(v: Array[Double], nrm: Double): Long = {
        val cents = bcCents.value
        var bestCid = cents(0)._1
        var bestCos = Double.NegativeInfinity
        var i = 0
        while (i < cents.length) {
          val c = cents(i)
          val cos = dotD(v, c._2) / (nrm * c._3)
          if (cos > bestCos) { bestCos = cos; bestCid = c._1 } // ties keep the smaller cid (ascending scan)
          i += 1
        }
        bestCid
      }
      // distributed entry assignment, then a bounded collect: the
      // entry tier must stay broadcast-sized (the stored-graph
      // contract), so grouping it on the driver is the same order of
      // memory as the broadcast every all-entries walk already ships
      val entByCid: Map[Long, Array[(Long, Array[Double], Double)]] =
        entries.select(col("vid"), col("v"), col("nrm"))
          .as[(Long, Array[Double], Double)].mapPartitions { it =>
            it.map { case (vid, v, nrm) => (nearestCid(v, nrm), vid, v, nrm) }
          }.collect().groupBy(_._1)
          .map { case (cid, a) => cid -> a.map(e => (e._2, e._3, e._4)) }
      val bcEnt = spark.sparkContext.broadcast(entByCid)
      q.select(col("qid"), col("qv"), col("qn"))
        .as[(Long, Array[Double], Double)].mapPartitions { it =>
          it.flatMap { case (qid, qv, qn) =>
            val mine = bcEnt.value.getOrElse(nearestCid(qv, qn),
              Array.empty[(Long, Array[Double], Double)])
            val buf = new scala.collection.mutable.ArrayBuffer[(Long, Long)](nProbe + 1)
            mine.foreach { case (vid, v, nrm) =>
              if (vid != qid) {
                val sm = microsOf(dotD(qv, v) / (qn * nrm))
                var i = 0
                while (i < buf.length &&
                  (buf(i)._1 > sm || (buf(i)._1 == sm && buf(i)._2 < vid))) i += 1
                if (i < nProbe) {
                  buf.insert(i, (sm, vid))
                  if (buf.length > nProbe) buf.remove(nProbe): Unit
                }
              }
            }
            buf.map { case (sm, vid) => (qid, vid, sm) }
          }
        }.toDF("qid", "vid", "sm")
    }
    val seed = seedOverride.getOrElse(
      if (regionSeed) regionSeedDf else allEntriesSeed)
    val seedP = lazyCkH(seed)
    var frontier = seedP._1
    var fHandle = seedP._2
    // seed job: materialize the bounded frontier under its bucket
    // collect — ≤ srcBuckets DISTINCT values however wide the beam,
    // so every collect here is config-bounded
    var sbs = srcB(frontier)
    // the filtered accumulator keeps the MATCHING entry scores —
    // checkpointed (filtered first, so only matching rows ever
    // materialize; filtered serving is a bounded query batch by
    // contract) so the returned plan stays a union of LogicalRDD
    // leaves rather than re-running the entry broadcast join at
    // collection time
    var results = keep.map(kc => lazyCk(entScored.filter(kc)))
    var roundNo = 0
    var converged = false
    while (roundNo < rounds && !converged) {
      roundNo += 1
      val adj = adjAll.filter(col("sb").cast("long").isin(sbs: _*))
      val (cand, candH) = lazyCkH(
        frontier.join(adj, col("vid") === col("src"))
          .select(col("qid"), col("dst").as("vid"))
          .filter(col("vid") =!= col("qid"))
          .distinct()
          .join(frontier.select(col("qid"), col("vid")), Seq("qid", "vid"), "left_anti"))
      // round job 1: the expansion materializes under this bucket collect
      val dbs = cand
        .select(pmod(xxhash64(col("vid")), lit(docBuckets.toLong)).as("b"))
        .distinct().collect().map(_.getLong(0)).toIndexedSeq
      if (dbs.isEmpty) {
        converged = true
        candH.unpersist(false): Unit
      } else {
        val (scored, scoredH) = lazyCkH(cand
          .join(vecAll.filter(col("db").cast("long").isin(dbs: _*))
            .select(col("vid"), col("v"), col("nrm")), Seq("vid"))
          .join(broadcast(q), Seq("qid"))
          .select(col("qid"), col("vid"), micros.as("sm")))
        results = results.map(_.unionByName(scored.filter(keep.get)))
        val prevH = fHandle
        val fp = lazyCkH(
          frontier.unionByName(scored)
            .withColumn("r", row_number().over(wBeam))
            .filter(col("r") <= width)
            .select(col("qid"), col("vid"), col("sm")))
        frontier = fp._1
        fHandle = fp._2
        // round job 2: the next frontier (and the scored set feeding
        // it) materializes under ITS bucket collect
        sbs = srcB(frontier)
        // the new frontier is materialized rows now — the previous
        // round's frontier and this round's expansion are superseded;
        // the scored frame too unless the accumulator references it
        prevH.unpersist(false)
        candH.unpersist(false)
        if (keep.isEmpty) scoredH.unpersist(false): Unit
      }
    }
    // only the accumulator can hold duplicates (a beam-evicted node
    // re-scored in a later round); the frontier is dup-free by the
    // anti-join, so the plain walk skips the distinct exchange. The
    // accumulator tree is a flat union of per-round LogicalRDD leaves.
    // The bounded (queries × k) answer materializes through one final
    // checkpoint — one small count job — so EVERY walk-internal block
    // can then be freed: without this, each walk leaked its round
    // frames into the block manager for the session's lifetime.
    val (out, _, _) = Iterate.ckpt(
      results.map(_.distinct()).getOrElse(frontier)
        .withColumn("rnk", row_number().over(wBeam))
        .filter(col("rnk") <= k)
        .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
          col("rnk"), col("sm").as("score_micros")))
    handles.foreach(_.unpersist(blocking = false))
    out
  }

  /** FILTERED beam search over a [[writeKnnGraphIndex]] layout — the
    * filtered-ANN serving posture (HNSW filtered search / predicate
    * push-into-walk): return each query's top-k among the nodes
    * satisfying `keep` (a predicate over the node id / metadata
    * column `vid`), WITHOUT restricting the walk itself. Post-filtering
    * the final beam is the naive alternative and collapses recall at
    * selective filters (a width-16 beam holds ~8 matching nodes under
    * a 50% filter — fewer than k before ranking starts); restricting
    * the WALK to matching nodes breaks navigability (the graph's
    * edges route through non-matching neighbors). The standard answer,
    * implemented here: the beam navigates UNFILTERED — identical
    * rounds, scores, and frontier to [[beamSearchKnnStored]] — while a
    * RESULTS accumulator keeps every scored node that passes `keep`
    * (entry scores included, de-duplicated: an evicted node can be
    * re-scored in a later round). The output contract is exact and
    * replayable: top-k by (micros DESC, vid) over ALL matching nodes
    * the walk ever scored — the oracle unions its per-round scored
    * sets, filters, and ranks (ann_graph_filtered).
    *
    * Scale shape unchanged: the accumulator adds one filtered union
    * per round over candidate-bounded rows; partition pruning and the
    * config-bounded collects are the shared walk's
    * ([[beamWalkKnnStored]] — one implementation, so the two entry
    * points can never drift).
    *
    * `widenCap` > 1 adds ACORN-style ADAPTIVE WIDENING for selective
    * predicates (VERDICT r9 #2): the effective beam width scales by
    * the estimated inverse selectivity from the entry-scored sample,
    * capped at `widenCap` — a 5% filter with cap 4 walks a 4× beam, so
    * the accumulator still gathers ≥ k matches where the fixed-width
    * walk starves. The estimate is integer arithmetic on two counts,
    * replayed exactly by the `ann_graph_filtered_rare` oracle.
    * SHORTFALL CONTRACT (pinned by the same oracle): when the walk
    * scores fewer than k matching nodes, the result carries exactly
    * those — fewer than k rows, never padded with non-matching ids. */
  def beamSearchKnnStoredFiltered(path: String, queries: DataFrame,
      vec: Column, id: Column, keep: Column, k: Int, nProbe: Int,
      beamWidth: Int, rounds: Int, widenCap: Int = 1): DataFrame =
    beamWalkKnnStored(path, queries, vec, id, k, nProbe, beamWidth, rounds,
      keep = Some(keep), widenCap = widenCap)

  /** SEMANTIC benchmark decontamination — the embedding-space
    * complement of [[Curation.decontaminate]]'s exact-shingle overlap:
    * a corpus document is contaminated when its embedding's cosine to
    * ANY eval-set embedding reaches `threshold` (catches paraphrases
    * and translations that share no 3-gram). Output: every corpus doc
    * with its max eval cosine and a kept flag — the audit artifact,
    * from which the clean corpus is one filter.
    *
    * Scale shape: the eval set is BOUNDED (a benchmark), so it
    * broadcasts whole and the corpus streams through one scan — cost
    * is |corpus|·|eval| dot products with no shuffle of the corpus,
    * the declared-exact form (like [[topKBruteForce]]). When the eval
    * side grows past broadcast size, the same filter drops into the
    * SRP-bucketed or IVF candidate paths unchanged (exact verify on
    * candidates only) at the price of approximate recall. */
  def decontaminateSemantic(corpus: DataFrame, eval: DataFrame,
      vec: Column, id: Column, threshold: Double): DataFrame = {
    def side(p: String)(df: DataFrame) = df
      .select(id.as(p + "id"), Dedup.asDouble(vec).as(p + "v"))
      .withColumn(p + "nrm", sqrt(dot(col(p + "v"), col(p + "v"))))
    val c = side("c_")(corpus)
    val e = side("e_")(eval)
    c.join(broadcast(e), lit(true))
      .withColumn("cos", dot(col("c_v"), col("e_v")) / (col("c_nrm") * col("e_nrm")))
      .groupBy(col("c_id").as("doc_id"))
      .agg(max(col("cos")).as("__mx"))
      .select(col("doc_id"), round(col("__mx"), 6).as("max_eval_cos"),
        when(col("__mx") < threshold, 1).otherwise(0).as("kept"))
  }

  /** Maximal Marginal Relevance (MMR, Carbonell & Goldstein SIGIR'98)
    * diversified top-k — the re-rank stage between retrieval and a
    * context window: from each query's relevance `shortlist`, greedily
    * pick k results maximizing λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s),
    * so near-duplicate hits don't crowd out coverage. Pick 1 is the
    * pure-relevance argmax (the standard convention; the empty-set
    * diversity term is 0), ties break to the smallest neighbor id.
    *
    * All similarities are pinned to integer MICROS before any
    * comparison, and λ is a ppm integer, so every greedy decision is
    * BIGINT-exact — the scores themselves hash-match the oracle's
    * unrolled replay, not just the final ranking.
    *
    * Scale shape: the only corpus-sized pass is the relevance scan
    * (broadcast queries × corpus, the [[topKBruteForce]] shape — swap
    * [[topKIvfStored]] probing in production, same downstream), and the
    * window ranks SLIM (qid, vid, simq) rows — carrying the vectors
    * through that shuffle measured 12× the scan cost at 200 k×100;
    * survivors re-fetch v/nrm with one small join. The greedy selection
    * itself is the documented per-group imperative case: per query it
    * is an inherently sequential k-step scan over a CONFIG-bounded set
    * (≤ shortlist² pairwise sims, computed in-memory per group), so it
    * runs as ONE `flatMapGroups` over the shortlist rows — a first cut
    * as k unrolled DataFrame stages spent 6× the scan cost on fixed
    * stage overhead (35 s vs 5.5 s brute at 200 k, EXPERIMENTS.md).
    * Every greedy comparison is BIGINT micros; the per-group rounding
    * replicates Spark's `round(x, 0)` (BigDecimal HALF_UP) exactly, so
    * the DataFrame and in-group arithmetic are bit-identical. */
  def mmrSelect(emb: DataFrame, vec: Column, id: Column, isQuery: Column,
      k: Int, shortlist: Int, lambdaPpm: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    require(0L <= lambdaPpm && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6]: $lambdaPpm")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = withNorm(emb, vec, id)
    val q = withNorm(emb.filter(isQuery), vec, id)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wSl = Window.partitionBy(col("qid")).orderBy(col("simq").desc, col("vid"))
    val sl = e.join(broadcast(q), col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")) * 1e6, 0)
          .cast("long").as("simq"))
      .withColumn("srn", row_number().over(wSl))
      .filter(col("srn") <= shortlist)
      .select(col("qid"), col("vid"), col("simq"))
      .join(e, Seq("vid"))
      .select(col("qid"), col("vid"), col("v"), col("nrm"), col("simq"))
      .as[(Long, Long, Seq[Double], Double, Long)]
    val lam = lambdaPpm
    val lam1 = 1000000L - lambdaPpm
    sl.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // vid-ascending candidate order + strict > in the argmax scans
        // = the (score DESC, vid ASC) tie order of the oracle
        val cands = it.toArray.sortBy(_._2)
        val n = cands.length
        val vecs = cands.map(_._3.toArray)
        val nrms = cands.map(_._4)
        def psim(i: Int, j: Int): Long = {
          val a = vecs(i); val b = vecs(j)
          var acc = 0.0
          var d = 0
          val len = math.min(a.length, b.length)
          while (d < len) { acc += a(d) * b(d); d += 1 }
          // exactly Spark round(x, 0) on DoubleType: BigDecimal HALF_UP
          java.math.BigDecimal.valueOf(acc / (nrms(i) * nrms(j)) * 1e6)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        }
        val selected = new Array[Int](math.min(k, n))
        val maxSel = Array.fill(n)(0L) // max psim to the selected set
        val isSel = new Array[Boolean](n)
        val out = Vector.newBuilder[(Long, Int, Long, Long)]
        var p = 0
        while (p < selected.length) {
          var bestIdx = -1
          var bestScore = Long.MinValue
          var i = 0
          while (i < n) {
            if (!isSel(i)) {
              val s = lam * cands(i)._5 -
                (if (p == 0) 0L else lam1 * maxSel(i))
              if (s > bestScore) { bestScore = s; bestIdx = i }
            }
            i += 1
          }
          selected(p) = bestIdx
          isSel(bestIdx) = true
          out += ((qid, p + 1, cands(bestIdx)._2, bestScore))
          var j = 0
          while (j < n) {
            if (!isSel(j)) {
              val ps = psim(j, bestIdx)
              if (p == 0 || ps > maxSel(j)) maxSel(j) = ps
            }
            j += 1
          }
          p += 1
        }
        out.result().iterator
      }
      .toDF("query_id", "pick", "neighbor_id", "mmr_micros")
  }
}
