package graft

import graft.operators.{Layout, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Stored tf-idf index lifecycle contracts (build → append → compact →
  * refresh → serve) that the CORRECTNESS oracles cannot see:
  *  - the append is O(delta) ON DISK — no pre-existing index file is
  *    rewritten or removed;
  *  - refresh restores exact full-rebuild statistics (serving equals
  *    the in-memory operator on the grown corpus);
  *  - compaction changes the file layout, never the served pairs.
  * Value correctness of both serving contracts is the
  * join_tfidf_append / join_tfidf_append_frozen oracle gate.
  */
class TfidfLifecycleSpec extends SparkSpec {

  private def terms = Tables.table(spark, sf, "documents")
    .select(col("doc_id"),
      graft.functions.ShingleGenerator.shingles(col("text"), 3).as("t"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("append is O(delta) on disk; refresh restores full-rebuild parity") {
    val idx = Tables.scratchDir("spec_tfidf_lifecycle")
    Similarity.writeTfidfIndex(terms.filter(col("doc_id") % 5 =!= 4), idx)
    // identity of every data file before the append: (path, length)
    def snapshot(): Set[(String, Long)] =
      Seq("tf", "postings", "vectors").flatMap(s =>
        Layout.dataFiles(s"$idx/$s").map(f => (f.getPath, f.length()))).toSet
    val before = snapshot()
    Similarity.appendToTfidfIndex(idx, terms.filter(col("doc_id") % 5 === 4))
    val after = snapshot()
    assert(before.subsetOf(after),
      "append must only ADD files — a rewritten/removed base file means the append is O(corpus)")
    assert(after.size > before.size, "append must land new delta files")

    // compaction folds multi-file partitions; served pairs unchanged
    val preCompact = pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3))
    val rewritten = Similarity.compactTfidfIndex(spark, idx)
    assert(rewritten > 0, "the append should leave at least one multi-file partition")
    assert(pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3)) == preCompact,
      "compaction must not change served pairs")

    // refresh: statistics re-derived from stored raw tf — serving now
    // equals the in-memory operator on the grown corpus, under BOTH
    // strategies (direct posting-join and prefix+verify)
    Similarity.refreshTfidfIndex(spark, idx)
    val full = pairSet(Similarity.tfidfCosinePairs(terms, 0.3))
    assert(pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3,
      strategy = "direct")) == full)
    assert(pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3,
      strategy = "prefix")) == full)
    spark.catalog.clearCache()
    Tables.deleteRecursive(idx)
  }

  test("delta probe equals frozen-append-then-serve restricted to cross pairs") {
    // the gate-then-append consistency triangle: probing a batch
    // against the pristine index must return EXACTLY the delta×base
    // pairs that appending the batch and serving would report — a gate
    // verdict can never be contradicted by the post-ingest index
    val idx = Tables.scratchDir("spec_tfidf_probe")
    Similarity.writeTfidfIndex(terms.filter(col("doc_id") % 5 =!= 4), idx)
    val delta = terms.filter(col("doc_id") % 5 === 4)
    val probed = Similarity.tfidfDeltaProbe(spark, idx, delta, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    Similarity.appendToTfidfIndex(idx, delta)
    val served = pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3))
      .collect {
        // served pairs are (min, max)-ordered; a cross pair has exactly
        // one member in the delta fifth
        case (a, b, cos) if (a % 5 == 4) != (b % 5 == 4) =>
          (if (a % 5 == 4) (a, b, cos) else (b, a, cos))
      }
    assert(probed == served,
      s"probe/append divergence: probe-only=${(probed -- served).take(3)} served-only=${(served -- probed).take(3)}")
    spark.catalog.clearCache()
    Tables.deleteRecursive(idx)
  }

  test("staleness counters budget the refresh: below skips, above trips, refresh resets") {
    val idx = Tables.scratchDir("spec_tfidf_stale")
    Similarity.writeTfidfIndex(terms.filter(col("doc_id") % 5 =!= 4), idx)
    val st0 = Similarity.tfidfStaleness(spark, idx)
    assert(st0.appendedDocs == 0L && st0.statN > 0L,
      s"fresh build must start with a zeroed staleness clock: $st0")
    // batch 1: a twentieth of the base (docs ≡ 4 mod 25) — 5% growth,
    // under the 10% budget: the GROWTH trigger must not refresh (OOV
    // budget disabled to isolate the branch), and the clock keeps running
    val st1 = Similarity.appendToTfidfIndex(idx,
      terms.filter(col("doc_id") % 25 === 4))
    assert(st1.appendedDocs > 0L && st1.statN == st0.statN)
    assert(st1.growthPpm < 100000L,
      s"test premise: batch 1 must sit under the 10% budget, got ${st1.growthPpm} ppm")
    assert(!Similarity.refreshTfidfIndexIfStale(spark, idx,
        maxGrowthPpm = 100000L, maxOovPpm = Long.MaxValue),
      "below-budget append must not trigger a refresh")
    assert(Similarity.tfidfStaleness(spark, idx).appendedDocs == st1.appendedDocs,
      "a skipped refresh must leave the staleness clock running")
    // the OOV trigger fires INDEPENDENTLY of growth: word 3-shingle
    // vocabularies are heavy-tailed, so even this small batch skips
    // well over 5% of its term mass as out-of-vocabulary
    assert(st1.oovMassPpm > 50000L,
      s"test premise: shingle OOV mass should dwarf 5%, got ${st1.oovMassPpm} ppm")
    assert(Similarity.refreshTfidfIndexIfStale(spark, idx,
        maxGrowthPpm = Long.MaxValue, maxOovPpm = 50000L),
      "above-OOV-budget append must trigger the refresh")
    val st1r = Similarity.tfidfStaleness(spark, idx)
    assert(st1r.appendedDocs == 0L && st1r.statN > st0.statN,
      s"refresh must reset the clock onto the grown corpus: $st1r vs base $st0")
    // batch 2: the rest of the fifth — ~19% growth against the
    // refreshed base trips the growth budget on its own
    val st2 = Similarity.appendToTfidfIndex(idx,
      terms.filter(col("doc_id") % 5 === 4 && col("doc_id") % 25 =!= 4))
    assert(st2.growthPpm > 100000L)
    assert(Similarity.refreshTfidfIndexIfStale(spark, idx,
        maxGrowthPpm = 100000L, maxOovPpm = Long.MaxValue),
      "above-growth-budget append must trigger the refresh")
    val st3 = Similarity.tfidfStaleness(spark, idx)
    assert(st3.appendedDocs == 0L && st3.statN > st1r.statN,
      s"refresh must reset the clock onto the grown corpus: $st3 vs $st1r")
    // and the refreshed index serves full-rebuild parity
    assert(pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3)) ==
      pairSet(Similarity.tfidfCosinePairs(terms, 0.3)))
    spark.catalog.clearCache()
    Tables.deleteRecursive(idx)
  }

  test("a blindly replayed append batch is repaired to the single-applied state") {
    val idx = Tables.scratchDir("spec_tfidf_repair")
    Similarity.writeTfidfIndex(terms.filter(col("doc_id") % 5 =!= 4), idx)
    val delta = terms.filter(col("doc_id") % 5 === 4)
    Similarity.appendToTfidfIndex(idx, delta)
    Similarity.appendToTfidfIndex(idx, delta) // the blind retry (ADVICE r8)
    val tfRows = spark.read.parquet(s"$idx/tf").count()
    Similarity.repairTfidfIndex(spark, idx)
    assert(spark.read.parquet(s"$idx/tf").count() < tfRows,
      "repair must collapse the double-applied tf rows")
    // repair = dedupe + refresh: serving equals a from-scratch build
    // on the (single-applied) grown corpus
    assert(pairSet(Similarity.tfidfCosinePairsStored(spark, idx, 0.3)) ==
      pairSet(Similarity.tfidfCosinePairs(terms, 0.3)))
    Tables.deleteRecursive(idx)

    // same contract for the single-store winnow index
    val docs = Tables.table(spark, sf, "documents")
    val widx = Tables.scratchDir("spec_winnow_repair")
    graft.operators.Dedup.writeWinnowIndex(
      docs.filter(col("doc_id") % 5 =!= 4), col("text"), col("doc_id"), widx)
    graft.operators.Dedup.appendToWinnowIndex(widx,
      docs.filter(col("doc_id") % 5 === 4), col("text"), col("doc_id"))
    graft.operators.Dedup.appendToWinnowIndex(widx,
      docs.filter(col("doc_id") % 5 === 4), col("text"), col("doc_id"))
    graft.operators.Dedup.repairWinnowIndex(spark, widx)
    val served = graft.operators.Dedup.winnowingOverlapStored(spark, widx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mem = graft.operators.Dedup.winnowingOverlapJoin(
      docs, col("text"), col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == mem,
      "repaired winnow index must serve the in-memory overlap pairs exactly")
    spark.catalog.clearCache()
    Tables.deleteRecursive(widx)
  }

  test("frozen-idf append embeds delta docs in the base vocabulary only") {
    val idx = Tables.scratchDir("spec_tfidf_frozen")
    val base = terms.filter(col("doc_id") % 5 =!= 4)
    Similarity.writeTfidfIndex(base, idx)
    val baseVocab = spark.read.parquet(s"$idx/idf")
      .select("t").distinct().collect().map(_.getString(0)).toSet
    Similarity.appendToTfidfIndex(idx, terms.filter(col("doc_id") % 5 === 4))
    val deltaPostings = spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") % 5 === 4)
    val deltaTerms = deltaPostings.select("t").distinct()
      .collect().map(_.getString(0)).toSet
    assert(deltaTerms.subsetOf(baseVocab),
      "frozen append must never index a term outside the stored vocabulary")
    // the appended postings carry the FROZEN idf values verbatim
    val storedIdf = spark.read.parquet(s"$idx/idf")
      .collect().map(r => r.getAs[String]("t") -> r.getAs[Double]("idf")).toMap
    val drifted = deltaPostings.select("t", "idf").distinct().collect()
      .filter(r => storedIdf(r.getString(0)) != r.getDouble(1))
    assert(drifted.isEmpty, s"appended idf drifted from the frozen table: ${drifted.take(3).mkString(",")}")
    spark.catalog.clearCache()
    Tables.deleteRecursive(idx)
  }
}
