package graft

import graft.operators.{Dedup, Joins, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics at the edges: nulls, empties, degenerate inputs. */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  test("null keys never match in equi-joins, under every strategy") {
    val l = Seq((Some(1L), "a"), (None, "b"), (Some(2L), "c"))
      .toDF("k", "v")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("k2", "w")
    for (st <- Seq(JoinStrategy.ShuffleHash, JoinStrategy.Broadcast, JoinStrategy.SortMerge)) {
      val j = Joins.equiJoin(l, r, col("k"), col("k2"), st).collect()
      assert(j.length == 1 && j.head.getString(1) == "a", s"strategy $st")
    }
    // null-safe variant DOES match nulls
    assert(l.join(r, col("k") <=> col("k2")).count() == 2)
  }

  test("joins against empty inputs yield empty results, not errors") {
    val l = Seq((1L, "a")).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k2", "w")
    assert(Joins.equiJoin(l, empty, col("k"), col("k2"), JoinStrategy.ShuffleHash).count() == 0)
    assert(Joins.broadcastJoin(empty, l, col("k2"), col("k")).count() == 0)
  }

  test("dedup handles single-token and sub-shingle-length docs") {
    val docs = Seq((1L, "one"), (2L, "two words"), (3L, "three words here now"),
      (4L, "three words here now")).toDF("doc_id", "text")
    // docs 1,2 have < k tokens → no shingles → never near-dup candidates
    val pairs = Dedup.ngramJaccard(docs, col("text"), col("doc_id"), k = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((3L, 4L)))
    // exact dedup still groups them
    assert(Dedup.exact(docs, col("text"), col("doc_id")).count() == 3)
  }

  test("text metrics on empty and whitespace-only strings don't throw") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id") +: TextAnalysis.qualityProjection(col("text")): _*)
      .collect()
    assert(rows.length == 3) // no exceptions; ratios may be null/NaN-free ints over 1-token splits
    val fp = df.select(TextAnalysis.fingerprintHof(col("text"))).collect().map(_.getLong(0))
    assert(fp(0) == 0L) // empty normalized text → identity hash
  }

  test("zipf generator degenerate parameters") {
    import graft.datagen.DataGen
    // single key: all rows collapse to k=1
    val one = DataGen.zipfCounts(spark, 100, 1, 0.5).collect()
    assert(one.length == 1 && one.head.getLong(1) == 100)
    // skew 0 = uniform-ish: counts within ±1 of each other
    val flat = DataGen.zipfCounts(spark, 1000, 10, 0.0).collect().map(_.getLong(1))
    assert(flat.max - flat.min <= 1)
  }

  test("cosine of a vector with itself is exactly 1 after rounding") {
    val e = Seq((1L, Seq(0.5f, -0.25f, 0.125f)), (2L, Seq(0.5f, -0.25f, 0.125f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(e, col("embedding"), col("vec_id"), 0.99)
    assert(pairs.head().getDouble(2) == 1.0)
  }

  test("curation operators survive null, empty, and whitespace-only text") {
    import graft.operators.Curation
    val docs = Seq[(java.lang.Long, String)](
      (1L, null), (2L, ""), (3L, "   "), (4L, "one"), (5L, "a b c"))
      .toDF("doc_id", "text")
    // chunking: null text drops the doc (null tokens -> null sequence ->
    // explode emits nothing); empty/whitespace docs chunk their empty
    // tokens without throwing
    val chunks = Curation.chunkOverlap(docs, col("text"), col("doc_id"), 4, 2)
      .collect().map(r => (r.getLong(0), r.getString(3)))
    assert(!chunks.exists(_._1 == 1L))
    assert(chunks.count(_._1 == 5L) == 1 && chunks.find(_._1 == 5L).get._2 == "a b c")
    // bag-of-words dedup: null text keys a separate NULL group (oracle
    // md5(NULL) semantics); "" and "   " share the single-empty-token bag
    val bow = Curation.bagOfWords(docs, col("text"), col("doc_id")).collect()
    assert(bow.map(_.getLong(2)).sum == 5L)
    val emptyBag = bow.filter(_.getLong(2) == 2L)
    assert(emptyBag.length == 1 && emptyBag.head.getLong(1) == 2L)
    assert(bow.exists(r => r.isNullAt(0) && r.getLong(2) == 1L))
    // decontamination: no shingles on either side -> empty result, no throw
    assert(Curation.decontaminate(
      docs.filter(col("doc_id") <= 3), docs.filter(col("doc_id") === 4),
      col("text"), col("doc_id")).count() == 0)
  }

  test("skewProfile and trendSlope handle single-row and empty inputs") {
    import graft.operators.{Curation, Intervals}
    val one = Seq((7L, 100L, 2.5)).toDF("k", "x", "y")
    val sp = Curation.skewProfile(one, col("k")).collect()
    assert(sp.length == 1 && sp(0).getLong(0) == 1L && sp(0).getLong(4) == 0L)
    val ts = Intervals.trendSlope(one, col("k"), col("x"), col("y")).collect()
    assert(ts.length == 1 && ts(0).isNullAt(2))
    val empty = one.filter(col("k") === -1)
    assert(Curation.skewProfile(empty, col("k")).collect()
      .forall(_.isNullAt(0))) // empty agg -> null stats row, no divide error
    assert(Intervals.trendSlope(empty, col("k"), col("x"), col("y")).count() == 0)
  }

  test("round-5 operators at the edges: empty text, sparse sequences, no touches") {
    import graft.operators.{CorpusOps, Intervals}
    // whitespace-only text tokenizes to ONE empty token (split limit -1
    // semantics) — vocabCoverage must count it, not crash or drop the doc
    val docs = Seq((1L, "  "), (2L, "a a b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val vc = CorpusOps.vocabCoverage(docs, col("t"), col("id"), 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(vc(2L) == ((3L, 333333L))) // vocab = {a}; b is OOV
    assert(vc(1L)._1 == 1L)           // the empty token
    assert(!vc.contains(3L))          // null text yields no token rows
    // below-k docs are absent from novelty (no shingles on either engine)
    val nv = CorpusOps.noveltyScore(Seq((1L, "a b"), (2L, "a b c"))
      .toDF("id", "t"), col("t"), col("id")).collect()
    assert(nv.map(_.getLong(0)).toSeq == Seq(2L))
    // one event per user → no transitions; empty input → empty matrix
    val ev = Seq((1L, "u1", 10L, "a"), (2L, "u2", 20L, "b"))
      .toDF("event_id", "user_id", "us", "event_type")
    assert(Intervals.markovTransitions(ev, col("user_id"), col("us"),
      col("event_id"), col("event_type")).count() == 0)
    // conversions with no qualifying touch emit null-touch rows
    val at = Intervals.lastTouchAttribution(ev, col("user_id"), col("us"),
      col("event_id"), col("event_type"), "a", "b", windowUs = 5L).collect()
    assert(at.length == 1 && at(0).getLong(0) == 2L && at(0).isNullAt(3) &&
      at(0).isNullAt(4) && at(0).isNullAt(5))
  }

  test("round-4 operators at the edges: null text, whitespace docs, lone sources") {
    import graft.operators.{Aggregates, CorpusOps, Curation}
    // DSIR: null text yields no feature rows → doc absent from weights;
    // whitespace-only text yields ONE empty unigram (split limit -1) and
    // participates normally; neither side crashes
    val raw = Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("id", "t")
    val tgt = Seq((10L, "a b"), (11L, "c")).toDF("id", "t")
    val w = Curation.importanceWeights(raw, tgt, col("t"), col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.keySet == Set(1L, 3L), s"null text must vanish, blank must stay: $w")
    assert(w(1L) == 3L && w(3L) == 1L) // a, b, "a b" vs one empty token
    // temperatureMix with a single source: weight pins to the 1000 cap,
    // positions are the pure low-discrepancy ladder
    val one = Seq((1L, "s"), (2L, "s"), (3L, "s")).toDF("id", "src")
    val tm = CorpusOps.temperatureMix(one, col("src"), col("id"), 3.0)
      .select(col("id"), col("pos")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tm == Map(1L -> 500L, 2L -> 1500L, 3L -> 2500L))
    // ksDrift at the 2-group minimum, identical distributions → 0 ppm
    val same = Seq(("a", 5L), ("a", 7L), ("b", 5L), ("b", 7L)).toDF("g", "x")
    val ks = Curation.ksDrift(same, col("g"), col("x"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ks == Map("a" -> 0L, "b" -> 0L))
    // saltedDistinctCount: null values count as one distinct? NO — like
    // count(DISTINCT v) they are excluded on both engines
    val nulls = Seq(("k", Some(1L)), ("k", None), ("k", Some(1L)), ("k", None))
      .toDF("g", "v")
    val sd = Aggregates.saltedDistinctCount(nulls, col("g"), col("v"), 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sd == Map("k" -> 1L))
  }
}
