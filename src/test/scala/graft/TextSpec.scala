package graft

import graft.functions.{GraftFunctions, RollingHash}
import graft.operators.{CorpusOps, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {

  test("custom RollingHash expression equals the composed-builtin HOF twin") {
    val docs = Tables.table(spark, sf, "documents")
    val both = docs.select(
      GraftFunctions.rolling_hash(TextAnalysis.normalized(col("text"))).as("custom"),
      TextAnalysis.fingerprintHof(col("text")).as("hof"))
    assert(both.filter(col("custom") =!= col("hof")).count() == 0)
  }

  test("RollingHash interpreted eval equals codegen path") {
    import spark.implicits._
    val df = Seq("hello world", "", "a", "zz 99").toDF("s")
    // codegen
    val cg = df.select(GraftFunctions.rolling_hash(col("s"))).collect().map(_.getLong(0))
    // interpreted (direct eval)
    val exp = Seq("hello world", "", "a", "zz 99").map { s =>
      s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    }
    assert(cg.toSeq == exp)
  }

  test("NfcNormalize composes decomposed input; ASCII and null pass through") {
    import spark.implicits._
    import graft.functions.NfcNormalize
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val decomposed = "cafe\u0301" // e + combining acute U+0301
    val composed = "caf\u00e9"    // precomposed U+00E9
    val rows = Seq(decomposed, composed, "plain ascii", "", null)
    val got = rows.toDF("s")
      .select(GraftFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(composed, composed, "plain ascii", "", null))
    // interpreted eval agrees with the codegen path exercised above
    for (s <- rows if s != null) {
      val interp = NfcNormalize(Literal(UTF8String.fromString(s)))
        .eval(null).asInstanceOf[UTF8String].toString
      assert(interp == java.text.Normalizer.normalize(
        s, java.text.Normalizer.Form.NFC))
    }
    // already-NFC non-ASCII input returns the input buffer (no copy)
    val u = UTF8String.fromString(composed)
    assert(NfcNormalize(Literal(u)).eval(null).asInstanceOf[AnyRef] eq u)
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("abc").toDF("s").createOrReplaceTempView("t_rh")
    val v = spark.sql("SELECT graft_rolling_hash(s) AS h FROM t_rh").head().getLong(0)
    assert(v == "abc".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L))
  }

  test("language-ID is deterministic and prefers zh on CJK content") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "el perro y la casa es un animal"),
      (4L, "le chien et les chats est un animal"),
      (5L, "你好 世界")).toDF("doc_id", "text")
    val got = TextAnalysis.withLangId(df, col("text"))
      .select(col("doc_id"), col("pred_lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr", 5L -> "zh"))
  }

  test("quality metrics handle edge shapes") {
    import spark.implicits._
    val df = Seq("one", "a b c", "x,y. z!").toDF("text")
    val rows = df.select(TextAnalysis.qualityProjection(col("text")): _*).collect()
    assert(rows(0).getInt(1) == 1)                 // one token
    assert(rows(1).getInt(1) == 3)
    assert(rows(2).getDouble(2) > 0)               // punct ratio
  }

  test("stratified samples are nested: lower rate is a subset of higher rate") {
    import graft.operators.CorpusOps
    val docs = Tables.table(spark, sf, "documents")
    def ids(pct: Int) = CorpusOps.stratifiedSample(docs, col("doc_id"), lit(pct))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(10); val s40 = ids(40); val s100 = ids(100)
    assert(s10.subsetOf(s40) && s40.subsetOf(s100))
    assert(s100.size == docs.count())
    // rate is approximately honored
    assert(math.abs(s40.size.toDouble / s100.size - 0.4) < 0.1)
  }

  test("quota mix returns at most quota rows per stratum, deterministically") {
    import graft.operators.CorpusOps
    val docs = Tables.table(spark, sf, "documents")
    val mixed = CorpusOps.quotaMix(docs, col("source"), 5,
      Seq(col("n_chars").desc, col("doc_id")))
    val perSource = mixed.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 5))
    val a = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CorpusOps.quotaMix(docs.repartition(13), col("source"), 5,
      Seq(col("n_chars").desc, col("doc_id")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("bm25: tf monotone, rare terms outweigh common, long docs penalized") {
    import graft.operators.CorpusOps
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog fish bird mouse"),        // 1x cat
      (2L, "cat cat dog fish bird"),          // 2x cat, same length
      (3L, "cat dog fish bird mouse horse cow pig hen duck goat sheep"), // 1x cat, longer
      (4L, "rare dog fish bird mouse"),       // 1x rare (df=1)
      (5L, "dog fish bird mouse wolf"),       // no query terms
      (6L, "cat dog fish bird mouse"))        // duplicate of 1
    val scores = CorpusOps.bm25TopK(docs.toDF("doc_id", "text"),
        col("text"), col("doc_id"), query = Seq("cat", "rare"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(5L))                  // no match, no row
    assert(scores(2L) > scores(1L))               // higher tf wins
    assert(scores(1L) > scores(3L))               // length normalization
    assert(scores(4L) > scores(1L))               // df=1 term beats df=4 term
    assert(scores(1L) == scores(6L))              // identical docs tie exactly
  }

  test("pack bins: offsets within capacity, bins monotone in doc order, tape conserved") {
    import graft.operators.CorpusOps
    val docs = Tables.table(spark, sf, "documents")
    val cap = 1000L
    val packed = CorpusOps.packBins(docs, col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long"), cap)
      .select(col("doc_id"), col("bin_id"), col("bin_offset"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
      .orderBy("doc_id").collect()
    assert(packed.forall(r => r.getLong(2) >= 0 && r.getLong(2) < cap))
    val bins = packed.map(_.getLong(1))
    assert(bins.sliding(2).forall(p => p.head <= p.last), "bin ids not monotone")
    // the tape position of each doc equals the running token total
    var cum = 0L
    packed.foreach { r =>
      assert(r.getLong(1) * cap + r.getLong(2) == cum)
      cum += r.getLong(3)
    }
  }

  test("vocabCoverage: ppm exact; frequency ties at the cut break by token text") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // freqs: aa×3, then bb/cc ×2 each — vocabSize 2 must keep {aa, bb}
    // (tie at f=2 broken by text), so cc and dd are OOV
    val docs = Seq(
      (1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "aa dd")).toDF("id", "t")
    val got = CorpusOps.vocabCoverage(docs, col("t"), col("id"), 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, 333333L), (2L, 3L, 333333L), (3L, 2L, 500000L)))
  }

  test("noveltyScore: first doc fully novel, verbatim re-crawl scores 0") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val docs = Seq(
      (1L, "a b c d e"),       // 3 shingles, all first here
      (2L, "a b c d e"),       // exact re-crawl → 0 novel
      (3L, "x y z a b c")      // 'a b c' seen in doc 1; 'x y z','y z a','z a b' new
    ).toDF("id", "t")
    val got = CorpusOps.noveltyScore(docs, col("t"), col("id"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1000000L), (2L, 3L, 0L), (3L, 4L, 750000L)))
  }

  test("bpePairCounts: frequency-weighted adjacent pairs, hand-computed") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // words: abc(2: doc1+doc3), ab(1), x(1, no pairs)
    // pairs: ab = 2(abc) + 1(ab) = 3, bc = 2(abc)
    val docs = Seq((1L, "abc ab"), (2L, "x"), (3L, " abc ")).toDF("id", "t")
    val got = CorpusOps.bpePairCounts(docs, col("t"), 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("ab", 3L), ("bc", 2L)))
    // k truncates at the (n desc, pair asc) boundary deterministically
    val top1 = CorpusOps.bpePairCounts(docs, col("t"), 1).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top1.toSeq == Seq(("ab", 3L)))
  }

  test("wordpiece: greedy longest match, per-char UNK fallback, edge inputs") {
    import spark.implicits._
    def enc(t: String): Seq[String] = {
      val rows = Seq(Tuple1(t)).toDF("t")
        .select(graft.functions.WordPiece.encode(col("t")).as("p")).head()
      rows.getSeq[String](0)
    }
    // longest match wins over shorter prefixes at every cursor
    assert(enc("tables") == Seq("table", "s"))
    assert(enc("stream") == Seq("st", "r", "e", "am"))
    // maximal munch is NOT globally optimal — "querykey" is fine, but
    // greedy on "thow" takes "t"+"h"+"ow", never backtracks to t+how
    assert(enc("querykey table") == Seq("query", "key", "table"))
    // unknown chars cost one [UNK] each, the rest of the word survives
    assert(enc("x9!z") == Seq("x", "[UNK]", "[UNK]", "z"))
    // whitespace edges: ' '-only trim, interior runs, empty -> no pieces
    assert(enc("  a  b ") == Seq("a", "b"))
    assert(enc("") == Seq.empty)
    // null text -> null array (not empty)
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.WordPiece.encode(col("t")).as("p")).head()
    assert(n.isNullAt(0))
  }

  test("knBigramLogProb matches the hand-derived Kneser-Ney recurrence") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // corpus "a b a b a c": bigrams (a,b)x2 (b,a)x2 (a,c)x1
    // heads: a->3 (2 distinct successors), b->2 (1); continuations:
    // b<-1 ctx, a<-1, c<-1; distinct bigrams total 3; D = 0.75
    val got = CorpusOps.knBigramLogProb(
        Seq((1L, "a b a b a c")).toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .head()
    def p(cb: Long, ch: Long, n1w1: Long, n1w2: Long, n1tot: Long): Double =
      math.max(cb.toDouble - 0.75, 0.0) / ch + (0.75 * n1w1 / ch) * (n1w2.toDouble / n1tot)
    val lpm = Seq(
      p(2, 3, 2, 1, 3), // (a,b) x2 occurrences
      p(2, 3, 2, 1, 3),
      p(2, 2, 1, 1, 3), // (b,a) x2
      p(2, 2, 1, 1, 3),
      p(1, 3, 2, 1, 3)) // (a,c) x1
      .map(x => math.round(math.log10(x) * 1e6))
    val s = lpm.sum
    val c = lpm.size.toLong
    val mean = -((2 * -s + c) / (2 * c)) / 1e6 // s < 0 here
    assert(got.getLong(1) == c)
    assert(got.getDouble(2) == mean, s"got ${got.getDouble(2)} want $mean")
    // KN assigns unseen-context mass: every probability strictly in (0,1)
    assert(lpm.forall(_ < 0))
  }

  test("classifierScore is the exact integer mean of hashed bucket weights") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val docs = Seq((1L, "x y x"), (2L, "y")).toDF("doc_id", "text")
    // weight table covering ALL buckets so the inner join drops nothing
    val w = CorpusOps.hashWeights(spark, 64L)
    val got = CorpusOps.classifierScore(docs, col("text"), col("doc_id"), w, 64L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver replication: same md5-prefix bucket, same hash32 weight
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 64L
    }
    def wm(b: Long): Long = (b * 2654435761L) % 4294967296L % 1000001L - 500000L
    def mean(ts: Seq[String]): Double = {
      val s = ts.map(t => wm(bucket(t))).sum
      val c = ts.size.toLong
      (if (s >= 0) (2 * s + c) / (2 * c) else -((2 * -s + c) / (2 * c))) / 1e6
    }
    assert(got(1L) == ((3L, mean(Seq("x", "y", "x")))))
    assert(got(2L) == ((1L, mean(Seq("y")))))
  }

  test("bpeTrain learns merges in frequency order, fusing learned symbols") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // "aba" x3 + "ab" x2: step 1 must merge (a,b) with count 5; step 2
    // merges the LEARNED symbol pair (ab,a) with count 3 — character
    // pair counting alone would never produce an 'ab' symbol
    val docs = Seq("aba aba aba ab ab").toDF("text")
    val m = CorpusOps.bpeTrain(docs, col("text"), nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 5L), (2, "ab", "a", 3L)))
    // leftmost-first overlap semantics: "aaaa" + merge(a,a) pairs as
    // (aa)(aa), so step 2 merges (aa,aa) — NOT (a,aa) or 3 leftover a's
    val over = Seq("aaaa aaaa").toDF("text")
    val m2 = CorpusOps.bpeTrain(over, col("text"), nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m2.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
    // exhaustion: once every word is one symbol there is no pair left —
    // the trainer stops early instead of looping or failing
    val tiny = Seq("ab ab").toDF("text")
    val m3 = CorpusOps.bpeTrain(tiny, col("text"), nMerges = 5)
    assert(m3.count() == 1)
    // partitioning invariance: counts are aggregates and argmax ties
    // break on text — physical layout must not change the merge list
    val re = CorpusOps.bpeTrain(docs.repartition(7), col("text"), nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(re.toSeq == m.toSeq)
  }

  test("bpeTrain batched rounds equal the sequential walk on corpus text") {
    import graft.operators.CorpusOps
    // the safe-batch selection is provably sequential-equivalent; this
    // pins it empirically on natural text (sf documents, 24 merges)
    // where batches actually exceed size 1
    val docs = Tables.table(spark, sf, "documents").select(col("text"))
    def table(batch: Int) =
      CorpusOps.bpeTrain(docs, col("text"), nMerges = 24, batch = batch)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(table(16) == table(1), "batched merge table diverged from sequential")
  }

  test("bpeTrain want-exit stop bound: minted pair can steal a tied pick (ADVICE r6)") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // Crafted divergence corpus (needs merged symbol AB < C < B, so
    // A=a, B=z, AB="az", C=b): with batch=2 the scan picks (a,z):10
    // then (b,c):5 and exits on WANT with (z,y):5 unexamined. The
    // sequential walk instead merges (a,z) first, which mints (az,y)
    // at count 5 — tying (b,c) with the lex-smaller l "az" < "b" — so
    // step 2 is (az,y), not (b,c). A stop bound that ignores
    // unexamined rows keeps (b,c) in the batch and diverges; the fix
    // takes stopN from the first unexamined row, deferring the tie.
    val docs = (Seq.fill(5)("az") ++ Seq.fill(5)("azy") ++
      Seq.fill(5)("bc")).toDF("text")
    def table(batch: Int) =
      CorpusOps.bpeTrain(docs, col("text"), nMerges = 3, batch = batch)
        .collect().map(r =>
          (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val seqTable = table(1)
    assert(seqTable == Seq((1, "a", "z", 10L), (2, "az", "y", 5L),
      (3, "b", "c", 5L)))
    assert(table(2) == seqTable, "want-exit stop bound diverged")
    assert(table(16) == seqTable)
  }

  test("bpe model store round-trip: trained table reads back ordered and intact") {
    import graft.operators.CorpusOps
    // the train→store leg of train→store→apply (the apply leg is the
    // text_bpe_apply_stored oracle gate): persist a TRAINED table,
    // read it back, and the ordered merge list must be identical
    val docs = Tables.table(spark, sf, "documents").select(col("text"))
    val trained = CorpusOps.bpeTrain(docs, col("text"), nMerges = 8)
    val path = Tables.scratchDir("spec_bpe_model")
    CorpusOps.writeBpeModel(trained, path)
    val stored = CorpusOps.readBpeModel(spark, path)
    val direct = trained.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(stored == direct && stored.size == 8)
    // and the stored model encodes identically to the in-code chain
    import spark.implicits._
    import graft.queries.TextQueries
    val words = Seq("other", "and", "then").toDF("w")
    val viaStored = {
      val p = Tables.scratchDir("spec_bpe_demo")
      CorpusOps.writeBpeModel(TextQueries.bpeDemoMerges.zipWithIndex
        .map { case ((l, r), i) => (i + 1, l, r) }.toDF("step", "lhs", "rhs"), p)
      words.select(CorpusOps.bpeEncodeWith(col("w"),
        CorpusOps.readBpeModel(spark, p)).as("p")).collect().map(_.getString(0)).toSeq
    }
    val viaCode = words.select(expr(TextQueries.bpeEncodeSparkSql("w")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(viaStored == viaCode)
  }

  test("bpe encode chain is canonical leftmost-first BPE (no cross-symbol merges)") {
    import spark.implicits._
    import graft.queries.TextQueries
    // ADVICE r5: the single-separator chain encoded 'other' as [o, ther]
    // (the 'e r' replace spanned the 'the' symbol's last char) — the
    // doubled-separator walk must yield canonical [o, the, r]. Both
    // engines share the chain, so ONLY this spec can catch the hazard.
    val got = Seq("other", "and", "then", "aaaa", "er")
      .toDF("w").select(expr(TextQueries.bpeEncodeSparkSql("w")).as("p"))
      .collect().map(_.getString(0)).toSeq
    // merges in order: (t,h)(th,e)(a,n)(an,d)(i,n)(e,r)
    assert(got == Seq("o the r", "and", "the n", "a a a a", "er"))
  }

  test("segmentDedup cuts tile-aligned boilerplate in >= maxDocs docs, keeps order") {
    import spark.implicits._
    // 5-token tiles; "B1..B5" opens 3 docs (boilerplate: dropped
    // everywhere), "R1..R5" opens only 2 (kept); unique tails survive
    val bp = "B1 B2 B3 B4 B5"
    val rare = "R1 R2 R3 R4 R5"
    val docs = Seq(
      (1L, s"$bp u1a u1b u1c u1d u1e"),
      (2L, s"$bp u2a u2b u2c u2d u2e"),
      (3L, s"$bp u3a u3b u3c u3d u3e"),
      (4L, s"$rare u4a u4b u4c u4d u4e"),
      (5L, s"$rare u5a u5b u5c u5d u5e"),
      (6L, bp) // fully-boilerplate doc: kept as a row, empty text
    ).toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, col("text"), col("doc_id"),
        segTokens = 5, maxDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.size == 6) // every doc present, including the emptied one
    assert(out(1L) == ((2L, 1L, "u1a u1b u1c u1d u1e")))
    assert(out(4L) == ((2L, 0L, s"$rare u4a u4b u4c u4d u4e")))
    assert(out(6L) == ((1L, 1L, "")))
    // order preservation across >2 kept segments: seg_idx sort, not
    // lexicographic segment text
    val long = Seq((9L, "z9 z8 z7 z6 z5 a1 a2 a3 a4 a5 m1 m2 m3")).toDF("doc_id", "text")
    val kept = CorpusOps.segmentDedup(long, col("text"), col("doc_id"), 5, 2)
      .collect().head.getString(3)
    assert(kept == "z9 z8 z7 z6 z5 a1 a2 a3 a4 a5 m1 m2 m3")
  }

  test("gopherRules flags match hand-computed exact-integer thresholds") {
    import spark.implicits._
    val docs = Seq(
      // 10 tokens, all distinct, 1 stopword ("the"), mean len ok
      (1L, "the quick brown foxes jumped over several lazy sleeping dogs"),
      // dominance fail: "spam" is 6 of 10 tokens (5*6 > 10)
      (2L, "spam spam spam spam spam spam the eggs and ham"),
      // length fail: 3 tokens
      (3L, "too short doc")).toDF("doc_id", "text")
    val out = CorpusOps.gopherRules(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_tokens") == 10 && d1.getAs[Long]("n_stop") == 1)
    assert(d1.getAs[Boolean]("pass_len") && d1.getAs[Boolean]("pass_dominance"))
    assert(d1.getAs[Boolean]("pass_stop")) // 50*1 >= 3*10
    assert(d1.getAs[Boolean]("pass_all") == (d1.getAs[Boolean]("pass_wordlen")
      && d1.getAs[Boolean]("pass_distinct")))
    val d2 = out(2L)
    assert(d2.getAs[Long]("max_tok") == 6 && !d2.getAs[Boolean]("pass_dominance"))
    assert(!d2.getAs[Boolean]("pass_all"))
    assert(!out(3L).getAs[Boolean]("pass_len") && !out(3L).getAs[Boolean]("pass_all"))
  }

  test("poissonBootstrap equals the driver-side replication and is layout-invariant") {
    import spark.implicits._
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val got = CorpusOps.poissonBootstrap(docs, col("doc_id"), col("source"),
        col("n_chars"), replicates = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // driver-side replication of the md5 → 48-bit → inverse-CDF walk
    val ths = Seq(103548857136060L, 207097714272121L, 258872142840152L,
      276130285696162L, 280444821410164L, 281307728552965L, 281451546410098L)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = scala.collection.mutable.Map
      .empty[(Long, String), (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, src, nc) <- rows; r <- 0L until 3L) {
      val hex = md.digest(s"$id:$r".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = java.lang.Long.parseLong(hex, 16)
      val k = ths.indexWhere(u < _) match { case -1 => 7L; case i => i.toLong }
      val (a, b, c) = exp((r, src))
      exp((r, src)) = (a + k, b + (if (k > 0) 1L else 0L), c + k * nc)
    }
    assert(got == exp.toMap)
    // counts are pure functions of (id, replicate) — physical layout free
    val re = CorpusOps.poissonBootstrap(docs.repartition(7), col("doc_id"),
        col("source"), col("n_chars"), replicates = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(re == got)
  }

  test("rrfFuse: hand-computed fused scores, list-membership counts, tie-break") {
    import spark.implicits._
    // list A ranks docs 1,2,3; list B ranks 3,2,4 — doc 2 and 3 appear
    // in both. RRF micros: 1e6/61=16393, 1e6/62=16129, 1e6/63=15873
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rnk")
    val b = Seq((3L, 1), (2L, 2), (4L, 3)).toDF("doc_id", "rnk")
    val got = CorpusOps.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = Seq(
      (3L, 15873L + 16393L, 2L), // 32266
      (2L, 16129L + 16129L, 2L), // 32258
      (1L, 16393L, 1L),
      (4L, 15873L, 1L))
    assert(got.toSeq == exp, s"got ${got.toSeq}")
    // exact tie on fused score breaks on doc_id: two singleton lists
    // giving equal contributions
    val t1 = Seq((9L, 1)).toDF("doc_id", "rnk")
    val t2 = Seq((7L, 1)).toDF("doc_id", "rnk")
    val tied = CorpusOps.rrfFuse(Seq(t1, t2), k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(7L, 9L))
  }

  test("winnowing equals the driver-replicated walk; rightmost ties; run guarantee") {
    import spark.implicits._
    val (k, w) = (3, 4)
    // doc 1: plain text; doc 2 shares a >= w+k-1 = 6-token run with doc 1
    // (the paper's detection guarantee applies); doc 3: a period-3
    // repetition so every window holds EQUAL minima (rightmost-tie
    // path); doc 4: shorter than w shingles (single partial window);
    // doc 5: punctuation/case noise the normalization must strip
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "once more the quick brown fox jumps over a fence"),
      (3L, "a b c a b c a b c a b c"),
      (4L, "just four little words"),
      (5L, "The QUICK, brown fox!! jumps over... the lazy dog tonight")
    ).toDF("doc_id", "text")
    val got = CorpusOps.winnowingFingerprints(docs, col("text"), col("doc_id"), k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent driver walk: normalize, shingle, charAt fold, window
    // minima with rightmost tie, dedup
    def hash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31L + c) % 1000000007L)
    val exp = docs.collect().flatMap { r =>
      val id = r.getLong(0)
      val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.length < k) Seq.empty
      else {
        val hs = (0 to toks.length - k).map(i => hash(toks.slice(i, i + k).mkString(" ")))
        (0 to math.max(hs.length - w, 0)).map { t =>
          val sub = hs.slice(t, t + w)
          val m = sub.min
          (id, (t + sub.lastIndexOf(m)).toLong, m)
        }.toSet
      }
    }.toSet
    assert(got == exp, s"winnowing diverged:\n got=$got\n exp=$exp")
    // normalization: doc 5 is doc 1 up to case/punctuation — identical
    // fingerprint (pos, fp) sets
    assert(got.filter(_._1 == 5L).map(t => (t._2, t._3)) ==
      got.filter(_._1 == 1L).map(t => (t._2, t._3)))
    // detection guarantee: docs 1 and 2 share a 6-token run -> at least
    // one common fingerprint hash
    val f1 = got.filter(_._1 == 1L).map(_._3)
    val f2 = got.filter(_._1 == 2L).map(_._3)
    assert((f1 & f2).nonEmpty, "shared w+k-1 run yielded no shared fingerprint")
    // short doc: exactly one selection (its single partial window)
    assert(got.count(_._1 == 4L) == 1)
  }

  test("DictionaryTagCounts: overlapping occurrences, nested phrases, null text") {
    import spark.implicits._
    import graft.functions.DictionaryTagCounts
    // "aba" self-overlaps in "ababa" (positions 1 and 3); "ab" nests
    // inside "aba" (a shorter phrase ending mid-longer-match must
    // still be credited via fail-link hits); "xyz" never occurs
    val d = Seq((1L, Some("ababa")), (2L, Some("zababz ab")),
      (3L, Some("")), (4L, Option.empty[String])).toDF("id", "t")
    val got = d.select(col("id"),
        DictionaryTagCounts.tags(col("t"), Seq("aba", "ab", "xyz")).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[String](1))).toMap
    assert(got(1L) == Seq("1:2", "2:2")) // aba@1, aba@3; ab@1, ab@3
    assert(got(2L) == Seq("1:1", "2:3")) // aba@2; ab@2, ab@4, ab@8
    assert(got(3L) == Seq.empty) // unmatched phrases are ABSENT (sparse)
    assert(got(4L) == null)
  }

  test("DictionaryTagCounts matches a brute-force substring scan on real docs") {
    val phrases = Seq("table table", "scan", "fast merge", "a a")
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val got = docs.select(col("doc_id"),
        graft.functions.DictionaryTagCounts.tags(col("text"), phrases).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.startsWith(p, i)).toLong
    texts.foreach { case (id, t) =>
      val expect = phrases.zipWithIndex.collect {
        case (p, i) if brute(t, p) > 0 => s"${i + 1}:${brute(t, p)}"
      }
      assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
    }
    // the planted runs actually occur somewhere in the corpus slice
    assert(got.values.exists(_.nonEmpty))
  }

  test("UnigramViterbi matches exhaustive segmentation enumeration on random cases") {
    import spark.implicits._
    import graft.functions.UnigramViterbi
    val rnd = new scala.util.Random(20260815L)
    val alphabet = "abc"
    (1 to 60).foreach { caseNo =>
      // random vocab: 3-7 distinct pieces of length 1-3 over {a,b},
      // random negative scores; random word of length 0-8 over {a,b,c}
      // (c is never a single-char piece -> exercises the UNK gate)
      val pieces = rnd.shuffle(
        (for (l <- 1 to 3; s <- Seq.fill(12)((1 to l).map(_ => "ab"(rnd.nextInt(2))).mkString)) yield s)
          .distinct.toList).take(3 + rnd.nextInt(5))
      val vocab = pieces.map(p => p -> -(500000L + rnd.nextInt(5000000).toLong))
      val unk = -7777777L
      val word = (0 until rnd.nextInt(9)).map(_ => alphabet(rnd.nextInt(3))).mkString
      // exhaustive: enumerate every path through the edge DAG
      val singles = vocab.collect { case (p, _) if p.length == 1 => p.head }.toSet
      def walk(pos: Int): Seq[Long] =
        if (pos == word.length) Seq(0L)
        else {
          val vocabEdges = vocab.collect {
            case (p, sc) if word.startsWith(p, pos) => walk(pos + p.length).map(_ + sc)
          }.flatten
          val unkEdges = if (!singles(word.charAt(pos)))
            walk(pos + 1).map(_ + unk) else Seq.empty
          vocabEdges ++ unkEdges
        }
      val paths = walk(0)
      val expect = s"${paths.max}:${paths.count(_ == paths.max)}"
      val got = Seq(Tuple1(word)).toDF("t")
        .select(UnigramViterbi.segment(col("t"), vocab, unk))
        .head().getSeq[String](0)
      val expected = if (word.isEmpty) Seq("0:1") else Seq(expect)
      assert(got == expected, s"case $caseNo word='$word' vocab=$vocab: $got vs $expected")
    }
  }

  test("KN model store: frozen scoring matches the in-query LM on seen bigrams, floors OOV") {
    import spark.implicits._
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "b c")).toDF("doc_id", "text")
    val path = graft.sources.Tables.scratchDir("graft_kn_spec")
    CorpusOps.writeKnModel(corpus, col("text"), path)
    val delta = Seq((10L, "a b"), (11L, "x y"), (12L, "a b x y")).toDF("doc_id", "text")
    val got = CorpusOps.scoreWithKnModel(spark, path, delta, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1 of the corpus is the single bigram (a, b): its in-query KN
    // mean IS lpm(a,b)/1e6 — the stored path must reproduce it exactly
    val inQuery = CorpusOps.knBigramLogProb(corpus, col("text"), col("doc_id"))
      .filter(col("doc_id") === 1L).head().getDouble(2)
    assert(got(10L) == ((1L, 0L, inQuery)))
    assert(got(11L) == ((1L, 1L, -7.0))) // fully OOV: the floor, counted
    assert(got(12L)._1 == 3L && got(12L)._2 == 2L) // (b,x) and (x,y) OOV
  }

  test("rm3Bm25TopK: expansion surfaces no-query-term docs, rank-discounts feedback mass") {
    import spark.implicits._
    // query = apple. fb = d1, d2 (tie -> doc_id order: d1 rank 1).
    // banana (from rank-1 d1) gets 2x cherry's (rank-2 d2) relevance
    // mass; d3 holds only cherry, d4 only banana — both invisible to
    // plain BM25, both surfaced by expansion, d4 above d3 because of
    // the rank discount (all other term stats symmetric by design).
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "cherry date"), (4L, "banana fig")).toDF("doc_id", "text")
    val got = CorpusOps.rm3Bm25TopK(docs, col("text"), col("doc_id"),
        query = Seq("apple"), k = 4, fbDocs = 2, fbTerms = 4,
        alphaPpm = 600000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = got.toMap
    assert(byDoc(3L) > 0L, s"cherry-only doc not surfaced: $byDoc")
    assert(byDoc(4L) > 0L, s"banana-only doc not surfaced: $byDoc")
    assert(byDoc(4L) > byDoc(3L), s"rank discount missing: $byDoc")
    // α=1: expansion weights all 0 — positive-score docs rank as BM25
    val pure = CorpusOps.rm3Bm25TopK(docs, col("text"), col("doc_id"),
        query = Seq("apple"), k = 4, fbDocs = 2, fbTerms = 4,
        alphaPpm = 1000000L)
      .collect().filter(_.getLong(1) > 0).map(_.getLong(0)).toSeq
    val bm25 = CorpusOps.bm25TopK(docs, col("text"), col("doc_id"),
        query = Seq("apple"), k = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(pure == bm25, s"α=1 must reduce to BM25 order: $pure vs $bm25")
  }

  test("UnigramViterbi: optimal-count ties, beats maximal munch, UNK gating") {
    import spark.implicits._
    import graft.functions.UnigramViterbi
    val vocab = Seq("a" -> -1000000L, "aa" -> -2000000L, "ab" -> -9000000L,
      "bc" -> -2000000L, "b" -> -4000000L, "c" -> -1500000L)
    val d = Seq(
      (1L, "aaa"),    // a|a|a, a|aa, aa|a all score -3e6 -> count 3
      (2L, "abc"),    // Viterbi a|bc = -3e6 beats greedy munch ab|c = -10.5e6
      (3L, "axa"),    // x uncovered -> forced UNK edge: -1e6 -7777777 -1e6
      (4L, "   ")).toDF("id", "t") // all-space text -> one empty word
    val got = d.select(col("id"),
        UnigramViterbi.segment(col("t"), vocab, -7777777L).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("-3000000:3"))
    assert(got(2L) == Seq("-3000000:1"))
    assert(got(3L) == Seq("-9777777:1"))
    assert(got(4L) == Seq("0:1"))
  }
}
