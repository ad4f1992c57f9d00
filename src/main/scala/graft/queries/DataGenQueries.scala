package graft.queries

import graft.QueryDef
import graft.datagen.DataGen
import org.apache.spark.sql.functions._

/** Datagen parity queries (SURVEY §2.6). Fixed parameters:
  * rows = 10000, n = 100 unique keys, s = 0.9 skew — small enough for
  * the oracle, shaped exactly like the reference's simulation sweeps
  * (unique_values = ~1% of rows here vs 10% in the thesis; the math is
  * parameter-independent). These queries ignore the sfDir: generation
  * is the operator under test.
  */
object DataGenQueries {

  /** Shared by sketch_kmv_distinct (batch KmvAgg) and
    * stream_kmv_distinct (transformWithState sketch state): lossless
    * min-wise merging makes the two engines produce the identical
    * bottom-64 set, so one window-rank replay verifies both. */
  private[queries] val kmvDistinctOracle: String =
    """WITH h AS (SELECT DISTINCT event_type,
      |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
      |  FROM events),
      |r AS (SELECT event_type, h,
      |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS nd
      |  FROM h)
      |SELECT event_type,
      |  CAST(CASE WHEN nd < 64 THEN nd
      |    ELSE (63 * 281474976710656) // h END AS BIGINT) AS est_distinct,
      |  CAST(least(nd, 64) AS BIGINT) AS sketch_size
      |FROM r WHERE rn = least(nd, 64)""".stripMargin

  private val zipfCdfCte =
    """WITH k AS (SELECT i + 1 AS k, pow(CAST(i + 1 AS DOUBLE), -0.9) AS w FROM range(100) t(i)),
      |c AS (SELECT k, sum(w) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM k),
      |c2 AS (SELECT k, cum, max(cum) OVER () AS tot FROM c),
      |b AS (SELECT k, greatest(CAST(0 AS BIGINT), CAST(floor(cum / tot * 10000.0 - 0.5) AS BIGINT) + 1) AS cumcnt FROM c2),
      |d AS (SELECT k, coalesce(lag(cumcnt) OVER (ORDER BY k), 0) AS off,
      |  cumcnt - coalesce(lag(cumcnt) OVER (ORDER BY k), 0) AS cnt FROM b)""".stripMargin

  /** Shared by datagen_heavy_hitters (batch MG + recount) and
    * stream_heavy_hitters (state-carried MG across micro-batches +
    * recount): both serve EXACTLY {key | freq·16 > 10000}, computed
    * here from the closed-form Zipf histogram. */
  private[queries] def heavyHittersOracle: String =
    s"""$zipfCdfCte
       |SELECT k AS key, cnt AS freq FROM d WHERE cnt * 16 > 10000""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // G1: the deterministic attribute pool itself
    QueryDef(
      "datagen_attr_pool",
      """SELECT i AS pool_idx,
        |  substr(repeat(md5('pool' || i), 1), 1, 20) AS attr1,
        |  substr(repeat(md5('pool' || i), 4), 1, 100) AS attr2,
        |  substr(repeat(md5('pool' || i), 3), 1, 80) AS attr3
        |FROM range(100) t(i)""".stripMargin) { (s, _) =>
      s.range(100).select(
        col("id").as("pool_idx"),
        DataGen.poolAttr(col("id"), 20).as("attr1"),
        DataGen.poolAttr(col("id"), 100).as("attr2"),
        DataGen.poolAttr(col("id"), 80).as("attr3"))
    },
    // G2: uniform key histogram
    QueryDef(
      "datagen_uniform_hist",
      """SELECT CAST(i % 100 AS BIGINT) AS key, count(*) AS n
        |FROM range(10000) t(i) GROUP BY 1""".stripMargin) { (s, _) =>
      DataGen.uniform(s, 10000, 100).groupBy("key").agg(count(lit(1)).as("n"))
    },
    // G3: Zipf quantile-sweep histogram
    QueryDef(
      "datagen_zipf_hist",
      s"""$zipfCdfCte
         |SELECT k AS key, cnt AS n FROM d WHERE cnt > 0""".stripMargin) { (s, _) =>
      DataGen.zipfCounts(s, 10000, 100, 0.9)
    },
    // G3/G4: the full generated Zipf table (rid order = the reference's
    // per-row inverse-CDF sweep order)
    QueryDef(
      "datagen_zipf_table",
      s"""$zipfCdfCte,
         |e AS (SELECT k, off, unnest(range(cnt)) AS g FROM d WHERE cnt > 0)
         |SELECT off + g AS rid, k AS key,
         |  substr(repeat(md5('pool' || ((off + g) % 100)), 1), 1, 20) AS attr1,
         |  substr(repeat(md5('pool' || ((off + g + 37) % 100)), 4), 1, 100) AS attr2,
         |  substr(repeat(md5('pool' || ((off + g + 71) % 100)), 3), 1, 80) AS attr3
         |FROM e""".stripMargin) { (s, _) =>
      DataGen.zipfTable(s, 10000, 100, 0.9)
    },
    // the reference's simulation workload in one query: unique-key left
    // table (pseudo-shuffled) ⋈ Zipf right table, per-key match counts
    QueryDef(
      "datagen_join_sim",
      s"""$zipfCdfCte,
         |e AS (SELECT k, off, unnest(range(cnt)) AS g FROM d WHERE cnt > 0),
         |rt AS (SELECT off + g AS rid, k AS key FROM e),
         |lt AS (SELECT i AS lrid, (i * 1000003) % 100 AS key FROM range(100) t(i))
         |SELECT lt.key AS key, lt.lrid AS left_rid, count(*) AS n_right
         |FROM lt JOIN rt ON lt.key = rt.key
         |GROUP BY lt.key, lt.lrid""".stripMargin) { (s, _) =>
      val lt = DataGen.uniqueShuffled(s, 100).select(col("rid").as("lrid"), col("key"))
      val rt = DataGen.zipfTable(s, 10000, 100, 0.9).select(col("key"))
      lt.join(rt, "key").groupBy(col("key"), col("lrid").as("left_rid"))
        .agg(count(lit(1)).as("n_right"))
        .select(col("key"), col("left_rid"), col("n_right"))
    },
    // the STRING-keyed generator arm (DataGenerator.java:50-52
    // KeyType.STRING — the last unported enum arm, VERDICT r5) driven
    // through the FULL reference lifecycle: string-keyed tables written
    // as positional CSV, joined by runCsvJoin's non-numeric key path
    // (key stays a string — no cast), per-key match counts recovered
    // from the `key TAB left,right` projection
    QueryDef(
      "datagen_string_keys",
      s"""$zipfCdfCte,
         |e AS (SELECT k, unnest(range(cnt)) AS g FROM d WHERE cnt > 0),
         |rt AS (SELECT 'k' || substr(md5('skey' || k), 1, 12) AS key FROM e),
         |lt AS (SELECT i AS left_rid,
         |    'k' || substr(md5('skey' || ((i * 1000003) % 100)), 1, 12) AS key
         |  FROM range(100) t(i))
         |SELECT lt.key AS key, lt.left_rid, count(*) AS n_right
         |FROM lt JOIN rt USING (key) GROUP BY 1, 2""".stripMargin) { (s, _) =>
      import graft.operators.Joins
      import graft.sources.Tables
      val dir = Tables.scratchDir("graft_strkeys")
      val lt = DataGen.uniqueShuffled(s, 100)
        .select(DataGen.stringKey(col("key")).as("key"), col("rid"))
      val rt = DataGen.zipfTable(s, 10000, 100, 0.9)
        .select(DataGen.stringKey(col("key")).as("key"), col("rid"))
      DataGen.writeCsvParts(lt, s"$dir/left", 2)
      DataGen.writeCsvParts(rt, s"$dir/right", 2)
      val out = Joins.runCsvJoin(s, graft.JoinConfig(
        left = s"$dir/left", right = s"$dir/right",
        leftKeyIdx = 0, rightKeyIdx = 0, numericKey = false))
      out.groupBy(col("key"),
          split(col("left_row"), ",").getItem(1).cast("long").as("left_rid"))
        .agg(count(lit(1)).as("n_right"))
    },
    // heavy-hitter detection over the Zipf workload: a one-pass
    // Misra-Gries summary (candidates) + exact candidate recount finds
    // the hot join keys (the ones that overflow a naive partition,
    // thesis §6.4) without ever shuffling the full key cardinality.
    // The guarantee makes the output EXACTLY {key | freq*16 > rows},
    // which the oracle computes from the closed-form histogram.
    QueryDef("datagen_heavy_hitters", heavyHittersOracle) { (s, _) =>
      graft.operators.HeavyHitters.heavyHitters(
        DataGen.zipfTable(s, 10000, 100, 0.9), col("key"), k = 16)
    },
    // count-min sketch build + probe: per-event-type CMS over user_id
    // (the builtin aggregate), probed with the custom CmsEstimate
    // Expression. The CMS guarantee is checked IN-ENGINE (estimate ≥
    // exact always; ≤ exact + ⌈εN⌉ at 99% confidence — deterministic
    // here: fixed data + fixed seed) and exported as a boolean the
    // oracle asserts TRUE, the agg_approx_distinct envelope pattern;
    // exact per-pair counts hash-match as normal columns.
    QueryDef(
      "sketch_count_min",
      """WITH exact AS (SELECT event_type, user_id, count(*) AS n_exact
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, user_id, n_exact, TRUE AS within_bound
        |FROM exact""".stripMargin) { (s, d) =>
      val ev = graft.sources.Tables.table(s, d, "events")
      val sk = ev.groupBy("event_type")
        .agg(count_min_sketch(col("user_id"), lit(0.001), lit(0.99), lit(42)).as("cms"),
          count(lit(1)).as("n_type"))
      val exact = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("n_exact"))
      exact.join(broadcast(sk), "event_type")
        .withColumn("est",
          graft.functions.CmsEstimate.estimate(col("cms"), col("user_id")))
        .select(col("event_type"), col("user_id"), col("n_exact"),
          (col("est") >= col("n_exact") &&
            col("est") <= col("n_exact") + ceil(lit(0.001) * col("n_type")).cast("long"))
            .as("within_bound"))
    },
    // HLL sketch ALGEBRA: per-(type, day) sketches unioned across days,
    // then estimated — the pre-aggregated distinct-count architecture
    // (store tiny daily sketches, answer any date-range distinct by
    // union, never rescan raw events). Envelope asserted in-engine vs
    // the exact distinct, exported as the oracle's TRUE boolean.
    QueryDef(
      "sketch_hll_union",
      """SELECT event_type, count(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = graft.sources.Tables.table(s, d, "events")
        .select(col("event_type"), col("user_id"),
          expr("ts div 1000 div 86400000000").as("day"))
      val daily = ev.groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val est = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(broadcast(est), Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          (col("n_est") * 100).between(col("n_exact") * 95, col("n_exact") * 105)
            .as("within_5pct"))
    },
    // KMV (k-minimum-values) distinct sketch: per-type bottom-64 of an
    // md5-derived 48-bit hash of user_id, estimate (k−1)·2⁴⁸/U₍ₖ₎
    // (Beyer et al., SIGMOD'07). Unlike the CMS/HLL rows this sketch
    // is a pure function of the input set, so the ESTIMATE ITSELF
    // hash-matches the oracle's window-rank replay — the stronger
    // correctness standard. O(k) state per partition, k rows shuffled
    // per group (KmvAgg), vs the oracle's full per-group sort.
    QueryDef("sketch_kmv_distinct", DataGenQueries.kmvDistinctOracle) { (s, d) =>
      val ev = graft.sources.Tables.table(s, d, "events")
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
      ev.select(col("event_type"), h.as("h"))
        .groupBy("event_type")
        .agg(graft.functions.KmvAgg.kmv(col("h"), 64).as("mins"))
        .select(col("event_type"),
          when(size(col("mins")) < 64, size(col("mins")).cast("long"))
            .otherwise(expr("17732923532771328 div element_at(mins, 64)"))
            .as("est_distinct"),
          size(col("mins")).cast("long").as("sketch_size"))
    },
    // KMV sketch ALGEBRA: audience-overlap (Jaccard) estimates between
    // every pair of event types from their bottom-64 sketches ALONE —
    // union sketch = k smallest of the two sketch unions, J ≈ |both ∩
    // union-k|/|union-k| (Beyer et al., SIGMOD'07) — next to the exact
    // Jaccard for reference. The pre-aggregated-sketch architecture:
    // store one tiny sketch per segment, answer any pairwise overlap
    // without rescanning raw events. Estimates are pure functions of
    // the input (md5 hashes, integer ppm arithmetic) — both columns
    // hash-match the oracle exactly.
    QueryDef(
      "sketch_kmv_jaccard",
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
        |t AS (SELECT DISTINCT event_type FROM events),
        |p AS (SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM t a JOIN t b ON a.event_type < b.event_type),
        |un AS (SELECT p.ta, p.tb, s.h FROM p
        |  JOIN sk s ON s.event_type = p.ta OR s.event_type = p.tb
        |  GROUP BY p.ta, p.tb, s.h),
        |ur AS (SELECT ta, tb, h,
        |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM un),
        |uk AS (SELECT ta, tb, h FROM ur WHERE rn <= 64),
        |cnt AS (SELECT uk.ta, uk.tb, count(*) AS k_union,
        |    sum(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL THEN 1 ELSE 0 END) AS n_both
        |  FROM uk
        |  LEFT JOIN sk sa ON sa.event_type = uk.ta AND sa.h = uk.h
        |  LEFT JOIN sk sb ON sb.event_type = uk.tb AND sb.h = uk.h
        |  GROUP BY uk.ta, uk.tb),
        |du AS (SELECT event_type, user_id FROM events GROUP BY 1, 2),
        |szs AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
        |inter AS (SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS ninter
        |  FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2),
        |ex AS (SELECT p.ta, p.tb, coalesce(i.ninter, 0) AS ninter,
        |    sa.n + sb.n - coalesce(i.ninter, 0) AS nunion
        |  FROM p LEFT JOIN inter i ON i.ta = p.ta AND i.tb = p.tb
        |  JOIN szs sa ON sa.event_type = p.ta
        |  JOIN szs sb ON sb.event_type = p.tb)
        |SELECT c.ta AS type_a, c.tb AS type_b,
        |  CAST(c.k_union AS BIGINT) AS k_union,
        |  CAST(c.n_both AS BIGINT) AS n_both,
        |  CAST((c.n_both * 1000000) // c.k_union AS BIGINT) AS est_jaccard_ppm,
        |  CAST((e.ninter * 1000000) // e.nunion AS BIGINT) AS exact_jaccard_ppm
        |FROM cnt c JOIN ex e ON e.ta = c.ta AND e.tb = c.tb""".stripMargin) { (s, d) =>
      val ev = graft.sources.Tables.table(s, d, "events")
      val h = conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
      val sk = ev.select(col("event_type"), h.as("h"))
        .groupBy("event_type")
        .agg(graft.functions.KmvAgg.kmv(col("h"), 64).as("mins"))
      val a = sk.select(col("event_type").as("type_a"), col("mins").as("ma"))
      val b = sk.select(col("event_type").as("type_b"), col("mins").as("mb"))
      // 5-row sketch table paired with itself under a theta filter —
      // bounded broadcast fan-out, the sketch-algebra serving shape
      val est = a.join(broadcast(b), col("type_a") < col("type_b"))
        .withColumn("u", slice(array_sort(array_union(col("ma"), col("mb"))), 1, 64))
        .select(col("type_a"), col("type_b"),
          size(col("u")).cast("long").as("k_union"),
          size(array_intersect(array_intersect(col("u"), col("ma")), col("mb")))
            .cast("long").as("n_both"))
        .withColumn("est_jaccard_ppm", expr("n_both * 1000000 div k_union"))
      val du = ev.select(col("event_type"), col("user_id")).distinct()
      val szs = du.groupBy("event_type").agg(count(lit(1)).as("n"))
      val inter = du.select(col("event_type").as("type_a"), col("user_id"))
        .join(du.select(col("event_type").as("type_b"), col("user_id")), "user_id")
        .where(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("ninter"))
      val exact = est.select(col("type_a"), col("type_b"))
        .join(inter, Seq("type_a", "type_b"), "left")
        .na.fill(0L, Seq("ninter"))
        .join(broadcast(szs.select(col("event_type").as("type_a"), col("n").as("na"))), "type_a")
        .join(broadcast(szs.select(col("event_type").as("type_b"), col("n").as("nb"))), "type_b")
        .withColumn("exact_jaccard_ppm",
          expr("ninter * 1000000 div (na + nb - ninter)"))
        .select(col("type_a"), col("type_b"), col("exact_jaccard_ppm"))
      est.join(exact, Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"), col("k_union"), col("n_both"),
          col("est_jaccard_ppm"), col("exact_jaccard_ppm"))
    },
    // G6: skew-capacity predictor (single scalar row)
    QueryDef(
      "datagen_max_repeats",
      """SELECT round(10000.0 / sum(pow(CAST(i + 1 AS DOUBLE), -0.9)), 6) AS max_repeats
        |FROM range(100) t(i)""".stripMargin) { (s, _) =>
      s.range(1).select(
        round(lit(DataGen.maxZipfRepeats(100, 0.9, 10000)), 6).as("max_repeats"))
    },
    // KMV sketch STORE lifecycle (operators.SketchStore): build per-type
    // sketches from half the events, persist, MERGE the other half into
    // the store (bottom-k of the union — lossless by the KMV merge
    // property), serve estimates from storage. The oracle is the SAME
    // full-data replay sketch_kmv_distinct uses: append-then-serve must
    // be bit-identical to a one-shot sketch of everything, which is the
    // whole point of a mergeable-sketch store (daily sketch + merge ≡
    // rescan, at |groups|·k cost instead of a data rescan).
    QueryDef("sketch_kmv_stored", DataGenQueries.kmvDistinctOracle) { (s, d) =>
      import graft.operators.SketchStore
      val ev = graft.sources.Tables.table(s, d, "events")
      val h = SketchStore.md5Hash48(col("user_id"))
      val path = graft.sources.Tables.scratchDir("graft_kmv_store")
      SketchStore.writeKmvSketches(
        ev.filter(col("event_id") % 2 === 0), col("event_type"), h, 64, path)
      SketchStore.appendToKmvSketches(path,
        ev.filter(col("event_id") % 2 === 1), col("event_type"), h)
      SketchStore.kmvEstimates(s.read.parquet(path))
        .withColumnRenamed("g", "event_type")
    }
  )
}
