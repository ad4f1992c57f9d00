package graft.queries

import graft.QueryDef
import graft.streaming.Streaming

/** Streaming queries, verified against batch SQL twins: for a finite
  * source drained with processAllAvailable, a correct streaming
  * aggregation must equal its batch equivalent — that equivalence IS the
  * oracle.
  */
object StreamingQueries {

  /** Shared by stream_session_custom (flatMapGroupsWithState) and
    * stream_session_timers (transformWithState V2 + explicit timers):
    * every non-final session (closed by a successor event) plus final
    * sessions whose last+gap the final watermark STRICTLY passed at ms
    * grain — the common emission contract of both custom engines. */
  private val customSessionOracle: String =
    """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |f AS (SELECT user_id, event_id, tus,
      |    CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM o),
      |g AS (SELECT user_id, event_id, tus,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM f),
      |agg AS (SELECT user_id, sid, min(tus) AS session_start_us,
      |    max(tus) AS last_us, count(*) AS n_events, min(event_id) AS first_event_id
      |  FROM g GROUP BY user_id, sid),
      |mx AS (SELECT user_id, max(sid) AS max_sid FROM agg GROUP BY user_id),
      |wm AS (SELECT max(epoch_us(ts)) // 1000 - 1800000 AS w FROM events)
      |SELECT agg.user_id, session_start_us, n_events, first_event_id
      |FROM agg JOIN mx ON mx.user_id = agg.user_id, wm
      |WHERE sid < max_sid OR (last_us // 1000) + 1800000 < wm.w""".stripMargin

  /** Unrolled beam-walk replay for stream_ann_graph_ingest — the
    * `ann_graph_append` INSERTION tier cut at k = 3: exact top-8
    * adjacency over the base two-thirds (vec_id % 3 <> 1), min-id
    * entry points per first-8-quantizer region of the base, every
    * delta vector's 4-round width-16 walk seeded from the 4 best
    * entries — integer-micro scores end to end, so the streamed sink
    * (slicing-independent by the walk's determinism) replays exactly.
    * Round CTEs MATERIALIZED like every graph oracle here. */
  private def streamAnnGraphOracle: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN badj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "bn.v", "bn.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN bn ON bn.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= 16)""".stripMargin
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
       |  FROM e),
       |bn AS (SELECT * FROM n WHERE vec_id % 3 <> 1),
       |bap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM bn a JOIN bn b ON a.vec_id <> b.vec_id),
       |badj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM bap) WHERE rk <= 8),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM bn WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM bn d CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn = 1),
       |ent AS MATERIALIZED (SELECT min(vec_id) AS vid FROM asg GROUP BY cid),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 3 = 1),
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT q.qid, bn.vec_id AS vid, ${sm("q.qv", "q.qn", "bn.v", "bn.nrm")} AS sm,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY ${sm("q.qv", "q.qn", "bn.v", "bn.nrm")} DESC, bn.vec_id) AS rk
       |  FROM q JOIN ent ON TRUE JOIN bn ON bn.vec_id = ent.vid
       |  WHERE bn.vec_id <> q.qid) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM f4) WHERE rk <= 3""".stripMargin
  }

  /** Shared by stream_window_append and stream_late_drop: emitted set =
    * windows finalized by the final watermark; the late-drop variant
    * must produce the SAME result because its replayed event is
    * dropped. */
  private val windowAppendOracle =
    """SELECT * FROM (
      |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
      |    event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1, 2)
      |WHERE window_start_us + 3600000000 <=
      |  (SELECT max(epoch_us(ts)) - 1800000000 FROM events)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    // stream-static enrichment: per-batch broadcast hash join against
    // the customer dim (stateless), stateful agg downstream
    QueryDef(
      "stream_enrich_static",
      """SELECT c_nationkey, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Streaming.streamEnrichStatic(s, d)
    },
    QueryDef(
      "stream_window_agg",
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Streaming.windowedAgg(s, d)
    },
    // append mode + watermark: emitted set = windows finalized by the
    // final watermark (max event time − 30 min) — deterministic, so the
    // oracle reproduces it with a scalar subquery. See
    // Streaming.windowedAggAppend for why this is the bounded-state
    // production shape.
    QueryDef("stream_window_append", windowAppendOracle) { (s, d) =>
      Streaming.windowedAggAppend(s, d)
    },
    // LATE-data drop: the fixture replays the corpus's earliest event
    // after the watermark has passed its window; the watermark drops it
    // (progress-asserted in SimStreamSpec), so the result equals the
    // append aggregation over the real events alone — same oracle as
    // stream_window_append
    QueryDef("stream_late_drop", windowAppendOracle) { (s, d) =>
      Streaming.windowedAggLateDrop(s, d)
    },
    // CHAINED stateful aggregations: hourly windows roll up into 4-hour
    // windows inside one streaming query (two state stores, SPARK-40925);
    // emitted set = 4h windows finalized by the final watermark
    QueryDef(
      "stream_chained_windows",
      """SELECT * FROM (
        |  SELECT (epoch_us(ts) // 14400000000) * 14400000000 AS window_start_us,
        |    event_type, count(*) AS n_events,
        |    count(DISTINCT epoch_us(ts) // 3600000000) AS n_hours
        |  FROM events GROUP BY 1, 2)
        |WHERE window_start_us + 14400000000 <=
        |  (SELECT max(epoch_us(ts)) - 1800000000 FROM events)""".stripMargin) { (s, d) =>
      Streaming.chainedWindowAgg(s, d)
    },
    // SLIDING windows in watermarked append mode: each event in two
    // 10-min windows; emitted set = windows finalized by the final
    // watermark (same determinism argument as stream_window_append;
    // batch events_sliding_rate pins the assignment arithmetic)
    QueryDef(
      "stream_sliding_append",
      """SELECT * FROM (
        |  WITH e AS (SELECT epoch_us(ts) AS tus, value FROM events),
        |  w AS (SELECT (tus // 300000000) * 300000000 - k * 300000000 AS wstart, value
        |    FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS k))
        |  SELECT wstart AS wstart_us, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM w GROUP BY wstart)
        |WHERE wstart_us + 600000000 <=
        |  (SELECT max(epoch_us(ts)) - 1800000000 FROM events)""".stripMargin) { (s, d) =>
      Streaming.slidingWindowAppend(s, d)
    },
    QueryDef(
      "stream_sessionize",
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |f AS (SELECT user_id, event_id, tus,
        |    CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |g AS (SELECT user_id, event_id, tus,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f)
        |SELECT user_id, min(tus) AS session_start_us, count(*) AS n_events,
        |  min(event_id) AS first_event_id
        |FROM g GROUP BY user_id, sid""".stripMargin) { (s, d) =>
      Streaming.sessionAgg(s, d)
    },
    // append mode + watermark session windows: emitted = sessions whose
    // end (last event + 30 min gap) the final watermark passed
    QueryDef(
      "stream_session_append",
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events),
        |f AS (SELECT user_id, event_id, tus,
        |    CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM o),
        |g AS (SELECT user_id, event_id, tus,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM f),
        |agg AS (SELECT user_id, min(tus) AS session_start_us,
        |    max(tus) AS session_last_us, count(*) AS n_events,
        |    min(event_id) AS first_event_id
        |  FROM g GROUP BY user_id, sid)
        |SELECT user_id, session_start_us, n_events, first_event_id
        |FROM agg
        |WHERE session_last_us + 1800000000 <=
        |  (SELECT max(epoch_us(ts)) - 1800000000 FROM events)""".stripMargin) { (s, d) =>
      Streaming.sessionAggAppend(s, d)
    },
    // flatMapGroupsWithState + event-time timeout: hand-rolled
    // sessionization. Emitted = every non-final session (closed by its
    // successor event) plus final sessions whose last+gap the final
    // watermark STRICTLY passed at ms grain (the timeout contract)
    QueryDef("stream_session_custom", customSessionOracle) { (s, d) =>
      Streaming.sessionizeCustomState(s, d)
    },
    // the same sessionizer on the transformWithState V2 API with
    // EXPLICIT event-time timers (stale timers deleted on every
    // session-extending batch) — identical emission contract, so the
    // two custom-state engines AND the oracle must agree row-for-row
    QueryDef("stream_session_timers", customSessionOracle) { (s, d) =>
      Streaming.transformWithStateSessions(s, d)
    },
    // checkpointed parquet file sink: exactly-once landing — read-back
    // aggregate equals the batch aggregate iff no row is lost/duplicated
    QueryDef(
      "stream_sink_parquet",
      """SELECT event_type, count(*) AS n, min(event_id) AS min_event
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Streaming.streamToParquetSink(s, d)
    },
    // Trigger.AvailableNow incremental batch: two real runs against one
    // checkpoint (slices A+B, then delta C); exactly-once across runs →
    // the read-back aggregate equals the batch aggregate over ALL events
    QueryDef(
      "stream_available_now",
      """SELECT event_type, count(*) AS n, min(event_id) AS min_event
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Streaming.streamAvailableNow(s, d)
    },
    QueryDef(
      "stream_dedup_state",
      """SELECT user_id, event_type, min(event_id) AS first_event_id, count(*) AS n
        |FROM events GROUP BY user_id, event_type""".stripMargin) { (s, d) =>
      Streaming.dedupState(s, d)
    },
    // dropDuplicatesWithinWatermark on the unique event_id: emitted =
    // every event exactly once; state bounded by the watermark (spec
    // asserts evictions)
    QueryDef(
      "stream_dedup_watermark",
      "SELECT event_id, user_id, event_type FROM events") { (s, d) =>
      Streaming.dedupWithinWatermark(s, d)
    },
    // stream-stream interval join (watermarks both sides, event-time
    // bound in the condition → bounded state, evictions spec-asserted);
    // inner join over an in-order arrival emits the full batch result
    QueryDef(
      "stream_stream_join",
      """SELECT l.user_id, l.event_id AS view_event, r.event_id AS click_event,
        |  epoch_us(r.ts) - epoch_us(l.ts) AS delta_us
        |FROM events l JOIN events r
        |ON l.user_id = r.user_id AND l.event_type = 'view' AND r.event_type = 'click'
        |  AND epoch_us(r.ts) >= epoch_us(l.ts)
        |  AND epoch_us(r.ts) <= epoch_us(l.ts) + 86400000000""".stripMargin) { (s, d) =>
      Streaming.streamStreamIntervalJoin(s, d)
    },
    // LEFT OUTER stream-stream interval join: inner matches plus
    // null-padded unmatched views. The fixture's flush row advances the
    // final watermark past every view's 24 h window, so every unmatched
    // view emits — Streaming.streamStreamLeftJoin
    QueryDef(
      "stream_stream_left_join",
      """WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'),
        |m AS (SELECT v.user_id, v.event_id AS view_event, c.event_id AS click_event,
        |    c.t - v.t AS delta_us
        |  FROM v JOIN c ON v.user_id = c.user_id AND c.t >= v.t AND c.t <= v.t + 86400000000)
        |SELECT user_id, view_event, click_event, delta_us FROM m
        |UNION ALL
        |SELECT v.user_id, v.event_id AS view_event, NULL AS click_event, NULL AS delta_us
        |FROM v
        |WHERE NOT EXISTS (SELECT 1 FROM c
        |    WHERE c.user_id = v.user_id AND c.t >= v.t AND c.t <= v.t + 86400000000)""".stripMargin) { (s, d) =>
      Streaming.streamStreamLeftJoin(s, d)
    },
    QueryDef(
      "stream_user_counter",
      "SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id") { (s, d) =>
      Streaming.statefulUserCounter(s, d)
    },
    // sketch-in-stream-state: a KMV bottom-64 distinct sketch per
    // event type maintained in transformWithState ValueState — min-wise
    // state is lossless, so the streamed estimate equals the batch
    // KmvAgg's exactly (shared oracle with sketch_kmv_distinct)
    QueryDef("stream_kmv_distinct", DataGenQueries.kmvDistinctOracle) { (s, d) =>
      Streaming.streamKmvDistinct(s, d)
    },
    // streaming Misra–Gries heavy hitters (Streaming.streamHeavyHitters
    // — VERDICT r7 #6): the MG sketch folded forward in
    // transformWithState state across a 4-slice arrival, final
    // candidates recounted exactly — streamed ≡ batch
    // (datagen_heavy_hitters), one shared closed-form oracle.
    QueryDef("stream_heavy_hitters", DataGenQueries.heavyHittersOracle) { (s, _) =>
      Streaming.streamHeavyHitters(s)
    },
    // Spark 4 transformWithState (arbitrary-state V2, RocksDB-backed):
    // per-user (count, Σ integer cents, max event id) in one typed
    // ValueState — order-free accumulators, batch-replayable oracle
    QueryDef(
      "stream_transform_with_state",
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  max(event_id) AS max_event_id
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      Streaming.transformWithStateStats(s, d)
    },
    // foreachBatch CDC apply: per-batch upsert-merge into a versioned
    // parquet snapshot (tombstones override, write-then-swap). Final
    // state = the batch latest-snapshot query, independent of slicing.
    QueryDef(
      "stream_upsert_sink",
      """WITH ch AS (
        |  SELECT user_id AS key, event_id AS seq,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type AS attr, value AS amount
        |  FROM events),
        |ranked AS (
        |  SELECT key, seq, op, attr, amount,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |  FROM ch)
        |SELECT key, seq AS last_seq, attr AS last_event, amount AS last_value
        |FROM ranked WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, d) =>
      Streaming.streamUpsertSink(s, d)
    },
    // streaming ingest near-dup gate: delta docs arrive in 4 slices and
    // are checked per micro-batch against the cached static MinHash
    // index (foreachBatch; Streaming.streamLshIngest). Verdicts are
    // slicing-independent, so the oracle is the batch incremental form.
    QueryDef(
      "stream_dedup_lsh",
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(w) - 1),
        |                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
        |  FROM t WHERE len(w) >= 3),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s
        |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0 GROUP BY 1, 2)
        |SELECT da AS new_doc, db AS dup_of,
        |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8""".stripMargin) { (s, d) =>
      Streaming.streamLshIngest(s, d)
    },
    // streaming ANN ingest gate (stream_dedup_lsh's vector twin):
    // delta embeddings arrive in 2 slices and probe the STORED IVF
    // index (corpus two-thirds, first-8 centroids) per micro-batch for
    // their top-3 stored neighbors via partition-pruned foreachBatch.
    // Verdicts are slicing-independent, so the oracle is the batch IVF
    // query over all delta vectors at once.
    QueryDef(
      "stream_ann_ingest",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
        |  FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
        |asg0 AS (SELECT n.vec_id AS vid, n.v, n.nrm, c.cid,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(n.v) + 1), i -> n.v[i] * c.cv[i])), (x, y) -> x + y) / (n.nrm * c.cn) AS ccos
        |  FROM n CROSS JOIN c WHERE n.vec_id % 3 <> 1),
        |asg AS (SELECT vid, v, nrm, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS crn FROM asg0) WHERE crn = 1),
        |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 3 = 1),
        |pr0 AS (SELECT q.qid, q.qv, q.qn, c.cid,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])), (x, y) -> x + y) / (q.qn * c.cn) AS qcos
        |  FROM q CROSS JOIN c),
        |pr AS (SELECT qid, qv, qn, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= 2),
        |sc AS (SELECT pr.qid, asg.vid,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(pr.qv) + 1), i -> pr.qv[i] * asg.v[i])), (x, y) -> x + y) / (pr.qn * asg.nrm) AS cos
        |  FROM pr JOIN asg USING (cid) WHERE asg.vid <> pr.qid),
        |r AS (SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM sc)
        |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos
        |FROM r WHERE rnk <= 3""".stripMargin) { (s, d) =>
      Streaming.streamAnnIngest(s, d).withColumnRenamed("rank", "rnk")
    },
    // streaming GRAPH-ANN ingest gate (VERDICT r10 #7 —
    // stream_ann_ingest's graph-tier twin): delta embeddings arrive in
    // 2 slices and BEAM-SEARCH the stored base graph (exact top-8
    // adjacency over the two-thirds, min-id region entries — the
    // ann_graph_append pristine layout) per micro-batch for their
    // top-3 stored neighbors, without mutating the store. Integer-
    // micros walk decisions are slicing-independent, so the oracle is
    // the unrolled insertion-walk replay over all deltas at once —
    // the graphAppendOracle first tier cut at k = 3.
    QueryDef("stream_ann_graph_ingest", streamAnnGraphOracle) { (s, d) =>
      Streaming.streamAnnGraphIngest(s, d)
    },
    // incremental view maintenance: the snapshot's grouped rollup
    // (per last-attr: live keys + exact-decimal total) maintained from
    // per-key deltas — per-batch work is O(changed keys), never a
    // snapshot recompute; final state equals the batch query below
    QueryDef(
      "stream_incremental_agg",
      """WITH ch AS (
        |  SELECT user_id AS key, event_id AS seq,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    event_type AS attr, value AS amount
        |  FROM events),
        |ranked AS (
        |  SELECT key, seq, op, attr, amount,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |  FROM ch)
        |SELECT attr, count(*) AS n_keys,
        |  CAST(sum(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |GROUP BY attr""".stripMargin) { (s, d) =>
      Streaming.streamIncrementalAgg(s, d)
    }
  )
}
