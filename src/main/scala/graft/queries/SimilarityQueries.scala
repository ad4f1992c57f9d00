package graft.queries

import graft.QueryDef
import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Similarity-search and multimodal queries. Query set = every 50th
  * vector; k = 5. Both the exact and IVF variants are deterministic and
  * fully SQL-reproducible (cosines use the shared sequential fold; every
  * ranking has a unique tie-break).
  */
object SimilarityQueries {

  // DuckDB fold helpers, spelled out per use (oracle SQL must be one
  // self-contained statement; norms are precomputed once in CTE `n`)
  private val normCte =
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
      |  FROM e)""".stripMargin

  /** Shared by ann_ivf (in-memory) and ann_ivf_stored (storage-served):
    * seed centroids vec_id < 8, top-5 — the serving paths are
    * value-identical by contract. Parameterized by probe depth and an
    * optional candidate predicate (`ann_ivf_filtered`: the filter
    * composes into the candidate scan before the rank, exactly where
    * `Similarity.topKIvfStored` applies `keep`). */
  private def ivfOracleWith(nProbe: Int, candFilter: String): String =
    s"""$normCte,
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT n.vec_id AS vid, n.v, n.nrm, c.cid,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(n.v) + 1), i -> n.v[i] * c.cv[i])), (x, y) -> x + y) / (n.nrm * c.cn) AS ccos
       |  FROM n CROSS JOIN c),
       |asg AS (SELECT vid, v, nrm, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS crn FROM asg0) WHERE crn = 1),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |pr0 AS (SELECT q.qid, q.qv, q.qn, c.cid,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])), (x, y) -> x + y) / (q.qn * c.cn) AS qcos
       |  FROM q CROSS JOIN c),
       |pr AS (SELECT qid, qv, qn, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= $nProbe),
       |sc AS (SELECT pr.qid, asg.vid,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(pr.qv) + 1), i -> pr.qv[i] * asg.v[i])), (x, y) -> x + y) / (pr.qn * asg.nrm) AS cos
       |  FROM pr JOIN asg USING (cid) WHERE asg.vid <> pr.qid$candFilter),
       |r AS (SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM sc)
       |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos
       |FROM r WHERE rnk <= 5""".stripMargin

  private val ivfOracle: String = ivfOracleWith(2, "")

  /** ann_ivf_kmeans oracle: Lloyd's algorithm UNROLLED — 2 spherical
    * k-means iterations from the first-8 seed (assignment by max
    * cosine with the shared sequential fold, per-(cluster, dim) means
    * accumulated in DECIMAL(28,12) before ONE double division — the
    * exact arithmetic `Similarity.kmeansCentroids` commits to), then
    * the standard IVF probe/top-k against the TRAINED centroids. A
    * cluster that loses every point keeps its previous center (LEFT
    * JOIN + coalesce, mirroring the engine's map-merge). */
  private val kmeansIvfOracle: String = {
    // one Scala builder emits each iteration's four CTEs — the oracle
    // stays a single self-contained SQL string, and both iterations
    // are guaranteed textually identical up to naming
    def fold(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def iter(cin: String, k: Int): String = {
      val (g, s, m, v, cout) = (s"g$k", s"s$k", s"m$k", s"v$k", s"c${k + 1}")
      s"""$g AS (SELECT n.vec_id AS vid, n.v, $cin.cid,
         |  ${fold("n.v", s"$cin.cv")} / (n.nrm * $cin.cn) AS ccos
         |  FROM n CROSS JOIN $cin),
         |$s AS (SELECT vid, v, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS rn FROM $g) WHERE rn = 1),
         |$m AS (SELECT cid, dim, CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
         |  FROM (SELECT cid, unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM $s) GROUP BY cid, dim),
         |$v AS (SELECT cid, list(m ORDER BY dim) AS mv FROM $m GROUP BY cid),
         |$cout AS (SELECT $cin.cid, coalesce($v.mv, $cin.cv) AS cv,
         |  sqrt(${fold(s"coalesce($v.mv, $cin.cv)", s"coalesce($v.mv, $cin.cv)")}) AS cn
         |  FROM $cin LEFT JOIN $v ON $cin.cid = $v.cid)""".stripMargin
    }
    s"""$normCte,
       |c1 AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |${iter("c1", 1)},
       |${iter("c2", 2)},
       |asg0 AS (SELECT n.vec_id AS vid, n.v, n.nrm, c3.cid,
       |  ${fold("n.v", "c3.cv")} / (n.nrm * c3.cn) AS ccos
       |  FROM n CROSS JOIN c3),
       |asg AS (SELECT vid, v, nrm, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS crn FROM asg0) WHERE crn = 1),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |pr0 AS (SELECT q.qid, q.qv, q.qn, c3.cid,
       |  ${fold("q.qv", "c3.cv")} / (q.qn * c3.cn) AS qcos
       |  FROM q CROSS JOIN c3),
       |pr AS (SELECT qid, qv, qn, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= 2),
       |sc AS (SELECT pr.qid, asg.vid,
       |  ${fold("pr.qv", "asg.v")} / (pr.qn * asg.nrm) AS cos
       |  FROM pr JOIN asg USING (cid) WHERE asg.vid <> pr.qid),
       |r AS (SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM sc)
       |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos
       |FROM r WHERE rnk <= 5""".stripMargin
  }

  /** ann_ivfpq_stored oracle: the ivfOracle probe/assignment CTEs
    * composed with the ann_pq_adc encode/LUT CTEs, an ADC shortlist of
    * 15, and an exact-cosine re-rank — the full IVFPQ+rerank serving
    * semantics replayed relationally. The candidate predicate composes
    * BEFORE the ADC scan (`ann_ivfpq_filtered`), exactly where
    * `Similarity.topKIvfPqStored` applies `keep`. */
  private def ivfPqOracleWith(candFilter: String): String =
    s"""$normCte,
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT n.vec_id AS vid, n.v, n.nrm, c.cid,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(n.v) + 1), i -> n.v[i] * c.cv[i])), (x, y) -> x + y) / (n.nrm * c.cn) AS ccos
       |  FROM n CROSS JOIN c),
       |asg AS (SELECT vid, v, nrm, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS crn FROM asg0) WHERE crn = 1),
       |sub AS (SELECT vec_id, CAST(u.i AS BIGINT) AS m, v[(u.i*8+1):(u.i*8+8)] AS sv
       |  FROM e, unnest(range(8)) AS u(i)),
       |cb AS (SELECT m, vec_id AS code, sv AS cbv FROM sub WHERE vec_id < 8),
       |enc0 AS (SELECT s.vec_id AS vid, s.m, c.code,
       |    list_reduce(list_prepend(0.0, list_transform(range(1, 9), i -> (s.sv[i]-c.cbv[i])*(s.sv[i]-c.cbv[i]))), (x, y) -> x + y) AS l2
       |  FROM sub s JOIN cb c USING (m)),
       |enc AS (SELECT vid, m, code FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vid, m ORDER BY l2, code) AS rn FROM enc0) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |pr0 AS (SELECT q.qid, c.cid,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])), (x, y) -> x + y) / (q.qn * c.cn) AS qcos
       |  FROM q CROSS JOIN c),
       |pr AS (SELECT qid, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= 2),
       |lut AS (SELECT s.vec_id AS qid, s.m, c.code,
       |    CAST(round(list_reduce(list_prepend(0.0, list_transform(range(1, 9), i -> s.sv[i]*c.cbv[i])), (x, y) -> x + y) * 1000000, 0) AS BIGINT) AS dm
       |  FROM sub s JOIN cb c USING (m) WHERE s.vec_id % 50 = 0),
       |adc AS (SELECT pr.qid, asg.vid, CAST(sum(l.dm) AS BIGINT) AS score_micros
       |  FROM pr JOIN asg USING (cid)
       |  JOIN enc ON enc.vid = asg.vid
       |  JOIN lut l ON l.qid = pr.qid AND l.m = enc.m AND l.code = enc.code
       |  WHERE asg.vid <> pr.qid$candFilter GROUP BY 1, 2),
       |sl AS (SELECT qid, vid, score_micros FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score_micros DESC, vid) AS srn FROM adc) WHERE srn <= 15),
       |ex AS (SELECT sl.qid, sl.vid, sl.score_micros,
       |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.v[i])), (x, y) -> x + y) / (q.qn * n.nrm) AS cos
       |  FROM sl JOIN q ON q.qid = sl.qid JOIN n ON n.vec_id = sl.vid),
       |r AS (SELECT qid, vid, cos, score_micros,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM ex)
       |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos, score_micros
       |FROM r WHERE rnk <= 5""".stripMargin

  private val ivfPqOracle: String = ivfPqOracleWith("")

  /** ann_matryoshka oracle: per prefix length d, brute-force top-5
    * over v[1:d] joined against full-dim ground truth; recall in exact
    * integer ppm. One Scala builder per arm keeps the arms textually
    * identical. */
  private val matryoshkaOracle: String = {
    def fold(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    val dims = Seq(16, 32, 64)
    def arm(d: Int): String =
      s"""m$d AS (SELECT vec_id, v[1:$d] AS vd,
         |  sqrt(${fold(s"v[1:$d]", s"v[1:$d]")}) AS nr FROM e),
         |q$d AS (SELECT vec_id AS qid, vd AS qv, nr AS qn FROM m$d WHERE vec_id % 50 = 0),
         |p$d AS (SELECT q$d.qid, m$d.vec_id AS nid,
         |  ${fold(s"q$d.qv", s"m$d.vd")} / (q$d.qn * m$d.nr) AS cos
         |  FROM q$d JOIN m$d ON m$d.vec_id <> q$d.qid),
         |r$d AS (SELECT qid, nid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM p$d) WHERE rnk <= 5),
         |h$d AS (SELECT count(*) AS hits FROM r$d JOIN gt ON gt.qid = r$d.qid AND gt.nid = r$d.nid)""".stripMargin
    def out(d: Int): String =
      s"SELECT CAST($d AS INT) AS dims, CAST(hits * 1000000 // (5 * nq) AS BIGINT) AS recall_ppm, CAST(nq AS BIGINT) AS n_queries FROM h$d CROSS JOIN nqc"
    s"""$normCte,
       |qf AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |pf AS (SELECT qf.qid, n.vec_id AS nid,
       |  ${fold("qf.qv", "n.v")} / (qf.qn * n.nrm) AS cos
       |  FROM qf JOIN n ON n.vec_id <> qf.qid),
       |gt AS (SELECT qid, nid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM pf) WHERE rnk <= 5),
       |nqc AS (SELECT count(*) AS nq FROM qf),
       |${dims.map(arm).mkString(",\n")}
       |${dims.map(out).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Unrolled beam-walk replay for ann_graph_beam (and, at
    * `entPerRegion` = 2, ann_graph_beam_multi): exact global top-8
    * adjacency, the `entPerRegion` SMALLEST-id entry points per
    * quantizer region ([[Similarity.regionEntryPoints]]'s rule — one
    * SQL window; entPerRegion = 1 ≡ the historical min-id entries),
    * 4-entry seed beam, 4 expand rounds at width 16 — integer-micro
    * scores end to end, so each round's keep-set is exact. Round CTEs
    * are MATERIALIZED (the unigram-EM lesson: multiply-referenced CTEs
    * otherwise re-inline the whole upstream chain multiplicatively). */
  private def graphBeamOracle(entPerRegion: Int = 1): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN adj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= 16)""".stripMargin
    s"""$normCte,
       |ap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       |adj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM ap) WHERE rk <= 8),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM n d CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn = 1),
       |ent AS (SELECT vec_id AS vid FROM (
       |  SELECT vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS ern
       |  FROM asg) WHERE ern <= $entPerRegion),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT q.qid, n.vec_id AS vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY ${sm("q.qv", "q.qn", "n.v", "n.nrm")} DESC, n.vec_id) AS rk
       |  FROM q JOIN ent ON TRUE JOIN n ON n.vec_id = ent.vid
       |  WHERE n.vec_id <> q.qid) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM f4) WHERE rk <= 5""".stripMargin
  }

  /** Unrolled replay for ann_graph_beam_hier — the COARSE ENTRY-GRAPH
    * serve: the 2-entries-per-region tier's exact k=4 kNN graph among
    * entries (`eadj`, (cos DESC, dst) — knnGraphExact's rule), walked
    * task-locally from the 2 smallest-id roots for 2 rounds at width
    * 8 with EXACTLY the main walk's round semantics (candidates =
    * unvisited beam neighbors, keep top-width by (micros DESC, vid)),
    * then the final entry beam's top-4 seed the ordinary 4-round
    * width-16 main walk. Both walks integer-micros; every
    * multiply-referenced CTE MATERIALIZED. */
  private def graphHierOracle: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN adj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= 16)""".stripMargin
    def eround(r: Int): String =
      s"""ecand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM ef${r - 1} f JOIN eadj a ON a.src = f.vid
         |  WHERE NOT EXISTS (SELECT 1 FROM ef${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |esc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM ecand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |ef$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM ef${r - 1} UNION ALL SELECT * FROM esc$r)) WHERE rk <= 8)""".stripMargin
    s"""$normCte,
       |ap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       |adj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM ap) WHERE rk <= 8),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM n d CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn = 1),
       |ent AS (SELECT vec_id AS vid FROM (
       |  SELECT vec_id, row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS ern
       |  FROM asg) WHERE ern <= 2),
       |entv AS (SELECT ent.vid, n.v, n.nrm FROM ent JOIN n ON n.vec_id = ent.vid),
       |eap AS (SELECT a.vid AS src, b.vid AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM entv a JOIN entv b ON a.vid <> b.vid),
       |ech0 AS (SELECT vid, lead(vid) OVER (ORDER BY vid) AS nxt FROM ent),
       |ech AS (SELECT vid AS src, nxt AS dst FROM ech0 WHERE nxt IS NOT NULL
       |  UNION ALL SELECT nxt AS src, vid AS dst FROM ech0 WHERE nxt IS NOT NULL),
       |eadj AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM eap) WHERE rk <= 4
       |  UNION ALL SELECT src, dst FROM ech)),
       |roots AS (SELECT vid FROM ent ORDER BY vid LIMIT 2),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |ef0 AS MATERIALIZED (SELECT q.qid, n.vec_id AS vid,
       |    ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
       |  FROM q JOIN roots ON TRUE JOIN n ON n.vec_id = roots.vid),
       |${eround(1)},
       |${eround(2)},
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM ef2 WHERE vid <> qid) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM f4) WHERE rk <= 5""".stripMargin
  }

  /** Unrolled replay for ann_graph_filtered: the SAME walk as
    * graphBeamOracle (navigation is unfiltered), but the answer is the
    * top-5 by (micros DESC, vid) over the UNION of every scored set —
    * the all-entry seed scores plus each round's newly-scored
    * candidates — restricted to even ids. UNION de-duplicates exactly
    * like the engine's accumulator distinct (a beam-evicted node can
    * be re-scored in a later round). */
  private def graphFilteredOracle: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN adj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS MATERIALIZED (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= 16)""".stripMargin
    s"""$normCte,
       |ap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       |adj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM ap) WHERE rk <= 8),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM n d CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn = 1),
       |ent AS (SELECT min(vec_id) AS vid FROM asg GROUP BY cid),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |e0s AS MATERIALIZED (SELECT q.qid, n.vec_id AS vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
       |  FROM q JOIN ent ON TRUE JOIN n ON n.vec_id = ent.vid
       |  WHERE n.vec_id <> q.qid),
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM e0s) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)},
       |allsc AS (SELECT qid, vid, sm FROM e0s
       |  UNION SELECT qid, vid, sm FROM sc1
       |  UNION SELECT qid, vid, sm FROM sc2
       |  UNION SELECT qid, vid, sm FROM sc3
       |  UNION SELECT qid, vid, sm FROM sc4)
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM allsc WHERE vid % 2 = 0) WHERE rk <= 5""".stripMargin
  }

  /** Unrolled replay for ann_graph_filtered_rare — the SAME walk shape
    * with a 10%-selective filter and ADAPTIVE WIDENING (VERDICT r9 #2,
    * ACORN posture): the effective beam width is 16 · min(4,
    * ceil(entries / matchingEntries)), estimated from the entry-scored
    * sample — integer arithmetic on two counts, computed in the `wf`
    * CTE and applied to every round's rank cut via a scalar subquery.
    * The answer is the top-5 by (micros DESC, vid) over the union of
    * every scored set restricted to vid % 10 = 0; a query whose walk
    * scored fewer than 5 matches returns exactly those rows (the
    * shortfall contract). */
  private def graphFilteredRareOracle: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN adj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS MATERIALIZED (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= (SELECT w FROM wf))""".stripMargin
    s"""$normCte,
       |ap AS (SELECT a.vec_id AS src, b.vec_id AS dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM n a JOIN n b ON a.vec_id <> b.vec_id),
       |adj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM ap) WHERE rk <= 8),
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM n d CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn = 1),
       |ent AS (SELECT min(vec_id) AS vid FROM asg GROUP BY cid),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |e0s AS MATERIALIZED (SELECT q.qid, n.vec_id AS vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
       |  FROM q JOIN ent ON TRUE JOIN n ON n.vec_id = ent.vid
       |  WHERE n.vec_id <> q.qid),
       |wf AS MATERIALIZED (SELECT CASE WHEN m = 0 THEN 16 * 4
       |    ELSE 16 * least(4, (t + m - 1) // m) END AS w
       |  FROM (SELECT count(*) AS t,
       |      count(CASE WHEN vid % 10 = 0 THEN 1 END) AS m FROM e0s)),
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM e0s) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)},
       |allsc AS (SELECT qid, vid, sm FROM e0s
       |  UNION SELECT qid, vid, sm FROM sc1
       |  UNION SELECT qid, vid, sm FROM sc2
       |  UNION SELECT qid, vid, sm FROM sc3
       |  UNION SELECT qid, vid, sm FROM sc4)
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM allsc WHERE vid % 10 = 0) WHERE rk <= 5""".stripMargin
  }

  /** Unrolled replay for ann_graph_refine (VERDICT r9 #1): the
    * SCALABLE construction path — blocked exact kNN over MULTI-probe-2
    * first-8 IVF-quantizer cells (overlapping blocks: pairs share at
    * least one of each side's two cells, DISTINCT so a doubly-shared
    * pair holds one rank slot) — followed by ONE NN-Descent refinement
    * round: candidates from neighbor-of-neighbor over the SYMMETRIZED
    * blocked adjacency, exact-cosine scored, each node keeping its 8
    * best edges from (existing ∪ candidates) in (cos DESC, dst) order;
    * then the standard 4-round serve walk over the REFINED graph.
    * Every stage is exact arithmetic (raw-double cosine folds shared
    * with the engine, integer-micro beam), so the whole
    * build→refine→serve pipeline replays relationally. */
  private def graphRefineOracle: String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    def round(r: Int): String =
      s"""cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM f${r - 1} f JOIN radj a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |sc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM cand$r c JOIN q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM f${r - 1} UNION ALL SELECT * FROM sc$r)) WHERE rk <= 16)""".stripMargin
    s"""$normCte,
       |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
       |asg0 AS (SELECT d.vec_id, c.cid,
       |  ${fold("d.v", "c.cv")} / (d.nrm * c.cn) AS ccos
       |  FROM n d CROSS JOIN c),
       |asgr AS MATERIALIZED (SELECT vec_id, cid, crn FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS crn
       |  FROM asg0) WHERE crn <= 2),
       |asg AS (SELECT vec_id, cid FROM asgr WHERE crn = 1),
       |bp AS (SELECT DISTINCT sa.vec_id AS src, sb.vec_id AS dst
       |  FROM asgr sa JOIN asgr sb ON sb.cid = sa.cid
       |  WHERE sa.vec_id <> sb.vec_id),
       |bap AS (SELECT bp.src, bp.dst,
       |  ${fold("a.v", "b.v")} / (a.nrm * b.nrm) AS cos
       |  FROM bp JOIN n a ON a.vec_id = bp.src JOIN n b ON b.vec_id = bp.dst),
       |badj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM bap) WHERE rk <= 8),
       |sym AS MATERIALIZED (SELECT src, dst FROM badj UNION SELECT dst, src FROM badj),
       |cand AS (SELECT src, dst FROM badj
       |  UNION SELECT a.src, b.dst FROM sym a JOIN sym b ON a.dst = b.src
       |  WHERE a.src <> b.dst),
       |rsc AS (SELECT cd.src, cd.dst,
       |  ${fold("s.v", "t.v")} / (s.nrm * t.nrm) AS cos
       |  FROM cand cd JOIN n s ON s.vec_id = cd.src JOIN n t ON t.vec_id = cd.dst),
       |radj AS MATERIALIZED (SELECT src, dst FROM (
       |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk FROM rsc) WHERE rk <= 8),
       |ent AS (SELECT min(vec_id) AS vid FROM asg GROUP BY cid),
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT q.qid, n.vec_id AS vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY ${sm("q.qv", "q.qn", "n.v", "n.nrm")} DESC, n.vec_id) AS rk
       |  FROM q JOIN ent ON TRUE JOIN n ON n.vec_id = ent.vid
       |  WHERE n.vec_id <> q.qid) WHERE rk <= 4),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM f4) WHERE rk <= 5""".stripMargin
  }

  /** Unrolled replay for ann_graph_append / ann_graph_prune — two
    * chained beam tiers: (1) every delta node's INSERTION walk over
    * the pristine base graph (top-8 of the final beam = its forward
    * edges) — REGION-seeded since r12 (VERDICT r11 #1): the delta is
    * assigned to its nearest stored centroid (ccos DESC, cid — the
    * assignNearest tie-break) and seeds only from its own region's
    * entries, replayed by the `dasg`/`if0` CTEs; (2) the serve walk
    * over the GROWN graph (base ∪ forward ∪ reverse edges), still
    * all-entries-seeded. With `prune` the grown adjacency is first
    * degree-bounded: per src, keep the 8 best edges by exact raw
    * cosine (cos DESC, dst — Similarity.pruneKnnGraphIndex's order;
    * under-cap nodes keep everything, so the universal top-8 here
    * equals the engine's hot-bucket-only rewrite), and the serve walk
    * runs over the pruned graph. Same integer-micros arithmetic as
    * graphBeamOracle; every multiply-referenced CTE MATERIALIZED. */
  private def graphAppendOracle: String = graphGrownOracle(prune = false)

  private def graphPruneOracle: String = graphGrownOracle(prune = true)

  /** ann_graph_entry_refresh: the append tier unchanged, then the
    * ENTRY-TIER refresh (Similarity.refreshKnnGraphEntries, budget
    * tripped at 50% insert volume) re-samples perRegion=2 entries
    * EPOCH-AWARE over the grown corpus — per region the smallest AND
    * largest member vid (`entR`: two row_number windows over the full
    * assignment, union DISTINCT) — and the serve walk seeds from the
    * refreshed tier. */
  private def graphEntryRefreshOracle: String =
    graphGrownOracle(prune = false, entryRefresh = true)

  private def graphGrownOracle(prune: Boolean,
      entryRefresh: Boolean = false): String = {
    def fold(a: String, b: String) =
      s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"
    def sm(qv: String, qn: String, v: String, nrm: String) =
      s"CAST(round(${fold(qv, v)} / ($qn * $nrm) * 1000000, 0) AS BIGINT)"
    // one beam round: expand pfx-f(r-1) through adjRel, score new
    // candidates for qRel's queries against the full vector table n,
    // keep the best 16
    def round(pfx: String, r: Int, adjRel: String, qRel: String): String =
      s"""${pfx}cand$r AS (SELECT DISTINCT f.qid, a.dst AS vid
         |  FROM ${pfx}f${r - 1} f JOIN $adjRel a ON a.src = f.vid
         |  WHERE a.dst <> f.qid
         |    AND NOT EXISTS (SELECT 1 FROM ${pfx}f${r - 1} x WHERE x.qid = f.qid AND x.vid = a.dst)),
         |${pfx}sc$r AS (SELECT c.qid, c.vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm
         |  FROM ${pfx}cand$r c JOIN $qRel q ON q.qid = c.qid JOIN n ON n.vec_id = c.vid),
         |${pfx}f$r AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
         |  FROM (SELECT * FROM ${pfx}f${r - 1} UNION ALL SELECT * FROM ${pfx}sc$r)) WHERE rk <= 16)""".stripMargin
    def seed(pfx: String, qRel: String, entRel: String = "ent"): String =
      s"""${pfx}f0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
         |  SELECT q.qid, n.vec_id AS vid, ${sm("q.qv", "q.qn", "n.v", "n.nrm")} AS sm,
         |    row_number() OVER (PARTITION BY q.qid ORDER BY ${sm("q.qv", "q.qn", "n.v", "n.nrm")} DESC, n.vec_id) AS rk
         |  FROM $qRel q JOIN $entRel e2 ON TRUE JOIN n ON n.vec_id = e2.vid
         |  WHERE n.vec_id <> q.qid) WHERE rk <= 4)""".stripMargin
    s"""$normCte,
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
       |ent AS MATERIALIZED (SELECT cid, min(vec_id) AS vid FROM asg GROUP BY cid),
       |dq AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 3 = 1),
       |dasg AS MATERIALIZED (SELECT vec_id, cid FROM (
       |  SELECT d.vec_id, c.cid,
       |    row_number() OVER (PARTITION BY d.vec_id ORDER BY ${fold("d.v", "c.cv")} / (d.nrm * c.cn) DESC, c.cid) AS crn
       |  FROM n d CROSS JOIN c WHERE d.vec_id % 3 = 1) WHERE crn = 1),
       |if0 AS MATERIALIZED (SELECT qid, vid, sm FROM (
       |  SELECT q.qid, nx.vec_id AS vid, ${sm("q.qv", "q.qn", "nx.v", "nx.nrm")} AS sm,
       |    row_number() OVER (PARTITION BY q.qid ORDER BY ${sm("q.qv", "q.qn", "nx.v", "nx.nrm")} DESC, nx.vec_id) AS rk
       |  FROM dq q JOIN dasg ON dasg.vec_id = q.qid
       |    JOIN ent e ON e.cid = dasg.cid JOIN n nx ON nx.vec_id = e.vid
       |  WHERE nx.vec_id <> q.qid) WHERE rk <= 4),
       |${round("i", 1, "badj", "dq")},
       |${round("i", 2, "badj", "dq")},
       |${round("i", 3, "badj", "dq")},
       |${round("i", 4, "badj", "dq")},
       |ins AS MATERIALIZED (SELECT qid, vid FROM (
       |  SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM if4) WHERE rk <= 8),
       |adj AS MATERIALIZED (SELECT src, dst FROM badj
       |  UNION ALL SELECT qid AS src, vid AS dst FROM ins
       |  UNION ALL SELECT vid AS src, qid AS dst FROM ins),
       |${if (prune)
           s"""padj0 AS (SELECT a.src, a.dst,
              |  ${fold("s.v", "t.v")} / (s.nrm * t.nrm) AS cos
              |  FROM adj a JOIN n s ON s.vec_id = a.src JOIN n t ON t.vec_id = a.dst),
              |padj AS MATERIALIZED (SELECT src, dst FROM (
              |  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rk
              |  FROM padj0) WHERE rk <= 8),""".stripMargin
         else ""}
       |${if (entryRefresh)
           """asgf AS (SELECT vec_id, cid FROM asg UNION ALL SELECT vec_id, cid FROM dasg),
              |entr AS MATERIALIZED (SELECT DISTINCT vec_id AS vid FROM (
              |  SELECT vec_id,
              |    row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS ra,
              |    row_number() OVER (PARTITION BY cid ORDER BY vec_id DESC) AS rd
              |  FROM asgf) WHERE ra <= 1 OR rd <= 1),""".stripMargin
         else ""}
       |q AS MATERIALIZED (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |${seed("s", "q", if (entryRefresh) "entr" else "ent")},
       |${round("s", 1, if (prune) "padj" else "adj", "q")},
       |${round("s", 2, if (prune) "padj" else "adj", "q")},
       |${round("s", 3, if (prune) "padj" else "adj", "q")},
       |${round("s", 4, if (prune) "padj" else "adj", "q")}
       |SELECT qid AS query_id, vid AS neighbor_id, rk AS rnk, sm AS score_micros FROM (
       |  SELECT qid, vid, sm, row_number() OVER (PARTITION BY qid ORDER BY sm DESC, vid) AS rk
       |  FROM sf4) WHERE rk <= 5""".stripMargin
  }

  /** Word 3-shingle term stream for the tf-idf pair queries. */
  private def tfidfTerms(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.table(s, d, "documents").select(col("doc_id"),
      graft.functions.ShingleGenerator.shingles(col("text"), 3).as("t"))

  /** Shared oracle for join_tfidf_cosine and join_tfidf_stored — the
    * two serving paths are value-identical by contract. */
  private val tfidfOracle: String =
    """WITH t0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |tok0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t
      |  FROM t0 WHERE len(w) >= 3),
      |tok AS (SELECT doc_id, t, count(*) AS tf FROM tok0 GROUP BY doc_id, t),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM tok),
      |df AS (SELECT t, round(log10(CAST(n.n AS DOUBLE) / count(*)), 6) AS idf
      |  FROM tok, n GROUP BY t, n.n HAVING count(*) * 1000000 <= n.n * 500000),
      |w AS (SELECT tok.doc_id, tok.t, round(tf * idf, 6) AS w
      |  FROM tok JOIN df ON tok.t = df.t),
      |nrm AS (SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
      |  FROM w GROUP BY doc_id),
      |u AS (SELECT w.doc_id, w.t, round(w.w / nrm.nrm, 6) AS u
      |  FROM w JOIN nrm ON w.doc_id = nrm.doc_id),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(round(a.u * b.u, 6) AS DECIMAL(28,12)) AS p
      |  FROM u a JOIN u b ON a.t = b.t AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, round(CAST(sum(p) AS DOUBLE), 6) AS cos
      |FROM p GROUP BY doc_a, doc_b
      |HAVING round(CAST(sum(p) AS DOUBLE), 6) >= 0.3""".stripMargin

  /** The frozen-statistics variant of [[tfidfOracle]] replayed for
    * join_tfidf_append_frozen: n, df and the maxDfPpm vocabulary cut
    * come from the BASE corpus only (doc_id % 5 <> 4 — the build
    * input), while every document (base + appended fifth) is embedded
    * in that frozen vocabulary — exactly what serving a stale-stats
    * index returns. */
  private val tfidfFrozenOracle: String =
    """WITH t0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |tok0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t
      |  FROM t0 WHERE len(w) >= 3),
      |tok AS (SELECT doc_id, t, count(*) AS tf FROM tok0 GROUP BY doc_id, t),
      |base AS (SELECT * FROM tok WHERE doc_id % 5 <> 4),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM base),
      |df AS (SELECT t, round(log10(CAST(n.n AS DOUBLE) / count(*)), 6) AS idf
      |  FROM base, n GROUP BY t, n.n HAVING count(*) * 1000000 <= n.n * 500000),
      |w AS (SELECT tok.doc_id, tok.t, round(tf * idf, 6) AS w
      |  FROM tok JOIN df ON tok.t = df.t),
      |nrm AS (SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
      |  FROM w GROUP BY doc_id),
      |u AS (SELECT w.doc_id, w.t, round(w.w / nrm.nrm, 6) AS u
      |  FROM w JOIN nrm ON w.doc_id = nrm.doc_id),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(round(a.u * b.u, 6) AS DECIMAL(28,12)) AS p
      |  FROM u a JOIN u b ON a.t = b.t AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, round(CAST(sum(p) AS DOUBLE), 6) AS cos
      |FROM p GROUP BY doc_a, doc_b
      |HAVING round(CAST(sum(p) AS DOUBLE), 6) >= 0.3""".stripMargin

  /** The frozen contract restricted to delta × base cross pairs —
    * join_tfidf_delta_probe's replay: statistics over the base
    * four-fifths, delta docs embedded in that vocabulary, pairs =
    * (delta doc, base doc) only. */
  private def tfidfDeltaProbeOracle: String =
    """WITH t0 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
      |tok0 AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS t
      |  FROM t0 WHERE len(w) >= 3),
      |tok AS (SELECT doc_id, t, count(*) AS tf FROM tok0 GROUP BY doc_id, t),
      |base AS (SELECT * FROM tok WHERE doc_id % 5 <> 4),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM base),
      |df AS (SELECT t, round(log10(CAST(n.n AS DOUBLE) / count(*)), 6) AS idf
      |  FROM base, n GROUP BY t, n.n HAVING count(*) * 1000000 <= n.n * 500000),
      |w AS (SELECT tok.doc_id, tok.t, round(tf * idf, 6) AS w
      |  FROM tok JOIN df ON tok.t = df.t),
      |nrm AS (SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(28,12))) AS DOUBLE)) AS nrm
      |  FROM w GROUP BY doc_id),
      |u AS (SELECT w.doc_id, w.t, round(w.w / nrm.nrm, 6) AS u
      |  FROM w JOIN nrm ON w.doc_id = nrm.doc_id),
      |p AS (SELECT a.doc_id AS new_doc, b.doc_id AS dup_of,
      |    CAST(round(a.u * b.u, 6) AS DECIMAL(28,12)) AS p
      |  FROM u a JOIN u b ON a.t = b.t
      |  WHERE a.doc_id % 5 = 4 AND b.doc_id % 5 <> 4)
      |SELECT new_doc, dup_of, round(CAST(sum(p) AS DOUBLE), 6) AS cos
      |FROM p GROUP BY new_doc, dup_of
      |HAVING round(CAST(sum(p) AS DOUBLE), 6) >= 0.3""".stripMargin

  /** Idempotent stamp-keyed stored tf-idf index under java.io.tmpdir —
    * built once per (sfDir, documents.parquet bytes); the srcStamp key
    * (the Streaming arrival-fixture scheme) means driver testdata
    * regeneration auto-invalidates a stale index instead of silently
    * serving old postings. `filter` restricts the indexed corpus (the
    * append-lifecycle queries build on the base four-fifths); the v2
    * dir prefix invalidates r7 layouts that predate the raw-tf/idf
    * stores. */
  private def stampedTfidfIndex(s: org.apache.spark.sql.SparkSession,
      d: String, tag: String,
      filter: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : java.io.File = {
    val src = new java.io.File(s"$d/documents.parquet")
    require(src.exists(), s"stored-tfidf source does not exist: $src")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_$tag$key")
    val ready = new java.io.File(root, "_GRAFT_READY")
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      Similarity.writeTfidfIndex(
        tfidfTerms(s, d).filter(filter(col("doc_id"))), root.getPath)
      ready.createNewFile(): Unit
    }
    root
  }

  private def storedTfidfIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    stampedTfidfIndex(s, d, "tfidf_idx3_", _ => lit(true)).getPath

  /** The pristine base-corpus (doc_id % 5 <> 4) index the append
    * lifecycle queries copy-then-mutate — built once per testdata
    * stamp, never touched in place. */
  private def pristineTfidfBase(s: org.apache.spark.sql.SparkSession,
      d: String): java.io.File =
    stampedTfidfIndex(s, d, "tfidf_base3_", _ % 5 =!= 4)

  /** Stamp-cached MAINTAINED tf-idf index (VERDICT r10 #3): the full
    * lifecycle — copy pristine base → append the remaining fifth →
    * budgeted statistics refresh → compact — applied ONCE per testdata
    * stamp, so the serve-only query below measures the serving tier
    * against the maintained layout without re-paying the maintenance
    * verbs every run. Post-refresh the layout is value-identical to a
    * fresh full-corpus build (the join_tfidf_append contract), but
    * physically it is the appended+refreshed+compacted store. */
  private def maintainedTfidfIndex(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val src = new java.io.File(s"$d/documents.parquet")
    require(src.exists(), s"maintained-tfidf source does not exist: $src")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_tfidf_maint1_$key")
    val ready = new java.io.File(root, "_GRAFT_READY")
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      graft.sources.Tables.linkCopyDirectory(pristineTfidfBase(s, d), root)
      // the copy brings the PRISTINE dir's ready marker along — drop it
      // until this dir's own lifecycle completes, or a crashed
      // maintenance run would serve a half-maintained index forever
      new java.io.File(root, "_GRAFT_READY").delete(): Unit
      Similarity.appendToTfidfIndex(root.getPath,
        tfidfTerms(s, d).filter(col("doc_id") % 5 === 4))
      require(Similarity.refreshTfidfIndexIfStale(s, root.getPath,
          maxGrowthPpm = 100000L),
        "25% corpus growth must trip the 10% drift budget")
      Similarity.compactTfidfIndex(s, root.getPath)
      ready.createNewFile(): Unit
    }
    root.getPath
  }

  /** Full-corpus serve-only graph index shared by ann_graph_beam and
    * ann_graph_filtered — immutable, stamp-cached per testdata.
    * `perRegion` > 1 stores the SPANN-style multi-entry tier
    * ([[Similarity.regionEntryPoints]] — VERDICT r10 #1) in its own
    * stamped dir; perRegion = 1 is the historical min-id-per-region
    * layout (identical bytes, so its cache key is unchanged). */
  private def servedGraphIndex(s: org.apache.spark.sql.SparkSession,
      d: String, perRegion: Int = 1): String = {
    val emb = Tables.table(s, d, "embeddings")
    val src = new java.io.File(s"$d/embeddings.parquet")
    require(src.exists(), s"beam-index source does not exist: $src")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val tag = if (perRegion == 1) "graft_knng2_" else s"graft_knng2e${perRegion}_"
    val idx = new java.io.File(sys.props("java.io.tmpdir"), s"$tag$key")
    val ready = new java.io.File(idx, "_GRAFT_READY")
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(idx)
      Similarity.writeKnnGraphIndex(
        Similarity.knnGraphExact(emb, col("embedding"), col("vec_id"), 8),
        emb, col("embedding"), col("vec_id"),
        Similarity.regionEntryPoints(
          Similarity.ivfAssignments(emb, col("embedding"), col("vec_id"), 8),
          perRegion),
        idx.getPath)
      ready.createNewFile(): Unit
    }
    idx.getPath
  }

  /** The pristine two-thirds (vec_id % 3 <> 1) graph-ANN index the
    * insert/prune lifecycle queries copy-then-mutate — stamp-cached
    * per testdata like [[pristineTfidfBase]]. */
  private def pristineGraphBase(s: org.apache.spark.sql.SparkSession,
      d: String): java.io.File = {
    val emb = Tables.table(s, d, "embeddings")
    val base = emb.filter(col("vec_id") % 3 =!= 1)
    val src = new java.io.File(s"$d/embeddings.parquet")
    require(src.exists(), s"graph-base source does not exist: $src")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    // _v3 layout: the build quantizer is persisted (centroids/), so the
    // append lifecycle's insertion walks REGION-seed (VERDICT r11 #1) —
    // prefix bumped per the stored-layout cache rule
    val pristine = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_knngb3_$key")
    val ready = new java.io.File(pristine, "_GRAFT_READY")
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(pristine)
      Similarity.writeKnnGraphIndex(
        Similarity.knnGraphExact(base, col("embedding"), col("vec_id"), 8),
        base, col("embedding"), col("vec_id"),
        Similarity.ivfAssignments(base, col("embedding"), col("vec_id"), 8)
          .groupBy("cid").agg(min(col("vid")).as("vid")),
        pristine.getPath,
        centroids = Similarity.firstNCentroids(base, col("embedding"),
          col("vec_id"), 8))
      ready.createNewFile(): Unit
    }
    pristine
  }

  /** Pristine BLOCKED-BUILT graph index (full corpus, first-8
    * IVF-quantizer cells at MULTI-probe 2, kGraph 8) — the
    * scalable-construction artifact `ann_graph_refine` copies then
    * refines. Multi-probe construction carries the boundary-crossing
    * seed edges one NN-Descent round then propagates (single-probe
    * blocks are disjoint, and neighbor-of-neighbor is CLOSED over a
    * partitioned graph — the refine verb's documented precondition).
    * Stamp-cached per testdata like [[pristineGraphBase]]. */
  private def pristineBlockedGraph(s: org.apache.spark.sql.SparkSession,
      d: String): java.io.File = {
    val emb = Tables.table(s, d, "embeddings")
    val src = new java.io.File(s"$d/embeddings.parquet")
    require(src.exists(), s"blocked-graph source does not exist: $src")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val pristine = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_knngblk2_$key")
    val ready = new java.io.File(pristine, "_GRAFT_READY")
    if (!ready.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(pristine)
      Similarity.writeKnnGraphIndex(
        Similarity.knnGraphBlockedMulti(emb, col("embedding"), col("vec_id"),
          Similarity.ivfAssignmentsMulti(emb, col("embedding"), col("vec_id"),
            nCentroids = 8, nProbe = 2), 8),
        emb, col("embedding"), col("vec_id"),
        Similarity.ivfAssignments(emb, col("embedding"), col("vec_id"), 8)
          .groupBy("cid").agg(min(col("vid")).as("vid")),
        pristine.getPath)
      ready.createNewFile(): Unit
    }
    pristine
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "ann_topk_bruteforce",
      s"""$normCte,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
         |p AS (SELECT q.qid, n.vec_id AS nid,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.v[i])), (x, y) -> x + y) / (q.qn * n.nrm) AS cos
         |  FROM q JOIN n ON n.vec_id <> q.qid),
         |r AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM p)
         |SELECT qid AS query_id, nid AS neighbor_id, rnk, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
      Similarity.topKBruteForce(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5)
        .withColumnRenamed("rank", "rnk")
    },
    // matryoshka truncation sweep: recall@5 of first-{16,32,64}-dim
    // brute force vs full-dim ground truth, exact integer ppm — the
    // measurement that sizes MRL-style truncated first-stage retrieval
    // (the 64 arm is the identity sanity row at 1 000 000 ppm)
    QueryDef("ann_matryoshka", matryoshkaOracle) { (s, d) =>
      Similarity.matryoshkaRecall(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, dims = Seq(16, 32, 64))
    },
    QueryDef("ann_ivf", ivfOracle) { (s, d) =>
      Similarity.topKIvf(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, nCentroids = 8, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
    },
    // the same IVF configuration SERVED FROM STORAGE: inverted lists
    // written partitioned by centroid id once, probed with
    // driver-side bounded cid lists that partition-prune the vector
    // scan (Similarity.writeIvfIndex/topKIvfStored — the ANN
    // counterpart of the stored dedup index). Output value-identical
    // to the in-memory form, so the oracle is shared.
    QueryDef("ann_ivf_stored", ivfOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      // per-process scratch, NOT a fixed shared path: concurrent JVMs
      // (sf0.01 selfcheck beside an sf0.1 bench) would race
      // writer-vs-reader on a shared dir, or silently mix SFs
      val tmp = Tables.scratchDir("graft_ivf_idx")
      Similarity.writeIvfIndex(emb, col("embedding"), col("vec_id"),
        Similarity.firstNCentroids(emb, col("embedding"), col("vec_id"), 8), tmp)
      Similarity.topKIvfStored(tmp, emb.filter(col("vec_id") % 50 === 0),
          col("embedding"), col("vec_id"), k = 5, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
    },
    // the production billion-vector serving shape, STORED: IVF
    // partition-pruned lists whose rows carry m-byte PQ codes next to
    // the exact vectors (Similarity.writeIvfPqIndex/topKIvfPqStored —
    // FAISS "IVF8,PQ8" with an exact re-rank tier). Queries probe 2
    // lists, ADC-score the CODES via integer-micro LUTs (exact BIGINT
    // sums), and only the 15-deep shortlist pays the full-dim cosine.
    QueryDef("ann_ivfpq_stored", ivfPqOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val tmp = Tables.scratchDir("graft_ivfpq_idx") // per-process, race-free
      Similarity.writeIvfPqIndex(emb, col("embedding"), col("vec_id"),
        Similarity.firstNCentroids(emb, col("embedding"), col("vec_id"), 8),
        tmp, m = 8, subDim = 8, nCodes = 8)
      Similarity.topKIvfPqStored(tmp, emb.filter(col("vec_id") % 50 === 0),
          col("embedding"), col("vec_id"), k = 5, nProbe = 2, shortlist = 15)
        .withColumnRenamed("rank", "rnk")
    },
    // FILTERED IVF serving (VERDICT r9 #3 — the production-common
    // predicate+ANN stack for the quantization tiers): top-5 among
    // EVEN-id vectors only, the predicate composed into the probed
    // lists' candidate scan BEFORE the rank, with partition pruning
    // intact (ScaleSpec pins the pruned scan). Over-fetch posture:
    // nProbe 3 instead of 2 — a 50% filter halves each list's
    // matching candidates, so one extra probed list keeps the
    // shortlist k-deep. The oracle composes the same filter into the
    // candidate CTE at the same point.
    QueryDef("ann_ivf_filtered",
        ivfOracleWith(3, " AND asg.vid % 2 = 0")) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val tmp = Tables.scratchDir("graft_ivf_fidx") // per-process, race-free
      Similarity.writeIvfIndex(emb, col("embedding"), col("vec_id"),
        Similarity.firstNCentroids(emb, col("embedding"), col("vec_id"), 8), tmp)
      Similarity.topKIvfStored(tmp, emb.filter(col("vec_id") % 50 === 0),
          col("embedding"), col("vec_id"), k = 5, nProbe = 3,
          keep = col("vid") % 2 === 0)
        .withColumnRenamed("rank", "rnk")
    },
    // FILTERED IVFPQ serving: the same predicate composed BEFORE the
    // ADC scan — non-matching candidates never pay even the LUT adds,
    // the shortlist ranks matching candidates only, and the exact
    // re-rank output is the pipeline's answer over the matching
    // subset. Oracle: ivfPqOracle with the filter at the adc CTE.
    QueryDef("ann_ivfpq_filtered",
        ivfPqOracleWith(" AND asg.vid % 2 = 0")) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val tmp = Tables.scratchDir("graft_ivfpq_fidx") // per-process, race-free
      Similarity.writeIvfPqIndex(emb, col("embedding"), col("vec_id"),
        Similarity.firstNCentroids(emb, col("embedding"), col("vec_id"), 8),
        tmp, m = 8, subDim = 8, nCodes = 8)
      Similarity.topKIvfPqStored(tmp, emb.filter(col("vec_id") % 50 === 0),
          col("embedding"), col("vec_id"), k = 5, nProbe = 2, shortlist = 15,
          keep = col("vid") % 2 === 0)
        .withColumnRenamed("rank", "rnk")
    },
    // IVF with a TRAINED coarse quantizer: 2 spherical-Lloyd
    // iterations from the first-8 seed (Similarity.kmeansCentroids —
    // deterministic by construction: decimal mean accumulation, cid
    // tie-breaks, fixed iteration count), then the identical
    // topKIvfWith dataflow. The oracle unrolls both iterations, so the
    // TRAINER itself is oracle-verified — not just the serving path.
    QueryDef("ann_ivf_kmeans", kmeansIvfOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      Similarity.topKIvfWith(emb, col("embedding"), col("vec_id"),
          col("vec_id") % 50 === 0, k = 5, nProbe = 2,
          Similarity.kmeansCentroids(emb, col("embedding"), col("vec_id"),
            nCentroids = 8, iters = 2))
        .withColumnRenamed("rank", "rnk")
    },
    // stored-index APPEND lifecycle (Similarity.appendToIvfIndex — the
    // ANN twin of dedup_index_append): the pristine index holds only
    // vec_id % 3 <> 1 under the same first-8 quantizer; the run works
    // on a file copy, appends the missing third as a delta batch
    // (assignment against the STORED centroids, O(delta) parquet
    // appends into the cid partitions), then serves queries from the
    // grown index. Result must be value-identical to full-corpus IVF,
    // so the oracle is shared with ann_ivf / ann_ivf_stored.
    QueryDef("ann_ivf_append", ivfOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val src = new java.io.File(s"$d/embeddings.parquet")
      require(src.exists(), s"ivf-append source does not exist: $src")
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$d|${src.length()}_${src.lastModified()}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val pristine = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_ivfapp_$key")
      val ready = new java.io.File(pristine, "_GRAFT_READY")
      if (!ready.exists()) {
        org.apache.commons.io.FileUtils.deleteQuietly(pristine)
        Similarity.writeIvfIndex(emb.filter(col("vec_id") % 3 =!= 1),
          col("embedding"), col("vec_id"),
          Similarity.firstNCentroids(emb, col("embedding"), col("vec_id"), 8),
          pristine.getPath)
        ready.createNewFile(): Unit
      }
      // per-phase wall attribution (VERDICT r7 #5: the compact+gate
      // phases added in r7 made this the one >30% bench mover with no
      // phase split — the dedup_index_append treatment)
      val phase = new Phases("ann_ivf_append")
      val idx = Tables.scratchDir("graft_ivf_append")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      phase("append") {
        Similarity.appendToIvfIndex(idx, emb.filter(col("vec_id") % 3 === 1),
          col("embedding"), col("vec_id"))
      }
      // LSM lifecycle close-out: fold the append's delta files back to
      // one file per touched cid list; the shared oracle then proves
      // compaction preserved the served ranking
      val rewritten = phase("compact") {
        graft.operators.Layout.compactPartitioned(s, s"$idx/vectors", Seq("cid"))
      }
      phase.emit(s""","compacted_parts":$rewritten""")
      // the serve tier stays lazy (it IS the returned plan) — its cost
      // is the query's remainder after the attributed phases
      Similarity.topKIvfStored(idx, emb.filter(col("vec_id") % 50 === 0),
          col("embedding"), col("vec_id"), k = 5, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
    },
    // IVF + int8 re-rank: candidates scored against DEQUANTIZED codes
    // (asymmetric distance), top-15 re-scored exactly → top-5. The
    // oracle replays the identical affine-grid arithmetic, so even the
    // approximate scores hash-match.
    QueryDef(
      "ann_ivf_rerank",
      s"""$normCte,
         |st AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM (
         |    SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM n) GROUP BY pos),
         |la AS (SELECT list(lo ORDER BY pos) AS loa, list(hi ORDER BY pos) AS hia FROM st),
         |dq AS (SELECT n.vec_id, n.v, n.nrm,
         |    list_transform(range(1, len(n.v) + 1), i -> CASE WHEN la.hia[i] = la.loa[i] THEN la.loa[i]
         |      ELSE la.loa[i] + least(255, floor((n.v[i] - la.loa[i]) / (la.hia[i] - la.loa[i]) * 255))
         |           * (la.hia[i] - la.loa[i]) / 255.0 END) AS dv
         |  FROM n, la),
         |dqn AS (SELECT vec_id, v, nrm, dv,
         |    sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(dv) + 1), i -> dv[i] * dv[i])), (x, y) -> x + y)) AS dn
         |  FROM dq),
         |c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
         |asg0 AS (SELECT d.vec_id AS vid, d.v, d.nrm, d.dv, d.dn, c.cid,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(d.v) + 1), i -> d.v[i] * c.cv[i])), (x, y) -> x + y) / (d.nrm * c.cn) AS ccos
         |  FROM dqn d CROSS JOIN c),
         |asg AS (SELECT vid, v, nrm, dv, dn, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY ccos DESC, cid) AS crn FROM asg0) WHERE crn = 1),
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
         |pr0 AS (SELECT q.qid, q.qv, q.qn, c.cid,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * c.cv[i])), (x, y) -> x + y) / (q.qn * c.cn) AS qcos
         |  FROM q CROSS JOIN c),
         |pr AS (SELECT qid, qv, qn, cid FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= 2),
         |sc AS (SELECT pr.qid, pr.qv, pr.qn, asg.vid, asg.v, asg.nrm,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(pr.qv) + 1), i -> pr.qv[i] * asg.dv[i])), (x, y) -> x + y) / (pr.qn * asg.dn) AS acos
         |  FROM pr JOIN asg USING (cid) WHERE asg.vid <> pr.qid),
         |pruned AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY acos DESC, vid) AS arn FROM sc) WHERE arn <= 15),
         |ex AS (SELECT qid, vid, acos,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])), (x, y) -> x + y) / (qn * nrm) AS cos
         |  FROM pruned),
         |r AS (SELECT qid, vid, cos, acos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM ex)
         |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos, round(acos, 6) AS approx_cos
         |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
      Similarity.topKIvfRerank(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, nCentroids = 8, nProbe = 2, m = 15)
        .withColumnRenamed("rank", "rnk")
    },
    // hard-negative mining: per query, the top-3 nearest vectors with a
    // DIFFERENT label (contrastive-training negatives). Same cosine
    // fold; the label-exclusion filter rides the candidate join.
    QueryDef(
      "ann_hard_negatives",
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
        |  FROM e),
        |q AS (SELECT vec_id AS qid, label AS qlbl, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
        |p AS (SELECT q.qid, n.vec_id AS nid, n.label AS nlbl,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.v[i])), (x, y) -> x + y) / (q.qn * n.nrm) AS cos
        |  FROM q JOIN n ON n.vec_id <> q.qid AND n.label <> q.qlbl),
        |r AS (SELECT qid, nid, nlbl, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM p)
        |SELECT qid AS query_id, nid AS neighbor_id, nlbl AS neg_label, rnk, round(cos, 6) AS cos
        |FROM r WHERE rnk <= 3""".stripMargin) { (s, d) =>
      Similarity.hardNegatives(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("label"), col("vec_id") % 50 === 0, k = 3)
        .withColumnRenamed("rank", "rnk")
    },
    // binary sign-bit codes + exact re-rank: the Hamming shortlist is
    // integral (ties by vid), so the oracle reproduces it WITHOUT the
    // bit-packing — popcount(xor(codes)) ≡ count of sign mismatches,
    // counted directly over the two vectors; only the 50-deep shortlist
    // is re-ranked with the shared fold cosine
    QueryDef(
      "ann_hamming_rerank",
      s"""$normCte,
         |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
         |h AS (SELECT q.qid, n.vec_id AS nid,
         |  len(list_filter(range(1, len(q.qv) + 1), i -> (q.qv[i] >= 0) <> (n.v[i] >= 0))) AS ham
         |  FROM q JOIN n ON n.vec_id <> q.qid),
         |sl AS (SELECT qid, nid FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY ham, nid) AS hrnk FROM h) WHERE hrnk <= 50),
         |p AS (SELECT sl.qid, sl.nid,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * n.v[i])), (x, y) -> x + y) / (q.qn * n.nrm) AS cos
         |  FROM sl JOIN q ON q.qid = sl.qid JOIN n ON n.vec_id = sl.nid),
         |r AS (SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk FROM p)
         |SELECT qid AS query_id, nid AS neighbor_id, rnk, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
      Similarity.topKHammingRerank(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, shortlist = 50, dims = 64)
    },
    // product-quantization ADC scan (Similarity.topKPqAdc): 8 subspaces
    // × 8 dims, 8-code codebooks from the first-8 anchor vectors;
    // candidate scores are exact BIGINT sums of integer-micro LUT
    // cells, so even the approximate ranking hash-matches
    QueryDef(
      "ann_pq_adc",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |sub AS (SELECT vec_id, CAST(u.i AS BIGINT) AS m, v[(u.i*8+1):(u.i*8+8)] AS sv
        |  FROM e, unnest(range(8)) AS u(i)),
        |cb AS (SELECT m, vec_id AS cid, sv AS cv FROM sub WHERE vec_id < 8),
        |enc0 AS (SELECT s.vec_id AS vid, s.m, c.cid,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, 9), i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))), (x, y) -> x + y) AS l2
        |  FROM sub s JOIN cb c USING (m)),
        |enc AS (SELECT vid, m, cid FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vid, m ORDER BY l2, cid) AS rn FROM enc0) WHERE rn = 1),
        |lut AS (SELECT s.vec_id AS qid, s.m, c.cid,
        |    CAST(round(list_reduce(list_prepend(0.0, list_transform(range(1, 9), i -> s.sv[i]*c.cv[i])), (x, y) -> x + y) * 1000000, 0) AS BIGINT) AS dm
        |  FROM sub s JOIN cb c USING (m) WHERE s.vec_id % 50 = 0),
        |sc AS (SELECT l.qid, e.vid, CAST(sum(l.dm) AS BIGINT) AS score_micros
        |  FROM enc e JOIN lut l USING (m, cid) WHERE e.vid <> l.qid GROUP BY 1, 2),
        |r AS (SELECT qid, vid, score_micros,
        |    row_number() OVER (PARTITION BY qid ORDER BY score_micros DESC, vid) AS rnk FROM sc)
        |SELECT qid AS query_id, vid AS neighbor_id, rnk, score_micros
        |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
      Similarity.topKPqAdc(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, m = 8, subDim = 8, nCodes = 8, k = 5)
        .withColumnRenamed("rank", "rnk")
    },
    // blocked exact k-NN graph: neighbor candidates from a plain
    // equi-join on the block key (label here; an IVF centroid id at
    // corpus scale) — Σ|block|² pairs, never n², each block co-located
    // by the join shuffle
    QueryDef(
      "knn_graph_blocked",
      """WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, label, v,
        |  sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(v) + 1), i -> v[i] * v[i])), (x, y) -> x + y)) AS nrm
        |  FROM e),
        |p AS (SELECT a.vec_id AS src, b.vec_id AS dst, a.label AS label,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])), (x, y) -> x + y) / (a.nrm * b.nrm) AS cos
        |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |r AS (SELECT src, dst, label, cos, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rnk FROM p)
        |SELECT src, dst, label, rnk, round(cos, 6) AS cos
        |FROM r WHERE rnk <= 3""".stripMargin) { (s, d) =>
      Similarity.knnGraphBlocked(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("label"), k = 3)
    },
    // graph-based ANN serving (Similarity.writeKnnGraphIndex /
    // beamSearchKnnStored — VERDICT r7 #3): the stored-adjacency
    // small-world tier. The top-8 neighbor graph (exact construction —
    // the declared baseline tier; knnGraphBlocked/NN-descent builders
    // feed the same layout at corpus scale) is stored partitioned by
    // src bucket; entry points are one per first-8-quantizer region
    // (ivfAssignments min-id — the SPANN posture). Per query: seed the
    // beam with the 4 best entries, walk 4 rounds of frontier-expand
    // (adjacency equi-join, partition-pruned) keeping the 16 best
    // integer-micro scores, return top-5. Every beam decision is
    // BIGINT-exact, so the oracle replays the whole walk as unrolled
    // rounds (the graph_bfs pattern). Recall@5 vs brute force = 0.78
    // on this data (BeamSearchSpec pins the floor).
    QueryDef("ann_graph_beam", graphBeamOracle()) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      Similarity.beamSearchKnnStored(servedGraphIndex(s, d),
        emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // the MULTI-ENTRY serving tier (Similarity.regionEntryPoints —
    // VERDICT r10 #1, the SPANN answer to walk-budget-bound recall at
    // corpus scale): the same exact-built graph stored with TWO
    // smallest-id entries per quantizer region, served by the
    // identical walk. With one entry per region the nProbe seeds land
    // in nProbe different regions; multi-entry seeds start inside the
    // query's own region, which is where the measured 1 M recall went
    // (0.29 -> 0.73 starved-walk BeamSearchSpec pin; 0.833 vs 0.498
    // w32/r3 at 100 k). The entry rule is one SQL window, so the
    // oracle replays the whole layout+walk relationally.
    QueryDef("ann_graph_beam_multi", graphBeamOracle(entPerRegion = 2)) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      Similarity.beamSearchKnnStored(servedGraphIndex(s, d, perRegion = 2),
        emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // COARSE ENTRY-GRAPH serving (Similarity.buildKnnEntryGraph /
    // beamSearchKnnStoredHier — the HNSW upper layer, VERDICT r11
    // "missing #2"): the seed tier is a WALK over the exact k=4 kNN
    // graph among the stored entries (2 smallest-id roots, 2 rounds,
    // width 8) instead of exhaustively scoring every entry — the
    // regime for entry tiers past the broadcast bound and for bulk
    // query batches, where queries × entries seed scoring dominates.
    // Entry-walk rounds share the main walk's exact semantics, so the
    // oracle replays BOTH tiers unrolled (eround + round CTEs).
    QueryDef("ann_graph_beam_hier", graphHierOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val idx = servedGraphIndex(s, d, perRegion = 2)
      // additive, stamp-guarded: the entry graph is part of the served
      // fixture, built once per testdata version
      if (!new java.io.File(s"$idx/entry_adj").exists())
        Similarity.buildKnnEntryGraph(s, idx, kEntry = 4): Unit
      Similarity.beamSearchKnnStoredHier(idx,
        emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4, nRoots = 2, entryBeam = 8, entryRounds = 2)
    },
    // FILTERED graph serving (Similarity.beamSearchKnnStoredFiltered —
    // the filtered-ANN posture): top-5 among EVEN-id neighbors only,
    // with the walk navigating the full graph (restricting the walk
    // breaks navigability; post-filtering a width-16 beam collapses
    // recall under a 50% filter). Output contract: top-k by (micros
    // DESC, vid) over every matching node the walk ever scored — the
    // oracle unions its per-round scored sets, filters parity, ranks.
    QueryDef("ann_graph_filtered", graphFilteredOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      Similarity.beamSearchKnnStoredFiltered(servedGraphIndex(s, d),
        emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), keep = col("vid") % 2 === 0,
        k = 5, nProbe = 4, beamWidth = 16, rounds = 4)
    },
    // SELECTIVE filtered graph serving with ADAPTIVE WIDENING (VERDICT
    // r9 #2 — the ACORN posture): at 10% selectivity a fixed width-16
    // beam scores ~1.6 matches per round and starves the accumulator;
    // here the effective width scales by the inverse selectivity
    // estimated from the entry-scored sample (integer arithmetic on
    // two counts, capped at 4×), so the walk gathers ≥ k matches.
    // The oracle recomputes the widened width in its `wf` CTE and
    // replays the widened walk verbatim, pinning the shortfall
    // contract (sub-k matches return as-is, never padded).
    QueryDef("ann_graph_filtered_rare", graphFilteredRareOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      Similarity.beamSearchKnnStoredFiltered(servedGraphIndex(s, d),
        emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), keep = col("vid") % 10 === 0,
        k = 5, nProbe = 4, beamWidth = 16, rounds = 4, widenCap = 4)
    },
    // NN-DESCENT refinement of the SCALABLE builder (VERDICT r9 #1):
    // the pristine index is blocked-built over MULTI-probe-2 quantizer
    // cells (overlapping blocks — the seed cross-cell edges NN-Descent
    // needs, since neighbor-of-neighbor is CLOSED over disjoint
    // blocks); the run copies it, applies one refinement round
    // (neighbor-of-neighbor candidates over the symmetrized adjacency,
    // exact-cosine re-score, keep per-node top-8), then serves the
    // standard 4-round walk from the REFINED graph. The oracle
    // replays build → refine → serve relationally.
    QueryDef("ann_graph_refine", graphRefineOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val pristine = pristineBlockedGraph(s, d)
      val phase = new Phases("ann_graph_refine")
      val idx = Tables.scratchDir("graft_knng_refine")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      phase("refine") {
        Similarity.refineKnnGraphIndex(s, idx, kGraph = 8, rounds = 1)
      }
      Similarity.beamSearchKnnStored(idx, emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // graph-index INSERT lifecycle (Similarity.appendToKnnGraphIndex —
    // the HNSW-class incremental maintenance verb): the pristine index
    // holds the vec_id % 3 <> 1 two-thirds; the run copies it, batch-
    // inserts the remaining third (each delta vector beam-searches the
    // pristine graph for its top-8 neighbors; forward AND reverse
    // edges append, making the inserts reachable), then serves queries
    // from the GROWN graph. The oracle replays both tiers — every
    // insertion walk, the edge union, and the serve walk — unrolled.
    QueryDef("ann_graph_append", graphAppendOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val pristine = pristineGraphBase(s, d)
      val phase = new Phases("ann_graph_append")
      val idx = Tables.scratchDir("graft_knng_append")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      val inserted = phase("insert") {
        Similarity.appendToKnnGraphIndex(idx, emb.filter(col("vec_id") % 3 === 1),
          col("embedding"), col("vec_id"), kGraph = 8, nProbe = 4,
          beamWidth = 16, rounds = 4)
      }
      phase.emit(s""","inserted":$inserted""")
      Similarity.beamSearchKnnStored(idx, emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // graph-index degree-bound PRUNE (Similarity.pruneKnnGraphIndex —
    // VERDICT r8 #1, the refresh-tier verb closing the last open index
    // lifecycle): copy the pristine two-thirds, batch-insert the
    // remaining third (reverse edges push base-node degree past the
    // build-time 8), then re-truncate every over-cap node to its 8
    // best neighbors by exact cosine and serve from the PRUNED graph.
    // Only hot src buckets are rewritten (Layout.swapPartitionLeaves).
    // The oracle replays insertion walks, edge union, the universal
    // top-8 prune (≡ hot-bucket rewrite: under-cap nodes keep all
    // edges), and the serve walk — all unrolled, integer-micros beam.
    QueryDef("ann_graph_prune", graphPruneOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val pristine = pristineGraphBase(s, d)
      val phase = new Phases("ann_graph_prune")
      val idx = Tables.scratchDir("graft_knng_prune")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      phase("insert") {
        Similarity.appendToKnnGraphIndex(idx, emb.filter(col("vec_id") % 3 === 1),
          col("embedding"), col("vec_id"), kGraph = 8, nProbe = 4,
          beamWidth = 16, rounds = 4)
      }
      // the budgeted trigger (r8 #3's pattern applied to this family):
      // the inserted third is 50% volume against the 10% budget, so the
      // prune fires deterministically; a below-budget batch would keep
      // serving the denser graph (BeamSearchSpec pins that branch)
      val (ins, base, ppm) = Similarity.knnGraphStaleness(s, idx)
      val pruned = phase("prune") {
        Similarity.pruneKnnGraphIndexIfStale(s, idx, degreeCap = 8,
          maxInsertedPpm = 100000L)
      }
      require(pruned, "50% insert volume must trip the 10% prune budget")
      phase.emit(s""","inserted":$ins,"base_nodes":$base,"inserted_ppm":$ppm""")
      Similarity.beamSearchKnnStored(idx, emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // ENTRY-TIER refresh lifecycle (Similarity.refreshKnnGraphEntries —
    // VERDICT r11 #2, the tier's missing refresh verb): copy the
    // pristine two-thirds, batch-insert the remaining third (50%
    // insert volume trips the 10% ENTRY budget — an independent clock
    // from the prune's), then the budgeted refresh re-samples
    // perRegion=2 entries EPOCH-AWARE over the grown corpus (smallest
    // + largest member id per region — the append-blind all-smallest
    // rule measured as a no-op at 1 M, docs/EXPERIMENTS.md round 21)
    // and the serve walk seeds from the REFRESHED tier. The oracle
    // replays the insertion walks, the dual-window re-sample (`entr`),
    // and the serve walk unrolled.
    QueryDef("ann_graph_entry_refresh", graphEntryRefreshOracle) { (s, d) =>
      val emb = Tables.table(s, d, "embeddings")
      val pristine = pristineGraphBase(s, d)
      val phase = new Phases("ann_graph_entry_refresh")
      val idx = Tables.scratchDir("graft_knng_entref")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      phase("insert") {
        Similarity.appendToKnnGraphIndex(idx, emb.filter(col("vec_id") % 3 === 1),
          col("embedding"), col("vec_id"), kGraph = 8, nProbe = 4,
          beamWidth = 16, rounds = 4)
      }
      val (_, _, entPpm) = Similarity.knnGraphEntryStaleness(s, idx)
      val refreshed = phase("refresh") {
        Similarity.refreshKnnGraphEntriesIfStale(s, idx, perRegion = 2,
          maxInsertedPpm = 100000L)
      }
      require(refreshed, "50% insert volume must trip the 10% entry budget")
      phase.emit(s""","entry_staleness_ppm":$entPpm""")
      Similarity.beamSearchKnnStored(idx, emb.filter(col("vec_id") % 50 === 0),
        col("embedding"), col("vec_id"), k = 5, nProbe = 4, beamWidth = 16,
        rounds = 4)
    },
    // sparse tf-idf cosine similarity join over word 3-shingle terms:
    // exact cosine through the inverted-index equi-join (no verify pass
    // — non-shared terms contribute 0), idf-weighted, hot terms over
    // 50% df dropped on both sides of the contract
    QueryDef("join_tfidf_cosine", tfidfOracle) { (s, d) =>
      Similarity.tfidfCosinePairs(tfidfTerms(s, d), threshold = 0.3)
    },
    // the same contract SERVED FROM STORAGE (Similarity.writeTfidfIndex
    // / tfidfCosinePairsStored): the corpus pass (tokenize → tf → df →
    // norms → unit vectors → suffix mass) is a maintained artifact built
    // once per corpus version — stamp-keyed like the streaming arrival
    // fixtures, so driver testdata regeneration invalidates it — and
    // queries serve candidates + verify from the stored postings.
    // Output value-identical to join_tfidf_cosine; the oracle is shared.
    QueryDef("join_tfidf_stored", tfidfOracle) { (s, d) =>
      Similarity.tfidfCosinePairsStored(s, storedTfidfIndex(s, d), threshold = 0.3)
    },
    // stored tf-idf index APPEND under FROZEN collection statistics
    // (Similarity.appendToTfidfIndex — VERDICT r7 #1): the index is
    // built on the base corpus (doc_id % 5 <> 4), the remaining fifth
    // appends in O(delta) with unit vectors weighted by the STORED
    // (t, idf) table — the stale-statistics serving posture every
    // search engine runs between stat refreshes. The oracle replays
    // the frozen contract exactly: n/df/idf over base docs only, all
    // docs embedded in the base vocabulary.
    QueryDef("join_tfidf_append_frozen", tfidfFrozenOracle) { (s, d) =>
      // copy the stamp-cached pristine base (shared with
      // join_tfidf_append) instead of rebuilding it per run — the run
      // MUTATES its copy, so the copy itself cannot be cached
      val idx = Tables.scratchDir("graft_tfidf_appf")
      graft.sources.Tables.linkCopyDirectory(
        pristineTfidfBase(s, d), new java.io.File(idx))
      Similarity.appendToTfidfIndex(idx,
        tfidfTerms(s, d).filter(col("doc_id") % 5 === 4))
      Similarity.tfidfCosinePairsStored(s, idx, threshold = 0.3)
    },
    // the ingest-gate PROBE against the stored index
    // (Similarity.tfidfDeltaProbe): the delta fifth scored for cosine
    // near-dups against the pristine base corpus WITHOUT appending —
    // the tf-idf-space decontamination/dedup gate, reading only the
    // delta's touched term buckets from the idf and postings stores.
    // The oracle replays the frozen contract restricted to
    // delta × base cross pairs.
    QueryDef("join_tfidf_delta_probe", tfidfDeltaProbeOracle) { (s, d) =>
      Similarity.tfidfDeltaProbe(s, pristineTfidfBase(s, d).getPath,
        tfidfTerms(s, d).filter(col("doc_id") % 5 === 4), threshold = 0.3)
    },
    // the FULL tf-idf index lifecycle (VERDICT r7 #1, r8 #3): build
    // base → O(delta) append (returns the cumulative staleness
    // counters) → statistics refresh ON THE DRIFT BUDGET
    // (Similarity.refreshTfidfIndexIfStale: the appended fifth
    // is 25% growth against the 10% budget, so the trigger trips
    // deterministically and re-derives fresh n/df/idf from the stored
    // raw-tf relation — no corpus re-tokenize; a below-budget append
    // would keep serving frozen, the branch TfidfLifecycleSpec pins)
    // → LSM compact (AFTER the refresh — r9 #6: refresh overwrites the
    // derived stores, so only tf/ ever needs the compaction pass)
    // → serve. Post-refresh service is value-identical to a
    // from-scratch build on the grown corpus, so the oracle is the
    // shared full-corpus one; per-verb wall cost and the staleness
    // counters are attributed by the [bench-phase] line.
    QueryDef("join_tfidf_append", tfidfOracle) { (s, d) =>
      val pristine = pristineTfidfBase(s, d)
      val phase = new Phases("join_tfidf_append")
      val idx = Tables.scratchDir("graft_tfidf_append")
      phase("copy") {
        graft.sources.Tables.linkCopyDirectory(pristine, new java.io.File(idx))
      }
      val st = phase("append") {
        Similarity.appendToTfidfIndex(idx,
          tfidfTerms(s, d).filter(col("doc_id") % 5 === 4))
      }
      // refresh BEFORE compact (VERDICT r9 #6 trim): the refresh
      // overwrites postings/ and vectors/ wholesale, so compacting
      // their append-fragmented files first was pure waste — after the
      // reorder the compact pass only ever rewrites tf/ partitions
      // (the one store the refresh reads instead of replacing). Verb
      // semantics are order-independent here: both orders end at the
      // same refreshed, compacted, served state (the shared oracle).
      val refreshed = phase("refresh") {
        Similarity.refreshTfidfIndexIfStale(s, idx, maxGrowthPpm = 100000L,
          st0 = Some(st))
      }
      require(refreshed, "25% corpus growth must trip the 10% drift budget")
      val rewritten = phase("compact") { Similarity.compactTfidfIndex(s, idx) }
      phase.emit(s""","compacted_parts":$rewritten""" +
        s""","appended_docs":${st.appendedDocs},"stat_n":${st.statN}""" +
        s""","growth_ppm":${st.growthPpm},"oov_mass_ppm":${st.oovMassPpm}""")
      Similarity.tfidfCosinePairsStored(s, idx, threshold = 0.3)
    },
    // the serve tier ALONE against the MAINTAINED index (VERDICT r10
    // #3): join_tfidf_append bundles six lifecycle verbs with the
    // full-corpus pair join, so a serve regression hides inside the
    // maintain bound (its 9.9 s floor decomposes ≈6 s maintain + ≈4 s
    // serve). The maintained layout — base build + appended fifth +
    // refreshed statistics + compacted tf — is stamp-cached once per
    // testdata; this query pays ONLY the stored pair join, giving the
    // serving path its own bench floor. Post-refresh service is
    // value-identical to a fresh full-corpus build, so the oracle is
    // the shared full-corpus contract.
    QueryDef("join_tfidf_serve_stored", tfidfOracle) { (s, d) =>
      Similarity.tfidfCosinePairsStored(s, maintainedTfidfIndex(s, d),
        threshold = 0.3)
    },
    // multimodal: binary payload + typed metadata + partition-batched
    // stub decode (see operators.Multimodal — only the codec is fake)
    QueryDef(
      "media_features",
      """SELECT doc_id, 'text/plain' AS media_type,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS content_md5,
        |  CAST(32 + n_chars % 480 AS INT) AS fake_width,
        |  CAST(32 + (n_chars * 7) % 480 AS INT) AS fake_height
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.extractFeatures(s, Multimodal.packBinary(Tables.table(s, d, "documents"))).toDF()
    },
    // decode-error accounting: plant truncated payloads (every 50th
    // doc), decode with the checked path, verify per-row error typing —
    // bad blobs yield typed errors, never exceptions or dropped rows
    QueryDef(
      "media_decode_errors",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 50 = 0 AND n_chars > 0 THEN NULL ELSE md5(text) END AS content_md5,
        |  CASE WHEN doc_id % 50 = 0 AND n_chars > 0 THEN 'TRUNCATED_PAYLOAD' END AS error
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.decodeWithErrors(
        s, Multimodal.corruptPayloads(Multimodal.packBinary(Tables.table(s, d, "documents"))))
        .toDF()
    },
    QueryDef(
      "media_frame_sample",
      """SELECT doc_id, unnest(range(0, n_chars % 10 + 1)) AS frame_idx
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.sampleFrames(Tables.table(s, d, "documents"))
    },
    // binary-payload near-dup (Multimodal.mediaNearDup — VERDICT r8
    // #6): byte-16-gram features over the opaque payload (raw binary
    // substrings — no charset assumption) → SimHash banding →
    // hamming refine → exact byte-gram Jaccard verify, Dedup's banded
    // machinery verbatim. The oracle is the quadratic all-pairs
    // Jaccard the engine never runs (payload = encode(text), so DuckDB
    // reconstructs identical bytes); the engine output matches it
    // exactly because verification is exact and the testdata's planted
    // pairs sit far inside the banding radius (DedupSpec pins recall).
    QueryDef(
      "media_neardup",
      """WITH p AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents
        |  WHERE length(hex(encode(text))) >= 32),
        |sh AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, length(hx) - 30, 2),
        |                          i -> substring(hx, i, 32))) AS s
        |  FROM p),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8""".stripMargin) { (s, d) =>
      Multimodal.mediaNearDup(
        Multimodal.packBinary(Tables.table(s, d, "documents")), threshold = 0.8)
    },
    // spatial radius self-join (operators.Spatial): grid-bucketed
    // candidate generation + exact distance verify — the engine runs
    // the 9-cell equi-join; the oracle is the O(n²) all-pairs form it
    // never runs. Points are synthesized from user ids via hash32 so
    // both engines derive identical dyadic coordinates.
    QueryDef(
      "join_spatial_radius",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |p AS (SELECT user_id AS pid,
        |    CAST((user_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 AS x,
        |    CAST(((user_id + 1000000007) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 AS y
        |  FROM u)
        |SELECT a.pid AS pid_a, b.pid AS pid_b,
        |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
        |FROM p a JOIN p b ON a.pid < b.pid
        |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 0.05 * 0.05""".stripMargin) { (s, d) =>
      import graft.operators.{CorpusOps, Spatial}
      val pts = Tables.table(s, d, "events").select(col("user_id")).distinct()
        .select(col("user_id").as("pid"),
          (CorpusOps.hash32(col("user_id")).cast("double") / 4294967296.0).as("x"),
          (CorpusOps.hash32(col("user_id") + 1000000007L).cast("double") / 4294967296.0).as("y"))
      Spatial.radiusSelfJoin(pts, col("pid"), col("x"), col("y"), r = 0.05)
    },
    // DBSCAN over a blob+scatter point cloud (the plain hash cloud is
    // a golden-ratio low-discrepancy lattice — near-CONSTANT local
    // density, so every point classifies identically; 8 hash-centered
    // 0.05-side blobs + 2-in-10 full-square scatter give real density
    // variation: 80 core / 41 border / 29 noise at sf0.01). Capped at
    // user_id < 2000 so the oracle's transitive closure stays bounded
    // at every SF. Pipeline: grid-bucketed neighbor join -> degree
    // classify (core = >= 8 others within eps, self excluded) ->
    // connected components over core-core edges -> min-label border
    // assignment. The eps^2 threshold is written CAST(0.02 AS DOUBLE)*
    // CAST(0.02 AS DOUBLE) so both engines compute the identical
    // rounded double (DuckDB's bare 0.02*0.02 is exact DECIMAL 0.0004,
    // which is NOT the double product).
    QueryDef(
      "cluster_dbscan",
      """WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 2000),
        |p0 AS (SELECT user_id AS pid, user_id % 10 AS g,
        |    CAST((user_id * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 AS h1,
        |    CAST(((user_id + 1000000007) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 AS h2,
        |    CAST(((user_id % 10) * 7919 * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 * CAST(0.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) AS cgx,
        |    CAST((((user_id % 10) * 7919 + 104729) * 2654435761) % 4294967296 AS DOUBLE) / 4294967296 * CAST(0.8 AS DOUBLE) + CAST(0.05 AS DOUBLE) AS cgy
        |  FROM u),
        |p AS (SELECT pid,
        |    CASE WHEN g < 8 THEN cgx + h1 * CAST(0.05 AS DOUBLE) ELSE h1 END AS x,
        |    CASE WHEN g < 8 THEN cgy + h2 * CAST(0.05 AS DOUBLE) ELSE h2 END AS y
        |  FROM p0),
        |e AS (SELECT a.pid AS pa, b.pid AS pb
        |  FROM p a JOIN p b ON a.pid < b.pid
        |  WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y)
        |        <= CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)),
        |sym AS (SELECT pa AS s, pb AS t FROM e UNION ALL SELECT pb, pa FROM e),
        |core AS (SELECT s AS pid FROM sym GROUP BY s HAVING count(*) >= 8),
        |ce AS (SELECT s, t FROM sym
        |  WHERE s IN (SELECT pid FROM core) AND t IN (SELECT pid FROM core)),
        |reach(node, r) AS (
        |  SELECT pid, pid FROM core
        |  UNION
        |  SELECT ce.s, reach.r FROM ce JOIN reach ON ce.t = reach.node),
        |cc AS (SELECT node, min(r) AS rep FROM reach GROUP BY node),
        |bord AS (SELECT sym.s AS pid, min(cc.rep) AS rep
        |  FROM sym JOIN cc ON sym.t = cc.node
        |  WHERE sym.s NOT IN (SELECT pid FROM core)
        |  GROUP BY sym.s)
        |SELECT p.pid,
        |  CASE WHEN cc.node IS NOT NULL THEN 'core'
        |       WHEN bord.pid IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  coalesce(cc.rep, bord.rep) AS cluster
        |FROM p LEFT JOIN cc ON p.pid = cc.node
        |LEFT JOIN bord ON p.pid = bord.pid""".stripMargin) { (s, d) =>
      import graft.operators.{CorpusOps, Spatial}
      val g = col("user_id") % 10
      val h1 = CorpusOps.hash32(col("user_id")).cast("double") / 4294967296.0
      val h2 = CorpusOps.hash32(col("user_id") + 1000000007L).cast("double") / 4294967296.0
      val cgx = CorpusOps.hash32(g * 7919L).cast("double") / 4294967296.0 * 0.8 + 0.05
      val cgy = CorpusOps.hash32(g * 7919L + 104729L).cast("double") / 4294967296.0 * 0.8 + 0.05
      val pts = Tables.table(s, d, "events")
        .filter(col("user_id") < 2000).select(col("user_id")).distinct()
        .select(col("user_id").as("pid"),
          when(g < 8, cgx + h1 * 0.05).otherwise(h1).as("x"),
          when(g < 8, cgy + h2 * 0.05).otherwise(h2).as("y"))
      Spatial.dbscan(pts, col("pid"), col("x"), col("y"), eps = 0.02, minPts = 8)
    },
    // edit-distance similarity self-join (typo-class near-duplicates):
    // symmetric-delete signatures → bucket join → exact levenshtein
    // verify on candidates only (operators.StringSimilarity); the
    // oracle is the O(n²) all-pairs form, which the engine never runs
    QueryDef(
      "join_editdistance",
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  levenshtein(a.c_name, b.c_name) AS dist
        |FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin) { (s, d) =>
      graft.operators.StringSimilarity.editDistanceSelfJoin(
        Tables.table(s, d, "customer"), col("c_custkey"), col("c_name"), tau = 1)
    },
    // entity resolution: the edit-distance match pairs, closed into
    // entities by connected components (min-key representative), with
    // singletons kept as their own entity — the record-linkage output a
    // master-data pipeline publishes. Engine path: symmetric-delete
    // blocking → candidate equi-join → exact verify → O(log n) CC; the
    // oracle is all-pairs levenshtein + a recursive reachability CTE.
    QueryDef(
      "entity_clusters",
      """WITH RECURSIVE pairs AS (SELECT a.c_custkey AS da, b.c_custkey AS db
        |  FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 1),
        |sym AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db, da FROM pairs),
        |reach(node, r) AS (
        |  SELECT a, a FROM sym
        |  UNION
        |  SELECT s.a, reach.r FROM sym s JOIN reach ON s.b = reach.node),
        |cc AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
        |SELECT c.c_custkey, coalesce(cc.rep, c.c_custkey) AS entity_rep
        |FROM customer c LEFT JOIN cc ON c.c_custkey = cc.node""".stripMargin) { (s, d) =>
      val cust = Tables.table(s, d, "customer")
      val pairs = graft.operators.StringSimilarity.editDistanceSelfJoin(
        cust, col("c_custkey"), col("c_name"), tau = 1)
      val cc = graft.operators.Dedup.connectedComponents(
        pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      cust.select(col("c_custkey"))
        .join(cc, col("c_custkey") === col("node"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("rep"), col("c_custkey")).as("entity_rep"))
    },
    // Fellegi-Sunter probabilistic record linkage over (nation,
    // segment, balance-band)-blocked candidate pairs — multi-key
    // blocking, the standard ER candidate discipline (raw
    // nation-segment blocks are 6x the pairs for the same planted
    // signal; measured 9.5 s -> ~1.5 s at sf0.1): three comparisons
    // (name edit distance <= 2, balance within 50, key within 100 — an
    // ingestion-batch proxy) contribute log2(m/u) / log2((1-m)/(1-u))
    // integer-micro weights, summed exactly; thresholds at +-6e6 cut
    // match / possible / nonmatch, and only the match + review queue
    // is published. The weights are Scala-computed literals planted
    // into BOTH plans — the distributed side does zero float math.
    QueryDef(
      "entity_fellegi_sunter", {
        import graft.operators.StringSimilarity.fsWeights
        val (naW, ndW) = fsWeights(0.9, 0.1)
        val (baW, bdW) = fsWeights(0.8, 0.01)
        val (kaW, kdW) = fsWeights(0.6, 0.02)
        s"""WITH p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           |    CASE WHEN levenshtein(a.c_name, b.c_name) <= 2 THEN 1 ELSE 0 END AS agree_name,
           |    CASE WHEN abs(a.c_acctbal - b.c_acctbal) < 50 THEN 1 ELSE 0 END AS agree_bal,
           |    CASE WHEN abs(a.c_custkey - b.c_custkey) < 100 THEN 1 ELSE 0 END AS agree_key
           |  FROM customer a JOIN customer b
           |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
           |    AND floor(a.c_acctbal / 2000) = floor(b.c_acctbal / 2000)
           |    AND a.c_custkey < b.c_custkey),
           |w AS (SELECT id_a, id_b, agree_name, agree_bal, agree_key,
           |    CAST((CASE WHEN agree_name = 1 THEN $naW ELSE $ndW END)
           |       + (CASE WHEN agree_bal = 1 THEN $baW ELSE $bdW END)
           |       + (CASE WHEN agree_key = 1 THEN $kaW ELSE $kdW END) AS BIGINT) AS weight_micros
           |  FROM p)
           |SELECT id_a, id_b, agree_name, agree_bal, agree_key, weight_micros,
           |  CASE WHEN weight_micros >= 6000000 THEN 'match' ELSE 'possible' END AS decision
           |FROM w WHERE NOT weight_micros <= -6000000""".stripMargin
      }) { (s, d) =>
      import graft.operators.StringSimilarity
      val cust = Tables.table(s, d, "customer")
      val pairs = cust.as("a").join(cust.as("b"),
          col("a.c_nationkey") === col("b.c_nationkey") &&
            col("a.c_mktsegment") === col("b.c_mktsegment") &&
            floor(col("a.c_acctbal") / 2000) === floor(col("b.c_acctbal") / 2000) &&
            col("a.c_custkey") < col("b.c_custkey"))
        .select(col("a.c_custkey").as("id_a"), col("b.c_custkey").as("id_b"),
          col("a.c_name").as("na"), col("b.c_name").as("nb"),
          col("a.c_acctbal").as("ba"), col("b.c_acctbal").as("bb"))
      StringSimilarity.fellegiSunter(pairs,
          Seq(
            ("name", levenshtein(col("na"), col("nb")) <= 2, 0.9, 0.1),
            ("bal", abs(col("ba") - col("bb")) < 50, 0.8, 0.01),
            ("key", abs(col("id_a") - col("id_b")) < 100, 0.6, 0.02)),
          upperMicros = 6000000L, lowerMicros = -6000000L)
        .filter(col("decision") =!= "nonmatch")
        .select(col("id_a"), col("id_b"), col("agree_name"), col("agree_bal"),
          col("agree_key"), col("weight_micros"), col("decision"))
    },
    // sorted-neighborhood blocking (Hernández–Stolfo merge/purge): ER
    // candidates limited to a width-4 window over the global c_name
    // sort order, verified levenshtein ≤ 2 — the linear-candidate
    // alternative to symmetric-delete blocking when keys are long or τ
    // is loose. The engine never sorts globally (range partition +
    // prefix-offset ranks) and never joins all pairs (n·(w−1)
    // candidates); the oracle replays the definition directly off one
    // window rank.
    QueryDef(
      "entity_sorted_neighborhood",
      """WITH r AS (SELECT c_custkey AS id, c_name AS k,
        |    row_number() OVER (ORDER BY c_name, c_custkey) - 1 AS r FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b, levenshtein(a.k, b.k) AS dist
        |FROM r a JOIN r b ON b.r > a.r AND b.r - a.r < 4
        |WHERE levenshtein(a.k, b.k) <= 2""".stripMargin) { (s, d) =>
      graft.operators.StringSimilarity.sortedNeighborhoodJoin(
        Tables.table(s, d, "customer"), col("c_custkey"), col("c_name"),
        window = 4, tau = 2)
    },
    // MMR diversified retrieval (Similarity.mmrSelect): 16-deep
    // relevance shortlists, 5 greedy picks, λ = 0.7 — every sim pinned
    // to integer micros so the greedy argmax chain is BIGINT-exact and
    // the oracle can replay it as unrolled CTE stages (one per pick,
    // the Lloyd-unroll pattern). Scores themselves hash-match.
    QueryDef("search_mmr", SimilarityQueries.mmrOracle(
      k = 5, shortlist = 16, lambdaPpm = 700000L)) { (s, d) =>
      Similarity.mmrSelect(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, shortlist = 16, lambdaPpm = 700000L)
    }
  )

  /** Unrolled MMR greedy replay: pick 1 = relevance argmax; pick p's
    * stage anti-joins the selected set, takes each survivor's max
    * pairwise sim to it (correlated max over the shortlist² pair CTE),
    * and re-runs the λ-blended argmax. Shares [[normCte]]'s fold, the
    * same micros rounding, and the same (score DESC, vid) tie order as
    * the engine's max_by. */
  private def mmrOracle(k: Int, shortlist: Int, lambdaPpm: Long): String = {
    val lam = lambdaPpm
    val lam1 = 1000000L - lambdaPpm
    def cosMicros(a: String, b: String, an: String, bn: String) =
      s"CAST(round(list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y) / ($an * $bn) * 1000000, 0) AS BIGINT)"
    val steps = (2 to k).map { p =>
      s"""c$p AS (SELECT sl.qid, sl.vid,
         |    CAST($lam AS BIGINT) * sl.simq - CAST($lam1 AS BIGINT) * coalesce((SELECT max(pr.psim) FROM pr JOIN sel${p - 1} s ON s.qid = pr.qid AND s.vid = pr.bv WHERE pr.qid = sl.qid AND pr.av = sl.vid), 0) AS score
         |  FROM sl WHERE NOT EXISTS (SELECT 1 FROM sel${p - 1} s WHERE s.qid = sl.qid AND s.vid = sl.vid)),
         |p$p AS (SELECT qid, vid, $p AS pick, score FROM (SELECT qid, vid, score, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vid) AS rn FROM c$p) WHERE rn = 1),
         |sel$p AS (SELECT * FROM sel${p - 1} UNION ALL SELECT * FROM p$p)""".stripMargin
    }.mkString(",\n")
    s"""$normCte,
       |q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id % 50 = 0),
       |s0 AS (SELECT q.qid, n.vec_id AS vid, n.v, n.nrm,
       |    ${cosMicros("q.qv", "n.v", "q.qn", "n.nrm")} AS simq
       |  FROM q JOIN n ON n.vec_id <> q.qid),
       |sl AS (SELECT qid, vid, v, nrm, simq FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY simq DESC, vid) AS rn FROM s0) WHERE rn <= $shortlist),
       |pr AS (SELECT a.qid, a.vid AS av, b.vid AS bv,
       |    ${cosMicros("a.v", "b.v", "a.nrm", "b.nrm")} AS psim
       |  FROM sl a JOIN sl b ON a.qid = b.qid AND a.vid <> b.vid),
       |sel1 AS (SELECT qid, vid, 1 AS pick, score
       |  FROM (SELECT qid, vid, CAST($lam AS BIGINT) * simq AS score, row_number() OVER (PARTITION BY qid ORDER BY CAST($lam AS BIGINT) * simq DESC, vid) AS rn FROM sl) WHERE rn = 1),
       |$steps
       |SELECT qid AS query_id, pick, vid AS neighbor_id, score AS mmr_micros FROM sel$k""".stripMargin
  }
}
