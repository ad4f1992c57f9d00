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
    QueryDef(
      "ann_ivf",
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
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, cid) AS qrn FROM pr0) WHERE qrn <= 2),
         |sc AS (SELECT pr.qid, asg.vid,
         |  list_reduce(list_prepend(0.0, list_transform(range(1, len(pr.qv) + 1), i -> pr.qv[i] * asg.v[i])), (x, y) -> x + y) / (pr.qn * asg.nrm) AS cos
         |  FROM pr JOIN asg USING (cid) WHERE asg.vid <> pr.qid),
         |r AS (SELECT qid, vid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rnk FROM sc)
         |SELECT qid AS query_id, vid AS neighbor_id, rnk, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 5""".stripMargin) { (s, d) =>
      Similarity.topKIvf(
        Tables.table(s, d, "embeddings"), col("embedding"), col("vec_id"),
        col("vec_id") % 50 === 0, k = 5, nCentroids = 8, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
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
    }
  )
}
