package graft.queries

import graft.QueryDef
import graft.operators.Graph
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over a business-entity graph: suppliers and customers
  * connected whenever a lineitem links them through an order (customer
  * node ids offset by 10M out of the supplier key space), symmetrized to
  * an undirected graph. PageRank runs in exact fixed-point integer
  * arithmetic (Graph.pageRank determinism contract), so the oracle — the
  * same power iteration unrolled as chained CTEs — hash-matches exactly.
  */
object GraphQueries {

  private val iters = 6

  private def pagerankOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |  CAST(150000 + (850000 * coalesce(c.s, 0)) // 1000000 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
         |    FROM r${i - 1} r JOIN edges e ON r.node = e.src JOIN deg d ON d.node = e.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") + s"\nSELECT node, rank FROM r$iters"
  }

  /** Unrolled PERSONALIZED PageRank — same power iteration as
    * [[pagerankOracle]], but rank₀ and the per-round teleport term are
    * gated on the seed predicate (suppliers 1..5, i.e. node <= 5 in
    * the offset key scheme). */
  private def pprOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS node FROM edges),
        |r0 AS (SELECT node, CAST(CASE WHEN node <= 5 THEN 1000000 ELSE 0 END AS BIGINT) AS rank FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         |  CAST((CASE WHEN n.node <= 5 THEN 150000 ELSE 0 END)
         |    + (850000 * coalesce(c.s, 0)) // 1000000 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank // d.outdeg) AS s
         |    FROM r${i - 1} r JOIN edges e ON r.node = e.src JOIN deg d ON d.node = e.src
         |    WHERE r.rank > 0
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") + s"\nSELECT node, rank FROM r$iters"
  }

  private val bfsHops = 6

  private val lpaIters = 4

  /** Unrolled synchronous label propagation — the same (count DESC,
    * label ASC) argmax Graph.labelPropagation computes via its packed-
    * BIGINT aggregation, replayed with the identical packing so the
    * result hash-matches bit-for-bit. */
  private def lpaOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)""".stripMargin
    val rounds = (1 to lpaIters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, l.label, count(*) AS cnt
         |  FROM l${i - 1} l JOIN edges e ON l.node = e.src GROUP BY e.dst, l.label),
         |l$i AS (SELECT node,
         |  CAST(4294967295 - (max(cnt * 4294967296 + (4294967295 - label)) % 4294967296) AS BIGINT) AS label
         |  FROM c$i GROUP BY node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") + s"\nSELECT node, label FROM l$lpaIters"
  }

  /** The LPA rounds feeding Newman modularity over the same graph —
    * the community-quality metric as one exact-integer row (q_num =
    * Σ_c (m_c·|E| − d_c²) is a pure BIGINT; sum is CAST back from
    * DuckDB's HUGEINT so the comparator sees the integer). */
  private def lpaModularityOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)""".stripMargin
    val rounds = (1 to lpaIters).map { i =>
      s"""c$i AS (SELECT e.dst AS node, l.label, count(*) AS cnt
         |  FROM l${i - 1} l JOIN edges e ON l.node = e.src GROUP BY e.dst, l.label),
         |l$i AS (SELECT node,
         |  CAST(4294967295 - (max(cnt * 4294967296 + (4294967295 - label)) % 4294967296) AS BIGINT) AS label
         |  FROM c$i GROUP BY node)""".stripMargin
    }
    val tail =
      s"""t AS (SELECT count(*) AS m2 FROM edges),
         |tg AS (SELECT la.label AS ls, lb.label AS ld
         |  FROM edges e JOIN l$lpaIters la ON la.node = e.src
         |  JOIN l$lpaIters lb ON lb.node = e.dst),
         |deg AS (SELECT ls AS label, count(*) AS dc FROM tg GROUP BY ls),
         |intra AS (SELECT ls AS label, count(*) AS mc FROM tg WHERE ls = ld GROUP BY ls),
         |parts AS (SELECT d.label, coalesce(i.mc, 0) * t.m2 - d.dc * d.dc AS num, t.m2
         |  FROM deg d LEFT JOIN intra i ON i.label = d.label, t)
         |SELECT count(*) AS n_communities, max(m2) AS m2,
         |  CAST(sum(num) AS BIGINT) AS q_num,
         |  round(CAST(sum(num) AS DOUBLE) / CAST(max(m2) * max(m2) AS DOUBLE), 6) AS modularity
         |FROM parts""".stripMargin
    (Seq(head) ++ rounds ++ Seq(tail)).mkString(",\n")
  }

  private val coreK = 5
  private val coreIters = 4

  /** Unrolled k-core peeling. Each round's shrunken edge list is
    * referenced twice (degree filter + prune), so every e_i is
    * MATERIALIZED — without it DuckDB inlines the chain and the oracle
    * goes exponential in round count (measured 1.0 s → 0.1 s at 4
    * rounds, sf0.01). The semi joins are replayed as inner joins
    * against the survivor set, equivalent because survivors are
    * unique. */
  private def kcoreOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |e0s AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)""".stripMargin
    val rounds = (1 to coreIters).map { i =>
      val prev = if (i == 1) "e0s" else s"e${i - 1}"
      s"""k$i AS (SELECT src AS node FROM $prev GROUP BY src HAVING count(*) >= $coreK),
         |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM $prev e
         |  JOIN k$i a ON e.src = a.node JOIN k$i b ON e.dst = b.node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") +
      s"\nSELECT src AS node, count(*) AS core_deg FROM e$coreIters GROUP BY src"
  }

  /** Unrolled frontier-restricted min-distance propagation — the same
    * recurrence Graph.bfs executes, as chained CTEs. */
  private def bfsOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 45),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d0 AS (SELECT s_suppkey AS node, 0 AS dist FROM supplier WHERE s_suppkey <= 5)""".stripMargin
    val rounds = (1 to bfsHops).map { i =>
      s"""d$i AS (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, ${i} AS dist
         |  FROM d${i - 1} f JOIN e ON f.node = e.src WHERE f.dist = ${i - 1})
         |  GROUP BY node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") + s"\nSELECT node, dist FROM d$bfsHops"
  }

  /** Unrolled PER-SEED min-distance propagation (the (seed, node)-keyed
    * twin of [[bfsOracle]]) folded into harmonic centrality: Σ 1/d in
    * exact integer ppm (1000000 div d), unreached nodes contributing
    * nothing — Boldi & Vigna's disconnected-safe closeness variant. */
  private def harmonicOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 45),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d0 AS (SELECT s_suppkey AS seed, s_suppkey AS node, 0 AS dist
        |  FROM supplier WHERE s_suppkey <= 5)""".stripMargin
    val rounds = (1 to bfsHops).map { i =>
      s"""d$i AS (SELECT seed, node, min(dist) AS dist FROM (
         |  SELECT seed, node, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT f.seed, e.dst AS node, ${i} AS dist
         |  FROM d${i - 1} f JOIN e ON f.node = e.src WHERE f.dist = ${i - 1})
         |  GROUP BY seed, node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") +
      s"""
         |SELECT seed, CAST(sum(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END) AS BIGINT) AS harmonic_ppm,
         |  count(*) - 1 AS n_reached
         |FROM d$bfsHops GROUP BY seed""".stripMargin
  }

  private val ssspRounds = 6

  /** Unrolled Bellman–Ford — FULL relaxation every round, which
    * Graph.sssp's frontier-restricted relaxation provably equals (a
    * settled node's candidates are duplicates under min; see the
    * operator's Scaladoc). Edge weight = min l_quantity per
    * (supplier, customer) pair — integral by data contract (all
    * quantities are whole numbers), so every distance is an exact
    * BIGINT. */
  private def ssspOracle: String = {
    val head =
      """WITH e0 AS (
        |  SELECT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst,
        |    CAST(min(l.l_quantity) AS BIGINT) AS w
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |e AS (SELECT src, dst, w FROM e0 UNION ALL SELECT dst, src, w FROM e0),
        |d0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist FROM e WHERE src <= 5)""".stripMargin
    val rounds = (1 to ssspRounds).map { i =>
      s"""d$i AS (SELECT node, min(dist) AS dist FROM (
         |  SELECT node, dist FROM d${i - 1}
         |  UNION ALL
         |  SELECT e.dst AS node, f.dist + e.w AS dist
         |  FROM d${i - 1} f JOIN e ON f.node = e.src)
         |  GROUP BY node)""".stripMargin
    }
    (Seq(head) ++ rounds).mkString(",\n") + s"\nSELECT node, dist FROM d$ssspRounds"
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("graph_pagerank", pagerankOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem").select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val d0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      // d0 is distinct and src/dst live in disjoint key ranges (custkey
      // offset by 10M), so the symmetrized union is duplicate-free —
      // pageRank can skip its defensive edge dedup shuffle
      // supplier+customer node set is dimension-scale → rank table
      // broadcasts; the 1M+-row edge list never re-shuffles per round
      Graph.pageRank(d0.union(d0.select(col("dst"), col("src"))), iters,
        edgesDistinct = true, broadcastRanks = true)
    },
    // PERSONALIZED PageRank from suppliers 1..5 on the same graph:
    // random-walk proximity to the seed set (the related-items /
    // seed-expansion primitive), not global centrality — teleport mass
    // returns only to the seeds, and early rounds stay frontier-sized
    // because rank-0 nodes are dropped from the contribution join
    QueryDef("graph_ppr", pprOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem").select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val d0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      val seeds = Tables.table(s, d, "supplier")
        .filter(col("s_suppkey") <= 5).select(col("s_suppkey").as("node"))
      Graph.personalizedPageRank(d0.union(d0.select(col("dst"), col("src"))), seeds,
        iters, edgesDistinct = true, broadcastRanks = true)
    },
    // exact triangle count on the orders co-purchase-window graph (two
    // orders connected iff same customer AND same year — per-group
    // cliques, sparse and scale-linear). Spark runs degree-oriented
    // node-iterator (O(|E|^1.5) wedge bound); the oracle counts the
    // id-ordered 3-way join — both count each triangle exactly once
    QueryDef(
      "graph_triangles",
      """WITH e AS (
        |  SELECT a.o_orderkey AS u, b.o_orderkey AS v
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND year(a.o_orderdate) = year(b.o_orderdate)
        |    AND a.o_orderkey < b.o_orderkey)
        |SELECT count(*) AS triangles
        |FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      val a = o.select(col("o_orderkey").as("u"), col("o_custkey"), col("y"))
      val b = o.select(col("o_orderkey").as("v"), col("o_custkey"), col("y"))
      val edges = a.join(b, Seq("o_custkey", "y")).where(col("u") < col("v"))
        .select(col("u"), col("v"))
      Graph.triangleCount(edges)
    },
    // per-node local clustering coefficient on the same co-purchase
    // graph: triangles enumerated once (degree orientation), each
    // crediting its three corners — exact-ppm ego density per node,
    // NULL where degree < 2 leaves it undefined
    QueryDef(
      "graph_local_clustering",
      """WITH e AS (
        |  SELECT a.o_orderkey AS u, b.o_orderkey AS v
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND year(a.o_orderdate) = year(b.o_orderdate)
        |    AND a.o_orderkey < b.o_orderkey),
        |deg AS (SELECT n, count(*) AS d FROM (
        |  SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
        |tri AS (SELECT e1.u AS c1, e1.v AS c2, e2.v AS c3
        |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |corners AS (SELECT n, count(*) AS t FROM (
        |  SELECT unnest([c1, c2, c3]) AS n FROM tri) GROUP BY n)
        |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(coalesce(corners.t, 0) AS BIGINT) AS triangles,
        |  CASE WHEN deg.d >= 2
        |    THEN CAST(coalesce(corners.t, 0) * 2000000 // (deg.d * (deg.d - 1)) AS BIGINT)
        |  END AS lcc_ppm
        |FROM deg LEFT JOIN corners ON deg.n = corners.n""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      val a = o.select(col("o_orderkey").as("u"), col("o_custkey"), col("y"))
      val b = o.select(col("o_orderkey").as("v"), col("o_custkey"), col("y"))
      val edges = a.join(b, Seq("o_custkey", "y")).where(col("u") < col("v"))
        .select(col("u"), col("v"))
      Graph.localClustering(edges)
    },
    // multi-source BFS over the sparse high-quantity supplier↔customer
    // graph: min hop distance from suppliers 1..5, 6 rounds
    QueryDef("graph_bfs", bfsOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 45)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.table(s, d, "supplier")
        .where(col("s_suppkey") <= 5).select(col("s_suppkey").as("node"))
      Graph.bfs(edges, seeds, bfsHops, broadcastFrontier = true)
    },
    // harmonic centrality for the same 5-seed sample over the same
    // graph: per-seed BFS trees (state keyed (seed, node) — bounded by
    // |seeds|·|V|), H(s) = Σ 1/d in exact integer ppm, radius-6
    // truncated. The bounded-seed-sample regime is how centrality is
    // computed at scale; all-nodes exact harmonic is all-pairs BFS.
    QueryDef("graph_harmonic", harmonicOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 45)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = Tables.table(s, d, "supplier")
        .where(col("s_suppkey") <= 5).select(col("s_suppkey").as("node"))
      Graph.harmonicCentrality(edges, seeds, bfsHops)
    },
    // synchronous label propagation on the same sparse graph: 1417
    // nodes converge to ~129 communities in 4 rounds at sf0.01
    QueryDef("graph_label_prop", lpaOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      Graph.labelPropagation(
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))), lpaIters)
    },
    // k-core peeling, k=5: a real cascade at sf0.01 (1902 → 1894 →
    // 1870 edges, fixed point inside the 4 rounds)
    QueryDef("graph_kcore", kcoreOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      Graph.kCore(
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))), coreK, coreIters)
    },
    // common-neighbors link prediction on the sparse graph: pairs
    // sharing ≥ 3 neighbors with exact-ppm neighborhood Jaccard
    QueryDef(
      "graph_common_neighbors",
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src AS n, count(*) AS d FROM e GROUP BY src),
        |cn AS (
        |  SELECT a.dst AS u, b.dst AS v, count(*) AS common
        |  FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
        |  GROUP BY a.dst, b.dst HAVING count(*) >= 3)
        |SELECT u, v, common,
        |  CAST(common * 1000000 // (du.d + dv.d - common) AS BIGINT) AS jaccard_ppm
        |FROM cn JOIN deg du ON du.n = u JOIN deg dv ON dv.n = v""".stripMargin) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      Graph.commonNeighbors(
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))), minCommon = 3)
    },
    // Adamic-Adar on the same graph: common-neighbor evidence weighted
    // by 1/ln(center degree) — shared rare neighbors count more than
    // shared hubs. Per-wedge terms rounded to integer micros BEFORE
    // summing, so the score aggregate is an exact order-free BIGINT.
    QueryDef(
      "graph_adamic_adar",
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src AS x, count(*) AS d FROM e GROUP BY src),
        |w AS (SELECT a.dst AS u, b.dst AS v,
        |    CAST(round(1000000 / ln(deg.d), 0) AS BIGINT) AS t
        |  FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
        |  JOIN deg ON deg.x = a.src)
        |SELECT u, v, CAST(count(*) AS BIGINT) AS common, CAST(sum(t) AS BIGINT) AS aa_micros
        |FROM w GROUP BY u, v HAVING count(*) >= 3""".stripMargin) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      Graph.adamicAdar(
        e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))), minCommon = 3)
    },
    // Newman modularity of the LPA communities — the quality metric
    // for the partition, one exact-integer row (Graph.modularity)
    QueryDef("graph_lpa_modularity", lpaModularityOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      Graph.modularity(sym, Graph.labelPropagation(sym, lpaIters))
    },
    // weighted shortest paths from suppliers 1–5 (Graph.sssp):
    // frontier-restricted Bellman–Ford, exact BIGINT distances
    QueryDef("graph_sssp", ssspOracle) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .agg(min(col("l_quantity")).cast("long").as("w"))
      val edges = e0.union(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val seeds = edges.where(col("src") <= 5).select(col("src").as("node")).distinct()
      Graph.sssp(edges, seeds, ssspRounds)
    },
    // degree assortativity (Newman 2002): Pearson correlation of
    // endpoint degrees over the symmetrized edge list — one edge-level
    // join against the degree table, exact BIGINT moment sums, one
    // double formula from identical operands in both engines. The
    // bipartite supplier↔customer graph is strongly DISassortative
    // (hubs connect to leaves), which the metric reports directly.
    QueryDef(
      "graph_assortativity",
      """WITH e0 AS (
        |  SELECT DISTINCT l.l_suppkey AS src, o.o_custkey + 10000000 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_quantity >= 48),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
        |p AS (SELECT da.d AS x, db.d AS y FROM e
        |  JOIN deg da ON da.node = e.src JOIN deg db ON db.node = e.dst),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy FROM p)
        |SELECT m, round((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
        |  (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |   * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS assortativity
        |FROM s""".stripMargin) { (s, d) =>
      val l = Tables.table(s, d, "lineitem")
        .where(col("l_quantity") >= 48)
        .select(col("l_suppkey"), col("l_orderkey"))
      val o = Tables.table(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val e0 = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("src"), (col("o_custkey") + 10000000L).as("dst"))
        .distinct()
      val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      val p = e
        .join(deg.select(col("node").as("na"), col("d").as("x")), col("src") === col("na"))
        .join(deg.select(col("node").as("nb"), col("d").as("y")), col("dst") === col("nb"))
        .select(col("x"), col("y"))
      val sums = p.agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val md = col("m").cast("double")
      sums.select(col("m"),
        round((md * col("sxy") - col("sx").cast("double") * col("sy")) /
          (sqrt(md * col("sxx") - col("sx").cast("double") * col("sx"))
            * sqrt(md * col("syy") - col("sy").cast("double") * col("sy"))), 6)
          .as("assortativity"))
    },
    // global clustering coefficient = 3·triangles / wedges over the
    // co-order graph graph_triangles counts: wedges are one pass over
    // the degree table (Σ d(d−1)/2, exact BIGINT), triangles reuse the
    // degree-oriented O(E^1.5) counter — the transitivity metric next
    // to the raw triangle count
    QueryDef(
      "graph_clustering_coeff",
      """WITH e AS (
        |  SELECT a.o_orderkey AS u, b.o_orderkey AS v
        |  FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey
        |    AND year(a.o_orderdate) = year(b.o_orderdate)
        |    AND a.o_orderkey < b.o_orderkey),
        |sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
        |wed AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS wedges FROM deg),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS triangles
        |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |SELECT triangles, wedges,
        |  round(3.0 * triangles / wedges, 6) AS global_cc
        |FROM tri, wed""".stripMargin) { (s, d) =>
      val o = Tables.table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("y"))
      val a = o.select(col("o_orderkey").as("u"), col("o_custkey"), col("y"))
      val b = o.select(col("o_orderkey").as("v"), col("o_custkey"), col("y"))
      val edges = a.join(b, Seq("o_custkey", "y")).where(col("u") < col("v"))
        .select(col("u"), col("v"))
      val sym = edges.select(col("u").as("a")).union(edges.select(col("v").as("a")))
      val wed = sym.groupBy("a").agg(count(lit(1)).as("d"))
        .agg(sum(expr("d * (d - 1) div 2")).as("wedges"))
      Graph.triangleCount(edges)
        .crossJoin(broadcast(wed))
        .select(col("triangles"), col("wedges"),
          round(lit(3.0) * col("triangles") / col("wedges"), 6).as("global_cc"))
    }
  )
}
