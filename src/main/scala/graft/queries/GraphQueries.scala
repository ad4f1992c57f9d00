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

  private val bfsHops = 6

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
    }
  )
}
