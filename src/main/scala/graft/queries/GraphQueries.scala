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
      Graph.pageRank(d0.union(d0.select(col("dst"), col("src"))), iters,
        edgesDistinct = true)
    }
  )
}
