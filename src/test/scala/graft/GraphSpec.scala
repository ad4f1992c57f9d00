package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  /** Naive single-machine reimplementation of the exact integer
    * recurrence — the operator must reproduce it bit-for-bit. */
  private def naive(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = e.map(_._1).distinct
    var ranks = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => ranks.getOrElse(u, 0L) / deg(u) }.sum).toMap
      ranks = nodes.map(n => n -> (150000L + (850000L * in.getOrElse(n, 0L)) / 1000000L)).toMap
    }
    ranks
  }

  test("pageRank matches the exact integer recurrence on a directed graph") {
    import spark.implicits._
    // 1 is a hub; 4 only links out; 2↔3 cycle
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L), (2L, 1L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive(edges, 5))
  }

  test("pageRank is partitioning-invariant (exact integer determinism)") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1)))
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(1), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(13), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("symmetric cycle is a fixed point at rank = scale") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 3).collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1000000L, 1000000L))
  }
}
