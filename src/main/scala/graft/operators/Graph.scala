package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — PageRank as the power-
  * iteration companion to Dedup.connectedComponents (the other
  * fixed-point operator in this engine). Same Pregel-on-DataFrames
  * dataflow as GraphX/GraphFrames express, but declarative: each
  * round is join(edges, ranks) → groupBy(dst).sum — partial aggregation
  * map-side, shuffle keyed by dst only.
  *
  * Determinism contract: ranks are FIXED-POINT integers (micro-units,
  * `scale` = 1.0) and every operation is integral — `div` truncation and
  * exact long sums are order-independent, so the result is bit-stable
  * across partitionings AND reproducible by the DuckDB oracle (floating
  * point would drift under Spark's nondeterministic reduce order).
  *
  * Scale shape (100 TB): the edge list with out-degrees is checkpointed
  * ONCE and re-read every round; each iteration shuffles one (node, sum)
  * pair per distinct dst per map partition. Lineage is truncated per
  * round through RDD-level localCheckpoint (the unpersistable-DataFrame
  * gotcha documented at Dedup.connectedComponentsWithRounds), superseded
  * round blocks freed immediately — peak footprint is edges + 2 rank
  * vectors regardless of iteration count.
  */
object Graph {

  /** `iters` rounds of damped PageRank over directed `edges(src, dst)`.
    * rank₀ = scale; rankᵢ₊₁(v) = (scale−damping) + damping·Σ_{u→v}
    * (rankᵢ(u) div outdeg(u)) div scale. Nodes = all edge endpoints
    * that appear as a source; callers wanting undirected semantics
    * symmetrize first (then every endpoint is a source). Dangling mass
    * is dropped, the standard non-normalized formulation. */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
      damping: Long = 850000L, edgesDistinct: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val base = scale - damping

    def ckpt(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]) = {
      val (out, rdd, _) = Iterate.ckpt(df)
      (out, rdd)
    }

    // `edgesDistinct = true` lets callers that already deduplicated (or
    // construct provably duplicate-free edges, e.g. a symmetrized
    // distinct bipartite list) skip a full edge-list shuffle here
    val e0 = edges.select(col("src"), col("dst"))
    val e = if (edgesDistinct) e0 else e0.distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg) materialized once, reused by every round
    val (edC, _) = ckpt(e.join(deg, "src"))
    // nodes materialized once too — left lazy it would re-run a full
    // edge-list distinct inside EVERY round's plan (6× the edge scan)
    val (nodes, _) = ckpt(edC.select(col("src").as("node")).distinct())

    var ranks = nodes.withColumn("rank", lit(scale))
    var prevRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] = null
    for (_ <- 1 to iters) {
      val contribs = edC.join(ranks, edC("src") === ranks("node"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("s"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST($base + ($damping * coalesce(s, 0)) div $scale AS BIGINT)").as("rank"))
      val (nextDf, rdd) = ckpt(next)
      if (prevRdd != null) prevRdd.unpersist(blocking = false): Unit
      ranks = nextDf
      prevRdd = rdd
    }
    ranks
  }
}
