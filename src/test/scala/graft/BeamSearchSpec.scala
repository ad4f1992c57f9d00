package graft

import graft.operators.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Graph-ANN beam search contracts the oracle can't see: recall against
  * exact brute force (the walk must actually navigate toward true
  * neighbors, not just return well-formed rows), and the monotone-beam
  * property (more rounds never lose beam members' scores).
  */
class BeamSearchSpec extends SparkSpec {

  test("beam search recall@5 vs brute force clears the floor; walk beats its seed") {
    val emb = Tables.table(spark, sf, "embeddings")
    val isQ = col("vec_id") % 50 === 0
    val idx = Tables.scratchDir("spec_knn_beam")
    Similarity.writeKnnGraphIndex(
      Similarity.knnGraphExact(emb, col("embedding"), col("vec_id"), 8),
      emb, col("embedding"), col("vec_id"),
      Similarity.ivfAssignments(emb, col("embedding"), col("vec_id"), 8)
        .groupBy("cid").agg(min(col("vid")).as("vid")),
      idx)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.topKBruteForce(
      emb, col("embedding"), col("vec_id"), isQ, k = 5)
      .select("query_id", "neighbor_id"))
    val beam = pairs(Similarity.beamSearchKnnStored(idx,
      emb.filter(isQ), col("embedding"), col("vec_id"),
      k = 5, nProbe = 4, beamWidth = 16, rounds = 4)
      .select("query_id", "neighbor_id"))
    val recall = (truth intersect beam).size.toDouble / truth.size
    info(f"beam recall@5 = $recall%.3f over ${truth.size} truth pairs")
    // structureless random 64-d vectors are graph ANN's published
    // worst case; the walk still measures 0.78 here — floor with margin
    assert(recall >= 0.6, f"beam recall collapsed: $recall%.3f < 0.6")

    // the walk must beat its own seed tier (1 round ≈ entry scoring +
    // one expansion, measured 0.10): with no expand value the graph
    // tier would be dead weight over plain entry probing
    val seedOnly = pairs(Similarity.beamSearchKnnStored(idx,
      emb.filter(isQ), col("embedding"), col("vec_id"),
      k = 5, nProbe = 4, beamWidth = 16, rounds = 1)
      .select("query_id", "neighbor_id"))
    val seedRecall = (truth intersect seedOnly).size.toDouble / truth.size
    info(f"1-round recall@5 = $seedRecall%.3f")
    assert(recall > seedRecall,
      f"4-round walk ($recall%.3f) must beat the 1-round walk ($seedRecall%.3f)")
    spark.catalog.clearCache()
    Tables.deleteRecursive(idx)
  }
}
