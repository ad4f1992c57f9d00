package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-cluster analytics: per-label centroids and cohesion — the
  * monitoring layer of an embedding pipeline (is cluster k collapsing?
  * drifting?).
  *
  * Exactness design: centroid dimensions are means of per-dim sums
  * accumulated as DECIMAL(28,12) (order-free, so Spark's partial
  * aggregation and DuckDB's scan order produce identical values);
  * per-vector cosines to the centroid then use the codegen'd strict-fold
  * dot product, and the final per-label mean cosine again accumulates
  * decimal. Everything shuffles by (label, dim) or label — linear in
  * corpus size, centroids broadcast back.
  */
object EmbeddingAnalytics {

  private val dec = "decimal(28,12)"

  /** (label, centroid: array<double>, n) — elementwise mean per label. */
  def labelCentroids(emb: DataFrame, vec: Column, label: Column): DataFrame = {
    val dims = emb.select(label.as("label"), posexplode(Dedup.asDouble(vec)).as(Seq("dim", "v")))
    dims.groupBy("label", "dim")
      .agg((sum(col("v").cast(dec)).cast("double") / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("c")))),
        s => s.getField("c")).as("centroid"))
  }

  /** Per-label cohesion: mean cosine of members to their centroid. */
  def labelCohesion(emb: DataFrame, vec: Column, id: Column, label: Column): DataFrame = {
    val cents = labelCentroids(emb, vec, label)
    val e = emb.select(id.as("vid"), label.as("label"), Dedup.asDouble(vec).as("v"))
    e.join(broadcast(cents), Seq("label"))
      .withColumn("cos",
        Dedup.dot(col("v"), col("centroid")) /
          (sqrt(Dedup.dot(col("v"), col("v"))) * sqrt(Dedup.dot(col("centroid"), col("centroid")))))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        (sum(col("cos").cast(dec)).cast("double") / count(lit(1))).as("mean_cos"))
      .select(col("label"), col("n"), round(col("mean_cos"), 6).as("mean_cos"))
  }
}
