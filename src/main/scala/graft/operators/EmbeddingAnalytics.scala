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

  /** Per-dimension min-max int8 quantization — the vector-index
    * compression step (4× over float32; IVF/PQ pipelines quantize
    * exactly like this before building codebooks). Output is LONG form
    * (vec_id, pos, q ∈ [0,255]) so downstream ops stay columnar.
    *
    * Deterministic across engines by construction: float→double widening
    * is exact, and (v−lo)/(hi−lo)·255 uses only IEEE-exact-rounded
    * ops — both engines floor the identical double. Degenerate
    * dimensions (hi = lo) quantize to 0. Scale shape: one posexplode
    * pass, per-dim stats partial-aggregate to d rows, broadcast back —
    * the corpus shuffles once on pos. */
  def quantizeInt8(emb: DataFrame, id: Column, vec: Column): DataFrame = {
    val e = emb.select(id.as("vec_id"), posexplode(Dedup.asDouble(vec)).as(Seq("pos", "v")))
    val st = e.groupBy(col("pos").as("__sp"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    e.join(broadcast(st), col("pos") === col("__sp"))
      .select(col("vec_id"), col("pos"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(255L),
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * 255)).cast("long"))
          .as("q"))
  }

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

  /** Per-label centroid drift: cosine of each label's centroid against
    * the GLOBAL corpus centroid — the embedding-pipeline health metric
    * for "is cluster k wandering away from the population?" (a drift
    * dashboard row per label; low cosine = divergent cluster).
    *
    * Same exactness design as [[labelCohesion]]: both centroids come
    * from order-free decimal per-dim sums, then ONE cosine per label is
    * computed by the strict-fold dot product over dim-ordered arrays —
    * deterministic and oracle-replayable. Scale shape: per-label
    * centroids are label-cardinality-sized; the global centroid is a
    * single d-length row cross-broadcast to them (scalar fan-out, not a
    * data-sized cartesian). */
  def centroidDrift(emb: DataFrame, vec: Column, label: Column): DataFrame = {
    val cents = labelCentroids(emb, vec, label)
    val dims = emb.select(posexplode(Dedup.asDouble(vec)).as(Seq("dim", "v")))
    val global = dims.groupBy("dim")
      .agg((sum(col("v").cast(dec)).cast("double") / count(lit(1))).as("g"))
      .agg(transform(sort_array(collect_list(struct(col("dim"), col("g")))),
        s => s.getField("g")).as("gcent"))
    cents.crossJoin(broadcast(global))
      .select(col("label"),
        round(
          Dedup.dot(col("centroid"), col("gcent")) /
            (sqrt(Dedup.dot(col("centroid"), col("centroid"))) *
              sqrt(Dedup.dot(col("gcent"), col("gcent")))), 6).as("drift_cos"))
  }

  /** Upper-triangle Gramian of the embedding matrix: G(i,j) = Σ over
    * vectors of xᵢ·xⱼ, 1-based dims, i ≤ j — the d×d statistic PCA
    * needs (covariance = G/n − μμᵀ; the d×d eigen-solve is a
    * driver-side triviality on a d≪n matrix, exactly how MLlib's
    * RowMatrix does PCA — only THIS aggregation is distributed work).
    *
    * Shape: the d(d+1)/2 products per row come from two chained
    * generators (posexplode, then posexplode of the tail slice) — a
    * fully pipelined scan, NO self-join, no pre-aggregation shuffle;
    * partial aggregation collapses each map partition to ≤ d(d+1)/2
    * rows before the only exchange. Float products are exact in double;
    * they are quantized by floor(p·10¹²) — floor is bit-identical
    * across engines, unlike decimal-cast ROUNDING, whose half-up vs
    * half-even tie rule differs between Spark and DuckDB — and the
    * quantized units accumulate as DECIMAL(38,0) (exact, order-free,
    * no bigint overflow at any corpus size). */
  def gramian(emb: DataFrame, vec: Column): DataFrame = {
    val pairs = emb.select(vec.as("e"))
      .select(col("e"), posexplode(col("e")).as(Seq("p", "xi")))
      .select(col("p"), col("xi"),
        posexplode(slice(col("e"), col("p") + 1, size(col("e")) - col("p")))
          .as(Seq("q", "xj")))
    pairs
      .select(
        (col("p") + 1).cast("long").as("i"),
        (col("p") + col("q") + 1).cast("long").as("j"),
        floor(col("xi").cast("double") * col("xj").cast("double") * lit(1e12))
          .cast("decimal(38,0)").as("prod"))
      .groupBy("i", "j")
      .agg((sum(col("prod")).cast("double") / lit(1e12)).as("g"))
  }
}
