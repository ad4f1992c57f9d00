package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial similarity — radius self-join over 2-D points via grid
  * bucketing (the equi-join reduction every distributed spatial engine
  * uses; same candidate-generation discipline as the LSH dedup family:
  * bucket join first, exact verify on candidates only, never all
  * pairs).
  *
  * Scale shape: each point lands in its home cell of an r-sized grid;
  * the probe side replicates to its 3×3 cell neighborhood, so a
  * qualifying pair (distance ≤ r ⇒ cell offset ≤ 1 per axis) meets in
  * the build point's home cell EXACTLY once — found once, no dedup
  * pass. The shuffle carries 9 keys per probe point and 1 per build
  * point; the exact distance filter runs inside the joined cell, which
  * holds only near neighbors. Dense hotspots (many points in one cell)
  * are ordinary join skew — AQE splitting or [[Joins.autoSaltedJoin]]
  * apply unchanged.
  */
object Spatial {

  /** Ordered pairs (pid_a < pid_b) of points within Euclidean distance
    * `r`, with the squared distance. Coordinates must be nonnegative
    * finite doubles. */
  def radiusSelfJoin(points: DataFrame, id: Column, x: Column, y: Column,
      r: Double): DataFrame = {
    val base = points.select(id.as("pid"), x.as("x"), y.as("y"))
      .withColumn("cx", floor(col("x") / r).cast("long"))
      .withColumn("cy", floor(col("y") / r).cast("long"))
    val probe = base
      .select(col("pid").as("pid_a"), col("x").as("xa"), col("y").as("ya"),
        col("cx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dx"))
      .select(col("pid_a"), col("xa"), col("ya"),
        (col("cx") + col("dx")).as("pcx"), col("cy"),
        explode(expr("sequence(-1, 1)")).as("dy"))
      .select(col("pid_a"), col("xa"), col("ya"),
        col("pcx"), (col("cy") + col("dy")).as("pcy"))
    val build = base.select(col("pid").as("pid_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("bcx"), col("cy").as("bcy"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    probe.join(build,
        col("pcx") === col("bcx") && col("pcy") === col("bcy") &&
          col("pid_a") < col("pid_b"))
      .filter(d2 <= r * r)
      .select(col("pid_a"), col("pid_b"), d2.as("dist2"))
  }

  /** DBSCAN (Ester et al., KDD'96) via the grid-bucketed neighbor
    * join — the distributed formulation (MR-DBSCAN family): density
    * classification and cluster formation become three relational
    * passes over the [[radiusSelfJoin]] pair set instead of the
    * paper's sequential region queries.
    *
    *  - core:   > = `minPts` OTHER points within `eps` (self excluded —
    *    stated contract; the classic "incl. self" count is minPts+1)
    *  - clusters: connected components over CORE–CORE eps-edges
    *    ([[Dedup.connectedComponents]] — O(log n) star rounds), label =
    *    component-minimum core id; a core with no core neighbor is its
    *    own cluster
    *  - border: non-core with ≥ 1 core neighbor, assigned the MINIMUM
    *    cluster label among its core neighbors (DBSCAN leaves
    *    multi-reachable border assignment arbitrary; min makes it
    *    deterministic and oracle-reproducible)
    *  - noise: everything else (cluster NULL)
    *
    * Scale shape: one grid-bucketed pair join (never all pairs), one
    * degree aggregate, the star-contraction rounds on the core
    * subgraph, two label joins. Density hotspots are join skew on the
    * cell key — AQE/salting apply unchanged. */
  def dbscan(points: DataFrame, id: Column, x: Column, y: Column,
      eps: Double, minPts: Int): DataFrame = {
    val base = points.select(id.as("pid"), x.as("x"), y.as("y"))
    val pairs = radiusSelfJoin(base, col("pid"), col("x"), col("y"), eps)
    val sym = pairs.select(col("pid_a").as("s"), col("pid_b").as("t"))
      .unionAll(pairs.select(col("pid_b").as("s"), col("pid_a").as("t")))
    val core = sym.groupBy(col("s").as("pid")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPts).select(col("pid"))
    val coreEdges = sym
      .join(core.withColumnRenamed("pid", "s"), Seq("s"))
      .join(core.withColumnRenamed("pid", "t"), Seq("t"))
      .filter(col("s") < col("t"))
      .select(col("s").as("a"), col("t").as("b"))
    val cc = Dedup.connectedComponents(coreEdges)
    val coreRep = core.join(cc, col("pid") === col("node"), "left_outer")
      .select(col("pid"), coalesce(col("rep"), col("pid")).as("rep"))
    val borderRep = sym
      .join(core, sym("s") === core("pid"), "left_anti")
      .join(coreRep.select(col("pid").as("t"), col("rep")), Seq("t"))
      .groupBy(col("s").as("pid")).agg(min(col("rep")).as("rep"))
    base.select(col("pid"))
      .join(coreRep.withColumnRenamed("rep", "crep"), Seq("pid"), "left_outer")
      .join(borderRep.withColumnRenamed("rep", "brep"), Seq("pid"), "left_outer")
      .select(col("pid"),
        when(col("crep").isNotNull, lit("core"))
          .when(col("brep").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("crep"), col("brep")).as("cluster"))
  }
}
