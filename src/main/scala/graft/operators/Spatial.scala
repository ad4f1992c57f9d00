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
}
