package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval join — the shuffle-partitionable form of a range
  * theta join.
  *
  * A predicate `point BETWEEN lo AND hi` has no equi-key, so Spark can
  * only plan it as a (broadcast) nested-loop — fine while one side fits
  * in memory, quadratic otherwise. Binning recovers an equi-key: bucket
  * the number line at `binWidth`, put each point in its bucket, explode
  * each interval into every bucket it overlaps, equi-join on the bucket
  * id, and refine with the exact predicate. With interval widths ≤ W
  * and binWidth ≈ W each interval lands in ≤ 2 buckets, so the join is
  * a plain shuffle equi-join with ~2× interval duplication — linear,
  * AQE/skew-split capable, and broadcast-free: the 100 TB shape.
  * (The standard interval-bucketing rewrite; e.g. the optimization
  * underlying dedicated range-join support in several engines.)
  */
object RangeJoin {

  /** Rows of `points` × `ranges` with point ∈ [lo, hi], joined through
    * bucket equi-keys. Exact: binning only generates candidates; the
    * final filter applies the precise predicate. Both inputs keep all
    * their columns. */
  def pointInRange(points: DataFrame, ranges: DataFrame,
      point: Column, lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin", floor(point / binWidth).cast("long"))
    val rb = ranges.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    pb.join(rb, "__bin")
      .filter(point >= lo && point <= hi)
      .drop("__bin")
  }
}
