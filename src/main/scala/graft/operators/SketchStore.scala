package graft.operators

import graft.functions.KmvAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stored mergeable-sketch lifecycle — the pre-aggregated distinct-count
  * architecture at its production shape: build per-group KMV sketches
  * once, STORE them as a tiny parquet artifact, MERGE delta batches in
  * O(delta + |groups|·k) without ever rescanning the base data, and
  * serve estimates from the store. KMV (k-minimum-values, Beyer et al.
  * SIGMOD'07) is the sketch whose merge is LOSSLESS: the bottom-k of a
  * union is a pure function of the two bottom-k sets, so
  * append-then-serve is bit-identical to a one-shot sketch of the full
  * data — the correctness contract the sketch_kmv_stored oracle pins
  * (the same lossless-merge argument stream_kmv_distinct already uses
  * across micro-batches).
  *
  * At 100 TB the store is |groups|·k BIGINTs — configuration-sized; a
  * day's delta is one scan of the delta alone. The CMS/HLL twins
  * (sketch_count_min / sketch_hll_union) cover the lossy-merge family;
  * this tier covers exact-replayable storage.
  */
object SketchStore {

  /** Per-group bottom-k sketch of `hashed` (pre-hashed BIGINT items):
    * (g, mins array<bigint> ascending, k). */
  def kmvSketches(df: DataFrame, group: Column, hashed: Column, k: Int): DataFrame =
    df.select(group.as("g"), hashed.as("h"))
      .groupBy("g")
      .agg(KmvAgg.kmv(col("h"), k).as("mins"))
      .withColumn("k", lit(k))

  def writeKmvSketches(df: DataFrame, group: Column, hashed: Column, k: Int,
      path: String): Unit =
    kmvSketches(df, group, hashed, k).coalesce(1)
      .write.mode("overwrite").parquet(path)

  /** Fold a delta batch into the stored sketch table: per group, the
    * bottom-k of (stored mins ∪ delta mins) — new groups appear, old
    * groups never lose information below their k-th value. The merged
    * table is MATERIALIZED before the overwrite (a lazy plan reading
    * `path` cannot write over it), which is the right cost model
    * anyway: the store is sketch-sized, not data-sized. */
  def appendToKmvSketches(path: String, delta: DataFrame, group: Column,
      hashed: Column): Unit = {
    val spark = delta.sparkSession
    val stored = spark.read.parquet(path)
    val kRow = stored.select(max(col("k"))).head()
    // an empty store (base build saw zero groups) has max(k) = NULL —
    // fail with a clear message instead of an opaque NPE (ADVICE r7)
    require(!kRow.isNullAt(0),
      s"stored KMV sketch table at $path is empty — rebuild with " +
        "writeKmvSketches before appending")
    val k = kRow.getInt(0)
    val (merged, _, _) = Iterate.ckpt(
      stored.select(col("g"), explode(col("mins")).as("h"))
        .unionByName(delta.select(group.as("g"), hashed.as("h")))
        .groupBy("g")
        .agg(KmvAgg.kmv(col("h"), k).as("mins"))
        .withColumn("k", lit(k)))
    merged.coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Distinct-count estimates from a sketch table (stored or not):
    * exact size when the group never filled its sketch, else the KMV
    * estimator (k−1)·H/U₍ₖ₎ over the 48-bit hash space H=2⁴⁸ — integer
    * division, hash-replayable. */
  def kmvEstimates(sketches: DataFrame): DataFrame =
    sketches.select(col("g"),
      when(size(col("mins")) < col("k"), size(col("mins")).cast("long"))
        // integer `div`, not `/` (which is a double divide on BIGINTs)
        .otherwise(expr(
          "(CAST(k AS BIGINT) - 1) * 281474976710656 div element_at(mins, k)"))
        .cast("long").as("est_distinct"),
      size(col("mins")).cast("long").as("sketch_size"))

  /** The engine-wide 48-bit md5 item hash (the sketch_kmv_distinct /
    * stream_kmv_distinct convention — portable to the oracle's
    * `('0x' || substr(md5(x), 1, 12))::BIGINT`). */
  def md5Hash48(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 12), 16, 10).cast("long")
}
