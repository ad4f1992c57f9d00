package graft.operators

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy-hitter (frequent-item) detection — the hot-key probe a skewed
  * join or a template-heavy corpus needs before choosing a partition
  * strategy (the thesis's merge-join failure mode, §6.4, is exactly an
  * undetected heavy hitter overflowing one partition; salting and AQE
  * skew-splitting both start from knowing WHICH keys are hot).
  *
  * Dataflow: one pass folds every partition into a k-counter
  * Misra–Gries summary ([[MisraGriesAgg]], O(k) memory, k rows
  * shuffled); the merged summary is a guaranteed SUPERSET of every item
  * with frequency > n/k, so a second pass that recounts ONLY the
  * candidates (broadcast semi-join, then a groupBy whose cardinality is
  * ≤ k) and filters freq·k > n returns the EXACT heavy-hitter set —
  * order-independent, hence oracle-comparable, while never shuffling
  * the full item cardinality the way a plain groupBy-then-filter would.
  */
object HeavyHitters {

  /** Exact items with frequency·k > n over a bigint item column.
    * Output: (key, freq), the exact count per surviving item.
    *
    * Two passes total (the minimum): one aggregate computes the sketch
    * AND the stream length; the ≤ k candidates and the scalar n come
    * back to the driver (k is a config constant — the same
    * small-by-definition shape as k-means centers) and return as an
    * `isin` predicate, which is codegen'd and scan-pushable, so the
    * recount pass filters before it shuffles. */
  def heavyHitters(df: DataFrame, item: Column, k: Int): DataFrame = {
    val items = df.select(item.cast("long").as("item"))
    val sketch = items.agg(
      MisraGriesAgg.misra_gries(col("item"), k).as("c"),
      count(col("item")).as("n")).head()
    val cands = sketch.getSeq[Long](0)
    val n = sketch.getLong(1)
    items.filter(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("freq"))
      .filter(col("freq") * k > n)
      .select(col("item").as("key"), col("freq"))
  }

  /** The Misra–Gries candidate set alone (superset of the heavy
    * hitters) — for tests and for callers that feed the candidates into
    * their own verification join. */
  def candidates(df: DataFrame, item: Column, k: Int): DataFrame =
    df.select(item.cast("long").as("item"))
      .agg(MisraGriesAgg.misra_gries(col("item"), k).as("c"))
      .select(explode(col("c")).as("item"))
}
