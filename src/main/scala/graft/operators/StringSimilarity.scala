package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the data-cleaning companion to the
  * token-set dedup family in [[Dedup]] (Jaccard/MinHash measure set
  * overlap; this measures character-level edits, catching typo-class
  * near-duplicates token methods miss).
  *
  * Candidate generation is SYMMETRIC-DELETE signatures: every string
  * emits its deletion neighborhood (all variants reachable by deleting
  * ≤ τ characters, itself included), and two strings within edit
  * distance τ ALWAYS share a variant — deletions alone are a complete
  * filter because any substitution/insertion can be aligned away by
  * deleting on one or both sides (the SymSpell completeness argument).
  * So the join is a bucket join on variant strings — never an all-pairs
  * product — followed by an exact `levenshtein` verify on the candidate
  * pairs only. The same shape as MinHash banding: signatures → bucket
  * join → restricted verify; at 100 TB the shuffle carries
  * O(rows × (len choose ≤τ)) signature rows, and candidate work is
  * Σ bucket², never n². */
object StringSimilarity {

  /** All variants of `s` reachable by deleting exactly one character
    * (empty array for the empty string — `sequence(0, −1)` would count
    * DOWN, so the guard is required, not cosmetic). */
  private def deleteOne(s: Column): Column =
    when(length(s) > 0,
      transform(sequence(lit(0), length(s) - 1),
        i => concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))
      .otherwise(array().cast("array<string>"))

  /** Self-join of `df` on pairs with `levenshtein(str_a, str_b) <= tau`
    * (τ ∈ {1, 2}), `id_a < id_b`. Output: (id_a, id_b, dist). `id` must
    * be unique; signature volume grows with len^τ, so τ=2 is for short
    * keys (names, codes), not documents. */
  def editDistanceSelfJoin(df: DataFrame, id: Column, str: Column, tau: Int = 1): DataFrame = {
    require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")
    val base = df.select(id.as("__id"), str.as("__s"))
    val v1 = array_union(array(col("__s")), deleteOne(col("__s")))
    val variants =
      if (tau == 1) v1
      else array_distinct(flatten(transform(v1, v => array_union(array(v), deleteOne(v)))))
    val sigs = base.select(col("__id"), col("__s"), explode(variants).as("__v"))
    val pairs = sigs.alias("a").join(sigs.alias("b"),
        col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
      // a pair can share several variants (e.g. two adjacent deletions
      // of a doubled character) — dedup BEFORE the verify so levenshtein
      // runs once per candidate pair
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
        col("a.__s").as("__sa"), col("b.__s").as("__sb"))
      .distinct()
    pairs
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= tau)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
