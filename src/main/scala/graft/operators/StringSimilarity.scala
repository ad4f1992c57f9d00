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
    * keys (names, codes), not documents.
    *
    * τ=1 runs POSITION-ANNOTATED signatures (PassJoin-style): each row
    * emits (itself, pos −1) and (delete-at-i, pos i), and a candidate
    * needs equal variants AND compatible positions (same i, or −1 on
    * either side). That filter is not just complete but EXACT — equal
    * deletions at the same position means hamming ≤ 1, and identity-vs-
    * deletion means one real edit — so there is NO verify step at all:
    * dist is 0 iff the strings are equal, else 1. (The position-blind
    * form scored ~6× more candidates with a full edit-distance DP each;
    * this one computes none.) */
  def editDistanceSelfJoin(df: DataFrame, id: Column, str: Column, tau: Int = 1): DataFrame = {
    require(tau == 1 || tau == 2, s"tau must be 1 or 2, got $tau")
    val base = df.select(id.as("__id"), str.as("__s"))
    if (tau == 1) {
      // (variant, position): identity at -1, deletion of char i at i
      val sigs = base.select(col("__id"), col("__s"),
        explode(concat(
          array(struct(col("__s").as("v"), lit(-1).as("p"))),
          when(length(col("__s")) > 0,
            transform(sequence(lit(0), length(col("__s")) - 1),
              i => struct(
                concat(col("__s").substr(lit(1), i),
                  col("__s").substr(i + lit(2), length(col("__s")))).as("v"),
                i.as("p"))))
            .otherwise(array().cast("array<struct<v:string,p:int>>"))
        )).as("__sig"))
        .select(col("__id"), col("__s"), col("__sig.v").as("__v"), col("__sig.p").as("__p"))
      sigs.alias("a").join(sigs.alias("b"),
          col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id") &&
            (col("a.__p") === col("b.__p") || col("a.__p") === -1 || col("b.__p") === -1))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          when(col("a.__s") === col("b.__s"), 0).otherwise(1).as("dist"))
        .distinct()
    } else {
      // τ=2: position bookkeeping across two deletions stops being a
      // pure equality filter, so fall back to generate-then-verify —
      // with the BANDED levenshtein (threshold arg: O(len·τ) and early
      // exit, returns −1 past the bound), and verify-before-dedup so
      // distinct handles only true pairs
      val v1 = array_union(array(col("__s")), deleteOne(col("__s")))
      val variants =
        array_distinct(flatten(transform(v1, v => array_union(array(v), deleteOne(v)))))
      val sigs = base.select(col("__id"), col("__s"), explode(variants).as("__v"))
      sigs.alias("a").join(sigs.alias("b"),
          col("a.__v") === col("b.__v") && col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"),
          levenshtein(col("a.__s"), col("b.__s"), tau).as("dist"))
        .filter(col("dist") >= 0)
        .distinct()
    }
  }
}
