package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Sorted-neighborhood blocking join (Hernández & Stolfo, SIGMOD '95
    * — the classic merge/purge method): records are globally ordered by
    * a blocking `key`, and only pairs within `window` positions of each
    * other in that order become candidates, verified by exact
    * `levenshtein(key_a, key_b) <= tau`. The complement of the
    * symmetric-delete family in [[editDistanceSelfJoin]]: deletes
    * bucket on CONTENT variants (complete for small τ, volume grows
    * with len^τ); sorted neighborhood bounds candidates to n·(window−1)
    * REGARDLESS of string length or τ — the standard trade when keys
    * are long or τ is loose, at the price of recall limited to what the
    * sort order co-locates (production runs multiple passes with
    * different key transpositions; this is one pass).
    *
    * Scale shape: the global rank comes from a range partition + per-
    * partition `row_number` + partition-count prefix offsets (the
    * [[CorpusOps.deterministicShuffle]] pattern — no single-task global
    * window; the collect is partition-count-bounded). Rank is a
    * property of the total (key, id) order alone, so sampled range
    * boundaries never change the result. Candidate generation is an
    * equi-join on rank blocks of width `window`: the left side keeps
    * its home block `⌊r/w⌋`, the right side replicates to
    * `{⌊r/w⌋, ⌊r/w⌋−1}`, and a pair at distance < w shares exactly one
    * of those — each candidate met once, no distinct needed (the same
    * meet-exactly-once construction as [[Spatial.radiusSelfJoin]]'s
    * 3×3 grid). Output: (id_a, id_b, dist) with `a` the lower RANK.
    */
  def sortedNeighborhoodJoin(df: DataFrame, id: Column, key: Column,
      window: Int, tau: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val spark = df.sparkSession
    val nP = spark.sessionState.conf.numShufflePartitions
    val base = df.select(id.as("__id"), key.as("__k"))
    // PIN the range partitioning before anything reads __pid:
    // repartitionByRange draws its boundaries from a per-execution
    // SAMPLE, and the offsets job plus the rank job below would
    // otherwise each re-evaluate the exchange — measured at sf0.1, the
    // two samplings disagree by tens of rows per boundary, which
    // shifted ~15 k global ranks and minted 346 DUPLICATE ranks inside
    // one query (the silent wrong-answer class packBins' docstring
    // names; packBins sidesteps it with value-range buckets, which
    // need a numeric key — this operator sorts by string, so the fix
    // is materializing ONE partitioning that every consumer reads).
    val (parts, _, _) = Iterate.ckpt(
      base.repartitionByRange(nP, col("__k"), col("__id"))
        .withColumn("__pid", spark_partition_id().cast("long")))
    val offsets = parts.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (p, c)) => (p, acc + c) }
      .sliding(2).collect { case Array((_, acc), (p, _)) => (p, acc) }.toMap
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (e, (p, off)) =>
      when(col("__pid") === p, lit(off)).otherwise(e)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col("__k"), col("__id"))
    val ranked = parts
      .withColumn("__r", row_number().over(w).cast("long") - 1 + offsetExpr)
      .select(col("__id"), col("__k"), col("__r"))
    // ranks are non-negative, so the long-division cast IS floor
    val blockOf = (r: Column) => (r / lit(window.toLong)).cast("long")
    val left = ranked.select(col("__id").as("id_a"), col("__k").as("k_a"),
      col("__r").as("ra"), blockOf(col("__r")).as("__b"))
    val right = ranked.select(col("__id").as("id_b"), col("__k").as("k_b"),
        col("__r").as("rb"))
      .withColumn("__b", explode(array(blockOf(col("rb")), blockOf(col("rb")) - 1)))
    left.join(right, "__b")
      .filter(col("rb") > col("ra") && col("rb") - col("ra") < window)
      .withColumn("dist", levenshtein(col("k_a"), col("k_b")))
      .filter(col("dist") <= tau)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Fellegi–Sunter probabilistic record linkage (JASA 1969) over a
    * blocked candidate-pair frame: each attribute comparison
    * contributes log₂(m/u) micros on agreement and log₂((1−m)/(1−u))
    * on disagreement (m = P(agree | match), u = P(agree | non-match) —
    * caller-supplied, EM-estimated in production), the pair's match
    * weight is the exact BIGINT sum, and the two thresholds cut
    * match / possible (clerical review) / nonmatch — the decision
    * model every ER system descends from.
    *
    * Determinism: the per-attribute weights are computed ONCE driver-
    * side (`Math.log`) and planted as integer-micro literals, so the
    * distributed plan does no float math at all — per row it is a
    * predicate, a literal pick, and a BIGINT sum. Purely row-local:
    * composes with any blocking (symmetric-delete, sorted
    * neighborhood, equi-key) without changing its scale shape. */
  def fellegiSunter(pairs: DataFrame,
      attrs: Seq[(String, Column, Double, Double)],
      upperMicros: Long, lowerMicros: Long): DataFrame = {
    require(attrs.nonEmpty, "at least one attribute comparison")
    attrs.foreach { case (nm, _, m, u) =>
      require(m > 0 && m < 1 && u > 0 && u < 1 && m > u,
        s"attr $nm: need 0 < u < m < 1 (got m=$m u=$u)")
    }
    val terms = attrs.map { case (nm, pred, m, u) =>
      val wa = math.round(math.log(m / u) / math.log(2.0) * 1e6)
      val wd = math.round(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6)
      (when(pred, lit(wa)).otherwise(lit(wd)),
        when(pred, lit(1)).otherwise(lit(0)).as(s"agree_$nm"))
    }
    val weight = terms.map(_._1).reduce(_ + _)
    pairs
      .select(pairs.columns.map(col) ++ terms.map(_._2)
        :+ weight.as("weight_micros"): _*)
      .withColumn("decision",
        when(col("weight_micros") >= upperMicros, lit("match"))
          .when(col("weight_micros") <= lowerMicros, lit("nonmatch"))
          .otherwise(lit("possible")))
  }

  /** The [[fellegiSunter]] literal weights for an (m, u) pair —
    * exposed so oracle SQL builders plant the IDENTICAL longs. */
  def fsWeights(m: Double, u: Double): (Long, Long) =
    (math.round(math.log(m / u) / math.log(2.0) * 1e6),
      math.round(math.log((1 - m) / (1 - u)) / math.log(2.0) * 1e6))
}
