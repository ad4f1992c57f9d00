package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistical-testing operators (north-star extensions —
  * the experimentation/readout layer a metrics pipeline runs next to
  * the Welch t-test in [[graft.queries.AnalyticsQueries]]):
  * rank-based tests, closed-form regression, and survival curves.
  *
  * House determinism contract: every statistic reduces to EXACT integer
  * or decimal moment sums first (order-independent under any
  * partitioning), and the final floating-point formula is written once
  * and mirrored verbatim in the DuckDB oracle, so results hash-match
  * float-for-float.
  */
object Stats {

  /** Mann–Whitney U (Wilcoxon rank-sum) per group: the nonparametric
    * two-sample test — no normality assumption, so it is the robust
    * sibling of the Welch t readout when metric distributions are
    * skewed (session lengths, revenue).
    *
    * Scale shape: ranks are computed over the DISTINCT value domain
    * (pre-aggregated counts per (group, value) — partial aggregation
    * does the heavy lifting), not per row; the only sort is the
    * per-group ordered window over that domain. Tie handling is exact:
    * average ranks carried as 2×rank integers (BIGINT — the ½
    * fractions never touch a float), and the tie-correction term
    * Σ(t³−t) feeds the z variance.
    *
    * Returns one row per group: n_a, n_b, u_a, u_b (doubles with .5
    * resolution) and the tie-corrected normal approximation z.
    */
  def mannWhitneyU(df: DataFrame, group: Column, cohort: Column,
      value: Column): DataFrame = {
    val base = df.select(group.as("g"), cohort.as("c"), value.as("v"))
    // distinct-value grain: per (group, value) cohort counts
    val dom = base.groupBy("g", "v").agg(
      sum(when(col("c") === "A", 1L).otherwise(0L)).as("ca"),
      count(lit(1)).as("cnt"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // rank_min = 1 + #smaller; avg rank ×2 = 2·rank_min + ties − 1
    val ranked = dom
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("r2", lit(2) * (col("cum") - col("cnt") + 1) + col("cnt") - 1)
    val sums = ranked.groupBy("g").agg(
      sum(col("ca")).as("na"),
      sum(col("cnt") - col("ca")).as("nb"),
      sum(col("ca") * col("r2")).as("ra2"),
      // tie correction Σ(t³−t) over the value domain
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties3"))
    val n = col("na") + col("nb")
    val u2a = col("ra2") - col("na") * (col("na") + 1) // 2·U_A, exact BIGINT
    val u2b = lit(2) * col("na") * col("nb") - u2a
    val nd = n.cast("double")
    // nullif-guard (house pattern, TextAnalysis): a group whose values
    // all land in one cohort (na·nb = 0) or whose whole domain is one
    // tied value (ties3 = n³−n) gives varU = 0 — z is undefined, and
    // unguarded ±Infinity/NaN rendering diverges across engines. Both
    // engines emit NULL z for the degenerate case instead.
    val varU = nullif(
      col("na").cast("double") * col("nb") / 12.0 *
        ((nd + 1) - col("ties3").cast("double") / (nd * (nd - 1))),
      lit(0.0))
    sums.select(col("g").as("group_key"), col("na").as("n_a"), col("nb").as("n_b"),
      (u2a.cast("double") / 2).as("u_a"), (u2b.cast("double") / 2).as("u_b"),
      round((u2a.cast("double") / 2 - col("na").cast("double") * col("nb") / 2)
        / sqrt(varU), 6).as("z"))
  }

  /** Two-regressor OLS per group, solved in closed form from the
    * normal equations: exact DECIMAL raw moments (one partial-
    * aggregating pass), centered second moments and the 2×2 Cramer
    * solve in doubles — identical formula in the oracle. The standard
    * "controlled effect" readout (y ~ b0 + b1·x1 + b2·x2) without any
    * iterative solver; at 100 TB this is one groupBy over ten sums.
    *
    * Inputs must already be DECIMAL-cast by the caller (exactness is
    * the caller's schema decision); products are accumulated at
    * DECIMAL(38,8).
    */
  def olsTwo(df: DataFrame, group: Column, y: Column, x1: Column,
      x2: Column): DataFrame = {
    def d38(c: Column): Column = c.cast("decimal(38,8)")
    val base = df.select(group.as("g"), y.as("y"), x1.as("x1"), x2.as("x2"))
    val sums = base.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(d38(col("y"))).as("sy"), sum(d38(col("x1"))).as("s1"),
      sum(d38(col("x2"))).as("s2"),
      sum(d38(col("x1") * col("x1"))).as("s11"),
      sum(d38(col("x1") * col("x2"))).as("s12"),
      sum(d38(col("x2") * col("x2"))).as("s22"),
      sum(d38(col("x1") * col("y"))).as("s1y"),
      sum(d38(col("x2") * col("y"))).as("s2y"),
      sum(d38(col("y") * col("y"))).as("syy"))
    val nd = col("n").cast("double")
    def dd(name: String): Column = col(name).cast("double")
    // centered moments: A_ij = S_ij − S_i·S_j/n
    val a11 = dd("s11") - dd("s1") * dd("s1") / nd
    val a12 = dd("s12") - dd("s1") * dd("s2") / nd
    val a22 = dd("s22") - dd("s2") * dd("s2") / nd
    val a1y = dd("s1y") - dd("s1") * dd("sy") / nd
    val a2y = dd("s2y") - dd("s2") * dd("sy") / nd
    val ayy = dd("syy") - dd("sy") * dd("sy") / nd
    val det = a11 * a22 - a12 * a12
    val b1 = (a1y * a22 - a2y * a12) / det
    val b2 = (a2y * a11 - a1y * a12) / det
    val b0 = dd("sy") / nd - b1 * dd("s1") / nd - b2 * dd("s2") / nd
    sums.select(col("g").as("group_key"), col("n"),
      round(b0, 6).as("b0"), round(b1, 6).as("b1"), round(b2, 6).as("b2"),
      round((b1 * a1y + b2 * a2y) / ayy, 6).as("r2"))
  }

  /** Kaplan–Meier survival estimator over right-censored durations:
    * input is one row per subject `(duration, censored)`; output is the
    * survival curve at each event time (duration with ≥ 1 uncensored
    * "death"): at-risk count, deaths, and S(t) = Π(1 − d_i/n_i).
    *
    * Scale shape: subjects collapse to the DURATION domain first (one
    * partial-aggregating groupBy), so the ordered window runs over a
    * domain bounded by distinct durations (days), not subjects. The
    * product is an exp-of-decimal-sum: each factor's ln is rounded to
    * 9 dp and accumulated in DECIMAL(28,12) — order-independent, so
    * the oracle's identical window reproduces it bit-for-bit. A final
    * time where everyone remaining dies (factor 0) is emitted with
    * survival = 0 (the −∞ ln never enters the decimal sum).
    */
  def kaplanMeier(subjects: DataFrame, duration: Column,
      censored: Column): DataFrame = {
    val spark = subjects.sparkSession
    val base = subjects.select(duration.as("t"), censored.as("cen"))
    // The bucketing below does arithmetic on t cast to double. A
    // non-numeric duration (e.g. DATE → NULL under a double cast)
    // would silently produce an empty frame, so fail fast instead —
    // callers with temporal durations should diff to a day count.
    base.schema.head.dataType match {
      case _: org.apache.spark.sql.types.NumericType =>
      case other => throw new IllegalArgumentException(
        s"kaplanMeier duration must be numeric (got $other); " +
          "cast temporal durations to a day/second count first")
    }
    val dom = base.groupBy("t").agg(
      sum(when(col("cen"), 0L).otherwise(1L)).as("d"),
      count(lit(1)).as("tot"))
    // The running sums (at-risk cum, ln-product cum, dead-all cummax)
    // are GLOBAL over the duration domain. A plain Window.orderBy("t")
    // funnels that whole domain through one task — fine for day-grained
    // durations, a scale-killer for micro-grained ones (VERDICT r5).
    // Bucketed two-pass prefix instead (the Intervals.maxConcurrency
    // recipe): pass 1 computes per-bucket totals and EXCLUSIVE-prefixes
    // them over the ≤ numShufflePartitions-row bucket table (the only
    // unpartitioned windows left — bounded by CONFIGURATION, not data);
    // pass 2 runs per-bucket running aggregates + the bucket offset.
    // Decimal addition is exact, so regrouping terms cannot change the
    // ln-sum and the oracle's single global window still hash-matches.
    val bounds = dom.agg(min(col("t").cast("double")).as("lo"),
      max(col("t").cast("double")).as("hi")).head()
    if (bounds.isNullAt(0))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            base.schema.head.dataType),
          org.apache.spark.sql.types.StructField("n_risk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_events",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("survival",
            org.apache.spark.sql.types.DoubleType))))
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val span = hi - lo + 1
    val nBuckets = math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      math.max(1L, math.min(Long.MaxValue.toDouble, span).toLong))
    val bucketed = dom.withColumn("__part",
      least(lit(nBuckets - 1),
        floor((col("t").cast("double") - lo) * nBuckets / span).cast("long")))
    val wOff = Window.orderBy("__part")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("__part").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // phase A: at-risk counts — per-bucket subject totals, offset-joined
    val offA = bucketed.groupBy("__part").agg(sum(col("tot")).as("__s"))
      .withColumn("__offa", coalesce(sum(col("__s")).over(wOff), lit(0L)))
      .select(col("__part"), col("__offa"))
    val total = dom.agg(sum(col("tot")).as("n_total"))
    val risk = bucketed.join(broadcast(offA), Seq("__part"))
      .crossJoin(broadcast(total))
      .withColumn("cum", sum(col("tot")).over(wRun) + col("__offa"))
      .withColumn("n_risk", col("n_total") - col("cum") + col("tot"))
      .filter(col("d") > 0)
    val factor = (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double")
    val lnTerm = when(col("d") === col("n_risk"), lit(0).cast("decimal(28,12)"))
      .otherwise(round(log(factor), 9).cast("decimal(28,12)"))
    // phase B: the survival product's ln-sum and the everyone-died latch,
    // same bucketing over the event-time subset (__part rides along)
    val ev = risk
      .withColumn("lnterm", lnTerm)
      .withColumn("__da", when(col("d") === col("n_risk"), 1).otherwise(0))
    val offB = ev.groupBy("__part").agg(
        sum(col("lnterm")).as("__sl"), max(col("__da")).as("__sd"))
      .withColumn("__offl",
        coalesce(sum(col("__sl")).over(wOff), lit(0).cast("decimal(28,12)")))
      .withColumn("__offd", coalesce(max(col("__sd")).over(wOff), lit(0)))
      .select(col("__part"), col("__offl"), col("__offd"))
    ev.join(broadcast(offB), Seq("__part"))
      .withColumn("lnsum", sum(col("lnterm")).over(wRun) + col("__offl"))
      .withColumn("dead_all",
        greatest(max(col("__da")).over(wRun), col("__offd")))
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        when(col("dead_all") === 1, lit(0.0))
          .otherwise(round(exp(col("lnsum").cast("double")), 6)).as("survival"))
  }
}
