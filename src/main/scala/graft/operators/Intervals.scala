package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over event streams: the sweep-line family
  * (max-concurrency / peak-load), built scale-first.
  *
  * The textbook formulation is a +1/−1 point list with a running sum
  * under `Window.partitionBy(group).orderBy(t)` — but that funnels every
  * row of a group through ONE task (the same global-window trap
  * [[CorpusOps.packBins]] avoids), and a group here is typically "one
  * event type over the whole corpus". Instead the sweep runs as a
  * distributed two-pass prefix sum over TIME buckets:
  *
  *  1. points are bucketed by an explicit monotone function of t
  *     (min/max from one tiny agg job — reproducible across jobs, unlike
  *     `spark_partition_id()`; see the round-2 ADVICE note on packBins);
  *  2. per-(group, bucket) delta totals — a rows→(G×B) aggregation that
  *     combines map-side — are turned into per-bucket starting offsets
  *     with a window over that TINY table (G×B rows, nothing collected
  *     to the driver);
  *  3. offsets broadcast-join back and an ordinary per-(group, bucket)
  *     window finishes the running sum in parallel.
  *
  * Every stage is parallel and partition-count-independent; the only
  * serial state is the G×B offset table. */
object Intervals {

  /** Peak concurrent intervals per group. Intervals are half-open
    * `[start, end)`: an interval ending at t frees its slot before one
    * starting at t occupies it (the −1 sorts before the +1). `start`/
    * `end` must cast to long (any monotone clock — epoch micros here);
    * rows where either is null are ignored. Output: one row per group,
    * `(group-column-name, max_concurrent)`. */
  def maxConcurrency(df: DataFrame, group: Column, start: Column, end: Column): DataFrame = {
    val groupName = df.select(group).columns.head
    val pts = df
      .filter(start.isNotNull && end.isNotNull)
      .select(group.as("__g"), start.cast("long").as("__t"), lit(1).as("__d"))
      .unionByName(df.filter(start.isNotNull && end.isNotNull)
        .select(group.as("__g"), end.cast("long").as("__t"), lit(-1).as("__d")))
    val bounds = pts.agg(min("__t"), max("__t")).head()
    if (bounds.isNullAt(0))
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(groupName,
            df.select(group).schema.head.dataType),
          org.apache.spark.sql.types.StructField("max_concurrent",
            org.apache.spark.sql.types.LongType))))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // double-space bucket arithmetic: monotone non-decreasing is the only
    // property the prefix sum needs (same contract as packBins); ties at
    // a bucket edge land in one bucket because the key is a function of
    // t alone
    val span = hi.toDouble - lo.toDouble + 1
    val nBuckets = math.min(
      df.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      math.max(1L, math.min(Long.MaxValue.toDouble, span).toLong))
    val bucketed = pts.withColumn("__part",
      least(lit(nBuckets - 1),
        floor((col("__t").cast("double") - lo.toDouble) * nBuckets / span).cast("long")))
    // pass 1: per-(group, bucket) totals — partial-aggregates map-side —
    // then EXCLUSIVE prefix per group over the tiny G×B table
    val wOff = Window.partitionBy("__g").orderBy("__part")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__g", "__part")
      .agg(sum("__d").cast("long").as("__s"))
      .withColumn("__off", coalesce(sum("__s").over(wOff), lit(0L)))
      .select(col("__g").as("__og"), col("__part").as("__op"), col("__off"))
    // pass 2: per-bucket running sum + bucket offset; −1 sorts before +1
    // at equal t (half-open semantics); per-group max partial-aggregates
    val wRun = Window.partitionBy("__g", "__part").orderBy("__t", "__d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), col("__g") === col("__og") && col("__part") === col("__op"))
      .withColumn("__run", sum(col("__d")).over(wRun).cast("long") + col("__off"))
      .groupBy(col("__g").as(groupName))
      .agg(max(col("__run")).as("max_concurrent"))
  }

  /** Time-series resampling: densify a per-(key, index) table onto the
    * full integer index grid [min(idx), max(idx)] of each key, carrying
    * the last observed `fillCol` forward into the gaps (the standard
    * daily-rollup → continuous-series step).
    *
    * Output: every `daily` column (null on gap rows) + `<fillCol>_filled`
    * + `is_gap`. Scale shape: the grid generation is one small per-key
    * aggregate + an explode (output-proportional, no driver work), the
    * join is co-partitioned on (key, idx), and the forward fill is a
    * per-KEY window — the natural scale-out axis for time series.
    * Caller contract: `idx` is an integer index (day number, hour
    * number) and key spans are bounded — a key with observations eons
    * apart explodes its span; clamp upstream. */
  def forwardFillGrid(daily: DataFrame, key: String, idx: String, fillCol: String): DataFrame = {
    val spans = daily.groupBy(col(key).as("__k"))
      .agg(min(col(idx)).as("__lo"), max(col(idx)).as("__hi"))
    val grid = spans.select(col("__k"), explode(sequence(col("__lo"), col("__hi"))).as("__i"))
    // grid derives FROM daily, so this is a self-join: dataset-instance
    // column refs (daily(fillCol)) would point at pre-dedup attribute
    // ids and fail analysis — rename the right side's join keys and
    // resolve everything by NAME after the join
    val right = daily.withColumnRenamed(key, "__dk").withColumnRenamed(idx, "__di")
    val w = Window.partitionBy(col("__k")).orderBy(col("__i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(right, col("__k") === col("__dk") && col("__i") === col("__di"), "left_outer")
      .withColumn(s"${fillCol}_filled", last(col(fillCol), ignoreNulls = true).over(w))
      .withColumn("is_gap", col(fillCol).isNull)
      .drop("__dk", "__di")
      .withColumnRenamed("__k", key).withColumnRenamed("__i", idx)
  }

  /** Last-touch attribution — for every conversion event, the most
    * recent touch event by the same user at or before the conversion
    * and within `windowUs` microseconds (the marketing-attribution /
    * causal-precursor join). Output: one row per conversion —
    * `(conv_event, user_id, conv_us, touch_event, touch_us, lag_us)`,
    * touch columns null when no touch qualifies.
    *
    * Scale shape: the union-merge as-of pattern ([[graft.queries
    * .AdvancedQueries]] `join_asof`) — touches and conversions are ONE
    * keyed sort (window partitioned by user), each conversion reads the
    * running last-touch from the prefix; no per-pair join, no blowup on
    * users with many touches. Determinism: ties at the same timestamp
    * order touches BEFORE conversions (a same-instant touch is
    * attributable), and equal-time touches resolve to the SMALLEST
    * event id (ordered eid-descending so `last` lands on the min — the
    * same tie the oracle's min() picks). */
  def lastTouchAttribution(events: DataFrame, user: Column, timeUs: Column,
      eventId: Column, typ: Column, touchType: String, convType: String,
      windowUs: Long): DataFrame = {
    val base = events.filter(typ.isin(touchType, convType))
      .select(user.as("user_id"), timeUs.cast("long").as("us"),
        eventId.as("eid"),
        when(typ === touchType, 0).otherwise(1).as("__rnk"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("__rnk").asc,
        when(col("__rnk") === 0, -col("eid")).otherwise(col("eid")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastTouch =
      last(when(col("__rnk") === 0, struct(col("us"), col("eid"))),
        ignoreNulls = true).over(w)
    base.withColumn("__lt", lastTouch)
      .filter(col("__rnk") === 1)
      .withColumn("__ok",
        col("__lt").isNotNull && col("__lt")("us") >= col("us") - windowUs)
      .select(
        col("eid").as("conv_event"), col("user_id"), col("us").as("conv_us"),
        when(col("__ok"), col("__lt")("eid")).as("touch_event"),
        when(col("__ok"), col("__lt")("us")).as("touch_us"))
      .withColumn("lag_us", col("conv_us") - col("touch_us"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * count and within-row-ppm of each (previous type → next type)
    * transition, ordered by `(timeUs, eventId)` per key (total order —
    * equal timestamps are common in event data). The behavioral-model /
    * anomaly-baseline primitive.
    *
    * Scale shape: one keyed sort (window lag per user — partitions are
    * user-bounded, never global), then an aggregation whose output is
    * |types|² rows; the ppm normalization joins against the per-prev
    * totals of that TINY matrix. Integer ppm floor-division — exact in
    * any engine. */
  def markovTransitions(events: DataFrame, key: Column, timeUs: Column,
      eventId: Column, typ: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__us"), col("__id"))
    val pairs = events
      .select(key.as("__k"), timeUs.cast("long").as("__us"),
        eventId.as("__id"), typ.as("next_type"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("prev_type").agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 div __tot").as("ppm"))
  }

  /** Exact per-key least-squares trend: slope of `y` against time `x`,
    * the drift detector for per-entity metrics. Closed form
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with every sum EXACT:
    * x is re-based per key (x − min x, so squares stay ~span² instead
    * of epoch², keeping Σx² inside DECIMAL(38) up to ~10⁹ rows/key on
    * multi-year spans) and accumulated in decimal; the single division
    * happens once, in double, on identical operands in any engine.
    * Keys with < 2 points or zero time variance yield NULL slope. Two
    * shuffles on the (bounded-cardinality) key: min-x, then the sums. */
  def trendSlope(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    val base = df.select(key.as("k"), x.cast("long").as("x"),
      y.cast("decimal(18,2)").as("y"))
    val mins = base.groupBy("k").agg(min(col("x")).as("x0"))
    // DECIMAL(19,0) re-based x: 19+19 and 19+18 both fit DuckDB's
    // p1+p2 ≤ 38 multiply bound, so the oracle runs the identical
    // exact accumulation; the final closed form then runs in DOUBLE
    // over the exact sums — same IEEE expression tree in both engines
    val agg = base.join(mins, Seq("k"))
      .withColumn("xd", (col("x") - col("x0")).cast("decimal(19,0)"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("xd")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("xd") * col("y")).cast("double").as("sxy"),
        sum(col("xd") * col("xd")).cast("double").as("sxx"))
    // reported per HOUR, rounded to 6 places: the per-microsecond slope
    // is ~1e-11-scale where a 1-ulp difference in the two engines'
    // decimal→double casts (int128 vs BigDecimal rounding) survives the
    // division; the 3.6e9 rescale lifts it to unit scale where round-6
    // absorbs that noise
    agg.select(col("k").as("grp"), col("n"),
      when(col("n") >= 2 &&
          col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0,
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * 3600000000L, 6))
        .as("slope_hr"))
  }

  /** OHLC time bars: per group per fixed window, the first (open),
    * max (high), min (low) and last (close) value plus the event
    * count — one groupBy of min_by/max_by picks (map-side partial
    * aggregation, no window sort, no self-join: the bar-building shape
    * that survives 100 TB). The open/close picks need a TOTAL order to
    * be deterministic under parallel aggregation; `(tsMicros, id)`
    * must be unique, and the zero-padded "micros:id" string key is an
    * order DuckDB sorts identically (see `events_ohlc`). Values are
    * picked, never summed, so doubles stay bit-exact. `barMicros` is
    * the bar width (default 1 day). */
  def ohlcBars(df: DataFrame, group: Column, tsMicros: Column, id: Column,
      value: Column, barMicros: Long = 86400000000L): DataFrame = {
    val key = format_string("%020d:%010d", tsMicros, id)
    val tsl = tsMicros.cast("long")
    // ts - pmod(ts, bar) = floor(ts/bar)*bar for ANY sign, in exact
    // long arithmetic (a double division would wobble past 2^53)
    df.groupBy(group, (tsl - pmod(tsl, lit(barMicros))).as("bar_us"))
      .agg(
        min_by(value, key).as("open_v"),
        max(value).as("high_v"),
        min(value).as("low_v"),
        max_by(value, key).as("close_v"),
        count(lit(1)).as("n_events"))
  }
}
