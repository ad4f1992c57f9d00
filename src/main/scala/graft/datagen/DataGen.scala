package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synthetic-data generation — the reference's DataGenerator re-expressed
  * declaratively and *deterministically* (SURVEY §2.6 G1-G6):
  *
  *  - G1 attribute pool (DataGenerator.java:13-48: 100 random
  *    alphanumeric strings; rows sample from the pool) → md5-derived
  *    deterministic pool so an SQL oracle regenerates the same bytes;
  *  - G2 uniform keys (DataGenerator.java:102-123: key = i % unique);
  *  - G3 Zipf single-skew (DataGenerator.java:125-163: left = shuffled
  *    unique keys; right = deterministic inverse-CDF quantile sweep —
  *    the reference solves the inverse CDF per row with a Newton
  *    iteration, `:314-336`; we invert the OTHER way: one pass over the
  *    CDF emits each key's row-count, linear and shuffle-free, and
  *    because the quantile function is monotone the cumulative offsets
  *    reproduce the reference's per-row sweep order exactly);
  *  - G4 double skew (DataGenerator.java:240-259);
  *  - G5 parallel multi-file writer (DataGenerator.java:165-238) →
  *    `repartition(n).write` — parallelism is native (the reference's
  *    thread pool actually ran sequentially: `.run()` not `.start()`,
  *    DataGenerator.java:230);
  *  - G6 skew-capacity predictor maxZipfRepeats = rows / H(N,s)
  *    (DataGenerator.java:72-100).
  *
  * Scale: generation is `spark.range`-based — embarrassingly parallel,
  * no shuffle except the explicit pseudo-shuffle projection; the Zipf
  * CDF is a parameter table of N rows (broadcast-sized by construction).
  */
object DataGen {

  /** G1: deterministic attribute pool — pool slot j yields a fixed
    * alphanumeric string of `len` chars (md5 hex chained to length). */
  def poolAttr(slot: Column, len: Int): Column =
    substring(repeat(md5(concat(lit("pool"), slot.cast("string"))), (len + 31) / 32), 1, len)

  /** Row attributes from the pool, slotted by rid % 100 like the
    * reference's per-row pool sampling (deterministic stand-in). */
  private[graft] def withAttrs(df: DataFrame, rid: Column): DataFrame =
    df.withColumn("attr1", poolAttr(rid % 100, 20))
      .withColumn("attr2", poolAttr((rid + 37) % 100, 100))
      .withColumn("attr3", poolAttr((rid + 71) % 100, 80))

  /** G2: uniform table — key = rid % uniqueValues. */
  def uniform(spark: SparkSession, rows: Long, uniqueValues: Long): DataFrame =
    withAttrs(
      spark.range(rows).select(col("id").as("rid"), (col("id") % uniqueValues).as("key")),
      col("rid"))

  /** G3 left side: every key 0..n-1 exactly once, deterministically
    * pseudo-shuffled by a coprime multiplicative permutation (the
    * reference uses Collections.shuffle; a fixed-prime stride is the
    * reproducible equivalent).
    *
    * id·p mod n is a permutation iff gcd(p, n) = 1; since the strides
    * are prime that fails exactly when p divides n, so the first
    * non-dividing prime is selected (all three divide n only when
    * n ≥ their 10^18 product — unreachable). The ANSI-mode overflow
    * bound n·p < 2^63 caps n at ~9.2e12 rows, far above any sweep. */
  def uniqueShuffled(spark: SparkSession, n: Long): DataFrame = {
    val p = Seq(1000003L, 1000033L, 1000037L).find(n % _ != 0).get
    require(n <= Long.MaxValue / p, s"n=$n overflows the permutation stride")
    withAttrs(
      spark.range(n).select(col("id").as("rid"), (col("id") * p % n).as("key")),
      col("rid"))
  }

  /** Zipf CDF parameter table: (key k ∈ 1..n, cumcnt = #rows with key ≤ k
    * out of `rows` quantile-swept samples u_i = (i+0.5)/rows).
    * Single-partition window over n rows — a parameter table, not data. */
  private def zipfCumCounts(spark: SparkSession, rows: Long, n: Long, s: Double): DataFrame = {
    val wRun = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(1, n + 1).select(col("id").as("k"))
      .withColumn("w", pow(col("k").cast("double"), lit(-s)))
      .withColumn("cum", sum(col("w")).over(wRun))
      .withColumn("tot", max(col("cum")).over(Window.partitionBy(lit(1))))
      .withColumn("cumcnt",
        greatest(lit(0L),
          (floor(col("cum") / col("tot") * lit(rows.toDouble) - 0.5) + 1).cast("long")))
      .select(col("k"), col("cumcnt"))
  }

  /** G3/G4: Zipf histogram — (key, n) for the `rows`-sample quantile
    * sweep of Zipf(s) over n keys. */
  def zipfCounts(spark: SparkSession, rows: Long, n: Long, s: Double): DataFrame = {
    val lagW = Window.orderBy("k")
    zipfCumCounts(spark, rows, n, s)
      .withColumn("cnt", col("cumcnt") - coalesce(lag(col("cumcnt"), 1).over(lagW), lit(0L)))
      .filter(col("cnt") > 0)
      .select(col("k").as("key"), col("cnt").as("n"))
  }

  /** G3/G4: full Zipf table — (rid, key, attrs), rid in quantile-sweep
    * order (monotone keys ⇒ cumulative offsets reproduce the reference's
    * per-row inverse-CDF order). */
  def zipfTable(spark: SparkSession, rows: Long, n: Long, s: Double): DataFrame = {
    val lagW = Window.orderBy("k")
    val base = zipfCumCounts(spark, rows, n, s)
      .withColumn("off", coalesce(lag(col("cumcnt"), 1).over(lagW), lit(0L)))
      .withColumn("cnt", col("cumcnt") - col("off"))
      .filter(col("cnt") > 0)
      .select(col("k"), col("off"), explode(sequence(lit(0L), col("cnt") - 1)).as("i"))
      .select((col("off") + col("i")).as("rid"), col("k").as("key"))
    withAttrs(base, col("rid"))
  }

  /** KeyType.STRING arm (DataGenerator.java:50-52 declares
    * {NUMERIC, STRING}; the reference's own simulations only ever run
    * NUMERIC): a deterministic alphanumeric string per key id —
    * md5-derived like the attribute pool, so an SQL oracle regenerates
    * identical bytes, and collision-free over any realistic key domain
    * (48 bits of prefix vs the sweeps' ≤ 10⁷ keys). Applied on top of
    * the numeric generators, every generator gains a string-keyed
    * variant without duplicating the CDF machinery. */
  def stringKey(key: Column): Column =
    concat(lit("k"), substring(md5(concat(lit("skey"), key.cast("string"))), 1, 12))

  /** G6: expected multiplicity of the hottest Zipf key —
    * rows / H(n, s) with H the generalized harmonic number
    * (DataGenerator.java:72-100; sizes the reference's merge-join
    * maxSplits, JoinSimulation.java:203-206). */
  def maxZipfRepeats(n: Long, s: Double, rows: Long): Double = {
    var h = 0.0
    var k = 1L
    while (k <= n) { h += 1.0 / math.pow(k.toDouble, s); k += 1 }
    rows / h
  }

  /** G5: multi-file parallel write (one part file per task). */
  def writeCsvParts(df: DataFrame, path: String, parts: Int): Unit =
    df.repartition(parts).write.mode("overwrite").csv(path)
}
