package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running counter row (top-level: Encoder codegen cannot call
  * accessors on object-nested private case classes — it silently falls
  * back to interpreted projections). */
final case class UserCount(user_id: Long, n_events: Long)

/** Structured Streaming operators (extensions — the reference is batch
  * MR only, SURVEY §2.5). The events parquet drives the streams
  * synchronously (`processAllAvailable`) so the same queries run under
  * the driver's batch verification; on a cluster the identical plans run
  * against a live source with watermarks bounding state.
  *
  * Determinism contract for the oracle: only aggregations whose result
  * is independent of intra-batch arrival order are exposed as verified
  * queries (windowed aggs, session windows, min/count state) — a
  * "first-seen wins" streaming dedup is NOT order-deterministic and has
  * no oracle by construction.
  */
object Streaming {

  /** Streaming view of the events table (file source). ts arrives as
    * epoch-nanos long (nanosAsLong, see Tables.table); event-time
    * columns are derived at micros grain. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source needs a directory basePath; the testdata table is a
    // single file inside sfDir → glob-filter it out of the directory
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
  }

  /** Event-time timestamp (micros grain) for windowing. */
  def eventTime(df: DataFrame): DataFrame =
    df.withColumn("etime", timestamp_micros(expr("ts div 1000")))

  /** Drain a stream into an in-memory table and return it as a batch
    * DataFrame — the harness's sink for verification. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Tumbling-window aggregation (1 h) per event type. Complete mode:
    * every window emits, no watermark race in the one-shot harness; a
    * production deployment adds `withWatermark` and append mode. */
  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventTime(eventsStream(spark, sfDir))
      .groupBy(window(col("etime"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total"))
    runToMemory(spark, agg, s"win_agg_${System.nanoTime()}", OutputMode.Complete())
  }

  /** Session windows per user (30 min gap) — the built-in session
    * operator; merge semantics are arrival-order independent. */
  def sessionAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventTime(eventsStream(spark, sfDir))
      .groupBy(col("user_id"), session_window(col("etime"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event_id"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("first_event_id"))
    runToMemory(spark, agg, s"sess_${System.nanoTime()}", OutputMode.Complete())
  }

  /** Order-deterministic streaming dedup/state aggregate: first (=min)
    * event id per (user, event_type). */
  def dedupState(spark: SparkSession, sfDir: String): DataFrame = {
    val agg = eventsStream(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"), count(lit(1)).as("n"))
    runToMemory(spark, agg, s"dedup_${System.nanoTime()}", OutputMode.Complete())
  }

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * counter (the KeyValueGroupedDataset stateful surface; state =
    * one long per key, bounded). Single-batch drain ⇒ the emitted counts
    * equal the batch groupBy — which is exactly what the oracle checks. */
  def statefulUserCounter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val updates: Dataset[UserCount] = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          UserCount(user, total)
      }
    runToMemory(spark, updates.toDF(), s"ucount_${System.nanoTime()}", OutputMode.Update())
  }
}
