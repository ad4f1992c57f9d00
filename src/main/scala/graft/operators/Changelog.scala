package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog / CDC processing — the operators that turn an append-only
  * stream of keyed change records (upserts + deletes) into queryable
  * state. The reference pipeline (arselzer/mapreduce_join_comparison)
  * stops at static joins; any production corpus at 100 TB is maintained
  * incrementally, so snapshot compaction and history tracking are
  * first-class here.
  *
  * Scale shape:
  *  - [[latestSnapshot]] is a single `groupBy(key).agg(max_by(...))` —
  *    partial aggregation runs map-side, so the shuffle carries one
  *    candidate row per key per map partition, NOT the full changelog.
  *    This is the compaction a log-structured table (Delta/Hudi-style)
  *    runs continuously; no window, no sort, no per-key state.
  *  - [[scd2History]] needs every version, so it hash-partitions by key
  *    and sorts within partitions (the minimal shuffle for a keyed
  *    ordered scan); `lead` is a 1-row lookahead, not an unbounded
  *    frame.
  */
object Changelog {

  /** A deterministic changelog view over the `events` table: each event
    * is a change record for its user — `error` events act as delete
    * markers (tombstones), everything else upserts. `event_id` is the
    * globally-unique, monotonically-assigned change sequence number, so
    * (key, seq) ordering is total and tie-free. */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("key"),
      col("event_id").as("seq"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_type").as("attr"),
      col("value").as("amount"))

  /** Latest-state snapshot: for every key, the change record with the
    * highest sequence number; keys whose latest record is a tombstone
    * are absent. `max_by(struct(payload), seq)` — NOT a row_number
    * window — so the argmax partial-aggregates map-side (same plan
    * shape as Similarity.assignNearest). */
  def latestSnapshot(changes: DataFrame): DataFrame = {
    val payload = struct(col("seq"), col("op"), col("attr"), col("amount"))
    changes
      .groupBy("key")
      .agg(max_by(payload, col("seq")).as("last"))
      .filter(col("last.op") =!= "D")
      .select(
        col("key"),
        col("last.seq").as("last_seq"),
        col("last.attr").as("last_event"),
        col("last.amount").as("last_value"))
  }

  /** Slowly-changing-dimension type-2 history: every change becomes a
    * version row with a validity interval [valid_from, valid_to) in
    * sequence numbers; the open version has valid_to NULL and is
    * current unless it is a tombstone. */
  def scd2History(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("seq"))
    changes.select(
      col("key"),
      col("seq").as("valid_from"),
      lead(col("seq"), 1).over(w).as("valid_to"),
      col("op"),
      col("attr"),
      col("amount"))
      .withColumn("is_current", col("valid_to").isNull && col("op") =!= "D")
  }

  /** Time travel: reconstruct the keyed table state AS OF each probe
    * sequence point — the point-in-time join against the SCD2 validity
    * intervals (`valid_from ≤ p < valid_to`, open version = NULL bound,
    * tombstoned versions excluded). `probes` must be a SMALL relation
    * (one column `as_of`): it broadcasts, so the history side streams
    * through the interval filter with no shuffle at all — at 100 TB
    * this is a map-only scan per reconstruction batch. Output:
    * (as_of, key, attr, amount) per key live at that point. */
  def asOfSnapshot(history: DataFrame, probes: DataFrame): DataFrame =
    history.join(broadcast(probes),
        col("valid_from") <= col("as_of") &&
          (col("valid_to").isNull || col("valid_to") > col("as_of")))
      .filter(col("op") =!= "D")
      .select(col("as_of"), col("key"), col("attr"), col("amount"))
}
