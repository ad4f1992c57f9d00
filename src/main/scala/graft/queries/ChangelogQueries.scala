package graft.queries

import graft.QueryDef
import graft.operators.Changelog
import graft.sources.Tables

/** CDC / changelog operators verified against DuckDB: the events table
  * reinterpreted as a keyed change stream (error = tombstone), compacted
  * to a latest-state snapshot and expanded to an SCD2 version history.
  * The oracle spells the same semantics with window functions; the Spark
  * side deliberately uses the partial-aggregating `max_by` shape for the
  * snapshot (see Changelog scaladoc).
  */
object ChangelogQueries {

  private val changelogSql =
    """ch AS (
      |  SELECT user_id AS key, event_id AS seq,
      |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |    event_type AS attr, value AS amount
      |  FROM events)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "cdc_latest_snapshot",
      s"""WITH $changelogSql,
        |ranked AS (
        |  SELECT key, seq, op, attr, amount,
        |    row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
        |  FROM ch)
        |SELECT key, seq AS last_seq, attr AS last_event, amount AS last_value
        |FROM ranked WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, d) =>
      Changelog.latestSnapshot(Changelog.fromEvents(Tables.table(s, d, "events")))
    },
    QueryDef(
      "scd2_history",
      s"""WITH $changelogSql
        |SELECT key, seq AS valid_from,
        |  lead(seq) OVER (PARTITION BY key ORDER BY seq) AS valid_to,
        |  op, attr, amount,
        |  (lead(seq) OVER (PARTITION BY key ORDER BY seq) IS NULL
        |    AND op <> 'D') AS is_current
        |FROM ch""".stripMargin) { (s, d) =>
      Changelog.scd2History(Changelog.fromEvents(Tables.table(s, d, "events")))
    },
    // time travel: the table state AS OF three historical sequence
    // points — a point-in-time join against the SCD2 validity
    // intervals; probes broadcast, history streams map-only
    QueryDef(
      "cdc_time_travel",
      s"""WITH $changelogSql,
        |h AS (
        |  SELECT key, seq AS valid_from,
        |    lead(seq) OVER (PARTITION BY key ORDER BY seq) AS valid_to,
        |    op, attr, amount
        |  FROM ch),
        |p AS (SELECT CAST(unnest([2500, 5000, 7500]) AS BIGINT) AS as_of)
        |SELECT p.as_of, h.key, h.attr, h.amount
        |FROM h JOIN p ON h.valid_from <= p.as_of
        |  AND (h.valid_to IS NULL OR h.valid_to > p.as_of)
        |WHERE h.op <> 'D'""".stripMargin) { (s, d) =>
      import s.implicits._
      val history = Changelog.scd2History(
        Changelog.fromEvents(Tables.table(s, d, "events")))
      Changelog.asOfSnapshot(history, Seq(2500L, 5000L, 7500L).toDF("as_of"))
    }
  )
}
