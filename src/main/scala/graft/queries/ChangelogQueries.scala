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
    }
  )
}
