package graft.queries

import graft.QueryDef
import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-layout and extra-format round-trips: ORC (the second
  * columnar wire format after parquet), small-file compaction, and
  * range-clustered writes. Each query pushes data through the layout
  * operator and aggregates the read-back, while the oracle computes the
  * same aggregate from the original parquet — so content loss or
  * duplication anywhere in the write→read cycle breaks the hash. The
  * layout *efficiency* claims (file counts, disjoint min/max ranges,
  * row-group pruning) are asserted in LayoutSpec.
  */
object LayoutQueries {

  val all: Seq[QueryDef] = Seq(
    // ORC write → read → typed agg (columnar interchange beyond parquet)
    QueryDef(
      "orc_roundtrip",
      """SELECT o_orderpriority AS priority, count(*) AS n, min(o_orderkey) AS min_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val tmp = Tables.scratchDir("graft_orc_rt")
      Tables.table(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          count(lit(1)).as("n"),
          min(col("o_orderkey")).as("min_key"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    },
    // small-file compaction: 64 ingest-sized files → size-targeted few;
    // aggregates are order-free exact (count/min/max), so the hash
    // verifies the compaction moved every row exactly once
    QueryDef(
      "layout_compact",
      """SELECT event_type, count(*) AS n, min(event_id) AS min_id,
        |  max(value) AS max_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val in = Tables.scratchDir("graft_compact_in")
      val out = Tables.scratchDir("graft_compact_out")
      Tables.table(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(64) // simulate streaming-ingest small files
        .write.mode("overwrite").parquet(in)
      Layout.compact(s, in, out, targetFileBytes = 32L * 1024 * 1024): Unit
      s.read.parquet(out)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          min(col("event_id")).as("min_id"),
          max(col("value")).as("max_value"))
    },
    // range-clustered write + selective read-back: the scan-side filter
    // only touches the files whose [min,max] intersects the predicate
    // (disjointness asserted in LayoutSpec); content parity checked here
    QueryDef(
      "layout_range_cluster",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 5000""".stripMargin) { (s, d) =>
      val out = Tables.scratchDir("graft_range_cluster")
      Layout.rangeClusteredWrite(
        Tables.table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "o_orderkey", numFiles = 8, outDir = out)
      s.read.parquet(out)
        .filter(col("o_orderkey").between(1000, 5000))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    // Z-order clustered write + two-sided box read-back: the Morton
    // interleave gives BOTH columns tight per-file min/max footers
    // (box-skip asserted in LayoutSpec); content parity checked here
    QueryDef(
      "layout_zorder",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey BETWEEN 100 AND 400
        |  AND o_totalprice BETWEEN 50000 AND 150000""".stripMargin) { (s, d) =>
      val out = Tables.scratchDir("graft_zorder")
      Layout.zorderClusteredWrite(
        Tables.table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "o_custkey", "o_totalprice", numFiles = 16, outDir = out)
      s.read.parquet(out)
        .filter(col("o_custkey").between(100, 400) &&
          col("o_totalprice").between(50000, 150000))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }
  )
}
