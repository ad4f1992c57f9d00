package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout management — the operators that keep a 100 TB
  * parquet lake scannable. The reference (a MapReduce join harness)
  * inherits whatever file layout its generators produce; at scale the
  * layout IS a query-performance feature: small-file compaction keeps
  * task counts sane and range clustering turns selective scans into
  * file-level skips (parquet min/max footer pruning).
  */
object Layout {

  /** Total on-disk bytes of the data files under `dir` (recursive,
    * ignores _SUCCESS/metadata dot-files). Driver-side listing is the
    * right tool: it is O(#files) metadata, not data. */
  def dataBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L
      else f.length()
    walk(new java.io.File(dir))
  }

  def dataFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.startsWith("_") || f.getName.startsWith(".")) Seq.empty
      else Seq(f)
    walk(new java.io.File(dir))
  }

  /** Compact a directory of (typically many small) parquet files into
    * ceil(totalBytes / targetFileBytes) files. The repartition is a
    * round-robin shuffle — one pass over the data, no key required; at
    * cluster scale this is the maintenance job that follows streaming
    * ingest (thousands of per-batch files → a handful of scan-efficient
    * ones). Returns the compacted file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long): Int = {
    val n = math.max(1L, (dataBytes(inDir) + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Range-clustered write: globally range-partition on `clusterCol`
    * and sort within partitions, so each output file covers a disjoint
    * value range and carries tight parquet min/max footer stats. A
    * selective predicate on the cluster column then prunes whole files
    * (row-group skipping) instead of scanning everything — the
    * single-dimension form of Z-ordering. */
  def rangeClusteredWrite(df: DataFrame, clusterCol: String, numFiles: Int,
      outDir: String): Unit =
    df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(outDir)
}
