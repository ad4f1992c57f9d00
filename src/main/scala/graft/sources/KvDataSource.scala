package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's `key TAB value` text
  * format (MergeJoin.java:35,225 reads it via KeyValueTextInputFormat;
  * the sink shape is RepartitionJoin.java:80) — the same data
  * [[Tables.keyValueText]] parses through the CSV reader, exposed as a
  * first-class Spark source: `spark.read.format("graft-kv").load(dir)`.
  *
  * Where the CSV route always materializes both columns and filters
  * above the scan, this connector implements the V2 pushdown
  * surfaces — the part of the source API that matters at 100 TB:
  *
  *  - `SupportsPushDownRequiredColumns`: a `select(key)` reads and
  *    allocates ONLY the key slice of each line (`ReadSchema` in
  *    explain shows the pruned struct).
  *  - `SupportsPushDownFilters`: `EqualTo`/`StringStartsWith`/
  *    `IsNotNull` on either column evaluate inside the partition
  *    reader, BEFORE row materialization; accepted filters disappear
  *    from the post-scan Filter node (`PushedFilters` in explain).
  *
  * Split model: one InputPartition per file — the reference's own
  * granularity (one mapper per part file); line-splittable chunking
  * would add Hadoop LineRecordReader semantics without changing any
  * measured plan here. Malformed lines (no separator) yield
  * (line, null) like the CSV route's missing-column behavior.
  */
class KvDataSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-kv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KvDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("value", StringType)))

  /** Files under `path` (a file or a directory), part-file sorted for
    * deterministic partition numbering. */
  def listFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    require(f.exists(), s"graft-kv path does not exist: $path")
    val files =
      if (f.isFile) Seq(f)
      else f.listFiles().toSeq
        .filter(x => x.isFile && !x.getName.startsWith("_") && !x.getName.startsWith("."))
    files.map(_.getPath).sorted
  }
}

class KvTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-kv requires a path (use .load(dir))")
  override def name(): String = s"graft-kv:$path"
  override def schema(): StructType = KvDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path)
}

class KvScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = KvDataSource.Schema
  private var pushed: Array[Filter] = Array.empty

  /** Accept the filter shapes the line reader can evaluate on raw
    * slices; everything else stays in Spark's post-scan Filter. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo(a, _: String) => a == "key" || a == "value"
      case StringStartsWith(a, _) => a == "key" || a == "value"
      case IsNotNull(a) => a == "key" || a == "value"
      case _ => false
    }
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KvScan(path, required, pushed)
}

class KvScan(path: String, required: StructType, filters: Array[Filter])
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv $path, PushedFilters: [${filters.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    KvDataSource.listFiles(path).map(KvFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(required, filters)

  /** File-size statistics for the optimizer: without them a V2
    * relation defaults to `spark.sql.defaultSizeInBytes` (= "assume
    * huge"), so a dimension-sized kv table would never be chosen as a
    * broadcast side. Byte size is the on-disk total (text ≈ in-memory
    * row size here); row count is estimated from a 30-bytes/line
    * heuristic and marked as such by the API's Optional contract. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes =
        KvDataSource.listFiles(path).map(f => new java.io.File(f).length()).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes / 30L))
    }
}

case class KvFilePartition(file: String) extends InputPartition

class KvReaderFactory(required: StructType, filters: Array[Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KvPartitionReader(partition.asInstanceOf[KvFilePartition].file,
      required, filters)
}

/** Streams one file line-by-line; filters evaluate on the split key /
  * value strings before the pruned InternalRow is built. */
class KvPartitionReader(file: String, required: StructType, filters: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val lines = java.nio.file.Files.lines(
    java.nio.file.Paths.get(file), java.nio.charset.StandardCharsets.UTF_8)
  private val it = lines.iterator()
  private var row: InternalRow = _

  private def accept(key: String, value: String): Boolean = filters.forall {
    case EqualTo("key", v: String) => key == v
    case EqualTo("value", v: String) => value == v
    case StringStartsWith("key", p) => key != null && key.startsWith(p)
    case StringStartsWith("value", p) => value != null && value.startsWith(p)
    case IsNotNull("key") => key != null
    case IsNotNull("value") => value != null
    case _ => true
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val line = it.next()
      val tab = line.indexOf('\t')
      val (k, v) = if (tab < 0) (line, null) else (line.substring(0, tab), line.substring(tab + 1))
      if (accept(k, v)) {
        val values = required.fields.map { f =>
          val s = if (f.name == "key") k else v
          if (s == null) null else UTF8String.fromString(s)
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
