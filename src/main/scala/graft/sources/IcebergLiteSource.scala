package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.IcebergLite

/** DataSource V2 connector for [[IcebergLite]] tables — most importantly a
  * streaming `MicroBatchStream` whose offsets are the table's EPOCH IDS, so
  * a second streaming query can consume a table's snapshot deltas
  * incrementally and exactly-once (queries chain: redact → table → windowed
  * agg → table). This is the engine analogue of the reference's folder-watch
  * loop re-listing the input directory per pass
  * (/root/reference/mechanisms/watermark_processor.py:235) — except the
  * snapshot log makes the "new files since last time" question transactional
  * instead of racy.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.IcebergLiteSource")
  *     .option("path", tableRoot).load()
  * }}}
  *
  * Semantics and scale notes:
  *  - `latestOffset` is one metadata-file listing — no data I/O;
  *  - `planInputPartitions(start, end]` maps each data file of the epochs in
  *    the range to one partition: parallelism = buckets × epochs, and since
  *    epochs are immutable the planning is deterministic under replay
  *    (exactly-once composes across chained queries via the checkpoint's
  *    offset log + the sink's idempotent commits);
  *  - readers must stay ahead of compaction GC ([[IcebergLite.gc]] deletes
  *    replaced epochs' files); a lagging reader fails loudly rather than
  *    silently skipping.
  */
final class IcebergLiteSource extends TableProvider {
  private def root(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "IcebergLiteSource requires option 'path'")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcebergLiteSource.fullSchema(root(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new IcebergLiteTable(properties.get("path"), schema)
}

object IcebergLiteSource {
  /** Business schema from table.json + the sink's lineage columns. */
  def fullSchema(root: String): StructType =
    StructType.fromDDL(new IcebergLite(root).schemaDdl)
      .add("epoch_id", LongType)
      .add("partition_id", IntegerType)
}

final class IcebergLiteTable(root: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"iceberglite:$root"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def schema(): StructType = tableSchema
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      // column pruning: Catalyst hands us the projected schema; the reader
      // asks parquet for exactly those columns (at 100 TB a 2-column
      // projection must not decode the text payload)
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new IcebergLiteScan(root, required)
    }
}

final class IcebergLiteScan(root: String, schema: StructType) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"IcebergLiteScan($root)"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      new IcebergLite(root).effectiveFiles
        .map(f => FilePartition(s"$root/${f.path}"): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GroupRowReaderFactory(schema)
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new IcebergLiteMicroBatchStream(root, schema)
}

/** Offset = highest committed epoch id (−1 before any commit). */
final case class EpochOffset(epoch: Long) extends Offset {
  override def json(): String = s"""{"epoch":$epoch}"""
}

final case class FilePartition(path: String) extends InputPartition

final class IcebergLiteMicroBatchStream(root: String, schema: StructType)
    extends MicroBatchStream {
  private def table = new IcebergLite(root)

  override def initialOffset(): Offset = EpochOffset(-1L)

  override def latestOffset(): Offset =
    EpochOffset(table.snapshots.lastOption.map(_.epochId).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"epoch":(-?\d+)\}""".r
    json.trim match {
      case m(e) => EpochOffset(e.toLong)
      case other => throw new IllegalArgumentException(s"bad offset: $other")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EpochOffset].epoch
    val e = end.asInstanceOf[EpochOffset].epoch
    table.snapshots
      .filter(sn => sn.epochId > s && sn.epochId <= e)
      .flatMap(_.files)
      .map(f => FilePartition(s"$root/${f.path}"): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GroupRowReaderFactory(schema)

  override def commit(end: Offset): Unit = () // source-side no-op; epochs are immutable
  override def stop(): Unit = ()
}

final class GroupRowReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GroupRowReader(partition.asInstanceOf[FilePartition].path, schema)
}

/** Reads one parquet data file via parquet-mr's example Group API and
  * converts rows to `InternalRow` by schema field name (fields absent from
  * the file read as null). Supports the primitive types IcebergLite tables
  * use: string, int, bigint, boolean, double, float, timestamp
  * (TIMESTAMP_MICROS — the sink's canonical writer setting, which maps 1:1
  * onto Spark's internal micros representation). The (possibly pruned)
  * schema is passed to parquet as the requested read schema, so unneeded
  * columns are never decoded. */
final class GroupRowReader(path: String, schema: StructType)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(
        new GroupRowReader.ProjectedReadSupport(schema.fieldNames.toSet),
        new HPath(path))
      .withConf(new Configuration())
      .build()

  private var current: Group = _
  private var fieldIdx: Array[Int] = _ // schema position -> file field index (-1 absent)

  override def next(): Boolean = {
    current = reader.read()
    if (current != null && fieldIdx == null) {
      val fileType = current.getType
      fieldIdx = schema.fields.map { f =>
        if (fileType.containsField(f.name)) fileType.getFieldIndex(f.name) else -1
      }
    }
    current != null
  }

  override def get(): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val fi = fieldIdx(i)
      values(i) =
        if (fi < 0 || current.getFieldRepetitionCount(fi) == 0) null
        else schema.fields(i).dataType match {
          case StringType => UTF8String.fromBytes(current.getBinary(fi, 0).getBytes)
          case IntegerType => current.getInteger(fi, 0)
          case LongType => current.getLong(fi, 0)
          case BooleanType => current.getBoolean(fi, 0)
          case DoubleType => current.getDouble(fi, 0)
          case FloatType => current.getFloat(fi, 0)
          case TimestampType => current.getLong(fi, 0) // micros, 1:1 internal
          case dt => throw new UnsupportedOperationException(
            s"IcebergLiteSource: unsupported type $dt for field ${schema.fields(i).name}")
        }
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = reader.close()
}

object GroupRowReader {
  /** GroupReadSupport that prunes the REQUESTED schema down to the
    * projected column names, taking each field's type/repetition from the
    * FILE's own schema (so required vs optional always matches) — only the
    * projected columns are decoded. */
  final class ProjectedReadSupport(keep: Set[String]) extends GroupReadSupport {
    override def init(conf: Configuration,
                      keyValueMetaData: java.util.Map[String, String],
                      fileSchema: org.apache.parquet.schema.MessageType)
        : org.apache.parquet.hadoop.api.ReadSupport.ReadContext = {
      val kept = fileSchema.getFields.asScala.filter(f => keep(f.getName))
      val pruned = new org.apache.parquet.schema.MessageType(
        fileSchema.getName, kept.asJava)
      new org.apache.parquet.hadoop.api.ReadSupport.ReadContext(pruned)
    }
  }
}
