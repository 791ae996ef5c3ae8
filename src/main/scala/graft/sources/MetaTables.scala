package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.table.{CommitLog, IcebergLite}

/** Iceberg-style inspection tables computed from table METADATA only
  * (`graft.db.t.history`, `graft.db.t.files`): one row per commit / per
  * live data file, read straight off the already-loaded manifests at scan
  * planning time. Unlike `.changes`/`.staged` (which scan data files),
  * these never open a parquet file — on a 10^12-row table the cost is the
  * manifest listing the driver pays for ANY scan plan. Rows ship to
  * executors chunked inside the input partitions, so the SQL surface
  * composes (joins, filters, ORDER BY) without a driver-side collect in
  * the query itself. */
private[sources] abstract class LocalMetaTable(root: String, suffix: String)
    extends Table with SupportsRead {
  require(new IcebergLite(root).exists,
    s"IcebergLite table does not exist at $root")

  /** Metadata rows as plain JVM values matching [[metaSchema]] (String /
    * boxed numerics / null). Evaluated at scan planning — each query sees
    * the metadata as of its own plan. */
  protected def compute(): Array[Array[Any]]
  protected def metaSchema: StructType

  override def schema(): StructType = metaSchema
  override def name(): String = s"iceberglite:$root#$suffix"
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = metaSchema
      override def description(): String = s"MetaScan($root#$suffix)"
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          compute().grouped(LocalMetaTable.RowsPerPartition)
            .map(MetaRowsPartition(_): InputPartition).toArray
        override def createReaderFactory(): PartitionReaderFactory =
          new MetaRowsReaderFactory
      }
    }
}

private[sources] object LocalMetaTable {
  /** Chunk size per input partition — metadata tables are small, but a
    * 10^6-file listing still fans out instead of pinning one task. */
  val RowsPerPartition = 8192
}

/** One chunk of metadata rows (values are JVM-serializable by
  * construction: String / boxed numerics / null). */
final case class MetaRowsPartition(rows: Array[Array[Any]])
    extends InputPartition

private[sources] final class MetaRowsReaderFactory
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case MetaRowsPartition(rows) =>
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            CommitLog.internalRow(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(rows(i)))
          override def close(): Unit = ()
        }
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }
}

/** `graft.db.t.history`: the unified commit log ([[graft.table.CommitLog]])
  * as a composable SQL table — the same rows `CALL graft.system.history`
  * returns, but joinable/filterable (`WHERE kind = 'rewrite'`, joins
  * against `.files`, ...). */
final class HistoryTable(root: String) extends LocalMetaTable(root, "history") {
  override protected def metaSchema: StructType = CommitLog.schema
  override protected def compute(): Array[Array[Any]] =
    CommitLog.rows(new IcebergLite(root))
}

/** `graft.db.t.files`: the LIVE view's data files — exactly the files a
  * full scan would read (post delete-rewrites, latest compaction
  * generation), with their manifest-recorded layout and stats. The ops
  * surface for small-file / skew / freshness debugging: row counts and ts
  * ranges come from the manifests (parquet footers at commit time), no
  * file is opened. */
final class FilesTable(root: String) extends LocalMetaTable(root, "files") {
  override protected def metaSchema: StructType = FilesTable.schema
  override protected def compute(): Array[Array[Any]] = {
    val t = new IcebergLite(root)
    t.effectiveFileSets.flatMap { fs =>
      fs.files.map { f =>
        Array[Any](f.path, f.partitionId, fs.numBuckets, f.rowCount,
          if (f.rowCount == 0) null else java.lang.Long.valueOf(f.minTsMicros),
          if (f.rowCount == 0) null else java.lang.Long.valueOf(f.maxTsMicros))
      }
    }.toArray
  }
}

object FilesTable {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("num_buckets", IntegerType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("min_ts", TimestampType, nullable = true),
    StructField("max_ts", TimestampType, nullable = true)))
}
