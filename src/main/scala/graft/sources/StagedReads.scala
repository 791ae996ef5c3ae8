package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.table.IcebergLite

/** The `.staged` metadata table: the un-published write-audit-publish
  * stages of an IcebergLite table ([[graft.table.IcebergLite.stageEpoch]]),
  * readable for SQL-side audits while still INVISIBLE in the table proper:
  *
  * {{{
  *   df.writeTo("graft.db.t").option("staged", "true").append()
  *   spark.sql("SELECT ... FROM graft.db.t.staged WHERE ...")  -- audit
  *   spark.sql("CALL graft.system.publish_staged('db.t', 5)")  -- or discard
  * }}}
  *
  * Schema: the table's full read schema plus `_staged_epoch` /
  * `_reserved_gen` longs identifying each stage. Serving is pure file
  * scans of the staged snapshots' own manifest-listed files (the same
  * vectorized multi-file reader + constant-vector metadata columns as the
  * change feed — no join, no shuffle, no per-row materialization). */
final class StagedTable(root: String) extends Table with SupportsRead {
  require(new IcebergLite(root).exists,
    s"IcebergLite table does not exist at $root")
  override def name(): String = s"iceberglite:$root#staged"
  override def schema(): StructType =
    new IcebergLite(root).fullReadSchema
      .add(StagedTable.StagedEpochCol, LongType, nullable = false)
      .add(StagedTable.ReservedGenCol, LongType, nullable = false)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema()
      override def description(): String = s"StagedScan($root)"
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val t = new IcebergLite(root)
          t.stagedEpochs.map { case (s, g) =>
            StagedPartition(s.files.map(f => s"$root/${f.path}"),
              s.epochId, g): InputPartition
          }.toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new StagedReaderFactory(new IcebergLite(root).fullReadSchema)
      }
    }
}

object StagedTable {
  val StagedEpochCol = "_staged_epoch"
  val ReservedGenCol = "_reserved_gen"
}

/** One un-published stage: its snapshot's manifest-listed files. */
final case class StagedPartition(paths: Seq[String], epoch: Long, gen: Long)
    extends InputPartition

/** Columnar reader appending the stage identity as constant vectors —
  * decode cost equals a plain scan of the same bytes. Pre-evolution
  * staged files null-fill evolved columns like any table read. */
final class StagedReaderFactory(tableSchema: StructType)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    partition match {
      case StagedPartition(paths, epoch, gen) =>
        new ConstantsAppendedReader(
          new MultiFileColumnarReader(paths, tableSchema),
          Seq(Right(Some(epoch)), Right(Some(gen))))
      case other => throw new IllegalStateException(s"unexpected partition $other")
    }

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("staged reads are columnar-only")
}
