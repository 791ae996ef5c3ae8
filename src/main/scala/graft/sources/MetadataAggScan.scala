package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._

import graft.table.IcebergLite

/** Metadata-only aggregate pushdown ([[SupportsPushDownAggregates]] on the
  * connector's ScanBuilder): an UNFILTERED global `COUNT(*)` / `MIN(ts)` /
  * `MAX(ts)` is answered from the manifests alone — per-file `rowCount` and
  * footer-exact ts stats — with ZERO data IO and zero rows moved. Before
  * this, `count()` on the connector already skipped parquet (the
  * zero-column projection emits manifest-counted empty rows) but still
  * ITERATED one empty row per table row through the aggregate: at 10^12
  * rows that is 10^12 function calls for a number the manifest already
  * holds. Now the scan returns the single result row directly
  * (complete pushdown — Spark plans no aggregate at all).
  *
  * Safety gates (all checked before claiming the pushdown; any failure →
  * decline, Spark runs the normal plan):
  *  - no filters in the query (every engine filter is residual, so Spark
  *    only attempts aggregate pushdown on filterless scans anyway — the
  *    builder double-checks);
  *  - no GROUP BY, no DISTINCT;
  *  - `MIN/MAX` only on `ts`, the one column whose manifest stats are
  *    footer-exact by construction (recomputed on every delete/update
  *    rewrite, so the effective view's stats are exact post-mutation too);
  *  - the footer-stats-absent fallback signature (`rowCount > 0` with
  *    `minTs == maxTs == 0`, possible for an all-null ts file) declines
  *    MIN/MAX rather than serving the sentinel as data — COUNT(*) is
  *    unaffected (row counts are always exact);
  *  - time travel composes: the historical file sets carry the same exact
  *    stats ([[IcebergLite.fileSetsAsOf]]).
  */
object MetadataAggScan {
  sealed trait AggSpec
  case object CountStarSpec extends AggSpec
  case object MinTsSpec extends AggSpec
  case object MaxTsSpec extends AggSpec

  private def tsRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.toSeq == Seq("ts")
      case _ => false
    }

  /** Validate a V2 aggregation into specs; None = decline pushdown. */
  def specsOf(agg: Aggregation, schema: StructType): Option[Seq[AggSpec]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    if (agg.aggregateExpressions.isEmpty) return None
    val hasTs = schema.fields.exists(f =>
      f.name == "ts" && f.dataType == TimestampType)
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(CountStarSpec)
      case m: Min if tsRef(m.column) && hasTs => Some(MinTsSpec)
      case m: Max if tsRef(m.column) && hasTs => Some(MaxTsSpec)
      case _: AggregateFunc => None
    }
    if (specs.forall(_.isDefined)) Some(specs.flatten) else None
  }

  def schemaFor(specs: Seq[AggSpec]): StructType =
    StructType(specs.zipWithIndex.map {
      case (CountStarSpec, i) => StructField(s"count_star_$i", LongType, nullable = false)
      case (MinTsSpec, i) => StructField(s"min_ts_$i", TimestampType, nullable = true)
      case (MaxTsSpec, i) => StructField(s"max_ts_$i", TimestampType, nullable = true)
    })
}

final class MetadataAggScan(root: String, specs: Seq[MetadataAggScan.AggSpec],
                            asOf: Option[Long])
    extends Scan with Batch {
  import MetadataAggScan._

  override def readSchema(): StructType = schemaFor(specs)
  override def description(): String =
    s"IcebergLiteMetadataAggScan($root, ${specs.mkString(",")}" +
      asOf.map(e => s", asOf=$e").getOrElse("") + ")"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // driver-side, metadata-only: the manifests are already the answer
    val table = new IcebergLite(root)
    val files = asOf.fold(table.effectiveFileSets)(table.fileSetsAsOf)
      .flatMap(_.files)
    val count = files.map(_.rowCount).sum
    val nonEmpty = files.filter(_.rowCount > 0L)
    val minTs = if (nonEmpty.isEmpty) null
      else java.lang.Long.valueOf(nonEmpty.map(_.minTsMicros).min)
    val maxTs = if (nonEmpty.isEmpty) null
      else java.lang.Long.valueOf(nonEmpty.map(_.maxTsMicros).max)
    val values: Array[java.lang.Long] = specs.map {
      case CountStarSpec => java.lang.Long.valueOf(count)
      case MinTsSpec => minTs
      case MaxTsSpec => maxTs
    }.toArray
    Array(AggRowPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AggRowReaderFactory
}

/** The single aggregate result row, precomputed on the driver (TimestampType
  * values travel as their internal micros representation). */
final case class AggRowPartition(values: Array[java.lang.Long]) extends InputPartition

final class AggRowReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[AggRowPartition].values
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow =
        InternalRow.fromSeq(vs.toSeq.map(v => if (v == null) null else v.longValue()))
      override def close(): Unit = ()
    }
  }
}
