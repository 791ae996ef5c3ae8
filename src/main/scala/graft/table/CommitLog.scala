package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The unified commit log of an [[IcebergLite]] table — appends (visible
  * epochs), content mutations (DELETE/UPDATE/MERGE rewrite gens, with the
  * change rows they recorded) and layout-only compactions — shared by
  * `CALL graft.system.history` and the `graft.db.t.history` metadata table.
  *
  * The engine records no wall-clock (replay determinism), so ordering is
  * the HONEST partial order the metadata does carry: each snapshot stamps
  * `maxGen` (the content gens visible at its commit), so rows sort by
  * (gen watermark, gens before the epochs that saw them); a compaction
  * sorts after every content gen it folds and every epoch it replaces.
  * Exactly one of epoch_id/gen is set per row — NOTE the two gen sequences
  * are distinct: content gens number `delete-<gen>.json` manifests,
  * compaction gens number `compact-<gen>` layouts (each starts at its own
  * origin, exactly as on disk). change_rows is null for appends (served
  * from epoch files), compactions (no content change) and pre-CDC
  * manifests. */
object CommitLog {

  /** Plain JVM values (String / boxed numerics / null) → InternalRow —
    * the ONE conversion both the CALL procedures and the metadata-table
    * readers use, so a new value type is handled in a single place. */
  def internalRow(values: Seq[Any]): InternalRow =
    new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case other => other.asInstanceOf[AnyRef]
    }.toArray[Any])

  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("epoch_id", LongType, nullable = true),
    StructField("gen", LongType, nullable = true),
    StructField("operation", StringType, nullable = false),
    StructField("num_files", IntegerType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("change_rows", LongType, nullable = true)))

  /** Log rows as plain JVM values (String / boxed Long / boxed Int / null)
    * matching [[schema]], in the partial order described above. Metadata-
    * scale: one row per commit, computed from the already-loaded
    * manifests. */
  def rows(table: IcebergLite): Array[Array[Any]] = {
    val epochs = table.snapshots.map { s =>
      ((s.maxGen, 1L, s.epochId),
        Array[Any]("append", s.epochId, null, s.queryId, s.files.size,
          s.files.map(_.rowCount).sum, null))
    }
    val gens = table.deletes.map { d =>
      ((d.gen, 0L, 0L),
        Array[Any](d.op.getOrElse(
          if (d.activatesEpoch.isDefined) "merge" else "rewrite"),
          null, d.gen, d.predicate,
          d.fileSets.map(_.files.size).sum,
          d.fileSets.flatMap(_.files).map(_.rowCount).sum,
          d.changeFiles
            .map(cf => java.lang.Long.valueOf(cf.map(_.rowCount).sum))
            .orNull))
    }
    val genAtEpoch = table.snapshots.map(s => s.epochId -> s.maxGen).toMap
    val comps = table.compactions.map { c =>
      val watermark = (c.foldsDeletes ++
        c.replaces.flatMap(genAtEpoch.get)).foldLeft(0L)(math.max)
      ((watermark, 2L, c.gen),
        Array[Any]("compaction", null, c.gen,
          s"replaces epochs [${c.replaces.mkString(",")}]",
          c.files.size, c.files.map(_.rowCount).sum, null))
    }
    (epochs ++ gens ++ comps).sortBy(_._1).map(_._2).toArray
  }
}
