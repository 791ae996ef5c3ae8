package graft.sources

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.{DataFrame, GraftInternals, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BoundReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{RepartitionByExpression, Sort}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression => ConnExpression, Expressions, SortDirection, SortOrder => ConnSortOrder}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, V1Write, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import graft.table.IcebergLite

/** Hadoop `Configuration` is `Writable`, not `Serializable`; this is the
  * standard envelope for shipping the prepared parquet-writer conf (schema,
  * codec, timestamp type) to tasks. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  @throws[IOException]
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  @throws[IOException]
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

/** One staged data file of a streaming epoch: `path == null` marks an empty
  * task (no file created — empty buckets must not publish empty parquet
  * files, mirroring the batch path where empty shuffle partitions produce no
  * task file). */
final case class StagedEpochFile(path: String, partitionId: Int, rowCount: Long)
    extends WriterCommitMessage

/** The one Write object behind [[IcebergLiteTable.newWriteBuilder]], serving
  * BOTH batch (`df.write` / SQL `INSERT` — the V1 fallback delegating to
  * [[IcebergLite.commitEpoch]]) and streaming (`df.writeStream.toTable` —
  * [[EpochStreamingWrite]]).
  *
  * `RequiresDistributionAndOrdering` asks Spark to arrange the rows into the
  * engine's canonical layout before they reach the write: clustered by
  * `conv_id` into exactly `numBuckets` partitions (`Distributions.clustered`
  * plans a `RepartitionByExpression` — the same Murmur3 route as
  * `df.repartition(n, col)`, so partition ids are bit-identical to
  * [[IcebergLite.bucketOf]] bucket ids) and sorted `(conv_id, turn_idx)`
  * within partitions. The STREAMING path depends on this (tasks write final
  * bucket files directly — rows shuffle exactly once and never touch the
  * driver). The BATCH path does NOT receive the arrangement in current
  * Spark (measured: the V1 fallback's `insert()` gets the bare query plan —
  * `DistributionAndOrderingUtils.prepareQuery` only runs for true-V2 and
  * micro-batch writes), so `commitEpoch` arranges the rows itself exactly as
  * before; `insert()` still DETECTS the arranged plan shape and skips the
  * internal repartition+sort if a future Spark starts arranging V1-fallback
  * writes too — correct either way, never two shuffles. */
final class GraftWrite(root: String, info: LogicalWriteInfo,
                       truncateFirst: Boolean)
    extends V1Write with RequiresDistributionAndOrdering {
  private val opts = info.options()
  private val incoming: StructType = info.schema()
  private val bucketCols = IcebergLite.bucketColsFor(incoming.fieldNames.toSeq)
  private val sortCols = IcebergLite.sortColsFor(incoming.fieldNames.toSeq)
  /** Bucket count the arrangement AND the commit both use: the table's
    * declared count when it exists, else the creation option. */
  private val numBuckets: Int = {
    val t = new IcebergLite(root)
    (if (t.exists) t.declaredNumBuckets else None)
      .getOrElse(opts.getInt("buckets", 8))
  }

  override def requiredDistribution(): Distribution =
    Distributions.clustered(
      bucketCols.map(c => Expressions.column(c): ConnExpression).toArray)
  override def requiredNumPartitions(): Int = numBuckets
  override def requiredOrdering(): Array[ConnSortOrder] =
    sortCols.map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray

  /** Does `df`'s plan carry exactly the arrangement [[requiredDistribution]]
    * / [[requiredOrdering]] requested (the `Sort` over
    * `RepartitionByExpression` that `DistributionAndOrderingUtils` builds)?
    * Conservative by construction: any unrecognized shape → false → the
    * commit arranges the rows itself. */
  private def arrangedByPlan(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case s: Sort if !s.global =>
        val orderOk = s.order.length == sortCols.length &&
          s.order.zip(sortCols).forall {
            case (o, c) => o.direction == Ascending && (o.child match {
              case a: Attribute => a.name == c
              case _ => false
            })
          }
        orderOk && (s.child match {
          case r: RepartitionByExpression =>
            r.optNumPartitions.contains(numBuckets) &&
              r.partitionExpressions.length == bucketCols.length &&
              r.partitionExpressions.zip(bucketCols).forall {
                case (a: Attribute, c) => a.name == c
                case _ => false
              }
          case _ => false
        })
      case _ => false
    }

  override def toInsertableRelation: InsertableRelation = new InsertableRelation {
    override def insert(data: DataFrame, overwrite: Boolean): Unit = {
      // append-only guards MUST precede the truncation below: an
      // INSERT OVERWRITE aimed at a branch/stage would otherwise commit
      // the (irreversible) live-table truncation and only then throw
      val branchOpt = Option(opts.get("branch")).filter(_.nonEmpty)
      if (branchOpt.isDefined) {
        require(!overwrite && !truncateFirst,
          "branch writes are append-only: INSERT OVERWRITE cannot target " +
            "a branch")
        require(!opts.getBoolean("staged", false),
          "options 'branch' and 'staged' are exclusive: a branch write IS " +
            "a stage (on the branch's shared gen)")
      } else if (opts.getBoolean("staged", false)) {
        require(!overwrite && !truncateFirst,
          "staged=true is append-only: INSERT OVERWRITE cannot be audited " +
            "before its truncation takes effect")
      }
      if (overwrite || truncateFirst) {
        val t = new IcebergLite(root)
        if (t.exists)
          t.deleteWhere(data.sparkSession,
            org.apache.spark.sql.functions.lit(true),
            "true (INSERT OVERWRITE truncation)")
      }
      val table = new IcebergLite(root)
      if (!table.exists) {
        require(opts.getBoolean("createIfAbsent", false),
          s"IcebergLite table does not exist at $root — create it " +
            "first, or write with .option(\"createIfAbsent\", \"true\")")
        table.create(data.schema.toDDL, opts.getInt("buckets", 8))
      }
      // business-schema contract (names + types; order and
      // nullability free; lineage columns are sink-appended)
      val declared = StructType.fromDDL(table.schemaDdl)
      val declaredTypes = declared.map(f => f.name -> f.dataType).toMap
      require(data.schema.length == declared.length &&
          data.schema.forall(f => declaredTypes.get(f.name).contains(f.dataType)),
        s"schema mismatch writing to $root: table declares " +
          s"(${declared.toDDL}); data carries (${data.schema.toDDL}). " +
          "Lineage columns epoch_id/partition_id are appended by the " +
          "sink — do not include them.")
      val queryId = Option(opts.get("queryId")).getOrElse("batch-save")
      // next id over ALL snapshots, pending included: a WAP stage or an
      // in-flight merge insert occupies its id while invisible — the
      // committed view alone would collide and no-op this append
      val epoch = Option(opts.get("epoch")).map(_.toLong)
        .getOrElse(table.nextEpochId)
      val aligned = data.select(
        declared.map(f => org.apache.spark.sql.functions.col(f.name)): _*)
      val buckets = table.declaredNumBuckets.getOrElse(opts.getInt("buckets", 8))
      if (branchOpt.isDefined) {
        // branch write: the epoch joins the branch's staged chain
        // (invisible until CALL graft.system.fast_forward publishes the
        // whole chain atomically); append-only guards ran above, before
        // the truncation
        table.stageEpochOnBranch(aligned, queryId, epoch, buckets, branchOpt.get)
      } else if (opts.getBoolean("staged", false)) {
        // write-audit-publish: the epoch lands INVISIBLE (pendingGen+wap
        // stamp); CALL graft.system.publish_staged / discard_staged (or
        // the programmatic API) decides its fate after the audit
        table.stageEpoch(aligned, queryId, epoch, buckets)
      } else {
        table.commitEpoch(aligned, queryId, epoch, buckets,
          arranged = arrangedByPlan(data))
      }
      ()
    }
  }

  /** The streaming side: resolve/create the table, pin the physical schema
    * (declared business columns + lineage), prepare Spark's own parquet
    * task-writer once on the driver, and hand [[EpochStreamingWrite]] the
    * serializable pieces. Business columns may arrive in any order — a
    * bound-reference projection reorders them to the declared layout
    * task-side, so streamed files are column-identical to batch files. */
  override def toStreaming: StreamingWrite = {
    // Complete output mode reaches a streaming sink as truncate() on the
    // builder. The epoch protocol is append-only (every batch is an
    // immutable epoch); silently appending full snapshots each batch would
    // multiply the data, so Complete fails loudly here. Update mode is
    // already rejected by Spark (no SupportsStreamingUpdateAsAppend).
    require(!truncateFirst,
      s"IcebergLite streaming sink at $root is append-only: Complete " +
        "output mode would re-emit the whole result every micro-batch. " +
        "Use Append mode (aggregations: with a watermark), or foreachBatch " +
        "with DELETE + append for replace-per-batch semantics.")
    val spark = SparkSession.active
    val table = new IcebergLite(root)
    if (!table.exists) {
      require(opts.getBoolean("createIfAbsent", false),
        s"IcebergLite table does not exist at $root — CREATE TABLE first " +
          "(or pass .option(\"createIfAbsent\", \"true\"))")
      table.create(incoming.toDDL, opts.getInt("buckets", 8))
    }
    val declared = StructType.fromDDL(table.schemaDdl)
    val declaredTypes = declared.map(f => f.name -> f.dataType).toMap
    require(incoming.length == declared.length &&
        incoming.forall(f => declaredTypes.get(f.name).contains(f.dataType)),
      s"schema mismatch streaming to $root: table declares " +
        s"(${declared.toDDL}); stream carries (${incoming.toDDL}). " +
        "Lineage columns epoch_id/partition_id are appended by the " +
        "sink — do not include them.")
    val physical = declared
      .add("epoch_id", LongType, nullable = false)
      .add("partition_id", IntegerType, nullable = false)
    val (factory, conf) = GraftInternals.parquetWriterFactory(spark, physical)
    val reorder = declared.map(f => incoming.fieldIndex(f.name)).toArray
    val autoCompactEvery = opts.getInt("autoCompactEvery", 0)
    require(autoCompactEvery >= 0,
      s"autoCompactEvery must be >= 1 (0 disables), got $autoCompactEvery")
    new EpochStreamingWrite(root, info.queryId(), declared, reorder,
      table.declaredNumBuckets.getOrElse(numBuckets), physical,
      factory, new SerializableHadoopConf(conf), autoCompactEvery)
  }
}

/** Native DSv2 streaming write for IcebergLite tables — what makes
  * `df.writeStream.toTable("graft.db.t")` (and
  * `.format("graft.sources.IcebergLiteSource").option("path", ...)`) a
  * first-class exactly-once sink instead of a `foreachBatch` incantation.
  *
  * Division of labor:
  *  - Spark arranges the rows: the enclosing Write's
  *    `RequiresDistributionAndOrdering` requests `conv_id` clustering into
  *    exactly `numBuckets` partitions (the same Murmur3 hash route as
  *    `df.repartition(n, col)` — bucket ids stay bit-identical to
  *    [[IcebergLite.bucketOf]]) plus `(conv_id, turn_idx)` ordering, so the
  *    write needs NO shuffle of its own and task `partitionId` IS the bucket
  *    id;
  *  - each task streams its rows through Spark's own parquet
  *    `OutputWriterFactory` (same encoder stack as the batch path) into ONE
  *    staged file under the table's `_staging/ep-<epoch>/`, appending the
  *    deterministic lineage columns `(epoch_id, partition_id)` row-side;
  *  - the driver's `commit(epochId, msgs)` claims the staged files into
  *    `data/part-<epoch>-<bucket>.parquet` and writes the snapshot through
  *    [[IcebergLite.commitStagedEpoch]] — the SAME per-table epoch lock,
  *    first-writer-wins claim and `(queryId, epochId)` idempotence contract
  *    as the batch `commitEpoch`, so kill/resume replay is a byte-identical
  *    no-op and an alien query reusing an epoch id fails loudly.
  *
  * Scale shape: rows move executor→executor exactly once (the clustering
  * shuffle Spark plans), files are written where the data lives, and the
  * driver touches only file metadata (claim + footer stats) — no row ever
  * passes through the driver, unlike a naive `foreachBatch` + collect sink.
  */
final class EpochStreamingWrite(
    root: String,
    queryId: String,
    declared: StructType,
    reorder: Array[Int],
    numBuckets: Int,
    physicalSchema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableHadoopConf,
    autoCompactEvery: Int = 0) extends StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new EpochStreamWriterFactory(root, declared, reorder, physicalSchema,
      factory, conf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.toSeq.collect {
      case StagedEpochFile(p, pid, _) if p != null => (p, pid)
    }
    new IcebergLite(root).commitStagedEpoch(queryId, epochId, staged, numBuckets)
    // self-maintaining table (`.option("autoCompactEvery", N)`): once N
    // epochs await folding, run an INCREMENTAL compact right here on the
    // stream's driver thread — the fold reads only those N epochs (the
    // prior generation is reused verbatim), so the pause is bounded by the
    // trigger, never the table. The epoch above is already durable; a
    // failed fold is a maintenance hiccup the next trigger retries, so it
    // warns instead of failing the batch. Replay after kill/resume is
    // safe: the fold is layout-only (CDC/stream tokens unaffected) and a
    // re-fired trigger with nothing new to fold is a no-op.
    if (autoCompactEvery > 0) {
      // the threshold is tracked in memory: ONE metadata scan when the
      // query starts, then +1 per commit — a per-trigger re-parse of every
      // snapshot manifest would grow with table age and defeat the
      // "bounded by the trigger" claim. The counter is a trigger
      // heuristic; compact() itself recomputes the truth under the
      // maintenance lock (concurrent writers at worst shift a fold by a
      // trigger).
      if (pendingEpochs < 0) {
        val t = new IcebergLite(root)
        val replaced = t.compactions.flatMap(_.replaces).toSet
        pendingEpochs = t.snapshots.count(s => !replaced.contains(s.epochId))
      } else pendingEpochs += 1
      if (pendingEpochs >= autoCompactEvery) {
        try {
          new IcebergLite(root).compact(SparkSession.active, numBuckets)
          pendingEpochs = 0
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] autoCompactEvery=$autoCompactEvery " +
              s"fold of $root failed (epoch $epochId is committed and " +
              s"durable; the next trigger retries): $e")
        }
      }
    }
    ()
  }

  /** Un-folded epoch count for the autoCompactEvery trigger: −1 = not yet
    * initialized from metadata (first commit of this query run). */
  private var pendingEpochs: Int = -1

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    new IcebergLite(root).abortStagedEpoch(epochId)
}

private[sources] final class EpochStreamWriterFactory(
    root: String,
    declared: StructType,
    reorder: Array[Int],
    physicalSchema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableHadoopConf) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new EpochDataWriter(root, declared, reorder, physicalSchema, factory,
      conf, partitionId, taskId, epochId)
}

/** Task-side writer: lazily opens ONE parquet file on the first row (empty
  * buckets stage nothing), appends the lineage columns via a reused
  * [[JoinedRow]] (no per-row allocation), and names the staged file by
  * `(bucket, taskId)` — `taskId` is unique per attempt, so a speculative or
  * retried attempt never corrupts another attempt's bytes; the commit
  * coordinator guarantees only one attempt's message reaches the driver. */
private[sources] final class EpochDataWriter(
    root: String,
    declared: StructType,
    reorder: Array[Int],
    physicalSchema: StructType,
    factory: OutputWriterFactory,
    conf: SerializableHadoopConf,
    partitionId: Int,
    taskId: Long,
    epochId: Long) extends DataWriter[InternalRow] {

  private var writer: OutputWriter = null
  private var stagedPath: String = null
  private var rows = 0L
  private val lineage = new GenericInternalRow(
    Array[Any](epochId, partitionId))
  private val joined = new JoinedRow
  /** Reorders incoming business columns to the declared layout; null when
    * the stream already matches (the common case — zero per-row cost). */
  private val proj: UnsafeProjection =
    if (reorder.zipWithIndex.forall { case (src, dst) => src == dst }) null
    else UnsafeProjection.create(declared.zipWithIndex.map { case (f, i) =>
      BoundReference(reorder(i), f.dataType, nullable = true)
    })

  override def write(row: InternalRow): Unit = {
    if (writer == null) open()
    val business = if (proj == null) row else proj(row)
    writer.write(joined(business, lineage))
    rows += 1
  }

  private def open(): Unit = {
    val dir = Paths.get(root, "_staging", s"ep-$epochId")
    Files.createDirectories(dir)
    stagedPath = dir.resolve(
      f"task-$partitionId%05d-$taskId.parquet").toString
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-stream", (epochId & 0x7fffffffL).toInt),
        TaskType.MAP, partitionId),
      0)
    writer = factory.newInstance(stagedPath, physicalSchema,
      new TaskAttemptContextImpl(conf.value, attempt))
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) { writer.close(); writer = null }
    StagedEpochFile(stagedPath, partitionId, rows)
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() finally writer = null
    }
    if (stagedPath != null) Files.deleteIfExists(Paths.get(stagedPath))
    ()
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
