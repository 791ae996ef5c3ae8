package graft.catalog

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.IcebergLite

/** SQL `CALL` surface for table maintenance — the operations a table owner
  * schedules, reachable without JVM access:
  *
  * {{{
  *   CALL graft.system.compact('db.t')          -- fold new epochs (incremental;
  *                                                 mode => 'full' re-clusters)
  *   CALL graft.system.gc('db.t')               -- reclaim superseded files
  *   CALL graft.system.expire_metadata('db.t')  -- retire settled manifests
  *   CALL graft.system.remove_orphans('db.t')   -- drop unreferenced files
  *   CALL graft.system.vacuum('db.t')           -- compact + gc + expiry
  *   CALL graft.system.snapshots('db.t')        -- inspect the snapshot log
  *   CALL graft.system.history('db.t')          -- the unified commit log
  *   CALL graft.system.changes('db.t', 3)       -- CDC counts since epoch 3
  *   CALL graft.system.restore('db.t', '3')     -- roll back to epoch 3
  *   CALL graft.system.restore('db.t', 'v1')    -- ... or to a tag
  *   CALL graft.system.staged('db.t')           -- un-published WAP stages
  *   CALL graft.system.publish_staged('db.t', 5)  -- audit passed
  *   CALL graft.system.discard_staged('db.t', 5)  -- audit failed
  * }}}
  *
  * All procedures delegate to the existing [[IcebergLite]] maintenance
  * methods, so the SQL path carries the same guarantees the programmatic
  * one does: compaction is atomic (manifest swap), gc respects registered
  * incremental readers mechanically, expiry records the horizon that makes
  * fresh readers below it fail loudly. Results come back as rows (a
  * [[LocalScan]]) so `CALL` output is inspectable in SQL.
  *
  * Procedures run on the driver, like the programmatic calls they wrap —
  * the heavy lifting inside (compaction's rewrite) is still a distributed
  * Spark job.
  */
private[catalog] object GraftProcedures {
  /** One row per committed epoch of each helper's result. */
  private def row(values: Any*): InternalRow =
    graft.table.CommitLog.internalRow(values)

  private val tableParam =
    ProcedureParameter.in("table", StringType)
      .comment("table identifier relative to this catalog, e.g. 'db.t'")
      .build()

  /** A fixed-signature maintenance procedure: `bind` is the identity (the
    * declared parameters already carry defaults; Spark coerces and fills
    * them before `call`). */
  private final class Proc(
      procName: String,
      params: Array[ProcedureParameter],
      resultSchema: StructType,
      run: (IcebergLite, InternalRow) => Array[InternalRow],
      resolve: String => String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"IcebergLite maintenance procedure $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    // every procedure mutates or inspects table state as of the call
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): JIterator[Scan] = {
      val table = new IcebergLite(resolve(input.getUTF8String(0).toString))
      val resultRows = run(table, input)
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = resultRows
        override def description(): String = s"GraftProcedureResult($procName)"
      }).iterator()
    }
  }

  /** The `buckets` parameter convention shared by compact and vacuum:
    * -1 keeps the table's declared count (8 if never declared). */
  private def resolveBuckets(table: IcebergLite, n: Int): Int = n match {
    case -1 => table.declaredNumBuckets.getOrElse(8)
    case b  => require(b > 0, s"buckets must be positive, got $b"); b
  }

  /** The `mode` parameter convention shared by compact and vacuum. */
  private def fullMode(proc: String, mode: String): Boolean = mode match {
    case "incremental" => false
    case "full" => true
    case other => throw new IllegalArgumentException(
      s"$proc mode '$other': expected 'incremental' or 'full'")
  }

  /** Procedure registry for a catalog whose `resolve` maps a dotted table
    * name to an IcebergLite root (validated + path-safe). */
  def procedures(resolve: String => String): Map[String, UnboundProcedure] = Map(
    "compact" -> new Proc("compact",
      Array(tableParam,
        ProcedureParameter.in("buckets", IntegerType)
          .defaultValue("-1")
          .comment("target bucket count; -1 keeps the table's declared count")
          .build(),
        ProcedureParameter.in("mode", StringType)
          .defaultValue("'incremental'")
          .comment("'incremental' reuses the prior generation's live files " +
            "and rewrites only the un-replaced epochs (cost ~ churn); " +
            "'full' re-clusters everything into one file per bucket")
          .build()),
      StructType(Seq(
        StructField("generation", LongType, nullable = false),
        StructField("compacted_files", IntegerType, nullable = false),
        StructField("reused_files", IntegerType, nullable = false))),
      (table, in) => {
        val gen = table.compact(SparkSession.active,
          resolveBuckets(table, in.getInt(1)),
          full = fullMode("compact", in.getUTF8String(2).toString))
        // compacted_files = files this fold actually WROTE (part-c<gen>);
        // reused_files = the prior generation's files carried verbatim —
        // an operator watching compaction work sees a churn-sized number
        // for a churn-sized job, not the corpus
        val (rewritten, reused) =
          if (gen < 0) (0, 0)
          else table.compactions.find(_.gen == gen)
            .map(_.files.partition(_.path.contains(f"part-c$gen%04d")))
            .map { case (w, r) => (w.size, r.size) }.getOrElse((0, 0))
        Array(row(gen, rewritten, reused))
      }, resolve),

    "gc" -> new Proc("gc",
      Array(tableParam),
      StructType(Seq(
        StructField("deleted_files", IntegerType, nullable = false))),
      (table, _) => Array(row(table.gc().size)), resolve),

    "expire_metadata" -> new Proc("expire_metadata",
      Array(tableParam,
        ProcedureParameter.in("retain_last", IntegerType)
          .defaultValue("8")
          .comment("keep at least this many trailing snapshot manifests")
          .build()),
      StructType(Seq(
        StructField("expired_manifests", IntegerType, nullable = false),
        StructField("expiry_horizon", LongType, nullable = false))),
      (table, in) => {
        val expired = table.expireMetadata(in.getInt(1))
        Array(row(expired.size, table.expiryHorizon.getOrElse(-1L)))
      }, resolve),

    "remove_orphans" -> new Proc("remove_orphans",
      Array(tableParam),
      StructType(Seq(
        StructField("removed_path", StringType, nullable = false))),
      (table, _) => table.removeOrphans().map(p => row(p)).toArray, resolve),

    // the whole shrink lifecycle in one call: fold the un-replaced epochs
    // into a new generation (INCREMENTAL by default — cost ~ the churn
    // since the last fold; schedule mode => 'full' periodically to
    // re-cluster the sorted runs incremental passes accumulate), reclaim
    // superseded data files, retire settled manifests. Each step takes the
    // maintenance lock itself; reader-retention guards (gc's minLive,
    // expiry's retain_last) apply exactly as in the individual calls.
    "vacuum" -> new Proc("vacuum",
      Array(tableParam,
        ProcedureParameter.in("retain_last", IntegerType)
          .defaultValue("8")
          .comment("keep at least this many trailing snapshot manifests")
          .build(),
        ProcedureParameter.in("buckets", IntegerType)
          .defaultValue("-1")
          .comment("target bucket count; -1 keeps the table's declared count")
          .build(),
        ProcedureParameter.in("mode", StringType)
          .defaultValue("'incremental'")
          .comment("'incremental' folds only the un-replaced epochs; " +
            "'full' re-clusters everything (the periodic rewrite)")
          .build()),
      StructType(Seq(
        StructField("generation", LongType, nullable = false),
        StructField("deleted_files", IntegerType, nullable = false),
        StructField("expired_manifests", IntegerType, nullable = false))),
      (table, in) => {
        val gen = table.compact(SparkSession.active,
          resolveBuckets(table, in.getInt(2)),
          full = fullMode("vacuum", in.getUTF8String(3).toString))
        val deleted = table.gc().size
        val expired = table.expireMetadata(in.getInt(1)).size
        Array(row(gen, deleted, expired))
      }, resolve),

    // named tags: retention-pinning refs — VERSION AS OF '<name>' resolves
    // through the catalog; gc/expiry keep every epoch at or below the
    // newest tag replayable until the tag is dropped
    "tag" -> new Proc("tag",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("tag name (letters first; never shaped like an epoch id)")
          .build(),
        ProcedureParameter.in("epoch", LongType)
          .comment("committed epoch the tag pins")
          .build()),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("epoch", LongType, nullable = false))),
      (table, in) => {
        val name = in.getUTF8String(1).toString
        table.tag(name, in.getLong(2))
        Array(row(name, in.getLong(2)))
      }, resolve),

    "drop_tag" -> new Proc("drop_tag",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("tag to drop (releases its retention pin)").build()),
      StructType(Seq(
        StructField("dropped", StringType, nullable = false))),
      (table, in) => {
        val name = in.getUTF8String(1).toString
        table.dropTag(name)
        Array(row(name))
      }, resolve),

    "tags" -> new Proc("tags",
      Array(tableParam),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("epoch", LongType, nullable = false))),
      (table, _) => table.tags.toSeq.sortBy(_._1)
        .map { case (n, e) => row(n, e) }.toArray, resolve),

    // branches: named chains of staged epochs publishing atomically —
    // write with df.writeTo(...).option("branch", name).append(), audit
    // with spark.read...option("branch", name), then fast_forward (all
    // epochs visible at once) or drop_branch (all discarded)
    "create_branch" -> new Proc("create_branch",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("branch name (letters first; shares the tag name space)")
          .build()),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("reserved_gen", LongType, nullable = false))),
      (table, in) => {
        val name = in.getUTF8String(1).toString
        Array(row(name, table.createBranch(name)))
      }, resolve),

    "branches" -> new Proc("branches",
      Array(tableParam),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("reserved_gen", LongType, nullable = false),
        StructField("staged_epochs", LongType, nullable = false))),
      (table, _) => table.branches.toSeq.sortBy(_._1)
        .map { case (n, g) =>
          row(n, g, table.branchEpochs(n).length.toLong)
        }.toArray, resolve),

    "fast_forward" -> new Proc("fast_forward",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("branch to publish — every staged epoch becomes " +
            "visible in ONE atomic manifest write").build(),
        ProcedureParameter.in("force", BooleanType)
          .defaultValue("false")
          .comment("publish even if an incremental reader's offset " +
            "already passed a branch epoch (that stream will never see it)")
          .build()),
      StructType(Seq(
        StructField("activated_epoch", LongType, nullable = false))),
      (table, in) => {
        val name = in.getUTF8String(1).toString
        table.fastForward(name, force = in.getBoolean(2)).map(e => row(e)).toArray
      }, resolve),

    "drop_branch" -> new Proc("drop_branch",
      Array(tableParam,
        ProcedureParameter.in("name", StringType)
          .comment("branch to discard (staged epochs + files deleted; " +
            "loud if already fast-forwarded)").build()),
      StructType(Seq(
        StructField("deleted", StringType, nullable = false))),
      (table, in) => {
        val name = in.getUTF8String(1).toString
        table.dropBranch(name).map(p => row(p)).toArray
      }, resolve),

    // CDC inspection: per-change-type row counts between two versions —
    // the bounded summary of graft.table.TableChanges.since (the full
    // distributed change feed is the programmatic surface; a CALL result
    // materializes on the driver, so it reports counts, not rows)
    "changes" -> new Proc("changes",
      Array(tableParam,
        ProcedureParameter.in("from_epoch", LongType)
          .comment("diff against VERSION AS OF this committed epoch")
          .build(),
        ProcedureParameter.in("to_epoch", LongType)
          .defaultValue("-1")
          .comment("end version; -1 = the current effective view")
          .build()),
      StructType(Seq(
        StructField("change_type", StringType, nullable = false),
        StructField("rows", LongType, nullable = false))),
      (table, in) => {
        val to = in.getLong(2) match {
          case -1L => None
          case b => Some(b)
        }
        graft.table.TableChanges.summary(SparkSession.active,
          table.root, in.getLong(1), to)
          .map { case (k, n) => row(k, n) }.toArray
      }, resolve),

    "snapshots" -> new Proc("snapshots",
      Array(tableParam),
      StructType(Seq(
        StructField("epoch_id", LongType, nullable = false),
        StructField("query_id", StringType, nullable = false),
        StructField("num_files", IntegerType, nullable = false),
        StructField("num_rows", LongType, nullable = false))),
      (table, _) => table.snapshots.map { s =>
        row(s.epochId, s.queryId, s.files.size, s.files.map(_.rowCount).sum)
      }.toArray, resolve),

    // DESCRIBE-HISTORY analogue: the unified commit log — semantics and
    // ordering documented on [[graft.table.CommitLog]] (shared with the
    // composable `graft.db.t.history` metadata table).
    "history" -> new Proc("history",
      Array(tableParam),
      graft.table.CommitLog.schema,
      (table, _) =>
        graft.table.CommitLog.rows(table).map(vs => row(vs.toSeq: _*)),
      resolve),

    // Delta-RESTORE / Iceberg-rollback: make a prior committed state the
    // live view again, as a NEW auditable gen (nothing erased). The
    // version is an epoch id or a tag name, resolved to "the state when
    // that epoch was freshly committed" (the CDC anchor,
    // IcebergLite.versionAtEpoch) — the same rule VERSION AS OF uses for
    // names. Metadata-only: no data file is copied; gc'd targets fail
    // loudly (tags pin retention). generation -1 = the live view already
    // matched, nothing committed.
    "restore" -> new Proc("restore",
      Array(tableParam,
        ProcedureParameter.in("version", StringType)
          .comment("committed epoch id or tag name to roll back to")
          .build()),
      StructType(Seq(
        StructField("generation", LongType, nullable = false),
        StructField("removed_files", IntegerType, nullable = false),
        StructField("restored_files", IntegerType, nullable = false),
        StructField("change_rows", LongType, nullable = false))),
      (table, in) => {
        val version = in.getUTF8String(1).toString.trim
        val epoch =
          try version.toLong
          catch {
            case _: NumberFormatException =>
              table.tags.getOrElse(version, throw new IllegalArgumentException(
                s"restore version '$version': not an epoch id and not a " +
                  s"tag of this table (tags: " +
                  s"${table.tags.keys.toSeq.sorted.mkString(", ")})"))
          }
        val st = table.restore(SparkSession.active, table.versionAtEpoch(epoch))
        Array(row(st.gen, st.removedFiles, st.restoredFiles, st.changeRows))
      }, resolve),

    // Write-audit-publish: stage with
    // df.writeTo(...).option("staged", "true").append() — the epoch lands
    // INVISIBLE to every reader; audit it (IcebergLite.readStaged), then
    // publish (one atomic manifest write — the merge activation protocol,
    // so streams/CDC/time travel compose) or discard (drops the stage's
    // files; visible history is never touched).
    "staged" -> new Proc("staged",
      Array(tableParam),
      StructType(Seq(
        StructField("epoch_id", LongType, nullable = false),
        StructField("reserved_gen", LongType, nullable = false),
        StructField("query_id", StringType, nullable = false),
        StructField("num_files", IntegerType, nullable = false),
        StructField("num_rows", LongType, nullable = false))),
      (table, _) => table.stagedEpochs.map { case (s, g) =>
        row(s.epochId, g, s.queryId, s.files.size,
          s.files.map(_.rowCount).sum)
      }.toArray, resolve),

    "publish_staged" -> new Proc("publish_staged",
      Array(tableParam,
        ProcedureParameter.in("epoch", LongType)
          .comment("staged epoch to make visible").build(),
        ProcedureParameter.in("force", BooleanType)
          .defaultValue("false")
          .comment("publish even if an incremental reader's offset " +
            "already passed the epoch (that stream will never see it)")
          .build()),
      StructType(Seq(
        StructField("activated_gen", LongType, nullable = false))),
      (table, in) => Array(row(
        table.publishStaged(in.getLong(1), force = in.getBoolean(2)))),
      resolve),

    "discard_staged" -> new Proc("discard_staged",
      Array(tableParam,
        ProcedureParameter.in("epoch", LongType)
          .comment("staged epoch to drop (files + snapshot)").build()),
      StructType(Seq(
        StructField("deleted_files", IntegerType, nullable = false))),
      (table, in) =>
        Array(row(table.discardStaged(in.getLong(1)).size)), resolve)
  )

  val Namespace: Array[String] = Array("system")

  def identifiers(resolve: String => String): Array[Identifier] =
    procedures(resolve).keys.toArray.sorted.map(Identifier.of(Namespace, _))
}
