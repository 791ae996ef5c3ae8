package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.core.RedactionParams
import graft.gen.{GenSpec, StreamFixtures, TranscriptGen}
import graft.stream.Pipeline
import graft.table.IcebergLite

/** The DSv2 incremental source over IcebergLite: snapshot-delta offsets,
  * chained streaming queries, restart-incremental reads. */
class IcebergLiteSourceSpec extends SparkSpec {
  val spec: GenSpec = GenSpec(nConvs = 30)
  val p: RedactionParams = RedactionParams()
  lazy val turns = (0L until spec.nConvs.toLong).flatMap(TranscriptGen.turnsFor(_, spec))

  private def buildRedactedTable(): String = {
    val sliceDir = tmpDir("src-slices")
    StreamFixtures.writeSlices(spark, spec, sliceDir, k = 3)
    val tableRoot = tmpDir("src-table")
    val q = Pipeline.runRedactionToTable(spark, sliceDir, tableRoot,
      tmpDir("src-cp"), p, numBuckets = 2)
    q.awaitTermination()
    tableRoot
  }

  test("chained query: redact -> table -> DSv2 stream -> windowed agg == batch") {
    val tableRoot = buildRedactedTable()
    val stream = spark.readStream
      .format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot)
      .load()
    val agg = stream
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("was_redacted"), 1L).otherwise(0L)).as("n_red"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("role"), col("n"), col("n_red"))
    val q = agg.writeStream.format("memory").queryName("chained")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("chained").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    val batch = new IcebergLite(tableRoot).read(spark)
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("was_redacted"), 1L).otherwise(0L)).as("n_red"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("role"), col("n"), col("n_red"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(streamed === batch)
  }

  test("batch read through the connector == native table read") {
    val tableRoot = buildRedactedTable()
    val viaConnector = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load()
      .select("conv_id", "turn_idx", "text_redacted", "epoch_id", "partition_id")
      .orderBy("conv_id", "turn_idx").collect()
    val native = new IcebergLite(tableRoot).read(spark)
      .select("conv_id", "turn_idx", "text_redacted", "epoch_id", "partition_id")
      .orderBy("conv_id", "turn_idx").collect()
    assert(viaConnector.toSeq === native.toSeq)
  }

  test("column pruning pushes the projected schema into the parquet read") {
    val tableRoot = buildRedactedTable()
    val df = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load()
      .select("conv_id", "turn_idx")
    // the optimized scan must carry only the projected columns
    val scanSchemas = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.readSchema()
    }
    assert(scanSchemas.nonEmpty)
    assert(scanSchemas.head.fieldNames.toSeq === Seq("conv_id", "turn_idx"),
      s"scan should be pruned, got ${scanSchemas.head.fieldNames.mkString(",")}")
    // and the pruned read returns correct values
    val viaConnector = df.orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val native = new IcebergLite(tableRoot).read(spark)
      .select("conv_id", "turn_idx").orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(viaConnector.toSeq === native.toSeq)
  }

  test("count() through the connector: empty projected schema never opens " +
    "parquet, manifest row counts drive the answer (round-2 ADVICE)") {
    val tableRoot = buildRedactedTable()
    val viaConnector = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load().count()
    val native = new IcebergLite(tableRoot).read(spark).count()
    assert(viaConnector === native)
    assert(viaConnector > 0L)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): IcebergLiteScan =
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.asInstanceOf[IcebergLiteScan]
    }.head

  /** Number of data FILES the scan would open (partitions are packed or
    * bucket-grouped, so partition count is not the pruning signal). */
  private def scanFileCount(df: org.apache.spark.sql.DataFrame): Int =
    scanOf(df).toBatch.planInputPartitions()
      .map {
        case FilePartition(paths, _, _) => paths.length
        case BucketFilePartition(_, paths, _, _) => paths.length
      }.sum

  test("ts-range + conv_id filter pushdown prunes files at the manifest level") {
    import spark.implicits._
    val tableRoot = tmpDir("prune-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    // 5 epochs with disjoint hour-wide ts ranges, 8 conv_ids across 4 buckets
    val base = 1767225600L * 1000000L // micros
    (0L until 5L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, new java.sql.Timestamp(
          (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    val allFiles = table.effectiveFiles.length
    val conn = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load()

    // (a) ts range covering only epochs 1-2
    val lo = new java.sql.Timestamp((base + 1L * 3600L * 1000000L) / 1000L)
    val hi = new java.sql.Timestamp((base + 2L * 3600L * 1000000L + 3600L * 1000000L - 1L) / 1000L)
    val ranged = conn.filter(col("ts") >= lit(lo) && col("ts") <= lit(hi))
    val rangedParts = scanFileCount(ranged)
    assert(rangedParts < allFiles, s"no pruning: $rangedParts of $allFiles")
    // parity with the unpruned read under the same row filter
    assert(ranged.count() ===
      new IcebergLite(tableRoot).read(spark)
        .filter(col("ts") >= lit(lo) && col("ts") <= lit(hi)).count())

    // (b) conv_id equality prunes to one bucket per epoch
    val byConv = conn.filter(col("conv_id") === "conv3")
    val convParts = scanFileCount(byConv)
    assert(convParts <= allFiles / 2, s"no bucket pruning: $convParts of $allFiles")
    assert(byConv.count() === 25L) // 5 epochs x 5 turns
    // combined: both dimensions prune multiplicatively
    val both = conn.filter(col("conv_id") === "conv3" &&
      col("ts") >= lit(lo) && col("ts") <= lit(hi))
    val bothParts = scanFileCount(both)
    assert(bothParts <= math.min(rangedParts, convParts))
    assert(both.count() === 10L)
    // the pushed filters are visible to explain (PushedFilters analogue)
    assert(scanOf(both).description().contains("conv3"))
  }

  test("exactly-once composes across the chained pair: downstream kill in " +
    "the staged-but-uncommitted window, resume, identical sink table") {
    import java.nio.file.{Files, Paths}
    val upstreamRoot = buildRedactedTable()

    // downstream: DSv2 stream off the redacted table -> per-role counts ->
    // second exactly-once IcebergLite sink
    def runDownstream(sinkRoot: String, cp: String): Unit = {
      val sink = new IcebergLite(sinkRoot)
      sink.create("role string, n bigint, n_red bigint", 2)
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", upstreamRoot).load()
        .groupBy(col("role"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("was_redacted"), 1L).otherwise(0L)).as("n_red"))
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epochId: Long) =>
          sink.commitEpoch(df, "chained-agg", epochId, 2); ()
        }
        .start()
      q.awaitTermination()
    }

    val rootA = tmpDir("chain-a")
    runDownstream(rootA, tmpDir("chain-cpa"))
    val expected = new IcebergLite(rootA).read(spark)
      .select("role", "n", "n_red").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

    // interrupted run: crash in the staged-but-uncommitted window of the
    // LAST downstream epoch (snapshot + Spark commit-log entry missing)
    val rootB = tmpDir("chain-b"); val cpB = tmpDir("chain-cpb")
    runDownstream(rootB, cpB)
    val sinkB = new IcebergLite(rootB)
    val last = sinkB.snapshots.map(_.epochId).max
    Files.delete(Paths.get(rootB, "metadata", f"snap-$last%012d.json"))
    Files.delete(Paths.get(cpB, "commits", last.toString))
    Files.deleteIfExists(Paths.get(cpB, "commits", s".$last.crc"))
    assert(!sinkB.isCommitted(last))
    runDownstream(rootB, cpB) // resume: replayed epoch, idempotent commit
    assert(sinkB.isCommitted(last))
    val replayed = sinkB.read(spark)
      .select("role", "n", "n_red").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed === expected)
  }

  test("gc retention guard: compact + gc while a chained stream lags by " +
    "N epochs — the stream still completes exactly-once, then gc reclaims") {
    import spark.implicits._
    val tableRoot = tmpDir("gcguard-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    def commit(epoch: Long, n: Int): Unit = {
      val df = (0 until n).map { i =>
        (s"c$epoch-${i % 3}", i, new java.sql.Timestamp((1767225600L + epoch * 100 + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "w", epoch, 2))
    }
    val cp = tmpDir("gcguard-cp")
    val totals = scala.collection.mutable.ArrayBuffer[Long]()
    def runOnce(): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }.start()
      q.awaitTermination()
      totals += seen.get(); seen.get()
    }
    commit(0L, 10); commit(1L, 10)
    assert(runOnce() === 20L) // reader registered (Spark may defer commit())
    val rid = table.readerOffsets.keys.head
    assert(table.readerOffsets(rid) <= 1L)

    // stream lags: two new epochs land, then compaction + gc run mid-flight
    commit(2L, 7); commit(3L, 9)
    table.compact(spark, 2)
    table.gc()
    // SAFETY (deterministic): replaced epochs 2 and 3 are still needed by
    // the lagging reader — their files must survive the gc
    val epochFiles = table.snapshots.map(s => s.epochId -> s.files.map(_.path)).toMap
    assert(epochFiles(2L).forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(tableRoot, p))), "epoch 2 lost while reader lags")
    assert(epochFiles(3L).forall(p => java.nio.file.Files.exists(
      java.nio.file.Paths.get(tableRoot, p))), "epoch 3 lost while reader lags")

    // the lagging stream resumes and reads exactly the delta, exactly once
    assert(runOnce() === 16L)
    assert(runOnce() === 0L) // no dupes after catch-up
    // planning of the lagging batch advanced the registration to ≥ 1
    assert(table.readerOffsets(rid) >= 1L)
    // LIVENESS: once the reader acknowledges epoch 3 (the commit() callback
    // Spark delivers on its next cycle — simulated here), gc reclaims all
    // replaced epochs
    table.registerReader(rid, 3L)
    val deleted2 = table.gc()
    assert(deleted2.nonEmpty)
    (0L to 3L).foreach { e =>
      assert(epochFiles(e).forall(p => !java.nio.file.Files.exists(
        java.nio.file.Paths.get(tableRoot, p))), s"epoch $e not reclaimed")
    }
    // total ingested across runs == total committed (no loss, no dupes)
    assert(totals.sum === 36L)

    // metadata expiry composes with the same reader registry: epochs 0-2
    // are replaced, reclaimed, below the reader's horizon and outside the
    // retain window -> their snapshots (the per-epoch manifests) retire
    val expired = table.expireMetadata(retainLast = 1)
    assert(expired.nonEmpty, "settled epochs should expire")
    assert(table.snapshots.map(_.epochId) === Seq(3L))
    assert(runOnce() === 0L) // restart after expiry: clean no-op
    commit(9L, 5)
    assert(runOnce() === 5L) // new epochs still flow through the source
    assert(totals.sum === 41L)
  }

  test("IN-list and OR-of-ts-ranges pushdown prune at the manifest level") {
    import spark.implicits._
    val tableRoot = tmpDir("prune2-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    val base = 1767225600L * 1000000L // micros
    (0L until 5L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, new java.sql.Timestamp(
          (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    val allFiles = table.effectiveFiles.length
    val conn = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load()

    // (a) conv_id IN (...): union of the values' buckets, not a full scan
    val inList = conn.filter(col("conv_id").isin("conv3", "conv5"))
    val inParts = scanFileCount(inList)
    assert(inParts < allFiles, s"IN-list did not prune: $inParts of $allFiles")
    assert(inList.count() === 50L) // 2 convs x 5 epochs x 5 turns
    assert(inList.count() ===
      table.read(spark).filter(col("conv_id").isin("conv3", "conv5")).count())

    // (b) OR of conv_id equalities prunes identically to the IN form
    val orEq = conn.filter(col("conv_id") === "conv3" || col("conv_id") === "conv5")
    assert(scanFileCount(orEq) === inParts)
    assert(orEq.count() === 50L)

    // (c) disjunction of ts ranges: only epochs 0 and 3 survive pruning
    def tsAt(offMicros: Long) = new java.sql.Timestamp((base + offMicros) / 1000L)
    val disjPred =
      (col("ts") >= lit(tsAt(0L)) &&
        col("ts") <= lit(tsAt(3600L * 1000000L - 1))) ||
      (col("ts") >= lit(tsAt(3L * 3600L * 1000000L)) &&
        col("ts") <= lit(tsAt(4L * 3600L * 1000000L - 1)))
    val disj = conn.filter(disjPred)
    val disjParts = scanFileCount(disj)
    assert(disjParts < allFiles, s"OR-range did not prune: $disjParts of $allFiles")
    assert(disjParts * 5 <= allFiles * 2, // 2 of 5 epochs' files
      s"expected 2/5 of files, got $disjParts of $allFiles")
    assert(disj.count() === 80L) // 2 epochs x 8 convs x 5 turns

    // (d) conjunction of both prunes multiplicatively
    val both = conn.filter(col("conv_id").isin("conv3", "conv5") && disjPred)
    val bothParts = scanFileCount(both)
    assert(bothParts <= math.min(inParts, disjParts))
    assert(both.count() === 20L)
  }

  test("expiry horizon: a fresh incremental stream below it fails loudly; " +
    "startAtExpiryHorizon opts into post-horizon-only history") {
    import spark.implicits._
    val tableRoot = tmpDir("horizon-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    def commit(epoch: Long, n: Int): Unit = {
      val df = (0 until n).map { i =>
        (s"c$i", i, new java.sql.Timestamp((1767225600L + epoch * 100 + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "w", epoch, 2))
    }
    commit(0L, 10); commit(1L, 10); commit(2L, 10)
    assert(table.compact(spark, 2) === 0L)
    // a live reader that durably processed epochs ≤ 1 keeps epoch 2's
    // pre-compaction files alive through gc — so the post-horizon delta
    // remains readable while epochs 0-1 are reclaimed and expired
    table.registerReader("live", 1L)
    table.gc()
    assert(table.expireMetadata(retainLast = 1).nonEmpty)
    assert(table.expiryHorizon === Some(1L))

    // fresh checkpoint (offset −1) without the opt-in: loud failure
    val scan = scanOf(spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load())
    val fresh = scan.toMicroBatchStream(tmpDir("horizon-cp0"))
    val ex = intercept[IllegalStateException] {
      fresh.planInputPartitions(EpochOffset(-1L), EpochOffset(2L))
    }
    assert(ex.getMessage.contains("expiry horizon"))

    // end-to-end opt-in: the stream sees exactly the post-horizon epoch
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).option("startAtExpiryHorizon", "true").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", tmpDir("horizon-cp1"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.addAndGet(df.count()); ()
      }.start()
    q.awaitTermination()
    assert(seen.get() === 10L) // epoch 2 only
  }

  test("DSv2 write path: format(...).mode(append).save() commits " +
    "transactionally; a replayed epoch is an idempotent no-op") {
    import spark.implicits._
    val tableRoot = tmpDir("write-table")
    val df = (0 until 40).map { i =>
      (s"conv${i % 7}", i, new java.sql.Timestamp((1767225600L + i) * 1000L))
    }.toDF("conv_id", "turn_idx", "ts")
    def writeEpoch0(): Unit =
      df.write.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).option("createIfAbsent", "true")
        .option("buckets", "4").option("epoch", "0").option("queryId", "w")
        .mode("append").save()

    writeEpoch0() // creates the table from the data schema
    val table = new IcebergLite(tableRoot)
    assert(table.snapshots.map(_.epochId) === Seq(0L))
    assert(table.declaredNumBuckets === Some(4))

    def readBack() = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).load()
      .select("conv_id", "turn_idx", "ts").orderBy("conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getTimestamp(2))).toSeq
    val expected = df.orderBy("conv_id", "turn_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getTimestamp(2))).toSeq
    assert(readBack() === expected)

    // replay: same (queryId, epoch) -> silent no-op, nothing duplicated
    writeEpoch0()
    assert(table.snapshots.map(_.epochId) === Seq(0L))
    assert(readBack() === expected)

    // next write without an explicit epoch appends latest+1; column order
    // is aligned to the declared schema
    Seq((99, "convX", new java.sql.Timestamp(1767229999L * 1000L)))
      .toDF("turn_idx", "conv_id", "ts")
      .write.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).mode("append").save()
    assert(table.snapshots.map(_.epochId) === Seq(0L, 1L))
    assert(readBack().length === 41)

    // schema mismatch fails loudly (lineage columns are sink-appended)
    val bad = intercept[Exception] {
      df.withColumnRenamed("ts", "t")
        .write.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).mode("append").save()
    }
    assert(bad.getMessage.contains("schema mismatch"))

    // a different query reusing a committed epoch fails loudly
    val alien = intercept[Exception] {
      df.write.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).option("epoch", "0")
        .option("queryId", "other").mode("append").save()
    }
    assert(alien.getMessage.contains("refusing idempotent no-op"))

    // overwrite mode = atomic truncation (a delete-everything manifest —
    // the snapshot log itself stays append-only) followed by a fresh epoch
    val replacement = df.limit(3)
    replacement.write.format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).mode("overwrite").save()
    val t = new IcebergLite(tableRoot)
    assert(t.read(spark).count() === 3L)
    assert(t.deletes.nonEmpty) // the truncation is a recorded delete
    assert(t.snapshots.size >= 2) // old epochs still in the log (history)
  }

  test("restart consumes only NEW epochs (incremental snapshot deltas)") {
    import spark.implicits._
    val tableRoot = tmpDir("incr-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    def commit(epoch: Long, n: Int): Unit = {
      val df = (0 until n).map { i =>
        (s"c$epoch", i, new java.sql.Timestamp((1767225600L + epoch * 100 + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "w", epoch, 2))
    }
    commit(0L, 10); commit(1L, 20)

    val cp = tmpDir("incr-cp")
    def runOnce(): Long = {
      val seen = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).load()
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }
        .start()
      q.awaitTermination()
      seen.get()
    }
    assert(runOnce() === 30L)
    // new epoch after the first run; restart from the same checkpoint
    commit(7L, 5)
    // only the delta epoch arrives
    assert(runOnce() === 5L)
    // nothing new -> empty incremental batch
    assert(runOnce() === 0L)
  }

  test("time travel: asOfEpoch reads the historical view; gc'd history and " +
    "unknown epochs fail loudly; streams reject the pin") {
    import spark.implicits._
    val tableRoot = tmpDir("tt-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    def commit(epoch: Long, n: Int): Unit = {
      val df = (0 until n).map { i =>
        (s"c$epoch-${i % 3}", i,
          new java.sql.Timestamp((1767225600L + epoch * 100 + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "w", epoch, 2))
    }
    commit(0L, 10); commit(1L, 20); commit(2L, 5)

    def connRead(epoch: Long) = spark.read
      .format("graft.sources.IcebergLiteSource")
      .option("path", tableRoot).option("asOfEpoch", epoch.toString).load()

    // the historical view is exactly the epochs <= pin
    assert(connRead(0L).count() === 10L)
    assert(connRead(1L).count() === 30L)
    assert(connRead(2L).count() === 35L)
    // native form agrees with the connector
    assert(table.readAsOf(spark, 1L).count() === 30L)
    // manifest pruning composes with the pin: conv_id pushdown still
    // returns exact rows on the historical view
    assert(connRead(1L).filter(col("conv_id") === "c1-0").count() ===
      table.readAsOf(spark, 1L).filter(col("conv_id") === "c1-0").count())

    // a version that is not a committed snapshot is a loud error
    val unknown = intercept[Exception] { connRead(7L).count() }
    assert(unknown.getMessage.contains("not a committed snapshot"))

    // streams cannot pin a version
    val streamPin = intercept[Exception] {
      spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).option("asOfEpoch", "1").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("tt-cp"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(streamPin.getMessage.contains("batch-only"))

    // compact + gc: pre-compaction epochs become unreplayable — loudly —
    // while AS OF the latest epoch keeps working (== the live view)
    table.compact(spark, 2, sortCols = Seq("conv_id", "turn_idx"))
    table.gc()
    val gone = intercept[Exception] { connRead(1L).count() }
    assert(gone.getMessage.contains("reclaimed"))
    assert(connRead(2L).count() === 35L)

    // writes never accept a time-travel pin
    val wpin = intercept[Exception] {
      Seq(("x", 1, new java.sql.Timestamp(1767225600L * 1000L)))
        .toDF("conv_id", "turn_idx", "ts")
        .write.format("graft.sources.IcebergLiteSource")
        .option("path", tableRoot).option("asOfEpoch", "2")
        .mode("append").save()
    }
    assert(wpin.getMessage.contains("append"))
  }

  /** 5 epochs × `rowsPerEpoch` rows with lineage-visible epoch ids. */
  private def buildEpochedTable(rowsPerEpoch: Int): String = {
    import spark.implicits._
    val tableRoot = tmpDir("rate-table")
    val table = new IcebergLite(tableRoot)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    val base = 1767225600L * 1000000L
    (0L until 5L).foreach { ep =>
      val rows = for (i <- 0 until rowsPerEpoch) yield
        (s"conv${i % 4}", i, new java.sql.Timestamp(
          (base + ep * 3600L * 1000000L + i) / 1000L))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 2))
    }
    tableRoot
  }

  /** Drain `tableRoot` with AvailableNow under the given source options;
    * returns per-batch (batchId, distinct source epoch_ids, rowCount). */
  private def drainBatches(tableRoot: String,
                           opts: Map[String, String]): Seq[(Long, Seq[Long], Long)] = {
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Seq[Long], Long)]
    val q = opts.foldLeft(
        spark.readStream.format("graft.sources.IcebergLiteSource")
          .option("path", tableRoot)) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("rate-cp"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val eps = df.select("epoch_id").distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        val n = df.count()
        seen.synchronized { seen += ((id, eps, n)); () }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    seen.sortBy(_._1).toSeq
  }

  test("maxEpochsPerTrigger bounds each micro-batch; AvailableNow drains " +
    "the full backlog across batches exactly-once") {
    val tableRoot = buildEpochedTable(rowsPerEpoch = 20)
    val batches = drainBatches(tableRoot, Map("maxEpochsPerTrigger" -> "2"))
      .filter(_._3 > 0)
    assert(batches.map(_._2) === Seq(Seq(0L, 1L), Seq(2L, 3L), Seq(4L)),
      s"epoch slices per batch: ${batches.map(_._2)}")
    assert(batches.map(_._3).sum === 100L) // 5 epochs x 20, no dupes, no loss
  }

  test("maxRowsPerTrigger caps batches by manifest row counts — soft cap: " +
    "one epoch is always admitted even when it alone exceeds the cap") {
    val tableRoot = buildEpochedTable(rowsPerEpoch = 40)
    // 80-row cap -> two 40-row epochs per batch
    val twoPer = drainBatches(tableRoot, Map("maxRowsPerTrigger" -> "80"))
      .filter(_._3 > 0)
    assert(twoPer.map(_._2) === Seq(Seq(0L, 1L), Seq(2L, 3L), Seq(4L)))
    assert(twoPer.forall(_._3 <= 80L))
    // cap below a single epoch still makes progress: one epoch per batch
    val onePer = drainBatches(tableRoot, Map("maxRowsPerTrigger" -> "10"))
      .filter(_._3 > 0)
    assert(onePer.map(_._2) === (0L until 5L).map(Seq(_)))
    assert(onePer.map(_._3).sum === 200L)
  }

  test("rate-limit options validate loudly") {
    val bad = intercept[Exception] {
      spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", buildEpochedTable(2))
        .option("maxEpochsPerTrigger", "0").load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("rate-bad-cp"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(bad.getMessage.contains("maxEpochsPerTrigger"))
  }
}
