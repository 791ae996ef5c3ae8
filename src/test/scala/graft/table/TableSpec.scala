package graft.table

import java.sql.Timestamp

import graft.SparkSpec

/** IcebergLite reader semantics: incremental scans and manifest pruning. */
class TableSpec extends SparkSpec {

  private def mkTable(root: String): IcebergLite = {
    import spark.implicits._
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    // three epochs with disjoint hour-wide ts ranges
    (0 until 3).foreach { e =>
      val base = 1767225600L + e * 3600L
      val df = (0 until 50).map { i =>
        (f"conv-$i%03d", i, new Timestamp((base + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "q", e.toLong, 2))
    }
    table
  }

  test("manifest stats prune files outside the ts range") {
    val table = mkTable(tmpDir("t-prune"))
    val allFiles = table.snapshots.flatMap(_.files)
    assert(allFiles.size === 6) // 3 epochs x 2 buckets
    // range covering only epoch 1's hour
    val lo = (1767225600L + 3600L) * 1000000L
    val hi = (1767225600L + 3600L + 100L) * 1000000L
    val picked = table.filesForRange(lo, hi)
    assert(picked.size === 2, s"expected epoch-1 files only, got $picked")
    val rows = table.readRange(spark, lo, hi)
    assert(rows.count() === 50L)
    // full read sees everything
    assert(table.read(spark).count() === 150L)
  }

  test("incremental readSince returns only later epochs") {
    val table = mkTable(tmpDir("t-incr"))
    assert(table.readSince(spark, 0L).count() === 100L) // epochs 1,2
    assert(table.readSince(spark, 2L).count() === 0L)
    assert(table.snapshots.map(_.epochId) === Seq(0L, 1L, 2L))
  }

  test("compaction rewrites epochs, preserves rows, keeps pruning + metrics") {
    val table = mkTable(tmpDir("t-compact"))
    val before = table.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    val gen = table.compact(spark, numBuckets = 2)
    assert(gen === 0L)
    assert(table.effectiveFiles.size === 2, "3x2 epoch files -> 2 compacted")
    val after = table.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    assert(after.length === before.length)
    // per-row equality on the business columns (lineage columns differ by
    // design: the compacted files carry the compaction generation)
    before.zip(after).foreach { case (b, a) =>
      assert(b.getString(0) === a.getString(0))
      assert(b.getInt(1) === a.getInt(1))
      assert(b.getTimestamp(2) === a.getTimestamp(2))
    }
    assert(table.partitionMetrics.values.sum === before.length.toLong)
    // a second compact with nothing new is a no-op
    assert(table.compact(spark, 2) === -1L)
    // new epochs after compaction remain incremental
    import spark.implicits._
    val df = Seq(("conv-zzz", 1, new Timestamp(1767250000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(table.commitEpoch(df, "q", 9L, 2))
    assert(table.read(spark).count() === before.length + 1L)
    assert(table.readSince(spark, 2L).count() === 1L)
  }

  test("second compaction does not duplicate earlier generations' rows; " +
    "incremental reuses gen-0 files verbatim, full re-clusters") {
    import spark.implicits._
    val table = mkTable(tmpDir("t-compact2"))
    assert(table.compact(spark, 2) === 0L)
    val gen0Files = table.compactions.head.files.map(_.path).toSet
    val df = Seq(("conv-zzz", 1, new Timestamp(1767250000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(table.commitEpoch(df, "q", 9L, 2))
    assert(table.read(spark).count() === 151L)
    assert(table.compact(spark, 2) === 1L) // default: incremental
    // generation 1 supersedes generation 0 entirely; the union of both
    // would return 301 rows (every gen-0 row twice)
    assert(table.read(spark).count() === 151L)
    assert(table.partitionMetrics.values.sum === 151L)
    // incremental: gen 0's two files are REUSED by path (and stats) in the
    // gen-1 manifest; only epoch 9's single row was rewritten
    val gen1 = table.compactions.find(_.gen == 1L).get
    assert(gen0Files.subsetOf(gen1.files.map(_.path).toSet))
    val rewritten = gen1.files.map(_.path).filterNot(gen0Files.contains)
    assert(rewritten.nonEmpty && rewritten.forall(_.contains("part-c0001")))
    assert(gen1.files.filter(p => gen0Files.contains(p.path))
      .map(_.rowCount).sum === 150L)
    // the periodic full rewrite re-clusters to one file per bucket even
    // with no new epochs, and is then itself a no-op
    assert(table.compact(spark, 2, full = true) === 2L)
    assert(table.effectiveFiles.size === 2)
    assert(table.read(spark).count() === 151L)
    assert(table.compact(spark, 2, full = true) === -1L)
  }

  test("gc removes superseded files; reads byte-identical, replay still safe") {
    import spark.implicits._
    val table = mkTable(tmpDir("t-gc"))
    assert(table.gc().isEmpty) // nothing compacted yet -> nothing to gc
    assert(table.compact(spark, 2) === 0L)
    val before = table.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    val deleted = table.gc()
    assert(deleted.size === 6, s"3 epochs x 2 buckets superseded, got $deleted")
    val after = table.read(spark).orderBy("conv_id", "turn_idx", "ts").collect()
    assert(after.toSeq === before.toSeq) // compacted files untouched
    // replay of a replaced epoch remains an idempotent no-op (snapshot kept)
    val df = (0 until 50).map { i =>
      (f"conv-$i%03d", i, new Timestamp((1767225600L + i) * 1000L))
    }.toDF("conv_id", "turn_idx", "ts")
    assert(!table.commitEpoch(df, "q", 0L, 2))
    assert(table.read(spark).count() === 150L)
    assert(table.gc().isEmpty) // idempotent
  }

  test("expireMetadata retires settled snapshots and superseded generations") {
    import spark.implicits._
    val table = mkTable(tmpDir("t-expire"))
    assert(table.expireMetadata().isEmpty) // nothing compacted yet
    assert(table.compact(spark, 2) === 0L)
    val df = Seq(("conv-zzz", 1, new Timestamp(1767250000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(table.commitEpoch(df, "q", 9L, 2))
    assert(table.compact(spark, 2) === 1L)
    // data files still on disk -> nothing expirable (snapshot is the
    // idempotent-commit marker; it must outlive re-publishable files)
    assert(table.expireMetadata(retainLast = 2).isEmpty)
    table.gc()
    val rowsBefore = table.read(spark).count()
    // a lagging incremental reader holds the horizon at its offset
    table.registerReader("lagger", 0L)
    assert(table.expireMetadata(retainLast = 2) === Seq("snap-000000000000.json"))
    assert(table.expiryHorizon === Some(0L)) // recorded floor for new readers
    table.unregisterReader("lagger")
    // retainLast=2 keeps epochs {2, 9}; epoch 1 is now expirable
    assert(table.expireMetadata(retainLast = 2) === Seq("snap-000000000001.json"))
    assert(table.expiryHorizon === Some(1L)) // monotonic
    assert(table.snapshots.map(_.epochId) === Seq(2L, 9L))
    // gen 0 still replaces live epoch 2 -> its manifest must survive,
    // else epoch 2 would "un-replace" and double-count
    assert(table.compactions.map(_.gen) === Seq(0L, 1L))
    assert(table.read(spark).count() === rowsBefore)
    // replay inside the retain window is still an idempotent no-op
    assert(!table.commitEpoch(df, "q", 9L, 2))
    // shrinking the window releases epoch 2, and with it generation 0
    val last = table.expireMetadata(retainLast = 1)
    assert(last.toSet === Set("snap-000000000002.json", "compact-000000.json"))
    assert(table.read(spark).count() === rowsBefore)
    assert(table.partitionMetrics.values.sum === rowsBefore)
    assert(table.expireMetadata(retainLast = 1).isEmpty) // idempotent
    assert(table.expiryHorizon === Some(2L)) // highest expired epoch
  }

  test("expiry horizon stays monotonic under concurrent multi-instance writers") {
    val root = tmpDir("t-horizon-race")
    val a = mkTable(root)
    val b = new IcebergLite(root) // second instance over the same table.json
    // interleave ascending + descending horizon claims from both instances;
    // a lost-update would let a stale low value overwrite a higher one
    val claims = (0L until 64L)
    val t1 = new Thread(() => claims.foreach(a.recordExpiryHorizon))
    val t2 = new Thread(() => claims.reverse.foreach(b.recordExpiryHorizon))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert(a.expiryHorizon === Some(63L))
    assert(b.expiryHorizon === Some(63L))
  }

  test("staleReaders surfaces heartbeat-dead registrations; " +
    "unregisterReader is the documented admin override") {
    val table = mkTable(tmpDir("t-stale"))
    assert(table.expiryHorizon === None) // fresh table: no floor yet
    table.registerReader("r1", 0L)
    // freshly heartbeated: not stale at any sane TTL
    assert(table.staleReaders(ttlMs = 60000L).isEmpty)
    // at TTL −1 everything is "stale" — r1 shows with its heartbeat age
    val stale = table.staleReaders(ttlMs = -1L)
    assert(stale.contains("r1") && stale("r1") >= 0L)
    // advancing the offset refreshes the heartbeat too
    table.registerReader("r1", 2L)
    assert(table.readerOffsets("r1") === 2L)
    assert(table.staleReaders(ttlMs = 60000L).isEmpty)
    // a re-register at a LOWER offset keeps the durable offset (monotonic)
    // but still counts as a heartbeat
    table.registerReader("r1", -1L)
    assert(table.readerOffsets("r1") === 2L)
    // the admin override: once the operator confirms the checkpoint is
    // gone, unregistering releases the retention pin
    table.unregisterReader("r1")
    assert(table.staleReaders(ttlMs = -1L).isEmpty)
    assert(table.readerOffsets.isEmpty)
  }

  test("commitEpoch fails loudly when a different query reuses an epoch id") {
    import spark.implicits._
    val table = mkTable(tmpDir("t-qid"))
    val df = Seq(("conv-x", 0, new Timestamp(1767225600L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    // same query replaying epoch 0: silent no-op
    assert(!table.commitEpoch(df, "q", 0L, 2))
    // a DIFFERENT query's epoch 0 must not be silently swallowed
    intercept[IllegalStateException] {
      table.commitEpoch(df, "another-query", 0L, 2)
    }
  }

  test("a lost commit race is tolerated only for byte-identical replays; " +
    "a non-identical winner fails loudly instead of dropping data") {
    import spark.implicits._
    val table = mkTable(tmpDir("t-race"))
    val df = Seq(("conv-x", 0, new Timestamp(1767225600L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    val files = table.stageAndPublish(df, 5L, 2)
    table.writeSnapshot("q", 5L, files, 2)
    // identical replay of the same snapshot bytes: silent no-op
    table.writeSnapshot("q", 5L, files, 2)
    // a different writer claiming the same epoch id inside the race
    // window (past the isCommitted TOCTOU check) must not be swallowed
    intercept[IllegalStateException] {
      table.writeSnapshot("another-query", 5L, files, 2)
    }
  }

  test("readRange keeps microsecond precision in the residual filter") {
    import spark.implicits._
    val table = new IcebergLite(tmpDir("t-micros"))
    table.create("conv_id string, turn_idx int, ts timestamp", 1)
    def tsMicros(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }
    val baseUs = 1767225600L * 1000000L
    // three rows inside the SAME millisecond, one microsecond apart
    val df = Seq(
      ("c", 0, tsMicros(baseUs + 100)),
      ("c", 1, tsMicros(baseUs + 101)),
      ("c", 2, tsMicros(baseUs + 102))
    ).toDF("conv_id", "turn_idx", "ts")
    assert(table.commitEpoch(df, "q", 0L, 1))
    // a millisecond-truncated bound would return 0 or 3 rows, never 2
    assert(table.readRange(spark, baseUs + 100, baseUs + 101).count() === 2L)
    assert(table.readRange(spark, baseUs + 102, baseUs + 102).count() === 1L)
  }

  test("empty epoch commits a snapshot with no files (S4 empty-input guard)") {
    import spark.implicits._
    val table = new IcebergLite(tmpDir("t-empty"))
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    val empty = Seq.empty[(String, Int, Timestamp)]
      .toDF("conv_id", "turn_idx", "ts")
    assert(table.commitEpoch(empty, "q", 0L, 2))
    assert(table.isCommitted(0L)) // the epoch is recorded (idempotence)
    assert(table.read(spark).count() === 0L)
  }

  test("addColumn: versioned schemas, null-fill reads, snapshot stamping, guards") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.StructType
    val table = mkTable(tmpDir("t-evolve"))
    assert(table.schemaVersion === 1)
    assert(table.snapshots.forall(_.schemaVersion === 1))

    assert(table.addColumn("score", "double") === 2)
    assert(table.schemaVersion === 2)
    assert(StructType.fromDDL(table.schemaDdlAt(1)).fieldNames.toSeq ===
      Seq("conv_id", "turn_idx", "ts"))
    assert(StructType.fromDDL(table.schemaDdlAt(2)).fieldNames.toSeq ===
      Seq("conv_id", "turn_idx", "ts", "score"))

    // pre-evolution files (150 rows) read the new column as NULL — the
    // declared schema drives the read, not per-file inference
    assert(table.read(spark).filter(col("score").isNull).count() === 150L)

    // a post-evolution epoch carries the column and the bumped version stamp
    val df = (0 until 10).map { i =>
      (f"conv-$i%03d", 100 + i,
        new Timestamp((1767225600L + 7200L + i) * 1000L), i.toDouble)
    }.toDF("conv_id", "turn_idx", "ts", "score")
    assert(table.commitEpoch(df, "q", 3L, 2))
    assert(table.snapshots.last.schemaVersion === 2)
    assert(table.read(spark).filter(col("score").isNotNull).count() === 10L)

    // time travel serves each snapshot's own schema version
    assert(!table.readAsOf(spark, 1L).columns.contains("score"))
    assert(table.readAsOf(spark, 3L).columns.contains("score"))

    // guards: duplicate, lineage collision, bogus type, unknown version
    assert(intercept[IllegalArgumentException] {
      table.addColumn("SCORE", "int")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      table.addColumn("epoch_id", "bigint")
    }.getMessage.contains("lineage"))
    intercept[Exception] { table.addColumn("x", "no_such_type") }
    intercept[IllegalArgumentException] { table.schemaDdlAt(99) }
    assert(table.schemaVersion === 2, "failed evolutions must not bump the version")

    // __graft prefix is engine-internal (mutation-plan columns)
    assert(intercept[IllegalArgumentException] {
      table.addColumn("__graft_pos", "long")
    }.getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException] {
      new IcebergLite(tmpDir("reserved-create"))
        .create("conv_id string, __graft_ord long", 2)
    }.getMessage.contains("reserved"))
  }
}
