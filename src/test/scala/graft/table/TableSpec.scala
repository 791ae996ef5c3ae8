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
}
