package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Row-level DELETE ([[IcebergLite.deleteWhere]]): copy-on-write file
  * rewrites, the delete-manifest effective view, stream patching,
  * compaction folding and gc of superseded rewrite files. */
class DeleteSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1767225600L * 1000000L // micros

  /** 3 epochs × 8 convs × 5 turns, bucketed by conv over 4 buckets. */
  private def buildTable(): (String, IcebergLite) = {
    val root = tmpDir("del-table")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, role string, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, if (i % 2 == 0) "user" else "tool",
          new java.sql.Timestamp(
            (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "role", "ts"), "w", ep, 4))
    }
    (root, t)
  }

  test("deleteWhere: conv purge rewrites only that bucket's files, " +
    "untouched files keep their paths, read parity with a filter") {
    val (_, t) = buildTable()
    val before = t.effectiveFiles.map(_.path).toSet
    val expect = t.read(spark).filter(col("conv_id") =!= "conv3")
      .select("conv_id", "turn_idx", "role").collect().toSet

    val removed = t.deleteWhere(spark, col("conv_id") === "conv3",
      "conv_id = 'conv3'")
    assert(removed === 15L) // 3 epochs x 5 turns

    val after = t.effectiveFiles.map(_.path).toSet
    // conv3's bucket file per epoch rewritten; every other file untouched
    assert((before -- after).size === 3, s"removed files: ${before -- after}")
    assert((after -- before).forall(_.contains("part-d")), after -- before)
    assert(after.intersect(before).size === before.size - 3)
    val got = t.read(spark).select("conv_id", "turn_idx", "role")
      .collect().toSet
    assert(got === expect)
    assert(!t.deletes.head.affectsCompacted)
    // row counts in the manifest reflect the rewrite
    assert(t.effectiveFiles.map(_.rowCount).sum === 120L - 15L)
  }

  test("deleteWhere: predicate matching a whole file drops it without a " +
    "rewrite; deleting everything empties the table") {
    val (_, t) = buildTable()
    // every row of every file matches -> all removed, zero adds
    val removed = t.deleteWhere(spark, lit(true), "true")
    assert(removed === 120L)
    assert(t.effectiveFiles.isEmpty)
    assert(t.deletes.head.fileSets.isEmpty)
    assert(t.read(spark).count() === 0L)
  }

  test("chained deletes compose: a later delete may rewrite an earlier " +
    "delete's survivor file") {
    val (_, t) = buildTable()
    t.deleteWhere(spark, col("conv_id") === "conv3" && col("turn_idx") === 0,
      "conv3 turn0")
    // second delete hits the same bucket -> rewrites the part-d file
    t.deleteWhere(spark, col("conv_id") === "conv3" && col("turn_idx") === 1,
      "conv3 turn1")
    val expect = t2Expect(t)
    val got = t.read(spark).select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got === expect)
    assert(t.deletes.map(_.gen) === Seq(1L, 2L))
  }

  private def t2Expect(t: IcebergLite) =
    (for (ep <- 0 until 3; c <- 0 until 8; i <- 0 until 5
          if !(c == 3 && (i == 0 || i == 1))) yield (s"conv$c", i)).toSet

  test("missing-column predicate on pre-evolution files: typed NULLs make " +
    "tool IS NULL delete old-schema rows exactly") {
    val root = tmpDir("del-evo")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, ts timestamp", 2)
    val rows0 = (0 until 10).map(i => (s"conv$i", i,
      new java.sql.Timestamp((base + i) / 1000L)))
    assert(t.commitEpoch(rows0.toDF("conv_id", "turn_idx", "ts"), "w", 0L, 2))
    t.addColumn("tool", "string")
    val rows1 = (0 until 10).map(i => (s"conv$i", 100 + i,
      new java.sql.Timestamp((base + 1000000L + i) / 1000L),
      if (i % 2 == 0) "search" else null))
    assert(t.commitEpoch(
      rows1.toDF("conv_id", "turn_idx", "ts", "tool"), "w", 1L, 2))

    val removed = t.deleteWhere(spark, col("tool").isNull, "tool IS NULL")
    assert(removed === 15L) // all 10 of epoch 0 + 5 odd rows of epoch 1
    val left = t.read(spark).select("turn_idx", "tool").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(left === (0 until 10 by 2).map(i => (100 + i, "search")).toSet)
  }

  test("a fresh incremental stream after a delete serves the patched " +
    "epoch deltas — purged rows cannot replay into a consumer") {
    val (root, t) = buildTable()
    t.deleteWhere(spark, col("conv_id") === "conv5", "purge conv5")
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Set[String], Long)]
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", root).option("maxEpochsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", tmpDir("del-cp"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val convs = df.select("conv_id").distinct().collect()
          .map(_.getString(0)).toSet
        seen.synchronized { seen += ((id, convs, df.count())); () }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = seen.sortBy(_._1).filter(_._3 > 0)
    assert(batches.size === 3) // one per epoch, all patched
    assert(batches.forall(!_._2.contains("conv5")))
    assert(batches.map(_._3).sum === 120L - 15L)
  }

  test("compaction folds deletes; gc reclaims the superseded rewrite " +
    "files; read parity holds throughout") {
    val (_, t) = buildTable()
    t.deleteWhere(spark, col("conv_id") === "conv1", "purge conv1")
    val expect = t.read(spark).select("conv_id", "turn_idx").collect().toSet
    val gen = t.compact(spark, 2)
    assert(gen >= 0L)
    assert(t.compactions.maxBy(_.gen).foldsDeletes === Seq(1L))
    // folded: effective view is the generation alone, no double-add
    assert(t.effectiveFiles.map(_.rowCount).sum === 105L)
    assert(t.read(spark).select("conv_id", "turn_idx").collect().toSet === expect)
    val reclaimed = t.gc()
    // the delete's rewrite files are among the reclaimed
    assert(reclaimed.exists(_.contains("part-d")), reclaimed)
    assert(t.read(spark).select("conv_id", "turn_idx").collect().toSet === expect)
  }

  test("delete over compacted data: batch reads stay exact, a lagging " +
    "stream over replaced epochs fails loudly instead of replaying " +
    "purged rows") {
    val (root, t) = buildTable()
    t.compact(spark, 2)
    val removed = t.deleteWhere(spark, col("conv_id") === "conv2", "purge conv2")
    assert(removed === 15L)
    assert(t.deletes.head.affectsCompacted)
    assert(t.read(spark).filter(col("conv_id") === "conv2").count() === 0L)

    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", root).load()
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("del-guard-cp"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(ex.getMessage.contains("row-level delete rewrote compacted data"),
      ex.getMessage)
  }

  test("maintenance lock: concurrent deletes from two INSTANCES serialize " +
    "— both land as distinct generations, neither is silently dropped") {
    val (root, t) = buildTable()
    // two separate engine instances over the same root — the pre-lock
    // contract ('callers serialize externally') left this racy: both
    // would allocate gen 1 and atomicWrite's lost-the-race tolerance
    // silently dropped one delete
    val t2 = new IcebergLite(root)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(t.deleteWhere(spark, col("conv_id") === "conv1", "purge conv1"))
    val f2 = Future(t2.deleteWhere(spark, col("conv_id") === "conv2", "purge conv2"))
    assert(Await.result(f1, 120.seconds) === 15L)
    assert(Await.result(f2, 120.seconds) === 15L)
    assert(t.deletes.map(_.gen).sorted === Seq(1L, 2L))
    assert(t.read(spark).filter(col("conv_id").isin("conv1", "conv2"))
      .count() === 0L)
    assert(t.read(spark).count() === 90L)
  }

  test("time travel to a pre-delete epoch still serves the original rows " +
    "(delete rewrites the live view, not history)") {
    val (_, t) = buildTable()
    t.deleteWhere(spark, col("conv_id") === "conv0", "purge conv0")
    // epoch 1 is historical (not the latest), so it serves pre-delete data
    assert(t.readAsOf(spark, 1L)
      .filter(col("conv_id") === "conv0").count() === 10L)
    // the latest epoch == the live (post-delete) view
    assert(t.readAsOf(spark, 2L)
      .filter(col("conv_id") === "conv0").count() === 0L)
  }

  test("AS OF an epoch committed after a delete serves the post-delete " +
    "state it was committed in — a later append cannot resurrect the " +
    "purged rows into a pinned read") {
    val (root, t) = buildTable() // epochs 0-2
    t.deleteWhere(spark, col("conv_id") === "conv6", "purge conv6")
    // epoch 3 commits AFTER the delete: its maxGen stamp records gen 1
    import spark.implicits._
    assert(t.commitEpoch(
      Seq(("convY", 0, "user",
        new java.sql.Timestamp(base / 1000L)))
        .toDF("conv_id", "turn_idx", "role", "ts"), "w", 3L, 4))
    val pinned = t.readAsOf(spark, 3L)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(!pinned.exists(_._1 == "conv6")) // live view at this point

    // epoch 4 lands; epoch 3 is now historical. Its read must be the
    // state it was committed in (post-delete), byte-stable — pre-round-5
    // the historical path dropped ALL delete manifests and conv6 came back
    assert(t.commitEpoch(
      Seq(("convZ", 0, "user",
        new java.sql.Timestamp(base / 1000L)))
        .toDF("conv_id", "turn_idx", "role", "ts"), "w", 4L, 4))
    val historical = t.readAsOf(spark, 3L)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(historical === pinned)
    // and an epoch committed BEFORE the delete still serves history
    assert(t.readAsOf(spark, 1L)
      .filter(col("conv_id") === "conv6").count() === 10L)
  }
}
