package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** SQL-MERGE-style upsert ([[IcebergLite.merge]]): matched rewrites +
  * not-matched inserts under ONE atomic manifest (pending-activation
  * snapshot protocol), bucket-set candidate pruning, stream and
  * maintenance composition, and the source-hygiene guards. */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1767225600L * 1000000L // micros

  /** 3 epochs × 8 convs × 5 turns, bucketed by conv over 4 buckets. */
  private def buildTable(): (String, IcebergLite) = {
    val root = tmpDir("merge-table")
    val t = new IcebergLite(root)
    t.create(
      "conv_id string, turn_idx int, role string, tool string, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i + ep.toInt * 5, if (i % 2 == 0) "user" else "tool",
          if (i % 2 == 1) "search" else null,
          new java.sql.Timestamp(
            (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "role", "tool", "ts"), "w", ep, 4))
    }
    (root, t)
  }

  private def srcDf(rows: Seq[(String, Int, String, String, java.sql.Timestamp)]) =
    rows.toDF("conv_id", "turn_idx", "role", "tool", "ts")

  private def tsOf(c: Int, i: Int, ep: Long = 0L) =
    new java.sql.Timestamp((base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L)

  test("upsert: matched rows take ALL source values, new keys land as one " +
    "new epoch, both visible atomically via one manifest") {
    val (_, t) = buildTable()
    val before = t.effectiveFiles.map(_.path).toSet
    val src = srcDf(Seq(
      ("conv3", 1, "assistant", "calc", tsOf(3, 1)),   // matched (epoch 0)
      ("conv3", 6, "assistant", "calc", tsOf(3, 1, 1)), // matched (epoch 1)
      ("conv9", 0, "user", null, tsOf(9, 0)),           // new conversation
      ("conv1", 99, "user", null, tsOf(1, 99))))        // new turn, old conv
    val stats = t.merge(spark, src, "merge-1", Some(MergeUpdateAll),
      insertNotMatched = true)
    assert(stats === MergeStats(2L, 2L, Some(3L)))

    // matched rows carry the source's values
    val got = t.read(spark)
      .filter(col("conv_id") === "conv3" && col("turn_idx").isin(1, 6))
      .select("role", "tool").collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSet === Set(("assistant", "calc")))
    // inserts are a normal epoch: snapshot visible, epoch = max + 1
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 2L, 3L))
    val ins = t.read(spark).filter(col("conv_id") === "conv9")
    assert(ins.count() === 1L)
    // row counts: 120 target + 2 inserts
    assert(t.effectiveFiles.map(_.rowCount).sum === 122L)
    // exactly conv3's bucket files were rewritten (2 of 3 epochs matched)
    val d = t.deletes.head
    assert(d.activatesEpoch === Some(3L))
    assert(d.removes.size === 2)
    assert((before -- t.effectiveFiles.map(_.path).toSet).size === 2)
    // untouched rows byte-equal: spot-check another conv
    assert(t.read(spark).filter(col("conv_id") === "conv2")
      .filter(col("role").isin("user", "tool")).count() === 15L)
  }

  test("WHEN MATCHED THEN DELETE: tombstone feed removes matched rows; a " +
    "fully-matched file is dropped without a rewrite") {
    val (_, t) = buildTable()
    // tombstones for every epoch-2 turn of conv0 (partial files) and ALL
    // of conv4 (its bucket file in each epoch fully matched IF alone in
    // bucket — with 8 convs over 4 buckets it shares, so partial too)
    val tomb = srcDf(
      (10 until 15).map(i => ("conv0", i, "x", "x", tsOf(0, 0))) ++
        (0 until 15).map(i => ("conv4", i, "x", "x", tsOf(4, 0))))
    val stats = t.merge(spark, tomb, "merge-del", Some(MergeDeleteMatched),
      insertNotMatched = false)
    assert(stats === MergeStats(20L, 0L, None))
    assert(t.read(spark).filter(col("conv_id") === "conv4").count() === 0L)
    assert(t.read(spark).filter(col("conv_id") === "conv0").count() === 10L)
    assert(t.effectiveFiles.map(_.rowCount).sum === 100L)
  }

  test("insert-only merge never touches matched target rows") {
    val (_, t) = buildTable()
    val src = srcDf(Seq(
      ("conv2", 0, "CHANGED", "CHANGED", tsOf(2, 0)), // matches — must NOT apply
      ("conv8", 0, "user", null, tsOf(8, 0))))        // new
    val stats = t.merge(spark, src, "merge-ins", None, insertNotMatched = true)
    assert(stats === MergeStats(0L, 1L, Some(3L)))
    assert(t.read(spark)
      .filter(col("conv_id") === "conv2" && col("turn_idx") === 0)
      .select("role").head().getString(0) === "user")
    assert(t.read(spark).filter(col("conv_id") === "conv8").count() === 1L)
    // no rewrites: manifest removes nothing, only activates the epoch
    assert(t.deletes.head.removes.isEmpty)
    assert(t.deletes.head.activatesEpoch === Some(3L))
  }

  test("source hygiene guards: duplicate keys, null keys, missing " +
    "columns, no actions") {
    val (_, t) = buildTable()
    val e1 = intercept[IllegalArgumentException] {
      t.merge(spark, srcDf(Seq(
        ("c", 0, "r", null, tsOf(0, 0)), ("c", 0, "r2", null, tsOf(0, 0)))),
        "m", Some(MergeUpdateAll), insertNotMatched = true)
    }
    assert(e1.getMessage.contains("duplicate (conv_id, turn_idx)"))
    val e2 = intercept[IllegalArgumentException] {
      t.merge(spark, srcDf(Seq((null, 0, "r", null, tsOf(0, 0)))),
        "m", Some(MergeUpdateAll), insertNotMatched = true)
    }
    assert(e2.getMessage.contains("NULL key"))
    val e3 = intercept[IllegalArgumentException] {
      t.merge(spark, Seq(("c", 0)).toDF("conv_id", "turn_idx"),
        "m", Some(MergeUpdateAll), insertNotMatched = true)
    }
    assert(e3.getMessage.contains("missing required column"))
    val e4 = intercept[IllegalArgumentException] {
      t.merge(spark, srcDf(Nil), "m", None, insertNotMatched = false)
    }
    assert(e4.getMessage.contains("at least one action"))
    // empty source is a no-op, not an error
    assert(t.merge(spark, srcDf(Nil), "m", Some(MergeUpdateAll),
      insertNotMatched = true) === MergeStats(0L, 0L, None))
  }

  test("pending-activation protocol: an unactivated snapshot is invisible " +
    "to every reader and reclaimed by removeOrphans once its gen settles") {
    val (_, t) = buildTable()
    // a merge crashed after staging its insert epoch (gen 0 will never
    // commit once a later gen lands)
    t.writeSnapshot("crashed-merge", 77L, Nil, 4, pendingGen = Some(0L))
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 2L))
    assert(t.read(spark).count() === 120L)
    // still possibly in flight: no committed gen at/above 0 yet → kept
    assert(!t.removeOrphans().exists(_.contains("snap-")))
    // a later rewrite generation commits → gen 0 can never activate
    t.deleteWhere(spark, col("conv_id") === "conv7", "purge conv7")
    val cleaned = t.removeOrphans()
    assert(cleaned.exists(_.contains("snap-000000000077")), cleaned)
    assert(!t.read(spark).select("conv_id").collect().map(_.getString(0))
      .contains("conv7"))
  }

  test("merge over mixed schema versions: pre-evolution files get typed " +
    "NULLs, updates apply, inserts land under the evolved schema") {
    val root = tmpDir("merge-evo")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, role string, ts timestamp", 2)
    val rows0 = (0 until 6).map(i => (s"conv$i", 0, "user",
      new java.sql.Timestamp((base + i) / 1000L)))
    assert(t.commitEpoch(rows0.toDF("conv_id", "turn_idx", "role", "ts"),
      "w", 0L, 2))
    t.addColumn("tool", "string")
    // feed updates a PRE-evolution row (its file lacks the tool column)
    // and inserts a new row carrying a tool value
    val feed = Seq(
      ("conv2", 0, "assistant", "calc",
        new java.sql.Timestamp((base + 2) / 1000L)),
      ("conv9", 0, "user", "search",
        new java.sql.Timestamp((base + 9) / 1000L)))
      .toDF("conv_id", "turn_idx", "role", "tool", "ts")
    val stats = t.merge(spark, feed, "merge-evo", Some(MergeUpdateAll),
      insertNotMatched = true)
    assert(stats === MergeStats(1L, 1L, Some(1L)))
    val got = t.read(spark).select("conv_id", "role", "tool").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val expect = (0 until 6).map { i =>
      if (i == 2) ("conv2", "assistant", "calc")
      else (s"conv$i", "user", null)
    }.toSet + (("conv9", "user", "search"))
    assert(got === expect)
  }

  test("torn-merge resurrection is impossible: a later mutation never " +
    "reuses a crashed merge's pending gen") {
    val (_, t) = buildTable()
    // a merge crashed after staging its insert epoch, holding gen 1
    t.writeSnapshot("crashed-merge", 3L, Nil, 4, pendingGen = Some(1L))
    // the next mutation must allocate gen 2, NOT 1 — committing
    // delete-1.json would activate the orphaned epoch (inserts visible
    // WITHOUT the crashed merge's matched-row rewrites)
    t.deleteWhere(spark, col("conv_id") === "conv7", "purge conv7")
    assert(t.deletes.map(_.gen) === Seq(2L))
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 2L))
    assert(t.read(spark).count() === 105L) // 120 - conv7, no resurrection
    // and the dead pending is now reclaimable (1 <= committed max 2)
    val cleaned = t.removeOrphans()
    assert(cleaned.exists(_.contains("snap-000000000003")), cleaned)
  }

  test("legacy unbucketed file sets (numBuckets = -1): matched rows in " +
    "every partition are found — no feed slice by a bogus bucket fn") {
    val root = tmpDir("merge-legacy")
    val t = new IcebergLite(root)
    t.create(
      "conv_id string, turn_idx int, role string, tool string, ts timestamp", 2)
    val rows = for (c <- 0 until 8; i <- 0 until 3) yield
      (s"conv$c", i, "user", null: String, tsOf(c, i))
    val files = t.stageAndPublish(
      rows.toDF("conv_id", "turn_idx", "role", "tool", "ts"), 0L, 2)
    // record the manifest WITHOUT the bucket layout (pre-bucket-recording
    // manifests parse as numBuckets = -1)
    t.writeSnapshot("w", 0L, files, -1)
    assert(files.map(_.partitionId).distinct.sorted === Seq(0, 1))
    // one matched conv per physical partition
    val byBucket = (0 until 8).map(i => s"conv$i")
      .groupBy(IcebergLite.bucketOf(_, 2))
    val targets = Seq(byBucket(0).head, byBucket(1).head)
    val feed = targets.map(c => (c, 0, "fixed", null: String, tsOf(0, 0)))
      .toDF("conv_id", "turn_idx", "role", "tool", "ts")
    val stats = t.merge(spark, feed, "m", Some(MergeUpdateCols(Seq("role"))),
      insertNotMatched = false)
    assert(stats.matched === 2L) // BOTH partitions' rows, incl. partition 1
    assert(t.read(spark).filter(col("role") === "fixed")
      .select("conv_id").collect().map(_.getString(0)).toSet === targets.toSet)
  }

  test("expireMetadata promotes activated insert epochs: losing the " +
    "activation manifest can never de-commit the epoch") {
    val (_, t) = buildTable()
    t.merge(spark, srcDf(Seq(("conv9", 0, "user", null, tsOf(9, 0)))),
      "merge-promote", None, insertNotMatched = true)
    assert(t.deletes.head.activatesEpoch === Some(3L))
    val expect = t.read(spark).select("conv_id", "turn_idx").collect().toSet
    t.expireMetadata()
    // the snapshot no longer depends on its activation manifest
    val pendingAfter = t.snapshots.size
    assert(pendingAfter === 4)
    // even if the manifest is later expired/lost, epoch 3 stays committed
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t.root, "metadata", "delete-000001.json"))
    assert(t.snapshots.map(_.epochId).contains(3L))
    assert(t.read(spark).select("conv_id", "turn_idx").collect().toSet === expect)
  }

  test("a fresh incremental stream replays the merge exactly-once: " +
    "patched epoch deltas plus the insert epoch as its own batch") {
    val (root, t) = buildTable()
    val src = srcDf(Seq(
      ("conv5", 2, "patched", "patched", tsOf(5, 2)),
      ("conv9", 0, "user", null, tsOf(9, 0))))
    t.merge(spark, src, "merge-stream", Some(MergeUpdateAll),
      insertNotMatched = true)
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long, Long)]
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", root).option("maxEpochsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", tmpDir("merge-cp"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val patched = df.filter(col("role") === "patched").count()
        val conv9 = df.filter(col("conv_id") === "conv9").count()
        seen.synchronized { seen += ((id, df.count(), patched, conv9)); () }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = seen.sortBy(_._1).filter(_._2 > 0)
    assert(batches.size === 4) // 3 patched epochs + the insert epoch
    assert(batches.map(_._2).sum === 121L)
    assert(batches.map(_._3).sum === 1L) // the patched row, exactly once
    assert(batches.last._4 === 1L)       // inserts arrive as epoch 3
  }

  test("SQL MERGE INTO through GraftExtensions: upsert + tombstone forms " +
    "run the engine merge; unsupported shapes are rejected loudly") {
    val warehouse = tmpDir("merge-warehouse")
    val s2 = graft.catalog.GraftSessions.withExtensions(warehouse)
    s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    s2.sql(
      """CREATE TABLE graft.db.m (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  ts TIMESTAMP) TBLPROPERTIES ('buckets'='4')""".stripMargin)
    locally {
      import s2.implicits._
      (for (c <- 0 until 4; i <- 0 until 3) yield
        (s"conv$c", i, "user", null: String, tsOf(c, i)))
        .toDF("conv_id", "turn_idx", "role", "tool", "ts")
        .writeTo("graft.db.m").append()
      Seq(("conv1", 1, "assistant", "calc", tsOf(1, 1)),
        ("conv7", 0, "user", null: String, tsOf(7, 0)))
        .toDF("conv_id", "turn_idx", "role", "tool", "ts")
        .createOrReplaceTempView("feed")
    }

    s2.sql(
      """MERGE INTO graft.db.m t USING feed s
        |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        |WHEN MATCHED THEN UPDATE SET role = s.role, tool = s.tool
        |WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, tool, ts)
        |  VALUES (s.conv_id, s.turn_idx, s.role, s.tool, s.ts)""".stripMargin)

    assert(s2.table("graft.db.m")
      .filter(col("conv_id") === "conv1" && col("turn_idx") === 1)
      .select("role", "tool").head() === org.apache.spark.sql.Row("assistant", "calc"))
    assert(s2.table("graft.db.m").filter(col("conv_id") === "conv7").count() === 1L)
    assert(s2.table("graft.db.m").count() === 13L)
    val lite = new IcebergLite(s"$warehouse/db/m")
    assert(lite.deletes.size === 1)
    assert(lite.deletes.head.activatesEpoch.isDefined)

    // tombstone form
    s2.sql(
      """MERGE INTO graft.db.m t USING feed s
        |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(s2.table("graft.db.m").count() === 11L)
    assert(s2.table("graft.db.m").filter(col("conv_id") === "conv7").count() === 0L)

    // unsupported shapes fail loudly with actionable messages
    val e1 = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO graft.db.m t USING feed s
          |ON t.conv_id = s.conv_id
          |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e1.getMessage.contains("keyed by (conv_id, turn_idx)"))
    val e2 = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO graft.db.m t USING feed s
          |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
          |WHEN MATCHED AND s.role = 'x' THEN DELETE""".stripMargin)
    }
    assert(e2.getMessage.contains("ONE unconditioned WHEN MATCHED"))
    val e3 = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO graft.db.m t USING feed s
          |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
          |WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role)
          |  VALUES (s.conv_id, s.turn_idx, s.role)""".stripMargin)
    }
    assert(e3.getMessage.contains("every declared column"))
    val e4 = intercept[UnsupportedOperationException] {
      s2.sql(
        """MERGE INTO graft.db.m t USING feed s
          |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
          |WHEN MATCHED THEN UPDATE SET role = s.role
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    }
    assert(e4.getMessage.contains("NOT MATCHED BY SOURCE"))
  }

  test("compaction folds a merge manifest; read parity holds; time " +
    "travel to a pre-merge epoch serves original rows") {
    val (_, t) = buildTable()
    val src = srcDf(Seq(
      ("conv6", 0, "fixed", null, tsOf(6, 0)),
      ("conv9", 9, "user", null, tsOf(9, 9))))
    t.merge(spark, src, "merge-fold", Some(MergeUpdateAll),
      insertNotMatched = true)
    // history: pre-merge epoch 2 view has no conv9 and original conv6
    assert(t.readAsOf(spark, 2L).filter(col("conv_id") === "conv9").count() === 0L)
    assert(t.readAsOf(spark, 2L)
      .filter(col("conv_id") === "conv6" && col("turn_idx") === 0)
      .select("role").head().getString(0) === "user")
    val expect = t.read(spark).select("conv_id", "turn_idx", "role")
      .collect().toSet
    t.compact(spark, 2)
    assert(t.compactions.maxBy(_.gen).foldsDeletes === Seq(1L))
    assert(t.effectiveFiles.map(_.rowCount).sum === 121L)
    assert(t.read(spark).select("conv_id", "turn_idx", "role")
      .collect().toSet === expect)
  }
}
