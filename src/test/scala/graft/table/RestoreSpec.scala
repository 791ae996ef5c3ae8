package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** RESTORE ([[IcebergLite.restore]]): make a prior committed state the
  * live view again as a new content-mutation gen — metadata-only, with
  * commit-time CDC recording, composing with streams, compaction, gc and
  * later mutations exactly like any rewrite gen. */
class RestoreSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1767225600L * 1000000L // micros

  /** 3 epochs × 8 convs × 5 turns, bucketed by conv over 4 buckets.
    * turn_idx is UNIQUE per conv across epochs (`ep*5 + i`) — the
    * natural-key contract CDC pairing documents ([[TableChanges]]). */
  private def buildTable(): (String, IcebergLite) = {
    val root = tmpDir("restore-table")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, role string, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", ep.toInt * 5 + i, if (i % 2 == 0) "user" else "tool",
          new java.sql.Timestamp(
            (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "role", "ts"), "w", ep, 4))
    }
    (root, t)
  }

  private def content(t: IcebergLite) =
    t.read(spark).select("conv_id", "turn_idx", "role").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet

  test("restore undoes a DELETE, an UPDATE and a later append in one " +
    "metadata-only commit; data dir gains no files; op stamped") {
    val (root, t) = buildTable()
    val want = content(t)
    val at = t.currentVersion
    assert(at === TableVersion(2L, 0L))

    t.deleteWhere(spark, col("conv_id") === "conv3", "purge conv3")
    t.updateWhere(spark, col("turn_idx") === 0,
      Seq("role" -> lit("edited")), "turn_idx = 0")
    // an append the restore must also un-append
    val extra = Seq(("convX", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(extra, "w", 3L, 4))
    assert(content(t) !== want)

    val dataFilesBefore = java.nio.file.Files.list(
      java.nio.file.Paths.get(root, "data")).count()
    val st = t.restore(spark, at)
    assert(st.gen === 3L) // after delete gen 1 + update gen 2
    assert(st.removedFiles > 0 && st.restoredFiles > 0)
    // conv3 purge (15) re-inserted + turn0 updates (24+1 rows pre+post,
    // minus conv3's which ride the re-insert) + convX un-append (1)
    assert(st.changeRows > 0L)
    assert(content(t) === want)
    // metadata-only: not one new data file (CDC rows land in changes/)
    assert(java.nio.file.Files.list(
      java.nio.file.Paths.get(root, "data")).count() === dataFilesBefore)
    val d = t.deletes.maxBy(_.gen)
    assert(d.op === Some("restore"))
    assert(d.predicate.contains("RESTORE TO version (epoch 2, gen 0)"))
    // plain mutations stay unstamped
    assert(t.deletes.find(_.gen == 1L).get.op === None)
  }

  test("restore is itself restorable: restoring back to the pre-restore " +
    "version returns the mutated content (nothing was erased)") {
    val (_, t) = buildTable()
    val v0 = t.currentVersion
    t.deleteWhere(spark, col("conv_id") === "conv1", "purge conv1")
    val mutated = content(t)
    val vMut = t.currentVersion

    assert(t.restore(spark, v0).gen === 2L)
    assert(content(t).exists(_._1 == "conv1"))
    assert(t.restore(spark, vMut).gen === 3L)
    assert(content(t) === mutated)
  }

  test("recorded CDC rows are the exact inverse of the undone churn, and " +
    "the change feed's application law holds across the restore gen") {
    val (root, t) = buildTable()
    val at = t.currentVersion
    t.deleteWhere(spark, col("conv_id") === "conv3", "purge conv3")
    t.updateWhere(spark, col("conv_id") === "conv0" && col("turn_idx") === 1,
      Seq("role" -> lit("edited")), "conv0 turn1")
    val pre = content(t)
    t.restore(spark, at)

    val cfs = t.deletes.maxBy(_.gen).changeFiles.get
    assert(cfs.nonEmpty)
    val cdc = spark.read.parquet(cfs.map(cf => s"$root/${cf.path}"): _*)
    assert(cfs.map(_.rowCount).sum === cdc.count())
    val byType = cdc.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // conv3's 15 purged rows come back as insert; the update's single row
    // inverts as pre(edited)/post(original)
    assert(byType === Map("insert" -> 15L, "update_preimage" -> 1L,
      "update_postimage" -> 1L))
    assert(cdc.filter(col("_change_type") === "update_preimage")
      .select("role").collect().map(_.getString(0)).toSet === Set("edited"))
    assert(cdc.filter(col("_change_type") === "update_postimage")
      .select("role").collect().map(_.getString(0)).toSet === Set("tool"))

    // application law: pre \ {delete, update_preimage} ++ {insert,
    // update_postimage} == post
    val minus = cdc.filter(col("_change_type").isin("delete", "update_preimage"))
      .select("conv_id", "turn_idx", "role").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val plus = cdc.filter(col("_change_type").isin("insert", "update_postimage"))
      .select("conv_id", "turn_idx", "role").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert((pre -- minus) ++ plus === content(t))
  }

  test("a fresh incremental stream after a restore serves restored epoch " +
    "deltas; an un-appended epoch serves an empty delta") {
    val (root, t) = buildTable()
    val at = t.currentVersion
    t.deleteWhere(spark, col("conv_id") === "conv5", "purge conv5")
    val extra = Seq(("convX", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(extra, "w", 3L, 4))
    t.restore(spark, at)

    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Set[String], Long)]
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", root).option("maxEpochsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", tmpDir("restore-cp"))
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val convs = df.select("conv_id").distinct().collect()
          .map(_.getString(0)).toSet
        seen.synchronized { seen += ((id, convs, df.count())); () }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nonEmpty = seen.sortBy(_._1).filter(_._3 > 0)
    assert(nonEmpty.size === 3) // epochs 0-2 restored in full
    assert(nonEmpty.forall(_._2.contains("conv5"))) // the purge is undone
    assert(!nonEmpty.exists(_._2.contains("convX"))) // epoch 3 un-appended
    assert(nonEmpty.map(_._3).sum === 120L)
  }

  test("compaction folds a restore gen like any rewrite; restoring to a " +
    "pre-compaction version re-points to raw files; gc'd targets fail " +
    "loudly") {
    val (_, t) = buildTable()
    val at = t.currentVersion
    val want = content(t)
    t.deleteWhere(spark, col("conv_id") === "conv2", "purge conv2")
    t.restore(spark, at)
    assert(t.compact(spark, 2) >= 0L)
    assert(t.compactions.maxBy(_.gen).foldsDeletes === Seq(1L, 2L))
    assert(content(t) === want)

    // restore across the compaction boundary: content no-op, but the
    // live PATHS differ from the raw reconstruction -> commits and
    // re-points to the raw files (documented; compact() re-optimizes)
    val st = t.restore(spark, at)
    assert(st.gen === 3L && st.changeRows === 0L)
    assert(content(t) === want)
    assert(t.effectiveFiles.forall(!_.path.contains("part-c")))

    // after gc reclaims the raw files, the target is unreproducible
    val (_, t2) = buildTable()
    val at2 = t2.currentVersion
    t2.deleteWhere(spark, col("conv_id") === "conv2", "purge conv2")
    t2.compact(spark, 2)
    assert(t2.gc().nonEmpty)
    val ex = intercept[IllegalStateException] {
      t2.restore(spark, at2)
    }
    assert(ex.getMessage.contains("not reproducible"), ex.getMessage)
  }

  test("no-op and guard contracts: restoring the current state commits " +
    "nothing; future or uncommitted versions fail loudly") {
    val (_, t) = buildTable()
    val gensBefore = t.deletes.size
    assert(t.restore(spark, t.currentVersion) ===
      RestoreStats(-1L, 0, 0, 0L))
    assert(t.deletes.size === gensBefore)

    val e1 = intercept[IllegalArgumentException] {
      t.restore(spark, TableVersion(7L, 0L))
    }
    assert(e1.getMessage.contains("not in the past"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      t.restore(spark, TableVersion(2L, 5L))
    }
    assert(e2.getMessage.contains("not in the past"), e2.getMessage)
  }

  test("mutations after a restore compose: a delete may rewrite a " +
    "restored (re-added) file and the view stays exact") {
    val (_, t) = buildTable()
    val at = t.currentVersion
    t.deleteWhere(spark, col("conv_id") === "conv4", "purge conv4")
    t.restore(spark, at)
    // conv4 is back; now delete one turn per epoch of it — the candidate
    // files are ones the restore re-added
    val n = t.deleteWhere(spark,
      col("conv_id") === "conv4" && col("turn_idx") % 5 === 2, "conv4 turn2")
    assert(n === 3L) // one per epoch
    val got = content(t)
    assert(got.count(_._1 == "conv4") === 12)
    assert(!got.contains(("conv4", 2, "user")))
    assert(t.effectiveFiles.map(_.rowCount).sum === 117L)
  }

  test("reconstruction after a DELETE over compacted data: time travel, " +
    "CDC and restore all serve the post-delete content (no resurrect)") {
    val (_, t) = buildTable() // epochs 0-2, 120 rows
    assert(t.compact(spark, 4) === 0L)
    // the delete's removes reference COMPACTION-generation paths — the
    // case a raw per-epoch replay cannot express (its removes land on no
    // raw file, so a raw reconstruction would silently resurrect conv0)
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge conv0") === 15L)
    assert(t.deletes.exists(_.affectsCompacted))
    val rows = Seq(("convN", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(rows, "w", 3L, 4))
    val at3 = t.versionAtEpoch(3L) // state: compacted, conv0 purged, +convN
    val want3 = content(t)
    assert(!want3.exists(_._1 == "conv0") && want3.size === 106)

    // time travel pinned at epoch 3 must NOT resurrect conv0
    assert(t.readAsOf(spark, 3L).filter(col("conv_id") === "conv0").count() === 0L)

    // churn past the pin, then diff back to it: the CDC between must see
    // ONLY the post-pin churn, never a phantom conv0 insert/delete
    assert(t.deleteWhere(spark, col("conv_id") === "conv1", "purge conv1") === 15L)
    val diff = TableChanges.between(spark, t.root, at3, Some(t.currentVersion))
    assert(diff.count() === 15L)
    assert(diff.select("conv_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("conv1"))

    // restore to the pin brings conv1 back and leaves conv0 dead
    val st = t.restore(spark, at3)
    assert(st.gen >= 0L)
    assert(content(t) === want3, "restore resurrected purged rows")
  }

  test("gc pins superseded GENERATION files a tagged view needs when its " +
    "past deleted over compacted data; dropping the tag releases them") {
    val (_, t) = buildTable()
    assert(t.compact(spark, 4) === 0L)
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge conv0") === 15L)
    val rows = Seq(("convN", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(rows, "w", 3L, 4))
    t.tag("pin", 3L)
    // make epoch 3 historical, then supersede the generation the tagged
    // view replays over (its reconstruction takes the generation branch —
    // the delete's removes reference gen-0 compaction paths)
    val rows2 = Seq(("convM", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(rows2, "w", 4L, 4))
    val want = t.readAsOf(spark, 3L).select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(!want.exists(_._1 == "conv0") && want.size === 106)
    assert(t.compact(spark, 4) > 0L) // new generation supersedes gen 0
    t.gc()
    // the tagged view still replays, content-identical — gc must have
    // kept the superseded gen-0 files it references
    val got = t.readAsOf(spark, 3L).select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(got === want, "gc reclaimed generation files a tagged view needs")
    // dropping the tag releases the pin: the next gc reclaims, and the
    // view fails loudly instead of serving a partial state
    t.dropTag("pin")
    assert(t.gc().nonEmpty)
    intercept[IllegalStateException] { t.readAsOf(spark, 3L).count() }
  }

  test("a later full re-cluster (replaces = empty) never qualifies as the " +
    "replay base for an older version: one out-of-bound pass poisons the " +
    "whole chain after it") {
    val (_, t) = buildTable()
    assert(t.compact(spark, 4) === 0L)
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge conv0") === 15L)
    val rows = Seq(("convN", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(rows, "w", 3L, 4))
    val at3 = t.versionAtEpoch(3L)
    val want3 = content(t)
    // out-of-bound churn: epoch 4, an incremental fold covering it, then
    // a FULL re-cluster whose manifest records replaces = ∅ (everything
    // was already replaced) and only in-bound folds — the manifest LOOKS
    // in-bound for at3 on its own lists; only the chain says otherwise
    val rows2 = Seq(("convM", 0, "user",
      new java.sql.Timestamp(base / 1000L))).toDF("conv_id", "turn_idx", "role", "ts")
    assert(t.commitEpoch(rows2, "w", 4L, 4))
    assert(t.compact(spark, 4) > 0L)
    assert(t.compact(spark, 4, full = true) > 0L)
    assert(t.compactions.last.replaces.isEmpty,
      "precondition: the full re-cluster records no new replaces")
    // the pinned view must NOT contain epoch 4's rows, NOT double-count
    // epoch 3, and keep conv0 dead
    val got = t.readAsOf(spark, 3L).select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(got.length === got.distinct.length, "double-counted rows")
    assert(got.toSet === want3.map(r => (r._1, r._2)))
    assert(!got.exists(_._1 == "convM"), "phantom future rows")
    // CDC anchored at the pin sees exactly the post-pin churn
    val diff = TableChanges.between(spark, t.root, at3, Some(t.currentVersion))
    assert(diff.count() === 1L)
    assert(diff.head().getString(0) === "convM")
    // restore to the pin across the re-cluster is content-exact
    t.restore(spark, at3)
    assert(content(t) === want3)
  }
}
