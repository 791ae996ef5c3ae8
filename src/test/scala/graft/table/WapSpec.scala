package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Write-audit-publish ([[IcebergLite.stageEpoch]] / [[readStaged]] /
  * [[publishStaged]] / [[discardStaged]]): staged epochs are invisible
  * everywhere until one atomic manifest write activates them (the merge
  * protocol), audits can out-live later mutations, and discards never
  * touch visible history. */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1767225600L * 1000000L // micros

  private def buildTable(): (String, IcebergLite) = {
    val root = tmpDir("wap-table")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, role string, ts timestamp", 4)
    (0L until 2L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", ep.toInt * 5 + i, "user",
          new java.sql.Timestamp(
            (base + ep * 3600L * 1000000L + c * 1000000L + i) / 1000L))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "role", "ts"), "w", ep, 4))
    }
    (root, t)
  }

  private def stagedDf(n: Int) =
    (0 until n).map(i => (s"staged$i", i, "audit",
      new java.sql.Timestamp(base / 1000L)))
      .toDF("conv_id", "turn_idx", "role", "ts")

  test("a staged epoch is invisible to reads, time travel and version " +
    "tokens; readStaged audits it; publish makes it visible atomically") {
    val (_, t) = buildTable()
    val before = t.read(spark).count()
    val vBefore = t.currentVersion

    val gen = t.stageEpoch(stagedDf(7), "audit-q", 2L, 4)
    assert(gen === 1L) // first reserved gen
    assert(t.read(spark).count() === before)
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L))
    assert(t.currentVersion === vBefore)
    intercept[IllegalArgumentException] { t.readAsOf(spark, 2L) }

    // the audit sees exactly the staged rows (lineage included)
    val audit = t.readStaged(spark, 2L)
    assert(audit.count() === 7L)
    assert(audit.columns.contains("epoch_id"))
    assert(audit.select("role").distinct().head().getString(0) === "audit")

    assert(t.publishStaged(2L) === gen)
    assert(t.read(spark).count() === before + 7L)
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 2L))
    assert(t.deletes.maxBy(_.gen).op === Some("publish"))
    // idempotent re-publish
    assert(t.publishStaged(2L) === gen)
    // the activated epoch stamps its gen (the CDC anchor, like merge)
    assert(t.versionAtEpoch(2L) === TableVersion(2L, gen))
  }

  test("stage replay is idempotent for the same query and loud for a " +
    "different one; a plain commit aimed at a staged id fails loudly") {
    val (_, t) = buildTable()
    val gen = t.stageEpoch(stagedDf(3), "audit-q", 2L, 4)
    assert(t.stageEpoch(stagedDf(3), "audit-q", 2L, 4) === gen)
    intercept[IllegalArgumentException] {
      t.stageEpoch(stagedDf(3), "other-q", 2L, 4)
    }
    val e = intercept[IllegalStateException] {
      t.commitEpoch(stagedDf(3), "audit-q", 2L, 4)
    }
    assert(e.getMessage.contains("staged, un-published"), e.getMessage)
  }

  test("an audit out-lives later mutations: removeOrphans leaves the " +
    "stage alone even after its reserved gen settles; publish still works " +
    "and CDC serves the epoch bounded by its activating gen") {
    val (root, t) = buildTable()
    val vBefore = t.currentVersion
    t.stageEpoch(stagedDf(4), "audit-q", 2L, 4) // reserves gen 1
    // a mutation commits ABOVE the reserved gen while the audit runs
    t.deleteWhere(spark, col("conv_id") === "conv3", "purge conv3") // gen 2
    assert(t.deletes.map(_.gen) === Seq(2L))
    // a crashed-merge pending with a settled gen would be reclaimed here;
    // the WAP stamp protects the stage
    assert(!t.removeOrphans().exists(_.contains("part-000002")))
    assert(t.stagedEpochs.map(_._1.epochId) === Seq(2L))

    assert(t.publishStaged(2L) === 1L)
    assert(t.read(spark).filter(col("role") === "audit").count() === 4L)
    // net-diff from before the stage: the staged rows are inserts, the
    // purge deletes — the publish gen bounds the epoch's visibility
    val ct = TableChanges.ChangeTypeCol
    val changes = TableChanges.between(spark, root, vBefore)
      .groupBy(ct).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(changes === Map("insert" -> 4L, "delete" -> 10L))
  }

  test("discard drops the stage without touching visible history; the id " +
    "is reusable; discarding published history is refused") {
    val (_, t) = buildTable()
    val before = t.read(spark).collect().length
    t.stageEpoch(stagedDf(5), "audit-q", 2L, 4)
    val dropped = t.discardStaged(2L)
    assert(dropped.exists(_.startsWith("data/")))
    assert(t.stagedEpochs.isEmpty)
    assert(t.read(spark).collect().length === before)
    // the freed id is allocatable again
    assert(t.nextEpochId === 2L)
    assert(t.commitEpoch(stagedDf(2), "w", 2L, 4))
    assert(t.read(spark).count() === before + 2L)
    // published epochs are history, not stages
    intercept[IllegalArgumentException] { t.discardStaged(1L) }
  }

  test("a fresh incremental stream replays a published stage exactly-once " +
    "as its own epoch; an un-published stage never reaches a stream") {
    val (root, t) = buildTable()
    t.stageEpoch(stagedDf(6), "audit-q", 2L, 4)

    def drain(cp: String): Seq[(Long, Long)] = {
      val seen = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", root).option("maxEpochsPerTrigger", "1").load()
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          seen.synchronized { seen += ((id, df.count())); () }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      seen.sortBy(_._1).toSeq
    }

    val cp = tmpDir("wap-cp")
    // un-published: the stream drains epochs 0-1 only
    assert(drain(cp).filter(_._2 > 0).map(_._2).sum === 80L)
    t.publishStaged(2L)
    // resumed on the same checkpoint: exactly the published epoch arrives
    assert(drain(cp).filter(_._2 > 0).map(_._2) === Seq(6L))
  }

  test("publish below a registered reader's offset is refused; force " +
      "overrides (offsets are epoch-id watermarks)") {
    val (_, t) = buildTable()
    val gen = t.stageEpoch(stagedDf(5), "audit-q", 2L, 4)
    t.registerReader("fast-reader", 2L) // offset already AT the staged id
    val ex = intercept[IllegalArgumentException](t.publishStaged(2L))
    assert(ex.getMessage.contains("fast-reader"))
    assert(t.read(spark).count() === 80L, "refused publish stays invisible")
    assert(t.publishStaged(2L, force = true) === gen)
    assert(t.read(spark).count() === 85L)
    // a reader strictly BELOW the epoch never blocks
    val (_, t2) = buildTable()
    t2.stageEpoch(stagedDf(3), "audit-q", 2L, 4)
    t2.registerReader("ok-reader", 1L)
    t2.publishStaged(2L)
    assert(t2.read(spark).count() === 83L)
  }

  test("default epoch allocation skips staged ids: an append while an " +
    "audit is open lands on the next id, and both survive publish") {
    val (_, t) = buildTable()
    t.stageEpoch(stagedDf(3), "audit-q", t.nextEpochId, 4) // epoch 2
    assert(t.nextEpochId === 3L) // pending id occupied
    assert(t.commitEpoch(stagedDf(1).withColumn("role", lit("live")),
      "w", t.nextEpochId, 4))
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 3L))
    t.publishStaged(2L)
    assert(t.snapshots.map(_.epochId) === Seq(0L, 1L, 2L, 3L))
    assert(t.read(spark).filter(col("role") === "audit").count() === 3L)
    assert(t.read(spark).filter(col("role") === "live").count() === 1L)
  }
}
