package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Branches: named chains of staged epochs sharing ONE reserved activation
  * gen — write-audit-publish generalized from one epoch to many. Every
  * branch epoch is a WAP stage, so invisibility, orphan protection and id
  * allocation are the proven machinery; the new claims are the shared-gen
  * atomic fast-forward and the branch read view (live + stages). */
class BranchSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def tsAt(d: Long) = new java.sql.Timestamp((baseMicros + d) / 1000L)

  /** 2 committed epochs (80 rows), 4 buckets. */
  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("branch-table")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 2L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, tsAt(ep * 3600L * 1000000L + c * 60L * 1000000L + i))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  private def stageRows(table: IcebergLite, epoch: Long, branch: String,
                        idxBase: Int): Unit = {
    import spark.implicits._
    val rows = for (c <- 0 until 8; i <- 0 until 3) yield
      (s"conv$c", idxBase + i, tsAt(epoch * 7200L * 1000000L + i))
    table.stageEpochOnBranch(rows.toDF("conv_id", "turn_idx", "ts"),
      "br", epoch, 4, branch)
  }

  private def conn(table: IcebergLite) =
    spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root)

  test("branch writes invisible on main; branch view = live + stages") {
    val table = buildTable()
    val gen = table.createBranch("audit")
    assert(gen >= 1L)
    stageRows(table, 2L, "audit", 100)
    stageRows(table, 3L, "audit", 200)
    // main: unchanged, via the engine read AND the connector
    assert(table.read(spark).count() === 80L)
    assert(conn(table).load().count() === 80L)
    // branch: live + both stages, engine AND connector option
    assert(table.readBranch(spark, "audit").count() === 80L + 24L + 24L)
    val viaConn = conn(table).option("branch", "audit").load()
    assert(viaConn.count() === 128L)
    // staged content really present (not just counted)
    assert(viaConn.filter(col("turn_idx") >= 200).count() === 24L)
    // manifest pruning composes with the branch view
    assert(viaConn.filter(col("conv_id") === "conv3").count() === 16L)
    assert(table.branchEpochs("audit").map(_.epochId) === Seq(2L, 3L))
  }

  test("fastForward publishes the WHOLE chain atomically; stream replays it") {
    import org.apache.spark.sql.streaming.Trigger
    val table = buildTable()
    table.createBranch("audit")
    stageRows(table, 2L, "audit", 100)
    stageRows(table, 3L, "audit", 200)
    assert(table.read(spark).count() === 80L)
    val activated = table.fastForward("audit")
    assert(activated === Seq(2L, 3L))
    assert(table.branches.isEmpty)
    assert(table.read(spark).count() === 128L)
    assert(conn(table).load().count() === 128L)
    // a fresh incremental stream drains all four epochs exactly-once
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()
      .groupBy(col("epoch_id")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("branch_ff_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val byEpoch = spark.table("branch_ff_stream").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byEpoch === Map(0L -> 40L, 1L -> 40L, 2L -> 24L, 3L -> 24L))
  }

  test("CDC: the fast-forward surfaces the branch epochs as inserts") {
    val table = buildTable()
    val pre = table.currentVersion
    table.createBranch("audit")
    stageRows(table, 2L, "audit", 100)
    stageRows(table, 3L, "audit", 200)
    // still invisible: the diff against pre is empty
    assert(TableChanges.between(spark, table.root, pre,
      Some(table.currentVersion)).count() === 0L)
    table.fastForward("audit")
    val post = table.currentVersion
    val diff = TableChanges.between(spark, table.root, pre, Some(post))
    assert(diff.count() === 48L)
    assert(diff.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("insert"))
  }

  test("dropBranch discards stages + files; the name frees for reuse") {
    val table = buildTable()
    table.createBranch("audit")
    stageRows(table, 2L, "audit", 100)
    val stagedPaths = table.branchEpochs("audit").flatMap(_.files).map(_.path)
    assert(stagedPaths.nonEmpty)
    val dropped = table.dropBranch("audit")
    assert(dropped.count(_.endsWith(".parquet")) === stagedPaths.length)
    stagedPaths.foreach { p =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(table.root, p)), s"file $p must be deleted")
    }
    assert(table.read(spark).count() === 80L)
    assert(table.branches.isEmpty)
    // the name is reusable, with a FRESH gen
    val g2 = table.createBranch("audit")
    assert(table.branchEpochs("audit").isEmpty)
    assert(g2 >= 1L)
  }

  test("guards: duplicates, unknown names, publish-one refusal, read shapes") {
    val table = buildTable()
    table.createBranch("audit")
    intercept[IllegalArgumentException](table.createBranch("audit"))
    intercept[IllegalArgumentException](table.createBranch("7"))
    table.tag("v0", 0L)
    intercept[IllegalArgumentException](table.createBranch("v0"))
    intercept[IllegalArgumentException](
      stageRows(table, 2L, "nope", 100))
    intercept[IllegalArgumentException](table.branchEpochs("nope"))
    intercept[IllegalArgumentException](table.fastForward("nope"))
    intercept[IllegalArgumentException](table.dropBranch("nope"))
    // a branch epoch refuses the single-epoch publish (the chain is atomic)
    stageRows(table, 2L, "audit", 100)
    intercept[IllegalStateException](table.publishStaged(2L))
    // branch + time travel exclusive; branch streams rejected
    intercept[IllegalArgumentException](
      conn(table).option("branch", "audit").option("asOfEpoch", "0")
        .load().collect())
    val streamEx = intercept[Exception] {
      spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", table.root).option("branch", "audit").load()
        .writeStream.format("memory").queryName("branch_stream_rejected")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
    }
    assert(streamEx.toString.contains("batch-only") ||
      Option(streamEx.getCause).exists(_.toString.contains("batch-only")))
  }

  test("hardening: overwrite-to-branch refused BEFORE truncation; " +
      "discard refusal; tag/branch namespace; fast-forward crash window") {
    import spark.implicits._
    val table = buildTable()
    val gen = table.createBranch("audit")
    stageRows(table, 2L, "audit", 100)
    // 1) INSERT OVERWRITE at a branch: loud error AND no truncation side
    //    effect (the guard must fire before the destructive deleteWhere)
    val df = Seq(("convX", 0, tsAt(0L))).toDF("conv_id", "turn_idx", "ts")
    val ex = intercept[Exception] {
      df.write.format("graft.sources.IcebergLiteSource")
        .option("path", table.root).option("branch", "audit")
        .mode("overwrite").save()
    }
    assert(ex.toString.contains("append-only") ||
      Option(ex.getCause).exists(_.toString.contains("append-only")))
    assert(table.read(spark).count() === 80L,
      "live rows must survive the refused overwrite")
    assert(table.branchEpochs("audit").map(_.epochId) === Seq(2L))
    // 2) a single branch epoch cannot be discarded from outside — the
    //    "publish together" invariant holds on discard too
    val dex = intercept[IllegalStateException](table.discardStaged(2L))
    assert(dex.getMessage.contains("drop_branch"))
    // 3) tag cannot take a live branch's name (mirror of createBranch)
    val tex = intercept[IllegalArgumentException](table.tag("audit", 0L))
    assert(tex.getMessage.contains("branch"))
    // 4) fast-forward crash window (activation manifest written, name not
    //    yet released): re-staging refused, branch view does not double
    //    count, re-running fast_forward recovers
    table.fastForward("audit")
    assert(table.read(spark).count() === 104L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(table.root, "metadata", "branches.json"),
      s"""{"audit":$gen}""".getBytes)
    val sex = intercept[IllegalArgumentException](
      stageRows(table, 5L, "audit", 300))
    assert(sex.getMessage.contains("fast-forwarded"))
    assert(table.branchEpochs("audit").isEmpty,
      "published epochs are not branch stages")
    assert(table.readBranch(spark, "audit").count() === 104L,
      "crash window must not double-count the published epochs")
    assert(table.fastForward("audit") === Seq(2L)) // idempotent recovery
    assert(table.branches.isEmpty)
  }

  test("fast-forward below a registered reader's offset is refused; " +
      "force overrides") {
    val table = buildTable()
    table.createBranch("audit")
    stageRows(table, 2L, "audit", 100)
    // an incremental stream whose committed offset already passed epoch 2
    // would NEVER replay it — the publish must fail loudly
    table.registerReader("slow-stream", 3L)
    val ex = intercept[IllegalArgumentException](table.fastForward("audit"))
    assert(ex.getMessage.contains("slow-stream"))
    assert(table.branches.contains("audit"),
      "a refused publish must not release the branch name")
    assert(table.read(spark).count() === 80L)
    // operator retires the checkpoint, then forces
    assert(table.fastForward("audit", force = true) === Seq(2L))
    assert(table.read(spark).count() === 104L)
  }

  test("gens compose: a main DELETE between create and fast-forward; promotion") {
    val table = buildTable()
    table.createBranch("audit") // reserves gen g
    stageRows(table, 2L, "audit", 100)
    // main mutation AFTER the reservation takes a LATER gen
    table.deleteWhere(spark, col("conv_id") === "conv0", "conv_id = 'conv0'")
    assert(table.read(spark).count() === 80L - 10L)
    // fast-forward: the branch manifest (earlier gen, empty rewrite)
    // composes with the later delete in gen order
    table.fastForward("audit")
    // conv0's staged rows ARE visible: the delete committed BEFORE the
    // branch published, and deletes rewrite files, not future epochs
    assert(table.read(spark).count() === 70L + 24L)
    assert(table.read(spark)
      .filter(col("conv_id") === "conv0" && col("turn_idx") >= 100).count() === 3L)
    // metadata expiry promotes the activated branch epoch (pendingGen
    // stamp removed) even though the manifest carries no activatesEpoch
    table.expireMetadata()
    assert(table.rawSnapshots.find(_._1.epochId == 2L).get._2.isEmpty,
      "expiry must promote the activated branch epoch (pendingGen removed)")
    assert(table.read(spark).count() === 94L)
  }
}
