package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.GraftCatalog

/** CDC view diffs: every mutation family surfaces as the right change rows,
  * untouched files are never part of the diff, and the summary CALL
  * reports the same counts through SQL. */
class TableChangesSpec extends SparkSpec {
  import TableChanges.ChangeTypeCol

  private val base = 1767225600L * 1000000L // micros

  private def ts(i: Long) = new Timestamp((base + i * 1000000L) / 1000L)

  /** Two epochs × 4 convs × 4 turns; role alternates user/tool. */
  private def buildTable(): (String, IcebergLite) = {
    import spark.implicits._
    val root = tmpDir("chg-table")
    val t = new IcebergLite(root)
    t.create(
      "conv_id string, turn_idx int, role string, text string, ts timestamp", 4)
    (0L until 2L).foreach { ep =>
      val rows = for (c <- 0 until 4; i <- 0 until 4) yield
        (s"conv$c", (ep * 4 + i).toInt, if (i % 2 == 0) "user" else "tool",
          s"text $c/${ep * 4 + i}", ts(ep * 3600 + c * 60 + i))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", ep, 4))
    }
    (root, t)
  }

  private def changes(root: String, from: Long, to: Option[Long] = None) =
    TableChanges.since(spark, root, from, to)
      .select("conv_id", "turn_idx", "role", "text", ChangeTypeCol)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4))).toSet

  test("appends since the from-version surface as inserts; nothing else") {
    import spark.implicits._
    val (root, t) = buildTable()
    val rows = Seq(("conv9", 0, "user", "new row", ts(99)))
    assert(t.commitEpoch(
      rows.toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", 2L, 4))
    assert(changes(root, 1L) ===
      Set(("conv9", 0, "user", "new row", "insert")))
    // between two historical versions too
    assert(changes(root, 1L, Some(2L)) ===
      Set(("conv9", 0, "user", "new row", "insert")))
    // a version diffed against itself is empty
    assert(changes(root, 2L, Some(2L)) === Set.empty)
  }

  test("copy-on-write DELETE: removed rows are deletes, surviving rows of " +
      "the rewritten files do not appear") {
    val (root, t) = buildTable()
    t.deleteWhere(spark, col("conv_id") === "conv2" && col("role") === "tool",
      "purge conv2 tool turns")
    val got = changes(root, 1L)
    assert(got === Set(
      ("conv2", 1, "tool", "text 2/1", "delete"),
      ("conv2", 3, "tool", "text 2/3", "delete"),
      ("conv2", 5, "tool", "text 2/5", "delete"),
      ("conv2", 7, "tool", "text 2/7", "delete")))
  }

  test("copy-on-write UPDATE: pre/post image pairs, only for changed rows") {
    val (root, t) = buildTable()
    t.updateWhere(spark, col("conv_id") === "conv1" && col("turn_idx") === 0,
      Seq("text" -> lit("fixed")), "fix conv1 turn0")
    assert(changes(root, 1L) === Set(
      ("conv1", 0, "user", "text 1/0", "update_preimage"),
      ("conv1", 0, "user", "fixed", "update_postimage")))
  }

  test("MERGE: matched rewrites pair as updates, the insert epoch as inserts") {
    import spark.implicits._
    val (root, t) = buildTable()
    val feed = Seq(
      ("conv0", 0, "merged", "text 0/0 [m]", ts(0)),   // matched → update
      ("conv8", 0, "user", "brand new", ts(7)))        // not matched → insert
      .toDF("conv_id", "turn_idx", "role", "text", "ts")
    t.merge(spark, feed, "m-1", Some(MergeUpdateAll), insertNotMatched = true)
    assert(changes(root, 1L) === Set(
      ("conv0", 0, "user", "text 0/0", "update_preimage"),
      ("conv0", 0, "merged", "text 0/0 [m]", "update_postimage"),
      ("conv8", 0, "user", "brand new", "insert")))
  }

  test("a compaction boundary changes every path but no content: the diff " +
      "is empty (and costs a full comparison — documented)") {
    val (root, t) = buildTable()
    val preCompact = t.currentVersion
    t.compact(spark, 4)
    // across the boundary: all paths differ, contents prove equal
    assert(TableChanges.between(spark, root, preCompact).collect().isEmpty)
    // the epoch-anchored form crosses the same boundary (epoch 1's stamp
    // is gen 0, before the compaction gen)
    assert(changes(root, 1L) === Set.empty)
    // and a version diffed against itself is trivially empty
    assert(TableChanges.between(spark, root, t.currentVersion,
      Some(t.currentVersion)).collect().isEmpty)
  }

  test("epoch-anchored CDC across two historical versions: the appended " +
      "epoch's rows are the inserts") {
    val (root, _) = buildTable()
    val got = changes(root, 0L, Some(1L))
    assert(got.size === 16)
    assert(got.forall(_._5 == "insert"))
    assert(got.map(_._2).forall(i => i >= 4 && i < 8)) // epoch 1's turns
  }

  test("schema evolution across the range: pre-evolution rows null-fill " +
      "the evolved column in change rows") {
    import spark.implicits._
    val (root, t) = buildTable()
    t.addColumn("lang", "STRING")
    val rows = Seq(("conv9", 1, "user", "evolved row", ts(5), "en"))
    assert(t.commitEpoch(
      rows.toDF("conv_id", "turn_idx", "role", "text", "ts", "lang"),
      "w", 2L, 4))
    t.deleteWhere(spark, col("conv_id") === "conv0" && col("turn_idx") === 0,
      "drop one pre-evolution row")
    val got = TableChanges.since(spark, root, 1L)
      .select("conv_id", "turn_idx", "lang", ChangeTypeCol).collect()
      .map(r => (r.getString(0), r.getInt(1), Option(r.getString(2)),
        r.getString(3))).toSet
    assert(got === Set(
      ("conv9", 1, Some("en"), "insert"),
      ("conv0", 0, None, "delete")))
  }

  test("manifest-first churn bound: a one-conv DELETE diffs one bucket's " +
      "files, never the corpus") {
    val (root, t) = buildTable() // 2 epochs x 4 buckets = 8 files
    val from = t.currentVersion
    val allFiles = t.effectiveFiles.size
    t.deleteWhere(spark, col("conv_id") === "conv2", "purge conv2",
      prune = sets => IcebergLite.pruneFileSets(sets, None, None, Some("conv2")))
    val (onlyPre, onlyPost) = TableChanges.changedFiles(t, from, t.currentVersion)
    // conv2's bucket: one original + one rewrite per epoch — the other
    // buckets' files are shared by path and never scanned
    val bucketFilesPerView = t.snapshots.size
    assert(onlyPre.size === bucketFilesPerView)
    assert(onlyPost.size <= bucketFilesPerView)
    assert(onlyPre.size < allFiles)
  }

  test("a tag keeps CDC-from-that-version alive across compact + gc; " +
      "without one the anchor is reclaimed and fails loudly") {
    import spark.implicits._
    val (root, t) = buildTable()
    val anchor = t.versionAtEpoch(1L)
    t.tag("cdc-anchor", 1L)
    // churn + shrink: new epoch, then compact + gc (which would normally
    // reclaim the pre-compaction per-epoch files the anchor view needs)
    val rows = Seq(("conv9", 0, "user", "new row", ts(99)))
    assert(t.commitEpoch(
      rows.toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", 2L, 4))
    t.compact(spark, 4)
    t.gc()
    val got = TableChanges.between(spark, root, anchor)
      .select("conv_id", ChangeTypeCol).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("conv9", "insert")))
    // release the pin: the next gc settles the anchor's files, and the
    // diff inherits time travel's loud reproducibility failure
    t.dropTag("cdc-anchor")
    assert(t.gc().nonEmpty)
    val e = intercept[IllegalStateException] {
      TableChanges.between(spark, root, anchor).collect()
    }
    assert(e.getMessage.contains("not reproducible"))
  }

  test("contract errors: reversed range; uncommitted from-version") {
    val (root, _) = buildTable()
    val e1 = intercept[IllegalArgumentException] {
      TableChanges.since(spark, root, 1L, Some(0L))
    }
    assert(e1.getMessage.contains("reversed"))
    val e2 = intercept[IllegalArgumentException] {
      TableChanges.since(spark, root, 42L)
    }
    assert(e2.getMessage.contains("not a committed snapshot"))
  }

  test("change-feed application law: pre-view + changes == post-view after " +
      "every step of a mixed append/delete/update/merge/compact scenario") {
    import spark.implicits._
    val (root, t) = buildTable()
    val anchor = t.currentVersion

    def view(v: TableVersion) = {
      val files = t.effectiveFileSetsAt(v).flatMap(_.files)
        .map(f => s"$root/${f.path}")
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          t.fullReadSchema)
      else spark.read.schema(t.fullReadSchema).parquet(files: _*)
    }
    /** Multiset law: post == (pre \ removed) ⊎ added, over complete rows. */
    def checkLaw(): Unit = {
      val pre = view(anchor)
      val post = view(t.currentVersion)
      val ch = TableChanges.between(spark, root, anchor)
      val cols = t.fullReadSchema.fieldNames.toSeq.map(col)
      val removed = ch.filter(col(ChangeTypeCol)
        .isin("delete", "update_preimage")).select(cols: _*)
      val added = ch.filter(col(ChangeTypeCol)
        .isin("insert", "update_postimage")).select(cols: _*)
      val rebuilt = pre.exceptAll(removed).unionAll(added)
      assert(rebuilt.exceptAll(post).isEmpty && post.exceptAll(rebuilt).isEmpty,
        "applying the change feed to the pre-view must reproduce the post-view")
    }

    // step 1: append
    assert(t.commitEpoch(Seq(("conv9", 0, "user", "new", ts(99)))
      .toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", 2L, 4))
    checkLaw()
    // step 2: delete
    t.deleteWhere(spark, col("role") === "tool" && col("conv_id") === "conv1",
      "drop conv1 tool turns")
    checkLaw()
    // step 3: update
    t.updateWhere(spark, col("conv_id") === "conv0" && col("turn_idx") < 2,
      Seq("text" -> concat(col("text"), lit(" [u]"))), "suffix conv0 head")
    checkLaw()
    // step 4: merge (update one row, insert one row, atomically)
    t.merge(spark,
      Seq(("conv2", 0, "merged", "m-text", ts(1)),
          ("conv8", 0, "user", "m-new", ts(2)))
        .toDF("conv_id", "turn_idx", "role", "text", "ts"),
      "law-merge", Some(MergeUpdateAll), insertNotMatched = true)
    checkLaw()
    // step 5: compaction (layout-only — the feed must not change)
    val before = TableChanges.between(spark, root, anchor).count()
    t.compact(spark, 4)
    checkLaw()
    assert(TableChanges.between(spark, root, anchor).count() === before)
    // step 6: more churn, then an INCREMENTAL second compaction (the prior
    // generation's files reused verbatim) — still layout-only to the feed
    assert(t.commitEpoch(Seq(("conv7", 0, "user", "late", ts(50)))
      .toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", 5L, 4))
    checkLaw()
    val before2 = TableChanges.between(spark, root, anchor).count()
    val gen2 = t.compact(spark, 4)
    assert(gen2 >= 0L)
    assert(t.compactions.find(_.gen == gen2).get.files.map(_.path)
      .exists(p => !p.contains(f"part-c$gen2%04d")), "reuse did not happen")
    checkLaw()
    assert(TableChanges.between(spark, root, anchor).count() === before2)
  }

  test("CALL graft.system.changes reports the same counts through SQL") {
    import spark.implicits._
    val warehouse = tmpDir("chg-warehouse")
    spark.conf.set("spark.sql.catalog.gchg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gchg.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gchg.db")
    spark.sql(
      """CREATE TABLE gchg.db.c1 (
        |  conv_id STRING, turn_idx INT, role STRING, text STRING,
        |  ts TIMESTAMP) TBLPROPERTIES ('buckets'='4')""".stripMargin)
    val df = (0 until 12)
      .map(i => (s"conv$i", i, "user", s"t$i", ts(i)))
      .toDF("conv_id", "turn_idx", "role", "text", "ts")
    df.writeTo("gchg.db.c1").option("epoch", "0").append()
    df.filter(col("turn_idx") < 3)
      .withColumn("turn_idx", col("turn_idx") + 100)
      .writeTo("gchg.db.c1").option("epoch", "1").append()
    spark.sql("DELETE FROM gchg.db.c1 WHERE turn_idx = 5")
    val got = spark.sql("CALL gchg.system.changes('db.c1', 0)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("insert", 3L), ("delete", 1L)))
    // bounded to a historical end version: only the appends
    val hist = spark.sql("CALL gchg.system.changes('db.c1', 0, 1)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(hist === Set(("insert", 3L)))
  }
}
