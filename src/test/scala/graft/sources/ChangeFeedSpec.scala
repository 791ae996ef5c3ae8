package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.table.{IcebergLite, MergeUpdateAll, TableVersion}

/** The recorded CDC change feed (`.changes` metadata table /
  * `readChangeFeed` option): per-commit change rows served as pure file
  * scans, exactly-once through the streaming form, atomically for MERGE,
  * loudly refusing ranges whose history is gone. */
class ChangeFeedSpec extends SparkSpec {

  private val base = 1767225600L * 1000000L // micros

  private def ts(i: Long) = new Timestamp((base + i * 1000000L) / 1000L)

  /** Two epochs × 4 convs × 4 turns. */
  private def buildTable(prefix: String): (String, IcebergLite) = {
    import spark.implicits._
    val root = tmpDir(prefix)
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

  private def feed(root: String, opts: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", root).option("readChangeFeed", "true")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def rowsOf(df: DataFrame): Set[(String, Int, String, String, String, Option[Long], Option[Long])] =
    df.select("conv_id", "turn_idx", "role", "text", "_change_type",
      "_commit_epoch", "_commit_gen")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getString(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSet

  test("full-history batch feed: inserts carry their epoch, DELETE records " +
      "delete rows, UPDATE records pre/post pairs; multiset application " +
      "law reproduces the live table") {
    val (root, t) = buildTable("cdcfeed")
    assert(t.deleteWhere(spark, col("conv_id") === "conv1", "conv_id = 'conv1'")
      === 8L)
    assert(t.updateWhere(spark, col("conv_id") === "conv2" && col("turn_idx") === 0,
      Seq("text" -> lit("redacted")), "upd") === 1L)

    val all = rowsOf(feed(root))
    // 32 inserts + 8 deletes + 1 pre + 1 post
    assert(all.size === 42)
    // exactly one of (_commit_epoch, _commit_gen) per row, by change kind
    assert(all.forall { case (_, _, _, _, k, e, g) =>
      if (k == "insert") e.isDefined && g.isEmpty else e.isEmpty && g.isDefined
    })
    assert(all.count(_._5 == "insert") === 32)
    assert(all.count(_._5 == "delete") === 8)
    assert(all.filter(_._5 == "delete").forall(r => r._1 == "conv1" && r._7 == Some(1L)))
    val pre = all.filter(_._5 == "update_preimage")
    val post = all.filter(_._5 == "update_postimage")
    assert(pre.map(r => (r._1, r._2, r._4)) === Set(("conv2", 0, "text 2/0")))
    assert(post.map(r => (r._1, r._2, r._4)) === Set(("conv2", 0, "redacted")))
    // epoch stamps: 16 inserts each from epochs 0 and 1
    assert(all.filter(_._5 == "insert").groupBy(_._6).view.mapValues(_.size).toMap
      === Map(Some(0L) -> 16, Some(1L) -> 16))

    // application law (multiset): live == inserts + postimages − deletes − preimages
    val applied = all.filter(r => r._5 == "insert" || r._5 == "update_postimage")
      .map(r => (r._1, r._2, r._4)) --
      all.filter(r => r._5 == "delete" || r._5 == "update_preimage")
        .map(r => (r._1, r._2, r._4))
    val live = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", root).load()
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(applied === live)
  }

  test("range-bounded batch feed slices by (epoch, gen); compaction never " +
      "appears; reversed range fails") {
    val (root, t) = buildTable("cdcrange")
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge") === 8L)
    // only the mutation, not the already-consumed epochs
    val sinceEpochs = rowsOf(feed(root, Map("fromEpoch" -> "1")))
    assert(sinceEpochs.map(_._5) === Set("delete"))
    assert(sinceEpochs.size === 8)
    // only epoch 1, mutation excluded by toGen
    val justEpoch1 = rowsOf(feed(root,
      Map("fromEpoch" -> "0", "toEpoch" -> "1", "toGen" -> "0")))
    assert(justEpoch1.map(_._5) === Set("insert") && justEpoch1.size === 16)
    // compaction: layout-only, feed across it is empty
    val v = t.currentVersion
    t.compact(spark, 4)
    assert(rowsOf(feed(root,
      Map("fromEpoch" -> v.epoch.toString, "fromGen" -> v.gen.toString))).isEmpty)
    val err = intercept[IllegalArgumentException] {
      feed(root, Map("fromEpoch" -> "1", "toEpoch" -> "0")).collect()
    }
    assert(err.getMessage.contains("reversed"))
  }

  test("MERGE is atomic through the feed: update images ride the gen, " +
      "inserts ride the activated epoch, and a gen-bound BELOW the " +
      "activation hides both") {
    import spark.implicits._
    val (root, t) = buildTable("cdcmerge")
    val v = t.currentVersion
    val srcRows = Seq(
      ("conv0", 0, "user", "corrected", ts(0)), // matched -> update
      ("conv9", 0, "user", "brand new", ts(9))) // not matched -> insert
    val stats = t.merge(spark,
      srcRows.toDF("conv_id", "turn_idx", "role", "text", "ts"),
      "merge-q", Some(MergeUpdateAll), insertNotMatched = true)
    assert(stats.matched === 1L && stats.inserted === 1L)
    val insertEpoch = stats.insertEpoch.get
    val after = t.currentVersion

    val events = rowsOf(feed(root,
      Map("fromEpoch" -> v.epoch.toString, "fromGen" -> v.gen.toString)))
    assert(events.map(_._5) === Set("insert", "update_preimage", "update_postimage"))
    assert(events.filter(_._5 == "insert").map(r => (r._1, r._4, r._6))
      === Set(("conv9", "brand new", Some(insertEpoch))))
    assert(events.filter(_._5 == "update_postimage").map(r => (r._1, r._4))
      === Set(("conv0", "corrected")))
    // bound the range below the activating gen: the pending insert epoch
    // must NOT leak (merge atomicity preserved through the feed)
    val hidden = rowsOf(feed(root, Map(
      "fromEpoch" -> v.epoch.toString, "fromGen" -> v.gen.toString,
      "toEpoch" -> after.epoch.toString, "toGen" -> (after.gen - 1).toString)))
    assert(hidden.isEmpty)
  }

  test("streaming feed is exactly-once across sequential runs on one " +
      "checkpoint: each commit's events are delivered in exactly one batch") {
    import spark.implicits._
    val (root, t) = buildTable("cdcstream")
    val cp = tmpDir("cdcstream-cp")
    val got = collection.mutable.ArrayBuffer
      .empty[(Long, Set[(String, Int, String, Option[Long], Option[Long])])]

    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", root).option("readChangeFeed", "true").load()
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, id: Long) =>
          val rows = df.select("conv_id", "turn_idx", "_change_type",
            "_commit_epoch", "_commit_gen").collect()
            .map(r => (r.getString(0), r.getInt(1), r.getString(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
          got.synchronized { got += ((id, rows)); () }
        }.start()
      q.awaitTermination()
    }

    drain() // run 1: the two build epochs as inserts
    val run1 = got.toSeq
    assert(run1.flatMap(_._2).count(_._3 == "insert") === 32)
    assert(run1.flatMap(_._2).forall(_._3 == "insert"))

    got.clear()
    drain() // nothing new
    assert(got.flatMap(_._2).isEmpty)

    got.clear()
    assert(t.deleteWhere(spark, col("conv_id") === "conv3", "purge") === 8L)
    assert(t.commitEpoch(Seq(("convX", 0, "user", "late", ts(77)))
      .toDF("conv_id", "turn_idx", "role", "text", "ts"), "w", 2L, 4))
    drain() // run 3: ONLY the delete events + the new epoch's inserts
    val run3 = got.flatMap(_._2).toSet
    assert(run3.count(_._3 == "delete") === 8)
    assert(run3.filter(_._3 == "insert").map(r => (r._1, r._4))
      === Set(("convX", Some(2L))))
    assert(run3.size === 9)
  }

  test("loud guards: a pre-CDC gen, an expired feed range, and gc'd raw " +
      "epochs all fail with remediation instead of serving holes") {
    val (root, t) = buildTable("cdcguards")
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge") === 8L)

    // simulate a pre-CDC manifest: strip changeFiles from the delete JSON
    val manifest = java.nio.file.Paths.get(root, "metadata", "delete-000001.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readAllBytes(manifest))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val withCf = mapper.writeValueAsBytes(node)
    node.remove("changeFiles")
    java.nio.file.Files.write(manifest, mapper.writeValueAsBytes(node))
    val preCdc = intercept[IllegalStateException] { feed(root).collect() }
    assert(preCdc.getMessage.contains("predates CDC recording") &&
      preCdc.getMessage.contains("TableChanges.between"))
    java.nio.file.Files.write(manifest, withCf) // restore

    // full shrink lifecycle: compact folds the delete, gc reclaims raw
    // files, expiry retires manifests + change files and records horizons
    t.compact(spark, 4)
    t.gc()
    // retainLast = 0: settle ALL replaced epochs so the folded delete
    // manifest can retire (a retained source epoch correctly pins it)
    t.expireMetadata(retainLast = 0)
    assert(t.cdcGenHorizon === Some(1L))
    // the recorded change files retired with the manifest
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "changes", "cdc-0001-00000.parquet")))
    assert(t.deletes.isEmpty)
    val expired = intercept[IllegalStateException] { feed(root).collect() }
    assert(expired.getMessage.contains("horizon") &&
      expired.getMessage.contains("currentVersion"))
    // a fresh feed anchored at the current version still works (empty)
    val cur = t.currentVersion
    assert(rowsOf(feed(root, Map(
      "fromEpoch" -> cur.epoch.toString, "fromGen" -> cur.gen.toString))).isEmpty)
  }

  test("crash window: a change file published without its manifest is " +
      "reclaimed by removeOrphans once the gen settles; referenced and " +
      "in-flight files survive") {
    val (root, t) = buildTable("cdcorphan")
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge") === 8L)
    val changes = java.nio.file.Paths.get(root, "changes")
    val referenced = changes.resolve("cdc-0001-00000.parquet")
    assert(java.nio.file.Files.exists(referenced))
    // gen 1 settled (its manifest landed) -> an unreferenced sibling from a
    // crashed concurrent attempt is garbage
    val orphanSettled = changes.resolve("cdc-0001-99999.parquet")
    // gen 5 above the committed max -> may be an in-flight mutation
    val orphanInflight = changes.resolve("cdc-0005-00000.parquet")
    java.nio.file.Files.copy(referenced, orphanSettled)
    java.nio.file.Files.copy(referenced, orphanInflight)
    val cleaned = t.removeOrphans()
    assert(cleaned.contains("changes/cdc-0001-99999.parquet"))
    assert(java.nio.file.Files.exists(referenced))
    assert(java.nio.file.Files.exists(orphanInflight))
    // once gen 5 settles (a later committed gen), the in-flight file is dead
    assert(t.deleteWhere(spark, col("conv_id") === "conv1", "p2") === 8L) // gen 2
    (3L to 5L).foreach(_ =>
      t.deleteWhere(spark, col("conv_id") === "convNONE", "noop"))
    // noop deletes match nothing and commit no gen; settle gen 5 by real ones
    var g = t.currentGen
    while (g < 5L) {
      assert(t.updateWhere(spark, col("conv_id") === "conv2" && col("turn_idx") === 0,
        Seq("text" -> lit(s"v$g")), s"bump") === 1L)
      g = t.currentGen
    }
    assert(t.removeOrphans().contains("changes/cdc-0005-00000.parquet"))
    // the feed over the real history is unaffected by the cleanup
    assert(feed(root).count() > 0)
  }

  test("schema evolution: change rows recorded BEFORE an added column " +
      "null-fill it; rows from after carry it — one evolved feed schema") {
    import spark.implicits._
    val (root, t) = buildTable("cdcevolve")
    assert(t.deleteWhere(spark, col("conv_id") === "conv0", "purge") === 8L) // pre-evolution gen 1
    t.addColumn("lang", "STRING")
    assert(t.commitEpoch(
      Seq(("convY", 0, "user", "bonjour", ts(99), "fr"))
        .toDF("conv_id", "turn_idx", "role", "text", "ts", "lang"), "w", 2L, 4))
    assert(t.updateWhere(spark, col("conv_id") === "convY",
      Seq("lang" -> lit("fr-CA")), "fix") === 1L) // post-evolution gen 2

    val all = feed(root)
      .select("conv_id", "_change_type", "_commit_epoch", "_commit_gen", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4)))).toSet
    // pre-evolution rows (epochs 0/1 inserts + gen-1 deletes): lang is null
    assert(all.filter(r => r._3.exists(_ <= 1L) || r._4 == Some(1L))
      .forall(_._5.isEmpty))
    // post-evolution rows carry the column on every image
    assert(all.filter(_._3 == Some(2L)).map(r => (r._2, r._5))
      === Set(("insert", Some("fr"))))
    assert(all.filter(_._4 == Some(2L)).map(r => (r._2, r._5))
      === Set(("update_preimage", Some("fr")), ("update_postimage", Some("fr-CA"))))
  }

  test("catalog surface: graft.db.t.changes resolves to the feed for SQL " +
      "and readStream.table") {
    import spark.implicits._
    val warehouse = tmpDir("cdc-warehouse")
    spark.conf.set("spark.sql.catalog.gcdc",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcdc.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdc.db")
    spark.sql(
      """CREATE TABLE gcdc.db.cdct (
        |  conv_id STRING, turn_idx INT, role STRING, text STRING,
        |  ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    Seq(("c0", 0, "user", "hello", ts(0)))
      .toDF("conv_id", "turn_idx", "role", "text", "ts")
      .writeTo("gcdc.db.cdct").append()
    spark.sql("DELETE FROM gcdc.db.cdct WHERE conv_id = 'c0'")

    val viaSql = spark.sql(
      "SELECT _change_type, count(*) AS n FROM gcdc.db.cdct.changes " +
        "GROUP BY 1 ORDER BY 1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSql === Seq(("delete", 1L), ("insert", 1L)))

    // streaming through the catalog identifier
    val cp = tmpDir("cdc-cat-cp")
    var seen = Set.empty[String]
    val q = spark.readStream.table("gcdc.db.cdct.changes")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen = seen ++ df.select("_change_type").collect().map(_.getString(0))
        ()
      }.start()
    q.awaitTermination()
    assert(seen === Set("insert", "delete"))
    // a real table named "changes" would shadow the metadata table; an
    // unknown parent still 404s
    val nsErr = intercept[Exception] {
      spark.sql("SELECT * FROM gcdc.db.nosuch.changes").collect()
    }
    assert(nsErr.getMessage.toLowerCase.contains("cannot be found") ||
      nsErr.getMessage.toLowerCase.contains("not found"))
  }
}
