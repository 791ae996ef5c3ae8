package graft.table

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental compaction ([[IcebergLite.compact]] default mode): the
  * prior generation's live files are reused verbatim and only the
  * un-replaced epochs' post-delete rows are rewritten — cost proportional
  * to the churn being folded, never the corpus — while content, gc,
  * time travel and the restore interaction stay exactly as under the full
  * rewrite. */
class CompactIncrementalSpec extends SparkSpec {

  private def mkTable(root: String, epochs: Int = 3,
                      rowsPerEpoch: Int = 50): IcebergLite = {
    import spark.implicits._
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    (0 until epochs).foreach { e =>
      val base = 1767225600L + e * 3600L
      // keys unique across epochs (the CDC pairing contract)
      val df = (0 until rowsPerEpoch).map { i =>
        (f"conv-$i%03d", e * 10000 + i, new Timestamp((base + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(table.commitEpoch(df, "q", e.toLong, 2))
    }
    table
  }

  private def contents(t: IcebergLite) =
    t.read(spark).select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("incremental pass reuses the prior generation verbatim and folds " +
    "deletes that touched it — content identical to a full rewrite") {
    val t = mkTable(tmpDir("ci-reuse"), epochs = 2)
    assert(t.compact(spark, 2) === 0L) // no prior gen -> full-equivalent
    val gen0 = t.compactions.head.files.map(f => f.path -> f).toMap

    // churn AFTER the compaction: a delete touching BOTH gen-0 files and
    // the new epochs, then two more epochs
    (2 until 4).foreach { e =>
      import spark.implicits._
      val df = (0 until 50).map { i =>
        (f"conv-$i%03d", e * 10000 + i,
          new Timestamp((1767225600L + e * 3600L + i) * 1000L))
      }.toDF("conv_id", "turn_idx", "ts")
      assert(t.commitEpoch(df, "q", e.toLong, 2))
    }
    assert(t.deleteWhere(spark, col("turn_idx") % 10000 < 5,
      "turn_idx % 10000 < 5") === 20L) // 5 rows x 4 epochs
    val want = contents(t)
    assert(want.size === 180)

    assert(t.compact(spark, 2) === 1L)
    assert(contents(t) === want)
    val gen1 = t.compactions.find(_.gen == 1L).get
    // gen-0's files were themselves rewritten by the delete, so the REUSED
    // files are the delete's compaction-sourced survivors (part-d...),
    // carried verbatim with their recorded stats; no raw gen-0 path leaks
    val reused = gen1.files.filterNot(_.path.contains("part-c0001"))
    assert(reused.nonEmpty)
    assert(reused.forall(f => f.path.contains("part-d")))
    assert(reused.map(_.rowCount).sum === 90L) // 100 gen-0 rows - 10 deleted
    assert(gen1.files.map(_.path).toSet.intersect(gen0.keySet).isEmpty)

    // and a quiet prior gen (no deletes since) is reused by ITS OWN paths
    import spark.implicits._
    val df = Seq(("conv-zzz", 99999, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 9L, 2))
    assert(t.compact(spark, 2) === 2L)
    val gen2 = t.compactions.find(_.gen == 2L).get
    assert(gen1.files.map(_.path).toSet
      .subsetOf(gen2.files.map(_.path).toSet))
    assert(contents(t) === want + (("conv-zzz", 99999)))
  }

  test("layout changes re-cluster fully: a different bucket count never " +
    "reuses, full = true folds everything into one file per bucket") {
    val t = mkTable(tmpDir("ci-layout"), epochs = 2)
    assert(t.compact(spark, 2) === 0L)
    import spark.implicits._
    val df = Seq(("conv-aaa", 99999, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 5L, 2))
    val want = contents(t)

    // bucket-count change: partitionId would change meaning -> full
    assert(t.compact(spark, 4) === 1L)
    val gen1 = t.compactions.find(_.gen == 1L).get
    assert(gen1.files.forall(_.path.contains("part-c0001")))
    assert(gen1.numBuckets === 4)
    assert(contents(t) === want)

    // full = true after an incremental pass: one file per bucket again
    val df2 = Seq(("conv-bbb", 88888, new Timestamp(1767270000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df2, "q", 6L, 4))
    assert(t.compact(spark, 4) === 2L) // incremental: reuses gen 1
    assert(t.effectiveFiles.size > 4)
    assert(t.compact(spark, 4, full = true) === 3L)
    assert(t.effectiveFiles.size <= 4)
    assert(t.compactions.find(_.gen == 3L).get.files
      .forall(_.path.contains("part-c0003")))
    assert(contents(t) === want + (("conv-bbb", 88888)))
  }

  test("gc after an incremental pass reclaims the folded epochs but never " +
    "the reused files; reads stay identical") {
    val t = mkTable(tmpDir("ci-gc"), epochs = 2)
    assert(t.compact(spark, 2) === 0L)
    import spark.implicits._
    val df = Seq(("conv-ggg", 77777, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 7L, 2))
    assert(t.compact(spark, 2) === 1L) // incremental: gen-0 files reused
    val want = contents(t)
    val reusedPaths = t.compactions.find(_.gen == 0L).get.files.map(_.path)

    val deleted = t.gc()
    // epoch files (2 epochs x 2 buckets + epoch 7's file(s)) reclaimed;
    // the reused gen-0 files are LIVE inside gen 1 and must survive
    assert(deleted.nonEmpty)
    assert(reusedPaths.forall(p => !deleted.contains(p)))
    assert(reusedPaths.forall(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, p))))
    assert(contents(t) === want)
    assert(t.gc().isEmpty) // idempotent
  }

  test("a restore that re-adds already-replaced raw epochs falls back to a " +
    "full rewrite (the reuse split cannot attribute them) — content exact") {
    val t = mkTable(tmpDir("ci-restore"), epochs = 2)
    val pin = t.currentVersion
    assert(t.compact(spark, 2) === 0L)
    assert(t.deleteWhere(spark, col("turn_idx") === 3, "turn_idx = 3") === 1L)
    // roll back to the pre-compaction state: the rewrite manifest re-adds
    // the RAW epoch files of epochs gen 0 already replaced
    t.restore(spark, pin)
    val want = contents(t)
    assert(want.size === 100)
    import spark.implicits._
    val df = Seq(("conv-rrr", 66666, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 8L, 2))

    val gen = t.compact(spark, 2) // would reuse, but must detect + go full
    assert(gen === 1L)
    val manifest = t.compactions.find(_.gen == 1L).get
    assert(manifest.files.forall(_.path.contains("part-c0001")))
    assert(contents(t) === want + (("conv-rrr", 66666)))
  }

  test("run growth is bounded: k incremental passes leave <= k+1 files per " +
    "bucket; one full pass re-clusters back to one") {
    import spark.implicits._
    val t = mkTable(tmpDir("ci-chain"), epochs = 1)
    assert(t.compact(spark, 2) === 0L)
    var expect = contents(t)
    (1 to 4).foreach { k =>
      val df = Seq((f"conv-x$k%02d", 50000 + k,
        new Timestamp((1767260000L + k) * 1000L)))
        .toDF("conv_id", "turn_idx", "ts")
      assert(t.commitEpoch(df, "q", (10 + k).toLong, 2))
      expect += ((f"conv-x$k%02d", 50000 + k))
      assert(t.compact(spark, 2) === k.toLong)
      val perBucket = t.effectiveFiles.groupBy(_.partitionId).values.map(_.size)
      assert(perBucket.forall(_ <= k + 1),
        s"pass $k left a bucket with ${perBucket.max} runs")
      assert(contents(t) === expect)
    }
    assert(t.compact(spark, 2, full = true) === 5L)
    assert(t.effectiveFiles.size <= 2)
    assert(contents(t) === expect)
  }

  test("full re-cluster fires even when the table occupies fewer buckets " +
    "than numBuckets (clustered == one file per bucket, not a count bound)") {
    import spark.implicits._
    val t = new IcebergLite(tmpDir("ci-sparse"))
    t.create("conv_id string, turn_idx int, ts timestamp", 8)
    def df(e: Int) = (0 until 20).map(i => ("conv-only", e * 100 + i,
      new Timestamp((1767225600L + e * 100 + i) * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df(0), "q", 0L, 8))
    assert(t.compact(spark, 8) === 0L)
    assert(t.commitEpoch(df(1), "q", 1L, 8))
    assert(t.compact(spark, 8) === 1L) // incremental: 2 runs, 1 bucket
    assert(t.effectiveFiles.groupBy(_.partitionId).values.map(_.size).max === 2)
    // total files (2) <= numBuckets (8): a total-count notion of
    // "clustered" would no-op here and stack runs forever
    assert(t.compact(spark, 8, full = true) === 2L)
    assert(t.effectiveFiles.groupBy(_.partitionId).values.forall(_.size == 1))
    assert(t.read(spark).count() === 40L)
    assert(t.compact(spark, 8, full = true) === -1L) // now truly clustered
  }

  test("crash recovery: a fold that claimed its files but died before the " +
    "manifest is invisible, orphan-protected, and redone by the retry") {
    import spark.implicits._
    val t = mkTable(tmpDir("ci-crash"), epochs = 2)
    assert(t.compact(spark, 2) === 0L)
    val df = Seq(("conv-ccc", 44444, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 5L, 2))
    val want = contents(t)
    // run the fold, then simulate the crash: the gen-1 manifest vanishes
    // while its claimed part-c0001 files stay on disk
    assert(t.compact(spark, 2) === 1L)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t.root, "metadata", "compact-000001.json"))
    assert(contents(t) === want) // readers fall back to gen 0 + epoch 5
    // orphan cleanup must NOT reclaim the claimed-but-unmanifested files:
    // their gen is above the committed high-water mark (the crash window)
    assert(t.removeOrphans().forall(p => !p.contains("part-c0001")))
    // the retry reuses the same gen id, re-claims byte-identically
    // (claimFrom tolerates the leftover files) and lands the manifest
    assert(t.compact(spark, 2) === 1L)
    assert(contents(t) === want)
    assert(t.compactions.map(_.gen) === Seq(0L, 1L))
  }

  test("model check: random append/delete/compact sequences keep content " +
    "exactly equal to a set model (3 seeds x 12 steps)") {
    import spark.implicits._
    Seq(1, 2, 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val t = new IcebergLite(tmpDir(s"ci-model-$seed"))
      t.create("conv_id string, turn_idx int, ts timestamp", 4)
      var model = Set.empty[(String, Int)]
      var nextEpoch = 0L
      var nextKey = 0
      (0 until 12).foreach { step =>
        rnd.nextInt(4) match {
          case 0 | 1 => // append 1-30 rows, keys globally unique
            val n = 1 + rnd.nextInt(30)
            val rows = (0 until n).map { _ =>
              val k = nextKey; nextKey += 1
              (f"conv-${k % 7}%03d", k)
            }
            val df = rows.map { case (c, k) =>
              (c, k, new Timestamp((1767225600L + k) * 1000L)) }
              .toDF("conv_id", "turn_idx", "ts")
            assert(t.commitEpoch(df, "q", nextEpoch, 4)); nextEpoch += 1
            model ++= rows
          case 2 => // delete a turn_idx range (possibly matching nothing)
            val lo = rnd.nextInt(math.max(nextKey, 1))
            val hi = lo + rnd.nextInt(20)
            t.deleteWhere(spark, col("turn_idx") >= lo && col("turn_idx") <= hi,
              s"turn_idx in [$lo, $hi]")
            model = model.filterNot { case (_, k) => k >= lo && k <= hi }
          case 3 => // fold — incremental or full, whatever the dice say
            t.compact(spark, 4, full = rnd.nextBoolean())
        }
        if (t.effectiveFiles.isEmpty) assert(model.isEmpty)
        else {
          val got = t.read(spark).select("conv_id", "turn_idx").collect()
            .map(r => (r.getString(0), r.getInt(1))).toSet
          assert(got === model, s"seed $seed step $step diverged")
        }
      }
    }
  }

  test("model check 2 (full mutation mix): random append / cow-delete / " +
    "MOR-delete / UPDATE / MERGE / compact / gc / tag / expiry sequences " +
    "keep content — live AND every tagged view — exactly equal to a map " +
    "model (3 seeds x 14 steps)") {
    import spark.implicits._
    // soak knobs: GRAFT_MODEL_SEEDS=n widens the seed sweep,
    // GRAFT_MODEL_STEPS=k deepens each sequence (CI default stays small)
    val seeds = sys.env.get("GRAFT_MODEL_SEEDS").map(_.toInt)
      .map(n => (11 until 11 + n).toSeq).getOrElse(Seq(11, 12, 13))
    val steps = sys.env.get("GRAFT_MODEL_STEPS").map(_.toInt).getOrElse(14)
    seeds.foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val t = new IcebergLite(tmpDir(s"ci-model2-$seed"))
      t.create("conv_id string, turn_idx int, text string, ts timestamp", 4)
      // model: key -> text (UPDATE/MERGE mutate values, so a set of keys
      // is not enough — a resurrected PRE-update row would slip a set)
      var model = Map.empty[(String, Int), String]
      var nextEpoch = 0L
      var nextKey = 0
      // per-epoch snapshots of the model: versionAtEpoch(e) serves "the
      // state when e was freshly committed", which is what a tagged view
      // must keep reconstructing bit-exactly through gc/expiry/compaction
      var epochModel = Map.empty[Long, Map[(String, Int), String]]
      var liveTags = Vector.empty[(String, Long)]
      def df(rows: Seq[((String, Int), String)]) =
        rows.map { case ((c, k), tx) =>
          (c, k, tx, new Timestamp((1767225600L + k) * 1000L))
        }.toDF("conv_id", "turn_idx", "text", "ts")
      (0 until steps).foreach { step =>
        rnd.nextInt(13) match {
          case 0 | 1 => // append 1-30 rows, keys globally unique
            val rows = (0 until 1 + rnd.nextInt(30)).map { _ =>
              val k = nextKey; nextKey += 1
              ((f"conv-${k % 7}%03d", k), s"t$k")
            }
            assert(t.commitEpoch(df(rows), "q", nextEpoch, 4))
            model ++= rows
            epochModel += (nextEpoch -> model); nextEpoch += 1
          case 2 => // copy-on-write delete of a turn range
            val lo = rnd.nextInt(math.max(nextKey, 1)); val hi = lo + rnd.nextInt(20)
            t.deleteWhere(spark, col("turn_idx").between(lo, hi), s"cow [$lo,$hi]")
            model = model.filterNot { case ((_, k), _) => k >= lo && k <= hi }
          case 3 => // merge-on-read delete (hybrid vectors/rewrites/drops)
            val lo = rnd.nextInt(math.max(nextKey, 1)); val hi = lo + rnd.nextInt(20)
            t.deleteWhereMor(spark, col("turn_idx").between(lo, hi), s"mor [$lo,$hi]")
            model = model.filterNot { case ((_, k), _) => k >= lo && k <= hi }
          case 4 => // UPDATE a turn range's text
            val lo = rnd.nextInt(math.max(nextKey, 1)); val hi = lo + rnd.nextInt(15)
            t.updateWhere(spark, col("turn_idx").between(lo, hi),
              Seq("text" -> concat(col("text"), lit("!"))), s"upd [$lo,$hi]")
            model = model.map { case (key @ (_, k), tx) =>
              key -> (if (k >= lo && k <= hi) tx + "!" else tx) }
          case 5 => // MERGE: rewrite some existing keys' text + insert new ones
            val existing = model.keys.toSeq.sorted
              .take(1 + rnd.nextInt(8)).map(k => (k, s"m${k._2}"))
            val inserts = (0 until rnd.nextInt(5)).map { _ =>
              val k = nextKey; nextKey += 1
              ((f"conv-${k % 7}%03d", k), s"i$k")
            }
            val feed = existing ++ inserts
            if (feed.nonEmpty) {
              val st = t.merge(spark, df(feed), s"mdl-$seed-$step",
                Some(MergeUpdateAll), insertNotMatched = true)
              // MergeUpdateAll also rewrites ts, but ts is a pure function
              // of the key in this model, so text captures the state
              model ++= feed
              // the merge allocates its own insert epoch — advance the
              // append counter past it or the next append would collide;
              // its fresh-commit state includes the merge's rewrites
              // (one atomic gen), so snapshot AFTER applying the feed
              st.insertEpoch.foreach { e =>
                nextEpoch = math.max(nextEpoch, e + 1)
                epochModel += (e -> model)
              }
            }
          case 6 => // fold — incremental or full
            t.compact(spark, 4, full = rnd.nextBoolean())
          case 7 => // reclaim superseded files — must be content-neutral
            t.gc(); t.removeOrphans()
          case 8 => // restore to the CURRENT version — a no-op by contract
            t.restore(spark, t.currentVersion)
          case 9 => // tag the latest epoch (cap 3 live tags: drop oldest)
            val snaps = t.snapshots
            if (snaps.nonEmpty) {
              if (liveTags.size >= 3) {
                t.dropTag(liveTags.head._1)
                liveTags = liveTags.tail
              }
              val e = snaps.last.epochId
              val name = s"tag$step"
              if (!liveTags.exists(_._2 == e)) {
                // the engine REFUSES a tag whose pinned view gc already
                // made irreproducible (a tag pins future reclamation,
                // it cannot undo the past) — ONLY that refusal is legal;
                // any other failure must surface
                try { t.tag(name, e); liveTags :+= (name, e) }
                catch {
                  case ex: IllegalStateException =>
                    assert(ex.getMessage.contains("cannot tag epoch"),
                      s"unexpected tag failure: ${ex.getMessage}")
                }
              }
            }
          case 10 => // retire settled manifests — content-neutral, tag-safe
            t.expireMetadata(retainLast = 2)
          case 11 => // restore to a random LIVE TAG — content rolls back
            if (liveTags.nonEmpty) {
              val (_, e) = liveTags(rnd.nextInt(liveTags.size))
              t.restore(spark, t.versionAtEpoch(e))
              model = epochModel(e)
            }
          case 12 => // single-epoch branch WAP: stage, then publish or drop
            val rows = (0 until 1 + rnd.nextInt(10)).map { _ =>
              val k = nextKey; nextKey += 1
              ((f"conv-${k % 7}%03d", k), s"b$k")
            }
            val name = s"br$step"
            t.createBranch(name)
            val e = nextEpoch; nextEpoch += 1
            t.stageEpochOnBranch(df(rows), s"br-$seed-$step", e, 4, name)
            if (rnd.nextBoolean()) {
              t.fastForward(name)
              model ++= rows
              epochModel += (e -> model)
            } else {
              t.dropBranch(name)
              // the drop frees the id (engine allocation would reuse it);
              // keep the test counter dense to match
              nextEpoch -= 1
            }
        }
        if (t.effectiveFiles.isEmpty) assert(model.isEmpty)
        else {
          val got = t.read(spark).select("conv_id", "turn_idx", "text")
            .collect().map(r => ((r.getString(0), r.getInt(1)), r.getString(2)))
            .toMap
          assert(got === model, s"seed $seed step $step diverged")
        }
        // every tagged view must keep reconstructing bit-exactly through
        // whatever gc/expiry/compaction/mutations happened since — the
        // tag retention contract. (The latest epoch's AS OF is the live
        // view by documented fast path, so compare it to the live model.)
        val latestEpoch = t.snapshots.lastOption.map(_.epochId)
        liveTags.foreach { case (name, e) =>
          val want = if (latestEpoch.contains(e)) model else epochModel(e)
          val got = t.readAsOf(spark, e).select("conv_id", "turn_idx", "text")
            .collect().map(r => ((r.getString(0), r.getInt(1)), r.getString(2)))
            .toMap
          assert(got === want,
            s"seed $seed step $step: tagged view '$name' (epoch $e) diverged")
        }
      }
    }
  }

  test("time travel to a pre-compaction epoch is unaffected by incremental " +
    "passes (raw files pinned by the tag)") {
    val t = mkTable(tmpDir("ci-tt"), epochs = 2)
    t.tag("early", 0L)
    val want0 = t.fileSetsAsOf(0L).flatMap(_.files).map(_.rowCount).sum
    assert(t.compact(spark, 2) === 0L)
    import spark.implicits._
    val df = Seq(("conv-ttt", 55555, new Timestamp(1767260000L * 1000L)))
      .toDF("conv_id", "turn_idx", "ts")
    assert(t.commitEpoch(df, "q", 6L, 2))
    assert(t.compact(spark, 2) === 1L) // incremental
    t.gc()
    assert(t.fileSetsAsOf(0L).flatMap(_.files).map(_.rowCount).sum === want0)
  }
}
