package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.gen.Fixtures
import graft.operators.{DocumentOps, TranscriptOps}
import graft.ops.{Dedup, Similarity}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Transcript queries run over the deterministic synthetic transcripts table
  * (BASELINE.json `input_hint`), materialized under /root/repo/data by
  * [[Fixtures]]; the DuckDB oracle reads the identical parquet files via
  * `read_parquet(...)`. Document queries run over the driver-provided
  * `documents` table in the sf directory.
  */
object SparkEntry {

  /** Flagship: full base redaction over sf0.001 transcripts. */
  def entry(spark: SparkSession): DataFrame =
    TranscriptOps.redactBase(Fixtures.transcripts(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_redact" -> ((s, dir) =>
      TranscriptOps.redactBase(Fixtures.transcripts(s, dir))),
    "q2_detect" -> ((s, dir) =>
      TranscriptOps.detectRecurring(Fixtures.transcripts(s, dir))),
    "q3_window_stats" -> ((s, dir) =>
      TranscriptOps.windowStats(Fixtures.transcripts(s, dir))),
    "q4_join_pairs" -> ((s, dir) =>
      TranscriptOps.joinPairs(Fixtures.transcripts(s, dir))),
    "q5_session_stats" -> ((s, dir) =>
      TranscriptOps.sessionStats(Fixtures.transcripts(s, dir))),
    "q6_skew_agg" -> ((s, dir) =>
      TranscriptOps.skewAgg(Fixtures.transcriptsSkew(s, dir))),
    "q7_dedup_exact" -> ((s, dir) =>
      TranscriptOps.dedupExact(Fixtures.transcripts(s, dir))),
    "q8_token_count" -> ((s, dir) =>
      DocumentOps.tokenCount(Fixtures.documents(s, dir))),
    "q9_quality" -> ((s, dir) =>
      DocumentOps.quality(Fixtures.documents(s, dir))),
    "q10_lang_id" -> ((s, dir) =>
      DocumentOps.langId(Fixtures.documents(s, dir))),
    "q11_jaccard_pairs" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Fixtures.docs(s, dir))),
    "q12_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashLshPairs(Fixtures.docs(s, dir))),
    "q13_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Fixtures.docs(s, dir))),
    // gate-of-record is the collect-free LSH plan (bucketed candidates +
    // exact integer verification — the 100-TB path); embedDupPairs stays as
    // the test-only all-pairs baseline (DedupSpec proves LSH == exact)
    "q14_embed_dup" -> ((s, dir) =>
      Similarity.embedDupLsh(Fixtures.embs(s, dir))),
    "q15_ann_topk" -> ((s, dir) =>
      Similarity.annTopK(Fixtures.embeddings(s, dir), "vec_id", "embedding")),
    "q16_docs_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(Fixtures.docs(s, dir))),
    "q18_point_lookup" -> ((s, dir) =>
      TranscriptOps.conversation(Fixtures.transcripts(s, dir), "conv-000042")),
    "q19_sliding_stats" -> ((s, dir) =>
      TranscriptOps.slidingWindowStats(Fixtures.transcripts(s, dir))),
    "q20_session_bounds" -> ((s, dir) =>
      TranscriptOps.sessionBounds(Fixtures.transcripts(s, dir))),
    "q21_dead_letter" -> ((s, dir) =>
      graft.operators.Validation.deadLetterTop10(Fixtures.transcripts(s, dir))),
    "q22_shingle_detect" -> ((s, dir) =>
      TranscriptOps.detectRecurringShingles(Fixtures.transcripts(s, dir))),
    // 2.8d gate: micro-batch watermark lateness over the arrival-order
    // fixture (planted out-of-order rows) — the batch-exact analogue of the
    // streaming watermark drop tested in MetricsSpec
    "q23_late_data" -> ((s, dir) =>
      TranscriptOps.lateArrivals(Fixtures.transcriptsLate(s, dir))),
    // 2.7/2.8e gate: the CMS as a first-class SQL aggregate — update, merge,
    // serialize and estimate are all on the oracle-checked path (estimates
    // are exact below the sketch's key-tracking cap; see cmsTokenProfile)
    "q24_cms_profile" -> ((s, dir) =>
      TranscriptOps.cmsTokenProfile(Fixtures.transcripts(s, dir))),
    "q17_media_stats" -> ((s, dir) => {
      import graft.ops.MultiModal
      val media = Fixtures.media(s, dir)
      implicit val enc = org.apache.spark.sql.Encoders.product[MultiModal.MediaRow]
      MultiModal.kindStats(MultiModal.extractFeatures(media.as[MultiModal.MediaRow]))
        .select("kind", "n_items", "total_bytes")
    }),
    // real-format gate: PNG/BMP/WAV header fields parsed from the container
    // bytes on the Spark side, re-derived by the oracle slicing hex(payload)
    // at the published layouts' offsets (round-4 VERDICT #8)
    "q25_media_headers" -> ((s, dir) => {
      import graft.ops.MultiModal
      val media = Fixtures.media(s, dir)
      implicit val enc = org.apache.spark.sql.Encoders.product[MultiModal.MediaRow]
      MultiModal.headerStats(media.as[MultiModal.MediaRow])
    }),
    // catalog gate: the full user-facing surface — SQL DDL, writeTo(...)
    // .append(), spark.table — against the DuckDB oracle reading the SAME
    // fixture rows directly. Proves the catalog+write+read round-trip is
    // content-identical, not just runnable (round-5; catalog shipped this
    // round). Each call rebuilds the table (DROP + CREATE + INSERT) so a
    // stale warehouse can never serve old fixture bytes.
    "q26_catalog_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.tx")
      s.sql(
        """CREATE TABLE graft.gate.tx (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.tx")
        .option("epoch", "0").option("queryId", "gate").append()
      s.table("graft.gate.tx")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // schema-evolution gate: half the fixture is committed BEFORE
    // `ALTER TABLE ADD COLUMN tool` (under a 5-column schema), half after
    // (carrying tool values). The read must serve the evolved schema with
    // NULLs for pre-evolution rows — proven content-identical to the oracle
    // recomputing the same split from the fixture parquet (round-5;
    // add-only evolution shipped this round).
    "q27_schema_evolution" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.evo")
      s.sql(
        """CREATE TABLE graft.gate.evo (
          |  conv_id STRING, turn_idx INT, role STRING, text STRING,
          |  ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.filter(col("turn_idx") % 2 === 0)
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .writeTo("graft.gate.evo")
        .option("epoch", "0").option("queryId", "gate").append()
      s.sql("ALTER TABLE graft.gate.evo ADD COLUMN tool STRING")
      tx.filter(col("turn_idx") % 2 === 1)
        .select("conv_id", "turn_idx", "role", "text", "ts", "tool")
        .writeTo("graft.gate.evo")
        .option("epoch", "1").option("queryId", "gate").append()
      s.table("graft.gate.evo")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // rate-limited backfill gate: the fixture is committed as 4 source
    // epochs (sliced by turn_idx % 4); a maxEpochsPerTrigger=1
    // Trigger.AvailableNow stream must drain them in exactly 4
    // micro-batches — epoch k delivered in batch k, exactly once, each
    // batch committed to the sink stamped with its batch id. The oracle
    // recomputes the slice rule directly from the fixture, so any
    // admission-control bug (epoch split across batches, skipped, or
    // double-delivered) is a content mismatch, not just a count drift
    // (round-5; backfill admission control shipped this round).
    "q28_rate_limited_backfill" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "text", "ts")
      val base = java.nio.file.Files
        .createTempDirectory("graft-gate-rate").toString
      val src = new graft.table.IcebergLite(s"$base/src")
      src.create(
        "conv_id string, turn_idx int, role string, text string, ts timestamp", 4)
      (0 until 4).foreach { ep =>
        src.commitEpoch(tx.filter(col("turn_idx") % 4 === ep), "gate", ep.toLong, 4)
      }
      val sink = new graft.table.IcebergLite(s"$base/sink")
      sink.create("conv_id string, turn_idx int, role string, text string, " +
        "ts timestamp, batch_id int", 4)
      val q = s.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", s"$base/src")
        .option("maxEpochsPerTrigger", "1").load()
        .select("conv_id", "turn_idx", "role", "text", "ts")
        .writeStream.option("checkpointLocation", s"$base/cp")
        .foreachBatch { (df: DataFrame, id: Long) =>
          sink.commitEpoch(df.withColumn("batch_id", lit(id.toInt)),
            "gate-sink", id, 4)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      sink.read(s).select(col("conv_id"), col("turn_idx"), col("role"),
        col("text"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("batch_id"))
    }),
    // row-level-delete gate: the fixture lands in two epochs, then three
    // SQL DELETEs run through the catalog — an equality delete spanning
    // every bucket, a conv_id purge (manifest bucket-pruned rewrite), and
    // a ts-range + role compound (manifest ts-pruned). The surviving table
    // must be content-identical to the oracle applying the same three
    // predicates — a row eaten or leaked by the copy-on-write rewrite is
    // a hash mismatch (round-5; DELETE FROM shipped this round).
    "q29_delete" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.del")
      s.sql(
        """CREATE TABLE graft.gate.del (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.del")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      s.sql("DELETE FROM graft.gate.del WHERE role = 'tool'")
      s.sql("DELETE FROM graft.gate.del WHERE conv_id = 'conv-000000'")
      s.sql("DELETE FROM graft.gate.del WHERE " +
        "ts < TIMESTAMP '2026-01-01 00:20:00' AND role = 'system'")
      s.table("graft.gate.del")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // storage-partitioned-read gate (round-5): the fixture goes through a
    // catalog table bucketed to the session's core count, so the scan takes
    // the KEY-GROUPED path (buckets >= defaultParallelism → grouping on by
    // default); the per-conv aggregate then plans with no Exchange and the
    // enrich-join consumes it. Content must match the oracle recomputing
    // the same enrichment from the raw fixture — proving the grouped scan
    // serves exactly the table's rows (plan-shape assertions live in
    // StoragePartitionSpec).
    "q30_spj_enrich" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.spj")
      val buckets = s.sparkContext.defaultParallelism
      s.sql(
        s"""CREATE TABLE graft.gate.spj (
           |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
           |  text STRING, ts TIMESTAMP)
           |TBLPROPERTIES ('buckets'='$buckets')""".stripMargin)
      tx.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.spj")
        .option("epoch", "0").option("queryId", "gate").append()
      val t = s.table("graft.gate.spj")
      val convStats = t.groupBy("conv_id").agg(
        count(lit(1)).as("n_turns"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("first_ts_s"))
      t.select("conv_id", "turn_idx", "role").join(convStats, "conv_id")
        .select(col("conv_id"), col("turn_idx"), col("role"),
          col("n_turns"), col("first_ts_s"))
    }),
    // SQL UPDATE gate (round-5): row-level copy-on-write UPDATE through
    // the GraftExtensions post-hoc rule (UpdateTable → engine updateWhere,
    // manifest-pruned). The rule lives in session extensions, which bind at
    // session build — so the gate derives a sibling session on the SAME
    // SparkContext with the extensions + catalog configured, and restores
    // the global default/active sessions immediately. The oracle recomputes
    // the post-update table from the raw fixture with CASE WHEN — a row the
    // rewrite missed, double-applied, dropped or reordered into a different
    // file is a content mismatch.
    "q31_update" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val s2 = graft.catalog.GraftSessions.withExtensions(
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      val tx = Fixtures.transcripts(s2, dir)
      s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s2.sql("DROP TABLE IF EXISTS graft.gate.upd")
      s2.sql(
        """CREATE TABLE graft.gate.upd (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.upd")
        .option("epoch", "0").option("queryId", "gate").append()
      s2.sql(
        """UPDATE graft.gate.upd
          |SET tool = upper(coalesce(tool, 'none')),
          |    text = concat(text, ' [v2]')
          |WHERE role = 'tool' AND ts < TIMESTAMP '2026-01-01 00:30:00'""".stripMargin)
      s2.table("graft.gate.upd")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // SQL MERGE INTO gate (round-5): upsert through the GraftExtensions
    // rule — matched rows rewritten copy-on-write with the feed's values,
    // not-matched feed rows committed as a pending-activation insert epoch,
    // both made visible by ONE atomic manifest. The feed is derived
    // deterministically from the fixture so the DuckDB oracle can replay
    // the merge as CASE WHEN + UNION ALL; a torn merge (updates without
    // inserts or vice versa), a double-applied update or a lost insert is
    // a content mismatch.
    "q32_merge" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val s2 = graft.catalog.GraftSessions.withExtensions(
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      val tx = Fixtures.transcripts(s2, dir)
      s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s2.sql("DROP TABLE IF EXISTS graft.gate.mrg")
      s2.sql(
        """CREATE TABLE graft.gate.mrg (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.mrg")
        .option("epoch", "0").option("queryId", "gate").append()
      // correction feed: fix turn 0 of the first 50 convs, append a
      // renumbered copy of turn 1 for the first 20 convs
      val updates = tx
        .filter(col("conv_id") < "conv-000050" && col("turn_idx") === 0)
        .select(col("conv_id"), col("turn_idx"), lit("merged").as("role"),
          col("tool"), concat(col("text"), lit(" [m]")).as("text"), col("ts"))
      val inserts = tx
        .filter(col("conv_id") < "conv-000020" && col("turn_idx") === 1)
        .select(col("conv_id"), (col("turn_idx") + 1000).as("turn_idx"),
          col("role"), col("tool"), col("text"), col("ts"))
      updates.unionAll(inserts).createOrReplaceTempView("gate_merge_feed")
      s2.sql(
        """MERGE INTO graft.gate.mrg t USING gate_merge_feed s
          |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
          |WHEN MATCHED THEN UPDATE SET role = s.role, text = s.text
          |WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, tool, text, ts)
          |  VALUES (s.conv_id, s.turn_idx, s.role, s.tool, s.text, s.ts)""".stripMargin)
      s2.table("graft.gate.mrg")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // CDC gate (round-5): the change feed between "the state when epoch 1
    // was freshly committed" and the live view, after a DELETE, an UPDATE
    // and an appended epoch. The diff is manifest-first (untouched files
    // never scanned) and reconciled by a full-outer key join, so a
    // surviving row leaking into the feed, a lost delete, or an unpaired
    // update image is a content mismatch against the oracle recomputing
    // the three change sets relationally from the raw fixture.
    "q33_changes" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val s2 = graft.catalog.GraftSessions.withExtensions(
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      val tx = Fixtures.transcripts(s2, dir)
      s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s2.sql("DROP TABLE IF EXISTS graft.gate.chg")
      s2.sql(
        """CREATE TABLE graft.gate.chg (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.chg")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      s2.sql("DELETE FROM graft.gate.chg WHERE role = 'tool'")
      s2.sql(
        """UPDATE graft.gate.chg SET text = concat(text, ' [u]')
          |WHERE conv_id < 'conv-000010' AND role = 'user'""".stripMargin)
      tx.filter(col("conv_id") < "conv-000005" && col("turn_idx") === 0)
        .select(col("conv_id"), (col("turn_idx") + 5000).as("turn_idx"),
          col("role"), col("tool"), col("text"), col("ts"))
        .writeTo("graft.gate.chg")
        .option("epoch", "2").option("queryId", "gate").append()
      val wh = s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}"
      graft.table.TableChanges.since(s2, s"$wh/gate/chg", fromEpoch = 1L)
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col(graft.table.TableChanges.ChangeTypeCol))
    }),
    // native-streaming-write gate (round-5): the fixture flows source table
    // → incremental connector stream → writeStream.toTable — the DSv2
    // StreamingWrite path (Spark-arranged bucket clustering, task-side
    // staged files, metadata-only driver commit) — and the landed table
    // must be content-identical to the fixture under the DuckDB oracle,
    // with lineage epoch ids equal to the micro-batch ids.
    "q35_stream_write" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
      val base = java.nio.file.Files
        .createTempDirectory("graft-gate-swrite").toString
      val src = new graft.table.IcebergLite(s"$base/src")
      src.create("conv_id string, turn_idx int, role string, tool string, " +
        "text string, ts timestamp", 8)
      (0 until 2).foreach { ep =>
        src.commitEpoch(tx.filter(col("turn_idx") % 2 === ep), "gate",
          ep.toLong, 8)
      }
      val dest = new graft.table.IcebergLite(s"$base/dest")
      dest.create("conv_id string, turn_idx int, role string, tool string, " +
        "text string, ts timestamp", 8)
      val q = s.readStream.format("graft.sources.IcebergLiteSource")
        .option("path", s"$base/src")
        .option("maxEpochsPerTrigger", "1").load()
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeStream.format("graft.sources.IcebergLiteSource")
        .option("path", s"$base/dest")
        .option("checkpointLocation", s"$base/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      dest.read(s).select(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("text"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        // source epoch k (the turn_idx % 2 slice) must land as batch k —
        // recomputable from the fixture alone
        col("epoch_id").cast("int").as("batch_id"))
    }),
    // time-travel gate (round-5): VERSION AS OF through a NAMED TAG, read
    // after a later epoch AND a later DELETE landed — the historical view
    // must serve exactly the epoch-0 slice, proving the pinned read ignores
    // both newer appends and newer mutations (deletes are not retroactive
    // on history). The oracle recomputes the slice from the raw fixture.
    "q34_time_travel" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      val wh = s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}"
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.tt")
      s.sql(
        """CREATE TABLE graft.gate.tt (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.tt")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      s.sql("CALL graft.system.tag('gate.tt', 'epoch0', 0)")
      s.sql("DELETE FROM graft.gate.tt WHERE role = 'user'")
      s.sql("SELECT * FROM graft.gate.tt VERSION AS OF 'epoch0'")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // recorded-change-feed gate (round-5): the PER-COMMIT feed
    // (`graft.db.t.changes` — change rows recorded at mutation commit time,
    // served as pure file scans), distinct from q33's net-diff
    // reconstruction. The per-commit semantics are load-bearing here:
    // deleted rows still appear as the inserts that first carried them
    // (apply-in-order reproduces every intermediate state), and every row
    // stamps exactly one of (_commit_epoch, _commit_gen). The oracle
    // recomputes all four change sets relationally from the raw fixture —
    // epoch stamp = the slice rule, gen stamps = the mutation order.
    "q36_change_feed" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val s2 = graft.catalog.GraftSessions.withExtensions(
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      val tx = Fixtures.transcripts(s2, dir)
      s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s2.sql("DROP TABLE IF EXISTS graft.gate.cfd")
      s2.sql(
        """CREATE TABLE graft.gate.cfd (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.cfd")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      s2.sql("DELETE FROM graft.gate.cfd WHERE role = 'tool'")          // gen 1
      s2.sql(
        """UPDATE graft.gate.cfd SET text = concat(text, ' [u2]')
          |WHERE conv_id < 'conv-000010' AND role = 'user'""".stripMargin) // gen 2
      s2.table("graft.gate.cfd.changes")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col(graft.table.TableChanges.ChangeTypeCol),
          col(graft.sources.ChangeFeed.CommitEpochCol),
          col(graft.sources.ChangeFeed.CommitGenCol))
    }),
    // restore gate (round-5): Delta-RESTORE through CALL
    // graft.system.restore — the table is mutated (DELETE, gen 1) and
    // extended (epoch 2), rolled back to the state of epoch 1's commit
    // (metadata-only: the raw files become the live view again), then
    // appended to again (epoch 3 — counters never regress). The result is
    // the LIVE table plus the restore gen's RECORDED change feed
    // (_commit_gen = 2): 'insert' rows are the un-deleted tool turns with
    // their original content, 'delete' rows are the un-appended epoch-2
    // slice. The oracle recomputes both parts relationally from the raw
    // fixture, so a restore that leaked the delete, kept epoch 2, or
    // mis-recorded its CDC rows is a content mismatch.
    "q37_restore" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.rst")
      s.sql(
        """CREATE TABLE graft.gate.rst (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.rst")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      s.sql("DELETE FROM graft.gate.rst WHERE role = 'tool'")      // gen 1
      tx.filter(col("conv_id") < "conv-000005")                    // epoch 2 —
        .withColumn("turn_idx", col("turn_idx") + lit(9000))       // un-appended
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts") // by the
        .writeTo("graft.gate.rst")                                 // restore
        .option("epoch", "2").option("queryId", "gate").append()
      s.sql("CALL graft.system.restore('gate.rst', '1')")          // gen 2
      tx.filter(col("conv_id") < "conv-000003")                    // epoch 3:
        .withColumn("turn_idx", col("turn_idx") + lit(7000))       // life goes on
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.rst")
        .option("epoch", "3").option("queryId", "gate").append()
      val cols = Seq(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("text"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      s.table("graft.gate.rst").select(cols: _*)
        .withColumn(graft.table.TableChanges.ChangeTypeCol, lit("live"))
        .unionByName(
          s.table("graft.gate.rst.changes")
            .filter(col(graft.sources.ChangeFeed.CommitGenCol) === 2L)
            .select(cols :+ col(graft.table.TableChanges.ChangeTypeCol): _*))
    }),
    // write-audit-publish gate (round-5): a staged epoch must be invisible
    // ('pre' view), one CALL publish_staged must make exactly its rows
    // visible ('post' view), and a discarded stage must leave no trace
    // ('final' view == 'post'). The oracle recomputes all three views from
    // the raw fixture, so a stage that leaked before publish, a publish
    // that lost/duplicated rows, or a discard that touched visible history
    // is a content mismatch.
    "q38_wap" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.wap")
      s.sql(
        """CREATE TABLE graft.gate.wap (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.filter(col("turn_idx") % 2 === 0)
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.wap")
        .option("epoch", "0").option("queryId", "gate").append()
      tx.filter(col("turn_idx") % 2 === 1)                     // staged,
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.wap")                             // invisible
        .option("epoch", "1").option("queryId", "gate-audit")
        .option("staged", "true").append()
      val cols = Seq(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("text"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      def view(part: String) =
        s.table("graft.gate.wap").select(cols: _*)
          .withColumn("part", lit(part))
      // the pre/post views must be PINNED at their moment (the table
      // mutates between them) — scratch parquet, not .cache(): a cached
      // DSv2 view is not reliably substituted when the final union plan
      // re-analyzes, and a re-executed 'pre' would silently read the
      // post-publish table
      val scratch = s"/tmp/graft-gate-wap-${new java.io.File(dir).getName}"
      view("pre").write.mode("overwrite").parquet(s"$scratch/pre")
      s.sql("CALL graft.system.publish_staged('gate.wap', 1)")
      view("post").write.mode("overwrite").parquet(s"$scratch/post")
      tx.filter(col("conv_id") < "conv-000002")                // a rejected
        .withColumn("turn_idx", col("turn_idx") + lit(9000))   // audit
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.wap")
        .option("epoch", "2").option("queryId", "gate-audit2")
        .option("staged", "true").append()
      // the SQL audit surface: `<table>.staged` must serve exactly the
      // un-published rows, stamped with their stage identity — pinned
      // before the discard (same re-execution hazard as 'pre'/'post')
      s.table("graft.gate.wap.staged")
        .filter(col(graft.sources.StagedTable.StagedEpochCol) === 2L)
        .select(cols: _*).withColumn("part", lit("audit"))
        .write.mode("overwrite").parquet(s"$scratch/audit")
      s.sql("CALL graft.system.discard_staged('gate.wap', 2)")
      s.read.parquet(s"$scratch/pre")
        .unionByName(s.read.parquet(s"$scratch/post"))
        .unionByName(s.read.parquet(s"$scratch/audit"))
        .unionByName(view("final"))
        // post-discard the staged view must be EMPTY: any surviving row
        // surfaces as an un-matched 'gone' row (the oracle has none)
        .unionByName(s.table("graft.gate.wap.staged")
          .select(cols: _*).withColumn("part", lit("gone")))
    }),
    // metadata-table gate (round-5): `.history` and `.files` must agree
    // with the raw fixture — per-epoch append row counts off the commit
    // log, and the live listing's manifest stats (row counts + exact
    // parquet-footer ts ranges) summing to the post-DELETE table. A stale
    // listing (delete not applied), a wrong rewrite row count, or sloppy
    // recomputed ts stats is a value mismatch.
    "q39_meta" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.meta")
      s.sql(
        """CREATE TABLE graft.gate.meta (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { e =>
        tx.filter(col("turn_idx") % 2 === e)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.meta")
          .option("epoch", e.toString).option("queryId", "gate").append()
      }
      s.sql("DELETE FROM graft.gate.meta WHERE role = 'tool'")
      val hist = s.table("graft.gate.meta.history")
        .filter(col("kind") === "append")
        .select(concat(lit("epoch_"), col("epoch_id").cast("string")).as("key"),
          col("num_rows").as("val"))
      val stats = s.table("graft.gate.meta.files")
        .agg(sum("row_count").as("live_rows"),
          unix_micros(min(col("min_ts"))).as("live_min_us"),
          unix_micros(max(col("max_ts"))).as("live_max_us"))
        .selectExpr("stack(3, 'live_rows', live_rows, " +
          "'live_min_us', live_min_us, 'live_max_us', live_max_us) AS (key, val)")
      hist.unionByName(stats)
    }),
    // compaction gate (round-5): the INCREMENTAL fold — prior generation
    // reused verbatim, a DELETE's survivors folded, only the new epoch
    // rewritten — must serve content identical to the raw fixture's
    // post-DELETE state ('inc' view, pinned before the full pass), and the
    // periodic full re-cluster must serve the same rows again ('full'
    // view). A reuse split that drops/duplicates rows, mis-attributes a
    // delete survivor, or a full pass that loses content is a mismatch.
    "q40_compact" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.cmp")
      s.sql(
        """CREATE TABLE graft.gate.cmp (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { e =>
        tx.filter(col("turn_idx") % 2 === e)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.cmp")
          .option("epoch", e.toString).option("queryId", "gate").append()
      }
      s.sql("CALL graft.system.compact('gate.cmp')")        // gen 0: epochs 0+1
      tx.filter(col("turn_idx") % 2 === 0)                  // epoch 2, so the
        .withColumn("turn_idx", col("turn_idx") + lit(9000)) // fold has fresh
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts") // epochs
        .writeTo("graft.gate.cmp")
        .option("epoch", "2").option("queryId", "gate").append()
      s.sql("DELETE FROM graft.gate.cmp WHERE role = 'tool'") // touches BOTH
      s.sql("CALL graft.system.compact('gate.cmp')")        // gen 1: reuses
      val cols = Seq(col("conv_id"), col("turn_idx"), col("role"),  // gen 0's
        col("tool"), col("text"),                           // delete survivors
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      val scratch = s"/tmp/graft-gate-cmp-${new java.io.File(dir).getName}"
      s.table("graft.gate.cmp").select(cols: _*)
        .withColumn("part", lit("inc"))
        .write.mode("overwrite").parquet(s"$scratch/inc")   // pin pre-full
      s.sql("CALL graft.system.compact('gate.cmp', mode => 'full')")
      s.read.parquet(s"$scratch/inc")
        .unionByName(s.table("graft.gate.cmp").select(cols: _*)
          .withColumn("part", lit("full")))
    }),
    // scan-pruning gate (round-5): the three new read paths over one
    // connector-served table — (a) metadata-only aggregate pushdown
    // (COUNT/MIN/MAX answered from manifests, no data IO), (b) a pushed
    // conv-IN + turn_idx filter (manifest bucket/bounds pruning + parquet
    // row-group skipping, rows still residual-exact), (c) a conv_id
    // equi-join eligible for runtime file pruning. The DuckDB oracle
    // recomputes all five numbers from the raw fixture — a pruning level
    // that drops or double-serves a row is a content mismatch.
    "q41_scan_prune" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.prune")
      s.sql(
        """CREATE TABLE graft.gate.prune (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1, 2).foreach { e =>
        tx.filter(col("turn_idx") % 3 === e)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.prune")
          .option("epoch", e.toString).option("queryId", "gate").append()
      }
      val t = s.table("graft.gate.prune")
      val aggs = t.agg(count(lit(1)).as("v1"),
          unix_micros(min(col("ts"))).as("v2"),
          unix_micros(max(col("ts"))).as("v3"))
        .selectExpr("stack(3, 'agg_rows', v1, 'agg_min_us', v2, " +
          "'agg_max_us', v3) AS (key, val)")
      val slice = t.filter(col("conv_id")
          .isin("conv-000007", "conv-000042", "conv-000123") &&
          col("turn_idx") > 5)
        .agg(count(lit(1)).as("val"))
        .select(lit("slice_n").as("key"), col("val"))
      val dim = tx.filter(col("conv_id").startsWith("conv-0000"))
        .select("conv_id").distinct()
      val joined = t.join(dim, Seq("conv_id"))
        .agg(count(lit(1)).as("val"))
        .select(lit("join_n").as("key"), col("val"))
      aggs.unionByName(slice).unionByName(joined)
    }),
    // branch gate (round-5): the full branch lifecycle must be
    // content-exact — the 'pre' view (main while the branch holds the odd
    // rows, pinned before publication), the 'branch' audit view (main +
    // stages), and the 'post' view after ONE atomic fast_forward. A stage
    // that leaks into main, a branch view missing live rows, or a
    // fast-forward that loses/duplicates an epoch is a mismatch.
    "q42_branch" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.warehouse",
        s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}")
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.br")
      s.sql(
        """CREATE TABLE graft.gate.br (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.filter(col("turn_idx") % 2 === 0)
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.br")
        .option("epoch", "0").option("queryId", "gate").append()
      s.sql("CALL graft.system.create_branch('gate.br', 'audit')")
      // the odd rows land ON the branch, split over two staged epochs
      Seq((1, 3), (3, 4)).foreach { case (rem, modulus) =>
        tx.filter(col("turn_idx") % 2 === 1 &&
            col("turn_idx") % modulus === rem)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.br").option("branch", "audit")
          .option("queryId", "gate").append()
      }
      // (turn_idx%2==1) splits exactly into (%3==1) ∪ (%4==3)? No — pin
      // the slices the TWO stages actually carry; the oracle recomputes
      // the same two predicates, so coverage never needs to be a partition
      val cols = Seq(col("conv_id"), col("turn_idx"), col("role"),
        col("tool"), col("text"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      val scratch = s"/tmp/graft-gate-br-${new java.io.File(dir).getName}"
      s.table("graft.gate.br").select(cols: _*)
        .withColumn("part", lit("pre"))
        .write.mode("overwrite").parquet(s"$scratch/pre")
      s.read.option("branch", "audit").table("graft.gate.br")
        .select(cols: _*).withColumn("part", lit("branch"))
        .write.mode("overwrite").parquet(s"$scratch/branch")
      s.sql("CALL graft.system.fast_forward('gate.br', 'audit')")
      s.read.parquet(s"$scratch/pre")
        .unionByName(s.read.parquet(s"$scratch/branch"))
        .unionByName(s.table("graft.gate.br").select(cols: _*)
          .withColumn("part", lit("post")))
    }),
    // merge-on-read DELETE gate (round-5 session 6): three deleteWhereMor
    // commits — a per-file tiny slice (turn_idx = 3: one turn of every
    // conv, guaranteed under the DV fraction), a whole-conv purge, and a
    // compound slice — leave the original files in place with deletion
    // vectors attached (the hybrid may rewrite where fractions are large;
    // either way content must match). The result is read back through the
    // CATALOG connector, so the row-mode vector-skip reader is what the
    // oracle checks; the engine read path is covered by DvDeleteSpec.
    "q43_mor_delete" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val tx = Fixtures.transcripts(s, dir)
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      val wh = s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}"
      s.conf.set("spark.sql.catalog.graft.warehouse", wh)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s.sql("DROP TABLE IF EXISTS graft.gate.mor")
      s.sql(
        """CREATE TABLE graft.gate.mor (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      Seq(0, 1).foreach { ep =>
        tx.filter(col("turn_idx") % 2 === ep)
          .select("conv_id", "turn_idx", "role", "tool", "text", "ts")
          .writeTo("graft.gate.mor")
          .option("epoch", ep.toString).option("queryId", "gate").append()
      }
      val lite = new graft.table.IcebergLite(s"$wh/gate/mor")
      lite.deleteWhereMor(s, col("turn_idx") === 3, "turn_idx = 3")
      lite.deleteWhereMor(s, col("conv_id") === "conv-000001",
        "conv_id = 'conv-000001'")
      lite.deleteWhereMor(s,
        col("role") === "tool" && col("turn_idx") < 6,
        "role = 'tool' AND turn_idx < 6")
      s.table("graft.gate.mor")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    }),
    // MERGE over deletion-vectored files (round-5 session 7): a MOR purge
    // vectors turn 1 of the first 30 convs, then a SQL MERGE (a) updates
    // turn 0 of those same convs — its copy-on-write rewrite touches the
    // DV'd files and must fold the vectors, never resurrect the purged
    // rows — and (b) re-inserts turn 1 for the first 10 convs, whose keys
    // now exist ONLY in purged rows, so they must be NOT MATCHED. The
    // oracle recomputes the final state relationally; a resurrected row,
    // a lost survivor from a miscounted full-drop, or a swallowed
    // re-insert is a content mismatch.
    "q44_mor_merge" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val wh = s"/tmp/graft-gate-warehouse-${new java.io.File(dir).getName}"
      val s2 = graft.catalog.GraftSessions.withExtensions(wh)
      val tx = Fixtures.transcripts(s2, dir)
      s2.sql("CREATE NAMESPACE IF NOT EXISTS graft.gate")
      s2.sql("DROP TABLE IF EXISTS graft.gate.mm")
      s2.sql(
        """CREATE TABLE graft.gate.mm (
          |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
          |  text STRING, ts TIMESTAMP)
          |TBLPROPERTIES ('buckets'='8')""".stripMargin)
      tx.select("conv_id", "turn_idx", "role", "tool", "text", "ts")
        .writeTo("graft.gate.mm")
        .option("epoch", "0").option("queryId", "gate").append()
      val lite = new graft.table.IcebergLite(s"$wh/gate/mm")
      lite.deleteWhereMor(s2,
        col("conv_id") < "conv-000030" && col("turn_idx") === 1,
        "conv_id < 'conv-000030' AND turn_idx = 1")
      val upd = tx
        .filter(col("conv_id") < "conv-000030" && col("turn_idx") === 0)
        .select(col("conv_id"), col("turn_idx"), lit("fixed").as("role"),
          col("tool"), concat(col("text"), lit(" [mm]")).as("text"), col("ts"))
      val ins = tx
        .filter(col("conv_id") < "conv-000010" && col("turn_idx") === 1)
        .select(col("conv_id"), col("turn_idx"), lit("revived").as("role"),
          col("tool"), col("text"), col("ts"))
      upd.unionAll(ins).createOrReplaceTempView("gate_mm_feed")
      s2.sql(
        """MERGE INTO graft.gate.mm t USING gate_mm_feed s
          |ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
          |WHEN MATCHED THEN UPDATE SET role = s.role, text = s.text
          |WHEN NOT MATCHED THEN INSERT (conv_id, turn_idx, role, tool, text, ts)
          |  VALUES (s.conv_id, s.turn_idx, s.role, s.tool, s.text, s.ts)""".stripMargin)
      s2.table("graft.gate.mm")
        .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
          col("text"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    })
  )

  // The driver verifies at sf0.01, so oracle SQL references the sf0.01
  // synthetic parquet by absolute path (same files Spark read).
  private val T = "read_parquet('/root/repo/data/transcripts_sf0.01/*.parquet')"
  private val TSkew = "read_parquet('/root/repo/data/transcripts_skew_sf0.01/*.parquet')"
  private val D = "read_parquet('/root/repo/data/docs_sf0.01/*.parquet')"
  private val E = "read_parquet('/root/repo/data/emb_sf0.01/*.parquet')"

  // Shared CTE: gap-based sessionization (mirror of operators.Sessions).
  // Gap in MICROseconds (epoch_us), matching Sessions.withSessionId and the
  // streaming path — whole-second epoch() would diverge on sub-second ts.
  private def sessionCte(src: String): String =
    s"""WITH g AS (
       |  SELECT conv_id, turn_idx, text, ts,
       |         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS gap
       |  FROM $src
       |), s AS (
       |  SELECT conv_id, turn_idx, text, ts,
       |         CAST(sum(CASE WHEN gap IS NULL OR gap <= 1800000000 THEN 0 ELSE 1 END)
       |              OVER (PARTITION BY conv_id ORDER BY turn_idx) AS BIGINT) AS session_id
       |  FROM g
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_redact" ->
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN role = 'tool'
         |       THEN regexp_replace(s3, 'TRACE:[^\\n]*', '[TOOL-TRACE]', 'g')
         |       ELSE s3 END AS text_redacted
         |FROM (
         |  SELECT conv_id, turn_idx, role,
         |    regexp_replace(
         |      replace(replace(text, 'Jean Dupont', ''), 'DOCUMENT NON APPLICABLE', ''),
         |      'Document non tenu[^.]*\\.?', '[REDACTED]', 'g') AS s3
         |  FROM $T)""".stripMargin,
    "q2_detect" ->
      s"""${sessionCte(T)},
         |x AS (
         |  SELECT conv_id, session_id, turn_idx,
         |         trim(regexp_replace(lower(u.piece), '\\s+', ' ', 'g')) AS sentence
         |  FROM s, unnest(string_split(text, '.')) AS u(piece)
         |)
         |SELECT conv_id, session_id, sentence,
         |       count(DISTINCT turn_idx) AS n_turns
         |FROM x WHERE length(sentence) >= 24
         |GROUP BY 1, 2, 3 HAVING count(DISTINCT turn_idx) >= 3""".stripMargin,
    "q3_window_stats" ->
      s"""SELECT strftime(CAST(date_trunc('minute', ts) AS TIMESTAMP),
         |                '%Y-%m-%d %H:%M:%S') AS window_start,
         |       role, tool,
         |       count(*) AS turn_count,
         |       CAST(sum(length(text)) AS BIGINT) AS char_sum,
         |       count(DISTINCT conv_id) AS n_convs
         |FROM $T GROUP BY 1, 2, 3""".stripMargin,
    "q4_join_pairs" ->
      s"""SELECT c.conv_id, c.turn_idx AS call_turn_idx, c.tool,
         |       min(r.turn_idx) AS resp_turn_idx
         |FROM $T c JOIN $T r
         |  ON c.conv_id = r.conv_id AND c.tool = r.tool
         | AND r.turn_idx > c.turn_idx
         | AND r.ts >= c.ts AND r.ts <= c.ts + INTERVAL 60 SECOND
         |WHERE c.role = 'assistant' AND c.tool IS NOT NULL AND r.role = 'tool'
         |GROUP BY 1, 2, 3""".stripMargin,
    "q5_session_stats" ->
      s"""${sessionCte(T)}
         |SELECT conv_id, count(DISTINCT session_id) AS n_sessions,
         |       count(*) AS n_turns
         |FROM s GROUP BY 1""".stripMargin,
    "q6_skew_agg" ->
      s"""SELECT conv_id, count(*) AS n_turns,
         |       CAST(sum(length(text)) AS BIGINT) AS char_sum
         |FROM $TSkew GROUP BY 1""".stripMargin,
    "q7_dedup_exact" ->
      s"""SELECT md5(text) AS text_hash, count(*) AS n_copies,
         |       count(DISTINCT conv_id) AS n_convs, min(conv_id) AS first_conv
         |FROM $T GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q8_token_count" ->
      """SELECT doc_id,
        |       CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,
    "q9_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS total_chars,
        |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha_chars,
        |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digit_chars,
        |  CAST(length(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|for|on|it)\b')) AS BIGINT) AS stopword_hits,
        |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
        |  (length(regexp_extract_all(text, '[A-Za-z0-9]+')) BETWEEN 10 AND 5000
        |   AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10 >= length(text) * 6
        |   AND length(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|for|on|it)\b')) >= 1) AS is_quality
        |FROM documents""".stripMargin,
    "q10_lang_id" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST(length(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is)\b')) AS BIGINT) AS hits_en,
        |    CAST(length(regexp_extract_all(lower(text), '\b(le|la|les|et|de|un|une|pour)\b')) AS BIGINT) AS hits_fr,
        |    CAST(length(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein)\b')) AS BIGINT) AS hits_de,
        |    CAST(length(regexp_extract_all(lower(text), '\b(el|los|las|y|es|un|una|para)\b')) AS BIGINT) AS hits_es
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN hits_en = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'en'
        |       WHEN hits_fr = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'fr'
        |       WHEN hits_de = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'de'
        |       WHEN hits_es = greatest(hits_en, hits_fr, hits_de, hits_es) AND greatest(hits_en, hits_fr, hits_de, hits_es) > 0 THEN 'es'
        |       ELSE 'und' END AS lang_guess,
        |  hits_en, hits_fr, hits_de, hits_es
        |FROM h""".stripMargin,
    // q12: at the chosen band/row setting the LSH output is DEFINED to equal
    // exact n-gram Jaccard (candidates are verified with the exact integer
    // filter; DedupSpec proves recall on planted corpora), so the oracle is
    // the q11 exact-Jaccard SQL reshaped to q12's (doc_a, doc_b) columns.
    "q12_minhash_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM $D),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
         |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT it.doc_a, it.doc_b
         |FROM it JOIN sz sa ON sa.doc_id = it.doc_a JOIN sz sb ON sb.doc_id = it.doc_b
         |WHERE 10 * it.inter >= 8 * (sa.n + sb.n - it.inter)""".stripMargin,
    // q13: the per-shingle hash is the top 60 bits of md5, which DuckDB
    // computes identically (CAST('0x'||substr(md5(s),1,15) AS BIGINT)), so
    // the full SimHash fingerprint + Hamming pairing is SQL-replicated —
    // a real oracle, not a rows-only check.
    "q13_simhash_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM $D),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS s
         |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i)),
         |h AS (
         |  SELECT doc_id, CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS hv FROM sh),
         |bits AS (
         |  SELECT doc_id, b,
         |         CASE WHEN sum(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
         |              THEN (1::BIGINT << b) ELSE 0 END AS bitval
         |  FROM h, (SELECT unnest(range(0, 60)) AS b)
         |  GROUP BY doc_id, b),
         |fp AS (SELECT doc_id, CAST(sum(bitval) AS BIGINT) AS fpv FROM bits GROUP BY doc_id)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.fpv, b.fpv)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.fpv, b.fpv)) <= 3""".stripMargin,
    "q11_jaccard_pairs" ->
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM $D),
         |sh AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS s
         |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT it.doc_a, it.doc_b, it.inter, sa.n AS size_a, sb.n AS size_b
         |FROM it JOIN sz sa ON sa.doc_id = it.doc_a JOIN sz sb ON sb.doc_id = it.doc_b
         |WHERE 10 * it.inter >= 8 * (sa.n + sb.n - it.inter)""".stripMargin,
    "q14_embed_dup" ->
      s"""WITH v AS (
         |  SELECT vec_id,
         |         list_transform(vec, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM $E),
         |n AS (SELECT vec_id, q, CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS n2 FROM v),
         |d AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         CAST(list_sum(list_transform(range(1, 33), i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
         |         a.n2 AS na2, b.n2 AS nb2
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, dot FROM d
         |WHERE dot > 0 AND 10000 * dot * dot >= 8100 * na2 * nb2""".stripMargin,
    "q15_ann_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |e AS (
        |  SELECT vec_id AS nid,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS nv
        |  FROM embeddings),
        |d AS (
        |  SELECT q.qid, e.nid,
        |         CAST(list_sum(list_transform(range(1, 65), i -> q.qv[i] * e.nv[i])) AS BIGINT) AS dot
        |  FROM q, e WHERE e.nid <> q.qid)
        |SELECT qid, nid, dot, CAST(rank AS BIGINT) AS rank FROM (
        |  SELECT qid, nid, dot,
        |         row_number() OVER (PARTITION BY qid ORDER BY dot DESC, nid) AS rank
        |  FROM d)
        |WHERE rank <= 10""".stripMargin,
    "q16_docs_dedup_exact" ->
      s"""SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper
         |FROM $D GROUP BY 1 HAVING count(*) > 1""".stripMargin,
    "q18_point_lookup" ->
      s"""SELECT conv_id, turn_idx, role, tool,
         |  CASE WHEN role = 'tool'
         |       THEN regexp_replace(s3, 'TRACE:[^\\n]*', '[TOOL-TRACE]', 'g')
         |       ELSE s3 END AS text_redacted
         |FROM (
         |  SELECT conv_id, turn_idx, role, tool,
         |    regexp_replace(
         |      replace(replace(text, 'Jean Dupont', ''), 'DOCUMENT NON APPLICABLE', ''),
         |      'Document non tenu[^.]*\\.?', '[REDACTED]', 'g') AS s3
         |  FROM $T WHERE conv_id = 'conv-000042')
         |ORDER BY turn_idx""".stripMargin,
    "q19_sliding_stats" ->
      s"""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, role,
         |       count(*) AS turn_count,
         |       CAST(sum(length(text)) AS BIGINT) AS char_sum
         |FROM (
         |  SELECT role, text,
         |         unnest([CAST(date_trunc('minute', ts) AS TIMESTAMP),
         |                 CAST(date_trunc('minute', ts) AS TIMESTAMP) - INTERVAL 1 MINUTE]) AS ws
         |  FROM $T)
         |GROUP BY 1, 2""".stripMargin,
    "q20_session_bounds" ->
      s"""${sessionCte(T)}
         |SELECT conv_id,
         |       strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
         |       strftime(CAST(max(ts) AS TIMESTAMP) + INTERVAL 1800 SECOND, '%Y-%m-%d %H:%M:%S') AS session_end,
         |       count(*) AS n_turns
         |FROM s GROUP BY conv_id, session_id""".stripMargin,
    // q21: dead-letter summary — the reference's failed-file list, top 10
    // (watermark_processor.py:243,275); ORDER BY the unique (conv_id,
    // turn_idx) key so LIMIT picks the identical set on both engines.
    "q21_dead_letter" ->
      s"""SELECT conv_id, turn_idx, role, reason, text_len FROM (
         |  SELECT conv_id, turn_idx, role,
         |    CASE WHEN text IS NOT NULL AND length(text) > 8192 THEN 'text_overflow'
         |         WHEN ts IS NULL THEN 'null_ts'
         |         WHEN role NOT IN ('user','assistant','system','tool') THEN 'bad_role'
         |         ELSE NULL END AS reason,
         |    CAST(length(text) AS BIGINT) AS text_len
         |  FROM $T)
         |WHERE reason IS NOT NULL ORDER BY conv_id, turn_idx LIMIT 10""".stripMargin,
    // q22: R4b shingle-granular detection — recurring k=3 token shingles per
    // (conv, session); catches variable-tail patterns (W8) that the
    // sentence-level q2 provably misses.
    "q22_shingle_detect" ->
      s"""${sessionCte(T)},
         |toks AS (
         |  SELECT conv_id, session_id, turn_idx,
         |         regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM s),
         |x AS (
         |  SELECT DISTINCT conv_id, session_id, turn_idx,
         |         array_to_string(t[i:i+2], ' ') AS shingle
         |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i))
         |SELECT conv_id, session_id, shingle, count(DISTINCT turn_idx) AS n_turns
         |FROM x GROUP BY 1, 2, 3 HAVING count(DISTINCT turn_idx) >= 3""".stripMargin,
    // q23: same micro-batch watermark semantics — watermark for batch b =
    // max event time over batches < b, minus the delay; a row is late iff
    // its ts is below that watermark.
    "q23_late_data" ->
      """WITH b AS (
        |  SELECT conv_id, turn_idx, ts, arrival_seq // 1000 AS arrival_batch
        |  FROM read_parquet('/root/repo/data/transcripts_late_sf0.01/*.parquet')),
        |m AS (SELECT arrival_batch, max(epoch_us(ts)) AS bm FROM b GROUP BY 1),
        |w AS (SELECT arrival_batch,
        |        max(bm) OVER (ORDER BY arrival_batch
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |          - 120000000 AS wm
        |      FROM m)
        |SELECT b.conv_id, b.turn_idx, wm - epoch_us(b.ts) AS late_by_us
        |FROM b JOIN w USING (arrival_batch)
        |WHERE wm IS NOT NULL AND epoch_us(b.ts) < wm""".stripMargin,
    // q24: CMS-estimated per-role token counts == exact GROUP BY counts
    // (the sketch stays in exact key-tracking mode at this key cardinality)
    "q24_cms_profile" ->
      s"""WITH toks AS (
         |  SELECT role, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
         |  FROM $T)
         |SELECT role, token, count(*) AS est FROM toks GROUP BY 1, 2""".stripMargin,
    "q17_media_stats" ->
      """SELECT kind, count(*) AS n_items,
        |       CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes
        |FROM read_parquet('/root/repo/data/media_sf0.01/*.parquet')
        |GROUP BY 1""".stripMargin,
    // Header fields re-parsed IN SQL from the container bytes: hex(payload)
    // sliced at the published PNG (network-order) / BMP / WAV (little-endian)
    // layouts — byte i is substring(hx, 2i-1, 2); LE ints concatenate the
    // bytes reversed before the 0x cast (same trick as the SimHash oracle).
    // Format detection mirrors HeaderCodec.parse's order + length guards.
    // WAV offsets assume the canonical fmt-first layout the fixtures write
    // (the Spark parser walks chunks generically).
    "q25_media_headers" ->
      """WITH h AS (
        |  SELECT hex(payload) AS hx, octet_length(payload) AS len
        |  FROM read_parquet('/root/repo/data/media_sf0.01/*.parquet')
        |), f AS (
        |  SELECT hx, CASE
        |    WHEN len >= 33 AND substring(hx,1,16) = '89504E470D0A1A0A'
        |         AND substring(hx,25,8) = '49484452' THEN 'png'
        |    WHEN len >= 54 AND substring(hx,1,4) = '424D' THEN 'bmp'
        |    WHEN len >= 55 AND substring(hx,1,8) = 'FFD8FFE0' THEN 'jpeg'
        |    WHEN len >= 44 AND substring(hx,1,8) = '52494646'
        |         AND substring(hx,17,8) = '57415645' THEN 'wav'
        |    ELSE 'raw' END AS format
        |  FROM h
        |), p AS (
        |  SELECT format,
        |    CASE format
        |      WHEN 'png' THEN CAST(('0x' || substring(hx,33,8)) AS BIGINT)
        |      WHEN 'bmp' THEN CAST(('0x' || substring(hx,43,2) || substring(hx,41,2)
        |                            || substring(hx,39,2) || substring(hx,37,2)) AS BIGINT)
        |      WHEN 'jpeg' THEN CAST(('0x' || substring(hx,55,4)) AS BIGINT)
        |      ELSE 0 END AS width,
        |    CASE format
        |      WHEN 'png' THEN CAST(('0x' || substring(hx,41,8)) AS BIGINT)
        |      WHEN 'bmp' THEN CAST(('0x' || substring(hx,51,2) || substring(hx,49,2)
        |                            || substring(hx,47,2) || substring(hx,45,2)) AS BIGINT)
        |      WHEN 'jpeg' THEN CAST(('0x' || substring(hx,51,4)) AS BIGINT)
        |      ELSE 0 END AS height,
        |    CASE format
        |      WHEN 'png' THEN CASE substring(hx,51,2) WHEN '00' THEN 1 WHEN '02' THEN 3
        |                           WHEN '03' THEN 1 WHEN '04' THEN 2 WHEN '06' THEN 4
        |                           ELSE 0 END
        |      WHEN 'bmp' THEN CAST(('0x' || substring(hx,59,2) || substring(hx,57,2)) AS BIGINT) // 8
        |      WHEN 'jpeg' THEN CAST(('0x' || substring(hx,59,2)) AS BIGINT)
        |      WHEN 'wav' THEN CAST(('0x' || substring(hx,47,2) || substring(hx,45,2)) AS BIGINT)
        |      ELSE 0 END AS channels,
        |    CASE format
        |      WHEN 'wav' THEN CAST(('0x' || substring(hx,55,2) || substring(hx,53,2)
        |                            || substring(hx,51,2) || substring(hx,49,2)) AS BIGINT)
        |      ELSE 0 END AS sample_rate,
        |    CASE format
        |      WHEN 'png' THEN CAST(('0x' || substring(hx,49,2)) AS BIGINT)
        |      WHEN 'bmp' THEN CAST(('0x' || substring(hx,59,2) || substring(hx,57,2)) AS BIGINT)
        |      WHEN 'jpeg' THEN CAST(('0x' || substring(hx,49,2)) AS BIGINT)
        |      WHEN 'wav' THEN CAST(('0x' || substring(hx,71,2) || substring(hx,69,2)) AS BIGINT)
        |      ELSE 0 END AS bit_depth
        |  FROM f
        |)
        |SELECT format, count(*) AS n_items,
        |       CAST(sum(width) AS BIGINT) AS sum_width,
        |       CAST(sum(height) AS BIGINT) AS sum_height,
        |       CAST(sum(channels) AS BIGINT) AS sum_channels,
        |       CAST(sum(sample_rate) AS BIGINT) AS sum_sample_rate,
        |       CAST(sum(bit_depth) AS BIGINT) AS sum_bit_depth
        |FROM p GROUP BY 1""".stripMargin,
    // q26: the catalog round-trip must reproduce the fixture rows exactly —
    // the oracle reads the SAME parquet the Spark side fed through
    // CREATE TABLE + writeTo().append() + spark.table
    "q26_catalog_roundtrip" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T""".stripMargin,
    // q27: rows committed before the ADD COLUMN read tool as NULL; rows
    // committed after carry the fixture's tool values
    "q27_schema_evolution" ->
      s"""SELECT conv_id, turn_idx, role,
         |       CASE WHEN turn_idx % 2 = 1 THEN tool END AS tool,
         |       text,
         |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T""".stripMargin,
    // q28: under maxEpochsPerTrigger=1, source epoch k (= the turn_idx % 4
    // slice) must land in micro-batch k — so batch_id is recomputable from
    // the fixture alone
    "q28_rate_limited_backfill" ->
      s"""SELECT conv_id, turn_idx, role, text,
         |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |       CAST(turn_idx % 4 AS INTEGER) AS batch_id
         |FROM $T""".stripMargin,
    // q29: survivors of the three DELETE predicates — NOT(...) keeps
    // SQL three-valued semantics aligned with the engine's
    // rows-where-TRUE-are-deleted contract
    "q29_delete" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T
         |WHERE NOT (role = 'tool')
         |  AND NOT (conv_id = 'conv-000000')
         |  AND NOT (CAST(ts AS TIMESTAMP) < TIMESTAMP '2026-01-01 00:20:00'
         |           AND role = 'system')""".stripMargin,
    // q30: per-conv enrichment recomputed from the raw fixture — any row
    // the key-grouped scan dropped/duplicated would shift n_turns/first_ts
    "q30_spj_enrich" ->
      s"""SELECT t.conv_id, t.turn_idx, t.role, c.n_turns, c.first_ts_s
         |FROM $T t
         |JOIN (SELECT conv_id, count(*) AS n_turns,
         |             strftime(min(CAST(ts AS TIMESTAMP)),
         |                      '%Y-%m-%d %H:%M:%S') AS first_ts_s
         |      FROM $T GROUP BY 1) c USING (conv_id)""".stripMargin,
    // q31: the post-UPDATE table recomputed from the raw fixture — both
    // CASE branches mirror the UPDATE's SET exprs exactly
    "q31_update" ->
      s"""SELECT conv_id, turn_idx, role,
         |  CASE WHEN role = 'tool'
         |        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2026-01-01 00:30:00'
         |       THEN upper(coalesce(tool, 'none')) ELSE tool END AS tool,
         |  CASE WHEN role = 'tool'
         |        AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2026-01-01 00:30:00'
         |       THEN concat(text, ' [v2]') ELSE text END AS text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T""".stripMargin,
    // q32: the merged table replayed relationally — matched updates as
    // CASE branches, not-matched inserts as a UNION ALL of the same
    // deterministic feed slice
    "q32_merge" ->
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN conv_id < 'conv-000050' AND turn_idx = 0
         |       THEN 'merged' ELSE role END AS role,
         |  tool,
         |  CASE WHEN conv_id < 'conv-000050' AND turn_idx = 0
         |       THEN concat(text, ' [m]') ELSE text END AS text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T
         |UNION ALL
         |SELECT conv_id, turn_idx + 1000 AS turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T WHERE conv_id < 'conv-000020' AND turn_idx = 1""".stripMargin,
    // q33: the CDC feed recomputed relationally — deletes are the DELETE's
    // matches, update images are both sides of the UPDATE's SET, inserts
    // are the appended slice (disjoint predicates by construction)
    "q33_changes" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'delete' AS _change_type
         |FROM $T WHERE role = 'tool'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'update_preimage' AS _change_type
         |FROM $T WHERE conv_id < 'conv-000010' AND role = 'user'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, concat(text, ' [u]') AS text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'update_postimage' AS _change_type
         |FROM $T WHERE conv_id < 'conv-000010' AND role = 'user'
         |UNION ALL
         |SELECT conv_id, turn_idx + 5000 AS turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'insert' AS _change_type
         |FROM $T WHERE conv_id < 'conv-000005' AND turn_idx = 0""".stripMargin,
    // q35: the natively-streamed table == the fixture, with batch ids
    // recomputable from the epoch slice rule (epoch k → micro-batch k)
    "q35_stream_write" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  CAST(turn_idx % 2 AS INTEGER) AS batch_id
         |FROM $T""".stripMargin,
    // q34: VERSION AS OF the tag at epoch 0 = the even-turn slice of the
    // fixture, untouched by the later epoch and DELETE
    "q34_time_travel" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T WHERE turn_idx % 2 = 0""".stripMargin,
    // q36: the recorded per-commit feed recomputed relationally. Inserts are
    // the WHOLE fixture (per-commit: a later delete does not erase the
    // insert event) with the epoch stamp from the slice rule; delete /
    // update images mirror the two mutations with their gen stamps (DELETE
    // ran first -> gen 1, UPDATE -> gen 2); exactly one stamp is non-null
    // per row.
    "q36_change_feed" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'insert' AS _change_type,
         |  CAST(turn_idx % 2 AS BIGINT) AS _commit_epoch,
         |  CAST(NULL AS BIGINT) AS _commit_gen
         |FROM $T
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'delete' AS _change_type,
         |  CAST(NULL AS BIGINT) AS _commit_epoch, CAST(1 AS BIGINT) AS _commit_gen
         |FROM $T WHERE role = 'tool'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'update_preimage' AS _change_type,
         |  CAST(NULL AS BIGINT) AS _commit_epoch, CAST(2 AS BIGINT) AS _commit_gen
         |FROM $T WHERE conv_id < 'conv-000010' AND role = 'user'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, concat(text, ' [u2]') AS text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'update_postimage' AS _change_type,
         |  CAST(NULL AS BIGINT) AS _commit_epoch, CAST(2 AS BIGINT) AS _commit_gen
         |FROM $T WHERE conv_id < 'conv-000010' AND role = 'user'""".stripMargin,
    // q37: live = the full fixture (the restore undid both the DELETE and
    // the epoch-2 append) plus the post-restore epoch-3 slice; the restore
    // gen's recorded feed = the deleted tool turns back as 'insert' and
    // the epoch-2 slice out as 'delete'
    "q37_restore" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'live' AS _change_type
         |FROM $T
         |UNION ALL
         |SELECT conv_id, turn_idx + 7000 AS turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'live' AS _change_type
         |FROM $T WHERE conv_id < 'conv-000003'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'insert' AS _change_type
         |FROM $T WHERE role = 'tool'
         |UNION ALL
         |SELECT conv_id, turn_idx + 9000 AS turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'delete' AS _change_type
         |FROM $T WHERE conv_id < 'conv-000005'""".stripMargin,
    // q38: 'pre' = the visible epoch only (the stage must not leak),
    // 'post' and 'final' = the full fixture (publish added exactly the
    // staged slice; the discarded stage left no trace), 'audit' = the
    // `.staged` SQL surface serving exactly the un-published epoch-2 rows,
    // and NO 'gone' rows (the post-discard staged view must be empty)
    "q38_wap" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'pre' AS part
         |FROM $T WHERE turn_idx % 2 = 0
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'post' AS part
         |FROM $T
         |UNION ALL
         |SELECT conv_id, turn_idx + 9000 AS turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'audit' AS part
         |FROM $T WHERE conv_id < 'conv-000002'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'final' AS part
         |FROM $T""".stripMargin,
    // q39: append epochs' recorded row counts = the fixture slices; the
    // live file listing's manifest stats = the post-DELETE survivors
    // (footer stats are exact, so min/max over files == min/max over rows)
    "q39_meta" ->
      s"""SELECT 'epoch_0' AS key, count(*) AS val FROM $T WHERE turn_idx % 2 = 0
         |UNION ALL
         |SELECT 'epoch_1', count(*) FROM $T WHERE turn_idx % 2 = 1
         |UNION ALL
         |SELECT 'live_rows', count(*) FROM $T WHERE role <> 'tool'
         |UNION ALL
         |SELECT 'live_min_us', epoch_us(min(ts)) FROM $T WHERE role <> 'tool'
         |UNION ALL
         |SELECT 'live_max_us', epoch_us(max(ts)) FROM $T WHERE role <> 'tool'""".stripMargin,
    // q40: both views = the fixture + the epoch-2 slice, minus tool rows —
    // compaction (incremental or full) is layout-only
    "q40_compact" ->
      s"""WITH all_rows AS (
         |  SELECT conv_id, turn_idx, role, tool, text, ts FROM $T
         |  UNION ALL
         |  SELECT conv_id, turn_idx + 9000 AS turn_idx, role, tool, text, ts
         |  FROM $T WHERE turn_idx % 2 = 0
         |)
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'inc' AS part
         |FROM all_rows WHERE role <> 'tool'
         |UNION ALL
         |SELECT conv_id, turn_idx, role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s,
         |  'full' AS part
         |FROM all_rows WHERE role <> 'tool'""".stripMargin,
    // q41: every pruning level must be content-neutral — the oracle
    // recomputes the aggregates, the filtered slice and the join from the
    // raw fixture
    "q41_scan_prune" ->
      s"""SELECT 'agg_rows' AS key, count(*) AS val FROM $T
         |UNION ALL
         |SELECT 'agg_min_us', epoch_us(min(ts)) FROM $T
         |UNION ALL
         |SELECT 'agg_max_us', epoch_us(max(ts)) FROM $T
         |UNION ALL
         |SELECT 'slice_n', count(*) FROM $T
         |WHERE conv_id IN ('conv-000007', 'conv-000042', 'conv-000123')
         |  AND turn_idx > 5
         |UNION ALL
         |SELECT 'join_n', count(*) FROM $T t
         |JOIN (SELECT DISTINCT conv_id FROM $T
         |      WHERE conv_id LIKE 'conv-0000%') d USING (conv_id)""".stripMargin,
    // q42: 'pre' = the committed even rows; 'branch' and 'post' = even
    // rows plus BOTH staged odd slices (UNION ALL — the slices overlap at
    // turn_idx ≡ 7 mod 12, and both epochs legitimately carry those rows)
    "q42_branch" ->
      s"""WITH base AS (
         |  SELECT conv_id, turn_idx, role, tool, text,
         |    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |  FROM $T
         |), pre AS (SELECT * FROM base WHERE turn_idx % 2 = 0),
         |full_v AS (
         |  SELECT * FROM base WHERE turn_idx % 2 = 0
         |  UNION ALL
         |  SELECT * FROM base WHERE turn_idx % 2 = 1 AND turn_idx % 3 = 1
         |  UNION ALL
         |  SELECT * FROM base WHERE turn_idx % 2 = 1 AND turn_idx % 4 = 3
         |)
         |SELECT *, 'pre' AS part FROM pre
         |UNION ALL SELECT *, 'branch' FROM full_v
         |UNION ALL SELECT *, 'post' FROM full_v""".stripMargin,
    // q43: survivors of the three MOR deletes, recomputed relationally —
    // a vector-skip read that dropped a surviving row, kept a deleted one
    // or double-served a file would shift the multiset
    "q43_mor_delete" ->
      s"""SELECT conv_id, turn_idx, role, tool, text,
         |       strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T
         |WHERE NOT (turn_idx = 3)
         |  AND NOT (conv_id = 'conv-000001')
         |  AND NOT (role = 'tool' AND turn_idx < 6)""".stripMargin,
    // q44: final state after MOR purge + MERGE — purged (conv<30, t1) rows
    // gone except the first 10 convs' re-inserts; (conv<30, t0) updated
    "q44_mor_merge" ->
      s"""SELECT conv_id, turn_idx,
         |  CASE WHEN conv_id < 'conv-000030' AND turn_idx = 0
         |       THEN 'fixed' ELSE role END AS role,
         |  tool,
         |  CASE WHEN conv_id < 'conv-000030' AND turn_idx = 0
         |       THEN concat(text, ' [mm]') ELSE text END AS text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T
         |WHERE NOT (conv_id < 'conv-000030' AND turn_idx = 1)
         |UNION ALL
         |SELECT conv_id, turn_idx, 'revived' AS role, tool, text,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         |FROM $T WHERE conv_id < 'conv-000010' AND turn_idx = 1""".stripMargin
  )
}
