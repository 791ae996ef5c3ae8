package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, TableAlreadyExistsException}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IcebergLite

/** The catalog surface a real user reaches first: `spark.table`,
  * `writeTo(...).append()`, SQL DDL + INSERT INTO — all resolving to the
  * same IcebergLite files as the path-based DSv2 access, with idempotent
  * epoch commits intact through every entry point. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val warehouse = tmpDir("graft-warehouse")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE graft.db")
  }

  private def sampleDf(n: Int, base: Long = 1767225600L) = {
    import spark.implicits._
    (0 until n).map { i =>
      (f"conv-$i%03d", i, "user", "none", s"text $i",
        new Timestamp((base + i) * 1000L))
    }.toDF("conv_id", "turn_idx", "role", "tool", "text", "ts")
  }

  test("SQL DDL + INSERT INTO + spark.table round-trip, epochs idempotent") {
    spark.sql(
      """CREATE TABLE graft.db.t1 (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    // the directory is a real IcebergLite table with the declared layout
    val lite = new IcebergLite(s"$warehouse/db/t1")
    assert(lite.exists && lite.declaredNumBuckets === Some(4))

    sampleDf(40).createOrReplaceTempView("src_rows")
    // ACCEPT_ANY_SCHEMA turns off by-position resolution, so INSERT
    // projects the business columns by name (documented contract)
    spark.sql(
      """INSERT INTO graft.db.t1
        |SELECT conv_id, turn_idx, role, tool, text, ts FROM src_rows""".stripMargin)
    assert(spark.table("graft.db.t1").count() === 40L)
    assert(lite.snapshots.map(_.epochId) === Seq(0L))

    // lineage columns are readable through the catalog path too
    val cols = spark.table("graft.db.t1").columns.toSet
    assert(cols.contains("epoch_id") && cols.contains("partition_id"))

    // second INSERT = next epoch (append-only snapshot log)
    spark.sql(
      """INSERT INTO graft.db.t1
        |SELECT conv_id, turn_idx, role, tool, text, ts FROM src_rows""".stripMargin)
    assert(spark.table("graft.db.t1").count() === 80L)
    assert(lite.snapshots.map(_.epochId) === Seq(0L, 1L))
  }

  test("writeTo(...).append() with an explicit epoch is an idempotent replay") {
    spark.sql(
      """CREATE TABLE graft.db.t2 (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)""".stripMargin)
    val df = sampleDf(25)
    df.writeTo("graft.db.t2").option("epoch", "7").option("queryId", "job-a").append()
    assert(spark.table("graft.db.t2").count() === 25L)
    // replay of the same (queryId, epoch) — e.g. a retried task — is a no-op
    df.writeTo("graft.db.t2").option("epoch", "7").option("queryId", "job-a").append()
    assert(spark.table("graft.db.t2").count() === 25L)
    assert(new IcebergLite(s"$warehouse/db/t2").snapshots.map(_.epochId) === Seq(7L))
    // a DIFFERENT query claiming the same epoch fails loudly (commitEpoch contract)
    val e = intercept[Exception] {
      df.writeTo("graft.db.t2").option("epoch", "7").option("queryId", "job-b").append()
    }
    assert(e.getMessage.contains("epoch"))
  }

  test("catalog and path-based access are the same table") {
    spark.sql(
      """CREATE TABLE graft.db.t3 (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)""".stripMargin)
    sampleDf(10).writeTo("graft.db.t3").append()
    val viaPath = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", s"$warehouse/db/t3").load()
    val viaCatalog = spark.table("graft.db.t3")
    assert(viaPath.count() === 10L)
    assert(viaCatalog.exceptAll(viaPath).isEmpty && viaPath.exceptAll(viaCatalog).isEmpty)
  }

  test("manifest pruning works through the catalog (conv_id bucket pushdown)") {
    spark.sql(
      """CREATE TABLE graft.db.t4 (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |PARTITIONED BY (bucket(4, conv_id))""".stripMargin)
    sampleDf(40).writeTo("graft.db.t4").append()
    val plan = spark.table("graft.db.t4")
      .filter(col("conv_id") === "conv-003").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pruneBy"),
      s"expected pushdown evidence in plan:\n$plan")
    assert(spark.table("graft.db.t4")
      .filter(col("conv_id") === "conv-003").count() === 1L)
  }

  test("DDL surface: SHOW/DROP/ALTER/RENAME and loud non-support") {
    spark.sql("CREATE NAMESPACE graft.tmp")
    spark.sql(
      "CREATE TABLE graft.tmp.a (conv_id STRING, turn_idx INT, ts TIMESTAMP)")
    val shown = spark.sql("SHOW TABLES IN graft.tmp").collect().map(_.getString(1))
    assert(shown.contains("a"))
    sampleDf(5).select("conv_id", "turn_idx", "ts").writeTo("graft.tmp.a").append()

    // RENAME TO resolves its target within the source's catalog
    spark.sql("ALTER TABLE graft.tmp.a RENAME TO tmp.b")
    assert(spark.table("graft.tmp.b").count() === 5L)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.table("graft.tmp.a").count()
    }

    // evolution is add-only: reinterpreting committed bytes is rejected
    // loudly, not ignored (ADD COLUMN itself is covered by its own test)
    val alter = intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE graft.tmp.b RENAME COLUMN turn_idx TO idx")
    }
    assert(alter.getMessage.contains("only ADD COLUMN"))

    assert(spark.sql("DROP TABLE graft.tmp.b").collect().isEmpty)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.table("graft.tmp.b").count()
    }
    spark.sql("DROP NAMESPACE graft.tmp")
    intercept[NoSuchNamespaceException] {
      spark.sql("SHOW TABLES IN graft.tmp").collect()
    }
  }

  test("readStream.table consumes epochs incrementally through the catalog") {
    import org.apache.spark.sql.streaming.Trigger
    spark.sql(
      """CREATE TABLE graft.db.t5 (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)""".stripMargin)
    sampleDf(12).writeTo("graft.db.t5").append()
    sampleDf(8, base = 1767229200L).writeTo("graft.db.t5").append()
    val cp = tmpDir("cp-cat-stream")
    val seen = new java.util.concurrent.atomic.AtomicLong()
    def drain(): Long = {
      val q = spark.readStream.table("graft.db.t5")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(df.count()); ()
        }.start()
      q.awaitTermination()
      seen.get()
    }
    assert(drain() === 20L)
    // new epoch after the checkpoint: only the delta is read
    sampleDf(5, base = 1767232800L).writeTo("graft.db.t5").append()
    assert(drain() === 25L)
  }

  test("identifier safety + duplicate-create is a catalog error") {
    spark.sql("CREATE TABLE graft.db.safe (conv_id STRING, turn_idx INT, ts TIMESTAMP)")
    intercept[TableAlreadyExistsException] {
      spark.sql("CREATE TABLE graft.db.safe (conv_id STRING, turn_idx INT, ts TIMESTAMP)")
    }
    // a traversal-shaped identifier can never escape the warehouse
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft.db.`..`(conv_id STRING, turn_idx INT, ts TIMESTAMP)")
    }
    assert(e.getMessage.contains("invalid identifier") ||
      e.getMessage.toLowerCase.contains("parse"))
  }

  test("SQL VERSION AS OF reads the historical epoch; TIMESTAMP AS OF is " +
    "a loud determinism error; the pinned view rejects writes") {
    spark.sql(
      """CREATE TABLE graft.db.tt (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    import org.apache.spark.sql.DataFrame
    def append(df: DataFrame, epoch: Long): Unit =
      df.writeTo("graft.db.tt")
        .option("epoch", epoch.toString).option("queryId", "tt").append()
    append(sampleDf(10), 0L)
    append(sampleDf(25, base = 1767230000L), 1L)

    assert(spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 0").count() === 10L)
    assert(spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 1").count() === 35L)
    assert(spark.table("graft.db.tt").count() === 35L)

    val unknown = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 9").count()
    }
    assert(unknown.getMessage.contains("not a committed snapshot"))

    val notNum = intercept[Exception] {
      spark.sql("SELECT * FROM graft.db.tt VERSION AS OF 'abc'").count()
    }
    assert(notNum.getMessage.contains("not an epoch id and not a tag"))

    val ts = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft.db.tt TIMESTAMP AS OF '2026-01-01 00:00:00'").count()
    }
    assert(ts.getMessage.contains("no wall-clock commit time"))

    // INSERT INTO a VERSION AS OF view is rejected by the parser/analyzer
    // or by the table's write guard — either way, loudly
    intercept[Exception] {
      spark.sql(
        """INSERT INTO graft.db.tt VERSION AS OF 0
          |SELECT conv_id, turn_idx, role, tool, text, ts FROM src_rows""".stripMargin)
    }
  }

  test("CALL graft.system.{snapshots,compact,gc,expire_metadata} runs the " +
    "maintenance lifecycle through SQL") {
    spark.sql(
      """CREATE TABLE graft.db.m (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    (0L until 10L).foreach { e =>
      sampleDf(8, base = 1767225600L + e * 1000).writeTo("graft.db.m")
        .option("epoch", e.toString).option("queryId", "m").append()
    }
    val lite = new IcebergLite(s"$warehouse/db/m")

    // inspection: one row per committed epoch, row counts from the manifest
    val snaps = spark.sql("CALL graft.system.snapshots('db.m')").collect()
    assert(snaps.length === 10)
    assert(snaps.map(_.getLong(0)).toSeq === (0L until 10L))
    assert(snaps.map(_.getLong(3)).sum === 80L)

    // compact: one generation over all 10 epochs; table content unchanged.
    // First fold has no prior generation: everything written, nothing reused
    val before = spark.table("graft.db.m").count()
    val comp = spark.sql("CALL graft.system.compact('db.m')").collect().head
    assert(comp.getLong(0) === 0L && comp.getInt(1) > 0 && comp.getInt(2) === 0)
    assert(spark.table("graft.db.m").count() === before)
    // idempotent: nothing left to compact -> generation -1
    assert(spark.sql("CALL graft.system.compact('db.m')")
      .collect().head.getLong(0) === -1L)
    // incremental second fold: the new epoch is written, the prior
    // generation is REUSED — the output reports churn-sized work
    sampleDf(4, base = 1767229600L).withColumn("turn_idx",
      col("turn_idx") + lit(5000))
      .writeTo("graft.db.m").option("epoch", "10")
      .option("queryId", "m2").append()
    val inc = spark.sql("CALL graft.system.compact('db.m')").collect().head
    assert(inc.getLong(0) === 1L && inc.getInt(1) > 0 && inc.getInt(2) > 0)
    assert(spark.table("graft.db.m").count() === before + 4)

    // gc reclaims the replaced per-epoch files
    val gced = spark.sql("CALL graft.system.gc('db.m')").collect().head.getInt(0)
    assert(gced > 0)
    assert(spark.table("graft.db.m").count() === before + 4)

    // expiry retires settled manifests outside the retention window and
    // records the horizon (11 epochs now; retain_last=2 keeps {9, 10})
    val exp = spark.sql(
      "CALL graft.system.expire_metadata('db.m', retain_last => 2)")
      .collect().head
    assert(exp.getInt(0) === 9 && exp.getLong(1) === 8L)
    assert(lite.snapshots.map(_.epochId) === Seq(9L, 10L))
    assert(lite.expiryHorizon === Some(8L))

    // unknown procedure and unknown table both fail loudly
    val unknownProc = intercept[Exception] {
      spark.sql("CALL graft.system.rebucket('db.m')")
    }
    // Spark wraps the catalog's error as FAILED_TO_LOAD_ROUTINE
    assert(unknownProc.getMessage.contains("unknown procedure") ||
      unknownProc.getMessage.toLowerCase.contains("failed to load routine"))
    intercept[Exception] {
      spark.sql("CALL graft.system.gc('db.nope')").collect()
    }

    // table state surfaces through SHOW TBLPROPERTIES (metadata only)
    val props = spark.sql("SHOW TBLPROPERTIES graft.db.m").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("format") === "iceberglite")
    assert(props("buckets") === "2")
    assert(props("latest_epoch") === "10")
    assert(props("num_rows") === "84")
    assert(props("expiry_horizon") === "8")
  }

  test("ALTER TABLE ADD COLUMN: add-only evolution, null-fill, versioned time travel") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE graft.db.evo (
        |  conv_id STRING, turn_idx INT, role STRING, text STRING,
        |  ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    val base = (0 until 10).map { i =>
      (f"c-$i%02d", i, "user", s"t$i", new Timestamp((1767225600L + i) * 1000L))
    }.toDF("conv_id", "turn_idx", "role", "text", "ts")
    base.writeTo("graft.db.evo").option("epoch", "0").option("queryId", "q").append()

    spark.sql("ALTER TABLE graft.db.evo ADD COLUMN tool STRING")
    val lite = new IcebergLite(s"$warehouse/db/evo")
    assert(lite.schemaVersion === 2)

    // post-evolution writes carry the evolved column
    val withTool = base
      .withColumn("tool", concat(lit("tool-"), col("turn_idx")))
      .select("conv_id", "turn_idx", "role", "text", "ts", "tool")
    withTool.writeTo("graft.db.evo").option("epoch", "1").option("queryId", "q").append()

    // pre-evolution rows read the column as NULL through the vectorized
    // DSv2 scan; post-evolution rows carry their written values
    val t = spark.table("graft.db.evo")
    assert(t.count() === 20L)
    assert(t.filter(col("epoch_id") === 0 && col("tool").isNull).count() === 10L)
    assert(t.filter(col("epoch_id") === 1 &&
      col("tool") === concat(lit("tool-"), col("turn_idx"))).count() === 10L)

    // time travel serves the snapshot's own schema version: AS OF the
    // pre-evolution epoch has no phantom all-null column
    val v0 = spark.sql("SELECT * FROM graft.db.evo VERSION AS OF 0")
    assert(!v0.columns.contains("tool") && v0.count() === 10L)
    assert(spark.sql("SELECT * FROM graft.db.evo VERSION AS OF 1")
      .columns.contains("tool"))

    // SHOW TBLPROPERTIES surfaces the version; compaction rewrites all
    // files under the current schema and the nulls survive
    assert(spark.sql("SHOW TBLPROPERTIES graft.db.evo").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .apply("schema_version") === "2")
    lite.compact(spark, numBuckets = 2)
    assert(spark.table("graft.db.evo").filter(col("tool").isNull).count() === 10L)

    // everything that reinterprets committed bytes stays a loud error
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.evo DROP COLUMN role")
    }.getMessage.contains("only ADD COLUMN"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.evo ADD COLUMN tool STRING")
    }.getMessage.contains("already exists"))
    // a lineage-column collision is caught by Spark's own analyzer (the
    // sink-appended columns are part of the resolved read schema); the
    // engine-level guard for direct addColumn calls is in TableSpec
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.evo ADD COLUMN epoch_id BIGINT")
    }.getMessage.contains("epoch_id"))
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft.db.evo ADD COLUMN nn STRING NOT NULL")
    }.getMessage.contains("nullable"))
  }

  test("SQL DELETE FROM: row-level copy-on-write delete through the " +
    "catalog, exact under =, IN, range and compound predicates") {
    spark.sql(
      """CREATE TABLE graft.db.del (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    sampleDf(40).writeTo("graft.db.del")
      .option("epoch", "0").option("queryId", "spec").append()

    spark.sql("DELETE FROM graft.db.del WHERE conv_id = 'conv-003'")
    assert(spark.table("graft.db.del").count() === 39L)
    spark.sql(
      "DELETE FROM graft.db.del WHERE conv_id IN ('conv-004', 'conv-005') " +
        "OR turn_idx >= 38")
    assert(spark.table("graft.db.del")
      .select("conv_id").collect().map(_.getString(0)).toSet ===
      (0 until 38).filterNot(Set(3, 4, 5).contains).map(i => f"conv-$i%03d").toSet)
    // the deletes are manifest-recorded on the underlying table
    assert(new IcebergLite(s"$warehouse/db/del").deletes.map(_.gen) ===
      Seq(1L, 2L))

    // appends after a delete land in new epochs, both visible
    sampleDf(2, base = 1767312000L).writeTo("graft.db.del")
      .option("epoch", "1").option("queryId", "spec").append()
    assert(spark.table("graft.db.del").count() === 35L + 2L)

    // deleting from a time-travel view is rejected
    assert(intercept[Exception] {
      spark.sql("DELETE FROM graft.db.del VERSION AS OF 0 WHERE turn_idx = 1")
    }.getMessage.nonEmpty)

    // TRUNCATE TABLE rides the same path (SupportsDeleteV2 extends
    // TruncatableTable: truncate == delete where TRUE)
    spark.sql("TRUNCATE TABLE graft.db.del")
    assert(spark.table("graft.db.del").count() === 0L)
    assert(new IcebergLite(s"$warehouse/db/del").exists)
  }

  test("CALL graft.system.vacuum runs compact + gc + expire_metadata " +
    "in one call; content and retention guards unchanged") {
    spark.sql(
      """CREATE TABLE graft.db.vac (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    (0L until 6L).foreach { e =>
      sampleDf(8, base = 1767225600L + e * 1000).writeTo("graft.db.vac")
        .option("epoch", e.toString).option("queryId", "v").append()
    }
    val before = spark.table("graft.db.vac").count()
    val r = spark.sql(
      "CALL graft.system.vacuum('db.vac', retain_last => 2)").collect().head
    assert(r.getLong(0) === 0L)  // one new generation
    assert(r.getInt(1) > 0)      // superseded per-epoch files reclaimed
    assert(r.getInt(2) === 4)    // 6 snapshots - retain_last 2
    assert(spark.table("graft.db.vac").count() === before)
    val lite = new IcebergLite(s"$warehouse/db/vac")
    assert(lite.snapshots.map(_.epochId) === Seq(4L, 5L))
    assert(lite.expiryHorizon === Some(3L))
  }

  test("CALL graft.system.remove_orphans drops files no manifest " +
    "references while protecting in-flight publishes") {
    spark.sql(
      """CREATE TABLE graft.db.orph (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    val lite = new IcebergLite(s"$warehouse/db/orph")
    val df = sampleDf(40)
    // crash window: epoch 0 published under buckets=4, snapshot never
    // written; the retry committed under buckets=2, whose REPLACE only
    // reclaimed two of the four stale files
    lite.stageAndPublish(df, 0L, 4)
    assert(lite.commitEpoch(df, "spec", 0L, 2))
    val dataDir = new java.io.File(s"$warehouse/db/orph/data")
    assert(dataDir.listFiles().count(_.getName.endsWith(".parquet")) === 4)
    // an uncommitted FUTURE epoch (an in-flight writer) must survive
    lite.stageAndPublish(sampleDf(4), 1L, 2)

    val removed = spark.sql("CALL graft.system.remove_orphans('db.orph')")
      .collect().map(_.getString(0)).sorted
    assert(removed.count(_.startsWith("data/part-000000")) === 2, removed.toSeq)
    assert(removed.forall(!_.startsWith("data/part-000001")), removed.toSeq)
    // reads unaffected; epoch 1 still commits cleanly afterwards
    assert(spark.table("graft.db.orph").count() === 40L)
    assert(lite.commitEpoch(sampleDf(4), "spec", 1L, 2))
    assert(spark.table("graft.db.orph").count() === 44L)
    // idempotent: nothing left to remove but the settled staging dirs
    assert(lite.removeOrphans().forall(_.startsWith("_staging/")))
  }

  test("SQL INSERT OVERWRITE replaces the table contents atomically " +
    "(truncation manifest + fresh epoch; history retained)") {
    spark.sql(
      """CREATE TABLE graft.db.ow (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    sampleDf(20).writeTo("graft.db.ow")
      .option("epoch", "0").option("queryId", "spec").append()
    sampleDf(6, base = 1767312000L).createOrReplaceTempView("ow_rows")
    spark.sql(
      """INSERT OVERWRITE graft.db.ow
        |SELECT conv_id, turn_idx, role, tool, text, ts FROM ow_rows""".stripMargin)
    assert(spark.table("graft.db.ow").count() === 6L)
    val lite = new IcebergLite(s"$warehouse/db/ow")
    assert(lite.deletes.nonEmpty)          // overwrite = recorded truncation
    assert(lite.snapshots.size === 2)      // old epoch still in the log
  }

  test("CREATE TABLE AS SELECT: one statement creates the table and lands " +
      "the query as epoch 0 with the standard layout") {
    sampleDf(30).createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE graft.db.ctas TBLPROPERTIES ('buckets'='4') AS
        |SELECT conv_id, turn_idx, role, tool, text, ts FROM ctas_src
        |WHERE turn_idx < 20""".stripMargin)
    assert(spark.table("graft.db.ctas").count() === 20L)
    val lite = new IcebergLite(s"$warehouse/db/ctas")
    assert(lite.exists && lite.declaredNumBuckets === Some(4))
    assert(lite.snapshots.map(_.epochId) === Seq(0L))
    // CTAS files carry the same bucket-true layout as any other write
    spark.table("graft.db.ctas").collect().foreach { r =>
      assert(r.getAs[Int]("partition_id") ===
        IcebergLite.bucketOf(r.getAs[String]("conv_id"), 4))
    }
    // and the created table is a normal table afterwards
    sampleDf(5).createOrReplaceTempView("ctas_more")
    spark.sql(
      """INSERT INTO graft.db.ctas
        |SELECT conv_id, turn_idx, role, tool, text, ts FROM ctas_more""".stripMargin)
    assert(spark.table("graft.db.ctas").count() === 25L)
    assert(new IcebergLite(s"$warehouse/db/ctas")
      .snapshots.map(_.epochId) === Seq(0L, 1L))
  }

  test("CALL graft.system.history interleaves appends, mutations and " +
    "compactions by the gen watermark with honest stamps") {
    spark.sql(
      """CREATE TABLE graft.db.hist (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    Seq(0L, 1L).foreach { e =>
      sampleDf(8, base = 1767225600L + e * 1000).writeTo("graft.db.hist")
        .option("epoch", e.toString).option("queryId", "h").append()
    }
    spark.sql("DELETE FROM graft.db.hist WHERE turn_idx = 0")       // gen 1: 2 rows
    sampleDf(4, base = 1767229600L).writeTo("graft.db.hist")
      .option("epoch", "2").option("queryId", "h").append()          // after gen 1
    // the engine rewrite the SQL UPDATE rule delegates to (this shared
    // session has the catalog but not GraftExtensions; UpdateSpec covers
    // the SQL surface end-to-end)
    new IcebergLite(s"$warehouse/db/hist").updateWhere(spark,
      col("turn_idx") === 1, Seq("text" -> lit("x")),
      "turn_idx = 1")                                                // gen 2: 3 rows
    spark.sql("CALL graft.system.compact('db.hist')")                // comp gen 0

    val h = spark.sql("CALL graft.system.history('db.hist')").collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSeq
    assert(h.map(_._1) ===
      Seq("append", "append", "rewrite", "append", "rewrite", "compaction"))
    // exactly one of epoch_id/gen per row
    assert(h.forall(r => r._2.isDefined != r._3.isDefined))
    // content gens (1, 2) and the compaction's own layout gen (0) are
    // distinct sequences, exactly as on disk
    assert(h.map(r => r._2.orElse(r._3).get) === Seq(0L, 1L, 1L, 2L, 2L, 0L))
    // recorded change rows: 2 deleted; 3 updated -> pre+post = 6; null
    // for appends and the layout-only compaction
    assert(h.map(_._5) ===
      Seq(None, None, Some(2L), None, Some(6L), None))
    // operations carry the predicate / queryId the commit recorded
    assert(h(2)._4.toLowerCase.contains("turn_idx"))
    assert(h(5)._4.contains("replaces epochs"))
  }

  test("metadata tables .history and .files: the commit log and the live " +
    "file listing, composable in SQL") {
    spark.sql(
      """CREATE TABLE graft.db.meta (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    Seq(0L, 1L).foreach { e =>
      sampleDf(6, base = 1767225600L + e * 1000)
        .withColumn("turn_idx", col("turn_idx") + lit(e.toInt * 6))
        .writeTo("graft.db.meta")
        .option("epoch", e.toString).option("queryId", "m").append()
    }
    spark.sql("DELETE FROM graft.db.meta WHERE turn_idx < 2") // gen 1: 2 rows

    // .history serves exactly the CALL's rows — but as a table: WHERE,
    // aggregates and joins compose where CALL output does not
    val call = spark.sql("CALL graft.system.history('db.meta')").collect()
      .map(_.toSeq).toSet
    val hist = spark.table("graft.db.meta.history").collect().map(_.toSeq).toSet
    assert(hist === call && hist.size === 3)
    assert(spark.sql(
      """SELECT sum(num_rows) FROM graft.db.meta.history
        |WHERE kind = 'append'""".stripMargin)
      .collect().head.getLong(0) === 12L)

    // .files: exactly the live view's files, stats straight off the
    // manifests (no parquet opened)
    def files() = spark.table("graft.db.meta.files")
    assert(files().agg(sum("row_count")).collect().head.getLong(0) === 10L)
    assert(spark.table("graft.db.meta").count() === 10L)
    assert(files().filter(col("bucket") < 0 ||
      col("bucket") >= col("num_buckets")).count() === 0L)
    assert(files().filter(col("min_ts") > col("max_ts")).count() === 0L)
    val live = new IcebergLite(s"$warehouse/db/meta").effectiveFiles
      .map(_.path).toSet
    assert(files().select("path").collect().map(_.getString(0)).toSet === live)

    // the listing follows a compaction's layout swap, content unchanged
    spark.sql("CALL graft.system.compact('db.meta')")
    assert(files().agg(sum("row_count")).collect().head.getLong(0) === 10L)
    assert(files().select("num_buckets").distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(2))

    // an unknown metadata suffix is still just a missing table
    assertThrows[org.apache.spark.sql.AnalysisException](
      spark.table("graft.db.meta.nope").collect())
  }

  test("CALL graft.system.restore rolls back to an epoch or tag as a new " +
    "gen; history labels it; re-restoring the same state is a no-op") {
    spark.sql(
      """CREATE TABLE graft.db.rst (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    // keys stay unique across epochs (the CDC pairing contract)
    Seq(0L, 1L).foreach { e =>
      sampleDf(6, base = 1767225600L + e * 1000)
        .withColumn("turn_idx", col("turn_idx") + lit(e.toInt * 6))
        .writeTo("graft.db.rst")
        .option("epoch", e.toString).option("queryId", "r").append()
    }
    val want = spark.table("graft.db.rst")
      .select("conv_id", "turn_idx", "text").collect().toSet
    spark.sql("CALL graft.system.tag('db.rst', 'stable', 1)")
    spark.sql("DELETE FROM graft.db.rst WHERE turn_idx < 2")
    assert(spark.table("graft.db.rst").count() === 10L)

    val st = spark.sql("CALL graft.system.restore('db.rst', 'stable')")
      .collect().head
    assert(st.getLong(0) === 2L) // after the delete's gen 1
    assert(st.getLong(3) === 2L) // the 2 purged rows, re-inserted
    assert(spark.table("graft.db.rst")
      .select("conv_id", "turn_idx", "text").collect().toSet === want)

    // the unified commit log labels the restore by its op stamp
    val kinds = spark.sql("CALL graft.system.history('db.rst')")
      .collect().map(r => (r.getString(0), r.getString(3)))
    assert(kinds.map(_._1).toSeq ===
      Seq("append", "append", "rewrite", "restore"))
    assert(kinds.last._2.contains("RESTORE TO version (epoch 1, gen 0)"))

    // same state again: nothing to do, nothing committed
    assert(spark.sql("CALL graft.system.restore('db.rst', '1')")
      .collect().head.getLong(0) === -1L)
    // unknown version: loud, listing the tags
    val ex = intercept[Exception] {
      spark.sql("CALL graft.system.restore('db.rst', 'nope')").collect()
    }
    assert(ex.getMessage.contains("not an epoch id and not a tag"))
  }

  test("write-audit-publish through the catalog: writeTo staged=true " +
    "lands invisible, CALL staged/publish_staged/discard_staged drive " +
    "the audit") {
    spark.sql(
      """CREATE TABLE graft.db.wap (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='2')""".stripMargin)
    sampleDf(4).writeTo("graft.db.wap")
      .option("queryId", "w").append() // epoch 0, visible
    sampleDf(3, base = 1767229600L)
      .withColumn("turn_idx", col("turn_idx") + lit(100))
      .writeTo("graft.db.wap")
      .option("queryId", "audit").option("staged", "true").append() // epoch 1
    assert(spark.table("graft.db.wap").count() === 4L)

    val staged = spark.sql("CALL graft.system.staged('db.wap')").collect()
    assert(staged.length === 1)
    assert(staged.head.getLong(0) === 1L && staged.head.getLong(4) === 3L)

    // audit passed: publish; the rows appear atomically
    spark.sql("CALL graft.system.publish_staged('db.wap', 1)")
    assert(spark.table("graft.db.wap").count() === 7L)
    assert(spark.sql("CALL graft.system.staged('db.wap')").collect().isEmpty)

    // a second stage, rejected by the audit this time
    sampleDf(2, base = 1767239600L)
      .withColumn("turn_idx", col("turn_idx") + lit(200))
      .writeTo("graft.db.wap")
      .option("queryId", "audit2").option("staged", "true").append() // epoch 2
    assert(spark.table("graft.db.wap").count() === 7L)
    // the SQL audit surface: graft.db.t.staged serves the invisible rows
    // with their stage identity
    val audit = spark.sql(
      """SELECT _staged_epoch, _reserved_gen, turn_idx
        |FROM graft.db.wap.staged ORDER BY turn_idx""".stripMargin).collect()
    assert(audit.length === 2)
    assert(audit.forall(r => r.getLong(0) === 2L && r.getLong(1) === 2L))
    assert(audit.map(_.getInt(2)).toSeq === Seq(200, 201))
    assert(spark.sql("CALL graft.system.discard_staged('db.wap', 2)")
      .collect().head.getInt(0) > 0)
    assert(spark.table("graft.db.wap.staged").count() === 0L)
    assert(spark.table("graft.db.wap").count() === 7L)
    // the commit log labels the publish by its op stamp
    val kinds = spark.sql("CALL graft.system.history('db.wap')")
      .collect().map(_.getString(0)).toSeq
    assert(kinds === Seq("append", "publish", "append"))
  }

  test("branches through the catalog: create_branch, writeTo branch option, " +
    "audit read, atomic fast_forward, drop") {
    spark.sql(
      """CREATE TABLE graft.db.br (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    sampleDf(6).writeTo("graft.db.br").append()
    spark.sql("CALL graft.system.create_branch('db.br', 'audit')")
    // two writes land ON the branch — invisible to the main table
    sampleDf(3, base = 1767225600L + 9000L).writeTo("graft.db.br")
      .option("branch", "audit").append()
    sampleDf(2, base = 1767225600L + 18000L).writeTo("graft.db.br")
      .option("branch", "audit").append()
    assert(spark.table("graft.db.br").count() === 6L)
    val listed = spark.sql("CALL graft.system.branches('db.br')").collect()
    assert(listed.length === 1)
    assert(listed.head.getString(0) === "audit")
    assert(listed.head.getLong(2) === 2L)
    // audit the branch view through the reader option
    val branchView = spark.read.option("branch", "audit").table("graft.db.br")
    assert(branchView.count() === 11L)
    // one CALL publishes the whole chain atomically
    val activated = spark.sql("CALL graft.system.fast_forward('db.br', 'audit')")
      .collect().map(_.getLong(0)).toSeq
    assert(activated.length === 2)
    assert(spark.table("graft.db.br").count() === 11L)
    assert(spark.sql("CALL graft.system.branches('db.br')").count() === 0L)
    // history labels the publish op
    val kinds = spark.sql("CALL graft.system.history('db.br')")
      .collect().map(_.getString(0)).toSeq
    assert(kinds.contains("fast_forward"))
    // a rejected branch drops completely
    spark.sql("CALL graft.system.create_branch('db.br', 'scratch')")
    sampleDf(2, base = 1767225600L + 27000L).writeTo("graft.db.br")
      .option("branch", "scratch").append()
    spark.sql("CALL graft.system.drop_branch('db.br', 'scratch')")
    assert(spark.table("graft.db.br").count() === 11L)
    assert(spark.sql("CALL graft.system.branches('db.br')").count() === 0L)
  }
}
