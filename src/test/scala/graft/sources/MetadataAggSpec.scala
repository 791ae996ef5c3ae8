package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IcebergLite

/** Metadata-only aggregate pushdown: unfiltered global COUNT(*)/MIN(ts)/
  * MAX(ts) answered straight from the manifests (complete pushdown — no
  * aggregate in the plan, no data IO), declining cleanly everywhere the
  * manifests are not the exact answer. */
class MetadataAggSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def tsAt(deltaMicros: Long): java.sql.Timestamp =
    new java.sql.Timestamp((baseMicros + deltaMicros) / 1000L)

  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("meta-agg")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 6; i <- 0 until 4) yield
        (s"conv$c", i, tsAt(ep * 3600L * 1000000L + c * 60L * 1000000L + i))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  private def conn(table: IcebergLite) =
    spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()

  // sparkPlan (pre-adaptive): AQE wraps filtered/grouped plans and hides
  // the scan from executedPlan.collect until execution
  private def scanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan
    }.head

  test("count/min/max pushed: MetadataAggScan in the plan, values exact") {
    val table = buildTable()
    val agg = conn(table).agg(count(lit(1)).as("n"),
      min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    assert(scanOf(agg).isInstanceOf[MetadataAggScan],
      s"expected metadata agg scan, got ${scanOf(agg)}")
    val row = agg.collect().head
    val native = table.read(spark).agg(count(lit(1)), min(col("ts")), max(col("ts")))
      .collect().head
    assert(row.getLong(0) === native.getLong(0))
    assert(row.getTimestamp(1) === native.getTimestamp(1))
    assert(row.getTimestamp(2) === native.getTimestamp(2))
    assert(row.getLong(0) === 3L * 6L * 4L)
  }

  test("df.count() routes through the pushdown and stays exact") {
    val table = buildTable()
    assert(conn(table).count() === 3L * 6L * 4L)
  }

  test("filters, GROUP BY, and unsupported functions all decline") {
    val table = buildTable()
    // filtered: must NOT claim the pushdown (rows need the residual check)
    val filtered = conn(table).filter(col("conv_id") === "conv1")
      .agg(count(lit(1)).as("n"))
    assert(!scanOf(filtered).isInstanceOf[MetadataAggScan])
    assert(filtered.collect().head.getLong(0) === 3L * 4L)
    // group by: declined
    val grouped = conn(table).groupBy("conv_id").agg(count(lit(1)).as("n"))
    assert(!scanOf(grouped).isInstanceOf[MetadataAggScan])
    assert(grouped.count() === 6L)
    // min on a non-ts column: declined (manifest has no such stats)
    val minIdx = conn(table).agg(min(col("turn_idx")).as("m"))
    assert(!scanOf(minIdx).isInstanceOf[MetadataAggScan])
    assert(minIdx.collect().head.getInt(0) === 0)
    // sum: declined
    val sumIdx = conn(table).agg(sum(col("turn_idx")).as("s"))
    assert(!scanOf(sumIdx).isInstanceOf[MetadataAggScan])
  }

  test("post-DELETE the pushed aggregates serve the effective view") {
    val table = buildTable()
    table.deleteWhere(spark, col("conv_id") === "conv2", "conv_id = 'conv2'")
    val agg = conn(table).agg(count(lit(1)).as("n"), min(col("ts")).as("lo"),
      max(col("ts")).as("hi"))
    assert(scanOf(agg).isInstanceOf[MetadataAggScan])
    val row = agg.collect().head
    val native = table.read(spark)
      .agg(count(lit(1)), min(col("ts")), max(col("ts"))).collect().head
    assert(row.getLong(0) === native.getLong(0))
    assert(row.getLong(0) === 3L * 5L * 4L)
    assert(row.getTimestamp(1) === native.getTimestamp(1))
    assert(row.getTimestamp(2) === native.getTimestamp(2))
  }

  test("time travel: the pinned epoch's own count/min/max") {
    val table = buildTable()
    val agg = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).option("asOfEpoch", "0").load()
      .agg(count(lit(1)).as("n"), max(col("ts")).as("hi"))
    assert(scanOf(agg).isInstanceOf[MetadataAggScan])
    val row = agg.collect().head
    assert(row.getLong(0) === 6L * 4L)
    val nativeHi = table.readAsOf(spark, 0L).agg(max(col("ts"))).collect().head
    assert(row.getTimestamp(1) === nativeHi.getTimestamp(0))
  }

  test("time travel onto a sentinel (all-null ts) epoch declines MIN/MAX " +
      "instead of serving 1970 (gate validates the SAME view as the scan)") {
    import spark.implicits._
    val root = tmpDir("meta-agg-sentinel")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    val nulls = (0 until 6).map(i => (s"conv$i", i, null: java.sql.Timestamp))
    assert(table.commitEpoch(nulls.toDF("conv_id", "turn_idx", "ts"), "w", 0L, 2))
    // a later delete rewrites the sentinel file out of the LIVE view only
    table.deleteWhere(spark, col("ts").isNull, "ts IS NULL")
    val live = (0 until 4).map(i => (s"conv$i", i, tsAt(i)))
    assert(table.commitEpoch(live.toDF("conv_id", "turn_idx", "ts"), "w", 1L, 2))
    // live: no sentinel file left -> pushdown serves, exact
    val liveAgg = conn(table).agg(min(col("ts")).as("lo"))
    assert(scanOf(liveAgg).isInstanceOf[MetadataAggScan])
    assert(liveAgg.collect().head.getTimestamp(0) === tsAt(0))
    // asOf 0: the HISTORICAL file set still holds the sentinel file — the
    // gate must validate that set and decline, so the real scan answers
    // NULL (all ts null at epoch 0), not the 1970 sentinel
    val travel = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).option("asOfEpoch", "0").load()
      .agg(min(col("ts")).as("lo"))
    assert(!scanOf(travel).isInstanceOf[MetadataAggScan],
      "asOf view containing a sentinel file must decline the pushdown")
    assert(travel.collect().head.isNullAt(0))
    // COUNT is stats-independent: still served from metadata under asOf
    val cnt = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).option("asOfEpoch", "0").load()
      .agg(count(lit(1)).as("n"))
    assert(scanOf(cnt).isInstanceOf[MetadataAggScan])
    assert(cnt.collect().head.getLong(0) === 6L)
  }

  test("empty table: count 0, min/max null") {
    import spark.implicits._
    val root = tmpDir("meta-agg-empty")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 2)
    val agg = conn(table).agg(count(lit(1)).as("n"), min(col("ts")).as("lo"))
    assert(scanOf(agg).isInstanceOf[MetadataAggScan])
    val row = agg.collect().head
    assert(row.getLong(0) === 0L)
    assert(row.isNullAt(1))
  }
}
