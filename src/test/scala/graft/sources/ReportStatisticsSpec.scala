package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IcebergLite

/** Manifest-backed scan statistics ([[org.apache.spark.sql.connector.read.SupportsReportStatistics]]):
  * exact row counts and recorded on-disk bytes, AFTER pruning — what lets
  * Spark auto-broadcast a small graft dim and cost dynamic pruning on real
  * numbers instead of the unbroadcastable DSv2 default size. */
class ReportStatisticsSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def tsAt(d: Long) = new java.sql.Timestamp((baseMicros + d) / 1000L)

  private def buildTable(n: Int = 8): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("stats-table")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 2L).foreach { ep =>
      val rows = for (c <- 0 until n; i <- 0 until 5) yield
        (s"conv$c", i, tsAt(ep * 3600L * 1000000L + c * 60L * 1000000L + i))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  private def conn(table: IcebergLite) =
    spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): IcebergLiteScan =
    df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[IcebergLiteScan]
    }.head

  test("manifest records on-disk bytes; scan stats are exact") {
    val table = buildTable()
    val files = table.effectiveFiles
    assert(files.forall(_.sizeBytes > 0L))
    val onDisk = files.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(s"${table.root}/${f.path}"))).sum
    val st = scanOf(conn(table)).estimateStatistics()
    assert(st.numRows().getAsLong === 2L * 8L * 5L)
    assert(st.sizeInBytes().getAsLong === onDisk)
  }

  test("stats reflect the PRUNED scan, not the table") {
    val table = buildTable()
    val all = scanOf(conn(table)).estimateStatistics()
    val sliced = scanOf(conn(table).filter(col("conv_id") === "conv0"))
      .estimateStatistics()
    assert(sliced.numRows().getAsLong < all.numRows().getAsLong)
    assert(sliced.sizeInBytes().getAsLong < all.sizeInBytes().getAsLong)
    assert(sliced.numRows().getAsLong > 0L)
  }

  test("a small graft table auto-broadcasts against a bigger side") {
    import spark.implicits._
    val table = buildTable()
    // a parquet side big enough to exceed the lowered threshold, while the
    // graft table's recorded bytes stay under it
    val bigPath = tmpDir("stats-big")
    (0 until 20000).map(i => (s"conv${i % 8}", "p" * 40))
      .toDF("conv_id", "pad").write.mode("overwrite").parquet(bigPath)
    val graftBytes = table.effectiveFiles.map(_.sizeBytes).sum
    val threshold = math.max(graftBytes * 2, 65536L)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      val joined = spark.read.parquet(bigPath)
        .join(conn(table), Seq("conv_id"))
      val bhj = joined.queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      // before SupportsReportStatistics the graft side reported the DSv2
      // default (effectively infinite) and this planned as a sort-merge
      assert(bhj.nonEmpty, "graft side must be chosen as the broadcast build\n" +
        joined.queryExecution.sparkPlan.toString)
      // 8 convs x (2500 big-side rows x 10 graft turns) = 200k
      assert(joined.count() === 200000L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("older manifests without sizes fall back to a schema-based estimate") {
    val table = buildTable()
    val sets = table.effectiveFileSets
    // simulate a pre-round-5 manifest in memory
    val stripped = sets.map(fs => fs.copy(files = fs.files.map(_.copy(sizeBytes = -1L))))
    val rows = stripped.flatMap(_.files).map(_.rowCount).sum
    assert(rows > 0L)
    // the scan path only sees real manifests; the fallback arithmetic is
    // rows x schema default width — just pin that sizes really are absent
    assert(stripped.flatMap(_.files).forall(_.sizeBytes < 0L))
  }
}
