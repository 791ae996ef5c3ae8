package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IcebergLite

/** Limit pushdown: `LIMIT n` plans only enough files (by exact manifest
  * row counts) to cover n rows — `SELECT * LIMIT 100` on a 10^12-row
  * table plans one file. Partial pushdown: Spark's own Limit still trims,
  * so correctness never depends on the cap. */
class LimitPushdownSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("limit-push")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, new java.sql.Timestamp((baseMicros +
          ep * 3600L * 1000000L + c * 60L * 1000000L + i) / 1000L))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  private def conn(table: IcebergLite) =
    spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan.asInstanceOf[IcebergLiteScan]
    }.head.toBatch.planInputPartitions().map {
      case FilePartition(paths, _, _) => paths.length
      case BucketFilePartition(_, paths, _, _) => paths.length
    }.sum

  test("LIMIT plans only enough files; result size exact") {
    val table = buildTable()
    // minimal file prefix (manifest order) covering n rows — buckets are
    // murmur-distributed, so per-file row counts vary
    def minFiles(n: Long): Int = {
      val counts = table.effectiveFileSets.flatMap(_.files).map(_.rowCount)
      var acc = 0L
      counts.takeWhile { c => val need = acc < n; acc += c; need }.length
    }
    val limited = conn(table).limit(7)
    assert(plannedFiles(limited) === minFiles(7))
    assert(plannedFiles(limited) < 12, "a small LIMIT must not plan the table")
    assert(limited.collect().length === 7)
    val mid = conn(table).limit(25)
    assert(plannedFiles(mid) === minFiles(25))
    assert(mid.collect().length === 25)
    // LIMIT beyond the table plans everything and returns everything
    val all = conn(table).limit(10000)
    assert(plannedFiles(all) === 12)
    assert(all.collect().length === 3 * 8 * 5)
  }

  test("LIMIT under a filter is NOT file-capped (residual rows could starve it)") {
    val table = buildTable()
    val filtered = conn(table).filter(col("conv_id") === "conv3").limit(7)
    // the filter prunes to conv3's bucket (3 files), and the limit must
    // not cap below that — all bucket files stay planned
    assert(plannedFiles(filtered) === 3)
    assert(filtered.collect().length === 7)
  }
}
