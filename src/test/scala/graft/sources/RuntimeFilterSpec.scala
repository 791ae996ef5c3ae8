package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.In

import graft.SparkSpec
import graft.table.IcebergLite

/** Runtime join filtering ([[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]]):
  * the conv_id IN-list Spark derives from the small side of an equi-join
  * prunes this scan's FILES at execution time (bucket routing + conv
  * bounds), while the reported key-grouped partitioning stays valid
  * (pruned buckets keep their partition with an empty file list). */
class RuntimeFilterSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def tsAt(deltaMicros: Long): java.sql.Timestamp =
    new java.sql.Timestamp((baseMicros + deltaMicros) / 1000L)

  /** 3 epochs x 4 buckets, 8 convs. */
  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("rt-filter")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
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

  private def fileCount(scan: IcebergLiteScan): Int =
    scan.toBatch.planInputPartitions().map {
      case FilePartition(paths, _, _) => paths.length
      case BucketFilePartition(_, paths, _, _) => paths.length
    }.sum

  test("scan.filter prunes planned files to the IN-list's buckets") {
    val table = buildTable()
    val scan = scanOf(conn(table))
    val before = fileCount(scan)
    assert(before === 12, "3 epochs x 4 buckets")
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("conv_id", Array[Any]("conv0"))))
    assert(fileCount(scan) === 3, "one bucket's file per epoch")
    // an empty build side prunes everything
    scan.filter(Array[org.apache.spark.sql.sources.Filter](In("conv_id", Array[Any]())))
    assert(fileCount(scan) === 0)
  }

  test("key-grouped path: same bucket partitions, pruned ones empty") {
    val table = buildTable()
    spark.conf.set("spark.sql.graft.preserveDataGrouping", "true")
    try {
      val scan = scanOf(conn(table))
      val parts0 = scan.toBatch.planInputPartitions()
      assert(parts0.length === 4)
      assert(parts0.forall(_.isInstanceOf[BucketFilePartition]))
      scan.filter(Array[org.apache.spark.sql.sources.Filter](In("conv_id", Array[Any]("conv0"))))
      val parts1 = scan.toBatch.planInputPartitions()
      // partition KEYS unchanged (Spark rejects key changes after filter);
      // only the file lists shrink
      assert(parts1.length === 4)
      assert(parts1.map(_.asInstanceOf[BucketFilePartition].bucketId).toSeq ===
        parts0.map(_.asInstanceOf[BucketFilePartition].bucketId).toSeq)
      val nonEmpty = parts1.map(_.asInstanceOf[BucketFilePartition])
        .filter(_.paths.nonEmpty)
      assert(nonEmpty.length === 1)
      assert(nonEmpty.head.paths.length === 3)
    } finally spark.conf.unset("spark.sql.graft.preserveDataGrouping")
  }

  test("end-to-end: equi-join with a filtered small dim prunes files at runtime, result exact") {
    import spark.implicits._
    val table = buildTable()
    IcebergLiteScan.lastRuntimePlan = None
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      // the dim must be a REAL source (a LocalRelation folds its filter
      // away at optimization, leaving no selective predicate for the
      // dynamic-pruning heuristic), and EqualTo is "likely selective"
      val dimPath = tmpDir("rt-dim")
      Seq(("conv1", "keep"), ("conv2", "drop"), ("conv6", "keep"),
        ("conv7", "drop")).toDF("conv_id", "tag")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("tag") === "keep")
      val joined = conn(table)
        .join(dim, Seq("conv_id"))
        .groupBy("conv_id").agg(count(lit(1)).as("n"))
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("conv1" -> 15L, "conv6" -> 15L))
      // the runtime filter must actually have fired and pruned files
      val plan = IcebergLiteScan.lastRuntimePlan
      assert(plan.isDefined, "dynamic pruning did not reach the scan")
      val (before, after) = plan.get
      assert(before === 12)
      assert(after < before, s"runtime filter pruned nothing ($before -> $after)")
    } finally
      spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
  }
}
