package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures what the round-5 scan-side pruning levels buy, each isolated by
  * its session toggle on a corpus shaped like the at-scale layout:
  *
  *  - **conv_id bounds** (manifest): 48 epochs with time-correlated conv
  *    ids — a recent conv's lookup plans `boundsFiles` files vs
  *    `noBoundsFiles` under bucket routing alone (counted on the same
  *    manifests with bounds stripped, so the contrast is exact, not A/B
  *    noise). At 10^6 epochs this is the difference between opening one
  *    file and opening every epoch's bucket file.
  *  - **parquet row-group skipping** (`spark.sql.graft.
  *    parquetFilterPushdown`): point lookup on the FULL-COMPACTED table —
  *    8 bucket files, each conv-sorted with many 1 MiB row groups; with
  *    the predicate the reader decodes ~1 group, without it the whole
  *    bucket file.
  *  - **metadata aggregate pushdown** (`spark.sql.graft.
  *    aggregatePushdown`): `count()` answered from manifests vs the old
  *    shape iterating one empty row per table row.
  *  - **runtime join filtering** (`spark.sql.optimizer.
  *    dynamicPartitionPruning.enabled`): equi-join against a 1%-of-convs
  *    parquet dim — files planned with/without the runtime IN-list, and
  *    the end-to-end times.
  *
  * Prints ONE JSON line; medians of 5 timed reps after one untimed warm-up
  * per variant (sub-second queries on this corpus — the SHAPE is the
  * claim, the counts are the proof). */
object PruneBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def median5(f: => Unit): Double = {
    f // warm-up
    val xs = (1 to 5).map(_ => timeS(f)).sorted
    xs(2)
  }

  /** Full consumption: crc32 over the payload defeats metadata shortcuts. */
  private def drain(df: DataFrame): Unit = {
    df.agg(count(lit(1)), sum(crc32(col("text")))).collect(); ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // small parquet row groups so one bucket file holds MANY groups —
      // the at-scale shape (a 1 GiB file has ~8 groups at the 128 MiB
      // default; here 1 MiB groups stand in for them)
      .config("spark.hadoop.parquet.block.size", (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = "/tmp/graft-prune-bench"
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }

    val buckets = 8
    val epochs = 48
    val convsPerEpoch = 256
    val turns = 80
    val base = 1767225600L * 1000000L
    // high-entropy payload (a constant compresses the data files to
    // nothing and decode cost vanishes into fixed query overhead)
    def payload(e: Int, c: Int, i: Int): String = {
      val seed = (e.toLong * 1000003L + c) * 1000003L + i
      val r = new java.util.Random(seed)
      val sb = new java.lang.StringBuilder(96)
      (0 until 12).foreach(_ => sb.append(f"${r.nextLong()}%016x"))
      sb.toString
    }

    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp, text string", buckets)
    (0 until epochs).foreach { e =>
      // time-correlated ids: epoch e mints convs [e*cpe, (e+1)*cpe)
      val rows = for (c <- 0 until convsPerEpoch; i <- 0 until turns) yield
        (f"c${e.toLong * convsPerEpoch + c}%08d", i,
          new java.sql.Timestamp((base + e * 3600L * 1000000L +
            c * 1000000L + i) / 1000L), payload(e, c, i))
      assert(table.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "ts", "text"), "bench", e, buckets))
    }
    val totalRows = epochs.toLong * convsPerEpoch * turns

    def conn() = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", root).load()

    // ---- conv bounds: planned files, exact contrast on the same manifests
    val target = f"c${(epochs - 1).toLong * convsPerEpoch + 17}%08d"
    val sets = table.effectiveFileSets
    val boundsFiles =
      IcebergLite.pruneFileSets(sets, None, None, Some(target)).length
    val strippedSets = sets.map(fs => fs.copy(files =
      fs.files.map(_.copy(convIdMin = None, convIdMax = None))))
    val noBoundsFiles =
      IcebergLite.pruneFileSets(strippedSets, None, None, Some(target)).length

    def lookup(): Unit = drain(conn().filter(col("conv_id") === target))
    val lookupSec = median5(lookup())

    // ---- runtime join filtering BEFORE compaction (the multi-epoch
    // layout is where file-level runtime pruning has something to drop:
    // the dim's convs admit only their own epochs' files via the bounds)
    val dimPath = s"$root-dim"
    (0 until epochs).flatMap(e => Seq(
        (f"c${e.toLong * convsPerEpoch + 1}%08d", "keep"),
        (f"c${e.toLong * convsPerEpoch + 2}%08d", "keep"),
        (f"c${e.toLong * convsPerEpoch + 3}%08d", "drop")))
      .toDF("conv_id", "tag").write.mode("overwrite").parquet(dimPath)
    def joinRun(): Unit = drain(conn().join(
      spark.read.parquet(dimPath).filter(col("tag") === "keep"),
      Seq("conv_id")))
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    graft.sources.IcebergLiteScan.lastRuntimePlan = None
    val dppOnSec = median5(joinRun())
    val dppPlan = graft.sources.IcebergLiteScan.lastRuntimePlan
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    val dppOffSec = median5(joinRun())
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")

    // ---- parquet row-group skipping on the compacted table
    table.compact(spark, numBuckets = buckets, full = true)
    def setPq(on: Boolean): Unit =
      spark.conf.set("spark.sql.graft.parquetFilterPushdown", on.toString)
    setPq(true)
    val compactLookupOn = median5(lookup())
    setPq(false)
    val compactLookupOff = median5(lookup())
    setPq(true)

    // ---- metadata aggregate pushdown vs the old iterate-empty-rows shape
    def setAgg(on: Boolean): Unit =
      spark.conf.set("spark.sql.graft.aggregatePushdown", on.toString)
    var n1 = 0L; var n2 = 0L
    setAgg(true)
    val countPushedSec = median5 { n1 = conn().count() }
    setAgg(false)
    val countIteratedSec = median5 { n2 = conn().count() }
    setAgg(true)
    assert(n1 == totalRows && n2 == totalRows, s"count mismatch $n1 $n2")

    val json =
      s"""{"metric":"prune_bench","unit":"sec","rows":$totalRows,""" +
      s""""epochs":$epochs,"buckets":$buckets,""" +
      s""""lookupFilesBounds":$boundsFiles,"lookupFilesNoBounds":$noBoundsFiles,""" +
      s""""lookupSec":$lookupSec,""" +
      s""""compactLookupPqOnSec":$compactLookupOn,""" +
      s""""compactLookupPqOffSec":$compactLookupOff,""" +
      s""""countPushedSec":$countPushedSec,"countIteratedSec":$countIteratedSec,""" +
      s""""dppFilesBefore":${dppPlan.map(_._1).getOrElse(-1)},""" +
      s""""dppFilesAfter":${dppPlan.map(_._2).getOrElse(-1)},""" +
      s""""dppOnSec":$dppOnSec,"dppOffSec":$dppOffSec}"""
    println(json)
    spark.stop()
  }
}
