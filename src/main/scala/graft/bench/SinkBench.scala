package graft.bench

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.table.IcebergLite

/** Sink-path isolation bench: the SAME pass-through stream (sliced parquet
  * source, one slice per micro-batch, no stateful operators) written through
  *
  *  - `foreachBatch` → [[IcebergLite.commitEpoch]] — the driver-coordinated
  *    sink the redaction pipeline uses: one extra Spark job per batch,
  *    planned on the driver, repartition+sort inside;
  *  - the native DSv2 streaming write ([[graft.sources.EpochStreamingWrite]])
  *    — Spark arranges the rows via the write's required distribution and
  *    tasks write final bucket files; the driver commits metadata only.
  *
  * Both land identical table layouts (bucketed, sorted, idempotent epoch
  * commits), so the delta is pure sink machinery. Reps INTERLEAVE the two
  * modes (round-4 ADVICE: back-to-back same-mode reps flatter whichever
  * runs second on page cache) with one untimed warm-up of each. Prints one
  * JSON line; medians go to BENCH.md. */
object SinkBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.size / 2)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val reps = sys.env.getOrElse("GRAFT_SINKBENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sink-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val slices = StreamBench.ensureSlices(spark, sfDir)
    val (benchRoot, fsType) = StreamBench.pickBenchRoot()
    val buckets = spark.sparkContext.defaultParallelism
    val schema = spark.read.parquet(slices).schema

    def runOnce(mode: String): (Long, Double) = {
      val work = Files.createTempDirectory(benchRoot, s"sinkbench-$mode")
      try {
        val root = work.resolve("table").toString
        val cp = work.resolve("cp").toString
        val table = new IcebergLite(root)
        table.create(schema.toDDL, buckets)
        val src = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(slices)
        val t0 = System.nanoTime()
        val q = mode match {
          case "foreachBatch" =>
            src.writeStream.option("checkpointLocation", cp)
              .foreachBatch {
                (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                 id: Long) =>
                  table.commitEpoch(df, "sink-bench", id, buckets)
                  ()
              }
              .trigger(Trigger.AvailableNow()).start()
          case "native" =>
            src.writeStream.format("graft.sources.IcebergLiteSource")
              .option("path", root)
              .option("checkpointLocation", cp)
              .trigger(Trigger.AvailableNow()).start()
        }
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val turns = new IcebergLite(root).partitionMetrics.values.sum
        (turns, sec)
      } finally {
        try Files.walk(work).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
        catch { case _: Throwable => }
      }
    }

    val modes = Seq("foreachBatch", "native")
    modes.foreach(runOnce) // untimed warm-up of both
    val results = (0 until reps).flatMap { r =>
      val order = if (r % 2 == 0) modes else modes.reverse
      order.map(m => m -> runOnce(m))
    }
    val byMode = results.groupBy(_._1).map { case (m, rs) =>
      val turns = rs.head._2._1
      val secs = rs.map(_._2._2)
      val tps = secs.map(turns / _)
      m -> (turns, median(secs), median(tps), secs)
    }
    val detail = byMode.toSeq.sortBy(_._1).map { case (m, (turns, sec, tps, secs)) =>
      s""""$m":{"turns":$turns,"medianSec":$sec,"medianTps":${tps.toLong},""" +
        s""""reps":[${secs.map(x => f"$x%.3f").mkString(",")}]}"""
    }.mkString(",")
    val ratio = byMode("native")._3 / byMode("foreachBatch")._3
    // scalastyle:off println
    println(s"""{"metric":"sink_bench","fs":"$fsType","cpus":$cpus,""" +
      s""""buckets":$buckets,"nativeOverForeachBatch":${f"$ratio%.3f"},$detail}""")
    // scalastyle:on println
    spark.stop()
  }
}
