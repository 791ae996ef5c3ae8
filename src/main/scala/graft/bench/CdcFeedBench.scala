package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.{IcebergLite, TableChanges, TableVersion}

/** Measures the CDC read-side cost model the recorded change feed buys:
  *
  *  - the RECORDED feed (`readChangeFeed`) scans only the change rows the
  *    mutation wrote at commit time — O(matched rows);
  *  - the NET-DIFF reconstruction ([[TableChanges.between]]) re-reads the
  *    churned files of BOTH views in full and pairs them with a key join —
  *    O(rows of touched files), regardless of how few rows matched.
  *
  * Both are churn-bounded (manifest-first; untouched files never open), so
  * the contrast is DENSITY: a sparse mutation (one turn per conversation —
  * the redaction-correction shape) changes 1.6% of the touched files' rows,
  * and the feed should win by roughly the density factor; a dense mutation
  * (half the touched files' rows) should converge. The commit-time price of
  * recording (the extra O(matched) change-file writes inside
  * UPDATE/DELETE/MERGE) is reported alongside as `updateSec` — read it
  * against the pre-CDC MutationBench table in BENCH.md.
  *
  * Prints one JSON line. Single-shot timings after an untimed warm-up
  * (multi-second jobs; the shape is the claim). */
object CdcFeedBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Force a full consumption of every row (hash over the payload column
    * defeats any metadata shortcut). */
  private def drain(df: DataFrame): Long =
    df.agg(count(lit(1)), sum(crc32(col("text")))).collect()(0).getLong(0)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val buckets = 32
    val base = 1767225600L * 1000000L
    val convs = 2048; val turns = 64; val epochs = 4 // 524k rows

    def deleteTree(root: String): Unit = {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    }

    def build(root: String, nConvs: Int, nTurns: Int, nEpochs: Int): IcebergLite = {
      val t = new IcebergLite(root)
      t.create("conv_id string, turn_idx int, role string, text string, ts timestamp",
        buckets)
      (0L until nEpochs.toLong).foreach { ep =>
        val df = spark.range(nConvs.toLong * nTurns)
          .select(
            format_string("conv%06d", (col("id") / nTurns).cast("long")).as("conv_id"),
            (col("id") % nTurns + lit(ep * nTurns)).cast("int").as("turn_idx"),
            when(col("id") % 3 === 0, "user").otherwise("assistant").as("role"),
            concat(lit("turn text payload "), col("id")).as("text"),
            timestamp_micros(lit(base) + col("id") * 1000L +
              lit(ep * 3600L * 1000000L)).as("ts"))
        require(t.commitEpoch(df, "bench", ep, buckets))
      }
      t
    }

    def feedDf(root: String, from: TableVersion, to: TableVersion): DataFrame =
      spark.read.format("graft.sources.IcebergLiteSource")
        .option("path", root).option("readChangeFeed", "true")
        .option("fromEpoch", from.epoch).option("fromGen", from.gen)
        .option("toEpoch", to.epoch).option("toGen", to.gen)
        .load()

    // untimed warm-up (JIT, codegen, parquet reader/writer init)
    locally {
      val root = "/tmp/graft-cdcbench-warm"
      deleteTree(root)
      val t = build(root, 64, 8, 1)
      val v0 = t.currentVersion
      t.updateWhere(spark, col("turn_idx") === 0,
        Seq("text" -> lit("w")), "warmup")
      val v1 = t.currentVersion
      drain(feedDf(root, v0, v1))
      drain(TableChanges.between(spark, root, v0, Some(v1)))
    }

    // density points: matched rows per touched file (epoch-0 slice holds
    // turn_idx 0..63, so `< d` matches d/64 of each epoch-0 file and
    // nothing else — touched files identical across points)
    val points = Seq(1, 32).map { d =>
      val root = s"/tmp/graft-cdcbench-d$d"
      deleteTree(root)
      val t = build(root, convs, turns, epochs)
      val v0 = t.currentVersion
      var matched = 0L
      val updS = timeS {
        matched = t.updateWhere(spark, col("turn_idx") < d,
          Seq("text" -> lit("corrected")), s"bench d=$d")
      }
      val v1 = t.currentVersion
      // churned-file volume the net diff must re-read: epoch-0 files in
      // both views (pre + rewritten post)
      val epoch0Rows = convs.toLong * turns
      var feedRows = 0L; var diffRows = 0L
      val feedS = timeS { feedRows = drain(feedDf(root, v0, v1)) }
      val diffS = timeS {
        diffRows = drain(TableChanges.between(spark, root, v0, Some(v1)))
      }
      require(feedRows == 2 * matched && diffRows == 2 * matched,
        s"both views must deliver the same change rows: $feedRows / $diffRows")
      (d, matched, epoch0Rows, updS, feedS, diffS)
    }

    val pointsJson = points.map { case (d, m, e0, u, f, b) =>
      s"""{"density":${d / 64.0},"matchedRows":$m,"touchedFileRows":${2 * e0},""" +
        f""""updateSec":$u%.3f,"recordedFeedSec":$f%.3f,"netDiffSec":$b%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"cdc_feed_read","buckets":$buckets,""" +
      s""""rows":${convs.toLong * turns * epochs},"points":$pointsJson}""")
    spark.stop()
  }
}
