package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures the scale shape of [[graft.table.IcebergLite.compact]]'s
  * default INCREMENTAL mode: wall time must grow with the epochs being
  * folded (the churn since the last compaction) and must NOT grow with
  * the already-compacted corpus it reuses — the property that makes
  * "compact the day's micro-batches" on a 10^12-turn table a bounded
  * maintenance call. The full rewrite (`full = true`, the periodic
  * re-cluster) is timed on the same state as the corpus-proportional
  * contrast.
  *
  * Corpus sweep: tables at ×1 / ×4 corpus (pre-compacted fully, untimed),
  * then an identical churn of fresh epochs — the incremental fold reads
  * only the churn at both points. Each point is BEST-OF-3 over freshly
  * rebuilt tables (compaction consumes its input state; content is
  * deterministic, so rebuilds are exact); min converges from below under
  * this box's one-sided CPU-steal noise (BENCH.md). Prints one JSON
  * line. */
object CompactionBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val buckets = 32
    val base = 1767225600L * 1000000L
    val convs = 2048; val turns = 64; val baseEpochs = 4 // 512k rows at x1

    def deleteTree(root: String): Unit = {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    }

    def epochDf(ep: Long) = spark.range(convs.toLong * turns)
      .select(
        format_string("conv%06d", (col("id") / turns).cast("long")).as("conv_id"),
        (col("id") % turns + lit(ep * turns)).cast("int").as("turn_idx"),
        when(col("id") % 3 === 0, "user").otherwise("assistant").as("role"),
        concat(lit("turn text payload "), col("id")).as("text"),
        timestamp_micros(lit(base) + col("id") * 1000L +
          lit(ep * 3600L * 1000000L)).as("ts"))

    /** Corpus of `mult * baseEpochs` epochs, fully compacted (untimed
      * setup), plus `churnEpochs` fresh epochs awaiting the fold. Returns
      * the table and the PRE-churn corpus row count (what the incremental
      * fold reuses — the churn rows are reported separately). */
    def build(root: String, mult: Int, churnEpochs: Int): (IcebergLite, Long) = {
      deleteTree(root)
      val t = new IcebergLite(root)
      t.create(
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
        buckets)
      val corpusEpochs = baseEpochs.toLong * mult
      (0L until corpusEpochs).foreach { ep =>
        require(t.commitEpoch(epochDf(ep), "bench", ep, buckets))
      }
      require(t.compact(spark, buckets, full = true) >= 0L)
      val corpusRows = t.effectiveFiles.map(_.rowCount).sum
      (corpusEpochs until corpusEpochs + churnEpochs).foreach { ep =>
        require(t.commitEpoch(epochDf(ep), "bench", ep, buckets))
      }
      (t, corpusRows)
    }

    // untimed warm-up (JIT, codegen, parquet writer init)
    locally {
      val (t, _) = build("/tmp/graft-cmpbench-warm", 1, 1)
      require(t.compact(spark, buckets) >= 0L)
    }

    val churnEpochs = 2 // 256k churn rows at every corpus point
    val mults = sys.env.getOrElse("GRAFT_CMPBENCH_MULTS", "1,4,16")
      .split(",").toSeq.map(_.trim.toInt)
    val points = mults.map { mult =>
      val reps = (0 until 3).map { r =>
        val root = s"/tmp/graft-cmpbench-m$mult-r$r"
        val (t, corpusRows) = build(root, mult, churnEpochs)
        val incSec = timeS { require(t.compact(spark, buckets) >= 0L) }
        val gen = t.compactions.maxBy(_.gen)
        val rewritten = gen.files.count(_.path.contains(f"part-c${gen.gen}%04d"))
        val reused = gen.files.size - rewritten
        // the corpus-proportional contrast: re-cluster the same state
        val fullSec = timeS { require(t.compact(spark, buckets, full = true) >= 0L) }
        deleteTree(root)
        (corpusRows, reused, rewritten, incSec, fullSec)
      }
      val (corpusRows, reused, rewritten, _, _) = reps.head
      (mult, corpusRows, convs.toLong * turns * churnEpochs, reused, rewritten,
        reps.map(_._4).min, reps.map(_._5).min)
    }

    val pts = points.map { case (m, rows, churn, reused, rewritten, inc, full) =>
      s"""{"corpusMult":$m,"corpusRows":$rows,"churnRows":$churn,""" +
        s""""reusedFiles":$reused,"rewrittenFiles":$rewritten,""" +
        f""""incrementalSec":$inc%.3f,"fullSec":$full%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"compaction_bench","buckets":$buckets,""" +
      s""""bestOf":3,"points":$pts}""")
    spark.stop()
  }
}
