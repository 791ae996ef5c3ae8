package graft.bench

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.EmbGen
import graft.ops.Similarity
import graft.table.IcebergLite

/** Measures the incremental-refresh claim: `ivfRefreshIndex` cost must
  * track the CHURN, not the index size, while a full `ivfBuildIndex`
  * rebuild tracks the corpus. Two sweeps over IcebergLite-backed embedding
  * corpora:
  *
  *  1. corpus 4×, churn fixed (append 64 + delete 64 vectors): refresh
  *     wall should stay ~flat, rebuild wall should grow ~linearly;
  *  2. fixed corpus, churn 4×: refresh wall grows with churn (the honest
  *     direction — nothing is free).
  *
  * Prints one JSON line per measurement; medians of n reps. */
object IvfRefreshBench {

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val reps = sys.env.getOrElse("GRAFT_IVFBENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivf-refresh-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (benchRoot, fsType) = StreamBench.pickBenchRoot()

    /** One measurement: corpus of `n` vectors in an IcebergLite table,
      * index built, then `churn` appends + `churn` deletes; returns
      * (refreshSec, rebuildSec) medians over `reps`. */
    def measure(n: Int, churn: Int): (Double, Double) = {
      val refreshTimes = Seq.newBuilder[Double]
      val rebuildTimes = Seq.newBuilder[Double]
      (0 until reps).foreach { _ =>
        val work = Files.createTempDirectory(benchRoot, "ivfbench")
        try {
          val srcRoot = work.resolve("src").toString
          val idxDir = work.resolve("idx").toString
          val embs = EmbGen.dataset(spark, n)
          val src = new IcebergLite(srcRoot)
          src.create("vec_id bigint, vec array<float>", 4)
          src.commitEpoch(embs, "emb", 0L, 4)
          Similarity.ivfBuildIndex(src.read(spark).select("vec_id", "vec"),
            "vec_id", "vec", idxDir, nlist = 64, sourceRoot = srcRoot)
          // churn: half appended (new ids), half deleted (an id range)
          val appended = embs.filter(col("vec_id") < churn)
            .withColumn("vec_id", col("vec_id") + 10L * n)
          src.commitEpoch(appended, "emb", 1L, 4)
          src.deleteWhere(spark,
            col("vec_id") >= 1000 && col("vec_id") < (1000 + churn),
            s"bench churn $churn")
          refreshTimes += time(Similarity.ivfRefreshIndex(spark, idxDir))
          // full rebuild of the SAME live corpus into a fresh dir
          val rebuildDir = work.resolve("idx2").toString
          val live = src.read(spark).select("vec_id", "vec")
          rebuildTimes += time(Similarity.ivfBuildIndex(live,
            "vec_id", "vec", rebuildDir, nlist = 64, sourceRoot = srcRoot))
        } finally {
          try Files.walk(work).sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
          catch { case _: Throwable => }
        }
      }
      (median(refreshTimes.result()), median(rebuildTimes.result()))
    }

    val corpusSweep = Seq(50000, 100000, 200000).map { n =>
      val (r, b) = measure(n, churn = 64)
      s"""{"corpus":$n,"churn":64,"refreshSec":${f"$r%.3f"},"rebuildSec":${f"$b%.3f"}}"""
    }
    val churnSweep = Seq(64, 256, 1024).map { c =>
      val (r, b) = measure(100000, churn = c)
      s"""{"corpus":100000,"churn":$c,"refreshSec":${f"$r%.3f"},"rebuildSec":${f"$b%.3f"}}"""
    }
    // scalastyle:off println
    println(s"""{"metric":"ivf_refresh_bench","fs":"$fsType","cpus":$cpus,""" +
      s""""reps":$reps,"corpusSweep":[${corpusSweep.mkString(",")}],""" +
      s""""churnSweep":[${churnSweep.mkString(",")}]}""")
    // scalastyle:on println
    spark.stop()
  }
}
