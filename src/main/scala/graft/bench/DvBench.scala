package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures what merge-on-read deletion vectors buy: the SAME tiny purge
  * (one conv's rows, constant k) against tables of growing file size —
  * copy-on-write rewrites every touched file (cost ∝ file bytes), the
  * vector records k positions (cost ∝ k). Reported per corpus scale:
  *
  *  - `cowSec` / `morSec`: wall time of the delete commit;
  *  - `cowBytes` / `morBytes`: bytes the commit wrote (rewritten files vs
  *    vector sidecars) — the scale claim in its purest form;
  *  - `readCowSec` / `readMorSec`: full-drain read AFTER each delete —
  *    the honest cost side: a vector'd scan runs in row mode until
  *    compaction folds it, so the read penalty is printed, not hidden.
  *
  * Each scale builds TWO identical tables (one per delete mode) so
  * neither measurement reads a cache the other warmed. Prints ONE JSON
  * line; deletes are single-shot (a delete mutates — it cannot be
  * repeated), reads are medians of 3. */
object DvBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def median3(f: => Unit): Double = {
    f // warm-up
    (1 to 3).map(_ => timeS(f)).sorted.apply(1)
  }

  private def drain(df: DataFrame): Unit = {
    df.agg(count(lit(1)), sum(crc32(col("text")))).collect(); ()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buckets = 8
    val base = 1767225600L * 1000000L
    def payload(c: Int, i: Int): String = {
      val r = new java.util.Random(c.toLong * 1000003L + i)
      val sb = new java.lang.StringBuilder(96)
      (0 until 12).foreach(_ => sb.append(f"${r.nextLong()}%016x"))
      sb.toString
    }

    /** One epoch, `convs` × 64 turns, compacted to one file per bucket —
      * the long-lived-table shape where file size dominates. */
    def build(root: String, convs: Int): IcebergLite = {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
      val t = new IcebergLite(root)
      t.create("conv_id string, turn_idx int, ts timestamp, text string", buckets)
      val rows = for (c <- 0 until convs; i <- 0 until 64) yield
        (f"c$c%08d", i,
          new java.sql.Timestamp((base + c * 1000000L + i) / 1000L),
          payload(c, i))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "ts", "text"), "bench", 0L, buckets))
      t.compact(spark, numBuckets = buckets, full = true)
      t
    }

    def dirBytes(root: String, prefix: String): Long = {
      import scala.jdk.CollectionConverters._
      val d = java.nio.file.Paths.get(root, "data")
      val st = java.nio.file.Files.list(d)
      try st.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .map(java.nio.file.Files.size(_)).sum
      finally st.close()
    }

    val scales = Seq(1, 4, 16)
    val results = scales.map { sc =>
      val convs = 1024 * sc
      // the purge: ONE conv's 64 rows — constant k across scales
      val victim = f"c${convs / 2}%08d"
      val cond = col("conv_id") === victim

      val cowRoot = s"/tmp/graft-dv-bench-cow-$sc"
      val tCow = build(cowRoot, convs)
      val cowSec = timeS {
        assert(tCow.deleteWhere(spark, cond, s"cow x$sc") == 64L)
      }
      val cowBytes = dirBytes(cowRoot, "part-d")
      val readCowSec = median3(drain(tCow.read(spark)))

      val morRoot = s"/tmp/graft-dv-bench-mor-$sc"
      val tMor = build(morRoot, convs)
      val morSec = timeS {
        assert(tMor.deleteWhereMor(spark, cond, s"mor x$sc") == 64L)
      }
      val morBytes = dirBytes(morRoot, "dv-")
      val readMorSec = median3(drain(tMor.read(spark)))
      assert(tMor.effectiveFiles.exists(_.dvPath.isDefined),
        s"x$sc purge must have produced a vector")

      (sc, convs * 64L, cowSec, cowBytes, readCowSec, morSec, morBytes,
        readMorSec)
    }

    val per = results.map { case (sc, rows, cs, cb, rcs, ms, mb, rms) =>
      s"""{"scale":$sc,"rows":$rows,"cowSec":$cs,"cowBytes":$cb,""" +
      s""""readCowSec":$rcs,"morSec":$ms,"morBytes":$mb,""" +
      s""""readMorSec":$rms}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"dv_bench","unit":"sec","buckets":$buckets,""" +
      s""""deletedRows":64,"scales":$per}""")
    spark.stop()
  }
}
