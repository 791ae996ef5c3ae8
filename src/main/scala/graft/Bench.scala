package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.bench.StreamBench
import graft.gen.Fixtures

/** Per-round benchmark main: times every SparkEntry query (noop sink forces
  * full computation — `count()` would let Catalyst skip projections) plus
  * the end-to-end streaming redaction pipeline. Prints ONE JSON line.
  */
object Bench {
  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fixtures materialize outside the timed region
    Fixtures.transcripts(spark, sfDir)
    Fixtures.transcriptsSkew(spark, sfDir)
    Fixtures.transcriptsLate(spark, sfDir)

    // repeats + medians: a single sample on a CPU-steal-prone VM can double
    // (round-2 VERDICT: 20.4s driver q2 vs 2.1s builder — unadjudicable
    // without repeats). `queries` carries the MEDIAN; `queries_detail`
    // carries {median, best, n} per query.
    // n=5 default (round-3 VERDICT #6): q21/q24 medians showed rep-to-rep
    // spread on the driver VM that 3 reps could not adjudicate
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // drop intermediates a query persisted (q11's shingle table):
        // without this, reps 2+ would hit rep 1's cache and the median
        // would understate the query's full cost
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }

    // end-to-end streaming redaction (sessions + CMS + exactly-once sink) —
    // one run: the per-batch profile (printed below) already attributes it,
    // and batches 1+ are themselves repeated samples of the steady state
    val stream = StreamBench.run(spark, sfDir)

    // The harness that runs this main keeps only the last ~2000 chars of
    // stdout — four rounds of full-precision JSON with per-query
    // {median,best,n} and per-batch stream profiles never fit, so the
    // line was truncated mid-queries and unparseable every round. The
    // printed line is now COMPACT (medians at ms precision; it must stay
    // under ~1900 chars with 44 queries) and the full-precision detail —
    // {median,best,n} per query, the per-batch stream profile — goes to
    // BENCH_FULL.json next to the build instead.
    def r3(v: Double): String = f"$v%.3f"
    val qs = (results.map { case (k, ts) => k -> median(ts) } :+
        ("stream_redact" -> stream.sec))
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val detail = results
      .map { case (k, ts) =>
        "\"" + k + "\":" + s"""{"median":${median(ts)},"best":${ts.min},"n":${ts.size}}"""
      }.mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).sum + stream.sec
    val full = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries_detail":$detail,"bench_reps":$reps,""" +
      s""""stream_turns":${stream.turns},"stream_turns_per_sec":${stream.turnsPerSec},""" +
      s""""stream_sustained_turns_per_sec":${stream.sustainedTurnsPerSec},""" +
      s""""stream_bench_root":"${stream.benchRoot}","stream_fs":"${stream.fsType}",""" +
      s""""stream_reduced_io":${stream.reducedIo},""" +
      s""""stream_batches":${stream.batchesJson},""" +
      s""""sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":$qs,"bench_reps":$reps,""" +
      s""""stream_turns":${stream.turns},""" +
      s""""stream_turns_per_sec":${r3(stream.turnsPerSec)},""" +
      s""""stream_sustained_turns_per_sec":${r3(stream.sustainedTurnsPerSec)},""" +
      s""""stream_fs":"${stream.fsType}","detail":"BENCH_FULL.json",""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
