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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // end-to-end streaming redaction (sessions + CMS + exactly-once sink)
    val stream = StreamBench.run(spark, sfDir)

    val qs = (results :+ ("stream_redact" -> stream.sec))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + stream.sec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""stream_turns":${stream.turns},"stream_turns_per_sec":${stream.turnsPerSec},""" +
      s""""stream_bench_root":"${stream.benchRoot}","stream_fs":"${stream.fsType}",""" +
      s""""stream_reduced_io":${stream.reducedIo},""" +
      s""""stream_batches":${stream.batchesJson},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
