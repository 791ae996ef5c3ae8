package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** N → 4N scaling evidence (BASELINE.md protocol; sandbox substitute for two
  * cluster sizes per driver instruction): the same streaming job over the
  * same input at `local[8]` and `local[32]`, reporting throughput at both
  * and efficiency = (T32/T8)/4. Appends results to BENCH.md and prints one
  * JSON line.
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lowCores = 8
    val highCores = 32

    // generate slices once (deterministic; shared by both runs)
    val s0 = session(highCores)
    StreamBench.ensureSlices(s0, sfDir)
    s0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    def measure(cores: Int): StreamResult = {
      val s = session(cores)
      // buckets fixed across runs so the work plan is identical; parallelism
      // is the only variable (= the two-cluster-size protocol)
      val r = StreamBench.run(s, sfDir, numBuckets = 32)
      s.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      r
    }

    val warm = measure(lowCores) // JIT/IO warmup, discarded
    val low = measure(lowCores)
    val high = measure(highCores)
    val eff = (high.turnsPerSec / low.turnsPerSec) / (highCores.toDouble / lowCores)

    val json =
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
        s""""low_cores":$lowCores,"high_cores":$highCores,""" +
        s""""low_turns_per_sec":${low.turnsPerSec},"high_turns_per_sec":${high.turnsPerSec},""" +
        s""""turns":${high.turns},"warmup_sec":${warm.sec},"sf":"$sfDir"}"""
    println(json)

    val md =
      s"""
         |## Scaling run (sf=$sfDir, ${high.turns} turns, streaming redaction end-to-end)
         |
         || cores | wall sec | turns/sec |
         ||---|---|---|
         || $lowCores | ${f"${low.sec}%.2f"} | ${f"${low.turnsPerSec}%.0f"} |
         || $highCores | ${f"${high.sec}%.2f"} | ${f"${high.turnsPerSec}%.0f"} |
         |
         |Efficiency (T$highCores/T$lowCores)/(${highCores / lowCores}) = ${f"$eff%.3f"} (target ≥ 0.8)
         |""".stripMargin
    Files.write(Paths.get("/root/repo/BENCH.md"),
      md.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
