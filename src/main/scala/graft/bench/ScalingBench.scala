package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** N → 4N scaling evidence (BASELINE.md protocol): the same streaming job
  * over the same input at two parallelism levels (the sandbox substitute for
  * two cluster sizes, per driver instruction), reporting throughput at both
  * and efficiency = (tpsHigh/tpsLow)/4.
  *
  * Two throughput definitions are reported per run:
  *  - WALL: turns / end-to-end seconds (includes per-run fixed costs —
  *    query start, the flush batch, the trailing no-data batch, per-batch
  *    commit bookkeeping — which at the 10^12-turn design scale are
  *    amortized over thousands of micro-batches instead of ~5);
  *  - SUSTAINED: Σ rows / Σ triggerExecution over the DATA micro-batches
  *    (the steady-state regime; this is the "sustained throughput" the
  *    BASELINE metric names, and the one that predicts cluster behavior).
  *
  * The sandbox VM shows double-digit CPU-steal spikes, so a single
  * measurement is meaningless: we alternate low/high runs `reps` times and
  * take the best per configuration — best-of filters host noise while never
  * flattering the slow config. All raw runs are recorded.
  *
  * `local-cluster` mode (real executor JVMs) needs env `SPARK_HOME=/opt/spark`
  * and `SPARK_SCALA_VERSION=2.13`.
  */
object ScalingBench {

  final case class Config(label: String, master: String, totalCores: Int)

  final case class Run(wallTps: Double, sustainedTps: Double, sec: Double,
                       turns: Long, batches: Seq[BatchProf] = Nil,
                       taskStats: TaskStats = TaskStats.Zero) {
    /** Steady-state data batches (the sustained window). */
    def dataBatches: Seq[BatchProf] = batches.filter(_.inputRows > 10000).drop(1)
    /** Compute-only throughput: rows / Σ addBatch (excludes trigger
      * bookkeeping between batches). */
    def addBatchTps: Double = {
      val d = dataBatches
      if (d.nonEmpty && d.map(_.addBatchMs).sum > 0)
        d.map(_.inputRows).sum.toDouble / d.map(_.addBatchMs).sum * 1000.0
      else sustainedTps
    }
    /** Σ per-partition state-commit ms over the sustained window (sums
      * across partitions, so it can exceed wall — divide by cores for an
      * occupancy share). */
    def stateCommitMs: Long = dataBatches.map(_.stateCommitMs).sum
    def addBatchMs: Long = dataBatches.map(_.addBatchMs).sum
  }

  /** Shuffle/state partitions per core: > 1 so each micro-batch's stateful
    * stage runs several waves and a straggler partition hides behind the
    * others instead of pinning the batch (with exactly one wave, the batch
    * time is the MAX over partitions, and that max grows with the partition
    * count — the high-core config pays it disproportionately). */
  private val shuffleMult = sys.env.getOrElse("GRAFT_SCALING_SHUFFLE_MULT", "4").toInt

  private def session(cfg: Config): SparkSession = {
    val b = SparkSession.builder()
      .master(cfg.master)
      .appName(s"scaling-${cfg.label}")
      .config("spark.sql.shuffle.partitions", (cfg.totalCores * shuffleMult).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // shuffle/spill on tmpfs — per-node disk in the real-cluster model
      .config("spark.local.dir", "/dev/shm/graft-local")
    if (cfg.master.startsWith("local-cluster")) {
      // executors are separate JVMs: ship our classes via classpath, and
      // size their heap explicitly — the local-cluster[n,c,mem] capacity is
      // the WORKER's resource pool, not the executor JVM's -Xmx (which
      // defaults to 1g and OOMs on multi-million-turn batches)
      b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
      b.config("spark.executor.memory",
        sys.env.getOrElse("GRAFT_SCALING_EXEC_MB", "6144") + "m")
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Steady-state throughput: Σ rows / Σ triggerExecution over the data
    * micro-batches, excluding the FIRST (it pays JIT warm-up and first-touch
    * page-cache costs that a long-running stream amortizes away). */
  def sustainedOf(batches: Seq[BatchProf], fallback: Double): Double = {
    val data = batches.filter(_.inputRows > 10000).drop(1)
    if (data.nonEmpty && data.map(_.totalMs).sum > 0)
      data.map(_.inputRows).sum.toDouble / data.map(_.totalMs).sum * 1000.0
    else fallback
  }

  private def measure(cfg: Config, sfDir: String, slices: String): Run = {
    if (cfg.master.startsWith("pinned")) return measurePinned(cfg, sfDir, slices)
    if (cfg.master.startsWith("pcluster"))
      return measureChild(cfg, sfDir, slices, pinnedWrapper = false,
        mainClass = "graft.bench.ClusterPinnedRun")
    val s = session(cfg)
    // buckets fixed across runs so the produced table is identical; cluster
    // size is the only variable (= the two-cluster-size protocol)
    val r = StreamBench.run(s, sfDir, numBuckets = 32, slicesOverride = slices)
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    Run(r.turnsPerSec, sustainedOf(r.batches, r.turnsPerSec), r.sec, r.turns,
      r.batches, r.taskStats)
  }

  /** Pinned mode: the measurement runs in a CHILD JVM confined to exactly
    * `totalCores` hardware CPUs with `taskset -c`. This closes the honesty
    * gap of thread-count emulation in one shared JVM, where the "2-core"
    * config quietly borrows the box's idle cores for GC, netty, compression
    * and scheduler threads — OS-level affinity is the strictest sandbox
    * substitute for an N-node vs 4N-node cluster. */
  private def measurePinned(cfg: Config, sfDir: String, slices: String): Run =
    measureChild(cfg, sfDir, slices, pinnedWrapper = true,
      mainClass = "graft.bench.PinnedRun")

  /** Launch `mainClass` in a child JVM (optionally under `taskset`) and parse
    * its PINNED/BATCHES result lines. */
  private def measureChild(cfg: Config, sfDir: String, slices: String,
                           pinnedWrapper: Boolean, mainClass: String): Run = {
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    import scala.jdk.CollectionConverters._
    val inherited = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("-Xmx") || a.startsWith("-D"))
    val wrapper =
      if (pinnedWrapper) Seq("taskset", "-c", s"0-${cfg.totalCores - 1}")
      else Nil
    val cmd = wrapper ++ Seq(javaBin) ++
      inherited ++
      Seq("-cp", sys.props("java.class.path"), mainClass,
        cfg.totalCores.toString, sfDir, slices)
    val out = new java.lang.StringBuilder
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(false).start()
    val outReader = new Thread(() => {
      scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        .foreach(l => out.synchronized { out.append(l).append('\n') })
    })
    outReader.start()
    // keep a rolling tail of child stderr so a crashed child is diagnosable
    val errTail = new java.util.ArrayDeque[String](64)
    scala.io.Source.fromInputStream(proc.getErrorStream).getLines().foreach { l =>
      if (errTail.size >= 60) errTail.pollFirst()
      errTail.addLast(l)
    }
    proc.waitFor()
    outReader.join()
    if (out.length() == 0) {
      import scala.jdk.CollectionConverters._
      out.append("(no stdout; stderr tail:)\n")
        .append(errTail.iterator().asScala.mkString("\n"))
    }
    val Pat = """PINNED wall=([\d.]+) turns=(\d+) wallTps=([\d.]+) sustainedTps=([\d.]+)""".r
    val batches = out.toString.linesIterator
      .find(_.startsWith("BATCHES "))
      .map(l => parseBatches(l.stripPrefix("BATCHES ")))
      .getOrElse(Nil)
    val taskStats = out.toString.linesIterator
      .find(_.startsWith("TASKSTATS "))
      .map(l => TaskStats.parse(l.stripPrefix("TASKSTATS ")))
      .getOrElse(TaskStats.Zero)
    out.toString.linesIterator.collectFirst {
      case Pat(w, t, wt, st) =>
        Run(wt.toDouble, st.toDouble, w.toDouble, t.toLong, batches, taskStats)
    }.getOrElse(throw new IllegalStateException(
      s"pinned child produced no result; output:\n$out"))
  }

  private def parseBatches(json: String): Seq[BatchProf] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    root.elements().asScala.map { n =>
      def l(k: String): Long = if (n.has(k)) n.get(k).asLong() else 0L
      BatchProf(n.get("id").asLong(), n.get("rows").asLong(), n.get("ms").asLong(),
        n.get("addBatchMs").asLong(), n.get("stateCommitMs").asLong(),
        n.get("stateRows").asLong(), n.get("stateBytes").asLong(),
        planMs = l("planMs"), sourceMs = l("sourceMs"), walMs = l("walMs"))
    }.toSeq
  }

  /** Task-metric attribution of the per-core loss, whole run (see
    * [[TaskStats]]): µs/turn for each component at both cluster sizes. A
    * perfectly scaling engine keeps every per-turn column flat from low to
    * high; whichever column grows is WHERE the lost per-core throughput
    * went — cpu = real per-core slowdown (memory stalls/allocator), gc =
    * collector, fetchWait = shuffle transport, sched = task dispatch, and
    * idle (cores×wall − run, over data batches) = scheduling gaps/stage
    * tails/serial driver time. */
  private def taskSplit(lc: Config, bl: Run, hc: Config, bh: Run): String = {
    def rowOf(c: Config, r: Run): String = {
      val t = r.taskStats
      if (t.tasks == 0) return s"| ${c.label} | (no task stats) |||||||"
      val perTurn = (v: Long) => f"${v * 1000.0 / r.turns}%.1f"
      // idle over the whole run: core-seconds not spent running tasks
      val idleMs = math.max(0L, (c.totalCores * r.sec * 1000).toLong - t.runMs)
      s"| ${c.label} | ${t.tasks} | ${perTurn(t.runMs)} | ${perTurn(t.cpuMs)} | " +
        s"${perTurn(t.gcMs)} | ${perTurn(t.fetchWaitMs)} | ${perTurn(t.schedDelayMs)} | " +
        s"${perTurn(idleMs)} |"
    }
    "\nTask-metric attribution (whole run, µs/turn; 'idle' = cores×wall −\n" +
      "Σtask-run — scheduling gaps, stage tails and driver-serial time):\n\n" +
      "| config | tasks | run | cpu | gc | fetchWait | schedDelay | idle |\n" +
      "|---|---|---|---|---|---|---|---|\n" +
      rowOf(lc, bl) + "\n" + rowOf(hc, bh) + "\n"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_SCALING_REPS", "3").toInt
    val memMb = sys.env.getOrElse("GRAFT_SCALING_EXEC_MB", "6144")
    val mode = sys.env.getOrElse("GRAFT_SCALING_MODE", "pinned")
    val lowN = sys.env.getOrElse("GRAFT_SCALING_LOW", "1").toInt
    val highN = lowN * 4
    val coresPer = 2
    // Three sandbox substitutes for "N vs 4N executors":
    //  - pinned (default): child JVMs confined to exactly N / 4N hardware
    //    CPUs with `taskset -c` — the strictest: the low config cannot
    //    borrow idle cores for GC/netty/scheduler threads;
    //  - local: local[N] vs local[4N] threads in one shared JVM;
    //  - cluster: local-cluster[N,2,m] vs local-cluster[4N,2,m] — real
    //    separate executor JVMs (own heaps/GC), but shuffle/RPC over
    //    loopback TCP on one shared box.
    // Both points stay inside the box's linear region (shared DRAM saturates
    // near ~8-16 byte-heavy threads, so 8->32 would measure the memory bus).
    val (low, high) =
      if (mode == "cluster")
        (Config(s"${lowN}exec", s"local-cluster[$lowN,$coresPer,$memMb]", lowN * coresPer),
          Config(s"${highN}exec", s"local-cluster[$highN,$coresPer,$memMb]", highN * coresPer))
      else if (mode == "pinned")
        (Config(s"pinned[$lowN]", "pinned", lowN),
          Config(s"pinned[$highN]", "pinned", highN))
      else if (mode == "pcluster")
        // N vs 4N real executor JVMs, each pinned to its own core, driver
        // pinned to a constant disjoint core set — see ClusterPinnedRun
        (Config(s"pcluster[$lowN]", "pcluster", lowN),
          Config(s"pcluster[$highN]", "pcluster", highN))
      else
        (Config(s"local[$lowN]", s"local[$lowN]", lowN),
          Config(s"local[$highN]", s"local[$highN]", highN))

    // larger corpus than the per-round bench: per-run fixed costs (query
    // start, flush batch, commit bookkeeping) must be small against
    // parallel work or efficiency measures the constant, not the engine
    val nConvs = sys.env.getOrElse("GRAFT_SCALING_CONVS", "300000").toInt
    val slicesK = sys.env.getOrElse("GRAFT_SCALING_SLICES", "4").toInt
    val s0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s0.sparkContext.setLogLevel("WARN")
    val slices = StreamBench.ensureSlicesFor(s0, s"scaling_${nConvs}_k$slicesK",
      graft.gen.GenSpec(nConvs = nConvs), k = slicesK)
    s0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val warm = measure(high, sfDir, slices) // JIT/page-cache warmup, discarded
    val runs = (1 to reps).flatMap { _ =>
      Seq(low -> measure(low, sfDir, slices),
        high -> measure(high, sfDir, slices))
    }
    runs.foreach { case (c, r) =>
      // per-run cpu/turn lets a reader classify EVERY run's host-noise
      // window (round-3 protocol: quiet = cpu/turn at the cross-run
      // minima), not just the best-of runs the md tables carry
      val cpuPerTurn =
        if (r.taskStats.tasks == 0) Double.NaN
        else r.taskStats.cpuMs * 1000.0 / r.turns
      System.err.println(f"[scaling] ${c.label} wall=${r.sec}%.1fs " +
        f"wallTps=${r.wallTps}%.0f sustainedTps=${r.sustainedTps}%.0f " +
        f"cpuUsPerTurn=$cpuPerTurn%.1f")
    }
    val bestLow = runs.filter(_._1 == low).map(_._2)
    val bestHigh = runs.filter(_._1 == high).map(_._2)
    val wallEff = (bestHigh.map(_.wallTps).max / bestLow.map(_.wallTps).max) / 4.0
    val susEff = (bestHigh.map(_.sustainedTps).max / bestLow.map(_.sustainedTps).max) / 4.0

    println(
      s"""{"metric":"scaling_efficiency","value":$susEff,"unit":"ratio",""" +
        s""""definition":"sustained per-batch throughput ratio (tpsHigh/tpsLow)/4; see BENCH.md",""" +
        s""""wall_efficiency":$wallEff,""" +
        s""""low_cores":${low.totalCores},"high_cores":${high.totalCores},"mode":"$mode",""" +
        s""""low_sustained_tps":${bestLow.map(_.sustainedTps).max},"high_sustained_tps":${bestHigh.map(_.sustainedTps).max},""" +
        s""""low_wall_tps":${bestLow.map(_.wallTps).max},"high_wall_tps":${bestHigh.map(_.wallTps).max},""" +
        s""""turns":${bestHigh.head.turns},"reps":$reps,"sf":"$sfDir"}""")

    val allRuns = runs.map { case (c, r) =>
      s"| ${c.label} | ${f"${r.sec}%.2f"} | ${f"${r.wallTps}%.0f"} | ${f"${r.sustainedTps}%.0f"} |"
    }.mkString("\n")
    // stage split of the BEST run per config: where does the per-core loss
    // concentrate — compute (addBatch) or state-store commit I/O?
    val stageSplit = {
      val bl = bestLow.maxBy(_.sustainedTps)
      val bh = bestHigh.maxBy(_.sustainedTps)
      val addEff = (bh.addBatchTps / bl.addBatchTps) / 4.0
      def row(c: Config, r: Run): String = {
        val occ =
          if (r.addBatchMs > 0)
            r.stateCommitMs.toDouble / (c.totalCores * r.addBatchMs)
          else 0.0
        s"| ${c.label} | ${f"${r.sustainedTps}%.0f"} | ${f"${r.addBatchTps}%.0f"} | " +
          s"${r.addBatchMs} | ${r.stateCommitMs} | ${f"$occ%.2f"} |"
      }
      // plain concatenation, no stripMargin: margin stripping runs after
      // interpolation and eats the leading '|' of every inserted table row
      "\nStage split of the best run per config (sustained window: data\n" +
        "batches after the first; stateCommitMs sums across partitions, so\n" +
        "occupancy = Σcommit / (cores × ΣaddBatch)):\n\n" +
        "| config | sustained tps | addBatch-only tps | Σ addBatch ms | Σ state-commit ms | commit occupancy |\n" +
        "|---|---|---|---|---|---|\n" +
        row(low, bl) + "\n" + row(high, bh) + "\n\n" +
        "addBatch-only efficiency (compute path, commit I/O excluded):\n" +
        f"**$addEff%.3f**.\n" + taskSplit(low, bl, high, bh)
    }
    val md =
      s"\n## Scaling run (sf=$sfDir, ${bestHigh.head.turns} turns, streaming redaction end-to-end)\n\n" +
        s"Protocol: same job, same input, alternating `${low.label}`\n" +
        s"vs `${high.label}` (sandbox substitute for N vs 4N executors)\n" +
        s"× $reps, best-of per config (the VM shows CPU-steal spikes; raw\n" +
        f"runs below). Warmup (discarded): ${warm.sec}%.2fs.\n\n" +
        "| config | wall sec | wall turns/sec | sustained turns/sec |\n" +
        "|---|---|---|---|\n" +
        allRuns + "\n\n" +
        f"Best-of: ${low.label} sustained ${bestLow.map(_.sustainedTps).max}%.0f turns/s,\n" +
        f"${high.label} sustained ${bestHigh.map(_.sustainedTps).max}%.0f turns/s.\n" +
        f"**Sustained efficiency (tpsHigh/tpsLow)/4 = $susEff%.3f** (target ≥ 0.8);\n" +
        f"wall-clock efficiency $wallEff%.3f (includes per-run fixed costs that\n" +
        "amortize to zero at the 10^12-turn design scale — see protocol note).\n" +
        stageSplit
    Files.write(Paths.get("/root/repo/BENCH.md"), md.getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}

/** Child main for ScalingBench's pinned mode: one measurement in THIS JVM,
  * which the parent launched under `taskset -c 0-(N-1)`. Prints a single
  * machine-readable line. */
object PinnedRun {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val sfDir = args(1)
    val slices = args(2)
    // must match ScalingBench.shuffleMult's default (standard Spark sizing:
    // several tasks per core, uniformly applied to both cluster sizes)
    val mult = sys.env.getOrElse("GRAFT_SCALING_SHUFFLE_MULT", "4").toInt
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * mult).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-local")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val r = StreamBench.run(s, sfDir, numBuckets = 32, slicesOverride = slices)
    val sustained = ScalingBench.sustainedOf(r.batches, r.turnsPerSec)
    println(f"PINNED wall=${r.sec}%.3f turns=${r.turns} " +
      f"wallTps=${r.turnsPerSec}%.3f sustainedTps=$sustained%.3f")
    println("BATCHES " + r.batchesJson)
    println("TASKSTATS " + r.taskStats.json)
    s.stop()
  }
}

/** Child main for ScalingBench's `pcluster` mode — the closest sandbox
  * analogue of the north rule's literal criterion ("N vs 4N EXECUTORS"):
  * `local-cluster[N,1,mem]` launches N real executor JVMs (each with its own
  * heap, GC, and memory manager, exactly like a cluster), then each executor
  * process is pinned to its own dedicated hardware core with
  * `taskset -a -p` and the driver JVM to a fixed 4-core set that is the same
  * at both cluster sizes (on a real cluster the driver machine is a constant,
  * not part of the scaled resource). This removes the one honest criticism
  * of the single-JVM pinned protocol: 4 threads sharing one heap/allocator is
  * a coupling real 4-executor clusters do not have (MemProbe measured that
  * shared-heap allocation churn alone scales at ~0.91 on this box).
  * `-XX:ActiveProcessorCount=1` makes each executor size its GC/JIT thread
  * pools for the 1 core it will actually own, as a real 1-core executor
  * container would. */
object ClusterPinnedRun {
  private def pin(pid: Long, cores: String): Unit = {
    val p = new ProcessBuilder("taskset", "-a", "-p", "-c", cores, pid.toString)
      .redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).getLines().mkString("\n")
    val rc = p.waitFor()
    // a silently-unpinned JVM skews the scaling comparison — fail loudly
    // (round-3 ADVICE: pin() used to discard the taskset exit status)
    require(rc == 0, s"taskset -c $cores -p $pid failed (rc=$rc): $out")
  }

  /** PIDs of executor JVMs (children of this driver JVM in local-cluster
    * mode), oldest first so pinning is deterministic. Reads /proc directly:
    * ProcessHandle.info().commandLine() is empty for processes with very
    * long argument lists (the executor's -cp is ~20 kB). */
  private def executorPids: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().children().iterator().asScala.map(_.pid()).filter { pid =>
      try {
        val cmd = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/$pid/cmdline")), "UTF-8")
        cmd.contains("CoarseGrainedExecutorBackend")
      } catch { case _: Throwable => false }
    }.toSeq.sorted
  }

  def main(args: Array[String]): Unit = {
    val nExec = args(0).toInt
    val sfDir = args(1)
    val slices = args(2)
    val mult = sys.env.getOrElse("GRAFT_SCALING_SHUFFLE_MULT", "4").toInt
    val memMb = sys.env.getOrElse("GRAFT_SCALING_EXEC_MB", "6144")
    val s = SparkSession.builder()
      .master(s"local-cluster[$nExec,1,$memMb]")
      .appName(s"pcluster-$nExec")
      .config("spark.sql.shuffle.partitions", (nExec * mult).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-local")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.memory", memMb + "m")
      .config("spark.executor.extraJavaOptions", "-XX:ActiveProcessorCount=1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // wait until all executor JVMs exist, then give each its own core;
    // driver (this JVM, incl. the in-process standalone Master/Worker) gets
    // a fixed 4-core set disjoint from every executor core
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (executorPids.size < nExec && System.nanoTime() < deadline)
      Thread.sleep(200)
    val pids = executorPids
    require(pids.size >= nExec, s"only ${pids.size}/$nExec executors came up")
    pids.take(nExec).zipWithIndex.foreach { case (pid, i) => pin(pid, i.toString) }
    // driver cores: derived from the box, disjoint from executor cores
    // 0..nExec-1 (round-3 ADVICE: the old hardcoded "24-27" silently
    // overlapped or vanished on boxes with < 28 cores)
    val nCpus = Runtime.getRuntime.availableProcessors()
    require(nCpus > nExec, s"need > $nExec cores for a disjoint driver set, have $nCpus")
    val driverCores = {
      val hi = nCpus - 1
      val lo = math.max(nExec, nCpus - 4)
      s"$lo-$hi"
    }
    pin(ProcessHandle.current().pid(), driverCores)
    System.err.println(s"[pcluster] pinned executors ${pids.take(nExec)} to cores " +
      s"0-${nExec - 1}, driver to $driverCores")
    val r = StreamBench.run(s, sfDir, numBuckets = 32, slicesOverride = slices)
    val sustained = ScalingBench.sustainedOf(r.batches, r.turnsPerSec)
    println(f"PINNED wall=${r.sec}%.3f turns=${r.turns} " +
      f"wallTps=${r.turnsPerSec}%.3f sustainedTps=$sustained%.3f")
    println("BATCHES " + r.batchesJson)
    println("TASKSTATS " + r.taskStats.json)
    s.stop()
  }
}
