package graft.bench

import java.lang.management.ManagementFactory

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{Bench, SparkEntry}

/** Single-query attribution probe (round-4 VERDICT "next round" #1/#7).
  *
  * Runs ONE named `SparkEntry.queries` entry `reps` times through the same
  * noop-sink force as `graft.Bench`, and prints per-rep wall time alongside
  * the numbers that adjudicate "host noise vs real work":
  *
  *   - process CPU time (OperatingSystemMXBean) — if wall grows but process
  *     CPU does not, the time went to the host (steal / another tenant), not
  *     to this query;
  *   - per-stage executorRunTime / executorCpuTime / jvmGCTime /
  *     shuffle bytes from a `SparkListener`, so a regression localizes to a
  *     stage rather than a whole query.
  *
  * Usage: runMain graft.bench.QueryProbe <queryName> [reps] [cores]
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        GRAFT_DATA_DIR (fixture root — point two builds at the SAME dir
  *        for an A/B so both read identical parquet bytes).
  *
  * The output is one `REP {...}` JSON line per rep plus a final
  * `PROBE {...}` summary line (median/best wall, median CPU, stage table of
  * the median rep). Designed to be diffable across two builds: the round-5
  * q22 A/B runs this same file (copied verbatim) inside a worktree of the
  * round-3 commit.
  */
object QueryProbe {
  private case class StageRow(
      id: Int, name: String, tasks: Int, wallMs: Long,
      runMs: Long, cpuMs: Long, gcMs: Long,
      shufReadMB: Double, shufWriteMB: Double, inputMB: Double)

  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse(
      sys.error("usage: QueryProbe <queryName> [reps] [cores]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cores = args.lift(2).getOrElse("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val fn = SparkEntry.queries.getOrElse(qname,
      sys.error(s"unknown query '$qname'; have: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val osBean = ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    val stages = ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(
            si.stageId, si.name.takeWhile(_ != '\n').take(80), si.numTasks, wall,
            m.executorRunTime, m.executorCpuTime / 1000000L, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6)
        }
      }
    }

    // materialize fixtures + one warm-up rep outside the measured set (JIT,
    // page cache, codegen cache) — mirrors Bench's fixture-first shape
    Bench.force(fn(spark, sfDir))
    spark.sparkContext.addSparkListener(listener)

    case class Rep(wall: Double, procCpu: Double, rows: Seq[StageRow])
    val repRows = (1 to reps).map { i =>
      spark.sharedState.cacheManager.clearCache()
      stages.synchronized { stages.clear() }
      val cpu0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted async (listenerBus is private[spark]):
      // poll until the stage set has been stable for 200 ms, max 2 s
      var last = -1; var stable = 0; var iters = 0
      while (stable < 2 && iters < 20) {
        Thread.sleep(100); iters += 1
        val n = stages.synchronized(stages.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val procCpu = (osBean.getProcessCpuTime - cpu0) / 1e9
      val rows = stages.synchronized { stages.sortBy(-_.runMs).toVector }
      val runS = rows.map(_.runMs).sum / 1e3
      val cpuS = rows.map(_.cpuMs).sum / 1e3
      val gcS = rows.map(_.gcMs).sum / 1e3
      println(f"""REP {"i":$i,"wall":$wall%.3f,"proc_cpu":$procCpu%.3f,"stages":${rows.size},"exec_run_s":$runS%.2f,"exec_cpu_s":$cpuS%.2f,"gc_s":$gcS%.2f}""")
      Rep(wall, procCpu, rows)
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val walls = repRows.map(_.wall)
    val medRep = repRows.sortBy(_.wall).apply(repRows.size / 2)
    println(f"""PROBE {"query":"$qname","reps":$reps,"cores":"$cores","sf":"$sfDir","wall_median":${median(walls)}%.3f,"wall_best":${walls.min}%.3f,"wall_worst":${walls.max}%.3f,"proc_cpu_median":${median(repRows.map(_.procCpu))}%.3f}""")
    println("STAGES (median-wall rep, sorted by executorRunTime):")
    println(f"${"id"}%6s ${"tasks"}%5s ${"wall_ms"}%8s ${"run_ms"}%8s ${"cpu_ms"}%8s ${"gc_ms"}%6s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"in_MB"}%8s  name")
    medRep.rows.foreach { r =>
      println(f"${r.id}%6d ${r.tasks}%5d ${r.wallMs}%8d ${r.runMs}%8d ${r.cpuMs}%8d ${r.gcMs}%6d ${r.shufReadMB}%8.1f ${r.shufWriteMB}%8.1f ${r.inputMB}%8.1f  ${r.name}")
    }
    spark.stop()
  }
}
