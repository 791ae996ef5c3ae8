package graft.bench

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level attribution of ONE flagship stream run — the streaming
  * analogue of [[QueryProbe]]'s stage table: per-stage task count, wall,
  * executorRun/Cpu, shuffle bytes. The per-batch BatchProf says WHICH
  * batch was slow; this says WHICH STAGE inside the batches the time goes
  * to (scan vs stateful vs sink write), which is what decides whether the
  * next optimization target is I/O, compute or barriers.
  *
  * Usage: runMain graft.bench.StreamStageProbe [cores]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object StreamStageProbe {
  private final case class Row(id: Int, tasks: Int, wallMs: Long, runMs: Long,
                               cpuMs: Long, shrMB: Double, shwMB: Double,
                               name: String)

  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = ArrayBuffer.empty[Row]
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        rows.synchronized {
          rows += Row(i.stageId, i.numTasks,
            (for { s <- i.submissionTime; c <- i.completionTime } yield c - s)
              .getOrElse(-1L),
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.shuffleReadMetrics.remoteBytesRead / 1e6 +
              m.shuffleReadMetrics.localBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            i.name.takeWhile(_ != '\n').take(60))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val r = StreamBench.run(spark, sfDir, numBuckets = cores.toInt)
    Thread.sleep(500)
    // scalastyle:off println
    println(s"RESULT turns=${r.turns} sec=${f"${r.sec}%.2f"} " +
      s"tps=${r.turnsPerSec.toLong} sustained=${r.sustainedTurnsPerSec.toLong}")
    println("STAGES (sorted by executorRunTime):")
    println(f"${"id"}%6s ${"tasks"}%5s ${"wall"}%7s ${"run"}%8s ${"cpu"}%8s " +
      f"${"shR"}%7s ${"shW"}%7s  name")
    rows.sortBy(-_.runMs).take(30).foreach { s =>
      println(f"${s.id}%6d ${s.tasks}%5d ${s.wallMs}%7d ${s.runMs}%8d " +
        f"${s.cpuMs}%8d ${s.shrMB}%7.1f ${s.shwMB}%7.1f  ${s.name}")
    }
    // scalastyle:on println
    spark.stop()
  }
}
