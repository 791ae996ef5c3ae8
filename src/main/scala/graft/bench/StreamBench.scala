package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.gen.{Fixtures, GenSpec, StreamFixtures}
import graft.stream.Pipeline
import graft.table.IcebergLite

final case class StreamResult(turns: Long, sec: Double) {
  def turnsPerSec: Double = if (sec > 0) turns / sec else 0.0
}

/** End-to-end streaming benchmark: epoch slices → session-window CMS
  * detection → redaction → exactly-once IcebergLite commit. The slice
  * fixtures are generated once per sf (outside the timed region); each run
  * starts from a fresh table + checkpoint. */
object StreamBench {

  def sliceDir(sfName: String): String =
    s"${Fixtures.DataRoot}/slices_$sfName"

  /** Streaming bench input is larger than the correctness fixture: the
    * per-micro-batch fixed cost (state-store commits, sink job scheduling)
    * must be small against real work for throughput/scaling numbers to mean
    * anything — exactly the regime a 100 TB stream runs in. */
  def specFor(sfName: String): GenSpec = sfName match {
    case "sf0.1" => GenSpec(nConvs = 150000)
    case _       => Fixtures.specFor(sfName)
  }

  def ensureSlices(spark: SparkSession, sfDir: String, k: Int = 4): String = {
    val name = Fixtures.sfName(sfDir)
    val d = sliceDir(name)
    StreamFixtures.writeSlices(spark, specFor(name), d, k)
    d
  }

  /** Slices for an explicit spec (scaling bench uses a larger corpus). */
  def ensureSlicesFor(spark: SparkSession, tag: String, spec: GenSpec, k: Int): String = {
    val d = s"${Fixtures.DataRoot}/slices_$tag"
    StreamFixtures.writeSlices(spark, spec, d, k)
    d
  }

  def run(spark: SparkSession, sfDir: String, numBuckets: Int = 0,
          slicesOverride: String = null): StreamResult = {
    val slices =
      if (slicesOverride != null) slicesOverride else ensureSlices(spark, sfDir)
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.sparkContext.defaultParallelism
    // Bench state/checkpoint/sink live on tmpfs: on a real cluster state
    // I/O is node-local NVMe and scales with node count; on this single-disk
    // sandbox, 32 concurrent state-commit fsyncs contend on one ext4 device
    // (measured ~10x slower per partition than at 8) and would measure the
    // disk, not the engine. RAM-backed dirs restore the per-node-I/O model.
    val benchRoot = Paths.get(
      if (Files.isDirectory(Paths.get("/dev/shm"))) "/dev/shm" else sys.props("java.io.tmpdir"))
    val work = Files.createTempDirectory(benchRoot, "streambench")
    val tableRoot = work.resolve("table").toString
    val cp = work.resolve("cp").toString
    // one epoch = one big slice file: without smaller splits the scan runs
    // on ~2 tasks (128 MB default) and caps the whole pipeline regardless
    // of core count — the single-node analogue of an under-partitioned
    // 100 TB table
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    try {
      val t0 = System.nanoTime()
      val benchParams = graft.core.RedactionParams(
        sketchDepth = sys.env.getOrElse("GRAFT_SK_DEPTH", "4").toInt,
        sketchWidth = sys.env.getOrElse("GRAFT_SK_WIDTH", "1024").toInt)
      val q = Pipeline.runRedactionToTable(spark, slices, tableRoot, cp,
        p = benchParams, numBuckets = buckets, maxFilesPerTrigger = 1)
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("GRAFT_BENCH_VERBOSE")) {
        q.recentProgress.foreach(pr => System.err.println("[benchjson] " + pr.json))
      }
      val turns = new IcebergLite(tableRoot).partitionMetrics.values.sum
      StreamResult(turns, sec)
    } finally {
      // tmpfs artifacts must not outlive the run, even on failure
      try {
        import scala.jdk.CollectionConverters._
        Files.walk(work).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } catch { case _: Throwable => }
    }
  }
}
