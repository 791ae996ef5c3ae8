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

  def specFor(sfName: String): GenSpec = Fixtures.specFor(sfName)

  def ensureSlices(spark: SparkSession, sfDir: String, k: Int = 8): String = {
    val name = Fixtures.sfName(sfDir)
    val d = sliceDir(name)
    StreamFixtures.writeSlices(spark, specFor(name), d, k)
    d
  }

  def run(spark: SparkSession, sfDir: String, numBuckets: Int = 0): StreamResult = {
    val slices = ensureSlices(spark, sfDir)
    val buckets =
      if (numBuckets > 0) numBuckets
      else spark.sparkContext.defaultParallelism
    val work = Files.createTempDirectory("streambench")
    val tableRoot = work.resolve("table").toString
    val cp = work.resolve("cp").toString
    val t0 = System.nanoTime()
    val q = Pipeline.runRedactionToTable(spark, slices, tableRoot, cp,
      numBuckets = buckets, maxFilesPerTrigger = 1)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val turns = new IcebergLite(tableRoot).partitionMetrics.values.sum
    // clean up bench artifacts (tmp dir)
    try {
      import scala.jdk.CollectionConverters._
      Files.walk(work).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    } catch { case _: Throwable => }
    StreamResult(turns, sec)
  }
}
