package graft.gen

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Defaults
import graft.stream.Pipeline

/** Epoch-slice fixtures for streaming tests (FIXTURES.md §5): the fixture
  * table split into K time-ordered parquet files — one file ≈ one
  * micro-batch under `maxFilesPerTrigger=1` — plus a final far-future
  * "flush" slice that pushes the event-time watermark past all real data so
  * tail sessions and windows close deterministically.
  */
object StreamFixtures {

  /** Writes `slice-0000.parquet .. slice-<k+1>.parquet` (last = flush) into
    * `dir` with strictly increasing mtimes (file-source processing order).
    * Returns the number of slices written. Idempotent per directory. */
  /** Slice-layout version, stamped into `_DONE`. v2 (round 6): slices are
    * written with 4 MB parquet ROW GROUPS. Round ≤ 5 slices were one
    * ~36 MB row group each, so no split setting could parallelize the
    * per-batch scan — parquet assigns a row group to the one task whose
    * split holds its midpoint, and the stage probe measured effective scan
    * concurrency ≈ 1 (a 2.6 s serial scan inside every 4.4 s micro-batch;
    * guide §2.5 "one huge unsplittable file — fix at the source"). A
    * stamped dir with a different (or empty, pre-v2) version regenerates:
    * same rows, same slice boundaries, splittable layout. */
  private val SliceLayoutVersion = "v2"

  def writeSlices(spark: SparkSession, spec: GenSpec, dir: String, k: Int,
                  gapSec: Long = Defaults.SessionGapSec): Int = synchronized {
    val root = Paths.get(dir)
    val done = root.resolve("_DONE")
    if (Files.exists(done) &&
        new String(Files.readAllBytes(done), "UTF-8").trim == SliceLayoutVersion) {
      return Files.list(root).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    }
    deleteRecursively(root) // absent, stale or pre-v2 layout: rebuild
    Files.createDirectories(root)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    import spark.implicits._
    val all = TranscriptGen.dataset(spark, spec).toDF()
    val maxTsMs = all.agg(max(col("ts"))).head().getTimestamp(0).getTime
    try {
      // one distributed pass: range-partition by event time → k ts-ordered
      // partitions, each published as one slice file (≈ one micro-batch)
      val tmp = root.resolve(".tmp-slices")
      all.repartitionByRange(k, col("ts"), col("conv_id"), col("turn_idx"))
        .sortWithinPartitions("ts", "conv_id", "turn_idx")
        // splittable row groups (see SliceLayoutVersion): the slice file
        // stands in for "one epoch of a 100 TB table", which is never a
        // single parquet row group
        .write.option("parquet.block.size", 4 * 1024 * 1024)
        .mode(SaveMode.Overwrite).parquet(tmp.toString)
      val parts = Files.list(tmp).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
      parts.zipWithIndex.foreach { case (part, i) =>
        publish(part, root, f"slice-$i%04d.parquet", i)
      }
      deleteRecursively(tmp)
      // One flush slice, its own micro-batch: the watermark is computed
      // from data seen in *previous* batches, so the flush batch advances
      // event time past every session gap, and the trailing NO-DATA batch
      // that Spark 4.1 runs under Trigger.AvailableNow when stateful
      // timeouts are pending is where the advanced watermark actually fires
      // them (round 1 used a second flush slice for this; the no-data batch
      // makes it redundant — one fixed batch less per run).
      val flushTs = maxTsMs + (gapSec + 3600L) * 1000L
      val tmpF = root.resolve(".tmp-flush")
      Seq(Pipeline.flushTurn(flushTs)).toDS().toDF()
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmpF.toString)
      val part = Files.list(tmpF).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no parquet in $tmpF"))
      publish(part, root, f"slice-$k%04d.parquet", k)
      deleteRecursively(tmpF)
      Files.write(root.resolve("_DONE"),
        (SliceLayoutVersion + "\n").getBytes("UTF-8"))
      k + 1
    } catch {
      case e: Throwable => deleteRecursively(root); throw e
    }
  }

  private def publish(part: Path, root: Path, name: String, seq: Int): Unit = {
    val dst = root.resolve(name)
    Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
    // strictly increasing mtimes → deterministic file-source order
    Files.setLastModifiedTime(dst, FileTime.fromMillis(1000000000000L + seq * 60000L))
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
}
