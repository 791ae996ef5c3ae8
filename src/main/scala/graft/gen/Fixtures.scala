package graft.gen

import java.io.File
import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk deterministic fixtures, keyed by the driver's sf directory name.
  *
  * BASELINE.json `input_hint` mandates the transcripts schema with
  * deterministic synthesis (no external data), so each gate query first
  * ensures the synthetic parquet exists under `/root/repo/data/` and the
  * DuckDB oracle reads the very same files via `read_parquet(...)` — both
  * engines see identical rows by construction.
  */
object Fixtures {
  val DataRoot: String = sys.env.getOrElse("GRAFT_DATA_DIR", "/root/repo/data")

  def sfName(sfDir: String): String = Paths.get(sfDir).getFileName.toString

  /** Scale mapping: ~25 turns/conv average (see TranscriptGen.nTurnsFor). */
  def specFor(name: String): GenSpec = name match {
    case "sf0.001" => GenSpec(nConvs = 100)
    case "sf0.01"  => GenSpec(nConvs = 2000)
    case "sf0.1"   => GenSpec(nConvs = 20000)
    case _         => GenSpec(nConvs = 200)
  }

  /** Hot-key fixture: conv 0 carries ~half of all turns. */
  def skewSpecFor(name: String): GenSpec = name match {
    case "sf0.1" => GenSpec(nConvs = 2000, skewed = true)
    case _       => GenSpec(nConvs = 400, skewed = true)
  }

  def transcriptsPath(name: String): String = s"$DataRoot/transcripts_$name"
  def transcriptsSkewPath(name: String): String = s"$DataRoot/transcripts_skew_$name"

  private def ensure(spark: SparkSession, path: String, spec: GenSpec): Unit =
    synchronized {
      if (!new File(path, "_SUCCESS").exists()) {
        // TIMESTAMP_MICROS so DuckDB reads the same instants back.
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        val files = math.max(4, spec.nConvs / 2000)
        TranscriptGen.dataset(spark, spec).toDF()
          // hash-partition by conv_id: the layout the engine wants (all turns
          // of a conversation co-located), sorted for stable within-file order
          .repartition(files, col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")
          .write.mode("overwrite").parquet(path)
      }
    }

  def transcripts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = transcriptsPath(name)
    ensure(spark, path, specFor(name))
    spark.read.parquet(path)
  }

  def transcriptsSkew(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = transcriptsSkewPath(name)
    ensure(spark, path, skewSpecFor(name))
    spark.read.parquet(path)
  }

  def transcriptsLatePath(name: String): String = s"$DataRoot/transcripts_late_$name"

  /** Arrival-order fixture for the late-data gate (2.8d): the transcripts
    * table with an `arrival_seq` column. Normal rows arrive in event-time
    * order (so they can never be late); a deterministic ~1% are planted
    * 5000 arrival positions later than their event time — far enough past
    * the watermark delay that every planted row is late at every sf. */
  def transcriptsLate(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = transcriptsLatePath(name)
    synchronized {
      if (!new File(path, "_SUCCESS").exists()) {
        spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("ts"), col("conv_id"), col("turn_idx"))
        transcripts(spark, sfDir).select("conv_id", "turn_idx", "ts")
          .withColumn("base_seq", row_number().over(w).cast("long"))
          .withColumn("arrival_seq",
            when(pmod(xxhash64(col("conv_id"), col("turn_idx"), lit(777L)),
              lit(97L)) === 0L, col("base_seq") + 5000L)
              .otherwise(col("base_seq")))
          .drop("base_seq")
          .repartition(4, col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")
          .write.mode("overwrite").parquet(path)
      }
    }
    spark.read.parquet(path)
  }

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  // -- synthetic corpora with planted duplicates (dedup/similarity ops) ------

  def docsPath(name: String): String = s"$DataRoot/docs_$name"
  def embPath(name: String): String = s"$DataRoot/emb_$name"

  def nDocsFor(name: String): Int = name match {
    case "sf0.001" => 500
    case "sf0.01"  => 2000
    case "sf0.1"   => 20000
    case _         => 500
  }

  def nVecsFor(name: String): Int = name match {
    case "sf0.001" => 500
    case "sf0.01"  => 1000
    // all-pairs baseline is O(n^2·dim); 4k keeps the exact query honest at
    // bench scale while the LSH path is the actual scale story
    case "sf0.1"   => 4000
    case _         => 500
  }

  def docs(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = docsPath(name)
    synchronized {
      if (!new File(path, "_SUCCESS").exists())
        DocGen.dataset(spark, nDocsFor(name))
          .repartition(4).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  def mediaPath(name: String): String = s"$DataRoot/media_$name"

  def nMediaFor(name: String): Int = name match {
    case "sf0.1" => 10000
    case _       => 2000
  }

  def media(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = mediaPath(name)
    synchronized {
      if (!new File(path, "_SUCCESS").exists())
        graft.ops.MultiModal.dataset(spark, nMediaFor(name))
          .toDF().repartition(4).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  def embs(spark: SparkSession, sfDir: String): DataFrame = {
    val name = sfName(sfDir)
    val path = embPath(name)
    synchronized {
      if (!new File(path, "_SUCCESS").exists())
        EmbGen.dataset(spark, nVecsFor(name))
          .repartition(4).write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
