package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.Mix

/** Multimodal-column plumbing (training-data pipeline surface).
  *
  * Media payloads are opaque `binary` columns with a typed metadata struct —
  * the Spark-side contract a 100 TB media pipeline needs: schema, bucketed
  * partitioning, batched per-partition processing (so a real decoder would
  * amortize model/library init per partition, the JVM analogue of a Pandas
  * UDF over `mapInPandas` batches).
  *
  * The decode step itself is a clearly marked STUB: no image/audio codecs
  * exist in this sandbox, so [[FakeDecoder]] derives a deterministic feature
  * vector from the bytes. Everything around it — row shape, batching,
  * partition strategy, null handling — is real and tested, and a codec drops
  * in by replacing one function.
  */
object MultiModal {

  /** media(media_id long, kind string, meta struct<width int, height int,
    * sample_rate int>, payload binary) */
  final case class MediaMeta(width: Int, height: Int, sample_rate: Int)
  final case class MediaRow(media_id: Long, kind: String, meta: MediaMeta,
                            payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 checksum: Long, features: Array[Float])

  val Kinds = Array("image", "audio", "video")

  /** Deterministic synthetic media corpus (seeded bytes; no external data). */
  def dataset(spark: SparkSession, nRows: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, nRows.toLong, 1,
        math.max(spark.sparkContext.defaultParallelism, 4))
      .map { id =>
        val kind = Kinds(Mix.draw(seed, id, 1L, Kinds.length))
        val n = 256 + Mix.draw(seed, id, 2L, 1024)
        val payload = new Array[Byte](n)
        var i = 0
        while (i < n) {
          payload(i) = (Mix.mix(seed, id, 100L + i) & 0xff).toByte
          i += 1
        }
        MediaRow(id, kind,
          MediaMeta(32 + Mix.draw(seed, id, 3L, 480),
            32 + Mix.draw(seed, id, 4L, 480),
            if (kind == "audio") 16000 else 0),
          payload)
      }
  }

  /** STUB decoder — stands in for an image/audio codec (none in sandbox).
    * Deterministic pure function of the bytes: 8-bin byte histogram,
    * L1-normalized. A real decoder replaces exactly this function. */
  object FakeDecoder {
    val Dim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return new Array[Float](Dim)
      val hist = new Array[Int](Dim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) >>> 5) += 1
        i += 1
      }
      hist.map(_.toFloat / payload.length)
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
      h
    }
  }

  /** Batched feature extraction: `mapPartitions` so a real decoder would
    * init once per partition (codec/model load), then stream rows through —
    * the batch shape a Pandas-UDF pipeline would use. Total per row: a
    * malformed payload yields empty features, never a throw (the R6
    * tolerance rule applied to media). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // (real pipeline: val codec = Codec.load() — once per partition)
      rows.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
          FakeDecoder.checksum(bytes), FakeDecoder.decode(bytes))
      }
    }
  }

  /** Per-kind aggregate over extracted features — the downstream shape
    * (group stats feeding curation decisions). Integer/exact columns only. */
  def kindStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("checksum")).as("min_checksum"),
        max(col("checksum")).as("max_checksum"))
}
