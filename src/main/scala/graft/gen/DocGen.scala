package graft.gen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.gen.Mix._

/** Deterministic corpus with planted exact and near duplicates — fixture for
  * the dedup operator family (exact, n-gram Jaccard, MinHash+LSH, SimHash).
  * Pure function of (seed, doc_id). */
object DocGen {

  /** ~120–220 tokens per doc from the shared vocab. Every 7th doc is a
    * near-dup of its anchor (2 token substitutions → 5-gram Jaccard ≈ 0.9);
    * every 13th is an exact dup of its anchor. */
  def docFor(docId: Long, seed: Long): (Long, String) = {
    val anchor7 = docId - (docId % 7)
    val anchor13 = docId - (docId % 13)
    // recurse to the anchor's FINAL text (the anchor may itself be a
    // near-dup); chains strictly decrease docId, so this terminates
    if (docId % 13 == 5 && anchor13 != docId) {
      (docId, docFor(anchor13, seed)._2) // exact duplicate
    } else if (docId % 7 == 3 && anchor7 != docId) {
      val toks = docFor(anchor7, seed)._2.split(' ')
      // 2 deterministic substitutions → near duplicate
      var i = 0
      while (i < 2) {
        val pos = draw(seed, docId, 500L + i, toks.length)
        toks(pos) = TranscriptGen.Vocab(draw(seed, docId, 600L + i, TranscriptGen.Vocab.length))
        i += 1
      }
      (docId, toks.mkString(" "))
    } else (docId, baseText(docId, seed))
  }

  private def baseText(docId: Long, seed: Long): String = {
    val n = 120 + draw(seed, docId, 1L, 100)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(TranscriptGen.Vocab(draw(seed, docId, 100L + i, TranscriptGen.Vocab.length)))
      i += 1
    }
    sb.toString
  }

  def dataset(spark: SparkSession, nDocs: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0, nDocs.toLong, 1, parallelism)
      .map(id => docFor(id, seed))
      .toDF("doc_id", "text")
  }
}

/** Deterministic unit-norm embeddings with planted near-duplicates (cosine
  * ≈ 0.995 to their anchor) — fixture for embedding-space dedup. */
object EmbGen {
  val Dim = 32

  def vecFor(vecId: Long, seed: Long): (Long, Array[Float]) = {
    val anchor = vecId - (vecId % 7)
    val base = rawVec(anchor, seed)
    val v =
      if (vecId % 7 == 3 && anchor != vecId) {
        val noise = rawVec(vecId, seed ^ 0x5eedL)
        base.zip(noise).map { case (b, n) => b + 0.05 * n }
      } else if (anchor != vecId) rawVec(vecId, seed)
      else base
    val norm = math.sqrt(v.map(x => x * x).sum)
    (vecId, v.map(x => (x / norm).toFloat))
  }

  private def rawVec(id: Long, seed: Long): Array[Double] =
    Array.tabulate(Dim) { i =>
      // uniform [-1, 1) from the mixed hash
      (Mix.mix(seed, id, 7000L + i).toDouble / Long.MaxValue)
    }

  def dataset(spark: SparkSession, nVecs: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val parallelism = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0, nVecs.toLong, 1, parallelism)
      .map(id => vecFor(id, seed))
      .toDF("vec_id", "vec")
  }
}
