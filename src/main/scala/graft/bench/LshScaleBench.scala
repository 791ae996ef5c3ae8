package graft.bench

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gen.{DocGen, EmbGen}
import graft.ops.{Dedup, Similarity}

/** Candidate-generation scale curves for the LSH dedup paths (round-2
  * VERDICT #7): the gate queries run at 1–4k vectors / 2k docs where
  * candidate generation is trivially cheap, so the "100-TB safe" claims
  * rested on plan-shape arguments. This bench measures candidate count,
  * wall time and shuffle bytes at two corpus sizes per path, so the claims
  * rest on a curve:
  *
  *  - MinHash band join (docs): band hashes live in a 2^64 domain, so
  *    non-similar docs essentially never share a bucket — candidates track
  *    the true duplicate population (≈ linear in n).
  *  - Hyperplane sketch (embeddings), gate default tables=4 × bits=4: only
  *    16 buckets per table, so random near-orthogonal vectors collide at
  *    rate n²/8 — correct and fast at gate scale, but QUADRATIC. The bench
  *    shows the 4× corpus → ~16× candidates blow-up explicitly.
  *  - Scale setting tables=8 × bits=12 (4096 buckets/table): collisions
  *    drop by the bucket count while the extra tables keep planted-dup
  *    (cos ≈ 0.995) recall at ~1−1e-4; candidates return to ≈ linear. At
  *    100 TB, bits grows with log₂(corpus) — the knob is a parameter, and
  *    this run is the measured evidence for how to set it.
  */
object LshScaleBench {

  /** Sum of shuffle bytes written by tasks while one action runs. */
  private final class ShuffleTally extends SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  final case class M(rows: Long, sec: Double, shuffleBytes: Long)

  private def measure(spark: SparkSession, df: => DataFrame): M = {
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    val t0 = System.nanoTime()
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800) // listener bus drains asynchronously
    spark.sparkContext.removeSparkListener(tally)
    M(n, sec, tally.written.get)
  }

  private def plantedEmbPairs(n: Long): Set[(Long, Long)] =
    (0L until n).filter(i => i % 7 == 3 && i - i % 7 != i)
      .map(i => (i - i % 7, i)).toSet

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lines = scala.collection.mutable.ArrayBuffer[String]()
    def report(s: String): Unit = { println(s); lines += s }

    // ---- embeddings: gate default (4x4) at 10k/40k --------------------------
    val embSmallN = sys.env.getOrElse("GRAFT_LSH_EMB_SMALL", "10000").toInt
    val embBigN = sys.env.getOrElse("GRAFT_LSH_EMB_BIG", "40000").toInt
    val embHugeN = sys.env.getOrElse("GRAFT_LSH_EMB_HUGE", "160000").toInt

    Seq(embSmallN, embBigN).foreach { n =>
      val embs = EmbGen.dataset(spark, n).cache()
      embs.count()
      val cand = measure(spark, Similarity.embedDupCandidates(embs))
      val pairs = Similarity.embedDupLsh(embs)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = plantedEmbPairs(n)
      report(f"| emb 4x4 | $n%d | ${cand.rows}%d | ${cand.sec}%.1f | " +
        f"${cand.shuffleBytes / 1e6}%.0f | ${pairs.size}%d | " +
        f"${planted.intersect(pairs).size}/${planted.size} |")
      embs.unpersist()
    }

    // ---- embeddings: scale setting (8x12) at 40k/160k -----------------------
    Seq(embBigN, embHugeN).foreach { n =>
      val embs = EmbGen.dataset(spark, n).cache()
      embs.count()
      val cand = measure(spark,
        Similarity.embedDupCandidates(embs, tables = 8, bits = 12))
      val pairs = Similarity.embedDupLsh(embs, tables = 8, bits = 12)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val planted = plantedEmbPairs(n)
      report(f"| emb 8x12 | $n%d | ${cand.rows}%d | ${cand.sec}%.1f | " +
        f"${cand.shuffleBytes / 1e6}%.0f | ${pairs.size}%d | " +
        f"${planted.intersect(pairs).size}/${planted.size} |")
      embs.unpersist()
    }

    // ---- docs: MinHash band join at 10k/40k ---------------------------------
    val docSmallN = sys.env.getOrElse("GRAFT_LSH_DOC_SMALL", "10000").toInt
    val docBigN = sys.env.getOrElse("GRAFT_LSH_DOC_BIG", "40000").toInt
    Seq(docSmallN, docBigN).foreach { n =>
      val docs = DocGen.dataset(spark, n).cache()
      docs.count()
      val cand = measure(spark, Dedup.minhashLshCandidates(docs))
      val verified = measure(spark, Dedup.minhashLshPairs(docs))
      report(f"| minhash 16x4 | $n%d | ${cand.rows}%d | ${cand.sec}%.1f | " +
        f"${cand.shuffleBytes / 1e6}%.0f | ${verified.rows}%d | - |")
      docs.unpersist()
    }

    // plain concatenation (stripMargin would eat the inserted rows' pipes);
    // the reading text states what round 3's run actually measured: minhash
    // linear; hyperplane Θ(n²/2^bits) at any fixed bits, with the bits knob
    // buying the constant (58× at 40k) and recall held by tables
    val md =
      "\n## LSH candidate scale curves (round 3)\n\n" +
        "Candidate generation measured at two corpus sizes per path\n" +
        "(`graft.bench.LshScaleBench`, local[32]). Columns: candidates,\n" +
        "seconds, shuffle MB for the candidate stage; verified pairs; planted\n" +
        "near-dup recall (embeddings plant one cos≈0.995 pair per 7 ids).\n\n" +
        "| path | corpus | candidates | sec | shuffle MB | pairs | recall |\n" +
        "|---|---|---|---|---|---|---|\n" +
        lines.mkString("\n") + "\n\n" +
        "Reading the curves honestly: MinHash band candidates are LINEAR in\n" +
        "the corpus (candidates ≈ the true dup population; 2^64 band-hash\n" +
        "domain). Hyperplane-sketch candidates are Θ(n²/2^bits) at ANY fixed\n" +
        "bits — the knob buys the constant, not the exponent — so at scale\n" +
        "`bits ≈ log₂(corpus) − c` holds candidates/row constant while\n" +
        "`tables` holds recall; the two measured settings pin c.\n"
    Files.write(Paths.get("/root/repo/BENCH.md"), md.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    spark.stop()
  }
}
