package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.gen.EmbGen
import graft.ops.Similarity

/** Recall / scanned-fraction curve for the IVF approximate top-k: the
  * measured evidence behind the nprobe knob (BENCH.md). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("GRAFT_IVF_N", "40000").toInt
    val nlist = sys.env.getOrElse("GRAFT_IVF_NLIST", "64").toInt
    val embs = EmbGen.dataset(spark, n).cache()
    embs.count()
    val exact = Similarity.annTopK(embs, "vec_id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t0 = System.nanoTime()
    val cents = Similarity.ivfTrain(embs, "vec_id", "vec", nlist)
    val trainSec = (System.nanoTime() - t0) / 1e9
    // scanned fraction per query = Σ sizes of probed lists / corpus
    val assign = udf { (v: Seq[Long]) => SimBridge.nearest(cents, v.toArray) }
    val listSizes = embs.select(Similarity.quantCol(col("vec")).as("q"))
      .select(assign(col("q")).as("l")).groupBy("l").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    Seq(2, 4, 8, 16).foreach { nprobe =>
      val t1 = System.nanoTime()
      val got = Similarity.ivfTopK(embs, "vec_id", "vec", nlist = nlist,
          nprobe = nprobe, centroidsIn = cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = exact.intersect(got).size.toDouble / exact.size
      println(f"IVF n=$n nlist=$nlist nprobe=$nprobe recall@10=$recall%.3f " +
        f"querySec=$sec%.1f trainSec=$trainSec%.1f")
    }
    println("LISTSIZES min=" + listSizes.values.min + " max=" + listSizes.values.max +
      " mean=" + listSizes.values.sum / listSizes.size)
    spark.stop()
  }
}

/** Bridge exposing the nearest-centroid kernel for the probe. */
object SimBridge {
  def nearest(cs: Array[Array[Long]], v: Array[Long]): Int = {
    var best = 0; var bestScore = Long.MinValue
    var j = 0
    while (j < cs.length) {
      var d = 0L; var c2 = 0L
      val c = cs(j)
      var i = 0
      val nn = math.min(c.length, v.length)
      while (i < nn) { d += c(i) * v(i); c2 += c(i) * c(i); i += 1 }
      val s = 2L * d - c2
      if (s > bestScore) { bestScore = s; best = j }
      j += 1
    }
    best
  }
}
