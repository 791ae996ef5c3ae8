package graft.bench

import org.apache.spark.sql.SparkSession

import graft.gen.Fixtures
import graft.ops.Dedup

/** A/B probe for q11's multi-consumer shingle DAG: recompute-per-branch
  * (gate default) vs persisted intermediate. */
object Q11Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Fixtures.docs(spark, sfDir).cache()
    docs.count()
    def time(tag: String, persist: Boolean): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccardPairs(docs, persistShingles = persist).count()
      println(f"$tag rep$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.sharedState.cacheManager.clearCache()
      docs.cache().count() // keep the input cached for both arms
    }
    time("recompute", persist = false)
    time("persist", persist = true)
    spark.stop()
  }
}
