package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.CmsAggExpr

/** Estimate-read-path cost probe (round-3 VERDICT "What's wrong #1"): the
  * broadcast-decoded `estimateAll` path must cost the same per row at any
  * sketch size, while the old join + `graft_cms_est` projection re-parses
  * the serialized sketch per row (cost ∝ sketch bytes). Keys are synthetic
  * high-cardinality strings so the sketch folds past MaxTrackedKeys and
  * serializes at its full depth×width cell size. */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nKeys = sys.env.getOrElse("GRAFT_CMS_KEYS", "200000").toInt
    val nEst = sys.env.getOrElse("GRAFT_CMS_EST_ROWS", "1000").toInt
    val reps = sys.env.getOrElse("GRAFT_CMS_REPS", "3").toInt
    // 4 groups ("roles"), nKeys distinct keys each — folds every sketch
    val rows = spark.range(nKeys.toLong * 4)
      .select(concat(lit("role"), col("id") % 4).as("role"),
        concat(lit("k"), col("id")).as("token"))
      .persist()
    rows.count()
    val keys = rows.limit(nEst).persist()
    keys.count()

    def medianOf(f: => Long): (Double, Long) = {
      var check = 0L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        check = f
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (times(times.length / 2), check)
    }

    Seq(1 << 13, 1 << 16).foreach { width =>
      val sk = rows.groupBy("role")
        .agg(CmsAggExpr.cmsSketch(col("token"), 4, width).as("sk")).persist()
      val skBytes = sk.select(length(col("sk"))).collect().map(_.getInt(0)).max
      def sumEst(df: DataFrame): Long =
        df.agg(sum(col("est"))).collect()(0).getLong(0)
      val (newS, a) = medianOf {
        val v = sumEst(CmsAggExpr.estimateAll(keys, sk, "role", "sk", "token"))
        CmsAggExpr.releaseBroadcasts() // reps would otherwise accumulate blocks
        v
      }
      val (oldS, b) = medianOf(
        sumEst(keys.join(broadcast(sk), "role")
          .select(CmsAggExpr.cmsEst(col("sk"), col("token")).as("est"))))
      require(a == b, s"estimate mismatch $a != $b")
      println(f"""{"bench":"cms_est","width":$width,"sketch_bytes":$skBytes,""" +
        f""""est_rows":$nEst,"broadcast_decoded_s":$newS%.3f,""" +
        f""""join_per_row_parse_s":$oldS%.3f,""" +
        f""""decoded_us_per_row":${newS * 1e6 / nEst}%.1f,""" +
        f""""parse_us_per_row":${oldS * 1e6 / nEst}%.1f}""")
      sk.unpersist()
    }
    spark.stop()
  }
}
