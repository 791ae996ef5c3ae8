package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures the DSv2 connector's vectorized read against a raw
  * `spark.read.parquet` over the SAME data files (round-3 VERDICT #8: the
  * parity claim at `IcebergLiteSource` deserved a number). Two workloads:
  * a heavy full-decode aggregate (forces the text payload through the
  * decoder) and a narrow two-column projection (exercises column pruning).
  * Medians of 5 interleaved reps (each round runs both paths, alternating
  * which goes first) after one untimed warm-up of both. */
object ConnectorReadBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = sys.env.getOrElse("GRAFT_CONNBENCH_ROOT",
      s"/tmp/graft-connbench-${new java.io.File(sfDir).getName}")

    // copies > 1 scales the table volume (same data re-committed under new
    // epochs) to show the fixed planning/launch overhead amortizing
    val copies = sys.env.getOrElse("GRAFT_CONNBENCH_COPIES", "1").toInt
    val table = new IcebergLite(root)
    if (!table.exists) {
      val tx = graft.gen.Fixtures.transcripts(spark, sfDir)
      table.create(
        "conv_id string, turn_idx int, role string, tool string, " +
          "text string, ts timestamp", 32)
      val cols = Seq("conv_id", "turn_idx", "role", "tool", "text", "ts")
      (0 until 4 * copies).foreach { e =>
        table.commitEpoch(
          tx.filter(pmod(crc32(col("conv_id")), lit(4)) === e % 4)
            .select(cols.map(col): _*), "connbench", e.toLong, 32)
      }
    }

    val conn = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", root).load()
    val raw = spark.read.parquet(s"$root/data")

    def heavy(df: DataFrame): Long =
      df.agg(sum(length(col("text"))), sum(col("turn_idx")))
        .collect()(0).getLong(0)
    def narrow(df: DataFrame): Long =
      df.select(col("conv_id"), col("turn_idx")).agg(sum(col("turn_idx")))
        .collect()(0).getLong(0)

    // Genuinely interleaved reps (round-4 ADVICE: the old shape ran all 5
    // connector reps before all 5 raw reps, so raw always started fully
    // page-cache-warm). Each round times both paths, alternating which goes
    // first; one untimed warm-up of both precedes the clock.
    def interleavedMedians(fa: => Long, fb: => Long): (Double, Double, Long, Long) = {
      fa; fb // warm-up: page cache + codegen compiled for BOTH paths
      var (ca, cb) = (0L, 0L)
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val ta = Array.ofDim[Double](5)
      val tb = Array.ofDim[Double](5)
      (0 until 5).foreach { i =>
        if (i % 2 == 0) { ta(i) = t { ca = fa }; tb(i) = t { cb = fb } }
        else { tb(i) = t { cb = fb }; ta(i) = t { ca = fa } }
      }
      (ta.sorted.apply(2), tb.sorted.apply(2), ca, cb)
    }

    // profiling aid: loop one path so stack sampling has a window
    sys.env.get("GRAFT_CONNBENCH_LOOP").foreach { which =>
      val f: () => Long =
        if (which == "conn") () => heavy(conn) else () => heavy(raw)
      (1 to 40).foreach(_ => f())
      spark.stop(); return
    }

    val (heavyConnS, heavyRawS, hc, hr) =
      interleavedMedians(heavy(conn), heavy(raw))
    val (narrowConnS, narrowRawS, nc, nr) =
      interleavedMedians(narrow(conn), narrow(raw))
    require(hc == hr && nc == nr, s"result mismatch: $hc/$hr $nc/$nr")
    val rows = conn.count()
    println(f"""{"bench":"connector_read","sf":"$sfDir","rows":$rows,""" +
      f""""heavy_conn_s":$heavyConnS%.3f,"heavy_raw_s":$heavyRawS%.3f,""" +
      f""""narrow_conn_s":$narrowConnS%.3f,"narrow_raw_s":$narrowRawS%.3f,""" +
      f""""heavy_ratio":${heavyConnS / heavyRawS}%.2f,""" +
      f""""narrow_ratio":${narrowConnS / narrowRawS}%.2f}""")
    spark.stop()
  }
}
