package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures what the sorted-scan report (`SupportsReportOrdering`) buys on
  * the query shape it targets: a window over the natural key
  * `(conv_id, turn_idx)` on a compacted, key-grouped table. Three variants
  * of the SAME query, isolated by session toggles:
  *
  *  - **ordered** (grouping + ordering reported): scan → window. No
  *    Exchange, no Sort.
  *  - **noOrder** (`spark.sql.graft.reportOrdering=false`): the key-grouped
  *    scan still kills the Exchange, but Spark re-sorts every partition —
  *    this isolates the Sort the report deletes.
  *  - **packed** (`spark.sql.graft.preserveDataGrouping=false`): the
  *    pre-round-5 shape — full hash Exchange + Sort.
  *
  * Each variant is measured in TWO memory regimes, because the honest
  * local-scale result is regime-dependent:
  *
  *  - **inMem**: partitions fit in execution memory. Here the deleted Sort
  *    is nearly free (radix over an already-sorted run) and Spark's
  *    whole-stage-codegen output handoff makes the sort-free plan slightly
  *    SLOWER — reported as measured, not hidden.
  *  - **spill** (`spark.shuffle.spill.numElementsForceSpillThreshold`
  *    capped, fresh session — it is a core conf read at task time): the
  *    sorter spills and merge-reads every partition, the regime a 100 TB
  *    table actually lives in (partition >> executor memory). This is
  *    where the report pays: the ordered plan has NO sorter to spill.
  *
  * The plan shape per variant (sort/exchange node counts) is recorded next
  * to the timings, so the JSON carries its own proof that each variant ran
  * the plan it claims. Prints ONE JSON line; medians of 5 after one
  * warm-up per variant. */
object OrderingBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def median5(f: => Unit): Double = {
    f // warm-up
    val xs = (1 to 5).map(_ => timeS(f)).sorted
    xs(2)
  }

  private def session(cpus: Int, forceSpillEvery: Option[Int]): SparkSession = {
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
    forceSpillEvery.foreach(n => b.config(
      "spark.shuffle.spill.numElementsForceSpillThreshold", n.toString))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val sparkA = session(cpus, None)
    import sparkA.implicits._

    val warehouse = "/tmp/gob-warehouse"
    val root = s"$warehouse/db/ordering_bench"
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }

    val buckets = cpus // the at-scale regime: buckets sized to the cluster
    val epochs = 8
    val convsPerEpoch = sys.env.getOrElse("GRAFT_ORD_CONVS", "1024").toInt
    val turns = 96
    val base = 1767225600L * 1000000L
    def payload(e: Int, c: Int, i: Int): String = {
      val seed = (e.toLong * 1000003L + c) * 1000003L + i
      val r = new java.util.Random(seed)
      val sb = new java.lang.StringBuilder(64)
      (0 until 8).foreach(_ => sb.append(f"${r.nextLong()}%016x"))
      sb.toString
    }

    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp, text string", buckets)
    (0 until epochs).foreach { e =>
      val rows = for (c <- 0 until convsPerEpoch; i <- 0 until turns) yield
        (f"c${e.toLong * convsPerEpoch + c}%08d", i,
          new java.sql.Timestamp((base + e * 3600L * 1000000L +
            c * 1000000L + i) / 1000L), payload(e, c, i))
      assert(table.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "ts", "text"), "bench", e, buckets))
    }
    table.compact(sparkA, numBuckets = buckets, full = true)
    val totalRows = epochs.toLong * convsPerEpoch * turns

    /** (orderedSec, noOrderSec, packedSec, plan shapes) in one session. */
    def measure(spark: SparkSession): (Double, Double, Double, Seq[(Int, Int)]) = {
      // catalog route: KeyGroupedPartitioning resolves its bucket function
      // through the FunctionCatalog
      spark.conf.set("spark.sql.catalog.gob",
        classOf[graft.catalog.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gob.warehouse", warehouse)
      def src(): DataFrame = spark.table("gob.db.ordering_bench")

      // the window query: per-conv running stats + first-turn extraction —
      // needs conv_id distribution AND (conv_id, turn_idx) ordering
      def run(): Unit = {
        val w = Window.partitionBy("conv_id").orderBy("turn_idx")
        val df = src().select(col("conv_id"), col("turn_idx"), col("text"),
            row_number().over(w).as("rn"),
            lag(col("text"), 1).over(w).as("prev"))
          .filter(col("rn") <= 2)
        df.agg(count(lit(1)), sum(crc32(col("text"))),
          sum(crc32(coalesce(col("prev"), lit("")))))
          .collect()
        ()
      }
      def planShape(): (Int, Int) = {
        val w = Window.partitionBy("conv_id").orderBy("turn_idx")
        val df = src().select(col("conv_id"), col("turn_idx"),
          row_number().over(w).as("rn"))
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        ("Sort \\[".r.findAllIn(plan).size, "Exchange".r.findAllIn(plan).size)
      }
      def setGrouping(on: Boolean): Unit =
        spark.conf.set("spark.sql.graft.preserveDataGrouping", on.toString)
      def setOrdering(on: Boolean): Unit =
        spark.conf.set("spark.sql.graft.reportOrdering", on.toString)

      setGrouping(true); setOrdering(true)
      val shapeOrdered = planShape()
      val orderedSec = median5(run())
      setOrdering(false)
      val shapeNoOrder = planShape()
      val noOrderSec = median5(run())
      setGrouping(false)
      val shapePacked = planShape()
      val packedSec = median5(run())
      setGrouping(true); setOrdering(true)
      (orderedSec, noOrderSec, packedSec,
        Seq(shapeOrdered, shapeNoOrder, shapePacked))
    }

    val (ordMem, noOrdMem, packedMem, shapes) = measure(sparkA)

    // regime 2: the sorter force-spills (merge-read per partition) — a
    // core conf read from SparkEnv at task time, so a fresh session
    sparkA.stop()
    val sparkB = session(cpus, Some(1 << 16))
    val (ordSpill, noOrdSpill, packedSpill, shapesSpill) = measure(sparkB)

    assert(shapes == shapesSpill,
      s"plan shapes must not depend on the memory regime: $shapes vs $shapesSpill")
    val Seq((so, eo), (sn, en), (sp, epk)) = shapes
    val json =
      s"""{"metric":"ordering_bench","unit":"sec","rows":$totalRows,""" +
      s""""buckets":$buckets,"epochs":$epochs,""" +
      s""""inMem":{"orderedSec":$ordMem,"noOrderSec":$noOrdMem,"packedSec":$packedMem},""" +
      s""""spill":{"orderedSec":$ordSpill,"noOrderSec":$noOrdSpill,"packedSec":$packedSpill},""" +
      s""""planOrdered":{"sorts":$so,"exchanges":$eo},""" +
      s""""planNoOrder":{"sorts":$sn,"exchanges":$en},""" +
      s""""planPacked":{"sorts":$sp,"exchanges":$epk}}"""
    println(json)
    sparkB.stop()
  }
}
