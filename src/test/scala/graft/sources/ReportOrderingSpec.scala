package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.table.IcebergLite

/** Sorted-scan report (`SupportsReportOrdering`): on the key-grouped path
  * the scan proves `(conv_id ASC, turn_idx ASC)` per partition from the
  * manifest — single file per bucket (compaction's shape), or a
  * strictly-disjoint conv-bounds run — and Spark then plans windows /
  * sort-aggregates over the natural key with NEITHER an Exchange NOR a
  * Sort. The claim must decline whenever the concatenation order is
  * unprovable: overlapping epochs, mid-run nulls, absent bounds. */
class ReportOrderingSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L
  private def tsAt(d: Long) = new java.sql.Timestamp((baseMicros + d) / 1000L)

  // key-grouped scans need the catalog's bucket function (FunctionCatalog)
  // to resolve the reported KeyGroupedPartitioning — the path API cannot
  private lazy val warehouse = tmpDir("ord-warehouse")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gord",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gord.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gord.db")
  }

  private def conn(name: String): DataFrame = spark.table(s"gord.db.$name")

  private def tablePath(name: String): String = s"$warehouse/db/$name"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val grouped = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.graft.preserveDataGrouping" -> "true")

  /** row_number over the natural key — requires conv_id distribution AND
    * (conv_id, turn_idx) ordering. */
  private def windowed(df: DataFrame): DataFrame =
    df.select(col("conv_id"), col("turn_idx"),
      row_number().over(
        Window.partitionBy("conv_id").orderBy("turn_idx")).as("rn"))

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def sorts(plan: String): Int = "Sort \\[".r.findAllIn(plan).size
  private def exchanges(plan: String): Int =
    "Exchange".r.findAllIn(plan).size

  /** Epochs with the SAME conv population (bounds overlap across files). */
  private def overlappingTable(name: String): IcebergLite = {
    import spark.implicits._
    val t = new IcebergLite(tablePath(name))
    t.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (f"conv$c%02d", ep.toInt * 5 + i, tsAt(ep * 3600000000L + i))
      assert(t.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    t
  }

  /** Epochs with DISJOINT conv populations (time-correlated id scheme):
    * epoch e holds conv{e}*, so each bucket's files form a disjoint run. */
  private def disjointTable(name: String): IcebergLite = {
    import spark.implicits._
    val t = new IcebergLite(tablePath(name))
    t.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (f"conv$ep${c}%02d", i, tsAt(ep * 3600000000L + i))
      assert(t.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    t
  }

  test("compacted table: window over the natural key plans with NO " +
      "Exchange and NO Sort; results exact") {
    val t = overlappingTable("ord_compact")
    val baseline = windowed(conn("ord_compact")).orderBy("conv_id", "turn_idx").collect()
    t.compact(spark, numBuckets = 4, full = true)
    withConfs(grouped: _*) {
      val df = windowed(conn("ord_compact"))
      val plan = planOf(df)
      assert(exchanges(plan) === 0, s"window shuffled:\n$plan")
      assert(sorts(plan) === 0, s"window re-sorted a scan-ordered input:\n$plan")
      assert(df.orderBy("conv_id", "turn_idx").collect() === baseline)
    }
    // packed path (grouping off explicitly — the default heuristic would
    // still key-group 4 buckets at local[4]): same rows, Sort present —
    // the claim is key-grouped-only by design
    withConfs("spark.sql.graft.preserveDataGrouping" -> "false") {
      val off = windowed(conn("ord_compact"))
      assert(sorts(planOf(off)) > 0)
      assert(off.orderBy("conv_id", "turn_idx").collect() === baseline)
    }
    // ordering toggle alone: key-grouped (no Exchange) but Sort returns
    withConfs((grouped :+
        ("spark.sql.graft.reportOrdering" -> "false")): _*) {
      val df = windowed(conn("ord_compact"))
      val plan = planOf(df)
      assert(sorts(plan) > 0 && exchanges(plan) === 0,
        s"reportOrdering=false must keep grouping but drop the claim:\n$plan")
      assert(df.orderBy("conv_id", "turn_idx").collect() === baseline)
    }
  }

  test("disjoint multi-epoch buckets qualify WITHOUT compaction; " +
      "overlapping epochs decline (Sort stays)") {
    disjointTable("ord_disjoint")
    withConfs(grouped: _*) {
      val df = windowed(conn("ord_disjoint"))
      val plan = planOf(df)
      assert(sorts(plan) === 0,
        s"disjoint-bounds run must prove ordering pre-compaction:\n$plan")
      assert(exchanges(plan) === 0)
      // exactness: every conv has rn 1..5 matching turn_idx+1
      assert(df.filter(col("rn") =!= col("turn_idx") + 1).count() === 0L)
      assert(df.count() === 3L * 8L * 5L)
    }
    overlappingTable("ord_overlap")
    withConfs(grouped: _*) {
      val df = windowed(conn("ord_overlap"))
      val plan = planOf(df)
      assert(sorts(plan) > 0,
        s"overlapping epochs must NOT claim ordering:\n$plan")
      assert(exchanges(plan) === 0, "distribution is still satisfied")
      assert(df.filter(col("rn") =!= col("turn_idx") + 1).count() === 0L)
    }
  }

  test("conv_id nulls outside the first file of a run decline the claim") {
    import spark.implicits._
    val t = new IcebergLite(tablePath("ord_nulls"))
    t.create("conv_id string, turn_idx int, ts timestamp", 1)
    // epoch 0: convs a*; epoch 1: convs b* plus NULL conv rows — the null
    // rows sort at the head of epoch 1's file, i.e. mid-run globally
    val e0 = (0 until 6).map(i => (s"a$i", i, tsAt(i)))
    assert(t.commitEpoch(e0.toDF("conv_id", "turn_idx", "ts"), "w", 0L, 1))
    val e1 = (0 until 6).map(i => (s"b$i", i, tsAt(i))) ++
      Seq((null: String, 99, tsAt(99L)))
    assert(t.commitEpoch(e1.toDF("conv_id", "turn_idx", "ts"), "w", 1L, 1))
    // manifest records the null presence exactly
    val files = t.effectiveFiles.sortBy(_.path)
    assert(files.map(_.convIdNulls) === Seq(Some(0L), Some(1L)))
    withConfs(grouped: _*) {
      val df = windowed(conn("ord_nulls"))
      assert(sorts(planOf(df)) > 0,
        "a mid-run null file must decline the ordering claim")
      assert(df.count() === 13L)
    }
    // same shape but nulls in the FIRST file of the run: claim holds
    // (nulls lead the first file, which leads the run)
    val t2 = new IcebergLite(tablePath("ord_nulls_first"))
    t2.create("conv_id string, turn_idx int, ts timestamp", 1)
    val f0 = (0 until 6).map(i => (s"a$i", i, tsAt(i))) ++
      Seq((null: String, 99, tsAt(99L)))
    assert(t2.commitEpoch(f0.toDF("conv_id", "turn_idx", "ts"), "w", 0L, 1))
    val f1 = (0 until 6).map(i => (s"b$i", i, tsAt(i)))
    assert(t2.commitEpoch(f1.toDF("conv_id", "turn_idx", "ts"), "w", 1L, 1))
    withConfs(grouped: _*) {
      val df = windowed(conn("ord_nulls_first"))
      assert(sorts(planOf(df)) === 0,
        "nulls confined to the run's FIRST file keep the claim")
      assert(df.count() === 13L)
    }
  }
}
