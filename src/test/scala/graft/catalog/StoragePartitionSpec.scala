package graft.catalog

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.table.IcebergLite

/** Storage-partitioned reads: with `spark.sql.sources.v2.bucketing.enabled`
  * the connector reports `KeyGroupedPartitioning(bucket(N, conv_id))` and
  * groups scan tasks by bucket, so conv_id aggregations and graft↔graft
  * conv_id equi-joins plan with NO shuffle — the layout the writer already
  * paid for at commit time is finally visible to the planner. */
class StoragePartitionSpec extends SparkSpec {

  private lazy val warehouse = tmpDir("graft-spj-warehouse")

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gspj.db")
  }

  private def sampleDf(n: Int, base: Long = 1767225600L) = {
    import spark.implicits._
    (0 until n).map { i =>
      (f"conv-${i % 37}%03d", i, "user", "none", s"text $i",
        new Timestamp((base + i) * 1000L))
    }.toDF("conv_id", "turn_idx", "role", "tool", "text", "ts")
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Final (post-AQE) physical plan text, after forcing execution. */
  private def executedPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("catalog bucket function matches the writer's hash exactly") {
    val fn = GraftFunctions.BucketBound
    val ids = (0 until 500).map(i => s"conv-$i") ++
      Seq("", "åß∂ unicode", "a" * 1000)
    for (n <- Seq(1, 2, 8, 32); id <- ids) {
      val expect = IcebergLite.bucketOf(id, n)
      assert(fn.invoke(n, UTF8String.fromString(id)) === expect, s"invoke($n, $id)")
      assert(fn.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(n, UTF8String.fromString(id)))
        === expect, s"produceResult($n, $id)")
    }
    // null conv_id routes like the writer (Murmur3Hash leaves the seed)
    assert(fn.invoke(8, null) ===
      ((42 % 8) + 8) % 8)
  }

  test("groupBy(conv_id) plans with no Exchange when v2 bucketing is on") {
    spark.sql(
      """CREATE TABLE gspj.db.spj (
        |  conv_id STRING, turn_idx INT, role STRING, tool STRING,
        |  text STRING, ts TIMESTAMP)
        |TBLPROPERTIES ('buckets'='4')""".stripMargin)
    sampleDf(200).createOrReplaceTempView("spj_src")
    spark.sql("INSERT INTO gspj.db.spj SELECT conv_id, turn_idx, role, tool, text, ts FROM spj_src")
    spark.sql("INSERT INTO gspj.db.spj SELECT conv_id, turn_idx, role, tool, text, ts FROM spj_src")

    def agg() = spark.table("gspj.db.spj")
      .groupBy("conv_id").count().orderBy("conv_id")
    val baseline = agg().collect()

    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val df = agg()
      val plan = executedPlan(df)
      // the aggregation itself must not shuffle; the orderBy's range
      // exchange is expected, so count exchanges instead of forbidding all
      val exchanges = "Exchange".r.findAllIn(plan).size -
        "rangepartitioning".r.findAllIn(plan.toLowerCase).size
      assert(exchanges === 0, s"aggregation shuffled:\n$plan")
      assert(df.collect() === baseline)
    }
    // conf off: same results through the packed-partition path
    assert(agg().collect() === baseline)
  }

  test("self equi-join on conv_id runs storage-partitioned (no shuffle)") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val t = spark.table("gspj.db.spj")
        .select("conv_id", "turn_idx", "text")
      val joined = t.as("a").join(t.as("b"), "conv_id")
      val plan = executedPlan(joined)
      assert(!plan.contains("Exchange"), s"join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a partitioned join:\n$plan")
      // row count = sum over conv of n_conv^2 — verified against the
      // shuffle plan with the report disabled
      val expected = withConfsOff {
        t.as("a").join(t.as("b"), "conv_id").count()
      }
      assert(joined.count() === expected)
    }
  }

  private def withConfsOff[T](body: => T): T = {
    val k = "spark.sql.sources.v2.bucketing.enabled"
    val saved = spark.conf.getOption(k)
    spark.conf.set(k, "false")
    try body
    finally saved.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("conv_id pruning composes with key-grouped partitions") {
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val one = spark.table("gspj.db.spj")
        .where("conv_id = 'conv-001'").groupBy("conv_id").count()
      val rows = one.collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(1) > 0L)
    }
  }

  test("preserveDataGrouping overrides the buckets-vs-cores heuristic " +
    "both ways") {
    // buckets(4) >= defaultParallelism(4) → grouped by default; the
    // explicit 'false' restores the packed, shuffling plan
    withConfs("spark.sql.graft.preserveDataGrouping" -> "false") {
      val df = spark.table("gspj.db.spj").groupBy("conv_id").count()
      assert(executedPlan(df).contains("Exchange"),
        "preserveDataGrouping=false must fall back to packed partitions")
    }
    // a 2-bucket table on 4 cores: heuristic says packed (grouping would
    // halve scan parallelism); explicit 'true' opts into SPJ anyway
    val root = s"$warehouse/db/tiny"
    val lite = new IcebergLite(root)
    lite.create("conv_id STRING, turn_idx INT, role STRING, tool STRING, " +
      "text STRING, ts TIMESTAMP", 2)
    assert(lite.commitEpoch(sampleDf(60), "spec", 0L, 2))
    val agg = () => spark.table("gspj.db.tiny").groupBy("conv_id").count()
    assert(executedPlan(agg()).contains("Exchange"),
      "2 buckets < 4 cores must default to packed partitions")
    withConfs("spark.sql.graft.preserveDataGrouping" -> "true") {
      assert(!executedPlan(agg()).contains("Exchange"),
        "preserveDataGrouping=true must force the key-grouped scan")
    }
  }

  test("mixed bucket layouts fall back to packed partitions, still correct") {
    val root = s"$warehouse/db/mixed"
    val lite = new IcebergLite(root)
    lite.create("conv_id STRING, turn_idx INT, role STRING, tool STRING, " +
      "text STRING, ts TIMESTAMP", 4)
    assert(lite.commitEpoch(sampleDf(50), "spec", 0L, 4))
    assert(lite.commitEpoch(sampleDf(50), "spec", 1L, 2)) // layout change
    withConfs("spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val df = spark.table("gspj.db.mixed").groupBy("conv_id").count()
      val plan = executedPlan(df)
      assert(plan.contains("Exchange"),
        s"mixed layouts must NOT report key grouping:\n$plan")
      assert(df.collect().map(_.getLong(1)).sum === 100L)
    }
  }
}
