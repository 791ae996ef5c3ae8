package graft.sources

import org.apache.parquet.filter2.predicate.FilterApi
import org.apache.parquet.io.api.Binary
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.table.IcebergLite

/** Parquet-level predicate pushdown: pushed ts/conv_id (and other v1-column)
  * filters reach the vectorized reader's conf as `FilterPredicate`s, so
  * parquet's RowGroupFilter drops non-matching row groups before data-page
  * IO. Correctness never depends on it (all filters stay residual) — these
  * tests pin (a) that skipping actually HAPPENS (a no-match predicate
  * decodes zero batches through the exact reader the scan uses), and
  * (b) that results are identical with the feature on, off, and vs the
  * native read. */
class ParquetPushdownSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L // 2026-01-01 UTC

  private def tsAt(deltaMicros: Long): java.sql.Timestamp =
    new java.sql.Timestamp((baseMicros + deltaMicros) / 1000L)

  /** 3 epochs x 4 buckets, 8 convs, hour-disjoint ts per epoch. */
  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("pq-push")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$c", i, tsAt(ep * 3600L * 1000000L + c * 60L * 1000000L + i))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  test("a no-match conv_id predicate decodes ZERO batches at the reader level") {
    val table = buildTable()
    val schema = table.fullReadSchema
    val file = table.effectiveFiles.head
    val path = s"${table.root}/${file.path}"
    // absent conv: row-group stats can never match -> parquet drops every
    // row group and the reader yields nothing. This is the direct proof the
    // conf wiring reaches parquet's RowGroupFilter.
    val none = new VectorizedFileReader(path, schema,
      Some(FilterApi.eq(FilterApi.binaryColumn("conv_id"),
        Binary.fromString("conv_nope"))))
    try assert(!none.next(), "no-match predicate must skip every row group")
    finally none.close()
    // a ts bound beyond the table's range skips everything too (INT64
    // micros comparison - the unit the writers pin)
    val past = new VectorizedFileReader(path, schema,
      Some(FilterApi.ltEq(FilterApi.longColumn("ts"),
        java.lang.Long.valueOf(baseMicros - 1L))))
    try assert(!past.next(), "out-of-range ts predicate must skip the file")
    finally past.close()
    // sanity: a matching predicate still yields batches
    val hit = new VectorizedFileReader(path, schema, None)
    try assert(hit.next(), "unfiltered reader must serve the file")
    finally hit.close()
  }

  test("connector results identical with pushdown on / off / native read") {
    val table = buildTable()
    def connRead() = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()
      .filter(col("conv_id") === "conv3" &&
        col("ts") >= lit(tsAt(3600L * 1000000L)))
      .select("conv_id", "turn_idx", "ts")
    val on = connRead().orderBy("turn_idx", "ts").collect().toSeq
    spark.conf.set("spark.sql.graft.parquetFilterPushdown", "false")
    val off = try connRead().orderBy("turn_idx", "ts").collect().toSeq
      finally spark.conf.unset("spark.sql.graft.parquetFilterPushdown")
    val native = table.read(spark)
      .filter(col("conv_id") === "conv3" &&
        col("ts") >= lit(tsAt(3600L * 1000000L)))
      .select("conv_id", "turn_idx", "ts")
      .orderBy("turn_idx", "ts").collect().toSeq
    assert(on === off)
    assert(on === native)
    assert(on.nonEmpty, "fixture must actually select rows")
  }

  test("pushed-filter report includes parquet-only filters; translation rules") {
    val table = buildTable()
    // role-free schema here: turn_idx is parquet-translatable but NOT
    // manifest-prunable, so it must still show in pushedFilters
    val df = spark.read.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load().filter(col("turn_idx") > 2)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val pushedStr = scans.head.scan.description()
    // the scan exists and the query is correct under the residual filter
    assert(df.count() === 3L * 8L * 2L, pushedStr)

    val s = new StructType()
      .add("conv_id", StringType).add("turn_idx", IntegerType)
      .add("ts", TimestampType).add("note", StringType)
    import org.apache.spark.sql.sources._
    // In: all-or-nothing (a null member would break the or-chain)
    assert(ParquetPushdown.build(
      Seq(In("conv_id", Array[Any]("a", null))), s).isEmpty)
    assert(ParquetPushdown.build(
      Seq(In("conv_id", Array[Any]("a", "b"))), s).isDefined)
    // Or translates only when both branches do
    assert(ParquetPushdown.build(
      Seq(Or(EqualTo("conv_id", "a"), StringContains("note", "x"))), s).isEmpty)
    assert(ParquetPushdown.build(
      Seq(Or(EqualTo("conv_id", "a"), GreaterThan("turn_idx", 3))), s).isDefined)
    // And keeps the translatable half
    assert(ParquetPushdown.build(
      Seq(And(EqualTo("conv_id", "a"), StringContains("note", "x"))), s).isDefined)
    // unknown column / null literal -> residual only
    assert(ParquetPushdown.build(Seq(EqualTo("ghost", "a")), s).isEmpty)
    assert(ParquetPushdown.build(Seq(EqualTo("conv_id", null)), s).isEmpty)
  }

  test("oversized IN degrades to a [min,max] range, never a deep or-chain") {
    val s = new StructType()
      .add("conv_id", StringType).add("turn_idx", IntegerType)
    import org.apache.spark.sql.sources._
    val many: Array[Any] =
      (0 until ParquetPushdown.InChainThreshold * 8)
        .map(i => f"conv$i%05d": Any).toArray
    // a 512-value runtime-join IN-list: one gteq/lteq pair, zero Or nodes
    // (per-Or recursion in parquet's visitors makes deep chains a
    // StackOverflow risk at DPP scale)
    val big = ParquetPushdown.build(Seq(In("conv_id", many)), s)
    assert(big.isDefined)
    val repr = big.get.toString
    assert(repr.contains("gteq") && repr.contains("lteq") &&
      !repr.contains("or("), repr)
    assert(repr.contains("conv00000") &&
      repr.contains(f"conv${many.length - 1}%05d"), repr)
    // at or below the threshold the exact or-chain survives
    val small = ParquetPushdown.build(Seq(In("conv_id",
      Array[Any]("a", "b", "c"))), s).get.toString
    assert(small.contains("or("), small)
    // numeric range; a null member still kills the whole predicate
    val ints: Array[Any] =
      (0 until 300).map(i => Int.box(i): Any).toArray
    val ip = ParquetPushdown.build(Seq(In("turn_idx", ints)), s)
    assert(ip.isDefined && !ip.get.toString.contains("or("), ip)
    assert(ParquetPushdown.build(
      Seq(In("conv_id", many :+ (null: Any))), s).isEmpty)
  }

  test("streamed read with a pushed filter stays exact") {
    import org.apache.spark.sql.streaming.Trigger
    val table = buildTable()
    val q = spark.readStream.format("graft.sources.IcebergLiteSource")
      .option("path", table.root).load()
      .filter(col("conv_id") === "conv5")
      .groupBy(col("conv_id")).agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("pqpush_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("pqpush_stream").collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 3L * 5L)
  }
}
