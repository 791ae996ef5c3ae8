package graft.table

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-file conv_id bounds in the manifest (footer column-chunk stats,
  * recorded at commit for free): a point lookup prunes INSIDE the bucket —
  * epochs whose conv population excludes the literal are never opened.
  * The layout where this pays: conv ids correlated with arrival time
  * (every production id scheme), where a lookup of a recent conv skips
  * all old epochs' bucket files at the MANIFEST level, before even the
  * parquet row-group filter sees them. */
class ConvBoundsSpec extends SparkSpec {

  private val baseMicros = 1767225600L * 1000000L

  private def tsAt(deltaMicros: Long): java.sql.Timestamp =
    new java.sql.Timestamp((baseMicros + deltaMicros) / 1000L)

  /** 3 epochs with DISJOINT conv populations (time-correlated ids):
    * epoch e holds conv{e}0..conv{e}7. */
  private def buildTable(): IcebergLite = {
    import spark.implicits._
    val root = tmpDir("conv-bounds")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 4)
    (0L until 3L).foreach { ep =>
      val rows = for (c <- 0 until 8; i <- 0 until 5) yield
        (s"conv$ep$c", i, tsAt(ep * 3600L * 1000000L + c * 60L * 1000000L + i))
      assert(table.commitEpoch(rows.toDF("conv_id", "turn_idx", "ts"), "w", ep, 4))
    }
    table
  }

  test("an all-null conv_id row group AFTER a value group neither NPEs " +
      "the commit nor drops the file's bounds") {
    import spark.implicits._
    val root = tmpDir("conv-bounds-nulls")
    val table = new IcebergLite(root)
    table.create("conv_id string, turn_idx int, ts timestamp", 1)
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    // tiny block size -> many row groups; values first, nulls last
    // (arranged=true bypasses the engine's nulls-first sort, which is the
    // only ordering that reaches the null-min/max stats path)
    hc.setInt("parquet.block.size", 1024)
    try {
      val rows = (0 until 300).map(i => (f"conv$i%03d", i, tsAt(i))) ++
        (0 until 300).map(i => (null: String, 1000 + i, tsAt(i)))
      val df = rows.toDF("conv_id", "turn_idx", "ts").coalesce(1)
      assert(table.commitEpoch(df, "w", 0L, 1, arranged = true))
    } finally {
      oldBlock.fold(hc.unset("parquet.block.size"))(
        v => hc.set("parquet.block.size", v))
    }
    assert(table.read(spark).count() === 600L)
    // bounds come from the non-null groups; NULL conv_id matches no
    // equality/range/IN predicate, so they stay a valid necessary condition
    val f = table.effectiveFiles.head
    assert(f.convIdMin === Some("conv000"), f)
    assert(f.convIdMax === Some("conv299"), f)
  }

  test("bounds recorded at commit; point lookup prunes to ONE file") {
    val table = buildTable()
    val files = table.effectiveFiles
    assert(files.nonEmpty)
    assert(files.forall(f => f.convIdMin.isDefined && f.convIdMax.isDefined))
    assert(files.forall(f => f.convIdMin.get <= f.convIdMax.get))
    // bucket routing alone keeps one file per epoch (3); bounds pruning
    // drops the epochs that cannot contain the conv
    val sets = table.effectiveFileSets
    val pruned = IcebergLite.pruneFileSets(sets, None, None, Some("conv20"))
    assert(pruned.length === 1, s"expected 1 file, got ${pruned.map(_.path)}")
    val bucketOnly = sets.flatMap { fs =>
      val b = IcebergLite.bucketOf("conv20", fs.numBuckets)
      fs.files.filter(_.partitionId == b)
    }
    assert(bucketOnly.length === 3, "one bucket file per epoch pre-bounds")
    // and the lookup is still exact
    val got = table.read(spark).filter(col("conv_id") === "conv20").count()
    assert(got === 5L)
  }

  test("a conv in no epoch's range prunes to ZERO files") {
    val table = buildTable()
    // lexicographically beyond every recorded range
    val pruned = IcebergLite.pruneFileSets(
      table.effectiveFileSets, None, None, Some("conv99"))
    assert(pruned.isEmpty)
    assert(table.read(spark).filter(col("conv_id") === "conv99").count() === 0L)
  }

  test("absent bounds (pre-round-5 manifests) admit everything") {
    val fs = FileSet(4, Seq(
      DataFileMeta("data/a.parquet", 1, 10L, 0L, 1L),
      DataFileMeta("data/b.parquet", 1, 10L, 0L, 1L, Some("x"), Some("y"))))
    // "conv" routes to whatever bucket — force the bucket check aside by
    // using numBuckets = -1 (unknown layout): bounds still apply
    val unk = FileSet(-1, fs.files)
    val pruned = IcebergLite.pruneFileSets(Seq(unk), None, None, Some("conv"))
    // a.parquet has no bounds -> kept; b.parquet's [x, y] excludes "conv"
    assert(pruned.map(_.path) === Seq("data/a.parquet"))
  }

  test("compaction rewrites carry recomputed bounds; lookup stays pruned") {
    val table = buildTable()
    table.compact(spark, numBuckets = 4, full = true)
    val files = table.effectiveFiles
    assert(files.forall(f => f.convIdMin.isDefined && f.convIdMax.isDefined))
    val pruned = IcebergLite.pruneFileSets(
      table.effectiveFileSets, None, None, Some("conv20"))
    // full re-cluster: one file per bucket, each spanning all epochs'
    // convs of that bucket -> exactly the one routed file survives
    assert(pruned.length === 1)
    assert(table.read(spark).filter(col("conv_id") === "conv20").count() === 5L)
  }

  test("DELETE rewrite recomputes bounds for the surviving rows") {
    val table = buildTable()
    // purge the upper half of epoch 2's convs in one bucket's file; the
    // rewritten file's bounds must shrink to the survivors
    table.deleteWhere(spark, col("conv_id") === "conv20", "conv_id = 'conv20'")
    val pruned = IcebergLite.pruneFileSets(
      table.effectiveFileSets, None, None, Some("conv20"))
    // the rewritten file no longer contains conv20; whether bounds exclude
    // it depends on its bucket-mates, but correctness never does:
    assert(table.read(spark).filter(col("conv_id") === "conv20").count() === 0L)
    assert(pruned.forall(f => f.convIdMin.isDefined))
  }
}
