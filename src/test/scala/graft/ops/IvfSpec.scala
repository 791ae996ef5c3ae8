package graft.ops

import graft.SparkSpec
import graft.gen.EmbGen

/** IVF approximate top-k: high-similarity recall (the planted near-dups an
  * IVF index exists to find), score consistency with the exact path,
  * determinism of the integer-space k-means, and the probe contract. */
class IvfSpec extends SparkSpec {

  private lazy val embs = {
    val df = EmbGen.dataset(spark, 2000).cache()
    df.count()
    df
  }

  test("planted cos≈0.995 neighbors are recalled at rank 1") {
    val ivf = Similarity.ivfTopK(embs, "vec_id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // among query ids 0..9 the planted near-dup pair is (0, 3); both
    // directions must surface the partner first — the high-similarity
    // regime is exactly what an IVF probe of the own cluster guarantees
    assert(ivf.contains((0L, 3L, 1L)), "query 0 must rank its near-dup 3 first")
    assert(ivf.contains((3L, 0L, 1L)), "query 3 must rank its near-dup 0 first")
  }

  test("IVF results are a subset of exact scoring with identical dots") {
    val exact = Similarity.annTopK(embs, "vec_id", "vec", nQueries = 10, k = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ivf = Similarity.ivfTopK(embs, "vec_id", "vec").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key), s"$key not in exact scoring")
      assert(exact(key) === r.getLong(2), s"dot mismatch for $key")
    }
    // every query returns exactly k rows (probed lists hold >> k vectors)
    val perQ = ivf.groupBy(_.getLong(0)).view.mapValues(_.length)
    perQ.foreach { case (q, n) => assert(n === 10, s"query $q returned $n") }
  }

  test("integer-space k-means is deterministic across runs and partitionings") {
    val c1 = Similarity.ivfTrain(embs, "vec_id", "vec", nlist = 16)
    val c2 = Similarity.ivfTrain(embs.repartition(7), "vec_id", "vec", nlist = 16)
    assert(c1.length === 16)
    c1.zip(c2).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("persisted index: ivfTopKIndexed == ivfTopK on the same centroids; " +
    "the probed scan is partition-pruned") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("ivf-index")
    val cents = Similarity.ivfBuildIndex(embs, "vec_id", "vec", dir, nlist = 16)
    // sidecar round-trip
    Similarity.ivfCentroids(dir).zip(cents)
      .foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // identical output to the non-persisted path on the same centroids
    val indexed = Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = Similarity.ivfTopK(embs, "vec_id", "vec",
        nlist = 16, nprobe = 8, centroidsIn = cents)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(indexed === direct)
    assert(indexed.nonEmpty)
    // the list filter is a partition-column predicate: the scan PLANS only
    // the probed lists' partitions (query cost independent of the rest of
    // the corpus)
    val pruned = spark.read.parquet(Similarity.ivfDataDir(dir))
      .filter(col("list").isin(0, 1))
    val scanParts = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.head
    assert(scanParts === 2, s"expected 2 partition dirs scanned, got $scanParts")
  }

  test("index lifecycle: epoch-keyed versions, loud staleness, idempotent " +
    "rebuild, version GC") {
    import graft.table.IcebergLite
    val srcRoot = tmpDir("ivf-src")
    val dir = tmpDir("ivf-lifecycle")
    val src = new IcebergLite(srcRoot)
    src.create("vec_id bigint, vec array<double>", 2)
    src.commitEpoch(embs.select("vec_id", "vec"), "emb-load", 0L, 2)

    Similarity.ivfBuildIndex(embs, "vec_id", "vec", dir, nlist = 16,
      sourceRoot = srcRoot)
    assert(Similarity.ivfDataDir(dir).contains("v000000000000"))
    assert(Similarity.ivfTopKIndexed(spark, dir, nprobe = 8).count() > 0L)

    // rebuild at the SAME source epoch: idempotent no-op (same version dir)
    Similarity.ivfBuildIndex(embs, "vec_id", "vec", dir, nlist = 16,
      sourceRoot = srcRoot)
    assert(Similarity.ivfDataDir(dir).contains("v000000000000"))

    // a newer source epoch makes the index stale: loud failure, opt-in read
    src.commitEpoch(embs.select("vec_id", "vec"), "emb-load", 1L, 2)
    val e = intercept[IllegalStateException] {
      Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
    }
    assert(e.getMessage.contains("epoch 0") &&
      e.getMessage.contains("ivfRefreshIndex"), e.getMessage)
    assert(Similarity.ivfTopKIndexed(spark, dir, nprobe = 8,
      allowStale = true).count() > 0L)

    // rebuild against the new epoch: fresh version serves, old one expirable
    Similarity.ivfBuildIndex(embs, "vec_id", "vec", dir, nlist = 16,
      sourceRoot = srcRoot)
    assert(Similarity.ivfDataDir(dir).contains("v000000000001"))
    assert(Similarity.ivfTopKIndexed(spark, dir, nprobe = 8).count() > 0L)
    assert(Similarity.ivfExpireVersions(dir) === Seq("v000000000000"))
    assert(Similarity.ivfTopKIndexed(spark, dir, nprobe = 8).count() > 0L)
  }

  test("incremental refresh: CDC-driven, only churned lists rewritten " +
    "(untouched lists hard-linked), output == full recompute, freshness " +
    "gate satisfied; mutations alone stale the index") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.functions.col
    import graft.table.IcebergLite
    val srcRoot = tmpDir("ivf-refresh-src")
    val dir = tmpDir("ivf-refresh-idx")
    val src = new IcebergLite(srcRoot)
    src.create("vec_id bigint, vec array<float>", 2)
    src.commitEpoch(embs, "emb", 0L, 2)

    val cents = Similarity.ivfBuildIndex(
      src.read(spark).select("vec_id", "vec"), "vec_id", "vec", dir,
      nlist = 16, sourceRoot = srcRoot)
    val v0Data = Similarity.ivfDataDir(dir)

    // NARROW churn — the shape a refresh exists for: an appended epoch of
    // 3 vectors AND a 3-row delete (gen bump, no epoch). Six random
    // vectors touch at most 6 of the 16 lists; the rest must be linked.
    val appended = embs.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 10000)
    src.commitEpoch(appended, "emb", 1L, 2)
    src.deleteWhere(spark,
      col("vec_id") >= 100 && col("vec_id") < 103, "drop a vec range")

    // mutations stale the index even though epochs alone would too here;
    // the message cites the full state
    val e = intercept[IllegalStateException] {
      Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
    }
    assert(e.getMessage.contains("ivfRefreshIndex"), e.getMessage)

    assert(Similarity.ivfRefreshIndex(spark, dir))
    val v1Data = Similarity.ivfDataDir(dir)
    assert(v1Data.contains("-g"), s"refreshed version must carry the gen: $v1Data")

    // freshness gate passes now, and the result equals a full recompute
    // over the live corpus with the SAME centroids
    val refreshed = Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val live = embs.filter(!(col("vec_id") >= 100 && col("vec_id") < 103))
      .unionAll(embs.filter(col("vec_id") < 3)
        .withColumn("vec_id", col("vec_id") + 10000))
    val direct = Similarity.ivfTopK(live, "vec_id", "vec",
        nlist = 16, nprobe = 8, centroidsIn = cents)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(refreshed === direct)
    assert(refreshed.nonEmpty)

    // untouched list partitions were hard-linked, not rewritten: at least
    // one list directory carries a file that IS the old version's file
    val linked = Files.list(Paths.get(v1Data)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("list="))
      .exists { d =>
        Files.list(d).iterator().asScala.exists { f =>
          val old = Paths.get(v0Data, d.getFileName.toString,
            f.getFileName.toString)
          Files.exists(old) && Files.isSameFile(old, f)
        }
      }
    assert(linked, "expected at least one hard-linked untouched list partition")

    // a second refresh with no new state is a no-op
    assert(!Similarity.ivfRefreshIndex(spark, dir))
  }

  test("refresh across a RESTORE of the source: the rollback is just " +
    "churn — the refreshed index equals a full recompute over the " +
    "restored corpus") {
    import org.apache.spark.sql.functions.col
    import graft.table.IcebergLite
    val srcRoot = tmpDir("ivf-rst-src")
    val dir = tmpDir("ivf-rst-idx")
    val src = new IcebergLite(srcRoot)
    src.create("vec_id bigint, vec array<float>", 2)
    src.commitEpoch(embs.select("vec_id", "vec"), "emb", 0L, 2)
    val at = src.currentVersion
    src.deleteWhere(spark,
      col("vec_id") >= 100 && col("vec_id") < 110, "drop a vec range")
    val cents = Similarity.ivfBuildIndex(
      src.read(spark).select("vec_id", "vec"), "vec_id", "vec", dir,
      nlist = 16, sourceRoot = srcRoot)

    // roll the source back: the dropped vectors return as CDC churn
    // (vec_id tables have no (conv_id, turn_idx) key, so the restore
    // records multiset insert/delete rows — exactly what refresh consumes)
    assert(src.restore(spark, at).gen === 2L)
    val e = intercept[IllegalStateException] {
      Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
    }
    assert(e.getMessage.contains("ivfRefreshIndex"), e.getMessage)

    assert(Similarity.ivfRefreshIndex(spark, dir))
    val refreshed = Similarity.ivfTopKIndexed(spark, dir, nprobe = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = Similarity.ivfTopK(embs, "vec_id", "vec",
        nlist = 16, nprobe = 8, centroidsIn = cents)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(refreshed === direct)
    assert(refreshed.nonEmpty)
    // no new state since: no-op
    assert(!Similarity.ivfRefreshIndex(spark, dir))
  }

  test("recall grows with nprobe and reaches 1.0 at nprobe = nlist") {
    val exact = Similarity.annTopK(embs, "vec_id", "vec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cents = Similarity.ivfTrain(embs, "vec_id", "vec", nlist = 16)
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(embs, "vec_id", "vec", nlist = 16,
          nprobe = nprobe, centroidsIn = cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      exact.intersect(got).size.toDouble / exact.size
    }
    val r2 = recall(2)
    val r8 = recall(8)
    val rAll = recall(16)
    assert(rAll === 1.0, "probing every list must equal the exact result")
    assert(r8 >= r2, s"recall must be monotone in nprobe ($r2 -> $r8)")
    assert(r2 > 0.0)
  }
}
