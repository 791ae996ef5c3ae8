package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{IcebergLite, MergeUpdateCols}

/** Measures the scale shape of the row-level mutation family
  * (UPDATE / DELETE / MERGE): wall time must grow with the number of
  * TOUCHED buckets (the manifest-pruned candidate set), and must NOT grow
  * with the size of the untouched corpus — the property that makes a
  * conv-scoped correction on a 10^12-turn table a bounded operation
  * instead of a table rewrite.
  *
  * Two sweeps over synthetic bucketed tables (deterministic content):
  *  - touched-bucket sweep: fixed corpus, k ∈ {1, 4, 16} target
  *    conversations in k distinct buckets — updateWhere with the same
  *    conv_id IN pruning the SQL path derives, and merge with a k-bucket
  *    feed;
  *  - corpus sweep: fixed k = 1 touch, corpus scaled ×4 by EXTRA epochs
  *    that exclude the touched bucket — the candidate set (count and
  *    file sizes) is byte-identical across points, so flat wall time is
  *    a true measurement of untouched-corpus independence.
  *
  * Prints one JSON line. Timings are single-shot per point (these are
  * multi-second mutation jobs, not micro-benchmarks; the shape, not the
  * third digit, is the claim). */
object MutationBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val buckets = 32
    val base = 1767225600L * 1000000L

    def deleteTree(root: String): Unit = {
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(q => java.nio.file.Files.deleteIfExists(q))
        finally s.close()
      }
    }

    def build(root: String, convs: Int, turns: Int, epochs: Int): IcebergLite = {
      val t = new IcebergLite(root)
      t.create("conv_id string, turn_idx int, role string, text string, ts timestamp",
        buckets)
      (0L until epochs.toLong).foreach { ep =>
        val df = spark.range(convs.toLong * turns)
          .select(
            format_string("conv%06d", (col("id") / turns).cast("long")).as("conv_id"),
            (col("id") % turns + lit(ep * turns)).cast("int").as("turn_idx"),
            when(col("id") % 3 === 0, "user").otherwise("assistant").as("role"),
            concat(lit("turn text payload "), col("id")).as("text"),
            timestamp_micros(lit(base) + col("id") * 1000L +
              lit(ep * 3600L * 1000000L)).as("ts"))
        require(t.commitEpoch(df, "bench", ep, buckets))
      }
      t
    }

    // one conv per target bucket: scan conv ids until k distinct buckets hit
    def convsFor(k: Int, convs: Int): Seq[String] = {
      val picked = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      var c = 0
      while (picked.size < k && c < convs) {
        val id = f"conv$c%06d"
        val b = IcebergLite.bucketOf(id, buckets)
        if (!picked.contains(b)) picked(b) = id
        c += 1
      }
      picked.values.toSeq
    }

    val convs = 2048; val turns = 64; val epochs = 4 // 512k rows / table

    // untimed warm-up: JIT + codegen + parquet-writer init otherwise land
    // on the first timed point
    locally {
      val root = "/tmp/graft-mutbench-warm"
      deleteTree(root)
      val t = build(root, 64, 8, 1)
      val targets = convsFor(1, 64)
      t.updateWhere(spark, col("conv_id").isin(targets: _*),
        Seq("role" -> lit("w")), "warmup")
      t.merge(spark,
        Seq(("convX", 0, "r", "t", new java.sql.Timestamp(base / 1000L)))
          .toDF("conv_id", "turn_idx", "role", "text", "ts"),
        "warmup", Some(MergeUpdateCols(Seq("role"))), insertNotMatched = true)
    }

    val sweep = Seq(1, 4, 16).map { k =>
      val root = s"/tmp/graft-mutbench-k$k"
      deleteTree(root)
      val t = build(root, convs, turns, epochs)
      val targets = convsFor(k, convs)
      val inCol = col("conv_id").isin(targets: _*)
      val prune = graft.sources.PrunePredicate.from(Seq(
        org.apache.spark.sql.sources.In("conv_id", targets.toArray[Any])))
      val updS = timeS {
        t.updateWhere(spark, inCol && col("turn_idx") === 0,
          Seq("role" -> lit("bench")), s"bench k=$k", prune.prune)
      }
      val feed = targets.zipWithIndex.map { case (cid, i) =>
        (cid, -1 - i, "merged", "merged text", new java.sql.Timestamp(base / 1000L))
      }.toDF("conv_id", "turn_idx", "role", "text", "ts")
      val mrgS = timeS {
        t.merge(spark, feed, s"bench-merge-$k",
          Some(MergeUpdateCols(Seq("role"))), insertNotMatched = true)
      }
      val candidateFiles = k * epochs
      (k, candidateFiles, updS, mrgS)
    }

    // corpus sweep: fixed 1-bucket touch, UNTOUCHED corpus scaled — the
    // extra epochs exclude the touched bucket entirely, so candidate
    // files stay IDENTICAL (same count, same sizes) while the corpus
    // grows; any wall-time growth here would mean untouched data leaks
    // into the mutation's cost
    val target = convsFor(1, convs).head
    val targetBucket = IcebergLite.bucketOf(target, buckets)
    val corpus = Seq(1, 4).map { mult =>
      val root = s"/tmp/graft-mutbench-c$mult"
      deleteTree(root)
      val t = build(root, convs, turns, epochs)
      (epochs.toLong until (epochs.toLong * mult)).foreach { ep =>
        val df = spark.range(convs.toLong * turns)
          .select(
            format_string("conv%06d", (col("id") / turns).cast("long")).as("conv_id"),
            (col("id") % turns + lit(ep * turns)).cast("int").as("turn_idx"),
            lit("assistant").as("role"),
            concat(lit("turn text payload "), col("id")).as("text"),
            timestamp_micros(lit(base) + col("id") * 1000L +
              lit(ep * 3600L * 1000000L)).as("ts"))
          .filter(pmod(hash(col("conv_id")), lit(buckets)) =!= targetBucket)
        require(t.commitEpoch(df, "bench", ep, buckets))
      }
      val rows = t.effectiveFiles.map(_.rowCount).sum
      val prune = graft.sources.PrunePredicate.from(Seq(
        org.apache.spark.sql.sources.In("conv_id", Array[Any](target))))
      val updS = timeS {
        t.updateWhere(spark, col("conv_id") === target &&
          col("turn_idx") === 0,
          Seq("role" -> lit("bench")), s"bench x$mult", prune.prune)
      }
      (mult, rows, updS)
    }

    val sweepJson = sweep.map { case (k, files, u, m) =>
      s"""{"touchedBuckets":$k,"candidateFiles":$files,""" +
        f""""updateSec":$u%.3f,"mergeSec":$m%.3f}"""
    }.mkString("[", ",", "]")
    val corpusJson = corpus.map { case (mult, rows, u) =>
      s"""{"corpusMult":$mult,"rows":$rows,"updateSec":${f"$u%.3f"}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"mutation_scaling","buckets":$buckets,""" +
      s""""rowsBase":${convs * turns * epochs},"touchedSweep":$sweepJson,""" +
      s""""corpusSweep":$corpusJson}""")
    spark.stop()
  }
}
