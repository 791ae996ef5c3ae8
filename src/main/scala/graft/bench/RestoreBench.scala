package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.IcebergLite

/** Measures the scale shape of [[graft.table.IcebergLite.restore]]: wall
  * time must grow with the CHURN being undone (the files the forward diff
  * actually scans + the CDC rows it records) and must NOT grow with the
  * size of the untouched corpus — the property that makes "roll back
  * yesterday's bad correction job" on a 10^12-turn table a bounded
  * operation. The manifest-level path diff is O(total files) driver-side,
  * but that is metadata already in memory; no untouched data file is ever
  * opened.
  *
  * Two sweeps over synthetic bucketed tables (deterministic content):
  *  - churn sweep: fixed corpus, a DELETE touching k ∈ {1, 4, 16}
  *    distinct buckets is restored — the diff scans k×epochs original +
  *    k×epochs survivor files and records the purged rows as inserts;
  *  - corpus sweep: fixed 1-bucket churn, corpus scaled ×4 by EXTRA
  *    epochs that exclude the touched bucket — the churned file set is
  *    byte-identical across points, so flat wall time is a true
  *    measurement of untouched-corpus independence.
  *
  * Prints one JSON line. Each point is BEST-OF-3: restore is invertible,
  * so the bench bounces between the mutated and restored states — every
  * forward restore undoes byte-identical churn (the survivor/original
  * files swap roles by path), making repetition exact; min converges from
  * below under this box's one-sided CPU-steal noise (BENCH.md). */
object RestoreBench {
  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Best-of-3 forward restores to `at`, bouncing back to the mutated
    * state between reps so every forward undoes identical churn. */
  private def bestRestore(spark: SparkSession, t: IcebergLite,
                          at: graft.table.TableVersion): Double = {
    val vMut = t.currentVersion
    (0 until 3).map { i =>
      val s = timeS { require(t.restore(spark, at).gen > 0L) }
      if (i < 2) require(t.restore(spark, vMut).gen > 0L)
      s
    }.min
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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
      t.create(
        "conv_id string, turn_idx int, role string, text string, ts timestamp",
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

    // untimed warm-up (JIT, codegen, parquet writer init)
    locally {
      val root = "/tmp/graft-rstbench-warm"
      deleteTree(root)
      val t = build(root, 64, 8, 1)
      val at = t.currentVersion
      t.deleteWhere(spark, col("conv_id") === convsFor(1, 64).head, "warm")
      t.restore(spark, at)
    }

    val churn = Seq(1, 4, 16).map { k =>
      val root = s"/tmp/graft-rstbench-k$k"
      deleteTree(root)
      val t = build(root, convs, turns, epochs)
      val at = t.currentVersion
      val targets = convsFor(k, convs)
      t.deleteWhere(spark, col("conv_id").isin(targets: _*),
        s"bench purge k=$k",
        graft.sources.PrunePredicate.from(Seq(
          org.apache.spark.sql.sources.In("conv_id", targets.toArray[Any]))).prune)
      val sec = bestRestore(spark, t, at)
      val st = t.deletes.maxBy(_.gen)
      (k, st.removes.size + st.fileSets.map(_.files.size).sum,
        st.changeFiles.map(_.map(_.rowCount).sum).getOrElse(0L), sec)
    }

    // corpus sweep: the extra epochs exclude the touched bucket, so the
    // churned file set is identical while the corpus grows 4x
    val target = convsFor(1, convs).head
    val targetBucket = IcebergLite.bucketOf(target, buckets)
    val corpus = Seq(1, 4).map { mult =>
      val root = s"/tmp/graft-rstbench-c$mult"
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
      val at = t.currentVersion
      t.deleteWhere(spark, col("conv_id") === target, s"bench purge x$mult",
        graft.sources.PrunePredicate.from(Seq(
          org.apache.spark.sql.sources.In("conv_id", Array[Any](target)))).prune)
      val rows = t.effectiveFiles.map(_.rowCount).sum
      val sec = bestRestore(spark, t, at)
      val st = t.deletes.maxBy(_.gen)
      (mult, rows, st.changeFiles.map(_.map(_.rowCount).sum).getOrElse(0L), sec)
    }

    val churnJson = churn.map { case (k, files, rows, s) =>
      s"""{"touchedBuckets":$k,"churnFiles":$files,"changeRows":$rows,""" +
        f""""restoreSec":$s%.3f}"""
    }.mkString("[", ",", "]")
    val corpusJson = corpus.map { case (mult, rows, cr, s) =>
      s"""{"corpusMult":$mult,"rows":$rows,"changeRows":$cr,""" +
        f""""restoreSec":$s%.3f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"restore_scaling","buckets":$buckets,""" +
      s""""rowsBase":${convs * turns * epochs},"churnSweep":$churnJson,""" +
      s""""corpusSweep":$corpusJson}""")
    spark.stop()
  }
}
