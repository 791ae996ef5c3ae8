package graft.bench

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for declared queries to files — the
  * before/after plan evidence for optimization rounds (committed under
  * `plans/r<NN>/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.bench.PlanDump <outDir> <tag> [query ...]
  * (no query names = all declared queries). Env: SPARK_GRAFT_SF_DIR
  * (default /root/testdata/sf0.001 — plan SHAPE is sf-independent, and the
  * gate bodies run their DDL/DML while building the DataFrame, so the
  * smallest sf keeps the dump fast), SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(sys.error(
      "usage: PlanDump <outDir> <tag> [query ...]"))
    val tag = args.lift(1).getOrElse("now")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"plandump:$name")
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // scalastyle:off println
      println(s"dumped $name")
      // scalastyle:on println
    }
    spark.stop()
  }
}
