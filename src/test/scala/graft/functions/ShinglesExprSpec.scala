package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Normalize

/** The native shingles expression: parity with the reference Scala
  * function, null/short-input handling, whole-stage codegen participation,
  * and the SQL surface via SparkSessionExtensions. */
class ShinglesExprSpec extends SparkSpec {

  test("expression output == Normalize.shingles(_, k).distinct") {
    import spark.implicits._
    val texts = Seq(
      "the quick pipeline stream data model",
      "a b a b a b a b",
      "one-token",
      "",
      "  spaced   OUT   Tokens  here  ",
      "punct, splits; tokens! 42 ok")
    val df = texts.toDF("text")
      .select(col("text"), ShinglesExpr.shinglesCol(col("text"), 3).as("sh"))
    df.collect().foreach { r =>
      val expected = Normalize.shingles(r.getString(0), 3).distinct
      assert(r.getSeq[String](1) === expected, s"for '${r.getString(0)}'")
    }
  }

  test("null text yields null; non-string input rejected at analysis") {
    import spark.implicits._
    val df = Seq(Option("a b c d"), None).toDF("text")
      .select(ShinglesExpr.shinglesCol(col("text"), 2).as("sh"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq("a b", "b c", "c d"))
    assert(rows(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1, 2).toDF("n").select(ShinglesExpr.shinglesCol(col("n"), 2)).collect()
    }
  }

  test("participates in whole-stage codegen (no ScalaUDF / BatchEval node)") {
    import spark.implicits._
    val df = Seq("x y z w").toDF("text")
      .select(explode(ShinglesExpr.shinglesCol(col("text"), 2)))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    assert(df.collect().length === 3)
  }

  test("generated code actually compiles (codegen.fallback=false)") {
    // Round-2 ADVICE: the emitted call used to target ShinglesExpr.eval,
    // which has no static forwarder (instance Expression.eval shadows it) —
    // Janino failed and Spark *silently* ran interpreted. With fallback
    // disabled a bad static call throws instead of degrading, so this test
    // pins the ShinglesKernel forwarder contract.
    import spark.implicits._
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    val prevWhole = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      val df = Seq("alpha beta gamma delta", "x y z").toDF("text")
        .select(explode(ShinglesExpr.shinglesCol(col("text"), 2)).as("sh"))
      val wscg = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(wscg.nonEmpty, df.queryExecution.executedPlan.toString)
      assert(df.collect().length === 5)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }

  test("SQL surface: graft_shingles(text, k) after registration") {
    GraftFunctions.register(spark)
    val out = spark
      .sql("SELECT graft_shingles('alpha beta gamma delta', 3) AS sh")
      .collect()(0).getSeq[String](0)
    assert(out === Seq("alpha beta gamma", "beta gamma delta"))
    // literal-k contract enforced
    intercept[Exception] {
      spark.sql("SELECT graft_shingles('a b c', length('xx'))").collect()
    }
  }
}
