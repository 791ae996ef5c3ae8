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
