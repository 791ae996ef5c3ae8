package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sketch.CountMin

/** The CMS SQL aggregate: distributed update/merge parity with a
  * single-node sketch, the byte codec round trip, exactness below the
  * key-tracking cap, the ≥-true-count guarantee past it, hard codegen of
  * the estimate expression, and the SQL surface. */
class CmsExprSpec extends SparkSpec {

  test("byte codec round-trips both tiers") {
    val sk = CountMin.empty(4, 64)
    (0 until 100).foreach(i => sk.add(s"k${i % 10}"))
    assert(CountMin.fromBytes(CountMin.toBytes(sk)) === sk)
    // folded tier (cap exceeded -> cell form)
    val big = CountMin.empty(4, 64)
    (0 until CountMin.MaxTrackedKeys + 10).foreach(i => big.add(s"key-$i"))
    assert(big.keyCounts === null)
    assert(CountMin.fromBytes(CountMin.toBytes(big)) === big)
  }

  test("distributed aggregate == single-node sketch; estimates exact below cap") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val rows = (0 until 5000).map(i => words(i % words.length) * (i % 3 + 1))
    // 32 input partitions force real partial-sketch merges
    val df = spark.sparkContext.parallelize(rows, 32).toDF("w")
    val bytes = df.agg(CmsAggExpr.cmsSketch(col("w")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val dist = CountMin.fromBytes(bytes)
    val local = CountMin.empty(4, 8192)
    rows.foreach(local.add(_))
    assert(dist === local)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong)
    exact.foreach { case (w, n) => assert(dist.estimate(w) === n, w) }
  }

  test("null keys are skipped; empty input yields an empty sketch") {
    import spark.implicits._
    val df = Seq(Option("a"), None, Option("a"), None).toDF("w")
    val sk = CountMin.fromBytes(
      df.agg(CmsAggExpr.cmsSketch(col("w"))).head().getAs[Array[Byte]](0))
    assert(sk.total === 2L)
    assert(sk.estimate("a") === 2L)
    val empty = CountMin.fromBytes(
      df.filter(lit(false)).agg(CmsAggExpr.cmsSketch(col("w")))
        .head().getAs[Array[Byte]](0))
    assert(empty.total === 0L)
  }

  test("past the cap estimates stay >= true counts (no false negatives)") {
    import spark.implicits._
    val n = CountMin.MaxTrackedKeys + 500
    val df = spark.range(0, n.toLong, 1, 8)
      .select(concat(lit("key-"), col("id")).as("w"))
    val sk = CountMin.fromBytes(
      df.agg(CmsAggExpr.cmsSketch(col("w"), width = 1 << 16))
        .head().getAs[Array[Byte]](0))
    assert(sk.keyCounts === null, "cap exceeded -> folded cell form")
    assert(sk.total === n.toLong)
    (0 until 100).foreach(i => assert(sk.estimate(s"key-$i") >= 1L))
  }

  test("cms_est compiles under codegen.fallback=false") {
    import spark.implicits._
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val sk = Seq("x", "x", "y").toDF("w")
        .agg(CmsAggExpr.cmsSketch(col("w")).as("sk"))
      val est = sk.select(CmsAggExpr.cmsEst(col("sk"), lit("x")).as("e"),
          CmsAggExpr.cmsEst(col("sk"), lit("zzz")).as("z"))
        .head()
      assert(est.getLong(0) === 2L)
      assert(est.getLong(1) === 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFallback)
  }

  test("estimateAll matches join semantics: null/missing groups dropped, not failed") {
    import spark.implicits._
    val keys = Seq(
      ("user", "a"), ("tool", "a"), (null: String, "a"), // null group
      ("ghost", "a"),                                    // group with no sketch
      ("user", null: String)                             // null key
    ).toDF("role", "token")
    val sk = Seq(("user", "a"), ("user", "a"), ("tool", "b"))
      .toDF("role", "token")
      .groupBy("role").agg(CmsAggExpr.cmsSketch(col("token")).as("sk"))
    val out = CmsAggExpr.estimateAll(keys, sk, "role", "sk", "token")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // exactly the rows an inner join would keep, with correct estimates
    assert(out === Set(("user", "a", 2L), ("tool", "a", 0L)))
    assert(CmsAggExpr.releaseBroadcasts() >= 1)
  }

  test("estimateAll fails loudly past the group-cardinality guard") {
    import spark.implicits._
    val keys = Seq(("g0", "a")).toDF("g", "token")
    val manyGroups = spark.range(0, 50, 1, 4)
      .select(concat(lit("g"), col("id")).as("g"), lit("a").as("token"))
      .groupBy("g").agg(CmsAggExpr.cmsSketch(col("token")).as("sk"))
    val e = intercept[IllegalArgumentException] {
      CmsAggExpr.estimateAll(keys, manyGroups, "g", "sk", "token", maxGroups = 10)
    }
    assert(e.getMessage.contains("graft_cms_est"), "remediation text present")
    // at or under the guard it runs
    val ok = CmsAggExpr.estimateAll(
      keys, manyGroups, "g", "sk", "token", maxGroups = 50)
    assert(ok.count() === 1L)
    CmsAggExpr.releaseBroadcasts()
  }

  test("SQL surface: graft_cms_sketch / graft_cms_est after registration") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT graft_cms_est(sk, 'a') AS a, graft_cms_est(sk, 'b') AS b FROM (
        |  SELECT graft_cms_sketch(w) AS sk
        |  FROM (VALUES ('a'), ('a'), ('a'), ('b')) AS t(w))""".stripMargin)
      .head()
    assert(out.getLong(0) === 3L)
    assert(out.getLong(1) === 1L)
    // explicit shape arguments
    val shaped = spark.sql(
      """SELECT graft_cms_est(graft_cms_sketch(w, 2, 1024), 'q') AS q
        |FROM (VALUES ('q'), ('q')) AS t(w)""".stripMargin).head()
    assert(shaped.getLong(0) === 2L)
  }
}
