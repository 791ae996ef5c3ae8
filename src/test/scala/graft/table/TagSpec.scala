package graft.table

import java.sql.Timestamp

import graft.SparkSpec
import graft.catalog.GraftCatalog

/** Named tags: `VERSION AS OF '<name>'` resolution and the retention pin —
  * gc/expiry must keep every epoch at or below the newest tag replayable
  * until the tag is dropped. */
class TagSpec extends SparkSpec {

  private val base = 1767225600L

  private def buildTable(epochs: Int = 3): (String, IcebergLite) = {
    import spark.implicits._
    val root = tmpDir("tag-table")
    val t = new IcebergLite(root)
    t.create("conv_id string, turn_idx int, text string, ts timestamp", 2)
    (0 until epochs).foreach { ep =>
      val rows = (0 until 6).map(i =>
        (s"conv$i", ep * 10 + i, s"text $ep/$i",
          new Timestamp((base + ep * 3600 + i) * 1000L)))
      assert(t.commitEpoch(
        rows.toDF("conv_id", "turn_idx", "text", "ts"), "w", ep.toLong, 2))
    }
    (root, t)
  }

  test("tag contract: committed epochs only, idempotent re-tag, loud " +
      "retarget, name rules, drop") {
    val (_, t) = buildTable()
    t.tag("v1", 1L)
    assert(t.tags === Map("v1" -> 1L))
    t.tag("v1", 1L) // idempotent
    val e1 = intercept[IllegalStateException] { t.tag("v1", 2L) }
    assert(e1.getMessage.contains("drop it first"))
    val e2 = intercept[IllegalArgumentException] { t.tag("nope", 42L) }
    assert(e2.getMessage.contains("not a committed snapshot"))
    // a tag that could shadow an epoch id is rejected
    val e3 = intercept[IllegalArgumentException] { t.tag("7", 1L) }
    assert(e3.getMessage.contains("invalid tag name"))
    t.dropTag("v1")
    assert(t.tags.isEmpty)
    val e4 = intercept[IllegalArgumentException] { t.dropTag("v1") }
    assert(e4.getMessage.contains("no tag"))
  }

  test("VERSION AS OF '<tag>' resolves through the catalog; unknown tags " +
      "fail loudly listing the known ones") {
    import org.apache.spark.sql.functions._
    val warehouse = tmpDir("tag-warehouse")
    spark.conf.set("spark.sql.catalog.gtag", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtag.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtag.db")
    spark.sql(
      """CREATE TABLE gtag.db.t (conv_id STRING, turn_idx INT, text STRING,
        |  ts TIMESTAMP) TBLPROPERTIES ('buckets'='2')""".stripMargin)
    import spark.implicits._
    (0 until 2).foreach { ep =>
      (0 until 4).map(i => (s"c$i", ep * 10 + i, s"t$ep/$i",
        new Timestamp((base + i) * 1000L)))
        .toDF("conv_id", "turn_idx", "text", "ts")
        .writeTo("gtag.db.t").option("epoch", ep.toString).append()
    }
    spark.sql("CALL gtag.system.tag('db.t', 'baseline', 0)")
    val tagged = spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 'baseline'")
    val pinned = spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 0")
    assert(tagged.count() === 4L)
    assert(tagged.select("conv_id", "turn_idx").collect().toSet ===
      pinned.select("conv_id", "turn_idx").collect().toSet)
    val listed = spark.sql("CALL gtag.system.tags('db.t')").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(listed === Set(("baseline", 0L)))
    // tags and the CDC anchor surface through SHOW TBLPROPERTIES
    val props = spark.sql("SHOW TBLPROPERTIES gtag.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("tags").contains("baseline=0"))
    assert(props.contains("current_gen"))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gtag.db.t VERSION AS OF 'ghost'").collect()
    }
    assert(e.getMessage.contains("not an epoch id and not a tag"))
    spark.sql("CALL gtag.system.drop_tag('db.t', 'baseline')")
    assert(spark.sql("CALL gtag.system.tags('db.t')").collect().isEmpty)
  }

  test("tags pin history through gc and metadata expiry; dropping the tag " +
      "releases the pin") {
    val (root, t) = buildTable(epochs = 4)
    t.tag("keep", 1L)
    t.compact(spark, 2)
    // gc would normally reclaim every compaction-replaced epoch's files;
    // the tag pins epochs <= 1
    val reclaimed = t.gc()
    assert(reclaimed.nonEmpty) // epochs 2..3 were reclaimable
    val asOf1 = t.readAsOf(spark, 1L)
    assert(asOf1.count() === 12L) // epochs 0..1 fully readable
    // expiry keeps the pinned manifests even far outside the retain window
    t.expireMetadata(retainLast = 1)
    assert(t.snapshots.map(_.epochId).toSet.intersect(Set(0L, 1L)) ===
      Set(0L, 1L))
    // release the pin: the next gc + expiry settle the history
    t.dropTag("keep")
    assert(t.gc().nonEmpty)
    t.expireMetadata(retainLast = 1)
    val e = intercept[Exception] { t.readAsOf(spark, 1L).count() }
    assert(e.getMessage.contains("not reproducible") ||
      e.getMessage.contains("not a committed snapshot"))
  }
}
