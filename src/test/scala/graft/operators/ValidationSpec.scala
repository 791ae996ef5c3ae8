package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{Defaults, RedactionParams}
import graft.gen.{GenSpec, TranscriptGen}
import graft.stream.Pipeline
import graft.table.IcebergLite

/** P6 validation + A3 dead-letter rows + R4b shingle detection over the
  * planted W7/W8 generator families. */
class ValidationSpec extends SparkSpec {
  val spec: GenSpec = GenSpec(nConvs = 400)
  lazy val turns = (0L until spec.nConvs.toLong).flatMap(TranscriptGen.turnsFor(_, spec))
  lazy val df = {
    import spark.implicits._
    spark.createDataset(turns).toDF().cache()
  }

  test("generator plants W7 oversize rows; split is exact and exhaustive") {
    val dead = Validation.deadLetter(df)
    val deadN = dead.count()
    assert(deadN > 0, "fixture must contain dead-letter rows")
    assert(Validation.valid(df).count() + deadN === turns.size.toLong)
    assert(dead.filter(col("reason") =!= "text_overflow").count() === 0)
    // row-level predicate mirrors the Column form
    assert(turns.count(!Validation.isValidTurn(_)).toLong === deadN)
  }

  test("null role / null ts / bad role: Column and row forms agree") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val weird = Seq(
      graft.core.Turn("c0", 0, null, "null role text", null, ts),
      graft.core.Turn("c0", 1, "intruder", "bad role text", null, ts),
      graft.core.Turn("c0", 2, "user", "null ts text", null, null),
      graft.core.Turn("c0", 3, "user", "fine", null, ts))
    val wdf = spark.createDataset(weird).toDF()
    val reasons = wdf.select(col("turn_idx"), Validation.invalidReason.as("r"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(reasons(0) === Some("bad_role"), "null role must be quarantined")
    assert(reasons(1) === Some("bad_role"))
    assert(reasons(2) === Some("null_ts"))
    assert(reasons(3) === None)
    weird.foreach { t =>
      assert(Validation.isValidTurn(t) === reasons(t.turn_idx).isEmpty,
        s"row/Column divergence at turn ${t.turn_idx}")
    }
  }

  test("deadLetterTop10 is the stable first-10 by (conv_id, turn_idx)") {
    val top = Validation.deadLetterTop10(df).collect()
    assert(top.length === math.min(10L, Validation.deadLetter(df).count()))
    val keys = top.map(r => (r.getString(0), r.getInt(1)))
    assert(keys.sameElements(keys.sortBy(identity)))
  }

  test("streaming dead-letter quarantine: rows excluded from redaction, " +
    "captured exactly-once in the side table") {
    val sliceDir = tmpDir("vslices")
    graft.gen.StreamFixtures.writeSlices(spark, spec, sliceDir, k = 3)
    val mainRoot = tmpDir("vtable")
    val deadRoot = tmpDir("vdead")
    val q1 = Pipeline.runRedactionToTable(spark, sliceDir, mainRoot,
      tmpDir("vcp1"), numBuckets = 2)
    val q2 = Pipeline.runDeadLetterToTable(spark, sliceDir, deadRoot,
      tmpDir("vcp2"), numBuckets = 2)
    q1.awaitTermination()
    q2.awaitTermination()
    val deadExpected = turns.filterNot(Validation.isValidTurn)
    val deadRows = new IcebergLite(deadRoot).read(spark)
      .select("conv_id", "turn_idx", "reason").collect()
    assert(deadRows.map(r => (r.getString(0), r.getInt(1))).toSet ===
      deadExpected.map(t => (t.conv_id, t.turn_idx)).toSet)
    // quarantined rows are NOT in the redacted table; everything else is
    val mainKeys = new IcebergLite(mainRoot).read(spark)
      .select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val validKeys = turns.filter(Validation.isValidTurn)
      .map(t => (t.conv_id, t.turn_idx)).toSet
    assert(mainKeys === validKeys)
  }

  test("W8 variable-tail watermark: shingle detection catches what " +
    "sentence detection provably misses") {
    val p = RedactionParams()
    val sentences = TranscriptOps.detectRecurring(df, p)
      .filter(col("sentence").contains("verification automatique du registre"))
      .count()
    val shingles = TranscriptOps.detectRecurringShingles(df, p)
      .filter(col("shingle") === "verification automatique du").count()
    assert(shingles > 0L, "shingle-level detector must learn the W8 head")
    // the date varies per turn, so the full sentence only recurs in the
    // rare session where the same date is drawn ≥ threshold times — the
    // sentence-level detector misses the overwhelming majority
    assert(sentences * 20 <= shingles,
      s"sentence-level should almost always miss W8: $sentences vs $shingles")
  }

  test("W8 spans are redacted end-to-end (batch redactFull), tails kept") {
    val p = RedactionParams()
    val red = TranscriptOps.redactFull(df, p).cache()
    val marked = red.filter(col("text_redacted").contains(Defaults.ShinglePlaceholder))
    assert(marked.count() > 0L, "W8 spans must be redacted")
    // the variable tail survives next to the placeholder (the constant
    // "2026" token is part of the hot run, the -MM-DD tail is not)
    assert(marked.filter(col("text_redacted")
      .rlike("\\[RECURRING\\]-0[1-9]-1[0-8] sans anomalie")).count() > 0L)
    // in every session that LEARNED the head (threshold reached), no W8
    // head text survives; sessions below threshold correctly keep it
    val hotSessions = TranscriptOps.detectRecurringShingles(df, p)
      .filter(col("shingle") === "verification automatique du")
      .select(col("conv_id"), col("session_id")).distinct()
    val leak = red.join(hotSessions, Seq("conv_id", "session_id"))
      .filter(col("text_redacted").contains("verification automatique du registre"))
    assert(leak.count() === 0L)
    red.unpersist()
  }
}
